package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join over the event stream: attach to each fact the
  * most recent dimension observation at or before its timestamp — the
  * canonical enrichment for slowly-changing state (user profile, price,
  * config) against an append-only log.
  *
  * Spark has no ASOF JOIN operator, and expressing it as a range join
  * (`f.ts >= d.ts` + argmax) degenerates to a nested-loop or an exploded
  * inequality join. The scale-correct plan is UNION + LOCF: tag both
  * streams, shuffle ONCE on the entity key, sort each partition by
  * (ts, side), and carry the last non-null dimension value forward with a
  * running `last(ignoreNulls)` window. Work is one shuffle of
  * |facts| + |updates| rows; per-entity history is the only ordering unit
  * (skewed entities salt exactly like any hot key).
  *
  * The DuckDB oracle is its native ASOF LEFT JOIN — an independent
  * implementation of the same semantics, which pins the tie rules:
  * inclusive match (`fact.ts >= upd.ts`, side ordering puts the update
  * first at equal ts) and deterministic update dedup (one row per
  * (user, ts), greatest event_id wins).
  */
object AsOf {

  /** Each purchase enriched with the user's most recent signup value at or
    * before the purchase time (NULL when the user never signed up). */
  def purchasesWithProfile(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    val upd = ev.filter(col("event_type") === "signup")
      .groupBy("user_id", "ts")
      .agg(max_by(col("value"), col("event_id")).as("sv"))
    val pur = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val tagged = upd.select(col("user_id"), col("ts"), lit(0).as("side"),
        lit(null).cast("long").as("event_id"), lit(null).cast("double").as("pv"), col("sv"))
      .unionByName(pur.select(col("user_id"), col("ts"), lit(1).as("side"),
        col("event_id"), col("value").as("pv"), lit(null).cast("double").as("sv")))
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    tagged.withColumn("signup_value", last(col("sv"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("event_id"), col("user_id"),
        col("pv").as("purchase_value"), col("signup_value"))
  }

  val purchasesWithProfileSql: String =
    """WITH upd AS (
      |  SELECT user_id, ts, arg_max(value, event_id) AS sv
      |  FROM events WHERE event_type = 'signup' GROUP BY 1, 2
      |),
      |pur AS (
      |  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
      |)
      |SELECT p.event_id, p.user_id, p.value AS purchase_value, u.sv AS signup_value
      |FROM pur p ASOF LEFT JOIN upd u
      |  ON p.user_id = u.user_id AND p.ts >= u.ts""".stripMargin
}
