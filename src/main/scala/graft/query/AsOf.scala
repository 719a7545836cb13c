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
  def purchasesWithProfile(spark: SparkSession, sfDir: String): DataFrame =
    purchasesWithProfileOf(spark.read.parquet(s"$sfDir/events.parquet"))

  /** Same over an arbitrary event table (scale-probe entry point). */
  private[graft] def purchasesWithProfileOf(ev: DataFrame): DataFrame = {
    val upd = ev.filter(col("event_type") === "signup")
      .groupBy("user_id", "ts")
      .agg(max_by(col("value"), col("event_id")).as("sv"))
    val pur = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    // the carried payload is a STRUCT, non-null for every update row even
    // when the update's VALUE is null — ignoreNulls then skips only fact
    // rows, so the latest update always wins exactly like ASOF JOIN
    // (a bare `last(sv, ignoreNulls)` would wrongly resurrect an older
    // non-null value past a newer null-valued update)
    val tagged = upd.select(col("user_id"), col("ts"), lit(0).as("side"),
        lit(null).cast("long").as("event_id"), lit(null).cast("double").as("pv"),
        struct(col("sv")).as("upd"))
      .unionByName(pur.select(col("user_id"), col("ts"), lit(1).as("side"),
        col("event_id"), col("value").as("pv"),
        lit(null).cast("struct<sv:double>").as("upd")))
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    tagged.withColumn("last_upd", last(col("upd"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("event_id"), col("user_id"),
        col("pv").as("purchase_value"), col("last_upd.sv").as("signup_value"))
  }

  /** Conversion funnel: per user, first signup and the first purchase at or
    * after it — conversion flag plus seconds-to-convert. One aggregate per
    * stream (map-side min) and a broadcast-sized join keyed on user; never
    * an event-level self-join. */
  def conversionFunnel(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    val firstSignup = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("ts").as("signup_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"))
    val firstConv = purchases.join(firstSignup, "user_id")
      .filter(col("p_ts") >= col("signup_ts"))
      .groupBy("user_id").agg(min("p_ts").as("conv_ts"))
    firstSignup.join(firstConv, Seq("user_id"), "left")
      .select(col("user_id"), col("signup_ts"),
        col("conv_ts").isNotNull.as("converted"),
        (unix_timestamp(col("conv_ts")) - unix_timestamp(col("signup_ts"))).as("secs_to_convert"))
  }

  val conversionFunnelSql: String =
    """WITH fs AS (
      |  SELECT user_id, MIN(ts) AS signup_ts
      |  FROM events WHERE event_type = 'signup' GROUP BY 1
      |),
      |fc AS (
      |  SELECT p.user_id, MIN(p.ts) AS conv_ts
      |  FROM events p JOIN fs ON fs.user_id = p.user_id
      |  WHERE p.event_type = 'purchase' AND p.ts >= fs.signup_ts
      |  GROUP BY 1
      |)
      |SELECT fs.user_id, fs.signup_ts,
      |       fc.conv_ts IS NOT NULL AS converted,
      |       CAST(epoch(date_trunc('second', fc.conv_ts)) - epoch(date_trunc('second', fs.signup_ts)) AS BIGINT) AS secs_to_convert
      |FROM fs LEFT JOIN fc ON fc.user_id = fs.user_id""".stripMargin

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
