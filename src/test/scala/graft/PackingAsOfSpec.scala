package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.text.Packing
import graft.query.AsOf

/** Edge semantics for sequence packing and the as-of join. */
class PackingAsOfSpec extends SparkSpec {

  test("two-phase prefix sum equals the naive single-window offsets") {
    import org.apache.spark.sql.expressions.Window
    val docs = Packing.tokenized(spark, sfDir)
    val naive = docs.withColumn("off",
      coalesce(sum("n_tokens").over(
        Window.partitionBy("lang").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("doc_id", "off").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val twoPhase = Packing.withOffsets(docs)
      .select("doc_id", "off").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(twoPhase === naive && naive.nonEmpty)
  }

  test("packing invariants: offsets advance by n_tokens, seq_off < CAP, straddles flagged") {
    val rows = Packing.seqPack(spark, sfDir)
      .orderBy("lang", "doc_id")
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, seqId, seqOff, endSeq) =>
      assert(n >= 1 && seqOff >= 0 && seqOff < Packing.CAP)
      val expectEnd = seqId + (seqOff + n - 1) / Packing.CAP
      assert(endSeq === expectEnd, s"straddle count wrong for n=$n off=$seqOff")
    }
    // per lang: each doc's global offset = previous offset + previous n_tokens
    rows.groupBy(_._1).values.foreach { docs =>
      docs.map { case (_, n, sid, soff, _) => (sid * Packing.CAP + soff, n) }
        .toSeq.sliding(2).foreach {
          case Seq((o1, n1), (o2, _)) => assert(o2 === o1 + n1)
          case _ =>
        }
    }
  }

  test("packing plan: no corpus-sized window partition (lang-only windows sit over the bucket aggregate)") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val plan = Packing.seqPack(spark, sfDir).queryExecution.optimizedPlan
    val wins = plan.collect { case w: LWindow => w }
    assert(wins.nonEmpty)
    wins.foreach { w =>
      val ps = w.partitionSpec.map(_.toString)
      if (!ps.exists(_.contains("bkt"))) {
        // a window partitioned by language alone would put the whole corpus
        // in one task — it is only allowed over the 1024x-smaller per-bucket
        // aggregate
        assert(w.child.collectFirst { case a: Aggregate => a }.isDefined,
          s"lang-only window over non-aggregated input:\n$w")
      }
    }
  }

  test("as-of join: inclusive match, latest-update-wins ties, NULL before first update") {
    import spark.implicits._
    def ts(m: Int) = new Timestamp(m * 60000L)
    // user 1: signup@10 (two rows, event 5 then 6 -> 6 wins), purchase@10
    // (inclusive: sees the signup), purchase@20; user 2: purchase@5 before
    // its signup@10 -> NULL, purchase@15 -> sees it; user 3: never signs up.
    val ev = Seq(
      (5L, ts(10), 1L, "signup", 100.0, "{}"),
      (6L, ts(10), 1L, "signup", 200.0, "{}"),
      (7L, ts(10), 1L, "purchase", 1.0, "{}"),
      (8L, ts(20), 1L, "purchase", 2.0, "{}"),
      (9L, ts(5), 2L, "purchase", 3.0, "{}"),
      (10L, ts(10), 2L, "signup", 300.0, "{}"),
      (11L, ts(15), 2L, "purchase", 4.0, "{}"),
      (12L, ts(7), 3L, "purchase", 5.0, "{}"),
      // user 4: a NEWER null-valued signup must win over the older 400.0 —
      // ASOF returns the latest row's value, null or not (LOCF must not
      // resurrect the older value past it)
      (13L, ts(1), 4L, "signup", 400.0, "{}"),
      (14L, ts(2), 4L, "signup", Double.NaN, "{}"),
      (15L, ts(3), 4L, "purchase", 6.0, "{}"),
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("value", when(isnan(col("value")), lit(null)).otherwise(col("value")))
    val dir = "/tmp/graft-asof-events"
    ev.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = AsOf.purchasesWithProfile(spark, dir)
      .collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Double])).toMap
    assert(out === Map(
      7L -> Some(200.0), 8L -> Some(200.0),
      9L -> None, 11L -> Some(300.0),
      12L -> None,
      15L -> None))
  }

  test("as-of plan is one keyed shuffle + window — no range join, no nested loop") {
    val plan = AsOf.purchasesWithProfile(spark, sfDir).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"))
    assert(plan.contains("Window"), "LOCF window missing")
  }
}
