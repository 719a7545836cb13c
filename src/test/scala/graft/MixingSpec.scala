package graft

import org.apache.spark.sql.functions._
import graft.text.{Mixing, TextOps}

/** Semantics + plan-shape pins for the corpus-construction operators
  * (passage dedup, unigram LM, temperature mixing, shard packing). */
class MixingSpec extends SparkSpec {

  test("passage dedup: exact-dup docs lose every passage, originals keep all") {
    val out = Mixing.passageDedup(spark, sfDir).cache()
    val rows = out.collect().map(r =>
      r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap

    // injected exact duplicates (doc_id % 11 == 0 -> +20000) repeat every
    // passage of their source doc, which sorts FIRST on doc_id -> the dup
    // keeps nothing
    val dups = rows.keys.filter(_ >= 20000)
    assert(dups.nonEmpty)
    dups.foreach { id =>
      // the source doc always sorts first on doc_id, so the dup keeps nothing
      assert(rows(id)._2 === 0, s"exact dup $id should keep 0 passages")
      // the source itself may still lose passages to NATURAL collisions
      // (the 40-word synthetic vocab repeats 16-word windows across docs),
      // but never to its own duplicate
      assert(rows(id - 20000)._2 >= 1, s"source ${id - 20000} keeps at least one passage")
    }
    // corpus-wide: kept <= total everywhere, and something survived
    assert(out.filter(col("n_kept") > col("n_pass")).count() === 0)
    assert(out.agg(sum("n_kept")).head.getLong(0) > 0)
    out.unpersist()
  }

  test("passage dedup keeper rule avoids the per-fp window (skew)") {
    val plan = Mixing.passageDedup(spark, sfDir).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "keeper rule must be min(struct) groupBy, not a window")
  }

  test("unigram LM: token totals match and scores are negative log-mass") {
    val out = Mixing.unigramLm(spark, sfDir).cache()
    val corpusToks = TextOps.corpus(spark, sfDir)
      .select(size(split(col("text"), " ")).cast("long").as("n")).agg(sum("n")).head.getLong(0)
    assert(out.agg(sum("n_tokens")).head.getLong(0) === corpusToks)
    assert(out.filter(col("sum_logp") >= 0).count() === 0, "log-probs of a >1-word vocab are negative")
    // longer docs accumulate more negative mass on average: spearman-ish
    // sanity via the extremes
    val byLen = out.orderBy(col("n_tokens")).collect()
    assert(byLen.last.getDouble(2) < byLen.head.getDouble(2))
    out.unpersist()
  }

  test("temperature sampling: rarest language keeps everything; rates are flattening") {
    val c = TextOps.corpus(spark, sfDir)
    val counts = c.groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rarest = counts.minBy(_._2)._1
    val out = Mixing.temperatureSample(spark, sfDir).cache()
    val ppm = out.select("lang", "keep_ppm").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ppm(rarest) === Mixing.TEMP_SCALE, "normalization: rarest lang rate = 1.0")
    // keep rate decreases with language frequency (alpha=0.5 flattening)
    val ordered = counts.toSeq.sortBy(_._2).map(_._1).filter(ppm.contains)
    ordered.sliding(2).foreach { case Seq(a, b) =>
      assert(ppm(a) >= ppm(b), s"rate($a) >= rate($b) since $a is rarer") }
    // every kept row of the rarest lang is present (rate 1.0 keeps all)
    assert(out.filter(col("lang") === rarest).count() === counts(rarest))
    out.unpersist()
  }

  test("shard packing: totals conserved and token-balanced") {
    val out = Mixing.shardPack(spark, sfDir).cache()
    val shards = out.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(shards.length === Mixing.N_SHARDS)
    val c = TextOps.corpus(spark, sfDir)
    assert(shards.map(_._2).sum === c.count())
    // snake-dealt by size: spread between heaviest and lightest shard is
    // bounded by one document's tokens (greedy-balance guarantee)
    val maxDocToks = c.select(
      aggregate(split(col("text"), " "), lit(0L),
        (acc, x) => acc + floor((length(x) + 3) / 4).cast("long")).as("t"))
      .agg(max("t")).head.getLong(0)
    val toks = shards.map(_._3)
    assert(toks.max - toks.min <= maxDocToks,
      s"spread ${toks.max - toks.min} must be <= one doc ($maxDocToks)")
    out.unpersist()
  }

  test("shard packing rank has no corpus-wide window partition") {
    val plan = Mixing.shardPack(spark, sfDir).queryExecution.executedPlan.toString
    // the only windows allowed are partitioned by n_tokens (phase 2) or run
    // over the tiny per-n_tokens aggregate (phase 1) — never an empty
    // PARTITION BY over the doc table
    assert(plan.contains("rwithin#"), "sanity: the two-phase rank is in the plan")
    val windowSpecs = plan.linesIterator.filter(_.contains("Window")).mkString("\n")
    assert(!windowSpecs.contains("row_number() windowspecdefinition(doc_id"),
      "global row_number over docs would serialize the corpus through one task")
  }
}
