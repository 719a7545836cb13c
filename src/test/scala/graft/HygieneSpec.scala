package graft

import org.apache.spark.sql.functions._
import graft.text.Hygiene

/** Semantic checks for the corpus-hygiene operators: the deterministic
  * injections must be caught, and only them. */
class HygieneSpec extends SparkSpec {

  test("decontaminate: exact copies of eval docs are fully contaminated; eval docs themselves excluded") {
    val out = Hygiene.decontaminate(spark, sfDir)
    val rows = out.collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val evalIds = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") % 13 === 5).select("doc_id").collect().map(_.getLong(0))
    assert(evalIds.nonEmpty)
    // the +20000 exact copy of an eval doc shares every shingle -> frac 1.0
    evalIds.filter(_ % 11 == 0).foreach { id =>
      assert(rows.get(id + 20000).contains(1.0), s"exact copy of eval doc $id not fully flagged")
    }
    // eval docs are not their own contamination hits
    evalIds.foreach(id => assert(!rows.contains(id)))
  }

  test("decontaminate probes via a broadcast of the eval shingles (no corpus-sized shuffle join)") {
    val plan = Hygiene.decontaminate(spark, sfDir).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "eval-shingle probe should be broadcast")
  }

  test("incremental dedup keeps exactly the genuinely-new batch docs") {
    val survivors = Hygiene.incrDedup(spark, sfDir).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val expected = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") % 3 === 0 && col("doc_id") % 6 =!= 0)
      .collect().map(_.getLong(0) + 50000).toSet
    assert(survivors === expected)
  }

  test("curate: every filter contributes, exact-dup copies never survive, bounds hold") {
    val out = graft.text.Curate.curate(spark, sfDir).collect()
    val ids = out.map(_.getLong(0)).toSet
    val corpusN = graft.text.TextOps.corpus(spark, sfDir).count()
    assert(out.nonEmpty && out.length < corpusN, "curation must drop something and keep something")
    out.foreach { r =>
      val n = r.getLong(2); val s = r.getDouble(3)
      assert(n >= graft.text.Curate.MIN_TOKENS && n <= graft.text.Curate.MAX_TOKENS)
      assert(s >= graft.text.Curate.MIN_SCORE)
    }
    // an injected exact copy (+20000) may never outlive its original
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") % 11 === 0).select("doc_id").collect().map(_.getLong(0))
    base.foreach(id => assert(!ids.contains(id + 20000), s"exact copy of $id survived curation"))
    // the eval/benchmark slice itself must never reach the training corpus
    spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") % 13 === 5).select("doc_id").collect().map(_.getLong(0))
      .foreach(id => assert(!ids.contains(id), s"eval doc $id leaked into the curated corpus"))
  }

  test("bloom-guarded dedup: identical output to the exact anti-join, only maybes shuffled") {
    val plain = graft.text.Hygiene.incrDedup(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val bloom = graft.text.Hygiene.bloomIncrDedup(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(bloom === plain && bloom.nonEmpty)
    // routing: at fpp 0.01 nearly all genuinely-new rows bypass the join
    val batch = graft.text.Hygiene.freshBatch(spark, sfDir)
      .withColumn("fp", org.apache.spark.sql.functions.md5(col("text").cast("binary")))
    val seen = graft.text.Hygiene.seenDigests(spark, sfDir)
    val bf = seen.stat.bloomFilter("fp", math.max(1000L, seen.count()), 0.01)
    val maybes = batch.collect().count(r => bf.mightContainString(r.getString(2)))
    val trueDups = batch.join(seen, "fp").count()
    assert(maybes <= trueDups + math.ceil(0.05 * batch.count()).toLong,
      s"bloom routed $maybes rows to the join for $trueDups true dups")
  }

  test("incremental dedup runs stream-static with zero join state and batch-identical output") {
    val dir = "/tmp/graft-stream-dedup"
    val batch = graft.text.Hygiene.freshBatch(spark, sfDir)
    batch.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(batch.schema).parquet(dir)
    val out = graft.text.Hygiene.incrDedupOf(stream, graft.text.Hygiene.seenDigests(spark, sfDir))
    val q = out.writeStream.format("memory").queryName("incr_dedup_stream")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("incr_dedup_stream")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val expected = graft.text.Hygiene.incrDedup(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(streamed === expected && streamed.nonEmpty)
  }

  test("percentile_approx sketch lands inside the exact p85..p95 rank window") {
    // the sketch's guarantee is on RANK, and it returns a real data value
    // (no interpolation) — so bound it by the exact quantiles one rank
    // window out, not by relative value error.
    // corpus-level with a deliberately COARSE sketch (accuracy 20 -> rank
    // error ~5% of 618 ranks) — per-group n here is so small the sketch
    // would be exact and the test vacuous.
    val r = graft.text.TextOps.corpus(spark, sfDir)
      .select(length(col("text")).cast("double").as("len"))
      .agg(expr("percentile(len, 0.85)").as("lo"), expr("percentile(len, 0.95)").as("hi"),
        expr("percentile_approx(len, 0.9, 20)").as("a90"))
      .head()
    val (lo, hi, a) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
    assert(a >= lo - 1e-9 && a <= hi + 1e-9, s"approx $a outside exact [$lo, $hi]")
  }

  test("redact scrubs the injected trailer and leaves clean docs byte-identical") {
    val out = Hygiene.redact(spark, sfDir)
    val c = graft.text.TextOps.corpus(spark, sfDir)
    // clean docs: no PII flags, fp == md5 of the untouched text
    val joined = out.join(c, "doc_id")
      .select(col("doc_id"), col("had_email"), col("had_phone"),
        (col("clean_fp") === md5(col("text").cast("binary"))).as("untouched"),
        (col("clean_fp") === md5(concat(col("text"),
          lit(" contact <EMAIL> or <PHONE>")).cast("binary"))).as("scrubbed"))
      .collect()
    joined.foreach { r =>
      val id = r.getLong(0)
      if (id % 4 == 0) {
        assert(r.getBoolean(1) && r.getBoolean(2), s"doc $id PII flags missing")
        assert(r.getBoolean(4), s"doc $id trailer not scrubbed to placeholders")
      } else {
        assert(!r.getBoolean(1) && !r.getBoolean(2) && r.getBoolean(3), s"clean doc $id altered")
      }
    }
  }
}
