package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{GeoPipeline, StageRunner}
import graft.query.GeoQueries
import java.nio.file.{Files, Paths}

/** Stage checkpoint/resume, dead-letter routing, and salted-join
  * equivalence — the pipeline-layer contract items. */
class PipelineSpec extends SparkSpec {

  private val workDir = Files.createTempDirectory("graft-stages").toString

  test("JSONL ingest round-trips the documents table and dead-letters malformed lines at the source") {
    import graft.sources.Jsonl
    val dir = Files.createTempDirectory("graft-jsonl").toString
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text", "lang", "source", "n_chars")
    Jsonl.writeDocs(docs, s"$dir/docs")
    // clean round-trip: every row back, no dead letters
    val back = Jsonl.readDocs(spark, s"$dir/docs")
    assert(back.filter(col("_error").isNotNull).count() === 0)
    val a = docs.collect().map(_.toString).sorted.toSeq
    val b = back.drop("_error").collect().map(_.toString).sorted.toSeq
    assert(a === b, "JSONL round-trip must be lossless")
    // corruption: a truncated line, a wrong-typed field, a missing doc_id —
    // all three route to _error; the good rows still parse
    Files.write(java.nio.file.Paths.get(s"$dir/docs/zz_bad.json"),
      java.util.Arrays.asList(
        """{"doc_id": 1, "text": "ok row", "lang": "en", "source": "s", "n_chars": 6}""",
        """{"doc_id": 2, "text": "truncated""",
        """{"doc_id": "not-a-number", "text": "bad type", "lang": "en", "source": "s", "n_chars": 8}""",
        """{"text": "no id", "lang": "en", "source": "s", "n_chars": 5}"""))
    val mixed = Jsonl.readDocs(spark, s"$dir/docs/zz_bad.json")
    assert(mixed.count() === 4)
    assert(mixed.filter(col("_error").isNotNull).count() === 3)
    assert(mixed.filter(col("_error").isNull).count() === 1)
    assert(mixed.filter(col("doc_id") === 1 && col("_error").isNull).count() === 1)
    // classification must be STABLE under column pruning: a wrong-typed
    // field in a column the query never selects still dead-letters
    // (the _error expression pins the full schema into the scan)
    Files.write(java.nio.file.Paths.get(s"$dir/pruned.json"),
      java.util.Arrays.asList(
        """{"doc_id": 7, "text": "t", "lang": "en", "source": "s", "n_chars": "oops"}""",
        """{"doc_id": 8, "text": "t", "lang": "en", "source": "s", "n_chars": 1}"""))
    val pruned = Jsonl.readDocs(spark, s"$dir/pruned.json").select("doc_id", "_error")
    assert(pruned.filter(col("_error").isNotNull).count() === 1)
    assert(pruned.filter(col("doc_id") === 8 && col("_error").isNull).count() === 1)
  }

  test("staged pipeline runs, records lineage, and resumes from checkpoints") {
    val r1 = GeoPipeline.runAll(spark, sfDir, workDir)
    assert(r1.map(_.name) === Seq("ingest", "normalize", "index"))
    assert(r1.forall(!_.skipped))
    assert(r1.forall(_.rows > 0))
    // per-partition lineage recorded
    assert(r1.head.partitions.nonEmpty && r1.head.partitions.sum === r1.head.rows)
    val manifest = Files.readString(Paths.get(s"$workDir/normalize/manifest.json"))
    assert(manifest.contains("\"partitions\":["))

    // kill-and-rerun: everything up to date -> all stages skipped
    val r2 = GeoPipeline.runAll(spark, sfDir, workDir)
    assert(r2.forall(_.skipped))
    assert(r2.map(_.rows) === r1.map(_.rows))

    // invalidate the middle stage -> it and (on the next pass) downstream re-run
    Files.delete(Paths.get(s"$workDir/normalize/manifest.json"))
    val r3 = GeoPipeline.runAll(spark, sfDir, workDir)
    assert(r3.head.skipped) // ingest untouched
    assert(!r3(1).skipped) // normalize recomputed
    assert(r3(1).rows === r1(1).rows) // deterministically identical
  }

  test("content-hash fingerprint: upstream value change with same rows+schema re-runs downstream") {
    val wd = Files.createTempDirectory("graft-fp").toString
    val runner = new StageRunner(spark, wd)
    def buildA(v: String) = (s: org.apache.spark.sql.SparkSession) => {
      import s.implicits._
      Seq((1L, "x"), (2L, v)).toDF("id", "v")
    }
    runner.run("a", Seq.empty)(buildA("y"))
    assert(!runner.run("b", Seq("a"))(_ => runner.read("a")).skipped)
    assert(runner.run("b", Seq("a"))(_ => runner.read("a")).skipped) // unchanged -> skip
    // rebuild a with DIFFERENT VALUES but identical row count + schema
    Files.delete(Paths.get(s"$wd/a/manifest.json"))
    runner.run("a", Seq.empty)(buildA("Z"))
    val b = runner.run("b", Seq("a"))(_ => runner.read("a"))
    assert(!b.skipped, "rows:schema fingerprint would wrongly skip here — content hash must not")
  }

  test("content digest is multiset-sensitive: a change confined to EVENLY duplicated rows re-runs downstream") {
    // round-2 advice: xor-combined per-row hashes cancel on even
    // multiplicities — ("p","p","q","q") and ("r","r","q","q") hashed equal
    val wd = Files.createTempDirectory("graft-fpdup").toString
    val runner = new StageRunner(spark, wd)
    def build(v: String) = (s: org.apache.spark.sql.SparkSession) => {
      import s.implicits._
      Seq(v, v, "q", "q").toDF("v")
    }
    runner.run("a", Seq.empty)(build("p"))
    assert(!runner.run("b", Seq("a"))(_ => runner.read("a")).skipped)
    Files.delete(Paths.get(s"$wd/a/manifest.json"))
    runner.run("a", Seq.empty)(build("r")) // same rows+schema, both changed rows duplicated evenly
    val b = runner.run("b", Seq("a"))(_ => runner.read("a"))
    assert(!b.skipped, "even-multiplicity change must alter the digest")
  }

  test("phash pairs: every within-group media pair surfaces, no cross-group pair does") {
    import org.apache.spark.sql.functions._
    val pairs = graft.media.MediaOps.phashPairs(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.nonEmpty)
    val G = graft.media.MediaOps.PHASH_GROUP
    pairs.foreach { case (a, b, ham) =>
      assert(a / G === b / G, s"cross-group pair ($a, $b)")
      val expected = if ((a % 10 == 0) == (b % 10 == 0)) 0L else 1L
      assert(ham === expected, s"pair ($a, $b) ham $ham, expected $expected")
    }
    // recall: every within-group pair of media pids must be present
    val byGroup = graft.media.MediaOps.mediaTable(spark, sfDir)
      .select("pid").collect().map(_.getLong(0)).groupBy(_ / G)
    val expectedPairs = byGroup.values.flatMap { ms0 =>
      val ms = ms0.toSeq
      for (a <- ms; b <- ms if a < b) yield (a, b)
    }.toSet
    assert(pairs.map(p => (p._1, p._2)).toSet === expectedPairs)
  }

  test("GeoJSON property escape round-trips quotes and backslashes through a JSON parser") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val names = Seq("""he said "hi"""", """back\slash""", """both \" mixed""", "plain")
    val df = names.toDF("name")
    val schema = StructType(Seq(StructField("name", StringType)))
    val back = df.select(
      col("name"),
      from_json(concat(lit("""{"name":""""),
        graft.index.IndexBuild.jsonEscape(col("name")), lit(""""}""")), schema)
        .getField("name").as("parsed"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    back.foreach { case (orig, parsed) =>
      assert(parsed === orig, s"escape failed to round-trip [$orig]")
    }
  }

  test("a skipped stage requires its data to still exist (manifest alone is not enough)") {
    val wd = Files.createTempDirectory("graft-fpdata").toString
    val runner = new StageRunner(spark, wd)
    runner.run("a", Seq.empty) { s => import s.implicits._; Seq(1L, 2L).toDF("id") }
    assert(runner.run("a", Seq.empty) { s => import s.implicits._; Seq(1L, 2L).toDF("id") }.skipped)
    // wipe the data but keep the manifest -> must re-run, not fake success
    def rm(p: java.io.File): Unit = { Option(p.listFiles).foreach(_.foreach(rm)); p.delete() }
    rm(new java.io.File(s"$wd/a/data.parquet"))
    val r = runner.run("a", Seq.empty) { s => import s.implicits._; Seq(1L, 2L).toDF("id") }
    assert(!r.skipped)
    assert(spark.read.parquet(s"$wd/a/data.parquet").count() === 2L)
  }

  test("dead-letter split: corrupt rows routed, ok rows clean, job never fails") {
    GeoPipeline.runAll(spark, sfDir, workDir)
    val runner = new StageRunner(spark, workDir)
    val dead = spark.read.parquet(s"$workDir/normalize__deadletter/data.parquet")
    val ok = runner.read("normalize")
    assert(dead.count() > 0) // ~1/997 of spans corrupted by construction
    assert(dead.filter(col("_error").isNull).count() === 0)
    assert(!ok.columns.contains("_error"))
    // ok + dead = all spans
    val total = graft.gen.GeoWorld.docs(spark, sfDir)
      .select(explode(col("spans"))).count()
    assert(ok.count() + dead.count() === total)
    // dead-letter re-run (failed=true analog): the dead rows are re-readable
    assert(dead.select("doc_id", "offset").distinct().count() === dead.count())
  }

  test("retryDeadLetter repairs fixable rows back into the stage table") {
    GeoPipeline.runAll(spark, sfDir, workDir)
    val runner = new StageRunner(spark, workDir)
    val beforeOk = runner.read("normalize").count()
    val deadBefore = spark.read.parquet(s"$workDir/normalize__deadletter/data.parquet").count()
    // the injected corruption appended "#corrupt" to text — strip and re-parse
    val (repaired, stillDead) = runner.retryDeadLetter("normalize") { dead =>
      val clean = regexp_replace(col("text"), "#corrupt$", "")
      val lonm = expr("try_cast(split(regexp_replace(text, '#corrupt$', ''), ',')[0] AS BIGINT)")
      val latm = expr("try_cast(split(regexp_replace(text, '#corrupt$', ''), ',')[1] AS BIGINT)")
      dead.select(col("doc_id"), col("offset"), col("kind"), clean.as("text"), col("media_ref"),
        (lit(graft.gen.GeoWorld.LON0) + lonm / 1000.0 + graft.gen.GeoWorld.OFF).as("lon"),
        (lit(graft.gen.GeoWorld.LAT0) + latm / 1000.0 + graft.gen.GeoWorld.OFF).as("lat"),
        when(lonm.isNull || latm.isNull, lit("unparseable coordinates")).otherwise(lit(null)).as("_error"))
    }
    assert(repaired === deadBefore) // every injected corruption is fixable
    assert(stillDead === 0L)
    assert(runner.read("normalize").count() === beforeOk + repaired)
  }

  test("cell fetch prunes partitions on the on-disk index layout (S5 at scale)") {
    GeoPipeline.runAll(spark, sfDir, workDir)
    val runner = new StageRunner(spark, workDir)
    val idx = runner.read("index")
    val aPrefix = idx.select("cell_p4").head.get(0).toString.toLong
    val fetch = idx.filter(col("cell_p4") === aPrefix)
    val plan = fetch.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell_p4"), plan.take(1200))
    // the partition filter actually reaches the scan (not a post-scan Filter):
    // the scan's partition count is a strict subset of the full layout
    val prunedFiles = fetch.select(input_file_name()).distinct().count()
    val allFiles = idx.select(input_file_name()).distinct().count()
    assert(prunedFiles < allFiles)
    assert(fetch.count() > 0)
  }

  test("bucketed tables join with ZERO shuffle exchanges (co-located S5 fetch)") {
    import graft.index.IndexBuild
    IndexBuild.writeBucketedIndex(spark, sfDir, buckets = 8)
    // the tables are bucketed by cell; the fetch joins on (cell, pid) — a
    // SUPERSET of the bucket key. Since 3.4 Spark only treats subset
    // partitioning as co-partitioning when this knob is off (the deliberate
    // bucketed-layout deployment setting):
    spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    try {
      val fetch = IndexBuild.bucketedFetch(spark)
      val plan = fetch.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n${plan.take(1500)}")
      assert(plan.contains("SortMergeJoin"), plan.take(1500))
      assert(plan.contains("Bucketed: true"), plan.take(1500))
      assert(fetch.count() === graft.gen.GeoWorld.points(spark, sfDir).count())
    } finally spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "true")
  }

  test("salted cell join returns exactly the broadcast join's rows") {
    val broadcastRows = GeoQueries.pipLookup(spark, sfDir, level = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val saltedRows = GeoQueries.pipLookupSalted(spark, sfDir, level = 6, salt = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(saltedRows === broadcastRows)
    assert(saltedRows.nonEmpty)
  }

  test("salted join plan shuffles on (cell, salt) — no broadcast of the big side") {
    val plan = GeoQueries.pipLookupSalted(spark, sfDir).queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin") || plan.contains("SortMergeJoin"), plan.take(500))
  }
}
