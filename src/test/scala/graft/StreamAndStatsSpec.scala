package graft

import org.apache.spark.sql.functions._
import graft.gen.GeoWorld
import graft.index.TagOps
import graft.streaming.StreamNormalize
import java.nio.file.Files

/** Streaming normalize parity + sketch error bounds. */
class StreamAndStatsSpec extends SparkSpec {

  test("streaming normalize over a file stream equals the batch normalize") {
    val dir = Files.createTempDirectory("graft-stream").toString
    val docs = GeoWorld.docs(spark, sfDir)
    docs.write.mode("overwrite").parquet(s"$dir/in")

    val stream = StreamNormalize.fromParquetDir(spark, s"$dir/in", docs)
    val q = stream.writeStream
      .format("memory")
      .queryName("norm_stream")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)

    val streamed = spark.table("norm_stream")
      .select("doc_id", "offset", "kind", "cell").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getLong(3))).toSet
    val batch = StreamNormalize.normalize(docs)
      .select("doc_id", "offset", "kind", "cell").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getLong(3))).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("approx_count_distinct stays within 5% of the exact distinct (G7 sketch)") {
    val exact = TagOps.distinctTagsByCell(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val approx = TagOps.approxDistinctTagsByCell(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(exact.keySet === approx.keySet)
    exact.foreach { case (cell, n) =>
      val a = approx(cell)
      assert(math.abs(a - n) <= math.max(1L, (n * 0.05).toLong), s"cell $cell: exact=$n approx=$a")
    }
  }

  test("tag whitelist keeps only vocabulary tags and drops the rest") {
    val wl = TagOps.tagWhitelist(spark, sfDir)
    assert(wl.filter(col("tag_k") === "leisure").count() === 0)
    assert(wl.count() > 0)
    val all = GeoWorld.points(spark, sfDir)
    assert(wl.count() === all.filter(col("tag_k") =!= "leisure").count())
  }

  test("stateful assembler: docs split across micro-batches (and a restart) complete with batch-identical fingerprints") {
    import spark.implicits._
    import graft.streaming.{SpanIn, StatefulAssemble}
    val dir = Files.createTempDirectory("graft-assemble").toString
    val spanRows = GeoWorld.docs(spark, sfDir)
      .select(col("doc_id"), size(col("spans")).cast("int").as("n_spans"), explode(col("spans")).as("s"))
      .select(col("doc_id"), col("s.offset").as("offset"), col("s.kind").as("kind"),
        col("s.text").as("text"), col("s.media_ref").as("media_ref"), col("n_spans"))
      .as[SpanIn]
    // micro-batch 1: spans with offset < 4 (multi-span docs are CUT MID-DOC);
    // micro-batch 2 (after a query restart from checkpoint): the rest
    spanRows.filter(col("offset") < 4).write.parquet(s"$dir/in/b1")
    def runOnce(): Unit = {
      val in = spark.readStream.schema(spanRows.schema).parquet(s"$dir/in/*").as[SpanIn]
      val q = StatefulAssemble.assemble(spark, in).writeStream
        .format("parquet").option("path", s"$dir/out").outputMode("append")
        .option("checkpointLocation", s"$dir/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }
    runOnce()
    val afterB1 = spark.read.parquet(s"$dir/out").count()
    spanRows.filter(col("offset") >= 4).write.parquet(s"$dir/in/b2")
    runOnce() // restart: state recovered from the checkpoint
    val got = spark.read.parquet(s"$dir/out").collect()
      .map(r => (r.getString(0), r.getString(2))).toMap
    val expected = graft.query.GeoQueries.spanRoundtrip(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(got.size === expected.size)
    assert(afterB1 > 0 && afterB1 < got.size) // some docs really did span batches
    assert(got === expected) // stream fingerprints == batch spanRoundtrip fingerprints
  }

  test("watermarked event-time windowed cell counts equal the batch windows") {
    val dir = Files.createTempDirectory("graft-window").toString
    val docs = GeoWorld.docs(spark, sfDir)
    docs.write.mode("overwrite").parquet(s"$dir/in")
    val stream = StreamNormalize.windowedCellCounts(
      spark.readStream.schema(docs.schema).parquet(s"$dir/in"))
    val q = stream.writeStream
      .format("memory").queryName("wcounts").outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("wcounts").collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2))).toSet
    val batch = StreamNormalize.windowedCellCounts(docs).collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed === batch)
    assert(streamed.map(_._1).size > 1) // multiple event-time windows exist
  }

  test("streaming dedup within watermark: a replayed source delivers each span once") {
    val dir = Files.createTempDirectory("graft-sdedup").toString
    val docs = GeoWorld.docs(spark, sfDir)
    // the "at-least-once source": the SAME doc set delivered twice
    docs.write.parquet(s"$dir/in/replay1")
    docs.write.parquet(s"$dir/in/replay2")
    val deduped = StreamNormalize.dedupSpans(
      spark.readStream.schema(docs.schema).parquet(s"$dir/in/*"))
    val q = deduped.writeStream
      .format("memory").queryName("sdedup").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val nOut = spark.table("sdedup").count()
    val nDistinct = docs.select(explode(col("spans"))).count()
    assert(nOut === nDistinct, "each (doc_id, offset) must survive exactly once")
    assert(spark.table("sdedup").select("doc_id", "offset").distinct().count() === nOut)
  }
}
