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
}
