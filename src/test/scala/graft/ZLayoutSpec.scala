package graft

import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import scala.jdk.CollectionConverters._
import graft.index.ZLayout

/** Z-order layout evidence: the range-clustered write really produces
  * disjoint per-row-group cell ranges, so a region query's BETWEEN is
  * answerable from footer stats — measured from the parquet footers
  * themselves, not inferred. */
class ZLayoutSpec extends SparkSpec {

  private val nFiles = 8

  /** (min, max) of the `cell` column per row group across a parquet dir. */
  private def cellRanges(dir: String): Seq[(Long, Long)] = {
    val conf = spark.sessionState.newHadoopConf()
    new java.io.File(dir).listFiles.filter(_.getName.endsWith(".parquet")).toSeq.flatMap { f =>
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(f.getPath), conf))
      try r.getFooter.getBlocks.asScala.toSeq.map { b =>
        val s = b.getColumns.asScala.find(_.getPath.toDotString == "cell").get.getStatistics
        (s.genericGetMin.asInstanceOf[java.lang.Long].longValue,
          s.genericGetMax.asInstanceOf[java.lang.Long].longValue)
      } finally r.close()
    }
  }

  private def overlaps(r: (Long, Long)): Boolean =
    r._1 < ZLayout.zHi && r._2 >= ZLayout.zLo

  test("clustered write yields disjoint row-group cell ranges; region range touches few of them") {
    val cells = ZLayout.fineCells(spark, sfDir)
    val zDir = "/tmp/graft-zsort"
    val rDir = "/tmp/graft-zrand"
    ZLayout.clusteredWrite(cells, "cell", zDir, nFiles)
    cells.repartition(nFiles).write.mode("overwrite").parquet(rDir)

    val zr = cellRanges(zDir).sortBy(_._1)
    val rr = cellRanges(rDir)
    assert(zr.size >= nFiles && rr.size >= nFiles)
    // clustered: ranges are pairwise disjoint (range-partitioned + sorted)
    zr.sliding(2).foreach { case Seq(a, b) => assert(a._2 <= b._1) case _ => }
    // the pruning guarantee: row groups touched is proportional to RESULT
    // size (+1 boundary group), not corpus size — the hot region holds
    // ~30% of all points, so ~30% of balanced range partitions is correct.
    // The round-robin layout touches ALL row groups regardless.
    val total = cells.count()
    val inRange = cells.filter(col("cell") >= ZLayout.zLo && col("cell") < ZLayout.zHi).count()
    val zHit = zr.count(overlaps)
    val rHit = rr.count(overlaps)
    val bound = math.ceil(inRange.toDouble / total * zr.size).toLong + 1
    assert(zHit <= bound,
      s"clustered layout: $zHit of ${zr.size} row groups overlap (selectivity bound $bound)")
    assert(rHit == rr.size, s"round-robin layout unexpectedly clustered: $rHit of ${rr.size}")
  }

  test("region scan over the clustered index pushes the range to parquet and matches the recompute") {
    // self-sufficient: writes its own layout rather than depending on the
    // first test's output (order/staleness coupling)
    val zDir = "/tmp/graft-zsort-scan"
    ZLayout.clusteredWrite(ZLayout.fineCells(spark, sfDir), "cell", zDir, nFiles)
    val scan = spark.read.parquet(zDir)
      .filter(col("cell") >= ZLayout.zLo && col("cell") < ZLayout.zHi)
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(cell), GreaterThanOrEqual(cell,"),
      s"range not pushed to the scan:\n$plan")
    val viaIndex = scan.groupBy("cell").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val recompute = ZLayout.zRangeCount(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaIndex === recompute && viaIndex.nonEmpty)
  }
}
