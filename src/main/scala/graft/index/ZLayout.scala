package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.cell.{CellFunctions, CellIndex, CellSql}
import graft.gen.GeoWorld
import graft.query.GeoQueries

/** Z-order storage layout for the spatial index.
  *
  * The cell id already IS a Morton z-value ([[CellIndex.encodeXY]]
  * interleaves the scaled axes), so clustering the index write BY CELL ID
  * is a z-order layout: any quadtree-aligned region — in particular every
  * parent cell — becomes ONE contiguous id range
  * `[p << 2Δr, (p+1) << 2Δr)`. A range-clustered write then gives parquet
  * row groups tight, pairwise-disjoint cell min/max stats, and a region
  * query arrives at the scan as a BETWEEN the reader answers from footer
  * stats — row groups outside the range are never decompressed. At 100 TB
  * that is the difference between touching ~region-sized bytes and
  * touching the whole index (the same reason the reference keys its cell
  * tables by an interleaved geohash — `util/src/main/scala/io/plasmap/util/
  * OsmObjectMapper.scala:1031-1043` picks the hasher,
  * `GeoCalculator.scala:83-86` encodes bbox corners with it).
  */
object ZLayout {

  /** Deterministic probe inside the hot cluster of the synthetic world. */
  final val PROBE_LON = GeoWorld.LON0 + 26.05
  final val PROBE_LAT = GeoWorld.LAT0 + 20.05
  import CellIndex.{RES_COARSE, RES_FINE}

  /** The probe's coarse cell as a fine-resolution z range `[lo, hi)`. */
  val (zLo, zHi): (Long, Long) = {
    val p = CellIndex.encode(PROBE_LON, PROBE_LAT, RES_COARSE)
    val shift = 2 * (RES_FINE - RES_COARSE)
    (p << shift, (p + 1L) << shift)
  }

  /** Range-clustered (z-ordered) write: range-partition on the cell id,
    * sort within partitions — every output file covers one tight id slice.
    * `nFiles` stands in for the cluster write parallelism. */
  def clusteredWrite(df: DataFrame, zCol: String, path: String, nFiles: Int): Unit =
    df.repartitionByRange(nFiles, col(zCol))
      .sortWithinPartitions(zCol)
      .write.mode("overwrite").parquet(path)

  /** Every point with its fine-resolution z id — the index payload a
    * clustered write lays out. */
  def fineCells(spark: SparkSession, sfDir: String): DataFrame = {
    CellFunctions.register(spark)
    GeoWorld.points(spark, sfDir)
      .select(col("pid"),
        CellFunctions.zcell(col("lon"), col("lat"), lit(RES_FINE)).as("cell"))
  }

  /** Region query against the z key: per-fine-cell point counts inside the
    * probe's coarse cell, expressed as ONE contiguous range predicate on
    * the z-ordered id (never an IN-list of 4^Δr children). */
  def zRangeCount(spark: SparkSession, sfDir: String): DataFrame =
    fineCells(spark, sfDir)
      .select("cell")
      .filter(col("cell") >= zLo && col("cell") < zHi)
      .groupBy("cell").agg(count(lit(1)).as("n"))

  val zRangeCountSql: String =
    GeoQueries.withWorld() +
      s"""SELECT cell, COUNT(*) AS n
         |FROM (SELECT ${CellSql.encode("lon", "lat", RES_FINE)} AS cell FROM pts)
         |WHERE cell >= $zLo AND cell < $zHi
         |GROUP BY cell""".stripMargin
}
