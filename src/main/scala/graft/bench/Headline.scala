package graft.bench

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.cell.{CellFunctions, CellIndex}
import graft.gen.GeoWorld
import graft.geom.GeoCols

/**
 * The headline benchmark job — BASELINE.json's metric: "spatial-join +
 * tile-assignment throughput (docs/sec)". ONE pass over the document/point
 * side: parse/derive -> codegen cell-encode -> broadcast cell hash-join
 * against the admin boundaries -> exact JTS refine -> slippy-tile
 * assignment -> per-tile aggregate. The point side never shuffles before
 * the final tile aggregation (map-side combined), which is the shape that
 * scales linearly to 10^12 docs.
 */
object Headline {

  def job(spark: SparkSession, sfDir: String, z: Int = 7): DataFrame = {
    GeoWorld.registerUdfs(spark)
    spark.udf.register("tile_x", (lon: Double, zz: Int) => CellIndex.tileX(lon, zz))
    spark.udf.register("tile_y", (lat: Double, zz: Int) => CellIndex.tileY(lat, zz))
    val pts = GeoWorld.points(spark, sfDir)
      .withColumn("cell", CellFunctions.zcell(col("lon"), col("lat"), lit(CellIndex.RES_COARSE)))
    val areas = GeoWorld.areas(spark, sfDir).filter(col("level") === 6)
      .withColumn("cell", explode(GeoWorld.coverCells(col("lon0"), col("lat0"), col("lon1"), col("lat1"), CellIndex.RES_COARSE)))
      .select("cell", "area_id", "wkb")
    pts.join(broadcast(areas), "cell")
      .filter(GeoCols.geoContainsPoint(col("wkb"), col("lon"), col("lat")))
      .select(
        col("area_id"),
        call_function("tile_x", col("lon"), lit(z)).as("tx"),
        call_function("tile_y", col("lat"), lit(z)).as("ty"),
        col("is_media"))
      .groupBy("area_id", "tx", "ty")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("is_media"), 1L).otherwise(0L)).as("n_media"))
  }

  /** Run the job and return (docs processed, elapsed seconds, result rows). */
  def timed(spark: SparkSession, sfDir: String): (Long, Double, Long) = {
    val nDocs = GeoWorld.points(spark, sfDir).count()
    val t0 = System.nanoTime()
    val resultRows = job(spark, sfDir).count()
    val secs = (System.nanoTime() - t0) / 1e9
    (nDocs, secs, resultRows)
  }
}
