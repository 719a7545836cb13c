package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.gen.GeoWorld
import graft.query.GeoQueries
import graft.cell.{CellFunctions, CellIndex, CellSql}

/**
 * Tag-vocabulary operators — the reference's two whitelists (T10 index
 * whitelist, ProcessingUtilities.scala:47-72; T11 storage whitelist,
 * OsmObjectMapper.scala:14-1028 `tags.intersect(mappings)`), re-expressed
 * as a broadcast vocabulary join / array_intersect, plus the
 * distinct-count surface (G7: the reference's KMV sketch experiment →
 * Spark's HLL++ `approx_count_distinct` with an exact oracle-checked twin).
 */
object TagOps {

  /** The curated vocabulary at the reference's SCALE (~700-entry OSM tag
    * list, OsmObjectMapper.scala:14-1028): the 38 values that actually occur
    * in the synthetic world (amenity/shop whitelisted, leisure not) plus 662
    * whitelist entries that never occur in this extract — exactly like the
    * reference, where most of the vocabulary matches nothing in a given
    * region. Keeps the broadcast build side realistically sized. */
  val vocabulary: Seq[(String, String)] =
    (0 until 19).map(c => ("amenity", s"cat_$c")) ++
      (19 until 38).map(c => ("shop", s"cat_$c")) ++
      (0 until 662).map { i =>
        (Seq("amenity", "shop", "tourism", "highway", "historic")(i % 5), s"x_$i")
      }

  /** T10/T11: keep only whitelisted tags; drop rows with none left. The
    * vocabulary rides a broadcast join (array_intersect on a per-row tag
    * list degenerates to the same thing for single-tag rows). */
  def tagWhitelist(spark: SparkSession, sfDir: String): DataFrame = {
    val vocab = spark.createDataFrame(vocabulary).toDF("tag_k", "tag_v")
    GeoWorld.points(spark, sfDir)
      .join(broadcast(vocab), Seq("tag_k", "tag_v"), "left_semi")
      .select(col("pid"), col("tag_k"), col("tag_v"))
  }

  val tagWhitelistSql: String = {
    val in = vocabulary.map { case (k, v) => s"('$k','$v')" }.mkString(", ")
    GeoQueries.withWorld() +
      s"""SELECT pid, tag_k, tag_v FROM pts
         |WHERE (tag_k, tag_v) IN ($in)""".stripMargin
  }

  /** Exact distinct tag-values per coarse cell (oracle-checked twin of the
    * sketched version; see CellStatsSpec for the approx_count_distinct
    * error-bound check). */
  def distinctTagsByCell(spark: SparkSession, sfDir: String): DataFrame = {
    GeoWorld.registerUdfs(spark)
    GeoWorld.points(spark, sfDir)
      .groupBy(CellFunctions.zcell(col("lon"), col("lat"), lit(CellIndex.RES_COARSE)).as("cell"))
      .agg(countDistinct(col("tag_v")).as("n_tags"), count(lit(1)).as("n"))
      .filter(col("n") >= 3)
  }

  val distinctTagsByCellSql: String =
    GeoQueries.withWorld() +
      s"""SELECT ${CellSql.encode("lon", "lat", CellIndex.RES_COARSE)} AS cell,
         |       COUNT(DISTINCT tag_v) AS n_tags, COUNT(*) AS n
         |FROM pts GROUP BY 1 HAVING COUNT(*) >= 3""".stripMargin

  /** G7: the sketched variant (HLL++ — the reference's KMV/DataSketches
    * slot). Not oracle-checked (DuckDB's sketch differs); bounded against
    * the exact twin in tests. */
  def approxDistinctTagsByCell(spark: SparkSession, sfDir: String): DataFrame = {
    GeoWorld.registerUdfs(spark)
    GeoWorld.points(spark, sfDir)
      .groupBy(CellFunctions.zcell(col("lon"), col("lat"), lit(CellIndex.RES_COARSE)).as("cell"))
      .agg(approx_count_distinct(col("tag_v"), 0.02).as("n_tags_approx"), count(lit(1)).as("n"))
      .filter(col("n") >= 3)
  }
}
