package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Spatial measure aggregates over the admin ladder: per level — area in
  * exact degree² arithmetic (integer-milli-degree corners keep both
  * engines bit-equal) and geodesic east-west edge length via the shared
  * haversine (reference analog: `util/src/main/scala/io/plasmap/util/
  * GeoCalculator.scala` bbox math). Map-only over the 4,730-row dim +
  * one tiny aggregate. */
object GeoMeasures {
  import graft.geom.GeoCols

  def areaStats(spark: SparkSession, sfDir: String): DataFrame =
    graft.gen.GeoWorld.areas(spark, sfDir)
      .select(col("level"),
        ((col("lon1") - col("lon0")) * (col("lat1") - col("lat0"))).as("deg2"),
        GeoCols.haversineM(col("lon0"), col("lat0"), col("lon1"), col("lat0")).as("ew_m"))
      .groupBy("level")
      .agg(count(lit(1)).as("n_areas"),
        round(sum("deg2"), 6).as("deg2_sum"),
        round(avg("ew_m"), 3).as("ew_mean_m"))

  val areaStatsSql: String =
    GeoQueries.withWorld() +
      s"""SELECT level, COUNT(*) AS n_areas,
         |       ROUND(SUM((lon1 - lon0) * (lat1 - lat0)), 6) AS deg2_sum,
         |       ROUND(AVG(${GeoCols.haversineSql("lon0", "lat0", "lon1", "lat0")}), 3) AS ew_mean_m
         |FROM areas GROUP BY level""".stripMargin
}
