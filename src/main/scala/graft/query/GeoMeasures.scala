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

  /**
   * GEOMETRY-derived measures over the hole-bearing donuts: area and
   * perimeter come from the WKB through JTS (`getArea` SUBTRACTS interior
   * rings, `getLength` ADDS their perimeters), while the oracle recomputes
   * both from the rect columns (outer − hole / outer + hole). A geometry
   * path that ignores ring 1+ reports 16 deg² instead of 12 and the row
   * goes red. Map-only over the 25-row dim.
   */
  def enclaveStats(spark: SparkSession, sfDir: String): DataFrame =
    graft.gen.GeoWorld.enclaves(spark, sfDir)
      .select(col("area_id"),
        round(call_function("geo_area_deg2", col("wkb")), 6).as("area_deg2"),
        round(call_function("geo_perimeter_deg", col("wkb")), 6).as("perim_deg"))

  val enclaveStatsSql: String =
    GeoQueries.withWorld(graft.gen.GeoWorld.enclavesCte) +
      s"""SELECT area_id,
         |       ROUND((lon1 - lon0) * (lat1 - lat0) - (hlon1 - hlon0) * (hlat1 - hlat0), 6) AS area_deg2,
         |       ROUND(2 * ((lon1 - lon0) + (lat1 - lat0)) + 2 * ((hlon1 - hlon0) + (hlat1 - hlat0)), 6) AS perim_deg
         |FROM enclaves""".stripMargin

  /**
   * [[enclaveStats]] over the Baarle-style NESTED enclaves: JTS `getArea`
   * subtracts BOTH interior rings of polygon 1 and ADDS the island
   * polygon back (multipolygon area is the sum over members); `getLength`
   * sums all four ring perimeters. The oracle recomputes
   * outer − holeA − holeB + island from the rect columns — a geometry
   * path that honours only ring 1 or only polygon 1 goes red here too.
   */
  def baarleStats(spark: SparkSession, sfDir: String): DataFrame =
    graft.gen.GeoWorld.baarles(spark, sfDir)
      .select(col("area_id"),
        round(call_function("geo_area_deg2", col("wkb")), 6).as("area_deg2"),
        round(call_function("geo_perimeter_deg", col("wkb")), 6).as("perim_deg"))

  val baarleStatsSql: String =
    GeoQueries.withWorld(graft.gen.GeoWorld.baarlesCte) +
      s"""SELECT area_id,
         |       ROUND((lon1 - lon0) * (lat1 - lat0) - (alon1 - alon0) * (alat1 - alat0)
         |             - (blon1 - blon0) * (blat1 - blat0) + (ilon1 - ilon0) * (ilat1 - ilat0), 6) AS area_deg2,
         |       ROUND(2 * ((lon1 - lon0) + (lat1 - lat0)) + 2 * ((alon1 - alon0) + (alat1 - alat0))
         |             + 2 * ((blon1 - blon0) + (blat1 - blat0)) + 2 * ((ilon1 - ilon0) + (ilat1 - ilat0)), 6) AS perim_deg
         |FROM baarles""".stripMargin
}
