package graft.geom

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Column-level geometry math built from Spark's codegen'd built-ins
 * (sin/cos/asin/radians are all whole-stage-codegen expressions, so the
 * kNN/radius refine stays inside one WholeStageCodegen span — no UDF), plus
 * the two JTS refine predicates that genuinely need real geometry and are
 * registered as UDFs (the cold path: they only run on cell-join candidates,
 * never on full scans).
 */
object GeoCols {

  /** Haversine metres — identical formula to [[Geo.haversineM]]. */
  def haversineM(lon1: Column, lat1: Column, lon2: Column, lat2: Column): Column = {
    val p1 = radians(lat1); val p2 = radians(lat2)
    val dp = radians(lat2 - lat1); val dl = radians(lon2 - lon1)
    val a = sin(dp / 2) * sin(dp / 2) + cos(p1) * cos(p2) * sin(dl / 2) * sin(dl / 2)
    lit(2 * Geo.EARTH_R) * asin(sqrt(a))
  }

  /** DuckDB SQL mirror of [[haversineM]] — same ops, same order. */
  def haversineSql(lon1: String, lat1: String, lon2: String, lat2: String): String = {
    val p1 = s"RADIANS($lat1)"; val p2 = s"RADIANS($lat2)"
    val dp = s"RADIANS(($lat2) - ($lat1))"; val dl = s"RADIANS(($lon2) - ($lon1))"
    val a = s"SIN($dp / 2) * SIN($dp / 2) + COS($p1) * COS($p2) * SIN($dl / 2) * SIN($dl / 2)"
    s"2 * ${Geo.EARTH_R} * ASIN(SQRT($a))"
  }

  /** Register the JTS refine UDFs (parse-cached + PreparedGeometry — see
    * [[GeoCache]]; identical reference semantics). Idempotent per session. */
  def register(spark: SparkSession): Unit = {
    // Exact containment refine over WKB (reference `within` semantics).
    spark.udf.register("geo_within", (inner: Array[Byte], outer: Array[Byte]) =>
      if (inner == null || outer == null) false
      else GeoCache.within(inner, outer))
    // Exact-branch-only twin: labels WHICH branch admitted a pair (fuzzy =
    // within && !withinExact). Runs on already-within candidates only.
    spark.udf.register("geo_within_exact", (inner: Array[Byte], outer: Array[Byte]) =>
      if (inner == null || outer == null) false
      else GeoCache.withinExact(inner, outer))
    // Point-in-area refine: reference's (Point, GC) branch; prepared
    // members make each probe an indexed PIP test, not a WKB parse.
    spark.udf.register("geo_contains_point", (outer: Array[Byte], lon: Double, lat: Double) =>
      if (outer == null) false
      else GeoCache.containsCoord(outer, lon, lat))
    // Geometry-derived measures (degree units). JTS honors interior rings:
    // getArea subtracts holes, getLength adds hole-ring perimeters — the
    // q_enclave_stats oracle recomputes both arithmetically, so a parser
    // that drops ring 1+ flips the row.
    spark.udf.register("geo_area_deg2", (wkb: Array[Byte]) =>
      if (wkb == null) 0.0 else Geo.fromWkb(wkb).getArea)
    spark.udf.register("geo_perimeter_deg", (wkb: Array[Byte]) =>
      if (wkb == null) 0.0 else Geo.fromWkb(wkb).getLength)
  }

  def geoWithin(inner: Column, outer: Column): Column =
    call_function("geo_within", inner, outer)

  def geoWithinExact(inner: Column, outer: Column): Column =
    call_function("geo_within_exact", inner, outer)

  def geoContainsPoint(outer: Column, lon: Column, lat: Column): Column =
    call_function("geo_contains_point", outer, lon, lat)
}
