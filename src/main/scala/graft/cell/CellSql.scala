package graft.cell

/**
 * Generates ANSI/DuckDB SQL expression strings that recompute [[CellIndex]]
 * cell ids bit-for-bit. Used to build the `SparkEntry.oracleSql` strings so
 * the driver's DuckDB oracle derives the exact same cells as the engine.
 * Only +,-,*,/ (IEEE-exact), floor, and 64-bit integer bit ops are emitted —
 * all deterministic and identical across JVM and DuckDB.
 */
object CellSql {

  /** SQL for spread(v): bit i of the low 32 bits → position 2i. */
  def spread(e: String): String = {
    var x = s"(($e) & 4294967295)"
    x = s"((($x | ($x << 16))) & ${0x0000FFFF0000FFFFL})"
    x = s"((($x | ($x << 8))) & ${0x00FF00FF00FF00FFL})"
    x = s"((($x | ($x << 4))) & ${0x0F0F0F0F0F0F0F0FL})"
    x = s"((($x | ($x << 2))) & ${0x3333333333333333L})"
    x = s"((($x | ($x << 1))) & ${0x5555555555555555L})"
    x
  }

  private def clampFloor(raw: String, max: Long): String =
    s"LEAST(GREATEST(CAST(FLOOR($raw) AS BIGINT), 0), $max)"

  /** SQL for the scaled integer x coordinate at resolution r. */
  def ix(lon: String, r: Int): String =
    clampFloor(s"(($lon) - (${CellIndex.LON_MIN})) / ${CellIndex.LON_SPAN} * ${1L << r}", (1L << r) - 1)

  /** SQL for the scaled integer y coordinate at resolution r. */
  def iy(lat: String, r: Int): String =
    clampFloor(s"(($lat) - (${CellIndex.LAT_MIN})) / ${CellIndex.LAT_SPAN} * ${1L << r}", (1L << r) - 1)

  /** SQL recomputing CellIndex.encode(lon, lat, r). */
  def encode(lon: String, lat: String, r: Int): String =
    s"((${spread(ix(lon, r))} << 1) | ${spread(iy(lat, r))})"

  /** SQL for parent(cell, r, r2) — bit truncation. */
  def parent(cell: String, r: Int, r2: Int): String =
    s"(($cell) >> ${2 * (r - r2)})"

  /** SQL for slippy tile x at zoom z. */
  def tileX(lon: String, z: Int): String =
    clampFloor(s"(($lon) + 180.0) / 360.0 * ${1L << z}", (1L << z) - 1)

  /** SQL for slippy tile y at zoom z (Web Mercator; ln/tan/cos are the only
    * transcendental calls in the whole oracle surface — verified to agree
    * with the JVM at the synthetic coordinate granularity). */
  def tileY(lat: String, z: Int): String =
    clampFloor(
      s"(1.0 - LN(TAN(RADIANS($lat)) + 1.0 / COS(RADIANS($lat))) / PI()) / 2.0 * ${1L << z}",
      (1L << z) - 1)

  /** SQL for tileId(z, x, y). */
  def tileId(z: Int, x: String, y: String): String =
    s"((CAST(${z} AS BIGINT) << 56) | (($x) << 28) | ($y))"
}
