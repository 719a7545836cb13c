package graft.cell

/**
 * 64-bit Z-order (Morton) interleaved cell index over lon/lat.
 *
 * Fills the role of the reference's 64-bit interleaved geohash
 * (reference: util/src/main/scala/io/plasmap/util/GeoCalculator.scala:28-61 —
 * precision ladder 80KM/20KM/5KM/.../1MM) and the north-star's H3/S2 slot.
 * Resolution `r` = bits per axis (r ∈ [1, 30]); a cell id is the
 * bit-interleave of the scaled integer lon/lat coordinates:
 *   ix = floor((lon + 180) / 360 * 2^r)   (clamped to [0, 2^r-1])
 *   iy = floor((lat +  90) / 180 * 2^r)
 *   cell = spread(ix) << 1 | spread(iy)
 *
 * Two labelled schemes over the same interleave core (the north-star asks
 * for both an "H3-like" and an "S2-like" encoding): the H3-like ladder uses
 * odd bit budgets (r = 2k+1), the S2-like ladder even budgets (r = 2k).
 * `RES_*` constants name the levels actually used by the engine, chosen to
 * mirror the reference's 80 km (relations/admin) and 20 km (nodes/ways/POI)
 * cells (reference: util/src/main/scala/io/plasmap/util/OsmObjectMapper.scala:1031-1043).
 *
 * Everything here is pure integer/IEEE-exact arithmetic so a DuckDB oracle
 * can recompute identical cell ids (see [[CellSql]]).
 */
object CellIndex {

  /** ~78 km cells (360°/512 ≈ 0.70° lon): admin/relation granularity. */
  final val RES_COARSE = 9
  /** ~19.5 km cells (360°/2048): node/way/POI granularity. */
  final val RES_MID = 11
  /** ~2.4 km cells: fine lookup granularity. */
  final val RES_FINE = 14
  /** S2-like even ladder variants. */
  final val RES_COARSE_S2 = 10
  final val RES_MID_S2 = 12

  final val LON_MIN = -180.0
  final val LON_SPAN = 360.0
  final val LAT_MIN = -90.0
  final val LAT_SPAN = 180.0

  /** Spread the low 32 bits of v so bit i lands at position 2i. */
  @inline def spread(v: Long): Long = {
    var x = v & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Inverse of [[spread]]: collect the even-position bits of v. */
  @inline def compact(v: Long): Long = {
    var x = v & 0x5555555555555555L
    x = (x | (x >> 1)) & 0x3333333333333333L
    x = (x | (x >> 2)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x >> 4)) & 0x00FF00FF00FF00FFL
    x = (x | (x >> 8)) & 0x0000FFFF0000FFFFL
    x = (x | (x >> 16)) & 0x00000000FFFFFFFFL
    x
  }

  @inline def clamp(v: Long, max: Long): Long =
    if (v < 0L) 0L else if (v > max) max else v

  /** Scaled integer x coordinate at resolution r. */
  @inline def ix(lon: Double, r: Int): Long =
    clamp(math.floor((lon - LON_MIN) / LON_SPAN * (1L << r)).toLong, (1L << r) - 1)

  /** Scaled integer y coordinate at resolution r. */
  @inline def iy(lat: Double, r: Int): Long =
    clamp(math.floor((lat - LAT_MIN) / LAT_SPAN * (1L << r)).toLong, (1L << r) - 1)

  /** Encode a point into its cell at resolution r (bits per axis). */
  def encode(lon: Double, lat: Double, r: Int): Long =
    (spread(ix(lon, r)) << 1) | spread(iy(lat, r))

  /** Encode from pre-scaled integer coordinates (used by cover/ring). */
  @inline def encodeXY(x: Long, y: Long): Long = (spread(x) << 1) | spread(y)

  /** Cell x index back from a cell id. */
  @inline def cellX(cell: Long): Long = compact(cell >>> 1)

  /** Cell y index back from a cell id. */
  @inline def cellY(cell: Long): Long = compact(cell)

  /**
   * Parent cell: truncate from resolution r to coarser r2 (bit truncation,
   * the reference's `reduceParallelPrecision` — GeoCalculator.scala usage).
   */
  def parent(cell: Long, r: Int, r2: Int): Long = {
    require(r2 <= r, s"parent res $r2 must be <= $r")
    cell >>> (2 * (r - r2))
  }

  /** Cell lon/lat bounds: (lonMin, latMin, lonMax, latMax). */
  def bounds(cell: Long, r: Int): (Double, Double, Double, Double) = {
    val x = cellX(cell); val y = cellY(cell)
    val w = LON_SPAN / (1L << r); val h = LAT_SPAN / (1L << r)
    (LON_MIN + x * w, LAT_MIN + y * h, LON_MIN + (x + 1) * w, LAT_MIN + (y + 1) * h)
  }

  /**
   * Rectangle cover: all cells at resolution r intersecting the bbox.
   * Mirrors the reference's `encapsulatingRectangleHashes` matrix
   * (reference: util/.../GeoCalculator.scala:151-202; used Queries.scala:360-375).
   * Cells are emitted row-major (y outer, x inner) and are distinct.
   *
   * ANTIMERIDIAN CONTRACT (pinned; the reference's rectangle math at
   * GeoCalculator.scala:151-202 leaves this undefined): a bbox with
   * `lonMin > lonMax` is a DATELINE-CROSSING box and covers
   * [lonMin, 180) ∪ [-180, lonMax] — the union of its two hemisphere
   * halves, deduplicated. `encode` itself never wraps: longitudes must be
   * canonical [-180, 180]; +180 clamps into the last cell column (the
   * same column as 180-ε, not column 0).
   */
  def rectCover(lonMin: Double, latMin: Double, lonMax: Double, latMax: Double, r: Int): Array[Long] = {
    if (lonMin > lonMax)
      return (rectCover(lonMin, latMin, 180.0, latMax, r) ++
        rectCover(-180.0, latMin, lonMax, latMax, r)).distinct
    val x0 = ix(lonMin, r); val x1 = ix(lonMax, r)
    val y0 = iy(latMin, r); val y1 = iy(latMax, r)
    val out = new Array[Long](((x1 - x0 + 1) * (y1 - y0 + 1)).toInt)
    var i = 0
    var y = y0
    while (y <= y1) {
      var x = x0
      while (x <= x1) { out(i) = encodeXY(x, y); i += 1; x += 1 }
      y += 1
    }
    out
  }

  /**
   * k-ring: the (2k+1)² block of cells centred on `cell`. The Spark analog
   * of the reference's radius cover (Queries.scala:211-262
   * `radiusToBoundingBoxes`) and H3's kRing.
   *
   * ANTIMERIDIAN CONTRACT (pinned): the ring is TOROIDAL in x — columns
   * wrap across ±180 (a probe at 179.9°E sees candidates at 179.9°W), and
   * never repeat (a ring wider than the globe covers each column once) —
   * and CLIPPED in y (there is nothing beyond the poles to wrap to).
   * kNN widening and radius queries inherit dateline correctness from
   * this; haversine is periodic in Δlon, so refinement needs no wrap
   * handling of its own.
   */
  def ring(cell: Long, r: Int, k: Int): Array[Long] = {
    val n = 1L << r
    val cx = cellX(cell); val cy = cellY(cell)
    val max = n - 1
    val y0 = math.max(0L, cy - k); val y1 = math.min(max, cy + k)
    val nx = math.min(n, 2L * k + 1) // full orbit: each column exactly once
    val out = new Array[Long]((nx * (y1 - y0 + 1)).toInt)
    var i = 0
    var y = y0
    while (y <= y1) {
      var d = 0L
      while (d < nx) {
        out(i) = encodeXY(java.lang.Math.floorMod(cx - k + d, n), y)
        i += 1; d += 1
      }
      y += 1
    }
    out
  }

  /**
   * Smallest ring k guaranteeing that EVERY point within `radiusM` metres
   * of the probe falls inside `ring(encode(lon,lat,res), res, k)`.
   * Conservative on both axes: the lat bound uses the constant metre length
   * of a lat degree; the lon bound uses the lon-degree length at the highest
   * |lat| the radius can reach (cos shrinks cells toward the poles — a fixed
   * k silently drops matches there, round-1 ADVICE on Ast.Nearby).
   */
  def ringKFor(lat: Double, res: Int, radiusM: Double): Int = {
    val mPerDegLat = math.Pi * graft.geom.Geo.EARTH_R / 180.0
    val cellW = LON_SPAN / (1L << res)
    val cellH = LAT_SPAN / (1L << res)
    val radiusDegLat = radiusM / mPerDegLat
    val latReach = math.min(89.9, math.abs(lat) + radiusDegLat + cellH)
    val mPerDegLon = mPerDegLat * math.max(1e-6, math.cos(math.toRadians(latReach)))
    val kx = math.ceil(radiusM / (mPerDegLon * cellW)).toLong + 1
    val ky = math.ceil(radiusM / (mPerDegLat * cellH)).toLong + 1
    math.min(Int.MaxValue.toLong, math.max(kx, ky)).toInt
  }

  /** Slippy-map tile x at zoom z (Web Mercator / OSM scheme). */
  def tileX(lon: Double, z: Int): Long =
    clamp(math.floor((lon + 180.0) / 360.0 * (1L << z)).toLong, (1L << z) - 1)

  /** Slippy-map tile y at zoom z (Web Mercator / OSM scheme). */
  def tileY(lat: Double, z: Int): Long = {
    val rad = math.toRadians(lat)
    val v = (1.0 - math.log(math.tan(rad) + 1.0 / math.cos(rad)) / math.Pi) / 2.0
    clamp(math.floor(v * (1L << z)).toLong, (1L << z) - 1)
  }

  /** Pack a (z, x, y) tile into one long: z in the top byte. */
  def tileId(z: Int, x: Long, y: Long): Long =
    (z.toLong << 56) | (x << 28) | y

  /** Cell → containing slippy tile (z ≤ r required for x; y via bounds centre). */
  def cellToTile(cell: Long, r: Int, z: Int): Long = {
    val (lonMin, latMin, lonMax, latMax) = bounds(cell, r)
    val clon = (lonMin + lonMax) / 2.0; val clat = (latMin + latMax) / 2.0
    tileId(z, tileX(clon, z), tileY(clat, z))
  }
}
