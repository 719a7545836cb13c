package graft.geom

import org.locationtech.jts.geom.{Coordinate, Geometry, GeometryCollection, GeometryFactory, MultiPolygon, Point, PrecisionModel}
import org.locationtech.jts.io.{WKBReader, WKBWriter}
import org.locationtech.jts.precision.GeometryPrecisionReducer

import scala.util.{Failure, Success, Try}

/**
 * Geometry core: WKB codecs + the reference's exact containment semantics.
 *
 * The reference's `within` (reference: util/src/main/scala/io/plasmap/util/
 * GeoCalculator.scala:111-149) has three branches that we reproduce
 * byte-for-byte because they define the golden PIP/containment membership
 * sets:
 *   1. (GeometryCollection, GeometryCollection): every inner MultiPolygon is
 *      JTS-`within` some outer MultiPolygon (forall/exists); if not, fall
 *      back to the fuzzy branch: SOME inner mp has
 *      `reduced(outer).intersection(reduced(inner)).area / inner.area >= 0.9`
 *      (exists/exists; precision-reduced inputs; any JTS failure -> false).
 *   2. (Point, GeometryCollection): some outer MultiPolygon JTS-`contains`
 *      the point.
 *   3. anything else -> false (deliberately NOT "fixed").
 */
object Geo {

  final val FUZZY_THRESHOLD = 0.90

  val factory = new GeometryFactory(new PrecisionModel(), 4326)

  // WKBReader/Writer are not thread-safe; Spark tasks run concurrently.
  private val readerTL = ThreadLocal.withInitial[WKBReader](() => new WKBReader(factory))
  private val writerTL = ThreadLocal.withInitial[WKBWriter](() => new WKBWriter())

  def toWkb(g: Geometry): Array[Byte] = writerTL.get().write(g)
  def fromWkb(b: Array[Byte]): Geometry = readerTL.get().read(b)

  def point(lon: Double, lat: Double): Point =
    factory.createPoint(new Coordinate(lon, lat))

  /** Axis-aligned rectangle polygon (closed shell, CCW). */
  def rect(lonMin: Double, latMin: Double, lonMax: Double, latMax: Double): org.locationtech.jts.geom.Polygon =
    factory.createPolygon(Array(
      new Coordinate(lonMin, latMin), new Coordinate(lonMax, latMin),
      new Coordinate(lonMax, latMax), new Coordinate(lonMin, latMax),
      new Coordinate(lonMin, latMin)))

  /** Closed linear ring over an axis-aligned rectangle. */
  private def rectRing(lonMin: Double, latMin: Double, lonMax: Double, latMax: Double) =
    factory.createLinearRing(Array(
      new Coordinate(lonMin, latMin), new Coordinate(lonMax, latMin),
      new Coordinate(lonMax, latMax), new Coordinate(lonMin, latMax),
      new Coordinate(lonMin, latMin)))

  /**
   * Rectangle polygon with rectangular INTERIOR RINGS (holes) — the
   * reference's polygon is a ring LIST, shell + holes
   * (reference: util/src/main/scala/io/plasmap/util/
   * GeowGeometryToJTSGeometry.scala:67-69 `createPolygon(l.head, l.tail)`;
   * the 3-deep multipolygon coordinates at GeoCalculator.scala:154 carry
   * them). JTS `within`/`contains`/`getArea`/`getCoordinates` all honor
   * interior rings, so every containment/cover/stats path downstream of
   * this constructor is hole-aware with no further special-casing — the
   * real-world shape is an admin boundary with an enclave cut out
   * (Büsingen, Baarle).
   */
  def rectWithHoles(lonMin: Double, latMin: Double, lonMax: Double, latMax: Double,
      holes: Seq[(Double, Double, Double, Double)]): org.locationtech.jts.geom.Polygon =
    factory.createPolygon(
      rectRing(lonMin, latMin, lonMax, latMax),
      holes.map { case (h0, a0, h1, a1) => rectRing(h0, a0, h1, a1) }.toArray)

  /** Wrap polygons into the reference's denormalised-relation shape:
    * GeometryCollection(MultiPolygon...). */
  def areaGeom(polys: Seq[org.locationtech.jts.geom.Polygon]): GeometryCollection =
    factory.createGeometryCollection(Array(
      factory.createMultiPolygon(polys.toArray)))

  /** Collect MultiPolygon members of a GeometryCollection — the reference's
    * `multiPolysFromGeoColl` (GeoCalculator.scala:108-110): only direct
    * MultiPolygon children count (no flattening, per its TODO). */
  def multiPolys(gc: GeometryCollection): List[MultiPolygon] =
    (0 until gc.getNumGeometries).iterator.map(gc.getGeometryN).collect {
      case mp: MultiPolygon => mp
    }.toList

  /** The reference's `within`, on JTS geometries. */
  def within(inner: Geometry, outer: Geometry): Boolean = (inner, outer) match {
    case (ig: GeometryCollection, og: GeometryCollection)
        if !ig.isInstanceOf[MultiPolygon] && !og.isInstanceOf[MultiPolygon] =>
      val innerMps = multiPolys(ig)
      val outerMps = multiPolys(og)
      val isWithin = innerMps.forall(p => outerMps.exists(q => p.within(q)))
      if (isWithin) true else fuzzyWithin(innerMps, outerMps, FUZZY_THRESHOLD)
    case (p: Point, gc: GeometryCollection) if !gc.isInstanceOf[MultiPolygon] =>
      multiPolys(gc).exists(_.contains(p))
    case _ => false
  }

  /** The EXACT branch of [[within]] alone (no fuzzy fallback) — used to
    * label which branch decided a membership (a pair where `within` is true
    * but `withinExact` is false was admitted by the ≥0.9 fuzzy branch). */
  def withinExact(inner: Geometry, outer: Geometry): Boolean = (inner, outer) match {
    case (ig: GeometryCollection, og: GeometryCollection)
        if !ig.isInstanceOf[MultiPolygon] && !og.isInstanceOf[MultiPolygon] =>
      val outerMps = multiPolys(og)
      multiPolys(ig).forall(p => outerMps.exists(q => p.within(q)))
    case (p: Point, gc: GeometryCollection) if !gc.isInstanceOf[MultiPolygon] =>
      multiPolys(gc).exists(_.contains(p))
    case _ => false
  }

  /** Fuzzy branch (GeoCalculator.scala:131-149): ratio uses the ORIGINAL
    * inner area as denominator but the precision-REDUCED geometries for the
    * intersection; any failure -> false for that pair. */
  def fuzzyWithin(innerMps: List[MultiPolygon], outerMps: List[MultiPolygon], threshold: Double): Boolean = {
    val reducer = new GeometryPrecisionReducer(new PrecisionModel())
    innerMps.exists(p => outerMps.exists { q =>
      Try {
        val rp = reducer.reduce(p)
        val rq = reducer.reduce(q)
        val intersection = rq.intersection(rp)
        (intersection.getArea / p.getArea) >= threshold
      } match {
        case Success(w) => w
        case Failure(_) => false
      }
    })
  }

  /**
   * Vertex-based cell cover (reference T14: linestrings/polygons are
   * indexed by encoding EVERY vertex — util/.../OsmObjectMapper.scala:
   * 1061-1098): all coordinates of the geometry (any type — rings,
   * linestrings, collections) encoded at `res`, distinct in first-seen
   * order. This is the BOUNDARY cover: right for ways and boundary
   * indexing; for point-in-AREA candidate generation the rectangle cover
   * remains the correct superset (interior cells have no vertices).
   */
  def vertexCover(wkb: Array[Byte], res: Int): Array[Long] = {
    val coords = fromWkb(wkb).getCoordinates
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i < coords.length) {
      seen.add(graft.cell.CellIndex.encode(coords(i).x, coords(i).y, res))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    out
  }

  /** Haversine great-circle distance in metres (sphere R = 6371000 m).
    *
    * Stands in for the reference's GeoTools ellipsoidal
    * `orthodromicDistance` (GeoCalculator.scala:96-105); deviation < 0.5%,
    * documented in BASELINE.md. Exposed here for driver-side use; the
    * engine's hot path uses the codegen'd column version in
    * [[graft.geom.GeoCols.haversineM]] with the identical formula.
    */
  final val EARTH_R = 6371000.0

  def haversineM(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double = {
    val p1 = math.toRadians(lat1); val p2 = math.toRadians(lat2)
    val dp = math.toRadians(lat2 - lat1); val dl = math.toRadians(lon2 - lon1)
    val a = math.sin(dp / 2) * math.sin(dp / 2) +
      math.cos(p1) * math.cos(p2) * math.sin(dl / 2) * math.sin(dl / 2)
    2 * EARTH_R * math.asin(math.sqrt(a))
  }
}
