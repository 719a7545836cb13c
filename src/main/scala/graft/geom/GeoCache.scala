package graft.geom

import org.locationtech.jts.geom.{Coordinate, Geometry, GeometryCollection, Location, MultiPolygon, Point}
import org.locationtech.jts.geom.prep.{PreparedGeometry, PreparedGeometryFactory}
import org.locationtech.jts.algorithm.locate.IndexedPointInAreaLocator
import java.util.concurrent.ConcurrentHashMap

/**
 * Per-executor parsed-geometry cache for the refine UDFs.
 *
 * The cell-join probe side re-presents the SAME few hundred boundary WKBs
 * millions of times (every candidate row); parsing WKB + building the JTS
 * structures per call dominates the refine (measured ~40x the join cost at
 * sf0.1 x32). Caching the parse and using JTS PreparedGeometry (indexed
 * point-in-polygon, identical semantics to Geometry.contains) makes the
 * refine cost per row a hash lookup + an indexed PIP test.
 *
 * Bounded: admin-boundary sets are small (10^2..10^5); on overflow the map
 * is cleared (simple, safe — correctness never depends on the cache).
 */
object GeoCache {

  final val MAX_ENTRIES = 65536

  /** Cached parse of one WKB blob: the raw geometry plus prepared
    * MultiPolygon members. Point-in-area locators are NOT stored here —
    * they are per-thread (see [[locatorsFor]]): JTS's
    * SortedPackedIntervalRTree.init() is a synchronized method entered on
    * EVERY query, so a locator shared across executor threads serializes
    * the whole refine on one monitor (profiled: 32-core runs slower than
    * 8-core). Each thread builds its own locators from the shared parse —
    * build cost is O(boundaries) per thread, query cost lock-free. */
  final case class Parsed(geom: Geometry, preparedMps: List[PreparedGeometry],
      members: List[MultiPolygon])

  /** Per-thread locator cache keyed by Parsed identity. */
  private val tlLocators: ThreadLocal[java.util.IdentityHashMap[Parsed, Array[IndexedPointInAreaLocator]]] =
    ThreadLocal.withInitial(() => new java.util.IdentityHashMap[Parsed, Array[IndexedPointInAreaLocator]]())

  private def locatorsFor(p: Parsed): Array[IndexedPointInAreaLocator] = {
    val m = tlLocators.get()
    var locs = m.get(p)
    if (locs == null) {
      locs = p.members.map(new IndexedPointInAreaLocator(_)).toArray
      if (m.size() >= MAX_ENTRIES) m.clear()
      m.put(p, locs)
    }
    locs
  }

  private final class Key(val bytes: Array[Byte]) {
    // constant-time sampled hash: hashing the full blob (WKBs run to many
    // KB) per cache lookup dominated the refine in profiling — length plus
    // 16 sampled bytes discriminates real geometry sets; equals() still
    // compares fully, only on bucket collision.
    override val hashCode: Int = {
      var h = bytes.length
      val n = bytes.length
      if (n > 0) {
        val step = math.max(1, n / 16)
        var i = 0
        while (i < n) { h = h * 31 + bytes(i); i += step }
      }
      h
    }
    override def equals(o: Any): Boolean = o match {
      case k: Key => java.util.Arrays.equals(bytes, k.bytes)
      case _ => false
    }
  }

  private final case class IdKey(id: Long, disc: Long)
  private val byId = new ConcurrentHashMap[IdKey, Parsed]()

  // Full-array discriminator hashes, memoized by ARRAY IDENTITY per thread:
  // the id-keyed callers present the SAME broadcast byte[] object for a
  // given area on every candidate row, so the full hash is computed once
  // per (thread, geometry) and every subsequent lookup is an identity hit.
  // Hashing the full blob PER ROW instead was a measured disaster: the
  // round-3 first cut did exactly that and the 2048-vertex scaling
  // boundaries (33 KB WKB × 936M candidate rows) turned the 142 s scaling
  // job into a ~5× slower one. A caller that passes a fresh copy each call
  // degrades to per-call hashing but stays CORRECT.
  //
  // WeakHashMap, not IdentityHashMap: byte[] equals/hashCode ARE reference
  // identity, so lookup semantics are unchanged, but keys do not pin the
  // arrays — a non-identity-stable caller's fresh copies (or a finished
  // run's broadcast blobs) become collectable instead of accumulating up
  // to MAX_ENTRIES × |WKB| strong bytes per executor thread. The
  // MAX_ENTRIES clear() stays as the bound on pathological LIVE sets.
  private val tlDiscCache: ThreadLocal[java.util.WeakHashMap[Array[Byte], java.lang.Long]] =
    ThreadLocal.withInitial(() => new java.util.WeakHashMap[Array[Byte], java.lang.Long]())

  private def fullDisc(b: Array[Byte]): Long = {
    val m = tlDiscCache.get()
    var d = m.get(b)
    if (d == null) {
      d = (b.length.toLong << 32) ^ (java.util.Arrays.hashCode(b).toLong & 0xffffffffL)
      if (m.size() >= MAX_ENTRIES) m.clear()
      m.put(b, d)
    }
    d
  }

  /** Id-keyed variant: skips byte-array HashMap keying when the caller has
    * a stable geometry id (broadcast boundary sets). The key folds in the
    * WKB length + a hash over ALL bytes (identity-memoized, see
    * [[fullDisc]]), so two DIFFERENT geometry sets reusing the same area
    * ids in one executor JVM (e.g. repeated scaling runs with different
    * vertex counts) never serve each other's stale parse — round-2 advice:
    * the old 16-byte sampled discriminator could collide for equal-length
    * geometries agreeing on the sample points. */
  def parsedById(id: Long, wkb: => Array[Byte]): Parsed = {
    val b = wkb // force once; the discriminator needs the bytes anyway
    val key = IdKey(id, fullDisc(b))
    val hit = byId.get(key)
    if (hit != null) return hit
    val p = parsed(b)
    if (byId.size() >= MAX_ENTRIES) byId.clear()
    byId.putIfAbsent(key, p)
    p
  }

  /** Reference `within(Point, GC)` via id-cached locators. */
  def containsCoordById(id: Long, wkb: => Array[Byte], lon: Double, lat: Double): Boolean =
    locatorsContain(parsedById(id, wkb), coord(lon, lat))

  private val cache = new ConcurrentHashMap[Key, Parsed]()

  def parsed(wkb: Array[Byte]): Parsed = {
    val k = new Key(wkb)
    val hit = cache.get(k)
    if (hit != null) return hit
    val g = Geo.fromWkb(wkb)
    val (mps, members) = g match {
      case gc: GeometryCollection if !gc.isInstanceOf[MultiPolygon] =>
        val ms = Geo.multiPolys(gc)
        (ms.map(PreparedGeometryFactory.prepare), ms)
      case _ => (Nil, Nil)
    }
    val p = Parsed(g, mps, members)
    if (cache.size() >= MAX_ENTRIES) cache.clear()
    cache.putIfAbsent(k, p)
    p
  }

  /** `contains(point)` over cached locators — identical to JTS areal
    * contains (interior only, boundary excluded). */
  @inline private def locatorsContain(p: Parsed, c: Coordinate): Boolean = {
    if (!p.geom.isInstanceOf[GeometryCollection] || p.geom.isInstanceOf[MultiPolygon]) return false
    val locs = locatorsFor(p)
    var i = 0
    while (i < locs.length) {
      if (locs(i).locate(c) == Location.INTERIOR) return true
      i += 1
    }
    false
  }

  /** Reference `within(Point, GC)` via the cached locators. */
  def containsPoint(outerWkb: Array[Byte], p: Point): Boolean =
    locatorsContain(parsed(outerWkb), p.getCoordinate)

  // locate() does not retain the probe coordinate -> reuse one per thread
  // (tens of GB of Coordinate garbage per bench run otherwise)
  private val tlCoord: ThreadLocal[Coordinate] = ThreadLocal.withInitial(() => new Coordinate())

  @inline private def coord(lon: Double, lat: Double): Coordinate = {
    val c = tlCoord.get(); c.x = lon; c.y = lat; c
  }

  /** Coordinate-based probe (no allocation per row). */
  def containsCoord(outerWkb: Array[Byte], lon: Double, lat: Double): Boolean =
    locatorsContain(parsed(outerWkb), coord(lon, lat))

  /** Reference `within(inner, outer)` with cached parses (the GC/GC branch
    * is unchanged exact/fuzzy logic from [[Geo.within]]). */
  def within(innerWkb: Array[Byte], outerWkb: Array[Byte]): Boolean =
    Geo.within(parsed(innerWkb).geom, parsed(outerWkb).geom)

  /** [[Geo.withinExact]] with cached parses. */
  def withinExact(innerWkb: Array[Byte], outerWkb: Array[Byte]): Boolean =
    Geo.withinExact(parsed(innerWkb).geom, parsed(outerWkb).geom)
}
