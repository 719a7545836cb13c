package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.geom.Geo
import org.locationtech.jts.geom.Polygon

/**
 * Containment-semantics suite mirroring the reference's GeoCalculatorSpec
 * (reference: util/src/test/scala/io/plasmap/util/test/GeoCalculatorSpec.scala):
 * the shifted-square tests pin the fuzzy 0.90 threshold (:88-98), the
 * unhandled-combo default pins `false` (:127-128 of GeoCalculator.scala).
 */
class GeoSpec extends AnyFunSuite {

  private def square(x0: Double, y0: Double, side: Double): Polygon =
    Geo.rect(x0, y0, x0 + side, y0 + side)

  private def gc(p: Polygon*) = Geo.areaGeom(p)

  test("id-keyed geometry cache discriminates different geometries reusing the same id") {
    import graft.geom.GeoCache
    // same area id, two different geometry sets (the repeated-scaling-run
    // scenario): the second lookup must NOT serve the first parse
    val leftRect = Geo.toWkb(gc(square(0, 0, 1)))
    val rightRect = Geo.toWkb(gc(square(10, 10, 1)))
    assert(GeoCache.containsCoordById(7777L, leftRect, 0.5, 0.5))
    assert(!GeoCache.containsCoordById(7777L, rightRect, 0.5, 0.5))
    assert(GeoCache.containsCoordById(7777L, rightRect, 10.5, 10.5))
  }

  test("shifted unit square pins the fuzzy 0.90 threshold (reference :88-98)") {
    val base = gc(square(0, 0, 1))
    // identical -> exact within
    assert(Geo.within(gc(square(0, 0, 1)), base))
    // shift 0.1 -> overlap 0.9*1.0 = 0.90 >= 0.90 -> fuzzy-true
    assert(Geo.within(gc(square(0.1, 0, 1)), base))
    // shift 0.2 -> overlap 0.8 < 0.90 -> false
    assert(!Geo.within(gc(square(0.2, 0, 1)), base))
  }

  /** GC with one MultiPolygon PER polygon (vs [[gc]]'s single MP). */
  private def gcMulti(ps: Polygon*) =
    Geo.factory.createGeometryCollection(
      ps.map(p => Geo.factory.createMultiPolygon(Array(p)): org.locationtech.jts.geom.Geometry).toArray)

  test("exact branch is forall/exists over the GC's MultiPolygon members") {
    val outer = gc(square(0, 0, 10))
    val innerAllIn = gcMulti(square(1, 1, 2), square(5, 5, 2))
    assert(Geo.within(innerAllIn, outer))
    // one separate member far outside: forall fails, but the fuzzy branch is
    // exists/exists so the fully-contained member rescues it (reference quirk)
    val innerOneOut = gcMulti(square(1, 1, 2), square(50, 50, 2))
    assert(Geo.within(innerOneOut, outer))
    // both members out -> false
    val innerBothOut = gcMulti(square(50, 50, 2), square(60, 60, 2))
    assert(!Geo.within(innerBothOut, outer))
    // SAME polygons fused into ONE MultiPolygon: the half-outside MP has
    // overlap ratio 4/8 = 0.5 < 0.9 -> false (member granularity matters)
    val fused = gc(square(1, 1, 2), square(50, 50, 2))
    assert(!Geo.within(fused, outer))
  }

  test("shared boundaries still count as within (district strips in nation)") {
    val nation = gc(Geo.rect(-20.0, 30.0, -8.0, 37.2))
    val strip = gc(Geo.rect(-20.0, 30.0, -18.0, 37.2))
    assert(Geo.within(strip, nation))
    val adjacent = gc(Geo.rect(-8.0, 30.0, -6.0, 37.2)) // touches only the edge
    assert(!Geo.within(adjacent, nation))
  }

  test("point-in-polygon branch: interior true, exterior and boundary false") {
    val area = gc(square(0, 0, 10))
    assert(Geo.within(Geo.point(5, 5), area))
    assert(!Geo.within(Geo.point(15, 5), area))
    // JTS contains excludes the boundary — reproduce, don't fix
    assert(!Geo.within(Geo.point(0, 5), area))
  }

  test("unhandled type combos return false (reference GeoCalculator.scala:127-128)") {
    val area = gc(square(0, 0, 10))
    val p = Geo.point(5, 5)
    val line = Geo.factory.createLineString(Array(
      new org.locationtech.jts.geom.Coordinate(1, 1),
      new org.locationtech.jts.geom.Coordinate(2, 2)))
    assert(!Geo.within(p, p)) // point-in-point: unhandled -> false
    assert(!Geo.within(line, area)) // line-in-GC: unhandled -> false
    assert(!Geo.within(area, p)) // GC-in-point: unhandled -> false
    // bare MultiPolygon (not wrapped in a GC) is NOT the GC/GC branch -> false
    val mp = Geo.factory.createMultiPolygon(Array(square(1, 1, 2)))
    assert(!Geo.within(mp, area))
  }

  test("GC with no MultiPolygon members: point branch finds nothing -> false") {
    val emptyGc = Geo.factory.createGeometryCollection(Array(Geo.point(0, 0)))
    assert(!Geo.within(Geo.point(0, 0), emptyGc))
  }

  test("WKB round-trips geometry") {
    val g = gc(square(1.5, 2.5, 3.0))
    val back = Geo.fromWkb(Geo.toWkb(g))
    assert(back.equalsExact(g))
  }

  test("haversine sanity: ~111.19 km per degree of latitude at the equator") {
    val d = Geo.haversineM(0, 0, 0, 1)
    assert(math.abs(d - 111194.9) < 10)
    assert(Geo.haversineM(6.7, 51.4, 6.7, 51.4) === 0.0)
    // symmetric
    assert(Geo.haversineM(1, 2, 3, 4) === Geo.haversineM(3, 4, 1, 2))
  }
}
