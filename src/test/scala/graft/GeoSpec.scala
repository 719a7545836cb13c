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

  test("metro straddler geometry is decided BY the threshold: a different FUZZY_THRESHOLD flips it") {
    // the q_metro_fuzzy j=1 shape: 2.0-wide rect, 95% inside its state —
    // admitted at 0.90, rejected at 0.96, so the catalog row set provably
    // tracks Geo.FUZZY_THRESHOLD (and withinExact labels the branch)
    val state = gc(Geo.rect(0, 0, 12, 7.2))
    val metro = gc(Geo.rect(4, 5.3, 6, 7.3)) // 1.9/2.0 = 0.95 inside
    def mps(g: org.locationtech.jts.geom.GeometryCollection) = Geo.multiPolys(g)
    assert(Geo.within(metro, state))
    assert(!Geo.withinExact(metro, state)) // fuzzy branch, not exact
    assert(Geo.fuzzyWithin(mps(metro), mps(state), 0.90))
    assert(!Geo.fuzzyWithin(mps(metro), mps(state), 0.96)) // flips
    // the j=2 shape (85% inside) is below the default threshold
    val metro2 = gc(Geo.rect(7, 5.5, 9, 7.5))
    assert(!Geo.within(metro2, state))
    assert(Geo.fuzzyWithin(mps(metro2), mps(state), 0.80)) // but not inherently
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

  test("complex rings with holes: the gh.issue#2 regression analog (fuzzy tolerates small holes)") {
    // the reference pins two real-world fuzzy-within regressions on complex
    // boundary rings (util/src/test/resources/gh.issue#2.*.geojson, asserted
    // GeoCalculatorSpec.scala:100-114); this is the synthetic analog:
    // an outer boundary with a hole under the inner geometry
    def holed(hx0: Double, hy0: Double, side: Double): Polygon = {
      val shell = Geo.factory.createLinearRing(Array(
        new org.locationtech.jts.geom.Coordinate(0, 0), new org.locationtech.jts.geom.Coordinate(10, 0),
        new org.locationtech.jts.geom.Coordinate(10, 10), new org.locationtech.jts.geom.Coordinate(0, 10),
        new org.locationtech.jts.geom.Coordinate(0, 0)))
      val hole = Geo.factory.createLinearRing(Array(
        new org.locationtech.jts.geom.Coordinate(hx0, hy0), new org.locationtech.jts.geom.Coordinate(hx0 + side, hy0),
        new org.locationtech.jts.geom.Coordinate(hx0 + side, hy0 + side), new org.locationtech.jts.geom.Coordinate(hx0, hy0 + side),
        new org.locationtech.jts.geom.Coordinate(hx0, hy0)))
      Geo.factory.createPolygon(shell, Array(hole))
    }
    val inner = gc(square(3, 3, 3)) // area 9 over the hole region
    // small hole (0.5x0.5 = 0.25): exact within FAILS (hole pierces the
    // inner's interior) but intersection/inner = 8.75/9 = 0.972 >= 0.9
    assert(Geo.within(inner, gc(holed(4, 4, 0.5))))
    // big hole (2x2 = 4): ratio 5/9 = 0.556 < 0.9 -> false
    assert(!Geo.within(inner, gc(holed(3.5, 3.5, 2.0))))
    // inner sitting entirely INSIDE the hole: intersection 0 -> false
    assert(!Geo.within(gc(square(4.1, 4.1, 0.3)), gc(holed(4, 4, 0.5))))
  }

  test("invalid (self-intersecting) geometry routes through the failure branch -> false, no throw") {
    // reference: any JTS failure inside the fuzzy branch yields false for
    // that pair (GeoCalculator.scala:131-149 Try/recover)
    val bowtie = Geo.factory.createPolygon(Array(
      new org.locationtech.jts.geom.Coordinate(0, 0), new org.locationtech.jts.geom.Coordinate(2, 2),
      new org.locationtech.jts.geom.Coordinate(2, 0), new org.locationtech.jts.geom.Coordinate(0, 2),
      new org.locationtech.jts.geom.Coordinate(0, 0)))
    val outer = gc(square(-1, -1, 12))
    // exact p.within(q) on the invalid bowtie may or may not throw; the
    // contract is ONLY that within() never escapes with an exception
    val r1 = Geo.within(gc(bowtie), outer)
    val r2 = Geo.within(outer, gc(bowtie))
    assert(!r2) // outer (area 144) can never be fuzzy-within the tiny bowtie
    assert(r1 || !r1) // total: no exception escaped either direction
  }

  test("catalog glitch bowtie PROVABLY exercises the Try-failure arm (q_fuzzy_invalid fixture)") {
    // the q_fuzzy_invalid glitch shape: bowtie straddling the state's north
    // border at 95% naive overlap (the admitted metro j=1 position). Pin
    // each stage of the decision chain so the catalog row set can only be
    // produced BY the failure arm:
    //  (a) a VALID rect in this exact envelope IS admitted by the fuzzy arm
    //  (b) the exact arm evaluates false on the bowtie WITHOUT throwing
    //  (c) the precision reducer inside the fuzzy arm THROWS on it
    //  (d) therefore within() = false via Failure(_) => false
    val bowtie = Geo.factory.createPolygon(Array(
      new org.locationtech.jts.geom.Coordinate(1.0, 5.3), new org.locationtech.jts.geom.Coordinate(3.0, 7.3),
      new org.locationtech.jts.geom.Coordinate(3.0, 5.3), new org.locationtech.jts.geom.Coordinate(1.0, 7.3),
      new org.locationtech.jts.geom.Coordinate(1.0, 5.3)))
    val state = gc(Geo.rect(0, 0, 12, 7.2))
    assert(Geo.within(gc(Geo.rect(1.0, 5.3, 3.0, 7.3)), state)) // (a)
    assert(!Geo.withinExact(gc(bowtie), state)) // (b) — and no throw
    val reducer = new org.locationtech.jts.precision.GeometryPrecisionReducer(
      new org.locationtech.jts.geom.PrecisionModel())
    assertThrows[IllegalArgumentException](
      reducer.reduce(Geo.factory.createMultiPolygon(Array(bowtie)))) // (c)
    assert(!Geo.within(gc(bowtie), state)) // (d)
  }

  test("polygon interior rings: holes exclude, ring admits, fuzzy straddles, area/cover see both rings") {
    // donut: shell (0,0)-(4,4), hole (1,1)-(3,3) — the reference's ring-list
    // polygon (GeowGeometryToJTSGeometry.scala:67-69 createPolygon(shell,
    // holes)); every assert here FLIPS if ring 1+ is ignored
    val donut = gc(Geo.rectWithHoles(0, 0, 4, 4, Seq((1.0, 1.0, 3.0, 3.0))))
    // (a) a point inside the hole is inside the outer bbox but NOT contained
    assert(!Geo.within(Geo.point(2, 2), donut))
    // (b) a point in the ring part IS contained
    assert(Geo.within(Geo.point(0.5, 2), donut))
    // (c) a child rect fully inside the hole: naive bbox overlap is 1.0 but
    //     true intersection is 0 — rejected by exact AND fuzzy arms
    val holeChild = gc(Geo.rect(1.2, 1.2, 2.8, 2.8))
    assert(!Geo.withinExact(holeChild, donut))
    assert(!Geo.within(holeChild, donut))
    // (d) a child in the ring part: exact within
    assert(Geo.withinExact(gc(Geo.rect(0.2, 0.2, 0.8, 3.8)), donut))
    // (e) fuzzy with holes: child (0.2,1.2)-(1.05,2.8) dips 0.05/0.85 into
    //     the hole -> 0.941 of it in the donut -> fuzzy admits, exact doesn't
    val straddle = gc(Geo.rect(0.2, 1.2, 1.05, 2.8))
    assert(!Geo.withinExact(straddle, donut))
    assert(Geo.within(straddle, donut))
    // (f) ...and a 0.769 version ((0.2,1.2)-(1.5,2.8): 0.5/1.3 in hole) is out
    assert(!Geo.within(gc(Geo.rect(0.2, 1.2, 1.5, 2.8)), donut))
    // (g) area honors the hole: 16 - 4 = 12
    assert(math.abs(donut.getArea - 12.0) < 1e-9)
    // (h) the vertex cover includes the INTERIOR ring's vertices (T14 indexes
    //     every coordinate of every ring)
    val cover = Geo.vertexCover(Geo.toWkb(donut), 9).toSet
    assert(cover.contains(graft.cell.CellIndex.encode(1.0, 1.0, 9)))
    assert(cover.contains(graft.cell.CellIndex.encode(3.0, 3.0, 9)))
    // (i) WKB round-trips the ring list intact
    val rt = Geo.fromWkb(Geo.toWkb(donut))
    val poly = rt.getGeometryN(0).asInstanceOf[org.locationtech.jts.geom.MultiPolygon]
      .getGeometryN(0).asInstanceOf[Polygon]
    assert(poly.getNumInteriorRing === 1)
    assert(!Geo.within(Geo.point(2, 2), rt.asInstanceOf[org.locationtech.jts.geom.GeometryCollection]))
  }

  test("nested enclaves (Baarle): 2 holes + counter-enclave island — flips if only ring 1 OR only polygon 1 is honoured") {
    // multipolygon of [shell (0,0)-(10,10) with holes A (2,2)-(5,5) and
    // B (7,7)-(9,9)] plus island (3,3)-(4,4) strictly inside hole A — the
    // reference's ring-LIST polygon and polygon-LIST multipolygon
    // (GeowGeometryToJTSGeometry.scala:67-69, GeoCalculator.scala:154)
    val nested = gc(
      Geo.rectWithHoles(0, 0, 10, 10, Seq((2.0, 2.0, 5.0, 5.0), (7.0, 7.0, 9.0, 9.0))),
      Geo.rectWithHoles(3, 3, 4, 4, Seq.empty))
    // (a) ring point: inside
    assert(Geo.within(Geo.point(1, 1), nested))
    // (b) hole-A point outside the island: NOT inside (flips if rings ignored)
    assert(!Geo.within(Geo.point(2.5, 2.5), nested))
    // (c) ISLAND point: inside AGAIN (flips if polygon 2 is ignored)
    assert(Geo.within(Geo.point(3.5, 3.5), nested))
    // (d) hole-B point: NOT inside (flips if only the FIRST ring is honoured)
    assert(!Geo.within(Geo.point(8, 8), nested))
    // (e) the same matrix through the SERIALISED path (WKB round-trip)
    val rt = Geo.fromWkb(Geo.toWkb(nested)).asInstanceOf[org.locationtech.jts.geom.GeometryCollection]
    assert(!Geo.within(Geo.point(2.5, 2.5), rt) && Geo.within(Geo.point(3.5, 3.5), rt))
    val mp = rt.getGeometryN(0).asInstanceOf[org.locationtech.jts.geom.MultiPolygon]
    assert(mp.getNumGeometries === 2)
    assert(mp.getGeometryN(0).asInstanceOf[Polygon].getNumInteriorRing === 2)
    // (f) area: 100 − 9 − 4 + 1 = 88 (both holes subtracted, island added back)
    assert(math.abs(nested.getArea - 88.0) < 1e-9)
    // (g) a child rect fully inside the ISLAND is exactly within
    assert(Geo.withinExact(gc(Geo.rect(3.2, 3.2, 3.8, 3.8)), nested))
    // (h) a child straddling island and hole A (3.5,3.5)-(4.5,4.4):
    //     intersection with the area = island part only, 0.5/1.0 of width
    //     -> 0.5 < 0.9, rejected by exact AND fuzzy
    assert(!Geo.within(gc(Geo.rect(3.5, 3.5, 4.5, 4.4)), nested))
  }

  test("DOCUMENTED DEVIATION: precision-reduce sits INSIDE our Try (failure→false), OUTSIDE the reference's") {
    // Reference fuzzyWithin (GeoCalculator.scala:133-136) calls
    // precisionReducer.reduce(p)/reduce(q) BEFORE entering its Try — a
    // geometry whose reduce throws makes the reference's fuzzyWithin (and
    // hence within) PROPAGATE the exception. Ours reduces inside the Try
    // (Geo.scala:94-102), so the same pair decides to FALSE. This fixture
    // pins the deviation as a decision (BASELINE.md "Deviations"): a
    // streaming engine must not let one broken boundary kill the job, and
    // the reference's own Failure arm already maps every OTHER JTS error
    // to false — reduce-throws is the one class it leaks.
    val bowtie = Geo.factory.createPolygon(Array(
      new org.locationtech.jts.geom.Coordinate(0, 0), new org.locationtech.jts.geom.Coordinate(2, 2),
      new org.locationtech.jts.geom.Coordinate(2, 0), new org.locationtech.jts.geom.Coordinate(0, 2),
      new org.locationtech.jts.geom.Coordinate(0, 0)))
    val innerMps = List(Geo.factory.createMultiPolygon(Array(bowtie)))
    val outerMps = List(Geo.factory.createMultiPolygon(Array(square(-1, -1, 12))))
    // the reference's statement order, replayed literally: reduce() outside
    // any handler THROWS on this shell — what its fuzzyWithin would do
    val reducer = new org.locationtech.jts.precision.GeometryPrecisionReducer(
      new org.locationtech.jts.geom.PrecisionModel())
    assertThrows[IllegalArgumentException](innerMps.exists(p =>
      outerMps.exists(q => { reducer.reduce(p); reducer.reduce(q); true })))
    // ours: the identical pair resolves, to false
    assert(!Geo.fuzzyWithin(innerMps, outerMps, Geo.FUZZY_THRESHOLD))
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

  test("MultiPoint / MultiLineString: vertex cover is the member-cell union; PIP against the state holds") {
    import org.locationtech.jts.geom.Coordinate
    import graft.cell.CellIndex
    // state 0 of region 0 — the same milli-degree arithmetic the GeoWorld
    // generators use (STATION_SPECS / ROUTE_SPECS, y band 5600..6800)
    def lonOf(x: Int) = graft.gen.GeoWorld.LON0 + (0 * 12000 + x) / 1000.0
    def latOf(y: Int) = graft.gen.GeoWorld.LAT0 + (0 * 7200 + y) / 1000.0
    val mp = Geo.factory.createMultiPointFromCoords(
      graft.gen.GeoWorld.STATION_SPECS.map { case (_, x, y) =>
        new Coordinate(lonOf(x), latOf(y)) }.toArray)
    val ml = Geo.factory.createMultiLineString(
      graft.gen.GeoWorld.ROUTE_SPECS.groupBy(_._1).toSeq.sortBy(_._1).map { case (_, vs) =>
        Geo.factory.createLineString(vs.sortBy(_._2).map { case (_, _, x, y) =>
          new Coordinate(lonOf(x), latOf(y)) }.toArray)
      }.toArray)
    val res = CellIndex.RES_MID
    // cover of the MULTI geometry == union of its members' vertex cells —
    // the same cover rule every other kind uses (no flattening, no loss)
    val mpCover = Geo.vertexCover(Geo.toWkb(mp), res).toSet
    assert(mpCover === graft.gen.GeoWorld.STATION_SPECS.map { case (_, x, y) =>
      CellIndex.encode(lonOf(x), latOf(y), res) }.toSet)
    assert(mpCover.size > 1, "the cluster must genuinely span multiple cells")
    val mlCover = Geo.vertexCover(Geo.toWkb(ml), res).toSet
    assert(mlCover === graft.gen.GeoWorld.ROUTE_SPECS.map { case (_, _, x, y) =>
      CellIndex.encode(lonOf(x), latOf(y), res) }.toSet)
    // PIP: both multis sit strictly INSIDE their state rect and OUTSIDE
    // the neighbouring state's (the band 5600..6800 < 7200 guarantees it)
    val state0 = Geo.rect(lonOf(0), latOf(0), lonOf(12000), latOf(7200))
    val state1 = Geo.rect(lonOf(0), latOf(7200), lonOf(12000), latOf(14400))
    assert(mp.within(state0) && ml.within(state0))
    assert(!mp.within(state1) && !ml.within(state1))
    // dispatch rule: JTS Multi* ARE GeometryCollections, so a multi inner
    // rides the GC branch, where `forall` over its (zero) POLYGONAL
    // members is vacuously true — the faithful consequence of the
    // reference's forall-over-inner-polygons semantics (SURVEY §7.5
    // byte-for-byte mirror; polygon-less inners never occur in the
    // containment catalog, whose inners are always GC(MultiPolygon))
    val gc = Geo.areaGeom(Seq(state0))
    assert(Geo.within(mp, gc) && Geo.within(ml, gc),
      "polygon-less GC inner: vacuous forall, never a throw")
    assert(Geo.withinExact(mp, gc), "exact branch shares the forall rule")
    graft.gen.GeoWorld.STATION_SPECS.foreach { case (_, x, y) =>
      assert(Geo.within(Geo.point(lonOf(x), latOf(y)), gc),
        "each station member resolves through the Point-in-GC branch")
    }
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
