package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.cell.CellIndex._

/**
 * Golden + property tests for the cell index, mirroring the reference's
 * golden cell-assignment assertions (reference: query-engine/src/test/.../
 * QueriesSpec.scala:81 pins a literal cell id for a fixed lon/lat).
 */
class CellIndexSpec extends AnyFunSuite {

  // Seeded sampling stands in for scalacheck's forAll (the scalatestplus
  // bridge is not resolvable offline); 500 deterministic samples per law.
  private def samples[A](f: scala.util.Random => A): Seq[A] = {
    val rnd = new scala.util.Random(42)
    (0 until 500).map(_ => f(rnd))
  }
  private def lonLat(rnd: scala.util.Random): (Double, Double) =
    (rnd.nextDouble() * 359.998 - 179.999, rnd.nextDouble() * 179.998 - 89.999)

  test("golden cell assignments (fixed lon/lat -> fixed cell id)") {
    // The reference's own first-test point (Duisburg, QueriesSpec.scala:79).
    assert(encode(6.757042407989502, 51.43089564458017, RES_COARSE) === 213382L)
    assert(encode(6.757042407989502, 51.43089564458017, RES_MID) === 3414121L)
    assert(encode(-20.0 + 0.0002, 30.0 + 0.0002, RES_COARSE) === 112923L)
    assert(encode(0.0, 0.0, RES_COARSE) === 196608L)
    assert(encode(179.9999, 89.9999, RES_COARSE) === 262143L)
    assert(encode(-180.0, -90.0, RES_COARSE) === 0L)
    assert(encode(6.757, 51.431, RES_FINE) === 218503755L)
  }

  test("spread/compact are inverses") {
    samples(r => (r.nextLong() >>> 32)).foreach { v =>
      assert(compact(spread(v)) === v)
    }
  }

  test("encode splits into recoverable x/y") {
    samples { rnd => val (lon, lat) = lonLat(rnd); (lon, lat, 2 + rnd.nextInt(27)) }.foreach {
      case (lon, lat, r) =>
        val c = encode(lon, lat, r)
        assert(cellX(c) === ix(lon, r))
        assert(cellY(c) === iy(lat, r))
    }
  }

  test("parent == encode at coarser resolution") {
    samples(lonLat).foreach { case (lon, lat) =>
      val fine = encode(lon, lat, RES_MID)
      assert(parent(fine, RES_MID, RES_COARSE) === encode(lon, lat, RES_COARSE))
    }
  }

  test("bounds contain the encoded point") {
    samples { rnd => val (lon, lat) = lonLat(rnd); (lon, lat, 2 + rnd.nextInt(27)) }.foreach {
      case (lon, lat, r) =>
        val (x0, y0, x1, y1) = bounds(encode(lon, lat, r), r)
        assert(lon >= x0 && lon < x1 + 1e-9)
        assert(lat >= y0 && lat < y1 + 1e-9)
    }
  }

  test("rectCover covers every interior point and nothing else at the corners") {
    val cover = rectCover(5.0, 50.0, 7.0, 51.0, RES_MID).toSet
    assert(cover.contains(encode(5.5, 50.5, RES_MID)))
    assert(cover.contains(encode(5.0, 50.0, RES_MID)))
    assert(cover.contains(encode(6.999, 50.999, RES_MID)))
    assert(!cover.contains(encode(10.0, 50.5, RES_MID)))
    // cover size = x-extent * y-extent of the index ranges
    val nx = ix(7.0, RES_MID) - ix(5.0, RES_MID) + 1
    val ny = iy(51.0, RES_MID) - iy(50.0, RES_MID) + 1
    assert(cover.size === (nx * ny))
  }

  test("ring(k) is the (2k+1)^2 block away from domain edges and contains the centre") {
    val c = encode(6.757, 51.431, RES_COARSE)
    val r1 = ring(c, RES_COARSE, 1)
    assert(r1.length === 9)
    assert(r1.contains(c))
    val r0 = ring(c, RES_COARSE, 0)
    assert(r0.toSeq === Seq(c))
    // at the domain corner: y clips at the pole (2 rows), x WRAPS across
    // the dateline (3 columns) -> 6 cells, per the antimeridian contract
    assert(ring(encode(-180.0, -90.0, RES_COARSE), RES_COARSE, 1).length === 6)
  }

  test("ring cells are exactly those within Chebyshev distance k") {
    samples { rnd => val (lon, lat) = lonLat(rnd); (lon, lat, 1 + rnd.nextInt(4)) }.foreach {
      case (lon, lat, k) =>
        val c = encode(lon, lat, RES_COARSE)
        val cx = cellX(c); val cy = cellY(c)
        val n = 1L << RES_COARSE
        ring(c, RES_COARSE, k).foreach { m =>
          val dx = math.abs(cellX(m) - cx)
          assert(math.min(dx, n - dx) <= k, "x distance is MODULAR (toroidal)")
          assert(math.abs(cellY(m) - cy) <= k)
        }
    }
  }

  test("ringKFor guarantees coverage: any point within radiusM lands inside the k-ring") {
    import graft.geom.Geo
    val rnd = new scala.util.Random(7)
    (0 until 200).foreach { _ =>
      val lat = rnd.nextDouble() * 140 - 70
      val lon = rnd.nextDouble() * 340 - 170
      val radius = math.pow(10, 3 + rnd.nextDouble() * 3) // 1 km .. 1000 km
      val res = 7 + rnd.nextInt(5)
      val k = ringKFor(lat, res, radius)
      val ringSet = ring(encode(lon, lat, res), res, k).toSet
      // probe 16 bearings at (just inside) the radius boundary
      (0 until 16).foreach { d =>
        val a = 2 * math.Pi * d / 16
        val plat = lat + radius / 111194.9 * math.cos(a) * 0.999
        val plon = lon + radius / (111194.9 * math.max(0.05, math.cos(math.toRadians(lat)))) * math.sin(a) * 0.999
        if (plat > -89 && plat < 89 && plon > -179 && plon < 179 &&
            Geo.haversineM(lon, lat, plon, plat) <= radius) {
          assert(ringSet.contains(encode(plon, plat, res)),
            s"lat=$lat lon=$lon r=$radius res=$res k=$k bearing=$d")
        }
      }
    }
  }

  test("vertex cover of a non-rectangular ring encodes every vertex, deduped, in first-seen order") {
    import graft.geom.Geo
    // 64-vertex ellipse (the Headline complex-boundary shape)
    val cx = 6.0; val cy = 51.0; val rx = 3.0; val ry = 2.0; val n = 64
    val coords = (0 to n).map { i =>
      val a = 2 * math.Pi * (i % n) / n
      new org.locationtech.jts.geom.Coordinate(cx + rx * math.cos(a), cy + ry * math.sin(a))
    }.toArray
    val wkb = Geo.toWkb(Geo.areaGeom(Seq(Geo.factory.createPolygon(coords))))
    val cover = Geo.vertexCover(wkb, RES_MID)
    val expected = coords.map(c => encode(c.x, c.y, RES_MID))
    assert(cover.toSet === expected.toSet)      // every vertex cell present, nothing else
    assert(cover.length === cover.distinct.length) // deduped (incl. the closing vertex)
    assert(cover.head === expected.head)        // first-seen order preserved
    // non-rect: the ellipse's vertex cover differs from its bbox rect cover
    val rc = rectCover(cx - rx, cy - ry, cx + rx, cy + ry, RES_MID)
    assert(cover.toSet !== rc.toSet)
    assert(cover.length < rc.length) // boundary cover, not interior fill
  }

  test("vertex cover handles linestrings (way path) too") {
    import graft.geom.Geo
    val line = Geo.factory.createLineString(Array(
      new org.locationtech.jts.geom.Coordinate(0.1, 0.1),
      new org.locationtech.jts.geom.Coordinate(1.1, 0.1),
      new org.locationtech.jts.geom.Coordinate(2.1, 1.1)))
    val cover = Geo.vertexCover(Geo.toWkb(line), RES_MID)
    assert(cover.toSeq === Seq(
      encode(0.1, 0.1, RES_MID), encode(1.1, 0.1, RES_MID), encode(2.1, 1.1, RES_MID)))
  }

  test("slippy tile assignment matches the OSM formula spot checks") {
    // zoom 0: everything in tile (0,0)
    assert(tileX(6.757, 0) === 0L && tileY(51.431, 0) === 0L)
    // well-known: lon 0, lat 0 at z=1 -> tile (1, 1) boundary: x=1, y=1
    assert(tileX(0.0, 1) === 1L && tileY(0.0, 1) === 1L)
    // Duisburg at z=10 (OSM slippy calculator: 531, 340)
    assert(tileX(6.757, 10) === 531L)
    assert(tileY(51.431, 10) === 340L)
  }

  test("tileId packs and is unique per (z,x,y)") {
    val a = tileId(7, 66, 43); val b = tileId(7, 66, 44); val c = tileId(8, 66, 43)
    assert(a !== b); assert(a !== c)
    assert((a >> 56).toInt === 7)
  }

  test("parent at same res is identity; parent ordering is prefix-monotone") {
    samples(lonLat).foreach { case (lon, lat) =>
      val c = encode(lon, lat, RES_MID)
      assert(parent(c, RES_MID, RES_MID) === c)
    }
  }

  test("ANTIMERIDIAN: wrapped rectCover is the union of the two hemisphere halves, deduped") {
    val r = 9
    // bbox from 170E to 170W, crossing the dateline
    val wrapped = rectCover(170.0, 40.0, -170.0, 50.0, r).toSet
    val east = rectCover(170.0, 40.0, 180.0, 50.0, r).toSet
    val west = rectCover(-180.0, 40.0, -170.0, 50.0, r).toSet
    assert(wrapped === east ++ west)
    // every point with wrapped-range lon lands in a cover cell (property
    // sweep either side of the line)
    for (lon <- Seq(170.001, 175.5, 179.999, -179.999, -175.5, -170.001);
         lat <- Seq(40.001, 45.0, 49.999)) {
      assert(wrapped.contains(encode(lon, lat, r)), s"($lon,$lat)")
    }
    // and nothing outside the lon range sneaks in
    assert(!wrapped.contains(encode(169.0, 45.0, r)))
    assert(!wrapped.contains(encode(-169.0, 45.0, r)))
    // a nearly-all-world wrap (lonMin just under 180, lonMax just above
    // -180 + one cell) stays duplicate-free
    val tight = rectCover(179.9, 40.0, 179.8, 50.0, r)
    assert(tight.length === tight.distinct.length)
  }

  test("ANTIMERIDIAN: ring wraps x across the dateline, clips y at the poles, never repeats a cell") {
    val r = 9
    val n = 1L << r
    // centre cell on the last column (lon just under 180)
    val edge = encode(179.9, 45.0, r)
    val ringCells = ring(edge, r, 2)
    assert(ringCells.length === 25, "toroidal x: full (2k+1)^2 block even at the edge")
    assert(ringCells.length === ringCells.distinct.length)
    val xs = ringCells.map(cellX).toSet
    assert(xs.contains(0L) && xs.contains(n - 1), "columns wrap to the other hemisphere")
    // a point just across the line is inside the edge probe's ring
    assert(ringCells.contains(encode(-179.9, 45.0, r)))
    // poles still clip: a ring at the top row loses rows, not wraps
    val top = encode(0.0, 89.9, r)
    assert(ring(top, r, 2).length === 5 * 3)
    // a ring wider than the globe covers each column exactly once
    val orbit = ring(edge, r, (n / 2).toInt + 3)
    assert(orbit.map(cellX).distinct.length === n.toInt)
    assert(orbit.length === orbit.distinct.length)
  }
}
