package graft

import org.apache.spark.sql.functions._
import graft.gen.GeoWorld
import graft.query.GeoQueries

/**
 * Golden end-to-end query suite over the deterministic world at sf0.001 —
 * the Spark analog of the reference's golden-count E2E tests (reference:
 * QueriesSpec.scala:137-174 pins literal membership counts).
 */
class GeoQueriesSpec extends SparkSpec {

  test("every point lands in exactly one area at EVERY admin level (PIP total = point count)") {
    val nPts = GeoWorld.points(spark, sfDir).count()
    GeoWorld.ALL_LEVELS.foreach { lvl =>
      val pip = GeoQueries.pipLookup(spark, sfDir, level = lvl)
      assert(pip.count() === nPts, s"level $lvl")
      assert(pip.select("pid").distinct().count() === nPts, s"level $lvl")
    }
  }

  test("PIP assignment matches the arithmetic truth (state = f(point coords))") {
    // state rect: region g = floor((lon-LON0)/12); idx = floor((lat-LAT0)/7.2)
    val got = GeoQueries.pipLookup(spark, sfDir, level = 4)
      .join(GeoWorld.points(spark, sfDir), "pid")
      .select(col("pid"), col("area_id"), col("lon"), col("lat"))
      .collect()
    // independent recomputation on the driver (no Spark, no JTS)
    got.foreach { r =>
      val lon = r.getDouble(2); val lat = r.getDouble(3)
      val g = math.floor((lon - GeoWorld.LON0) / GeoWorld.REGION_W).toInt
      val idx = math.floor((lat - GeoWorld.LAT0) / GeoWorld.NATION_H).toInt
      // area_id = 400000 + nationkey where nation is the idx-th of region g
      val nationKeys = nationKeysByRegion(g)
      assert(r.getLong(1) === 400000L + nationKeys(idx), s"pid=${r.getLong(0)}")
    }
  }

  private lazy val nationKeysByRegion: Map[Int, Seq[Int]] = {
    val n = spark.read.parquet(s"$sfDir/nation.parquet")
      .select("n_nationkey", "n_regionkey").collect()
      .map(r => (r.getInt(0), r.getInt(1)))
    n.groupBy(_._2).map { case (g, ks) => g -> ks.map(_._1).sorted.toSeq }
  }

  test("containment join: each city within exactly its own state (150 pairs)") {
    val pairs = GeoQueries.containmentJoin(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.size === 150)
    // city 600000 + nk*6 + j is inside state 400000 + nk
    pairs.foreach { case (child, parent) =>
      assert(parent === 400000L + (child - 600000L) / 6L)
    }
  }

  test("adjacent-level nesting holds across the whole 8-level ladder") {
    // counts: 5 countries, 25 states, 50 regions, 150 cities, 300 townships,
    // 600 districts, 1200 villages, 2400 communities — each child in exactly
    // one parent at the previous level
    val expected = Map(2 -> 5L, 4 -> 25L, 5 -> 50L, 6 -> 150L, 7 -> 300L,
      8 -> 600L, 9 -> 1200L, 10 -> 2400L)
    GeoWorld.ALL_LEVELS.sliding(2).foreach { case Seq(p, c) =>
      val n = GeoQueries.containmentJoin(spark, sfDir, childLevel = c, parentLevel = p).count()
      assert(n === expected(c), s"level $c in $p")
    }
    // and transitively: villages within their country
    assert(GeoQueries.containmentJoin(spark, sfDir, childLevel = 9, parentLevel = 2).count() === 1200L)
  }

  test("POI catalog golden counts (reference QueriesSpec.scala:137-174 shape)") {
    import graft.query.PoiCatalog
    // gym is the multi-tag category: 4 (tag_k, tag_v) pairs, like reference Gym
    assert(PoiCatalog.entries.count(_._1 == "gym") === 4)
    assert(PoiCatalog.entries.length === 60) // 57 categories + gym's 3 extra pairs
    val gyms = PoiCatalog.poisOf(spark, sfDir, "gym").collect()
    assert(gyms.length === 316) // ~4 x one category's ~80 points
    assert(gyms.count(_.getLong(0) == 400001L) === 13) // gyms in state_1
    val theatres = PoiCatalog.poisOf(spark, sfDir, "theatre").collect()
    assert(theatres.length === 84) // single-tag category
    assert(theatres.count(_.getLong(0) == 400001L) === 2) // theatres in state_1
  }

  test("area-by-name chain: contains-search finds state_1 and state_10..19, deduped") {
    val got = GeoQueries.areaByNameChain(spark, sfDir, "state_1", level = 4).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val expected = (Seq(1L) ++ (10L to 19L)).map(k => (400000L + k) -> s"state_$k").toSet
    assert(got === expected)
  }

  test("span-sequence invariant: normalize preserves (kind, text, media_ref, offset) per row") {
    val docs = GeoWorld.docs(spark, sfDir)
    val flat = GeoQueries.normalize(spark, sfDir)
    // re-assemble flat rows into ordered span lists and compare to the docs
    val reassembled = flat
      .select(col("doc_id"), struct(col("offset"), col("kind"), col("text"), col("media_ref")).as("s"))
      .groupBy("doc_id")
      .agg(array_sort(collect_list(col("s"))).as("spans0"))
      .select(col("doc_id"), transform(col("spans0"), s => struct(
        s.getField("kind").as("kind"), s.getField("text").as("text"),
        s.getField("media_ref").as("media_ref"), s.getField("offset").as("offset"))).as("spans"))
    val diff = docs.join(reassembled, "doc_id")
      .filter(docs("spans") =!= reassembled("spans"))
    assert(diff.count() === 0L)
    assert(reassembled.count() === docs.count())
  }

  test("area polyfill covers the JTS intersects set; extras are only double-rounded tangencies") {
    import graft.cell.CellIndex
    import graft.geom.Geo
    val res = 10
    val got = GeoQueries.areaPolyfill(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val areas = GeoWorld.areas(spark, sfDir).filter(col("level") === 4)
      .select("area_id", "lon0", "lat0", "lon1", "lat1").collect()
    assert(areas.nonEmpty)
    val expect = areas.flatMap { a =>
      val (id, lon0, lat0, lon1, lat1) =
        (a.getLong(0), a.getDouble(1), a.getDouble(2), a.getDouble(3), a.getDouble(4))
      val cx = (lon0 + lon1) / 2.0; val cy = (lat0 + lat1) / 2.0
      val diamond = Geo.factory.createPolygon(Array(
        new org.locationtech.jts.geom.Coordinate(cx, lat0),
        new org.locationtech.jts.geom.Coordinate(lon1, cy),
        new org.locationtech.jts.geom.Coordinate(cx, lat1),
        new org.locationtech.jts.geom.Coordinate(lon0, cy),
        new org.locationtech.jts.geom.Coordinate(cx, lat0)))
      // JTS truth over the FULL bbox cell grid: emitted iff intersects
      CellIndex.rectCover(lon0, lat0, lon1, lat1, res).toSeq.flatMap { cell =>
        val (a0, b0, a1, b1) = CellIndex.bounds(cell, res)
        if (diamond.intersects(Geo.rect(a0, b0, a1, b1))) Some((id, cell)) else None
      }
    }.toSet
    // every JTS-intersecting cell is emitted (no false negatives)…
    assert((expect -- got).isEmpty, "polyfill must contain the full JTS intersects set")
    // …and any extra is a TANGENT cell where the exact L1 distance sits
    // within double rounding of 1 (the operator's boundary decisions are
    // defined at IEEE-double precision, matching the DuckDB oracle op-for-op;
    // JTS decides these exact ties with rational arithmetic)
    val amap = areas.map(a => a.getLong(0) -> a).toMap
    val extras = got -- expect
    assert(extras.size <= expect.size / 1000, s"only isolated boundary ties allowed (${extras.size})")
    extras.foreach { case (id, cell) =>
      val a = amap(id)
      val (lon0, lat0, lon1, lat1) =
        (a.getDouble(1), a.getDouble(2), a.getDouble(3), a.getDouble(4))
      val cx = (lon0 + lon1) / 2.0; val cy = (lat0 + lat1) / 2.0
      val ha = (lon1 - lon0) / 2.0; val hb = (lat1 - lat0) / 2.0
      val (c0, d0, c1, d1) = CellIndex.bounds(cell, res)
      val dxdy = math.max(0.0, math.max(c0 - cx, cx - c1)) / ha +
        math.max(0.0, math.max(d0 - cy, cy - d1)) / hb
      assert(math.abs(dxdy - 1.0) < 1e-12, s"extra ($id, $cell) must be a tangent tie, got $dxdy")
    }
    // the polyfill genuinely prunes bbox corners (diamond/bbox area = 1/2)
    val bboxCells = areas.map(a => CellIndex.rectCover(
      a.getDouble(1), a.getDouble(2), a.getDouble(3), a.getDouble(4), res).length.toLong).sum
    assert(got.size < bboxCells * 3 / 4, s"polyfill ${got.size} should prune vs bbox $bboxCells")
  }

  test("media caption pairing: nearest preceding text span, brute-force checked") {
    val out = graft.media.MediaOps.mediaCaption(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> (r.getInt(3), r.getString(4))).toMap
    // brute-force from the nested docs: walk each doc's spans in offset order
    val docs = GeoWorld.docs(spark, sfDir)
      .select(col("doc_id"), col("spans")).collect()
    var mediaSeen = 0
    docs.foreach { r =>
      val docId = r.getString(0)
      val spans = r.getSeq[org.apache.spark.sql.Row](1).sortBy(_.getAs[Int]("offset"))
      var lastText: Option[(Int, String)] = None
      spans.foreach { s =>
        val off = s.getAs[Int]("offset")
        if (s.getAs[String]("kind") == "media") {
          mediaSeen += 1
          val expected = lastText.getOrElse((-1, ""))
          assert(out((docId, off)) === expected, s"caption of ($docId, $off)")
        } else lastText = Some((off, s.getAs[String]("text")))
      }
    }
    assert(mediaSeen === out.size, "one output row per media span")
    assert(out.values.exists(_._1 >= 0), "some media spans have captions")
    assert(out.values.exists(_._1 == -1), "leading media spans keep the sentinel")
  }

  test("kNN ranks are dense 1..k per probe and distances non-decreasing") {
    val rows = GeoQueries.knn(spark, sfDir, k = 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(3)))
    val byQ = rows.groupBy(_._1)
    assert(byQ.size === 25) // one group per nation probe
    byQ.values.foreach { g =>
      val sorted = g.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === (1 to 5))
      assert(sorted.map(_._3).toSeq === sorted.map(_._3).sorted.toSeq)
    }
  }

  test("kNN ring widening: sparse-corner + EMPTY-ring probes iterate and stay exact; no cached plans leak") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // 9001/9002: far corners — the initial 3-ring holds few points, so the
    //   exactness proof fails and the ring must widen.
    // 9003: ~5° OUTSIDE the world — its 3-ring AND 6-ring contain ZERO
    //   points although points exist within pruneM (round-2 ADVICE: this
    //   probe silently vanished from the output instead of widening).
    // 9004: ~15° outside — no point within pruneM at all; the proven-empty
    //   answer is NO rows, reached once the ring guarantee covers pruneM.
    // 9005: NEAR-POLE probe with a huge pruneM — the cos-shrunk
    //   longitudinal guarantee can never reach pruneM, so only the
    //   full-grid-ring termination proves it (review finding: previously
    //   died silently at the iteration cap).
    val probeRows = Seq((9001L, 39.9, 65.9), (9002L, -19.9, 65.9),
      (9003L, 45.0, 40.0), (9004L, 55.0, 40.0), (9005L, 10.0, 89.5))
    val corner = spark.createDataFrame(
      java.util.List.of(probeRows.map { case (q, x, y) => Row(q, x, y) }: _*),
      StructType(Seq(StructField("qid", LongType), StructField("qlon", DoubleType),
        StructField("qlat", DoubleType))))
    val cachedBefore = spark.sparkContext.getPersistentRDDs.keySet
    val got = GeoQueries.knnForProbes(spark, sfDir, corner, k = 5, pruneM = 600000.0)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val pts = GeoWorld.points(spark, sfDir).select("pid", "lon", "lat").collect()
    val brute = (for {
      (qid, qlon, qlat) <- probeRows
      top = pts.map(p => (graft.geom.Geo.haversineM(p.getDouble(1), p.getDouble(2), qlon, qlat), p.getLong(0)))
        .filter(_._1 <= 600000.0).sortBy(identity).take(5)
      ((_, pid), i) <- top.zipWithIndex
    } yield (qid, i + 1, pid)).toSet
    assert(got === brute)
    assert(got.exists(_._1 == 9003L), "empty-3-ring probe must widen, not vanish")
    assert(!got.exists(_._1 == 9004L), "out-of-prune probe must prove empty")
    // near-pole probe with a world-reaching prune radius: the full-grid
    // ring termination must return the true top-k, not silently drop it
    val polar = GeoQueries.knnForProbes(spark, sfDir,
        corner.filter(org.apache.spark.sql.functions.col("qid") === 9005L), k = 3, pruneM = 5.0e6)
      .collect().map(r => (r.getInt(1), r.getLong(2))).toSet
    val bruteP = pts.map(p => (graft.geom.Geo.haversineM(p.getDouble(1), p.getDouble(2), 10.0, 89.5), p.getLong(0)))
      .filter(_._1 <= 5.0e6).sortBy(identity).take(3)
      .zipWithIndex.map { case ((_, pid), i) => (i + 1, pid) }.toSet
    assert(polar === bruteP && polar.size === 3, "near-pole probe lost at the iteration cap")
    // round-2 verdict #3: the iteration caches must not outlive the call
    val cachedAfter = spark.sparkContext.getPersistentRDDs.keySet
    assert((cachedAfter -- cachedBefore).isEmpty, "knn leaked persisted RDDs")
  }

  test("batch kNN-join equals the per-probe service path; driver state is only the loop counter") {
    // parity on the service probe set (25 state centres)
    val svc = GeoQueries.knnForProbes(spark, sfDir, GeoQueries.probes(spark, sfDir),
      k = 5, pruneM = 600000.0).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val bat = GeoQueries.knnBatch(spark, sfDir, GeoQueries.probes(spark, sfDir),
      k = 5, pruneM = 600000.0).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(bat === svc, "batch widening must reproduce the per-probe path exactly")
  }

  test("batch kNN-join handles a 100k-probe table (the shape the driver loop cannot)") {
    import org.apache.spark.sql.functions._
    // 100,000 deterministic probes on a 500x200 grid over the world frame
    val probes = spark.range(100000).select(
      col("id").as("qid"),
      (lit(GeoWorld.LON0) + (col("id") % 500) * 0.12 + 0.05).as("qlon"),
      (lit(GeoWorld.LAT0) + (col("id") / 500) * 0.18 + 0.07).as("qlat"))
    val out = GeoQueries.knnBatch(spark, sfDir, probes, k = 3, pruneM = 150000.0)
    val perProbe = out.groupBy("qid").agg(count(lit(1)).as("n"), max("rank").as("mr"))
    // every answered probe has <= k dense ranks
    assert(perProbe.filter(col("n") > 3 || col("mr") =!= col("n")).count() === 0)
    // the world is dense enough that most probes find 3 neighbours in 150 km
    assert(out.select("qid").distinct().count() > 50000)
    // spot parity: 50 grid probes against the service path
    val sample = probes.filter(col("qid") % 2000 === 0)
    val svc = GeoQueries.knnForProbes(spark, sfDir, sample, k = 3, pruneM = 150000.0)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val bat = out.join(sample, "qid")
      .select("qid", "rank", "pid", "dist_m")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(bat === svc)
  }

  test("enclave PIP: hole points exist, are excluded, and ring points are kept (set-exact)") {
    val pts = GeoWorld.points(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(3), r.getDouble(4))) // pid, lon, lat
    val (ox0, ox1, oy0, oy1) = GeoWorld.ENCLAVE_OUTER
    val (hx0, hx1, hy0, hy1) = GeoWorld.ENCLAVE_HOLE
    // driver-side arithmetic truth, per state frame
    def stateLocal(lon: Double, lat: Double): (Double, Double) = {
      val xm = (lon - GeoWorld.LON0) * 1000.0
      val ym = (lat - GeoWorld.LAT0) * 1000.0
      (xm % 12000.0, ym % 7200.0)
    }
    def inRect(x: Double, y: Double, r: (Int, Int, Int, Int)) =
      x > r._1 && x < r._2 && y > r._3 && y < r._4
    val inHole = pts.filter { case (_, lon, lat) =>
      val (x, y) = stateLocal(lon, lat)
      inRect(x, y, (hx0, hx1, hy0, hy1))
    }.map(_._1).toSet
    val inDonut = pts.filter { case (_, lon, lat) =>
      val (x, y) = stateLocal(lon, lat)
      inRect(x, y, (ox0, ox1, oy0, oy1)) && !inRect(x, y, (hx0, hx1, hy0, hy1))
    }.map(_._1).toSet
    assert(inHole.nonEmpty, "fixture must place probe points INSIDE a hole")
    val got = GeoQueries.pipEnclave(spark, sfDir).select("pid").collect().map(_.getLong(0)).toSet
    assert(got === inDonut, "engine membership must equal outer-minus-hole arithmetic")
    assert(got.intersect(inHole).isEmpty, "every hole point is excluded")
  }

  test("enclave within: the four probe arms decide exact/hole/fuzzy membership per state") {
    val rows = GeoQueries.enclaveWithin(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val nStates = spark.read.parquet(s"$sfDir/nation.parquet").count()
    // j=0 exact (fuzzy=false) and j=2 fuzzy (fuzzy=true) admitted, per state
    assert(rows.length === 2 * nStates)
    val byJ = rows.groupBy { case (pid, _, _) => ((pid - 800000L) % 4).toInt }
    assert(byJ(0).forall(!_._3) && byJ(0).length === nStates)
    assert(byJ(2).forall(_._3) && byJ(2).length === nStates)
    assert(!byJ.contains(1), "a child INSIDE the hole is never admitted")
    assert(!byJ.contains(3), "0.769 straddler is below the fuzzy threshold")
    // each admitted pair binds a probe to ITS OWN state's donut
    rows.foreach { case (pid, eid, _) =>
      assert(eid === 700000L + (pid - 800000L) / 4)
    }
  }

  test("baarle PIP admits exactly the ring and ISLAND probes; holes and outside are excluded") {
    val rows = GeoQueries.pipBaarle(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // per class: j=0 (ring) and j=2 (island-in-hole, re-INCLUDED) admitted;
    // j=1 (hole A), j=3 (hole B), j=4 (outside) excluded
    assert(rows.map(_._2).toSet === Set(0, 2), "only ring and island probes may match")
    val nStates = GeoWorld.baarles(spark, sfDir).count()
    assert(rows.length === 2 * nStates, "every state contributes its ring AND island probe")
    // each admitted probe binds to ITS OWN state's baarle area
    rows.foreach { case (bpId, _, areaId) => assert(areaId === 950000L + bpId / 8) }
  }

  test("baarle polyfill equals JTS intersects over the two-polygon nested geometry (exact, no tangencies)") {
    import graft.cell.CellIndex
    val res = 10
    val n = 1L << res
    val w = CellIndex.LON_SPAN / n; val h = CellIndex.LAT_SPAN / n
    val got = GeoQueries.baarlePolyfill(spark, sfDir, res).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bs = GeoWorld.baarles(spark, sfDir)
      .select("area_id", "lon0", "lat0", "lon1", "lat1", "wkb").collect()
    val want = bs.flatMap { r =>
      val geom = graft.geom.Geo.fromWkb(r.getAs[Array[Byte]]("wkb"))
      val x0 = CellIndex.ix(r.getDouble(1), res); val x1 = CellIndex.ix(r.getDouble(3), res)
      val y0 = CellIndex.iy(r.getDouble(2), res); val y1 = CellIndex.iy(r.getDouble(4), res)
      for (x <- x0 to x1; y <- y0 to y1;
           rect = graft.geom.Geo.rect(
             CellIndex.LON_MIN + x * w, CellIndex.LAT_MIN + y * h,
             CellIndex.LON_MIN + (x + 1) * w, CellIndex.LAT_MIN + (y + 1) * h)
           if geom.intersects(rect))
        yield (r.getLong(0), CellIndex.encodeXY(x, y))
    }.toSet
    assert(got === want, "nested-enclave polyfill must equal the JTS intersects set exactly")
    // the island genuinely re-admits cells: strictly more cells than a
    // version that honours the holes but ignores polygon 2
    val holesOnly = bs.flatMap { r =>
      val mp = graft.geom.Geo.fromWkb(r.getAs[Array[Byte]]("wkb"))
        .asInstanceOf[org.locationtech.jts.geom.GeometryCollection]
        .getGeometryN(0).asInstanceOf[org.locationtech.jts.geom.MultiPolygon]
      val firstPolyOnly = mp.getGeometryN(0) // drops the island polygon
      val x0 = CellIndex.ix(r.getDouble(1), res); val x1 = CellIndex.ix(r.getDouble(3), res)
      val y0 = CellIndex.iy(r.getDouble(2), res); val y1 = CellIndex.iy(r.getDouble(4), res)
      for (x <- x0 to x1; y <- y0 to y1;
           rect = graft.geom.Geo.rect(
             CellIndex.LON_MIN + x * w, CellIndex.LAT_MIN + y * h,
             CellIndex.LON_MIN + (x + 1) * w, CellIndex.LAT_MIN + (y + 1) * h)
           if firstPolyOnly.intersects(rect))
        yield (r.getLong(0), CellIndex.encodeXY(x, y))
    }.toSet
    assert(holesOnly.subsetOf(got) && holesOnly.size < got.size,
      s"island must re-admit cells (${got.size} vs ${holesOnly.size} without polygon 2)")
  }

  test("enclave polyfill equals JTS intersects over the ring-list geometry (exact, no tangencies)") {
    import graft.cell.CellIndex
    val res = 10
    val n = 1L << res
    val w = CellIndex.LON_SPAN / n; val h = CellIndex.LAT_SPAN / n
    val got = GeoQueries.enclavePolyfill(spark, sfDir, res).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // JTS truth: every outer-bbox grid cell rect intersects-tested against
    // the ACTUAL donut geometry (hole honored)
    val donuts = GeoWorld.enclaves(spark, sfDir)
      .select("area_id", "lon0", "lat0", "lon1", "lat1", "wkb").collect()
    val want = donuts.flatMap { r =>
      val geom = graft.geom.Geo.fromWkb(r.getAs[Array[Byte]]("wkb"))
      val x0 = CellIndex.ix(r.getDouble(1), res); val x1 = CellIndex.ix(r.getDouble(3), res)
      val y0 = CellIndex.iy(r.getDouble(2), res); val y1 = CellIndex.iy(r.getDouble(4), res)
      for (x <- x0 to x1; y <- y0 to y1;
           rect = graft.geom.Geo.rect(
             CellIndex.LON_MIN + x * w, CellIndex.LAT_MIN + y * h,
             CellIndex.LON_MIN + (x + 1) * w, CellIndex.LAT_MIN + (y + 1) * h)
           if geom.intersects(rect))
        yield (r.getLong(0), CellIndex.encodeXY(x, y))
    }.toSet
    assert(got === want, "hole-aware polyfill must equal the JTS intersects set exactly")
    // and the hole genuinely removes cells: fewer than the full bbox grid
    val full = donuts.map { r =>
      val x0 = CellIndex.ix(r.getDouble(1), res); val x1 = CellIndex.ix(r.getDouble(3), res)
      val y0 = CellIndex.iy(r.getDouble(2), res); val y1 = CellIndex.iy(r.getDouble(4), res)
      (x1 - x0 + 1) * (y1 - y0 + 1)
    }.sum
    assert(got.size < full, s"${got.size} cells of $full bbox cells — the hole must cut some")
  }

  test("metro fuzzy-within: exact metros flagged fuzzy=false, straddlers admitted by the 0.9 branch only") {
    val rows = GeoQueries.metroFuzzy(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    // 25 states x (j=0 exact + j=1 fuzzy); j=2 (85% inside) excluded
    assert(rows.length === 50)
    rows.foreach { case (metroId, stateId, fuzzy) =>
      val ord = metroId - 300000L
      val j = ord % 4
      assert(stateId === 400000L + ord / 4, s"metro $metroId paired with wrong state")
      assert(j === 0L || j === 1L, s"85%-overlap metro $metroId must not be within")
      assert(fuzzy === (j == 1L), s"metro $metroId branch label wrong")
    }
  }

  test("areas dim cache evicts dead sessions and rebuilds rather than reusing") {
    GeoWorld.areas(spark, sfDir).count() // ensure populated
    assert(GeoWorld.cachedAreaEntries >= 1)
    // simulate every owning session having stopped (stopping the real
    // suite-shared context would kill the remaining suites)
    val purged = GeoWorld.purgeStoppedSessions(_ => true)
    assert(purged >= 1 && GeoWorld.cachedAreaEntries === 0)
    val rebuilt = GeoWorld.areas(spark, sfDir) // a fresh build, not a stale hit
    assert(rebuilt.count() === 4730L)
    assert(GeoWorld.cachedAreaEntries === 1)
  }

  test("radius query: cell-ring join result equals brute-force haversine filter") {
    val viaCells = GeoQueries.radius(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pts = GeoWorld.points(spark, sfDir).select("pid", "lon", "lat").collect()
    val probes = GeoQueries.probes(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val brute = (for {
      (qid, qlon, qlat) <- probes
      p <- pts if graft.geom.Geo.haversineM(p.getDouble(1), p.getDouble(2), qlon, qlat) <= 150000.0
    } yield (qid, p.getLong(0))).toSet
    assert(viaCells === brute)
  }

  test("tile assignment round-trips through cell bounds") {
    val t = GeoQueries.tileAssign(spark, sfDir, z = 7)
    assert(t.filter(col("tx") < 0 || col("ty") < 0 || col("tx") > 127 || col("ty") > 127).count() === 0)
    assert(t.count() === GeoWorld.points(spark, sfDir).count())
  }
}
