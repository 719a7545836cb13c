package graft

import graft.api.{AstJson, AstTranslator, GeoAst, TranslateError}
import graft.api.GeoAst._
import graft.query.GeoQueries
import org.apache.spark.sql.functions._

/** AST round-trip + translation suite (reference: QueryTranslatorSpec
  * right-projection checks; FlowsSpec WS round-trip with error messages). */
class AstSpec extends SparkSpec {

  private val nested: GeoAst =
    PoisFromArea("amenity", "cat_3", AreasFromArea(6, AreaByCoordinates(2, 6.0, 51.0)))

  test("JSON round-trips every AST shape including recursion") {
    val shapes: Seq[GeoAst] = Seq(
      AreaByCoordinates(6, 6.757, 51.431),
      AreaByName(9, "district_35"),
      AreasFromArea(9, AreaByCoordinates(6, 6.757, 51.431)),
      nested,
      PoisFromCoordinates("shop", 1.5, 44.5),
      Nearby(6.0, 51.0, 150000.0))
    shapes.foreach { a =>
      assert(AstJson.read(AstJson.write(a)) === Right(a))
    }
  }

  test("ScalaCheck property: JSON round-trips ARBITRARY ASTs incl. names with quotes/backslashes/control chars") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // names deliberately dense in JSON specials — the example-based escape
    // tests of round 2/3 become a property here
    val nameGen: Gen[String] = Gen.listOfN(8, Gen.frequency(
      4 -> Gen.alphaNumChar,
      2 -> Gen.oneOf('"', '\\', '/', ' '),
      1 -> Gen.oneOf('\n', '\t', '\u0000', '\u001f'),
      1 -> Gen.oneOf('é', 'ß', '中'))).map(_.mkString)
    val levelGen = Gen.oneOf(graft.gen.GeoWorld.ALL_LEVELS)
    val coordGen = Gen.chooseNum(-180.0, 180.0)
    val leafGen: Gen[GeoAst] = Gen.oneOf(
      for { l <- levelGen; x <- coordGen; y <- coordGen } yield AreaByCoordinates(l, x, y),
      for { l <- levelGen; n <- nameGen } yield AreaByName(l, n),
      for { k <- nameGen; x <- coordGen; y <- coordGen } yield PoisFromCoordinates(k, x, y),
      for { x <- coordGen; y <- coordGen; r <- Gen.chooseNum(1.0, 1e6) } yield Nearby(x, y, r),
      for { x <- coordGen; y <- coordGen; k <- Gen.chooseNum(1, 50) } yield NearbyRanked(x, y, k),
      for { n <- nameGen } yield PoiByName(n),
      for { a <- coordGen; b <- coordGen; c <- coordGen; d <- coordGen } yield BboxFetch(a, b, c, d),
      for { p <- nameGen; k <- Gen.chooseNum(1, 50); m <- Gen.chooseNum(1.0, 1e6) } yield KnnBatch(p, k, m),
      for { v <- Gen.chooseNum(-1, 99) } yield SnapshotRead(v),
      for { q <- nameGen; k <- Gen.chooseNum(1, 50) } yield NameSearch(q, k))
    def astGen(depth: Int): Gen[GeoAst] =
      if (depth <= 0) leafGen
      else Gen.frequency(
        2 -> leafGen,
        1 -> (for { l <- levelGen; p <- astGen(depth - 1) } yield AreasFromArea(l, p)),
        1 -> (for { k <- nameGen; v <- nameGen; a <- astGen(depth - 1) } yield PoisFromArea(k, v, a)))
    val gen = astGen(4)
    (0 until 300).foreach { i =>
      val ast = gen(Gen.Parameters.default, Seed(i.toLong)).getOrElse(fail(s"gen $i produced nothing"))
      val json = AstJson.write(ast)
      assert(AstJson.read(json) === Right(ast), s"seed $i, json: $json")
    }
  }

  test("NearbyRanked translates to the exact ring-widening kNN (brute-force parity)") {
    val (qlon, qlat, k) = (6.0, 51.0, 7)
    val Right(df) = AstTranslator.translate(spark, sfDir, NearbyRanked(qlon, qlat, k)): @unchecked
    val got = df.orderBy(col("rank")).collect().map(r => (r.getAs[Int]("rank"), r.getAs[Long]("pid")))
    val brute = graft.gen.GeoWorld.points(spark, sfDir).select("pid", "lon", "lat").collect()
      .map(p => (graft.geom.Geo.haversineM(p.getDouble(1), p.getDouble(2), qlon, qlat), p.getLong(0)))
      .sortBy(identity).take(k)
    assert(got.length === k)
    assert(got.map(_._2).toSeq === brute.map(_._2).toSeq)
    assert(got.map(_._1).toSeq === (1 to k))
    // invalid k -> typed error
    assert(AstTranslator.translate(spark, sfDir, NearbyRanked(0, 0, 0))
      .left.exists(_.isInstanceOf[TranslateError.CouldNotCreateInputQuery]))
  }

  test("PoiByName translates to the name-prefix search; empty prefix is a typed error") {
    val Right(df) = AstTranslator.translate(spark, sfDir, PoiByName("poi_10")): @unchecked
    val got = df.select("name").collect().map(_.getString(0))
    assert(got.nonEmpty)
    assert(got.forall(_.startsWith("poi_10")))
    assert(AstTranslator.translate(spark, sfDir, PoiByName(""))
      .left.exists(_.isInstanceOf[TranslateError.CouldNotCreateInputQuery]))
  }

  test("malformed / unknown JSON yields error messages, not exceptions") {
    assert(AstJson.read("""{"type":"FlyingQuery"}""").isLeft)
    assert(AstJson.read("""{"type":"Nearby","lon":1}""").isLeft)
    assert(AstJson.read("""{{{""").isLeft)
    assert(AstJson.read("""{"type":"Nearby","lon":1,"lat":2,"radiusM":3} x""").isLeft)
  }

  test("AreaByCoordinates translation matches the PIP query") {
    val Right(df) = AstTranslator.translate(spark, sfDir, AreaByCoordinates(6, -19.0, 31.0)): @unchecked
    val rows = df.select("area_id").collect().map(_.getLong(0))
    assert(rows.length === 1)
    // point (-19, 31) is in region 0, first nation band
    val expected = GeoQueries.pipLookup(spark, sfDir, level = 6)
      .join(graft.gen.GeoWorld.points(spark, sfDir), "pid")
      .filter(col("lon").between(-19.5, -18.5) && col("lat").between(30.5, 31.5))
      .select("area_id").distinct().collect().map(_.getLong(0))
    assert(expected.contains(rows.head))
  }

  test("recursive translation composes: POIs of the cities of a country") {
    val Right(df) = AstTranslator.translate(spark, sfDir, nested): @unchecked
    val got = df.select("area_id", "pid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.nonEmpty)
    // independent arithmetic truth: every tagged point in region 2's frame,
    // mapped to its city id 600000 + nationkey*6 + floor(local_lon/2)
    // (point (6.0, 51.0) lies in region floor((6+20)/12) = 2)
    import graft.gen.GeoWorld._
    val expected = graft.gen.GeoWorld.points(spark, sfDir)
      .filter(col("tag_k") === "amenity" && col("tag_v") === "cat_3")
      .select("pid", "lon", "lat").collect()
      .flatMap { r =>
        val lon = r.getDouble(1); val lat = r.getDouble(2)
        val g = math.floor((lon - LON0) / REGION_W).toInt
        if (g != 2) None
        else {
          val idx = math.floor((lat - LAT0) / NATION_H).toInt
          val nk = nationKeyOf(g, idx)
          val jx = math.floor((lon - (LON0 + g * REGION_W)) / 2.0).toLong
          Some((600000L + nk * 6 + jx, r.getLong(0)))
        }
      }.toSet
    assert(got === expected)
  }

  test("chained recursion over >= 3 adjacent levels: cities of regions of states of a country") {
    val chain = AreasFromArea(6, AreasFromArea(5, AreasFromArea(4, AreaByName(2, "country_2"))))
    val Right(df) = AstTranslator.translate(spark, sfDir, chain): @unchecked
    val cities = df.select("area_id").collect().map(_.getLong(0))
    assert(cities.length === 30) // 5 states x 2 regions x 3 cities
    assert(cities.distinct.length === 30)
    assert(cities.forall(id => id >= 600000L && id < 700000L))
    // full-ladder chain to communities: 480 per country
    assert(AstTranslator.areaChain(spark, sfDir, "country_2").count() === 480L)
  }

  private lazy val nationKeyOf: Map[(Int, Int), Long] = {
    val rows = spark.read.parquet(s"$sfDir/nation.parquet").collect()
      .map(r => (r.getAs[Int]("n_regionkey"), r.getAs[Int]("n_nationkey")))
    rows.groupBy(_._1).flatMap { case (g, ks) =>
      ks.map(_._2).sorted.zipWithIndex.map { case (nk, idx) => (g, idx) -> nk.toLong }
    }
  }

  test("Nearby derives its ring from the radius: large radii return every match, absurd ones are rejected") {
    import graft.gen.GeoWorld
    val (qlon, qlat) = (6.0, 51.0)
    val r = 400000.0 // round-1 fixed k=6 ring guaranteed only ~190 km
    val Right(df) = AstTranslator.translate(spark, sfDir, Nearby(qlon, qlat, r)): @unchecked
    val got = df.select("pid").collect().map(_.getLong(0)).toSet
    val brute = GeoWorld.points(spark, sfDir).select("pid", "lon", "lat").collect()
      .filter(p => graft.geom.Geo.haversineM(p.getDouble(1), p.getDouble(2), qlon, qlat) <= r)
      .map(_.getLong(0)).toSet
    assert(got === brute)
    assert(got.size > 100) // the radius genuinely reaches beyond the old fixed ring
    // a planet-scale radius at this resolution needs an absurd ring -> error, not silence
    val huge = AstTranslator.translate(spark, sfDir, Nearby(qlon, qlat, 2.0e7))
    assert(huge.left.exists(_.isInstanceOf[TranslateError.CouldNotCreateInputQuery]))
  }

  test("BboxFetch translates to the cover+refine fetch; lonMin > lonMax WRAPS across the dateline") {
    import graft.gen.GeoWorld
    val pts = GeoWorld.points(spark, sfDir).select("pid", "lon", "lat").collect()
      .map(p => (p.getLong(0), p.getDouble(1), p.getDouble(2)))
    // plain bbox
    val Right(plain) = AstTranslator.translate(spark, sfDir, BboxFetch(-18.0, 31.0, -10.0, 36.0)): @unchecked
    val wantPlain = pts.filter(p => p._2 > -18.0 && p._2 < -10.0 && p._3 > 31.0 && p._3 < 36.0).map(_._1).toSet
    assert(plain.select("pid").collect().map(_.getLong(0)).toSet === wantPlain)
    assert(wantPlain.nonEmpty)
    // dateline-crossing bbox (lonMin > lonMax): the wrapped refine admits
    // lon > 170 OR lon < -10 — a clamp-only cover would return ZERO rows
    val Right(wrap) = AstTranslator.translate(spark, sfDir, BboxFetch(170.0, 31.0, -10.0, 36.0)): @unchecked
    val wantWrap = pts.filter(p => (p._2 > 170.0 || p._2 < -10.0) && p._3 > 31.0 && p._3 < 36.0).map(_._1).toSet
    assert(wrap.select("pid").collect().map(_.getLong(0)).toSet === wantWrap)
    assert(wantWrap.nonEmpty, "the wrap must reach the world's western points")
    // malformed boxes are typed errors
    assert(AstTranslator.translate(spark, sfDir, BboxFetch(0, 50, 10, 40))
      .left.exists(_.isInstanceOf[TranslateError.CouldNotCreateInputQuery]))
    assert(AstTranslator.translate(spark, sfDir, BboxFetch(-200, 0, 10, 1))
      .left.exists(_.isInstanceOf[TranslateError.CouldNotCreateInputQuery]))
    // lonMin == lonMax is ambiguous on the wire (lo0 > lo1 means wrap, so
    // "equal" is neither empty nor full) — a typed error, never silent
    // zero rows (round-6 ADVICE)
    assert(AstTranslator.translate(spark, sfDir, BboxFetch(10, 31, 10, 36))
      .left.exists(_.isInstanceOf[TranslateError.CouldNotCreateInputQuery]))
  }

  test("SnapshotRead time-travels the snapshot index; unknown versions and probe sets are typed errors") {
    // v1: everything ver=1; v2 (current): pid%3==0 re-versioned to 2
    val Right(v1) = AstTranslator.translate(spark, sfDir, SnapshotRead(1)): @unchecked
    assert(v1.filter(col("ver") =!= 1L).count() === 0L)
    val Right(v2) = AstTranslator.translate(spark, sfDir, SnapshotRead(2)): @unchecked
    assert(v2.filter(col("ver") === 2L).count() > 0L)
    assert(v2.filter(col("pid") % 3 === 0 && col("ver") =!= 2L).count() === 0L)
    assert(v1.count() === v2.count(), "the upsert only re-versions existing keys")
    // -1 = current
    val Right(cur) = AstTranslator.translate(spark, sfDir, SnapshotRead(-1)): @unchecked
    assert(cur.filter(col("ver") === 2L).count() === v2.filter(col("ver") === 2L).count())
    // out-of-range version and bad knn inputs are typed errors, not exceptions
    assert(AstTranslator.translate(spark, sfDir, SnapshotRead(99))
      .left.exists(_.isInstanceOf[TranslateError.CouldNotCreateInputQuery]))
    assert(AstTranslator.translate(spark, sfDir, KnnBatch("grid", 0, 1000.0))
      .left.exists(_.isInstanceOf[TranslateError.CouldNotCreateInputQuery]))
    assert(AstTranslator.translate(spark, sfDir, KnnBatch("nonexistent", 3, 1000.0))
      .left.exists(_.isInstanceOf[TranslateError.CouldNotCreateInputQuery]))
  }

  test("NameSearch translates to the ranked inverted-index search; empty query / bad k are typed errors") {
    val Right(df) = AstTranslator.translate(spark, sfDir, NameSearch("state 7", 12)): @unchecked
    val got = df.orderBy(col("rank")).collect().map(_.toSeq)
    val direct = graft.query.GeoQueries.nameRanked(spark, sfDir).orderBy(col("rank")).collect().map(_.toSeq)
    assert(got.toSeq === direct.toSeq)
    assert(AstTranslator.translate(spark, sfDir, NameSearch("  ", 5))
      .left.exists(_.isInstanceOf[TranslateError.CouldNotCreateInputQuery]))
    assert(AstTranslator.translate(spark, sfDir, NameSearch("state", 0))
      .left.exists(_.isInstanceOf[TranslateError.CouldNotCreateInputQuery]))
  }

  test("invalid admin level is a CouldNotCreateInputQuery, not an exception") {
    val r = AstTranslator.translate(spark, sfDir, AreaByCoordinates(42, 0, 0))
    assert(r.left.exists(_.isInstanceOf[TranslateError.CouldNotCreateInputQuery]))
  }

  test("PoisFromCoordinates has no geometric refine (Q7 reproduced as-is)") {
    val Right(df) = AstTranslator.translate(spark, sfDir, PoisFromCoordinates("shop", -19.0, 31.0)): @unchecked
    // all results share the probe's mid-res cell — nothing else filtered
    import graft.cell.CellIndex
    val cell = CellIndex.encode(-19.0, 31.0, CellIndex.RES_MID)
    df.collect().foreach { r =>
      val lon = r.getAs[Double]("lon"); val lat = r.getAs[Double]("lat")
      assert(CellIndex.encode(lon, lat, CellIndex.RES_MID) === cell)
    }
  }
}
