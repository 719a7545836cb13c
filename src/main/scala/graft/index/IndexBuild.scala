package graft.index

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.cell.{CellFunctions, CellIndex, CellSql}
import graft.gen.GeoWorld
import graft.query.GeoQueries

/**
 * Write-side index builders — the reference ingest pipeline's derived
 * tables (SURVEY.md §2.2): id→cell mapping (T7), cell→object (T8), the
 * cell×tag cover explode (T9, mirroring `osm_*_bb_tag`), and the relation
 * assembly two-step join (T4).
 */
object IndexBuild {

  import CellIndex.{RES_COARSE, RES_MID}

  private def init(spark: SparkSession): Unit = GeoWorld.registerUdfs(spark)

  // -------------------------------------------------- T7: id→cell mapping

  /** id → principal-cell mapping table (reference `OsmMapping`,
    * dal/.../OsmMapping.scala:23-25; precision ladder by type T12:
    * points at the 20 km analog). */
  def mappingTable(spark: SparkSession, sfDir: String): DataFrame = {
    init(spark)
    GeoWorld.points(spark, sfDir).select(
      col("pid"),
      CellFunctions.zcell(col("lon"), col("lat"), lit(RES_MID)).as("cell"))
  }

  val mappingTableSql: String =
    GeoQueries.withWorld() +
      s"""SELECT pid, ${CellSql.encode("lon", "lat", RES_MID)} AS cell
         |FROM pts""".stripMargin

  // ------------------------------------------- T9: cell×tag cover explode

  /**
   * The write-side "polyfill" that powers every (cell, tag) lookup
   * (reference ProcessingUtilities.scala:33-43): each area's cover cells x
   * its tag list, exploded to one row per (cell, tag_k, tag_v, area_id).
   * Tags here: boundary=administrative + admin_level=<level> — the tags the
   * reference's area queries key on (Queries.scala:343-350).
   */
  def cellTagTable(spark: SparkSession, sfDir: String): DataFrame = {
    init(spark)
    val areas = GeoWorld.areas(spark, sfDir)
    val tagged = areas.select(
      col("area_id"), col("lon0"), col("lat0"), col("lon1"), col("lat1"),
      explode(array(
        struct(lit("boundary").as("tag_k"), lit("administrative").as("tag_v")),
        struct(lit("admin_level").as("tag_k"), col("level").cast("string").as("tag_v")))).as("tag"))
    tagged.select(
      col("area_id"), col("tag.tag_k").as("tag_k"), col("tag.tag_v").as("tag_v"),
      explode(GeoWorld.coverCells(col("lon0"), col("lat0"), col("lon1"), col("lat1"), RES_COARSE)).as("cell"))
  }

  /** Oracle: the rectangle cover is enumerable in SQL — generate the x/y
    * index ranges with RANGE() and re-interleave with the spread chain. */
  val cellTagTableSql: String = {
    val r = RES_COARSE
    GeoQueries.withWorld(
      s"""tagged AS (
         |  SELECT area_id, lon0, lat0, lon1, lat1, 'boundary' AS tag_k, 'administrative' AS tag_v FROM areas
         |  UNION ALL
         |  SELECT area_id, lon0, lat0, lon1, lat1, 'admin_level', CAST(level AS VARCHAR) FROM areas
         |)""".stripMargin) +
      s"""SELECT t.area_id, t.tag_k, t.tag_v,
         |       ((${CellSql.spread("xs.x")} << 1) | ${CellSql.spread("ys.y")}) AS cell
         |FROM tagged t
         |CROSS JOIN LATERAL (SELECT UNNEST(RANGE(${CellSql.ix("t.lon0", r)}, ${CellSql.ix("t.lon1", r)} + 1)) AS x) xs
         |CROSS JOIN LATERAL (SELECT UNNEST(RANGE(${CellSql.iy("t.lat0", r)}, ${CellSql.iy("t.lat1", r)} + 1)) AS y) ys""".stripMargin
  }

  // -------------------------------- bucketed co-located join (north-star)

  /**
   * Write the mapping and feature tables BUCKETED by cell (hash-bucketed,
   * sorted within buckets): two tables bucketed the same way join WITHOUT
   * any exchange — at 100 TB this converts every recurring (cell, id)
   * lookup join (S5) from a full shuffle of both sides into a zero-shuffle
   * sort-merge over co-located buckets. The pre-shuffle is paid ONCE at
   * write time, amortised over every subsequent join (the Spark analog of
   * the reference keeping both Cassandra tables partitioned by cell).
   */
  def writeBucketedIndex(spark: SparkSession, sfDir: String, buckets: Int = 16): Unit = {
    init(spark)
    // drop catalog entries AND any stale warehouse directories (a previous
    // JVM's managed-table location blocks CREATE even after DROP)
    Seq("graft_mapping_b", "graft_features_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
      def rm(f: java.io.File): Unit = { Option(f.listFiles).foreach(_.foreach(rm)); f.delete() }
      val loc = new java.io.File(wh, t)
      if (loc.exists) rm(loc)
    }
    mappingTable(spark, sfDir)
      .write.bucketBy(buckets, "cell").sortBy("cell")
      .mode("overwrite").format("parquet").saveAsTable("graft_mapping_b")
    GeoWorld.points(spark, sfDir)
      .withColumn("cell", CellFunctions.zcell(col("lon"), col("lat"), lit(RES_MID)))
      .write.bucketBy(buckets, "cell").sortBy("cell")
      .mode("overwrite").format("parquet").saveAsTable("graft_features_b")
  }

  /** The co-located (cell, id) fetch join over the bucketed tables — its
    * physical plan must contain NO shuffle exchange (asserted in
    * PipelineSpec). The merge hint forces the join shape the tables would
    * get at 100 TB anyway (neither side broadcastable); at toy scale the
    * planner would broadcast and skip the bucketing being demonstrated. */
  def bucketedFetch(spark: SparkSession): DataFrame = {
    val m = spark.table("graft_mapping_b")
    val f = spark.table("graft_features_b").select(col("cell"), col("pid").as("fpid"), col("name"))
    m.hint("merge").join(f, m("cell") === f("cell") && m("pid") === f("fpid"))
      .select(m("cell"), m("pid"), col("name"))
  }

  // ------------------------------------- T4: relation assembly (2 joins)

  /**
   * Relation denormalisation — the reference's JOIN #2 (RelationFlow.scala:
   * 29-76): member refs -> mapping lookup (join 1: ref -> cell) -> data
   * lookup (join 2: (cell, id) -> feature) -> group by relation, ordered
   * assembly into a GeometryCollection WKT. Both joins are genuine
   * equi-joins against the derived tables, exactly the reference's two
   * chained KV lookups re-expressed relationally.
   *
   * MIXED members (reference splits members into point/line/geometry maps
   * and assembles all of them — RelationFlow.scala:44-58): every member
   * contributes a POINT in span order, and a relation whose point-kind
   * spans number ≥ 2 ALSO carries a LINESTRING member over those spans
   * (the reference's way-member path: resolved refs -> a line -> nested in
   * the collection), appended after the points like the reference's
   * points-then-lines map order.
   */
  def relationAssemble(spark: SparkSession, sfDir: String): DataFrame = {
    init(spark)
    val refs = GeoWorld.docs(spark, sfDir)
      .select(col("doc_id"), explode(col("spans")).as("s"))
      .select(col("doc_id"), col("s.offset").as("off"), col("s.kind").as("kind"),
        (split(col("doc_id"), "_").getItem(1).cast("long") * 8 + col("s.offset")).as("ref"))
    val mapping = mappingTable(spark, sfDir) // join 1: ref -> cell
    val features = GeoWorld.points(spark, sfDir)
      .select(col("pid"), col("lonm"), col("latm"),
        CellFunctions.zcell(col("lon"), col("lat"), lit(RES_MID)).as("cell"))
    val xy = concat(col("lonm").cast("string"), lit(" "), col("latm").cast("string"))
    val grouped = refs
      .join(mapping, refs("ref") === mapping("pid"))
      .drop("pid")
      .join(features, Seq("cell")).where(col("ref") === features("pid")) // join 2: (cell, id)
      .select(col("doc_id"), struct(col("off"), col("kind"), xy.as("xy")).as("m"))
      .groupBy("doc_id")
      .agg(array_sort(collect_list(col("m"))).as("ms"))
    val linePts = filter(col("ms"), m => m.getField("kind") === "point")
    val hasLine = size(linePts) >= 2
    grouped.select(col("doc_id"),
      concat(lit("GEOMETRYCOLLECTION("),
        concat_ws(",", transform(col("ms"), m => concat(lit("POINT("), m.getField("xy"), lit(")")))),
        when(hasLine,
          concat(lit(",LINESTRING("),
            concat_ws(",", transform(linePts, m => m.getField("xy"))),
            lit(")"))).otherwise(lit("")),
        lit(")")).as("wkt"),
      (size(col("ms")) + when(hasLine, 1).otherwise(0)).as("n_members"))
  }

  val relationAssembleSql: String = {
    val xy = """CAST(p.lonm AS VARCHAR) || ' ' || CAST(p.latm AS VARCHAR)"""
    GeoQueries.withWorld() +
      s"""SELECT doc_id,
         |       'GEOMETRYCOLLECTION(' || STRING_AGG('POINT(' || $xy || ')', ',' ORDER BY s."offset")
         |       || CASE WHEN COUNT(*) FILTER (WHERE s.kind = 'point') >= 2
         |               THEN ',LINESTRING(' || STRING_AGG($xy, ',' ORDER BY s."offset") FILTER (WHERE s.kind = 'point') || ')'
         |               ELSE '' END
         |       || ')' AS wkt,
         |       CAST(COUNT(*) + CASE WHEN COUNT(*) FILTER (WHERE s.kind = 'point') >= 2 THEN 1 ELSE 0 END AS INTEGER) AS n_members
         |FROM spansf s JOIN pts p ON p.pid = s.pid
         |GROUP BY doc_id""".stripMargin
  }

  /**
   * Relation assembly with TRUE two-hop members (round-3 missing item #2;
   * reference RelationFlow.scala:29-58): besides its own point members, a
   * relation references a WAY — another document — whose geometry is the
   * wayAssemble OUTPUT (the LineString assembled from THAT doc's ordered,
   * resolved spans), fetched exactly like the reference's member path:
   * member ref → way MAPPING (id → principal cell) → (cell, id) fetch from
   * the assembled-way data table. The fetched LineString nests into the
   * GeometryCollection after the point members (the reference's
   * points-then-lines map order).
   *
   * Member wiring (deterministic, oracle-recomputable): relation `doc_d`
   * references way `doc_{d+1}` when that doc exists with ≥ 2 resolved
   * members; relations at ordinal gaps simply have no way member.
   *
   * Scale: every hop is a keyed equi-join — spans→mapping (ref), mapping→
   * features (cell, id), relation→way-mapping (way id), way-mapping→
   * way-data (cell, id). With the bucketed tables of
   * [[writeBucketedIndex]] the (cell, id) fetches are the zero-shuffle
   * co-located join; nothing here is ever quadratic.
   */
  def relationMixed(spark: SparkSession, sfDir: String): DataFrame = {
    init(spark)
    val refs = GeoWorld.docs(spark, sfDir)
      .select(col("doc_id"), explode(col("spans")).as("s"))
      .select(col("doc_id"), col("s.offset").as("off"),
        (split(col("doc_id"), "_").getItem(1).cast("long") * 8 + col("s.offset")).as("ref"))
    val mapping = mappingTable(spark, sfDir) // JOIN #1: ref -> cell
    val features = GeoWorld.points(spark, sfDir)
      .select(col("pid"), col("lonm"), col("latm"),
        CellFunctions.zcell(col("lon"), col("lat"), lit(RES_MID)).as("cell"))
    val xy = concat(col("lonm").cast("string"), lit(" "), col("latm").cast("string"))
    val resolved = refs
      .join(mapping, refs("ref") === mapping("pid")).drop("pid")
      .join(features, Seq("cell")).where(col("ref") === features("pid")) // JOIN #2
      .select(col("doc_id"), col("off"), col("cell"), xy.as("xy"))
    val relPts = resolved
      .select(col("doc_id"), struct(col("off"), col("xy")).as("m"))
      .groupBy("doc_id").agg(array_sort(collect_list(col("m"))).as("ms"))
      .withColumn("ord", split(col("doc_id"), "_").getItem(1).cast("long"))
    // assembled-way data table (wayAssemble output) keyed by principal cell
    val wayData = resolved.groupBy("doc_id")
      .agg(array_sort(collect_list(struct(col("off"), col("xy")))).as("ss"),
        min_by(col("cell"), col("off")).as("wcell"))
      .filter(size(col("ss")) >= 2)
      .select(col("doc_id").as("way_id"), col("wcell"),
        concat_ws(",", transform(col("ss"), s => s.getField("xy"))).as("line"))
    val wayMapping = wayData.select(col("way_id").as("m_way_id"), col("wcell").as("m_cell"))
    val withWay = relPts
      .withColumn("way_ref", concat(lit("doc_"), (col("ord") + 1).cast("string")))
      .join(wayMapping, col("way_ref") === col("m_way_id"), "left") // member -> mapping
      .join(wayData, // (cell, id) fetch of the assembled way
        col("m_cell") === wayData("wcell") && col("way_ref") === wayData("way_id"), "left")
    withWay.select(col("doc_id"),
      concat(lit("GEOMETRYCOLLECTION("),
        concat_ws(",", transform(col("ms"), m => concat(lit("POINT("), m.getField("xy"), lit(")")))),
        when(col("line").isNotNull,
          concat(lit(",LINESTRING("), col("line"), lit(")"))).otherwise(lit("")),
        lit(")")).as("wkt"),
      (size(col("ms")) + when(col("line").isNotNull, 1).otherwise(0)).as("n_members"))
  }

  val relationMixedSql: String = {
    val xy = """CAST(p.lonm AS VARCHAR) || ' ' || CAST(p.latm AS VARCHAR)"""
    GeoQueries.withWorld(
      s"""resolved AS (
         |  SELECT s.doc_id, s."offset" AS "offset", $xy AS xy
         |  FROM spansf s JOIN pts p ON p.pid = s.pid
         |)""".stripMargin,
      """relpts AS (
        |  SELECT doc_id, CAST(SPLIT_PART(doc_id, '_', 2) AS BIGINT) AS ord,
        |         STRING_AGG('POINT(' || xy || ')', ',' ORDER BY "offset") AS pts_s,
        |         COUNT(*) AS n_pts
        |  FROM resolved GROUP BY doc_id
        |)""".stripMargin,
      """ways AS (
        |  SELECT doc_id AS way_id, STRING_AGG(xy, ',' ORDER BY "offset") AS line
        |  FROM resolved GROUP BY doc_id HAVING COUNT(*) >= 2
        |)""".stripMargin) +
      """SELECT r.doc_id,
        |       'GEOMETRYCOLLECTION(' || r.pts_s ||
        |       CASE WHEN w.line IS NOT NULL THEN ',LINESTRING(' || w.line || ')' ELSE '' END
        |       || ')' AS wkt,
        |       CAST(r.n_pts + CASE WHEN w.line IS NOT NULL THEN 1 ELSE 0 END AS INTEGER) AS n_members
        |FROM relpts r LEFT JOIN ways w ON w.way_id = 'doc_' || CAST(r.ord + 1 AS VARCHAR)""".stripMargin
  }

  // ----------------------------------------------- Q18: GeoJSON serialise

  /** Fixed-point decimal string from integer micro-degrees (both engines
    * format integers identically; doubles would not round-trip). */
  private def microToDec(micro: Column): Column = {
    val neg = micro < 0
    val a = abs(micro)
    val ip = floor(a / 1000000).cast("long")
    val fp = (a % 1000000).cast("long")
    concat(when(neg, "-").otherwise(""), ip.cast("string"), lit("."),
      lpad(fp.cast("string"), 6, "0"))
  }

  private def microToDecSql(micro: String): String =
    s"""(CASE WHEN ($micro) < 0 THEN '-' ELSE '' END || CAST(ABS($micro) // 1000000 AS VARCHAR) || '.' || lpad(CAST(ABS($micro) % 1000000 AS VARCHAR), 6, '0'))"""

  /** JSON string-value escape for property payloads (backslash first, then
    * quote — the two characters a name/id could legally smuggle into the
    * feature JSON). Mirrored in [[jsonEscapeSql]] so both engines emit the
    * same bytes even on corpora that DO contain specials. */
  private[graft] def jsonEscape(c: Column): Column =
    call_function("replace",
      call_function("replace", c, lit("\\"), lit("\\\\")),
      lit("\""), lit("\\\""))

  private def jsonEscapeSql(x: String): String =
    s"""replace(replace($x, '\\', '\\\\'), '"', '\\"')"""

  // Exact micro-degree conversion, derived ONCE from the world constants
  // (LON0/LAT0/OFF x 1e6) and shared by both GeoJSON queries and their
  // oracles -- a change to the world origin cannot leave a stale literal.
  private val LONM0: Long = (GeoWorld.LON0 * 1000000L).toLong
  private val LATM0: Long = (GeoWorld.LAT0 * 1000000L).toLong
  private val OFFM: Long = math.round(GeoWorld.OFF * 1000000)
  private def lonMicroOf(lonm: Column): Column = lit(LONM0) + lonm * 1000L + OFFM
  private def latMicroOf(latm: Column): Column = lit(LATM0) + latm * 1000L + OFFM
  private def lonMicroSqlOf(c: String): String = s"($LONM0 + $c * 1000 + $OFFM)"
  private def latMicroSqlOf(c: String): String = s"($LATM0 + $c * 1000 + $OFFM)"

  /** GeoJSON Feature serialisation (reference Q18, Flows.scala:92-97):
    * point features as GeoJSON strings, coordinates from exact integer
    * micro-degrees. */
  def geojson(spark: SparkSession, sfDir: String): DataFrame = {
    init(spark)
    val lonMicro = lonMicroOf(col("lonm"))
    val latMicro = latMicroOf(col("latm"))
    GeoWorld.points(spark, sfDir).select(
      col("pid"),
      concat(
        lit("""{"type":"Feature","geometry":{"type":"Point","coordinates":["""),
        microToDec(lonMicro), lit(","), microToDec(latMicro),
        lit("""]},"properties":{"name":""""), jsonEscape(col("name")),
        lit("""","""), lit(""""k":""""), col("tag_k"), lit("""","v":""""), col("tag_v"),
        lit(""""}}""")).as("feature"))
  }

  private val geojsonBody: String = {
    val lonMicro = lonMicroSqlOf("lonm")
    val latMicro = latMicroSqlOf("latm")
    s"""SELECT pid,
       |  '{"type":"Feature","geometry":{"type":"Point","coordinates":[' ||
       |  ${microToDecSql(lonMicro)} || ',' || ${microToDecSql(latMicro)} ||
       |  ']},"properties":{"name":"' || ${jsonEscapeSql("name")} || '","k":"' || tag_k || '","v":"' || tag_v || '"}}' AS feature
       |FROM pts""".stripMargin
  }

  val geojsonSql: String = GeoQueries.withWorld() + geojsonBody

  /**
   * GeoJSON for NON-point geometries (round-2 missing item; reference
   * serialises every denormalised object type — query-engine/.../Flows
   * .scala:92-97): each doc's resolved spans (the way-assembly output,
   * [[graft.query.GeoQueries.wayAssemble]] shape) become ONE feature —
   * LineString when the doc has ≥ 2 resolved coordinates, Point otherwise —
   * so the output genuinely mixes geometry types. Coordinates are exact
   * fixed-point micro-degree strings like [[geojson]].
   */
  def geojsonWay(spark: SparkSession, sfDir: String): DataFrame = {
    init(spark)
    val refs = GeoWorld.docs(spark, sfDir)
      .select(col("doc_id"), explode(col("spans")).as("s"))
      .select(col("doc_id"), col("s.offset").as("off"),
        (split(col("doc_id"), "_").getItem(1).cast("long") * 8 + col("s.offset")).as("ref"))
    val nodes = GeoWorld.points(spark, sfDir).select(col("pid"), col("lonm"), col("latm"))
    val xyJson = concat(lit("["),
      microToDec(lonMicroOf(col("lonm"))), lit(","),
      microToDec(latMicroOf(col("latm"))), lit("]"))
    val props = concat(lit("""},"properties":{"doc_id":""""), jsonEscape(col("doc_id")), lit(""""}}"""))
    refs.join(nodes, refs("ref") === nodes("pid"))
      .select(col("doc_id"), struct(col("off"), xyJson.as("xy")).as("s"))
      .groupBy("doc_id")
      .agg(array_sort(collect_list(col("s"))).as("ss"))
      .select(col("doc_id"),
        when(size(col("ss")) >= 2,
          concat(lit("""{"type":"Feature","geometry":{"type":"LineString","coordinates":["""),
            concat_ws(",", transform(col("ss"), s => s.getField("xy"))), lit("]"), props))
          .otherwise(
            concat(lit("""{"type":"Feature","geometry":{"type":"Point","coordinates":"""),
              element_at(col("ss"), 1).getField("xy"), props))
          .as("feature"))
  }

  /**
   * GeoJSON for AREA geometries — the reference's primary product output
   * ("give me the boundary as GeoJSON"; Flows.scala:92-97 serialises EVERY
   * denormalised type, areas included, via geow's `toGeoJsonString`). Round-3
   * missing item #1: the catalog had Point + LineString branches only.
   *
   * Geometry-type dispatch mirrors the reference's stored denormalised
   * shape: country/state rows (level ≤ 4) serialise the full
   * GeometryCollection(MultiPolygon(ring)) relation shape; sub-state levels
   * serialise the plain Polygon — so the output genuinely mixes
   * Polygon and GeometryCollection/MultiPolygon features in one column.
   *
   * Coordinates: every rect corner lies on the integer MILLI-degree grid
   * (GeoWorld invariant), so `ROUND((corner − origin) × 1000)` recovers the
   * integer exactly in BOTH engines (same IEEE double ops) and the string
   * is the same exact fixed-point formatting as [[geojson]].
   */
  // Shared micro-degree GeoJSON formatting (Column + SQL twins) — the
  // milli-degree rounding here IS the engine/oracle parity contract for
  // every area serialiser; one definition so a precision tweak can never
  // reach one family and miss the other (review finding).
  private def gjLonM(c: Column): Column = lit(LONM0) + round((c - lit(GeoWorld.LON0)) * 1000).cast("long") * 1000L
  private def gjLatM(c: Column): Column = lit(LATM0) + round((c - lit(GeoWorld.LAT0)) * 1000).cast("long") * 1000L
  private def gjPt(x: Column, y: Column): Column =
    concat(lit("["), microToDec(x), lit(","), microToDec(y), lit("]"))
  private def gjLonMSql(c: String) = s"($LONM0 + CAST(ROUND(($c - ${GeoWorld.LON0}) * 1000) AS BIGINT) * 1000)"
  private def gjLatMSql(c: String) = s"($LATM0 + CAST(ROUND(($c - ${GeoWorld.LAT0}) * 1000) AS BIGINT) * 1000)"
  private def gjPtSql(x: String, y: String) = s"'[' || ${microToDecSql(x)} || ',' || ${microToDecSql(y)} || ']'"

  def geojsonArea(spark: SparkSession, sfDir: String): DataFrame = {
    init(spark)
    val a = GeoWorld.areas(spark, sfDir)
    val (x0, x1) = (gjLonM(col("lon0")), gjLonM(col("lon1")))
    val (y0, y1) = (gjLatM(col("lat0")), gjLatM(col("lat1")))
    // closed CCW shell, same vertex order as Geo.rect
    val ring = concat(lit("[["), gjPt(x0, y0), lit(","), gjPt(x1, y0), lit(","),
      gjPt(x1, y1), lit(","), gjPt(x0, y1), lit(","), gjPt(x0, y0), lit("]]"))
    val props = concat(lit("""},"properties":{"name":""""), jsonEscape(col("area_name")),
      lit("""","level":"""), col("level").cast("string"), lit("}}"))
    a.select(col("area_id"),
      when(col("level") <= 4,
        concat(lit("""{"type":"Feature","geometry":{"type":"GeometryCollection","geometries":[{"type":"MultiPolygon","coordinates":["""),
          ring, lit("]}]"), props))
        .otherwise(
          concat(lit("""{"type":"Feature","geometry":{"type":"Polygon","coordinates":"""),
            ring, props))
        .as("feature"))
  }

  private val geojsonAreaBody: String = {
    val ring = s"'[[' || ${gjPtSql(gjLonMSql("lon0"), gjLatMSql("lat0"))} || ',' || ${gjPtSql(gjLonMSql("lon1"), gjLatMSql("lat0"))} || ',' || ${gjPtSql(gjLonMSql("lon1"), gjLatMSql("lat1"))} || ',' || ${gjPtSql(gjLonMSql("lon0"), gjLatMSql("lat1"))} || ',' || ${gjPtSql(gjLonMSql("lon0"), gjLatMSql("lat0"))} || ']]'"
    val props = s"""'},"properties":{"name":"' || ${jsonEscapeSql("area_name")} || '","level":' || CAST(level AS VARCHAR) || '}}'"""
    s"""SELECT area_id,
       |  CASE WHEN level <= 4 THEN
       |    '{"type":"Feature","geometry":{"type":"GeometryCollection","geometries":[{"type":"MultiPolygon","coordinates":[' || $ring || ']}]' || $props
       |  ELSE
       |    '{"type":"Feature","geometry":{"type":"Polygon","coordinates":' || $ring || $props
       |  END AS feature
       |FROM areas""".stripMargin
  }

  val geojsonAreaSql: String = GeoQueries.withWorld() + geojsonAreaBody

  /**
   * GeoJSON with INTERIOR RINGS: the donut enclaves serialise as
   * GeometryCollection(MultiPolygon) whose polygon carries a ring LIST —
   * ring 0 the shell, ring 1 the hole (RFC 7946: shell CCW, holes CW;
   * the reference's ring-list polygon, GeowGeometryToJTSGeometry.scala:
   * 67-69). Same exact fixed-point milli-degree formatting as
   * [[geojsonArea]]; the oracle rebuilds the identical string from the
   * enclave rect columns, so a serialiser that drops ring 1+ goes red.
   */
  def geojsonEnclave(spark: SparkSession, sfDir: String): DataFrame = {
    init(spark)
    val e = graft.gen.GeoWorld.enclaves(spark, sfDir)
    def ccw(x0: Column, y0: Column, x1: Column, y1: Column): Column =
      concat(lit("["), gjPt(x0, y0), lit(","), gjPt(x1, y0), lit(","),
        gjPt(x1, y1), lit(","), gjPt(x0, y1), lit(","), gjPt(x0, y0), lit("]"))
    def cw(x0: Column, y0: Column, x1: Column, y1: Column): Column =
      concat(lit("["), gjPt(x0, y0), lit(","), gjPt(x0, y1), lit(","),
        gjPt(x1, y1), lit(","), gjPt(x1, y0), lit(","), gjPt(x0, y0), lit("]"))
    val shell = ccw(gjLonM(col("lon0")), gjLatM(col("lat0")), gjLonM(col("lon1")), gjLatM(col("lat1")))
    val hole = cw(gjLonM(col("hlon0")), gjLatM(col("hlat0")), gjLonM(col("hlon1")), gjLatM(col("hlat1")))
    val props = concat(lit("""},"properties":{"name":""""), jsonEscape(col("area_name")),
      lit("""","level":"""), col("level").cast("string"), lit("}}"))
    e.select(col("area_id"),
      concat(lit("""{"type":"Feature","geometry":{"type":"GeometryCollection","geometries":[{"type":"MultiPolygon","coordinates":[["""),
        shell, lit(","), hole, lit("]]}]"), props).as("feature"))
  }

  val geojsonEnclaveSql: String = {
    def ccw(x0: String, y0: String, x1: String, y1: String) =
      s"'[' || ${gjPtSql(x0, y0)} || ',' || ${gjPtSql(x1, y0)} || ',' || ${gjPtSql(x1, y1)} || ',' || ${gjPtSql(x0, y1)} || ',' || ${gjPtSql(x0, y0)} || ']'"
    def cw(x0: String, y0: String, x1: String, y1: String) =
      s"'[' || ${gjPtSql(x0, y0)} || ',' || ${gjPtSql(x0, y1)} || ',' || ${gjPtSql(x1, y1)} || ',' || ${gjPtSql(x1, y0)} || ',' || ${gjPtSql(x0, y0)} || ']'"
    val shell = ccw(gjLonMSql("lon0"), gjLatMSql("lat0"), gjLonMSql("lon1"), gjLatMSql("lat1"))
    val hole = cw(gjLonMSql("hlon0"), gjLatMSql("hlat0"), gjLonMSql("hlon1"), gjLatMSql("hlat1"))
    val props = s"""'},"properties":{"name":"' || ${jsonEscapeSql("area_name")} || '","level":' || CAST(level AS VARCHAR) || '}}'"""
    GeoQueries.withWorld(GeoWorld.enclavesCte) +
      s"""SELECT area_id,
         |  '{"type":"Feature","geometry":{"type":"GeometryCollection","geometries":[{"type":"MultiPolygon","coordinates":[[' ||
         |  $shell || ',' || $hole || ']]}]' || $props AS feature
         |FROM enclaves""".stripMargin
  }

  /**
   * GeoJSON for the Baarle-style NESTED enclaves: a MultiPolygon with TWO
   * member polygons — [shell CCW, holeA CW, holeB CW] and [island CCW]
   * (RFC 7946 winding per ring; the counter-enclave island is its own
   * polygon, NOT a ring of the first — GeoJSON has no third nesting
   * level, exactly like the reference's ring-list/polygon-list model).
   * A serialiser that drops ring 2+ or polygon 2 goes red against the
   * oracle's rebuilt string.
   */
  def geojsonBaarle(spark: SparkSession, sfDir: String): DataFrame = {
    init(spark)
    val e = graft.gen.GeoWorld.baarles(spark, sfDir)
    def ccw(x0: Column, y0: Column, x1: Column, y1: Column): Column =
      concat(lit("["), gjPt(x0, y0), lit(","), gjPt(x1, y0), lit(","),
        gjPt(x1, y1), lit(","), gjPt(x0, y1), lit(","), gjPt(x0, y0), lit("]"))
    def cw(x0: Column, y0: Column, x1: Column, y1: Column): Column =
      concat(lit("["), gjPt(x0, y0), lit(","), gjPt(x0, y1), lit(","),
        gjPt(x1, y1), lit(","), gjPt(x1, y0), lit(","), gjPt(x0, y0), lit("]"))
    val shell = ccw(gjLonM(col("lon0")), gjLatM(col("lat0")), gjLonM(col("lon1")), gjLatM(col("lat1")))
    val holeA = cw(gjLonM(col("alon0")), gjLatM(col("alat0")), gjLonM(col("alon1")), gjLatM(col("alat1")))
    val holeB = cw(gjLonM(col("blon0")), gjLatM(col("blat0")), gjLonM(col("blon1")), gjLatM(col("blat1")))
    val island = ccw(gjLonM(col("ilon0")), gjLatM(col("ilat0")), gjLonM(col("ilon1")), gjLatM(col("ilat1")))
    val props = concat(lit("""},"properties":{"name":""""), jsonEscape(col("area_name")),
      lit("""","level":"""), col("level").cast("string"), lit("}}"))
    e.select(col("area_id"),
      concat(lit("""{"type":"Feature","geometry":{"type":"GeometryCollection","geometries":[{"type":"MultiPolygon","coordinates":[["""),
        shell, lit(","), holeA, lit(","), holeB, lit("],["), island, lit("]]}]"), props).as("feature"))
  }

  val geojsonBaarleSql: String = {
    // variadic CONCAT (flat argument list) instead of nested `||` — four
    // rings of fixed-point formatting overflow DuckDB's 128-deep binder
    // recursion when chained pairwise
    def ccw(x0: String, y0: String, x1: String, y1: String) =
      s"CONCAT('[', ${gjPtSql(x0, y0)}, ',', ${gjPtSql(x1, y0)}, ',', ${gjPtSql(x1, y1)}, ',', ${gjPtSql(x0, y1)}, ',', ${gjPtSql(x0, y0)}, ']')"
    def cw(x0: String, y0: String, x1: String, y1: String) =
      s"CONCAT('[', ${gjPtSql(x0, y0)}, ',', ${gjPtSql(x0, y1)}, ',', ${gjPtSql(x1, y1)}, ',', ${gjPtSql(x1, y0)}, ',', ${gjPtSql(x0, y0)}, ']')"
    val shell = ccw(gjLonMSql("lon0"), gjLatMSql("lat0"), gjLonMSql("lon1"), gjLatMSql("lat1"))
    val holeA = cw(gjLonMSql("alon0"), gjLatMSql("alat0"), gjLonMSql("alon1"), gjLatMSql("alat1"))
    val holeB = cw(gjLonMSql("blon0"), gjLatMSql("blat0"), gjLonMSql("blon1"), gjLatMSql("blat1"))
    val island = ccw(gjLonMSql("ilon0"), gjLatMSql("ilat0"), gjLonMSql("ilon1"), gjLatMSql("ilat1"))
    val props = s"""'},"properties":{"name":"', ${jsonEscapeSql("area_name")}, '","level":', CAST(level AS VARCHAR), '}}'"""
    GeoQueries.withWorld(GeoWorld.baarlesCte) +
      s"""SELECT area_id,
         |  CONCAT('{"type":"Feature","geometry":{"type":"GeometryCollection","geometries":[{"type":"MultiPolygon","coordinates":[[',
         |  $shell, ',', $holeA, ',', $holeB, '],[', $island, ']]}]', $props) AS feature
         |FROM baarles""".stripMargin
  }

  /**
   * GeoJSON for the MULTI geometries (round-6 verdict #3): station
   * clusters serialise as MultiPoint (member coordinates in `seq` order),
   * dashed routes as MultiLineString (a coordinate-array PER SEGMENT, in
   * `seg` order, vertices in `seq` order within each). With these two the
   * dispatch covers the reference's full seven-kind geometry ADT
   * (GeowGeometryToJTSGeometry.scala:29-78). Exact fixed-point
   * micro-degree formatting from the integer milli-degree offsets, like
   * every other serialiser — a serialiser that flattens the segment
   * nesting (MultiLineString → LineString) or reorders members goes red.
   */
  private def gjMultiXy: Column = concat(lit("["),
    microToDec(lit(LONM0) + col("lonm") * 1000L), lit(","),
    microToDec(lit(LATM0) + col("latm") * 1000L), lit("]"))
  private val gjMultiXySql: String =
    s"'[' || ${microToDecSql(s"($LONM0 + lonm * 1000)")} || ',' || ${microToDecSql(s"($LATM0 + latm * 1000)")} || ']'"

  def geojsonMulti(spark: SparkSession, sfDir: String): DataFrame = {
    init(spark)
    val mp = GeoWorld.stations(spark, sfDir)
      .select(col("cluster_id"), col("cluster_name"),
        struct(col("seq"), gjMultiXy.as("xy")).as("m"))
      .groupBy("cluster_id", "cluster_name")
      .agg(array_sort(collect_list(col("m"))).as("ms"))
      .select(concat(lit("cluster_"), col("cluster_id").cast("string")).as("obj_id"),
        concat(lit("""{"type":"Feature","geometry":{"type":"MultiPoint","coordinates":["""),
          concat_ws(",", transform(col("ms"), m => m.getField("xy"))),
          lit("""]},"properties":{"name":""""), jsonEscape(col("cluster_name")),
          lit(""""}}""")).as("feature"))
    val segs = GeoWorld.routes(spark, sfDir)
      .select(col("route_id"), col("route_name"), col("seg"),
        struct(col("seq"), gjMultiXy.as("xy")).as("m"))
      .groupBy("route_id", "route_name", "seg")
      .agg(array_sort(collect_list(col("m"))).as("ms"))
      .select(col("route_id"), col("route_name"),
        struct(col("seg"), concat(lit("["),
          concat_ws(",", transform(col("ms"), m => m.getField("xy"))), lit("]")).as("sj")).as("s"))
    val ml = segs.groupBy("route_id", "route_name")
      .agg(array_sort(collect_list(col("s"))).as("ss"))
      .select(concat(lit("route_"), col("route_id").cast("string")).as("obj_id"),
        concat(lit("""{"type":"Feature","geometry":{"type":"MultiLineString","coordinates":["""),
          concat_ws(",", transform(col("ss"), s => s.getField("sj"))),
          lit("""]},"properties":{"name":""""), jsonEscape(col("route_name")),
          lit(""""}}""")).as("feature"))
    mp.unionByName(ml)
  }

  private val geojsonMultiBody: String = {
    val props = (name: String) =>
      s"""']},"properties":{"name":"' || ${jsonEscapeSql(name)} || '"}}'"""
    s"""SELECT 'cluster_' || CAST(cluster_id AS VARCHAR) AS obj_id,
       |  '{"type":"Feature","geometry":{"type":"MultiPoint","coordinates":[' ||
       |  STRING_AGG(xy, ',' ORDER BY seq) || ${props("cluster_name")} AS feature
       |FROM (SELECT cluster_id, cluster_name, seq, $gjMultiXySql AS xy FROM stations)
       |GROUP BY cluster_id, cluster_name
       |UNION ALL
       |SELECT 'route_' || CAST(route_id AS VARCHAR) AS obj_id,
       |  '{"type":"Feature","geometry":{"type":"MultiLineString","coordinates":[' ||
       |  STRING_AGG(sj, ',' ORDER BY seg) || ${props("route_name")} AS feature
       |FROM (
       |  SELECT route_id, route_name, seg,
       |         '[' || STRING_AGG(xy, ',' ORDER BY seq) || ']' AS sj
       |  FROM (SELECT route_id, route_name, seg, seq, $gjMultiXySql AS xy FROM routes)
       |  GROUP BY route_id, route_name, seg
       |)
       |GROUP BY route_id, route_name""".stripMargin
  }

  val geojsonMultiSql: String =
    GeoQueries.withWorld(GeoWorld.stationsCte, GeoWorld.routesCte) + geojsonMultiBody

  private val geojsonWayBody: String = {
    val xy = s"""('[' || ${microToDecSql(lonMicroSqlOf("p.lonm"))} || ',' || ${microToDecSql(latMicroSqlOf("p.latm"))} || ']')"""
    val props = s"""'},"properties":{"doc_id":"' || ${jsonEscapeSql("doc_id")} || '"}}'"""
    s"""SELECT doc_id,
       |  CASE WHEN COUNT(*) >= 2 THEN
       |    '{"type":"Feature","geometry":{"type":"LineString","coordinates":[' ||
       |    STRING_AGG($xy, ',' ORDER BY s."offset") || ']' || $props
       |  ELSE
       |    '{"type":"Feature","geometry":{"type":"Point","coordinates":' ||
       |    MIN($xy) || $props
       |  END AS feature
       |FROM spansf s JOIN pts p ON p.pid = s.pid
       |GROUP BY doc_id""".stripMargin
  }

  val geojsonWaySql: String = GeoQueries.withWorld() + geojsonWayBody

  /**
   * The FULL serialisation dispatch (reference Q14, query-engine/.../
   * Flows.scala:92-97: ONE flow serialises every denormalised object
   * type): nodes → Point features, ways → LineString/Point features,
   * areas → Polygon / GeometryCollection(MultiPolygon) features, each
   * routed by object class into one `(obj_id, feature)` stream — the
   * Spark restatement of the reference's type-routed serialise-and-emit.
   * A pure union of the three verified branches: all map-side work on top
   * of plans that are individually oracle-green.
   */
  def geojsonDispatch(spark: SparkSession, sfDir: String): DataFrame =
    geojson(spark, sfDir)
      .select(concat(lit("node_"), col("pid").cast("string")).as("obj_id"), col("feature"))
      .unionByName(geojsonWay(spark, sfDir)
        .select(concat(lit("way_"), col("doc_id")).as("obj_id"), col("feature")))
      .unionByName(geojsonArea(spark, sfDir)
        .select(concat(lit("area_"), col("area_id").cast("string")).as("obj_id"), col("feature")))
      // MultiPoint + MultiLineString branches (already obj_id-prefixed) —
      // the dispatch now emits all seven reference geometry kinds
      .unionByName(geojsonMulti(spark, sfDir))

  val geojsonDispatchSql: String = {
    // re-derive each branch body over the shared world CTEs (the branch
    // queries are individually oracle-checked; this pins the union)
    val nodeBody = geojsonBody
    val wayBody = geojsonWayBody
    val areaBody = geojsonAreaBody
    GeoQueries.withWorld(GeoWorld.stationsCte, GeoWorld.routesCte) +
      s"""SELECT 'node_' || CAST(pid AS VARCHAR) AS obj_id, feature FROM ($nodeBody)
         |UNION ALL
         |SELECT 'way_' || doc_id AS obj_id, feature FROM ($wayBody)
         |UNION ALL
         |SELECT 'area_' || CAST(area_id AS VARCHAR) AS obj_id, feature FROM ($areaBody)
         |UNION ALL
         |SELECT obj_id, feature FROM ($geojsonMultiBody)""".stripMargin
  }

  /**
   * Relation assembly over the MULTI-geometry members (round-6 verdict
   * #3, the assembly half): each state's relation gathers its station
   * cluster as ONE MultiPoint member (points folded in `seq` order) and
   * its dashed route as ONE MultiLineString member (segments folded in
   * `seg` order, vertices in `seq` order) — the reference's typed member
   * maps (points-then-lines) nesting multi-geometries into the collection
   * (RelationFlow.scala:44-58, GeowGeometryToJTSGeometry.scala:29-78).
   * Each member kind is an order-preserving fold (array_sort over
   * (ordinal, vertex) structs), joined per relation — every hop a keyed
   * equi-join over dimension-sized tables, nothing quadratic.
   */
  def relationMulti(spark: SparkSession, sfDir: String): DataFrame = {
    init(spark)
    val xy = concat(col("lonm").cast("string"), lit(" "), col("latm").cast("string"))
    val mp = GeoWorld.stations(spark, sfDir)
      .select((col("cluster_id") - 970000L).as("nk"), struct(col("seq"), xy.as("xy")).as("m"))
      .groupBy("nk").agg(array_sort(collect_list(col("m"))).as("ms"))
      .select(col("nk"),
        concat(lit("MULTIPOINT("),
          concat_ws(",", transform(col("ms"), m => m.getField("xy"))), lit(")")).as("mp"),
        size(col("ms")).as("n_pts"))
    val segs = GeoWorld.routes(spark, sfDir)
      .select((col("route_id") - 980000L).as("nk"), col("seg"),
        struct(col("seq"), xy.as("xy")).as("m"))
      .groupBy("nk", "seg").agg(array_sort(collect_list(col("m"))).as("ms"))
      .select(col("nk"), struct(col("seg"), concat(lit("("),
        concat_ws(",", transform(col("ms"), m => m.getField("xy"))), lit(")")).as("sj")).as("s"))
    val ml = segs.groupBy("nk").agg(array_sort(collect_list(col("s"))).as("ss"))
      .select(col("nk"),
        concat(lit("MULTILINESTRING("),
          concat_ws(",", transform(col("ss"), s => s.getField("sj"))), lit(")")).as("ml"),
        size(col("ss")).as("n_segs"))
    mp.join(ml, "nk")
      .select(concat(lit("mrel_"), col("nk").cast("string")).as("rel_id"),
        concat(lit("GEOMETRYCOLLECTION("), col("mp"), lit(","), col("ml"), lit(")")).as("wkt"),
        (col("n_pts") + col("n_segs")).cast("int").as("n_members"))
  }

  val relationMultiSql: String = {
    val xy = """CAST(lonm AS VARCHAR) || ' ' || CAST(latm AS VARCHAR)"""
    GeoQueries.withWorld(GeoWorld.stationsCte, GeoWorld.routesCte,
      s"""mmp AS (
         |  SELECT cluster_id - 970000 AS nk,
         |         'MULTIPOINT(' || STRING_AGG($xy, ',' ORDER BY seq) || ')' AS mp,
         |         COUNT(*) AS n_pts
         |  FROM stations GROUP BY 1
         |)""".stripMargin,
      s"""msegs AS (
         |  SELECT route_id - 980000 AS nk, seg,
         |         '(' || STRING_AGG($xy, ',' ORDER BY seq) || ')' AS sj
         |  FROM routes GROUP BY route_id, seg
         |)""".stripMargin,
      """mml AS (
        |  SELECT nk, 'MULTILINESTRING(' || STRING_AGG(sj, ',' ORDER BY seg) || ')' AS ml,
        |         COUNT(*) AS n_segs
        |  FROM msegs GROUP BY nk
        |)""".stripMargin) +
      """SELECT 'mrel_' || CAST(m.nk AS VARCHAR) AS rel_id,
        |       'GEOMETRYCOLLECTION(' || m.mp || ',' || l.ml || ')' AS wkt,
        |       CAST(n_pts + n_segs AS INTEGER) AS n_members
        |FROM mmp m JOIN mml l ON m.nk = l.nk""".stripMargin
  }
}
