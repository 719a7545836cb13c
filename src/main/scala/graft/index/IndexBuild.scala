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
   */
  def relationAssemble(spark: SparkSession, sfDir: String): DataFrame = {
    init(spark)
    val refs = GeoWorld.docs(spark, sfDir)
      .select(col("doc_id"), explode(col("spans")).as("s"))
      .select(col("doc_id"), col("s.offset").as("off"),
        (split(col("doc_id"), "_").getItem(1).cast("long") * 8 + col("s.offset")).as("ref"))
    val mapping = mappingTable(spark, sfDir) // join 1: ref -> cell
    val features = GeoWorld.points(spark, sfDir)
      .select(col("pid"), col("lonm"), col("latm"),
        CellFunctions.zcell(col("lon"), col("lat"), lit(RES_MID)).as("cell"))
    refs
      .join(mapping, refs("ref") === mapping("pid"))
      .drop("pid")
      .join(features, Seq("cell")).where(col("ref") === features("pid")) // join 2: (cell, id)
      .select(col("doc_id"), struct(col("off"),
        concat(lit("POINT("), col("lonm").cast("string"), lit(" "), col("latm").cast("string"), lit(")")).as("wkt")).as("m"))
      .groupBy("doc_id")
      .agg(array_sort(collect_list(col("m"))).as("ms"))
      .select(col("doc_id"),
        concat(lit("GEOMETRYCOLLECTION("),
          concat_ws(",", transform(col("ms"), m => m.getField("wkt"))),
          lit(")")).as("wkt"),
        size(col("ms")).as("n_members"))
  }

  val relationAssembleSql: String =
    GeoQueries.withWorld() +
      s"""SELECT doc_id,
         |       'GEOMETRYCOLLECTION(' || STRING_AGG('POINT(' || CAST(p.lonm AS VARCHAR) || ' ' || CAST(p.latm AS VARCHAR) || ')', ',' ORDER BY s."offset") || ')' AS wkt,
         |       CAST(COUNT(*) AS INTEGER) AS n_members
         |FROM spansf s JOIN pts p ON p.pid = s.pid
         |GROUP BY doc_id""".stripMargin

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

  /** GeoJSON Feature serialisation (reference Q18, Flows.scala:92-97):
    * point features as GeoJSON strings, coordinates from exact integer
    * micro-degrees. */
  def geojson(spark: SparkSession, sfDir: String): DataFrame = {
    init(spark)
    // micro-degrees: lon = LON0 + lonm/1000 + 0.0002 -> -20_000_000 + lonm*1000 + 200
    val lonMicro = lit(-20000000L) + col("lonm") * 1000L + 200L
    val latMicro = lit(30000000L) + col("latm") * 1000L + 200L
    GeoWorld.points(spark, sfDir).select(
      col("pid"),
      concat(
        lit("""{"type":"Feature","geometry":{"type":"Point","coordinates":["""),
        microToDec(lonMicro), lit(","), microToDec(latMicro),
        lit("""]},"properties":{"name":""""), col("name"),
        lit("""","""), lit(""""k":""""), col("tag_k"), lit("""","v":""""), col("tag_v"),
        lit(""""}}""")).as("feature"))
  }

  val geojsonSql: String = {
    val lonMicro = "(-20000000 + lonm * 1000 + 200)"
    val latMicro = "(30000000 + latm * 1000 + 200)"
    GeoQueries.withWorld() +
      s"""SELECT pid,
         |  '{"type":"Feature","geometry":{"type":"Point","coordinates":[' ||
         |  ${microToDecSql(lonMicro)} || ',' || ${microToDecSql(latMicro)} ||
         |  ']},"properties":{"name":"' || name || '","k":"' || tag_k || '","v":"' || tag_v || '"}}' AS feature
         |FROM pts""".stripMargin
  }
}
