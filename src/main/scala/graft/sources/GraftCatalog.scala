package graft.sources

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, ProcedureCatalog, SupportsNamespaces, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.index.SnapshotTable

/**
 * DataSourceV2 CATALOG over snapshot tables — the full SQL DDL/DML surface
 * without leaving `spark.sql`:
 * {{{
 *   spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
 *   spark.conf.set("spark.sql.catalog.graft.warehouse", "/data/graft")
 *
 *   CREATE NAMESPACE graft.geo
 *   CREATE TABLE graft.geo.cells (id BIGINT, cell BIGINT, part BIGINT)
 *     PARTITIONED BY (part) TBLPROPERTIES ('statscol'='cell')
 *   INSERT INTO graft.geo.cells ...           -- first commit = version 1
 *   ALTER TABLE graft.geo.cells ADD COLUMN score BIGINT   -- metadata-only
 *   DELETE FROM graft.geo.cells WHERE part = 3            -- metadata-only
 *   SELECT * FROM graft.geo.cells VERSION AS OF 2         -- time travel
 * }}}
 * A table is a directory `warehouse/<namespace…>/<name>` holding the
 * snapshot layout ([[graft.index.SnapshotTable]]); `CREATE TABLE` persists
 * only schema + stats metadata (version 0, no data), and every
 * read/write/delete rides the existing DSv2 paths
 * ([[SnapshotSource.SnapTable]]) — commit CAS, manifest pruning,
 * aggregate pushdown, change feed, and the streaming sink all work on
 * catalog tables unchanged. `ALTER TABLE ADD/DROP COLUMN` maps onto the
 * metadata-only schema evolution ([[SnapshotTable.addColumn]]/
 * [[SnapshotTable.dropColumn]]) — at 100 TB DDL must never touch data.
 *
 * Reference role: the store's keyspace/table management
 * (`OsmStorageService.scala:34-60` creates keyspaces and tables up front);
 * here the same lifecycle is Spark-native DDL.
 */
class GraftCatalog extends TableCatalog with SupportsNamespaces with ProcedureCatalog {

  private var catalogName: String = _
  private var warehouse: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog $name needs option 'spark.sql.catalog.$name.warehouse'"))
  }

  override def name(): String = catalogName

  // path safety: namespace levels and table names become directory names —
  // reject anything that could escape the warehouse
  private def checkPart(s: String): String = {
    require(s.matches("[A-Za-z0-9_]+"),
      s"illegal name '$s' (letters, digits, underscore only)")
    s
  }

  private def nsDir(namespace: Array[String]): Path =
    Paths.get((warehouse +: namespace.toSeq.map(checkPart)).mkString("/"))

  private def rootOf(ident: Identifier): String =
    (warehouse +: (ident.namespace().toSeq :+ ident.name()).map(checkPart)).mkString("/")

  private def isTableDir(root: String): Boolean =
    Files.exists(Paths.get(s"$root/schema.json"))

  private def propsFor(root: String, version: Option[String]): java.util.Map[String, String] = {
    val m = new java.util.HashMap[String, String]()
    // persisted TBLPROPERTIES first: per-operation options and the
    // identity keys below override them (explicit beats ambient)
    SnapshotTable.readTableProps(root).foreach { case (k, v) => m.put(k, v) }
    m.put("root", root)
    version.foreach(m.put("version", _))
    m
  }

  // ------------------------------------------------------------- tables

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = nsDir(namespace)
    if (!Files.isDirectory(dir)) throw new NoSuchNamespaceException(namespace)
    val s = Files.list(dir)
    try s.iterator().asScala
      .filter(p => Files.isDirectory(p) && isTableDir(p.toString))
      .map(p => Identifier.of(namespace, p.getFileName.toString))
      .toArray
    finally s.close()
  }

  override def loadTable(ident: Identifier): Table = loadAt(ident, None)

  /** SQL time travel: `SELECT … FROM graft.ns.t VERSION AS OF 3`. */
  override def loadTable(ident: Identifier, version: String): Table = {
    require(version.matches("\\d+"), s"version must be a snapshot number, got '$version'")
    loadAt(ident, Some(version))
  }

  /** SQL time travel by wall clock: `… TIMESTAMP AS OF '2026-08-18 10:00:00'`
    * (Spark hands epoch MICROseconds) — resolves to the latest version
    * committed at or before that moment via the snapshot files' mtimes. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val root = rootOf(ident)
    if (!isTableDir(root)) throw new NoSuchTableException(ident)
    val t = new SnapshotTable(SparkSession.active, root)
    val v = t.versionAt(timestamp / 1000L).getOrElse(throw new IllegalArgumentException(
      s"no snapshot of ${ident.name()} existed at or before timestamp ${timestamp}us"))
    loadAt(ident, Some(v.toString))
  }

  private def loadAt(ident: Identifier, version: Option[String]): Table = {
    val root = rootOf(ident)
    if (!isTableDir(root)) throw new NoSuchTableException(ident)
    val t = new SnapshotTable(SparkSession.active, root)
    new SnapshotSource.SnapTable(t.tableSchema, propsFor(root, version))
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: java.util.Map[String, String]): Table = {
    val root = rootOf(ident)
    if (isTableDir(root)) throw new TableAlreadyExistsException(ident)
    // the snapshot layout has exactly one physical organisation: identity
    // partitioning on `part` — accept it declared or implicit, refuse others
    require(partitions.isEmpty ||
        (partitions.length == 1 && partitions(0).name == "identity" &&
          partitions(0).references.length == 1 &&
          partitions(0).references()(0).fieldNames.sameElements(Array("part"))),
      "snapshot tables are PARTITIONED BY (part) — other partitionings are not supported")
    SnapshotTable.createEmpty(SparkSession.active, root, schema,
      Option(properties.get("statscol")))
    SnapshotTable.writeTableProps(root,
      SnapshotTable.PERSISTED_PROPS.flatMap(k =>
        Option(properties.get(k)).map(k -> _)).toMap)
    loadTable(ident)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val root = rootOf(ident)
    if (!isTableDir(root)) throw new NoSuchTableException(ident)
    val t = new SnapshotTable(SparkSession.active, root)
    changes.foreach {
      case a: TableChange.AddColumn =>
        require(a.fieldNames().length == 1, "nested column evolution is not supported")
        t.addColumn(a.fieldNames()(0), a.dataType())
      case d: TableChange.DeleteColumn =>
        require(d.fieldNames().length == 1, "nested column evolution is not supported")
        if (!d.ifExists() || t.tableSchema.fieldNames.contains(d.fieldNames()(0)))
          t.dropColumn(d.fieldNames()(0))
      case other => throw new UnsupportedOperationException(
        s"table change $other is not supported (ADD COLUMN / DROP COLUMN only)")
    }
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val root = rootOf(ident)
    if (!isTableDir(root)) false
    else {
      val walk = Files.walk(Paths.get(root))
      val contents = try walk.iterator().asScala.toSeq finally walk.close()
      contents.reverseIterator.foreach(Files.deleteIfExists(_))
      true
    }
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "RENAME is not supported: manifests reference data files by absolute path")

  // --------------------------------------------------- maintenance procedures

  /**
   * Iceberg-style TABLE MAINTENANCE as SQL stored procedures (Spark 4's
   * ProcedureCatalog — `CALL cat.system.<proc>(…)`):
   * {{{
   *   CALL cat.system.compact(tbl => 'geo.cells', target_file_bytes => 536870912)
   *   CALL cat.system.expire(tbl => 'geo.cells', keep_last => 2)
   *   CALL cat.system.snapshots(tbl => 'geo.cells')   -- version history
   * }}}
   * The operational loop — ingest, compact, expire, inspect — needs no
   * programmatic handle: at 100 TB these run from a SQL-only scheduler
   * exactly like reads and DML. Each rides the existing distributed
   * maintenance planning (compact plans over a Spark aggregation, expire
   * decides liveness with a distributed anti-join; the driver never
   * materialises a file list).
   */
  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.sameElements(Array("system")))
      Array("expire", "compact", "snapshots", "restore")
        .map(n => Identifier.of(Array("system"), n))
    else Array.empty

  override def loadProcedure(ident: Identifier): UnboundProcedure = {
    require(ident.namespace().sameElements(Array("system")),
      s"procedures live in the 'system' namespace, got ${ident.namespace().mkString(".")}")
    ident.name() match {
      case "expire" => new MaintenanceProc("expire",
        "drop old snapshots, delete unreferenced files, sweep orphan attempt dirs",
        Array(
          ProcedureParameter.in("tbl", StringType).build(),
          ProcedureParameter.in("keep_last", IntegerType).defaultValue("1").build(),
          ProcedureParameter.in("grace_ms", LongType)
            .defaultValue((24L * 3600 * 1000).toString).build()),
        StructType(Seq(StructField("deleted_files", IntegerType, nullable = false),
          StructField("current_version", IntegerType, nullable = false))),
        { (t, in) =>
          val deleted = t.expire(in.getInt(1), in.getLong(2))
          Array[InternalRow](InternalRow(deleted, t.currentVersion))
        })
      case "compact" => new MaintenanceProc("compact",
        "bin-pack each partition's files toward a byte target (stats-ordered rewrite)",
        Array(
          ProcedureParameter.in("tbl", StringType).build(),
          ProcedureParameter.in("max_files", IntegerType).defaultValue("1").build(),
          ProcedureParameter.in("target_file_bytes", LongType)
            .defaultValue(Long.MaxValue.toString).build(),
          ProcedureParameter.in("max_partitions", IntegerType)
            .defaultValue(Int.MaxValue.toString).build()),
        StructType(Seq(StructField("version", IntegerType, nullable = false))),
        { (t, in) =>
          Array[InternalRow](InternalRow(t.compact(in.getInt(1), in.getLong(2), in.getInt(3))))
        })
      case "snapshots" => new MaintenanceProc("snapshots",
        "version history: files/rows per retained snapshot plus streaming epoch markers",
        Array(ProcedureParameter.in("tbl", StringType).build()),
        StructType(Seq(
          StructField("version", IntegerType, nullable = false),
          StructField("files", LongType, nullable = false),
          StructField("rows", LongType, nullable = false),
          StructField("stream_query", StringType, nullable = true),
          StructField("stream_epoch", LongType, nullable = true))),
        { (t, _) =>
          (1 to t.currentVersion).flatMap { v =>
            scala.util.Try {
              val ms = t.manifestList(v)
              val marker = t.streamMarker(v)
              InternalRow(v, ms.map(_.files.toLong).sum, ms.map(_.rows).sum,
                marker.map(m => UTF8String.fromString(m._1)).orNull,
                marker.map(m => java.lang.Long.valueOf(m._2)).orNull)
            }.toOption // expired versions have no snapshot file — skip
          }.toArray
        })
      case "restore" => new MaintenanceProc("restore",
        "commit a new version with an earlier snapshot's exact content (Delta's RESTORE; metadata-only)",
        Array(
          ProcedureParameter.in("tbl", StringType).build(),
          ProcedureParameter.in("version", IntegerType).build()),
        StructType(Seq(
          StructField("restored_from", IntegerType, nullable = false),
          StructField("current_version", IntegerType, nullable = false))),
        { (t, in) =>
          val to = in.getInt(1)
          Array[InternalRow](InternalRow(to, t.restore(to)))
        })
      case other => throw new IllegalArgumentException(
        s"unknown procedure '$other' (expire, compact, snapshots, restore)")
    }
  }

  /** One maintenance procedure: binds as itself, resolves the `tbl`
    * argument (`ns.name`) against this catalog's warehouse, runs `body`
    * on the table handle, and returns the result rows as a driver-local
    * scan. */
  private final class MaintenanceProc(procName: String, desc: String,
      params: Array[ProcedureParameter], out: StructType,
      body: (SnapshotTable, InternalRow) => Array[InternalRow])
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = procName
    override def description(): String = desc
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = params
    override def isDeterministic: Boolean = false
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val parts = input.getUTF8String(0).toString.split('.')
      val ident = Identifier.of(parts.init, parts.last)
      val root = rootOf(ident)
      if (!isTableDir(root)) throw new NoSuchTableException(ident)
      val result = body(new SnapshotTable(SparkSession.active, root), input)
      java.util.Collections.singletonList[Scan](new LocalScan {
        override def readSchema(): StructType = out
        override def rows(): Array[InternalRow] = result
        override def description(): String = s"graft $procName result"
      }).iterator()
    }
  }

  // --------------------------------------------------------- namespaces

  override def listNamespaces(): Array[Array[String]] = {
    val dir = Paths.get(warehouse)
    if (!Files.isDirectory(dir)) Array.empty
    else {
      val s = Files.list(dir)
      try s.iterator().asScala
        .filter(p => Files.isDirectory(p) && !isTableDir(p.toString))
        .map(p => Array(p.getFileName.toString))
        .toArray
      finally s.close()
    }
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else if (Files.isDirectory(nsDir(namespace))) Array.empty
    else throw new NoSuchNamespaceException(namespace)

  override def loadNamespaceMetadata(namespace: Array[String]): java.util.Map[String, String] =
    if (Files.isDirectory(nsDir(namespace))) java.util.Collections.emptyMap()
    else throw new NoSuchNamespaceException(namespace)

  override def createNamespace(namespace: Array[String],
      metadata: java.util.Map[String, String]): Unit = {
    Files.createDirectories(nsDir(namespace))
    ()
  }

  override def alterNamespace(namespace: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("namespace properties are not supported")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    val dir = nsDir(namespace)
    if (!Files.isDirectory(dir)) false
    else {
      val s = Files.list(dir)
      val empty = try !s.iterator().hasNext finally s.close()
      require(empty || cascade, s"namespace ${namespace.mkString(".")} is not empty")
      val walk = Files.walk(dir)
      val contents = try walk.iterator().asScala.toSeq finally walk.close()
      contents.reverseIterator.foreach(Files.deleteIfExists(_))
      true
    }
  }
}
