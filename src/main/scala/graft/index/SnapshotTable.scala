package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/**
 * Minimal Iceberg-shaped snapshot table over partitioned parquet — the
 * engine's realisation of the north-rule's "Iceberg table … resumable from
 * checkpoint with per-partition lineage + metrics" contract in an offline
 * container (no Iceberg jar; SURVEY.md §"No Iceberg jar").
 *
 * Layout:
 * {{{
 *   <root>/v<N>/part=<p>/part-*.parquet   data files of version N's WRITE
 *   <root>/snap-<N>.json                  snapshot manifest: the exact file
 *                                         set of version N (absolute paths +
 *                                         partition value + rows per file)
 * }}}
 *
 * Key properties, mirroring Iceberg semantics:
 *  - **Copy-on-write MERGE**: [[upsert]] rewrites ONLY the partitions the
 *    delta touches; untouched partitions are carried into the new snapshot
 *    by reference (same files, no IO). At 100 TB an upsert's cost is
 *    proportional to the touched region, never the table.
 *  - **Snapshot isolation / time travel**: [[read]] of version N resolves
 *    the manifest's exact file list — concurrent readers of N are unaffected
 *    by later upserts, and historic versions stay readable until [[expire]].
 *  - **Per-partition lineage**: every manifest carries (partition → rows),
 *    the per-partition row-count lineage the scaling contract asks for.
 *
 * The partition column is duplicated into the data files (`part` directory +
 * `_part` data column) so a manifest read never depends on Spark directory
 * inference — a version's files can be listed directly regardless of which
 * version-dir they live in.
 *
 * Driver state is the manifest file list only — O(#files), the same scaling
 * envelope as an Iceberg manifest list; a production port would page
 * manifests per partition-spec like Iceberg's manifest-list/manifest split.
 */
class SnapshotTable(spark: SparkSession, root: String, statsCol: Option[String] = None) {

  /** One data file in a snapshot. `lo`/`hi` are the min/max of [[statsCol]]
    * in this file (Iceberg's per-file column bounds), present when the
    * table tracks a stats column. */
  final case class FileEntry(path: String, part: Long, rows: Long,
      lo: Option[Long] = None, hi: Option[Long] = None)

  private def snapPath(v: Int): Path = Paths.get(s"$root/snap-$v.json")

  /** Latest committed snapshot version (0 = no snapshots). */
  def currentVersion: Int = {
    val dir = Paths.get(root)
    if (!Files.exists(dir)) 0
    else {
      val s = Files.list(dir)
      try s.iterator().asScala
        .map(_.getFileName.toString)
        .collect { case n if n.startsWith("snap-") && n.endsWith(".json") =>
          n.stripPrefix("snap-").stripSuffix(".json").toInt }
        .foldLeft(0)(math.max)
      finally s.close()
    }
  }

  /** The exact data-file set of snapshot v. */
  def snapshot(v: Int): Seq[FileEntry] = {
    val txt = Files.readString(snapPath(v))
    """\{"path":"([^"]+)","part":(-?\d+),"rows":(\d+)(?:,"lo":(-?\d+),"hi":(-?\d+))?\}""".r
      .findAllMatchIn(txt)
      .map(m => FileEntry(m.group(1), m.group(2).toLong, m.group(3).toLong,
        Option(m.group(4)).map(_.toLong), Option(m.group(5)).map(_.toLong)))
      .toSeq
  }

  /** Per-partition row-count lineage of snapshot v. */
  def partLineage(v: Int): Map[Long, Long] =
    snapshot(v).groupBy(_.part).map { case (p, fs) => p -> fs.map(_.rows).sum }

  /** Write an ATTEMPT dir for version vN from `df` (must carry a long
    * `part` column) and return its file entries. The dir name carries a
    * unique attempt id: two racing writers of the same version never share
    * a directory (so neither's manifest-stats job can see the other's
    * files), and a writer that crashes before commit leaves only an orphan
    * attempt dir — it can never wedge the next committer's path. The part
    * value rides both the directory AND the `_part` data column. */
  private def writeVersionDir(df: DataFrame, v: Int): Seq[FileEntry] = {
    val cached = df.persist() // isEmpty probe + write + stats share one eval
    try {
      if (cached.isEmpty) return Seq.empty // a fully-deleted partition writes nothing
      val dir = s"$root/v$v-${java.util.UUID.randomUUID().toString.take(8)}"
      cached.withColumn("_part", col("part"))
        .write.partitionBy("part").parquet(dir)
      // one footer-cheap job over the attempt dir: per-file row counts and
      // (when tracked) stats-column bounds — the manifest stats an Iceberg
      // writer records at commit
      val aggs = count(lit(1)).as("rows") +: statsCol.toSeq.flatMap(c =>
        Seq(min(col(c)).cast("long").as("lo"), max(col(c)).cast("long").as("hi")))
      val entries = spark.read.parquet(dir)
        .groupBy(input_file_name().as("f")).agg(aggs.head, aggs.tail: _*)
        .collect()
        .map { r =>
          val f = java.net.URLDecoder.decode(r.getString(0), "UTF-8")
            .replaceFirst("^file:/+", "/")
          val part = "part=(-?\\d+)".r.findFirstMatchIn(f).map(_.group(1).toLong)
            .getOrElse(sys.error(s"no partition dir in $f"))
          // an all-NULL stats column in a file leaves no usable bound: the
          // file then matches every readRange (forall on None) — safe, and
          // no NPE at commit
          val (lo, hi) =
            if (statsCol.isDefined && !r.isNullAt(2) && !r.isNullAt(3))
              (Some(r.getLong(2)), Some(r.getLong(3)))
            else (None, None)
          FileEntry(f, part, r.getLong(1), lo, hi)
        }.toSeq.sortBy(_.path)
      entries
    } finally cached.unpersist()
  }

  /** Commit `files` as snapshot v; on a lost commit race, delete this
    * attempt's freshly-written files before rethrowing so the loser leaves
    * no orphans. */
  private def commitOrCleanup(v: Int, parent: Int, files: Seq[FileEntry],
      fresh: Seq[FileEntry]): Unit =
    try commit(v, parent, files)
    catch {
      case e: java.nio.file.FileAlreadyExistsException =>
        fresh.foreach(f => Files.deleteIfExists(Paths.get(f.path)))
        throw e
    }

  private def commit(v: Int, parent: Int, files: Seq[FileEntry]): Unit = {
    val fileJson = files.map { f =>
      val stats = (f.lo, f.hi) match {
        case (Some(l), Some(h)) => s""","lo":$l,"hi":$h"""
        case _ => ""
      }
      s"""{"path":"${f.path}","part":${f.part},"rows":${f.rows}$stats}"""
    }.mkString("[", ",", "]")
    val lineage = files.groupBy(_.part).toSeq.sortBy(_._1)
      .map { case (p, fs) => s""""$p":${fs.map(_.rows).sum}""" }.mkString("{", ",", "}")
    Files.createDirectories(Paths.get(root))
    // optimistic concurrency (Iceberg's commit rule): creating the snapshot
    // file is the atomic commit point — a concurrent writer that already
    // committed this version makes CREATE_NEW fail, and the loser must
    // re-read the table state and retry its merge
    Files.writeString(snapPath(v),
      s"""{"version":$v,"parent":$parent,"files":$fileJson,"part_rows":$lineage}""",
      java.nio.file.StandardOpenOption.CREATE_NEW)
  }

  /** Initial load: full write of `df` as snapshot 1. `df` must carry a
    * long `part` column (the partition key). */
  def init(df: DataFrame): Int = {
    require(currentVersion == 0, s"table at $root already initialised")
    commitOrCleanup(1, 0, writeVersionDir(df, 1), Seq.empty)
    1
  }

  /**
   * Copy-on-write MERGE on the IDENTITY-PARTITIONED key `(part, keyCols)`:
   * a delta row replaces the base row with the same key IN ITS PARTITION;
   * new (part, key) combinations are inserts. Only partitions present in
   * `delta` are rewritten — their surviving base rows are read back
   * (file-list scoped, not a table scan), anti-joined on the key and
   * re-written together with the delta; every other partition's files
   * carry over by reference. Returns the new snapshot version.
   *
   * The partition column is PART OF the merge key (standard identity
   * partitioning): derive `part` as a pure function of immutable key
   * attributes, as [[SnapshotQueries.indexUpsert]] does. A delta that
   * re-derives a key's partition differently does not retire the old
   * partition's row — that is an insert of a new identity, not an update.
   */
  def upsert(delta: DataFrame, keyCols: Seq[String], basedOn: Option[Int] = None): Int = {
    val cur = currentVersion
    require(cur > 0, "init() before upsert()")
    // compare-and-swap: a merge prepared against `basedOn` must not commit
    // over someone else's snapshot — fail fast, re-read, retry (the
    // CREATE_NEW in commit() still decides a photo-finish race, and unique
    // attempt dirs keep the racers' files apart)
    basedOn.foreach(b => if (b != cur) throw new IllegalStateException(
      s"concurrent commit: table is at v$cur but the merge was based on v$b; re-read and retry"))
    val next = cur + 1
    val cachedDelta = delta.persist() // part-collect + anti-join + union share one eval
    try {
      // touched partitions: driver-bounded by partition count, not rows
      val touched = cachedDelta.select("part").distinct().collect().map(_.getLong(0)).toSet
      val (touchedFiles, carried) = snapshot(cur).partition(f => touched(f.part))
      val merged = if (touchedFiles.nonEmpty) {
        val base = spark.read.parquet(touchedFiles.map(_.path): _*)
          .withColumn("part", col("_part")).drop("_part")
        base.join(cachedDelta.select(("part" +: keyCols).map(col): _*),
            "part" +: keyCols, "left_anti")
          .unionByName(cachedDelta)
      } else cachedDelta
      val newFiles = writeVersionDir(merged, next)
      commitOrCleanup(next, cur, carried ++ newFiles, newFiles)
      next
    } finally cachedDelta.unpersist()
  }

  /** Time-travel read of snapshot v (default: current). */
  def read(version: Int = -1): DataFrame =
    readFiles(snapshot(if (version < 0) currentVersion else version))

  /**
   * MANIFEST-level partition pruning (Iceberg's partition filter): read
   * only the files of partitions in `parts` — the scan never even lists
   * the rest. At 100 TB this is the entry point a cell/bbox fetch uses:
   * a region query touches its region's files, not the world's.
   */
  def readParts(parts: Set[Long], version: Int = -1): DataFrame = {
    val v = if (version < 0) currentVersion else version
    readFiles(snapshot(v).filter(f => parts(f.part)))
  }

  /**
   * MANIFEST-level range pruning over the stats column (Iceberg's column
   * bounds): only files whose [lo, hi] overlaps [loBound, hiBound] are
   * scanned. With data clustered on the stats column (e.g. z-order cell
   * ids) the scanned fraction tracks the predicate's selectivity. The
   * caller still applies the exact row filter — bounds only skip files.
   */
  def readRange(loBound: Long, hiBound: Long, version: Int = -1): DataFrame = {
    require(statsCol.isDefined, "readRange needs a stats column")
    val v = if (version < 0) currentVersion else version
    readFiles(snapshot(v).filter(f =>
      f.lo.forall(_ <= hiBound) && f.hi.forall(_ >= loBound)))
  }

  private def readFiles(files: Seq[FileEntry]): DataFrame =
    if (files.isEmpty) {
      // schema-only: resolve from any live snapshot file without scanning rows
      val any = snapshot(currentVersion).take(1)
      require(any.nonEmpty, "cannot derive a schema from a fully-empty table")
      readFiles(any).limit(0)
    } else spark.read.parquet(files.map(_.path): _*)
      .withColumn("part", col("_part")).drop("_part")

  /**
   * Copy-on-write DELETE by key: rows of touched partitions matching
   * `keys` (equality on `keyCols`; `keys` must carry `part`) are removed,
   * the partitions' survivors are rewritten, everything else carries over.
   * A partition whose every row is deleted vanishes from the new snapshot
   * (no empty files). Returns the new version.
   */
  def delete(keys: DataFrame, keyCols: Seq[String]): Int = {
    val cur = currentVersion
    require(cur > 0, "init() before delete()")
    val next = cur + 1
    val touched = keys.select("part").distinct().collect().map(_.getLong(0)).toSet
    val (touchedFiles, carried) = snapshot(cur).partition(f => touched(f.part))
    val newFiles = if (touchedFiles.nonEmpty) {
      val base = spark.read.parquet(touchedFiles.map(_.path): _*)
        .withColumn("part", col("_part")).drop("_part")
      writeVersionDir(base.join(keys.select(("part" +: keyCols).map(col): _*),
        "part" +: keyCols, "left_anti"), next)
    } else Seq.empty
    commitOrCleanup(next, cur, carried ++ newFiles, newFiles)
    next
  }

  /**
   * Bin-pack compaction (Iceberg's rewrite_data_files): partitions holding
   * more than `maxFiles` data files are rewritten into one file each; all
   * others carry into the new snapshot by reference. Pure layout change —
   * [[read]] results are identical before and after — but at scale it is
   * what keeps a frequently-upserted table's file count (and thus manifest
   * size + scan task count) bounded. Returns the new version (or the
   * current one when nothing qualifies).
   */
  def compact(maxFiles: Int = 1): Int = {
    val cur = currentVersion
    val files = snapshot(cur)
    val fat = files.groupBy(_.part).filter(_._2.size > maxFiles).keySet
    if (fat.isEmpty) return cur
    val (touchedFiles, carried) = files.partition(f => fat(f.part))
    val merged = spark.read.parquet(touchedFiles.map(_.path): _*)
      .withColumn("part", col("_part")).drop("_part")
      .repartition(fat.size, col("part"))
    val next = cur + 1
    val newFiles = writeVersionDir(merged, next)
    commitOrCleanup(next, cur, carried ++ newFiles, newFiles)
    next
  }

  /** Drop snapshots older than `keepLast` versions and delete data files no
    * surviving snapshot references (Iceberg's expire_snapshots + orphan
    * cleanup). Returns deleted file count. */
  def expire(keepLast: Int = 1): Int = {
    val cur = currentVersion
    val keep = ((cur - keepLast + 1) max 1) to cur
    val all = (1 to cur).filter(v => Files.exists(snapPath(v)))
    val live = keep.filter(v => Files.exists(snapPath(v))).flatMap(snapshot).map(_.path).toSet
    val dead = all.filterNot(keep.contains).flatMap(snapshot).map(_.path).distinct
      .filterNot(live.contains)
    dead.foreach(p => Files.deleteIfExists(Paths.get(p)))
    all.filterNot(keep.contains).foreach(v => Files.deleteIfExists(snapPath(v)))
    dead.size
  }
}

/**
 * Continuous index maintenance: a structured stream MERGEd into a
 * [[SnapshotTable]] per micro-batch — the checkpoint-resumable ingest the
 * north rule asks for, closed over the snapshot format. Offsets live in the
 * stream checkpoint; table versions advance one per processed batch. A
 * batch replayed after a crash re-upserts the same keys with the same
 * values, so the TABLE STATE is exactly-once even though the version
 * counter is at-least-once (the same convergence argument as Iceberg's
 * idempotent MERGE writers).
 */
object StreamIngest {

  def upsertStream(in: DataFrame, table: SnapshotTable, keys: Seq[String],
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    in.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) { table.upsert(batch, keys); () }
      }
      .start()
}

/** Catalog query driving the snapshot table end-to-end (see
  * [[SnapshotTable]]): build the point→cell mapping as snapshot 1, MERGE a
  * re-versioned delta (every pid % 3 == 0) as snapshot 2, read the current
  * snapshot back from its manifest. The DuckDB oracle recomputes the final
  * MERGE result directly — parity proves the on-disk incremental path
  * equals a from-scratch rebuild. */
object SnapshotQueries {

  /** Fixed per-SF scratch root, recreated per run: repeated Verify/Bench
    * sweeps reuse one directory instead of leaking a temp dir per call. */
  private def freshRoot(name: String, sfDir: String): String = {
    val root = s"${System.getProperty("java.io.tmpdir")}/graft-$name-${math.abs(sfDir.hashCode)}"
    val rootPath = Paths.get(root)
    if (Files.exists(rootPath)) {
      val s = Files.walk(rootPath)
      try s.iterator().asScala.toSeq.reverseIterator.foreach(Files.deleteIfExists(_))
      finally s.close()
    }
    root
  }

  def indexUpsert(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.cell.{CellFunctions, CellIndex}
    graft.gen.GeoWorld.registerUdfs(spark)
    val root = freshRoot("snap-upsert", sfDir)
    val t = new SnapshotTable(spark, root)
    val base = graft.gen.GeoWorld.points(spark, sfDir)
      .select(col("pid"),
        CellFunctions.zcell(col("lon"), col("lat"), lit(CellIndex.RES_MID)).as("cell"))
      .withColumn("part", CellFunctions.zcellParent(
        col("cell"), lit(CellIndex.RES_MID), lit(2)))
      .withColumn("ver", lit(1L))
    t.init(base)
    t.upsert(base.filter(col("pid") % 3 === 0).withColumn("ver", lit(2L)), Seq("pid"))
    t.read().select(col("pid"), col("cell"), col("ver"))
  }

  val indexUpsertSql: String = {
    import graft.cell.{CellIndex, CellSql}
    graft.query.GeoQueries.withWorld() +
      s"""SELECT pid,
         |       ${CellSql.encode("lon", "lat", CellIndex.RES_MID)} AS cell,
         |       CAST(CASE WHEN pid % 3 = 0 THEN 2 ELSE 1 END AS BIGINT) AS ver
         |FROM pts""".stripMargin
  }

  /** Bbox fetch query window (a state-sized rect inside the world). */
  final val BBOX: (Double, Double, Double, Double) =
    (graft.gen.GeoWorld.LON0 + 2.0, graft.gen.GeoWorld.LAT0 + 2.0,
      graft.gen.GeoWorld.LON0 + 10.0, graft.gen.GeoWorld.LAT0 + 8.0)

  /** Routing resolution for the bbox-fetch snapshot index's partitions. */
  final val ROUTE_RES = 4

  /**
   * The reference's S5/S6 cell fetch SERVED FROM the snapshot table: the
   * point index is snapshotted with the res-[[ROUTE_RES]] routing cell as
   * its partition, a bbox query enumerates its coarse cover cells and
   * reads ONLY those partitions' files via the manifest ([[SnapshotTable
   * .readParts]] — at 100 TB the region's files, never the world's), then
   * refines exactly on lon/lat. The oracle is a plain bbox filter over
   * the world — parity proves manifest pruning loses nothing.
   */
  def bboxIndexFetch(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.cell.{CellFunctions, CellIndex}
    graft.gen.GeoWorld.registerUdfs(spark)
    val root = freshRoot("snap-bbox", sfDir)
    val t = new SnapshotTable(spark, root)
    t.init(graft.gen.GeoWorld.points(spark, sfDir)
      .select(col("pid"), col("lon"), col("lat"))
      .withColumn("part", CellFunctions.zcell(col("lon"), col("lat"), lit(ROUTE_RES))))
    val (lo0, la0, lo1, la1) = BBOX
    val parts = CellIndex.rectCover(lo0, la0, lo1, la1, ROUTE_RES).toSet
    t.readParts(parts)
      .filter(col("lon") > lo0 && col("lon") < lo1 && col("lat") > la0 && col("lat") < la1)
      .select(col("pid"), col("lon"), col("lat"))
  }

  val bboxIndexFetchSql: String = {
    val (lo0, la0, lo1, la1) = BBOX
    graft.query.GeoQueries.withWorld() +
      s"""SELECT pid, lon, lat FROM pts
         |WHERE lon > $lo0 AND lon < $lo1 AND lat > $la0 AND lat < $la1""".stripMargin
  }
}
