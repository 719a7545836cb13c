package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, SortOrder, Transform}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning, UnknownPartitioning}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.vectorized.ColumnarBatch

import graft.index.SnapshotTable

/**
 * DataSourceV2 READ path for [[graft.index.SnapshotTable]] (round-5 verdict
 * #7): the snapshot table as a first-class Spark source —
 * {{{
 *   spark.read.format("graft.sources.SnapshotSource")
 *     .option("root", root).option("version", "2").option("statscol", "cell")
 *     .load()
 * }}}
 * Pruning moves INTO scan planning: partition-equality/IN filters on `part`
 * and range filters on the stats column prune manifests, then files, at
 * `planInputPartitions` time (the same [[SnapshotTable.pruneFiles]] core the
 * programmatic reads use), so `WHERE part = 3 AND cell BETWEEN a AND b`
 * skips metadata and data without any engine-specific call. Every pushed
 * filter is ALSO returned as a residual — pruning can only skip files, never
 * rows, exactly like parquet's own pushdown contract.
 *
 * Execution is columnar: each input partition is one BYTE SLICE of a data
 * file (≤ `maxsplitbytes`, default `spark.sql.files.maxPartitionBytes` —
 * round-6 verdict #4: a fat compacted file plans many slices, each decoding
 * only the row groups whose midpoint it covers) read through Spark's own
 * `VectorizedParquetRecordReader` (public API of the parquet datasource),
 * with the `part` value attached as a PARTITION COLUMN from the manifest
 * entry — the physical `_part` column is never decoded, dropping the
 * `_part` re-append dance of the DataFrame path.
 *
 * The WRITE path (round-6 verdict #2) makes the table SQL-writable:
 * `INSERT INTO` appends, `INSERT OVERWRITE` truncates (static mode) or
 * replaces exactly the written partitions (dynamic mode), all riding
 * [[SnapshotTable.commitFiles]] — see the write-path section below.
 */
class SnapshotSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SnapshotSource.tableFor(options.asCaseSensitiveMap()).tableSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new SnapshotSource.SnapTable(schema, properties)
}

object SnapshotSource {

  private def tableFor(props: java.util.Map[String, String]): SnapshotTable = {
    val root = Option(props.get("root")).getOrElse(
      throw new IllegalArgumentException("graft snapshot source needs option 'root'"))
    new SnapshotTable(SparkSession.active, root,
      statsCol = Option(props.get("statscol")))
  }

  private[sources] final class SnapTable(schema: StructType,
      props: java.util.Map[String, String]) extends Table with SupportsRead with SupportsWrite
      with org.apache.spark.sql.connector.catalog.SupportsDelete
      with org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations
      with org.apache.spark.sql.connector.catalog.SupportsMetadataColumns {

    /** `_file` — the data file a row came from (Iceberg's `_file`),
      * attached at zero cost from the manifest entry like the virtual
      * `part`. Doubles as the row-level rewrite's required metadata: its
      * presence makes Spark project the write rows back to the TABLE
      * schema (the DataAndMetadataWritingSparkTask path) instead of
      * handing the writer raw op-prefixed rewrite rows. */
    override def metadataColumns(): Array[org.apache.spark.sql.connector.catalog.MetadataColumn] =
      Array(new org.apache.spark.sql.connector.catalog.MetadataColumn {
        override def name(): String = "_file"
        override def dataType(): org.apache.spark.sql.types.DataType =
          org.apache.spark.sql.types.StringType
        override def isNullable: Boolean = false
        override def comment(): String = "data file path of the row (from the manifest entry)"
      })

    /** SQL UPDATE / MERGE INTO / non-partition-aligned DELETE. Default:
      * group-based COPY-ON-WRITE at partition granularity
      * ([[SnapRowLevelOperation]]). Under `delete.mode=merge-on-read`
      * with a known MOR key: DELTA-based ([[SnapDeltaOperation]],
      * Spark's `SupportsDelta`) — the statement commits only the changed
      * rows as data files plus delete files of the retired keys, O(delta)
      * at any table size. Partition-aligned DELETEs never get here:
      * Spark's metadata-only optimization claims them through
      * [[SupportsDelete.canDeleteWhere]] first. */
    override def newRowLevelOperationBuilder(
        info: org.apache.spark.sql.connector.write.RowLevelOperationInfo)
        : org.apache.spark.sql.connector.write.RowLevelOperationBuilder = {
      val mor = Option(props.get("delete.mode")).exists(_.equalsIgnoreCase("merge-on-read"))
      val key = Option(props.get("morkey")).orElse(tableFor(props).morKey)
      (mor, key) match {
        case (true, Some(k)) => () => new SnapDeltaOperation(info.command(), schema, props, k)
        case _ => () => new SnapRowLevelOperation(info.command(), schema, props)
      }
    }
    override def name(): String = s"graft-snapshot(${props.get("root")})"
    /** Under MOR mode the row-identity columns report NON-NULLABLE (a
      * Spark requirement for delta row-level operations — Iceberg's
      * identifier fields carry the same constraint): `part` is non-null
      * by the write contract already; a MOR table's key must be too (a
      * null key has no equality-delete identity; the delta writer
      * enforces it). Plain tables keep their declared nullability. */
    override def schema(): StructType = {
      val mor = Option(props.get("delete.mode")).exists(_.equalsIgnoreCase("merge-on-read"))
      // same resolution as newRowLevelOperationBuilder: a key known only
      // from mor.json must report non-nullable too (round-7 ADVICE — the
      // props-only lookup left it nullable, inconsistent with the delta
      // operation's row-identity requirement)
      val key = Option(props.get("morkey")).orElse(tableFor(props).morKey)
      if (!mor) schema
      else StructType(schema.fields.map(f =>
        if (f.name == "part" || key.contains(f.name)) f.copy(nullable = false) else f))
    }
    // identity partitioning on `part` (the table's physical layout): with
    // it declared, INSERT OVERWRITE under partitionOverwriteMode=dynamic
    // plans OverwritePartitionsDynamic instead of a whole-table truncate
    override def partitioning(): Array[Transform] = Array(Expressions.identity("part"))
    override def capabilities(): java.util.Set[TableCapability] =
      java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
        TableCapability.TRUNCATE, TableCapability.OVERWRITE_DYNAMIC,
        TableCapability.MICRO_BATCH_READ, TableCapability.STREAMING_WRITE)
    /** Per-operation options LAYERED OVER the table's own properties: on
      * the TableProvider path the two coincide, but a CATALOG-loaded table
      * carries only `root` (+ time-travel `version`) — without the merge,
      * read/write options (`startingversion`, `maxversionspertrigger`,
      * `replacepartitions`, `targetfilebytes`, `maxsplitbytes`…) would be
      * silently dropped for `spark.readStream.table` / `writeStream
      * .toTable`. Operation options win on conflict (explicit beats
      * ambient). */
    private def merged(opts: java.util.Map[String, String]): java.util.Map[String, String] = {
      val m = new java.util.HashMap[String, String](props)
      m.putAll(opts)
      m
    }

    override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
      new SnapScanBuilder(schema, merged(options.asCaseSensitiveMap()))
    override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
      new SnapWriteBuilder(info, merged(info.options().asCaseSensitiveMap()))

    // ------------------- SQL DELETE (Iceberg's metadata delete contract):
    // `DELETE FROM t WHERE <partition predicates>` is accepted ONLY when
    // the whole WHERE translates to a `part` value set — the delete is
    // then pure manifest surgery (SnapshotTable.deleteParts: no data file
    // opened, read, or written; dropped files stay for time travel until
    // expire()). Anything finer-grained is REJECTED here so Spark raises
    // its standard "cannot translate/delete" analysis error instead of a
    // silent partial delete — row-level deletes go through the COW
    // SnapshotTable.delete() API, exactly like Iceberg splits metadata
    // deletes from copy-on-write ones.
    // With `delete.mode=merge-on-read` (Iceberg's write knob) a key-only
    // DELETE (`morkey = x` / `morkey IN (…)`, optionally ANDed with part
    // predicates) commits DELETE FILES instead of rewriting: O(keys)
    // write cost on a table of any size. A part predicate scopes them to
    // partitions (false positives are harmless — equality deletes no-op
    // where the key is absent); without one the delete is GLOBAL.
    private def morMode: Boolean =
      Option(props.get("delete.mode")).exists(_.equalsIgnoreCase("merge-on-read"))
    private def morKeyName: Option[String] =
      Option(props.get("morkey")).orElse(tableFor(props).morKey)
    private def morKeysOf(filters: Array[Filter]): Option[(Seq[Long], Option[Set[Long]])] =
      morKeyName.flatMap { key =>
        def longOf(v: Any): Option[Long] = v match {
          case l: Long => Some(l); case i: Int => Some(i.toLong); case _ => None
        }
        val real = filters.filterNot(_.isInstanceOf[AlwaysTrue])
        // the filters arrive as a CONJUNCTION, so repeated predicates on the
        // key (or on part) must INTERSECT per-conjunct value sets — the
        // previous builder unioned them, and `pid IN (1,2) AND pid IN (2,3)`
        // would have deleted keys 1, 2 AND 3 (round-7 ADVICE, medium: a
        // silent violation of the canDeleteWhere exactness contract).
        // deletePartsOf has always intersected; this mirrors it.
        val keySets = Seq.newBuilder[Set[Long]]
        val partSets = Seq.newBuilder[Set[Long]]
        val ok = real.forall {
          case EqualTo(`key`, v) if longOf(v).isDefined =>
            keySets += Set(longOf(v).get); true
          case In(`key`, vs) if vs.nonEmpty && vs.forall(longOf(_).isDefined) =>
            keySets += vs.flatMap(longOf).toSet; true
          case EqualTo("part", v) if longOf(v).isDefined =>
            partSets += Set(longOf(v).get); true
          case In("part", vs) if vs.forall(longOf(_).isDefined) =>
            partSets += vs.flatMap(longOf).toSet; true
          case _ => false
        }
        val ks = keySets.result()
        val ps = partSets.result()
        if (ok && ks.nonEmpty)
          Some((ks.reduce(_ intersect _).toSeq.sorted, ps.reduceOption(_ intersect _)))
        else None
      }

    override def canDeleteWhere(filters: Array[Filter]): Boolean =
      deletePartsOf(filters).isDefined || (morMode && morKeysOf(filters).isDefined)
    override def deleteWhere(filters: Array[Filter]): Unit = {
      val t = tableFor(props)
      // CAS against the CURRENT version at execution (same rule as the
      // write path): a rival commit landing between plan and here makes
      // CREATE_NEW fail and the statement must be re-run
      val basedOn = t.currentVersion
      deletePartsOf(filters) match {
        case Some(None) => t.truncateAll(basedOn)
        case Some(Some(ps)) => t.deleteParts(ps, basedOn)
        case None => (if (morMode) morKeysOf(filters) else None) match {
          case Some((keys, partsOpt)) =>
            val session = SparkSession.active
            import session.implicits._
            val key = morKeyName.get
            val df = partsOpt match {
              case None => keys.toDF(key)
              case Some(ps) => // scope to partitions: every (key, part) pair
                keys.flatMap(k => ps.map(p => (k, p))).toDF(key, "part")
            }
            t.deleteKeysMor(df, key)
            ()
          case None => throw new UnsupportedOperationException(
            s"graft snapshot DELETE supports partition predicates on `part` " +
              "(metadata delete) or, under delete.mode=merge-on-read, " +
              s"equality predicates on the MOR key; got ${filters.mkString(", ")}")
        }
      }
      ()
    }
  }

  /** Translate a DELETE's conjunctive filters to a partition set:
    * `Some(None)` = unconditional (truncate), `Some(Some(ps))` = drop
    * exactly `ps`, `None` = not a pure partition predicate (rejected).
    * Disjunctions of part equalities union; conjuncts intersect. */
  private[sources] def deletePartsOf(filters: Array[Filter]): Option[Option[Set[Long]]] = {
    def longOf(v: Any): Option[Long] = v match {
      case l: Long => Some(l)
      case i: Int => Some(i.toLong)
      case s: Short => Some(s.toLong)
      case b: Byte => Some(b.toLong)
      case _ => None
    }
    def partsOf(f: Filter): Option[Set[Long]] = f match {
      case EqualTo("part", v) => longOf(v).map(Set(_))
      case In("part", vs) =>
        val ps = vs.flatMap(longOf(_))
        if (ps.length == vs.length) Some(ps.toSet) else None
      case Or(a, b) => for { x <- partsOf(a); y <- partsOf(b) } yield x ++ y
      case _ => None
    }
    val real = filters.filterNot(_.isInstanceOf[AlwaysTrue])
    if (real.isEmpty) Some(None)
    else {
      val sets = real.map(partsOf)
      if (sets.forall(_.isDefined)) Some(Some(sets.flatten.reduce(_ intersect _)))
      else None
    }
  }

  private final class SnapScanBuilder(schema: StructType,
      props: java.util.Map[String, String],
      register: SnapScan => Unit = _ => (),
      rewriteScan: Boolean = false)
      extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns
      with SupportsPushDownAggregates with SupportsPushDownLimit with SupportsPushDownTopN {

    private val table = tableFor(props)
    // the EFFECTIVE stats column comes from table metadata (persisted at
    // init), never the free-form option alone: the constructor validates a
    // declared 'statscol' against the persisted one and throws on mismatch,
    // so pushed range filters can never prune on foreign bounds
    // (round-6 ADVICE, medium)
    private val statsCol = table.statsColumn
    private var required: StructType = schema
    private var parts: Option[Set[Long]] = None
    private var range: Option[(Long, Long)] = None
    private var pushed: Array[Filter] = Array.empty

    private def longOf(v: Any): Option[Long] = v match {
      case l: Long => Some(l)
      case i: Int => Some(i.toLong)
      case s: Short => Some(s.toLong)
      case b: Byte => Some(b.toLong)
      case _ => None
    }

    /** Long data columns of the table (not virtual `part`) — candidates
      * for point-lookup predicates handed to the parquet reader. */
    private def longDataCol(c: String): Boolean =
      c != "part" && schema.fields.exists(f => f.name == c && f.dataType == LongType)

    /** Point-lookup predicates (EqualTo / small In on ANY long data
      * column) collected for executor-side parquet filtering: no manifest
      * has bounds for non-stats columns, so these prune nothing at
      * planning — but the reader's FilterPredicate lets parquet drop row
      * groups via column stats, dictionaries, and bloom filters. The S5
      * point fetch (`cell = x AND id = y`) then decodes only the row
      * groups that can hold the id, even inside a fat compacted cell. */
    private var pointEq: Seq[(String, Seq[Long])] = Seq.empty

    override def pushFilters(filters: Array[Filter]): Array[Filter] = {
      var lo = Long.MinValue
      var hi = Long.MaxValue
      val used = Array.newBuilder[Filter]
      val eqs = Seq.newBuilder[(String, Seq[Long])]
      filters.foreach {
        case f @ EqualTo("part", v) if longOf(v).isDefined =>
          val p = longOf(v).get
          parts = Some(parts.fold(Set(p))(_.intersect(Set(p)))); used += f
        case f @ In("part", vs) if vs.forall(longOf(_).isDefined) =>
          val ps = vs.flatMap(longOf).toSet
          parts = Some(parts.fold(ps)(_.intersect(ps))); used += f
        case f @ GreaterThan(c, v) if statsCol.contains(c) && longOf(v).isDefined =>
          lo = math.max(lo, longOf(v).get); used += f
        case f @ GreaterThanOrEqual(c, v) if statsCol.contains(c) && longOf(v).isDefined =>
          lo = math.max(lo, longOf(v).get); used += f
        case f @ LessThan(c, v) if statsCol.contains(c) && longOf(v).isDefined =>
          hi = math.min(hi, longOf(v).get); used += f
        case f @ LessThanOrEqual(c, v) if statsCol.contains(c) && longOf(v).isDefined =>
          hi = math.min(hi, longOf(v).get); used += f
        case f @ EqualTo(c, v) if statsCol.contains(c) && longOf(v).isDefined =>
          lo = math.max(lo, longOf(v).get); hi = math.min(hi, longOf(v).get); used += f
        case f @ EqualTo(c, v) if longDataCol(c) && longOf(v).isDefined =>
          eqs += ((c, Seq(longOf(v).get))); used += f
        case f @ In(c, vs) if longDataCol(c) && vs.nonEmpty && vs.length <= 64 &&
            vs.forall(longOf(_).isDefined) =>
          eqs += ((c, vs.flatMap(longOf).toSeq)); used += f
        case _ => ()
      }
      if (lo != Long.MinValue || hi != Long.MaxValue) range = Some((lo, hi))
      pointEq = eqs.result()
      pushed = used.result()
      // every filter stays a residual: bounds pruning skips FILES, the
      // engine still evaluates exact row predicates (parquet's contract)
      filters
    }

    override def pushedFilters(): Array[Filter] = pushed

    override def pruneColumns(requiredSchema: StructType): Unit =
      required = requiredSchema

    // ------------- LIMIT / TOP-N FILE PRUNING (manifest row counts) -----
    // Spark only offers these when NOTHING sits between the Limit (or
    // Sort+Limit) and the scan — and every filter of ours stays residual
    // as a post-scan Filter node, so a filtered query never reaches here.
    // That makes file-level pruning sound: any `n` rows satisfy LIMIT n,
    // so planning keeps files only until their manifest row counts cover
    // the limit (a 100 TB table's `LIMIT 10` preview reads ONE file). Both
    // are PARTIAL pushdowns (isPartiallyPushed stays true): Spark still
    // applies the exact limit / re-sorts above the pruned scan.
    private var limitRows: Option[Int] = None
    private var topN: Option[(Boolean, Boolean, Int)] = None // (asc, nullsFirst, k)

    override def pushLimit(n: Int): Boolean = { limitRows = Some(n); true }

    // both parent traits default this true; Scala requires the diamond be
    // resolved explicitly — and partial IS the contract: Spark re-applies
    // the exact limit / re-sorts above the file-pruned scan
    override def isPartiallyPushed(): Boolean = true

    /**
     * ORDER BY statsCol LIMIT k: the per-file [lo, hi] bounds plus the
     * per-file NULL counts admit a sound cutoff. All of a file's non-null
     * rows sit in [lo, hi] and its `nulls` rows sort wholesale first or
     * last (the query's null ordering), so: subtract the null population
     * from k (nulls-first) or demand k non-nulls exist (nulls-last), then
     * walk bounded files by reachable extreme — `hi` ascending for ASC —
     * accumulating NON-NULL rows until they cover what's needed; every
     * accumulated row is ≤ H (the last taken `hi`), so the needed-th
     * smallest non-null is ≤ H and files with `lo` > H cannot contribute
     * (mirrored via `lo` descending for DESC). Null-carrying files are
     * kept whenever nulls participate. Entries missing bounds or null
     * counts (pre-stats manifests) keep the scan un-pruned rather than
     * guessing — the pushdown itself stays accepted; pruning is what
     * declines.
     */
    override def pushTopN(orders: Array[SortOrder], n: Int): Boolean = {
      import org.apache.spark.sql.connector.expressions.{NamedReference, NullOrdering, SortDirection}
      orders match {
        case Array(o) =>
          val onStats = o.expression() match {
            case r: NamedReference =>
              r.fieldNames.length == 1 && statsCol.contains(r.fieldNames.head)
            case _ => false
          }
          val statsIsLong = statsCol.exists(c =>
            schema.fields.exists(f => f.name == c && f.dataType == LongType))
          if (onStats && statsIsLong) {
            topN = Some((o.direction == SortDirection.ASCENDING,
              o.nullOrdering() == NullOrdering.NULLS_FIRST, n))
            true
          } else false
        case _ => false
      }
    }

    /** Keep files (in manifest order) until their rows cover `n`. */
    private def limitPrune(entries: Seq[SnapshotTable.FileEntry], n: Int)
        : Seq[SnapshotTable.FileEntry] = {
      var cum = 0L
      entries.takeWhile { e => val need = cum < n; cum += e.rows; need }
    }

    private def topNPrune(entries: Seq[SnapshotTable.FileEntry],
        asc: Boolean, nullsFirst: Boolean, k: Int): Seq[SnapshotTable.FileEntry] = {
      val nonNullable = statsCol.exists(c =>
        schema.fields.exists(f => f.name == c && !f.nullable))
      // exact null count per file, or None = unknown (declines pruning)
      def nullsOf(e: SnapshotTable.FileEntry): Option[Long] =
        e.nulls.orElse(if (nonNullable) Some(0L) else None)
      val info = entries.map(e => (e, nullsOf(e)))
      val usable = info.forall { case (e, n) =>
        n.isDefined && (n.get == e.rows || (e.lo.isDefined && e.hi.isDefined)) }
      if (!usable) return entries
      val withN = info.map { case (e, n) => (e, n.get) }
      val totalNull = withN.map(_._2).sum
      val totalNonNull = withN.map { case (e, n) => e.rows - n }.sum
      val bounded = withN.filter { case (e, n) => n < e.rows } // these have bounds
      val sorted =
        if (asc) bounded.sortBy { case (e, _) => e.hi.get }
        else bounded.sortBy { case (e, _) => -e.lo.get }
      // H (asc) / L (desc) such that >= `needed` non-null rows rank at or
      // inside it; None = every bounded file is needed
      def cutoff(needed: Long): Option[Long] = {
        var cum = 0L
        sorted.iterator.map { case (e, n) =>
          cum += e.rows - n
          (if (asc) e.hi.get else e.lo.get, cum)
        }.collectFirst { case (bound, c) if c >= needed => bound }
      }
      def inCut(bound: Long)(e: SnapshotTable.FileEntry): Boolean =
        if (asc) e.lo.exists(_ <= bound) else e.hi.exists(_ >= bound)
      if (nullsFirst) {
        if (totalNull >= k) withN.collect { case (e, n) if n > 0 => e }
        else cutoff(k - totalNull) match {
          case None => entries
          case Some(b) => withN.collect { case (e, n) if n > 0 || inCut(b)(e) => e }
        }
      } else {
        if (totalNonNull < k) entries // nulls fill the tail: everything participates
        else cutoff(k) match {
          case None => withN.collect { case (e, n) if n < e.rows => e } // all-null files can't rank
          case Some(b) => withN.collect { case (e, n) if n < e.rows && inCut(b)(e) => e }
        }
      }
    }

    // ------------- METADATA-ONLY AGGREGATES (Iceberg's metadata count) --
    // COUNT(*), MIN(statsCol), MAX(statsCol) — optionally GROUP BY part —
    // are answered from the MANIFEST ENTRIES alone: rows are exact per
    // file, and lo/hi are exact per-file extremes of the stats column
    // (footer numeric statistics / writer-side tracking). A 100 TB table's
    // count never opens a data file. Spark only offers aggregates here
    // when no post-scan filter remains, and every filter of ours is
    // residual — so a filtered query automatically falls back to the real
    // scan; Min/Max are accepted only when EVERY pruned entry carries
    // bounds (an all-NULL or non-numeric stats file rejects the pushdown).
    private var aggPlan: Option[(Boolean, Seq[String])] = None // (grouped, kinds)

    private def version: Int = Option(props.get("version")).map(_.toInt).getOrElse(-1)

    private def aggPushable(a: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
        : Option[(Boolean, Seq[String])] = {
      import org.apache.spark.sql.connector.expressions.aggregate.{CountStar, Max, Min}
      import org.apache.spark.sql.connector.expressions.NamedReference
      def nameOf(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
        e match {
          case r: NamedReference if r.fieldNames.length == 1 => Some(r.fieldNames.head)
          case _ => None
        }
      val grouped = a.groupByExpressions match {
        case Array() => Some(false)
        case Array(r: NamedReference) if r.fieldNames.sameElements(Array("part")) => Some(true)
        case _ => None
      }
      val statsIsLong = statsCol.exists(c =>
        schema.fields.exists(f => f.name == c && f.dataType == LongType))
      val kinds = a.aggregateExpressions.toSeq.map {
        case _: CountStar => Some("count")
        case m: Min if statsIsLong && nameOf(m.column) == statsCol => Some("min")
        case m: Max if statsIsLong && nameOf(m.column) == statsCol => Some("max")
        case _ => None
      }
      for {
        g <- grouped
        ks <- if (kinds.nonEmpty && kinds.forall(_.isDefined)) Some(kinds.flatten) else None
        // manifest counts/bounds IGNORE merge-on-read deletes — with any
        // APPLICABLE delete file covering the scan, the metadata answer
        // would count deleted rows, so the pushdown declines and the real
        // (delete-applying) scan answers. Applicability, not presence
        // (round-7 ADVICE): a delete made inert by compaction's fold
        // (every covering data file's seq >= the delete's) must not keep
        // the pushdown disabled forever.
        if !SnapshotSource.anyDeleteApplies(
          table.pruneFilesSplit(parts, range, version))
        // Min/Max demand bounds on EVERY covering entry (cheap: manifests)
        if !ks.exists(k => k == "min" || k == "max") ||
          table.pruneFiles(parts, range, version).forall(e => e.lo.isDefined && e.hi.isDefined)
      } yield (g, ks)
    }

    override def supportCompletePushDown(
        a: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
      aggPushable(a).isDefined

    override def pushAggregation(
        a: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
      aggPlan = aggPushable(a)
      aggPlan.isDefined
    }

    override def build(): Scan = {
      val (entries, delEntries) = table.pruneFilesSplit(parts, range, version)
      aggPlan match {
        case Some((grouped, kinds)) =>
          def aggValues(es: Seq[SnapshotTable.FileEntry]): Seq[Any] = kinds.map {
            case "count" => es.map(_.rows).sum
            case "min" => if (es.isEmpty) null else es.flatMap(_.lo).min
            case _ => if (es.isEmpty) null else es.flatMap(_.hi).max
          }
          val rows: Seq[Seq[Any]] =
            if (!grouped) Seq(aggValues(entries))
            else entries.groupBy(_.part).toSeq.sortBy(_._1)
              .map { case (p, es) => p +: aggValues(es) }
          val fields =
            (if (grouped) Seq(StructField("part", LongType, nullable = false)) else Nil) ++
              kinds.zipWithIndex.map { case (k, i) =>
                StructField(s"agg_${i}_$k", LongType, nullable = k != "count") }
          return new SnapAggScan(StructType(fields), rows)
        case None => ()
      }
      // read schema in TABLE order (physical file order) so the vectorized
      // reader's output needs no per-batch reordering; Spark projects to
      // the query's order above the scan. The virtual columns (`part`,
      // metadata `_file`) trail the data columns — they are attached as
      // partition values, which the vectorized reader appends at the end.
      // On a MOR table the key column is FORCED into the read set (the
      // per-row delete filter needs it; pruneColumns is advisory — the
      // scan may return a superset and Spark projects). Unconditional on
      // mor.json, not on current deletes: a change-feed stream planned
      // before the first MOR delete must still be able to filter later
      // batches.
      val morKey = table.morKey
      val names = required.fieldNames.toSet ++ morKey
      val ordered = StructType(schema.fields.filter(f => names.contains(f.name)) ++
        (if (names.contains("_file"))
          Seq(StructField("_file", org.apache.spark.sql.types.StringType, nullable = false))
        else Nil))
      val session = SparkSession.active
      // FAT FILES SPLIT AT PLAN TIME (round-6 verdict #4): one input
      // partition per ≤ maxsplitbytes byte slice, not per file — a huge
      // compacted file no longer serializes a whole task. Slices tile the
      // file; each reader processes exactly the row groups whose midpoint
      // falls in its slice (parquet's own range contract, the same rule
      // Spark's file scan splits by), so a row group is read exactly once
      // across the slices. No footer is opened at planning — slicing is
      // byte arithmetic over the manifest's size field.
      val target = Option(props.get("maxsplitbytes")).map(_.toLong).getOrElse(
        session.sessionState.conf.getConf(
          org.apache.spark.sql.internal.SQLConf.FILES_MAX_PARTITION_BYTES))
      require(target > 0, s"maxsplitbytes must be positive, got $target")
      // limit/top-N prune by MANIFEST row counts, which OVERCOUNT when
      // equality deletes apply — pruning could then under-plan and return
      // fewer than `limit` existing rows, so APPLICABLE deletes decline it
      // (inert ones — folded by compaction — do not, round-7 ADVICE)
      val filePrune: Seq[SnapshotTable.FileEntry] => Seq[SnapshotTable.FileEntry] =
        (topN, limitRows) match {
          case _ if SnapshotSource.anyDeleteApplies((entries, delEntries)) => identity
          case (Some((asc, nf, k)), _) => topNPrune(_, asc, nf, k)
          case (None, Some(n)) => limitPrune(_, n)
          case _ => identity
        }
      // GROUP EXPANSION for COW rewrite scans (caught by the armed DML
      // model check): Spark's group-based planning pushes the command's
      // CONDITION into this scan, but our replace group is the PARTITION,
      // not the file — file-pruning a matched partition by stats range
      // would read only its matching files and then REPLACE the whole
      // partition without the pruned files' rows (silent data loss; for
      // Iceberg the pushdown is safe only because its group IS the file).
      // So a rewrite scan uses the pushed range solely to find CANDIDATE
      // partitions, then reads them WHOLE: no stats range at plan time, no
      // row-group predicate in the reader, partition set narrowed instead.
      val (scanParts, scanRange) =
        if (rewriteScan && range.isDefined) (Some(entries.map(_.part).toSet), None)
        else (parts, range)
      val pruned =
        if (rewriteScan && range.isDefined)
          table.pruneFiles(scanParts, None, version)
        else filePrune(entries)
      val scan = new SnapScan(ordered, table, scanParts, scanRange, version, target,
        if (rewriteScan) identity else filePrune,
        if (rewriteScan) None else statsCol,
        morKey.map(ordered.fieldIndex).getOrElse(-1),
        (pruned.map(_.bytes).sum, pruned.map(_.rows).sum),
        if (Option(props.get("spj")).exists(_.toBoolean))
          pruned.iterator.map(_.part).toSet.size
        else -1,
        readerConf(session, ordered, statsCol,
          if (rewriteScan) None else range,
          if (rewriteScan) Seq.empty else pointEq),
        Option(props.get("startingversion")).map(_.toInt).getOrElse(0),
        Option(props.get("maxversionspertrigger")).map(_.toInt))
      register(scan)
      scan
    }
  }

  /** A pushed-down metadata aggregate: the result rows were computed from
    * the manifest entries at plan time; ONE input partition replays them. */
  private final class SnapAggScan(out: StructType, rows: Seq[Seq[Any]])
      extends Scan with Batch {
    override def readSchema(): StructType = out
    override def toBatch: Batch = this
    override def description(): String =
      s"graft-snapshot METADATA aggregate (${rows.size} rows, no data files)"
    override def planInputPartitions(): Array[InputPartition] =
      Array(SnapAggPartition(rows))
    override def createReaderFactory(): PartitionReaderFactory = SnapAggReaderFactory
  }

  private final case class SnapAggPartition(rows: Seq[Seq[Any]]) extends InputPartition

  private object SnapAggReaderFactory extends PartitionReaderFactory {
    override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
      val it = p.asInstanceOf[SnapAggPartition].rows.iterator
      new PartitionReader[InternalRow] {
        private var cur: InternalRow = _
        override def next(): Boolean =
          if (it.hasNext) { cur = InternalRow.fromSeq(it.next()); true } else false
        override def get(): InternalRow = cur
        override def close(): Unit = ()
      }
    }
  }

  /** Byte-slice a pruned file set (≤ `target` bytes per input partition —
    * see the slicing notes in [[SnapScanBuilder.build]]). Each slice also
    * carries the equality-delete files APPLICABLE to its data file
    * ([[SnapshotTable.deleteApplies]] — the sequence rule resolves at
    * planning, per entry), plus the MOR key's column index so the reader
    * can row-filter. */
  private def sliceEntries(entries: Seq[SnapshotTable.FileEntry],
      target: Long, dels: Seq[SnapshotTable.FileEntry] = Seq.empty,
      morKeyIdx: Int = -1): Seq[SnapInputPartition] =
    entries.flatMap { e =>
      val applicable =
        if (dels.isEmpty) Nil
        else dels.filter(SnapshotTable.deleteApplies(_, e)).map(_.path).toList
      require(applicable.isEmpty || morKeyIdx >= 0,
        "deletes apply but the scan schema carries no MOR key (mor.json missing?)")
      val n = math.max(1L, (e.bytes + target - 1) / target)
      val len = (e.bytes + n - 1) / n
      // ceil-of-ceil can leave a zero-length tail (bytes=9, n=4, len=3):
      // drop it rather than plan an empty task
      (0L until n).iterator
        .map(i => SnapInputPartition(e.path, e.part, i * len,
          math.min(len, e.bytes - i * len), applicable,
          if (applicable.isEmpty) -1 else morKeyIdx))
        .filter(_.length > 0).toSeq
    }

  /** The per-task hadoop conf the split-based vectorized reader needs:
    * the session conf plus the requested (physical) schema and the five
    * SQLConf booleans `ParquetToSparkSchemaConverter` dereferences. Built
    * ONCE at plan time on the driver, shipped via SerializableWritable.
    *
    * When the scan carries a stats-column RANGE, it is also planted as a
    * parquet `FilterPredicate`: the reader's `HadoopReadOptions` picks it
    * up (`withRecordFilter(getFilter(conf))`) and ParquetFileReader drops
    * whole ROW GROUPS whose footer min/max miss the range — pruning one
    * level below the manifests' file granularity, at the executor, with
    * no extra I/O (the footer is already open). A compacted 1 GB file
    * whose row groups band the stats column then decodes only the
    * matching groups. Rows are only ever DROPPED, never added, and every
    * pushed filter stays residual above the scan, so over-delivery and
    * under-stats files (a pre-evolution file missing the column is
    * all-null and correctly matches no range) both stay exact. */
  private def readerConf(session: SparkSession, out: StructType,
      statsCol: Option[String] = None, range: Option[(Long, Long)] = None,
      pointEq: Seq[(String, Seq[Long])] = Seq.empty)
      : org.apache.spark.SerializableWritable[org.apache.hadoop.conf.Configuration] = {
    import org.apache.spark.sql.internal.SQLConf
    import org.apache.parquet.filter2.predicate.{FilterApi, FilterPredicate}
    val conf = session.sessionState.newHadoopConf()
    val physical = StructType(out.fields.filterNot(f => f.name == "part" || f.name == "_file"))
    conf.set("parquet.read.support.class",
      classOf[org.apache.spark.sql.execution.datasources.parquet.ParquetReadSupport].getName)
    conf.set(org.apache.spark.sql.execution.datasources.parquet
      .ParquetReadSupport.SPARK_ROW_REQUESTED_SCHEMA, physical.json)
    val sql = session.sessionState.conf
    Seq(SQLConf.PARQUET_BINARY_AS_STRING, SQLConf.PARQUET_INT96_AS_TIMESTAMP,
        SQLConf.CASE_SENSITIVE, SQLConf.LEGACY_PARQUET_NANOS_AS_LONG,
        SQLConf.PARQUET_INFER_TIMESTAMP_NTZ_ENABLED)
      .foreach(e => conf.setBoolean(e.key, sql.getConf(e)))
    // predicates only reference columns the scan actually reads — parquet
    // rejects a record filter referencing a column outside the projection
    def readable(c: String): Boolean =
      physical.fields.exists(f => f.name == c && f.dataType == LongType)
    val rangePred: Option[FilterPredicate] = for {
      c <- statsCol
      (lo, hi) <- range
      if readable(c)
      preds = Seq(
        if (lo != Long.MinValue) Some(FilterApi.gtEq(FilterApi.longColumn(c),
          java.lang.Long.valueOf(lo))) else None,
        if (hi != Long.MaxValue) Some(FilterApi.ltEq(FilterApi.longColumn(c),
          java.lang.Long.valueOf(hi))) else None).flatten
      if preds.nonEmpty
    } yield preds.reduce[FilterPredicate](FilterApi.and)
    // point lookups (EqualTo / small In) on any long data column: parquet
    // skips row groups via stats, dictionary pages, and bloom filters
    val eqPreds: Seq[FilterPredicate] = pointEq.collect {
      case (c, vs) if readable(c) && vs.nonEmpty =>
        vs.map(v => FilterApi.eq(FilterApi.longColumn(c),
          java.lang.Long.valueOf(v)): FilterPredicate).reduce(FilterApi.or)
    }
    val all = rangePred.toSeq ++ eqPreds
    if (all.nonEmpty)
      org.apache.parquet.hadoop.ParquetInputFormat.setFilterPredicate(
        conf, all.reduce(FilterApi.and))
    new org.apache.spark.SerializableWritable(conf)
  }

  // ------------------------------------------------------ DSv2 WRITE path

  /**
   * SQL writes onto the snapshot table (round-6 verdict #2), riding the
   * existing COW/commit machinery ([[SnapshotTable.commitFiles]]):
   * `INSERT INTO` appends, `INSERT OVERWRITE` truncates (static mode) or
   * replaces exactly the written partitions (dynamic mode). The write
   * REQUIRES a clustered distribution on `part`, so each partition's rows
   * land in one task and one file — without it every task would fan a
   * file into every partition dir (the measured buckets×tasks tiny-file
   * cliff). Writers stream rows through Spark's own `ParquetWriteSupport`
   * and track (rows, stats-column min/max) INLINE, so the commit needs no
   * footer reads anywhere — driver or executor. CREATE_NEW still decides
   * a commit race; the loser's files are deleted and the racer must retry.
   */
  private final class SnapWriteBuilder(info: LogicalWriteInfo,
      props: java.util.Map[String, String])
      extends WriteBuilder with SupportsTruncate with SupportsDynamicOverwrite {
    private var mode: SnapshotTable.WriteMode = SnapshotTable.WriteAppend
    override def truncate(): WriteBuilder = { mode = SnapshotTable.WriteTruncate; this }
    override def overwriteDynamicPartitions(): WriteBuilder = {
      mode = SnapshotTable.WriteDynamicOverwrite; this }
    override def build(): Write = new SnapWrite(info.schema(), props, mode, info.queryId())
  }

  private final class SnapWrite(schema: StructType,
      props: java.util.Map[String, String], mode: SnapshotTable.WriteMode,
      queryId: String)
      extends Write with RequiresDistributionAndOrdering {
    override def description(): String = s"graft-snapshot write ($mode)"
    // one shuffle clusters each `part` into one task → one file per
    // partition per write (compact() re-slices fat ones later)
    override def requiredDistribution(): Distribution =
      Distributions.clustered(Array(Expressions.column("part")))
    override def requiredOrdering(): Array[SortOrder] = Array.empty
    override def toBatch: BatchWrite = new SnapBatchWrite(schema, props, mode)
    override def toStreaming: org.apache.spark.sql.connector.write.streaming.StreamingWrite =
      new SnapStreamingWrite(schema, props, mode, queryId)
  }

  /** The shared writer-factory setup (physical `_part` schema, stats/part
    * column indices, file-roll target, shipped conf) — identical for the
    * batch and streaming write paths. */
  private def writerSetup(schema: StructType, table: SnapshotTable,
      props: java.util.Map[String, String]): (Int, Int, Long,
      org.apache.spark.SerializableWritable[org.apache.hadoop.conf.Configuration]) = {
    val session = SparkSession.active
    // physical file schema: `part` (always last in table read order)
    // persists as the `_part` data column — same positions, same values,
    // matching the programmatic writes' layout exactly
    val physical = StructType(schema.fields.map(f =>
      if (f.name == "part") f.copy(name = "_part") else f))
    val partIdx = schema.fieldIndex("part")
    val statsIdx = table.statsColumn.map(schema.fieldIndex).getOrElse(-1)
    val statsIsLong = statsIdx >= 0 && schema.fields(statsIdx).dataType == LongType
    val targetBytes = Option(props.get("targetfilebytes")).map(_.toLong)
      .getOrElse(SnapshotSource.DEFAULT_TARGET_FILE_BYTES)
    require(targetBytes > 0, s"targetfilebytes must be positive, got $targetBytes")
    (partIdx, if (statsIsLong) statsIdx else -1, targetBytes,
      writerConf(session, physical))
  }

  /**
   * Micro-batch streaming sink onto the snapshot table — `writeStream
   * .format("graft.sources.SnapshotSource")` closes the loop with the
   * change-feed read: a pipeline can tail one snapshot table and commit
   * its transform into another, each epoch an ordinary snapshot version
   * (time-travel, change feed, and SQL reads all see it immediately).
   * EXACTLY-ONCE: every epoch commit stamps `(queryId, epochId)` into the
   * snapshot JSON; a restarted query replaying its last batch hits the
   * fence in [[SnapshotTable.commitFilesEpoch]] and drops the duplicate.
   * Data files land under ONE scratch dir per query run (per-epoch
   * subdirs), on the attempt-dir naming so a crashed run is swept by
   * expire(). Append mode appends; Complete mode truncates per epoch; and
   * `option("replacepartitions", "true")` turns an Append stream into a
   * PARTITION-REPLACE sink — each epoch replaces exactly the partitions it
   * carries. That is the mode that makes `change feed → sink` an exact
   * MIRROR of the upstream table: the feed re-emits whole rewritten
   * partitions, so replaying them as partition overwrites converges the
   * follower to the leader state instead of accumulating duplicates.
   */
  private final class SnapStreamingWrite(schema: StructType,
      props: java.util.Map[String, String], mode0: SnapshotTable.WriteMode,
      queryId: String)
      extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {

    private val mode =
      if (mode0 == SnapshotTable.WriteAppend &&
          Option(props.get("replacepartitions")).exists(_.toBoolean))
        SnapshotTable.WriteDynamicOverwrite
      else mode0
    private val table = tableFor(props)
    private val scratch = table.provisionStreamDir()

    override def createStreamingWriterFactory(info: PhysicalWriteInfo)
        : org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory = {
      val (partIdx, statsIdx, targetBytes, conf) = writerSetup(schema, table, props)
      SnapStreamWriterFactory(scratch, partIdx, statsIdx, targetBytes, conf)
    }

    override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
      val entries = messages.toSeq.collect { case m: SnapCommitMessage => m.entries }.flatten
      // an empty trigger commits no version: nothing to fence (replaying
      // an empty epoch is a no-op), and a ProcessingTime stream's idle
      // ticks must not balloon the version history
      if (entries.nonEmpty) table.commitFilesEpoch(entries, mode, queryId, epochId)
      ()
    }

    override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
      messages.toSeq.collect { case m: SnapCommitMessage => m.entries }.flatten
        .foreach(e => java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(e.path)))
      ()
    }
  }

  // ------------------------------------------ ROW-LEVEL OPERATIONS (COW)

  /**
   * SQL `UPDATE` / `MERGE INTO` / arbitrary `DELETE` via group-based
   * COPY-ON-WRITE at PARTITION granularity (Iceberg's COW): Spark rewrites
   * the statement into "scan the affected groups, apply the changes,
   * REPLACE those groups". The operation's scan is the ordinary pruned
   * [[SnapScan]] — compile-time predicates prune manifests and files, and
   * Spark's runtime group filtering (riding the scan's
   * SupportsRuntimeFiltering) narrows it to the partitions actually
   * holding matches, so an `UPDATE … WHERE part = 3 AND id = 7` rewrites
   * one partition of a 100 TB table, not the table. The write commits a
   * replacement of EXACTLY the partitions the scan planned (captured
   * post-runtime-filtering via the build hook — Spark builds the
   * group-filter subquery's scan from the ORIGINAL table, so the hook
   * only ever sees the main rewrite scan): a partition whose rows were
   * all deleted produces no files and still leaves the snapshot, and a
   * MERGE insert into a brand-new partition pages in alongside.
   */
  private final class SnapRowLevelOperation(
      cmd: org.apache.spark.sql.connector.write.RowLevelOperation.Command,
      schema: StructType, props: java.util.Map[String, String])
      extends org.apache.spark.sql.connector.write.RowLevelOperation {

    /** The rewrite's MAIN scan — its post-runtime-filter planned
      * partitions are the replaced-group set. */
    @volatile private var configured: SnapScan = null

    override def command(): org.apache.spark.sql.connector.write.RowLevelOperation.Command = cmd
    override def description(): String = s"graft-snapshot COW $cmd"

    /** Requiring `_file` engages Spark's metadata-projection write task
      * (DataAndMetadataWritingSparkTask), which projects every rewrite row
      * back to the TABLE schema before it reaches the writer — without a
      * required metadata attribute the group-based plan hands the writer
      * raw rows still carrying the internal `__row_operation` column. */
    override def requiredMetadataAttributes()
        : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
      Array(Expressions.column("_file"))

    override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
      new SnapScanBuilder(schema, props, s => configured = s, rewriteScan = true)

    override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = new WriteBuilder {
      override def build(): Write = new Write with RequiresDistributionAndOrdering {
        override def description(): String = s"graft-snapshot COW $cmd write"
        override def requiredDistribution(): Distribution =
          Distributions.clustered(Array(Expressions.column("part")))
        override def requiredOrdering(): Array[SortOrder] = Array.empty
        override def toBatch: BatchWrite =
          new SnapReplaceGroupsWrite(info.schema(), props, () => configured)
      }
    }
  }

  /**
   * DELTA-based row-level operation (Spark's `SupportsDelta` — Iceberg's
   * merge-on-read write mode): instead of replacing whole groups, the
   * statement's output is a stream of per-row operations. Row identity is
   * `(morKey, part)`; updates arrive as delete + reinsert
   * (`representUpdateAsDeleteAndInsert`), so the writers only ever append
   * NEW ROWS (data files) and RETIRED KEYS (equality-delete files) — one
   * commit, both stamped with the same sequence, exactly the
   * [[SnapshotTable.upsertMor]] shape. A MERGE that touches 10 keys of a
   * 100 TB table writes kilobytes. The scan is the ordinary pruned read
   * scan: with no group replacement there is nothing a condition pushdown
   * could under-read (the COW group-expansion hazard does not exist
   * here).
   */
  private final class SnapDeltaOperation(
      cmd: org.apache.spark.sql.connector.write.RowLevelOperation.Command,
      schema: StructType, props: java.util.Map[String, String], key: String)
      extends org.apache.spark.sql.connector.write.SupportsDelta {

    override def command(): org.apache.spark.sql.connector.write.RowLevelOperation.Command = cmd
    override def description(): String = s"graft-snapshot MOR delta $cmd"
    override def rowId(): Array[org.apache.spark.sql.connector.expressions.NamedReference] =
      Array(Expressions.column(key), Expressions.column("part"))
    override def representUpdateAsDeleteAndInsert(): Boolean = true
    override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
      // row-id attributes must be non-nullable: `part` already is by the
      // write contract, and a MOR table's key column is too (a null key
      // has no equality-delete identity — the writer enforces it)
      new SnapScanBuilder(StructType(schema.fields.map(f =>
        if (f.name == key || f.name == "part") f.copy(nullable = false) else f)), props)
    override def newWriteBuilder(info: LogicalWriteInfo)
        : org.apache.spark.sql.connector.write.DeltaWriteBuilder =
      new org.apache.spark.sql.connector.write.DeltaWriteBuilder {
        override def build(): org.apache.spark.sql.connector.write.DeltaWrite =
          new SnapDeltaWrite(info.schema(), props, key)
      }
  }

  private final class SnapDeltaWrite(schema: StructType,
      props: java.util.Map[String, String], key: String)
      extends org.apache.spark.sql.connector.write.DeltaWrite {
    override def description(): String = "graft-snapshot MOR delta write"
    override def toBatch: org.apache.spark.sql.connector.write.DeltaBatchWrite =
      new SnapDeltaBatchWrite(schema, props, key)
  }

  private final class SnapDeltaBatchWrite(schema: StructType,
      props: java.util.Map[String, String], key: String)
      extends org.apache.spark.sql.connector.write.DeltaBatchWrite {

    private val table = tableFor(props)
    table.morKey.foreach(k => require(k == key,
      s"table's MOR key is '$k'; delta writes must keep keying on it"))
    private val basedOn = table.currentVersion
    private val dir = table.provisionAttemptDir()

    override def createBatchWriterFactory(info: PhysicalWriteInfo)
        : org.apache.spark.sql.connector.write.DeltaWriterFactory = {
      val session = SparkSession.active
      val delSchema = StructType(Seq(
        StructField(key, LongType, nullable = false),
        StructField("part", LongType, nullable = false)))
      val delConf = writerConf(session, StructType(delSchema.fields.map(f =>
        if (f.name == "part") f.copy(name = "_part") else f)))
      // a pure DELETE's delta plan carries NO data columns (empty row
      // schema) — the insert side is never exercised, so wire it to the
      // delete writer's shape as an inert placeholder
      if (schema.fieldNames.contains("part")) {
        val (partIdx, statsIdx, targetBytes, conf) = writerSetup(schema, table, props)
        SnapDeltaWriterFactory(dir, partIdx, statsIdx, targetBytes, conf, delConf)
      } else
        SnapDeltaWriterFactory(dir, 1, -1, SnapshotSource.DEFAULT_TARGET_FILE_BYTES,
          delConf, delConf)
    }

    override def commit(messages: Array[WriterCommitMessage]): Unit = {
      val entries = messages.toSeq.collect { case m: SnapCommitMessage => m.entries }.flatten
      if (entries.nonEmpty) {
        table.ensureMorKey(key)
        table.commitFiles(entries, SnapshotTable.WriteAppend, basedOn)
      }
      ()
    }

    override def abort(messages: Array[WriterCommitMessage]): Unit = {
      messages.toSeq.collect { case m: SnapCommitMessage => m.entries }.flatten
        .foreach(e => java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(e.path)))
      ()
    }
  }

  private final case class SnapDeltaWriterFactory(dir: String, partIdx: Int,
      statsIdx: Int, targetBytes: Long,
      dataConf: org.apache.spark.SerializableWritable[org.apache.hadoop.conf.Configuration],
      delConf: org.apache.spark.SerializableWritable[org.apache.hadoop.conf.Configuration])
      extends org.apache.spark.sql.connector.write.DeltaWriterFactory {
    override def createWriter(partitionId: Int, taskId: Long)
        : org.apache.spark.sql.connector.write.DeltaWriter[InternalRow] =
      new SnapDeltaWriter(dir, partIdx, statsIdx, targetBytes,
        new org.apache.hadoop.conf.Configuration(dataConf.value),
        new org.apache.hadoop.conf.Configuration(delConf.value), partitionId, taskId)
  }

  /** Two writer families share one attempt dir: full rows (data files)
    * and `(key, part)` rows (equality-delete files, marked kind=x in the
    * commit message). Updates arrive pre-split as delete + reinsert. */
  private final class SnapDeltaWriter(dir: String, partIdx: Int, statsIdx: Int,
      targetBytes: Long, dataConf: org.apache.hadoop.conf.Configuration,
      delConf: org.apache.hadoop.conf.Configuration, partitionId: Int, taskId: Long)
      extends org.apache.spark.sql.connector.write.DeltaWriter[InternalRow] {

    private val dataW = new SnapDataWriter(dir, partIdx, statsIdx, targetBytes,
      dataConf, partitionId, taskId)
    // delete rows are (key, part): part sits at index 1, no stats column
    private val delW = new SnapDataWriter(dir, 1, -1, targetBytes,
      delConf, partitionId, taskId)

    override def insert(row: InternalRow): Unit = dataW.write(row)
    override def delete(meta: InternalRow, id: InternalRow): Unit = {
      // id = rowId projection (key, part), declared in SnapDeltaOperation
      require(!id.isNullAt(0),
        "MOR row identity: the key column must be non-null to delete by equality")
      delW.write(new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](id.getLong(0), id.getLong(1))))
    }
    override def update(meta: InternalRow, id: InternalRow, row: InternalRow): Unit = {
      delete(meta, id); insert(row)
    }

    override def commit(): WriterCommitMessage = {
      val data = dataW.commit().asInstanceOf[SnapCommitMessage].entries
      val dels = delW.commit().asInstanceOf[SnapCommitMessage].entries
        .map(_.copy(kind = "x"))
      SnapCommitMessage(data ++ dels)
    }
    override def abort(): Unit = { dataW.abort(); delW.abort() }
    override def close(): Unit = { dataW.close(); delW.close() }
  }

  private final class SnapReplaceGroupsWrite(schema: StructType,
      props: java.util.Map[String, String], scan: () => SnapScan)
      extends BatchWrite {

    private val table = tableFor(props)
    // snapshot isolation like every external commit: plan-time base, CAS
    // on basedOn+1, CREATE_NEW decides a race and the loser re-runs
    private val basedOn = table.currentVersion
    private val dir = table.provisionAttemptDir()

    override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
      val (partIdx, statsIdx, targetBytes, conf) = writerSetup(schema, table, props)
      SnapWriterFactory(dir, partIdx, statsIdx, targetBytes, conf)
    }

    override def commit(messages: Array[WriterCommitMessage]): Unit = {
      val entries = messages.toSeq.collect { case m: SnapCommitMessage => m.entries }.flatten
      // replace EXACTLY the scanned groups — no more, no less. Entries in
      // partitions the scan never planned are MERGE inserts into existing
      // or new partitions that held no matches: their groups were not
      // re-emitted by the rewrite, so they must APPEND (pages alongside
      // the partition's surviving files), not replace — unioning
      // entries' parts into the replace set wiped such partitions (a
      // no-match MERGE replaced whole partitions with just its inserts;
      // caught by the model-check spec).
      val scanned = Option(scan()).fold(Set.empty[Long])(_.plannedParts)
      table.commitReplacingParts(entries, scanned, basedOn)
      ()
    }

    override def abort(messages: Array[WriterCommitMessage]): Unit = {
      messages.toSeq.collect { case m: SnapCommitMessage => m.entries }.flatten
        .foreach(e => java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(e.path)))
      ()
    }
  }

  private final case class SnapStreamWriterFactory(scratch: String, partIdx: Int,
      statsIdx: Int, targetBytes: Long,
      conf: org.apache.spark.SerializableWritable[org.apache.hadoop.conf.Configuration])
      extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
    override def createWriter(partitionId: Int, taskId: Long,
        epochId: Long): DataWriter[InternalRow] =
      new SnapDataWriter(s"$scratch/e$epochId", partIdx, statsIdx, targetBytes,
        new org.apache.hadoop.conf.Configuration(conf.value), partitionId, taskId)
  }

  private final class SnapBatchWrite(schema: StructType,
      props: java.util.Map[String, String], mode: SnapshotTable.WriteMode)
      extends BatchWrite {

    private val table = tableFor(props)
    // snapshot the write's base version NOW (plan time): the commit is a
    // CAS on basedOn+1 — a rival landing mid-write loses cleanly via
    // CREATE_NEW instead of silently interleaving (upsert's contract)
    private val basedOn = table.currentVersion
    private val dir = table.provisionAttemptDir()

    override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
      val (partIdx, statsIdx, targetBytes, conf) = writerSetup(schema, table, props)
      SnapWriterFactory(dir, partIdx, statsIdx, targetBytes, conf)
    }

    override def commit(messages: Array[WriterCommitMessage]): Unit = {
      val entries = messages.toSeq.collect { case m: SnapCommitMessage => m.entries }.flatten
      table.commitFiles(entries, mode, basedOn)
      ()
    }

    override def abort(messages: Array[WriterCommitMessage]): Unit = {
      messages.toSeq.collect { case m: SnapCommitMessage => m.entries }.flatten
        .foreach(e => java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(e.path)))
      ()
    }
  }

  /** Per-task hadoop conf for the parquet writers: the session conf plus
    * the physical row schema and the SQLConf entries
    * `ParquetWriteSupport.init` asserts on. */
  private def writerConf(session: SparkSession, physical: StructType)
      : org.apache.spark.SerializableWritable[org.apache.hadoop.conf.Configuration] = {
    import org.apache.spark.sql.internal.SQLConf
    val conf = session.sessionState.newHadoopConf()
    org.apache.spark.sql.execution.datasources.parquet
      .ParquetWriteSupport.setSchema(physical, conf)
    val sql = session.sessionState.conf
    conf.set(SQLConf.PARQUET_WRITE_LEGACY_FORMAT.key,
      sql.getConf(SQLConf.PARQUET_WRITE_LEGACY_FORMAT).toString)
    conf.set(SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE.key,
      sql.getConf(SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE).toString)
    conf.set(SQLConf.PARQUET_REBASE_MODE_IN_WRITE.key,
      sql.getConf(SQLConf.PARQUET_REBASE_MODE_IN_WRITE).toString)
    conf.set(SQLConf.PARQUET_INT96_REBASE_MODE_IN_WRITE.key,
      sql.getConf(SQLConf.PARQUET_INT96_REBASE_MODE_IN_WRITE).toString)
    conf.set(SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED.key,
      sql.getConf(SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED).toString)
    conf.set(SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE.key,
      sql.getConf(SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE).toString)
    new org.apache.spark.SerializableWritable(conf)
  }

  /** Target size at which a writer ROLLS to a new file within a partition
    * (Iceberg's write.target-file-size-bytes spirit, 512 MB): a hot
    * partition's SQL ingest lands as several target-sized files instead of
    * one giant one — bounded memory per reader task later, no compaction
    * needed just to fix ingest layout. Override per write with the
    * `targetfilebytes` option. */
  final val DEFAULT_TARGET_FILE_BYTES: Long = 512L * 1024 * 1024

  /** True iff any covering delete file can still retire a row of some
    * covering data file ([[SnapshotTable.deleteApplies]]' part + sequence
    * rule). The read-side gates (metadata aggregates, limit/TopN file
    * pruning, columnar reads) key off THIS, not off delete-file presence:
    * once compaction folds a delete (every surviving data file's seq >= the
    * delete's), the delete is inert and must stop disabling those paths
    * (round-7 ADVICE). */
  private[sources] def anyDeleteApplies(
      pruned: (Seq[SnapshotTable.FileEntry], Seq[SnapshotTable.FileEntry])): Boolean = {
    val (files, dels) = pruned
    dels.exists(d => files.exists(f => SnapshotTable.deleteApplies(d, f)))
  }

  private final case class SnapWriterFactory(dir: String, partIdx: Int, statsIdx: Int,
      targetBytes: Long,
      conf: org.apache.spark.SerializableWritable[org.apache.hadoop.conf.Configuration])
      extends DataWriterFactory {
    override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
      new SnapDataWriter(dir, partIdx, statsIdx, targetBytes,
        new org.apache.hadoop.conf.Configuration(conf.value), partitionId, taskId)
  }

  private final case class SnapCommitMessage(entries: Seq[SnapshotTable.FileEntry])
      extends WriterCommitMessage

  /** One parquet file per `part` value this task sees (the required
    * clustering makes that one part per task in practice), ROLLED at
    * [[DEFAULT_TARGET_FILE_BYTES]] so a hot partition never produces one
    * giant file; rows stream through Spark's ParquetWriteSupport, stats
    * accumulate inline per file. */
  private final class SnapDataWriter(dir: String, partIdx: Int, statsIdx: Int,
      targetBytes: Long, conf: org.apache.hadoop.conf.Configuration,
      partitionId: Int, taskId: Long)
      extends DataWriter[InternalRow] {

    private final class PartFile(val part: Long) {
      val path = s"$dir/part=$part/part-$partitionId-$taskId-" +
        s"${java.util.UUID.randomUUID().toString.take(8)}.parquet"
      val writer = new RowWriterBuilder(new org.apache.hadoop.fs.Path(path))
        .withConf(conf)
        .withCompressionCodec(org.apache.parquet.hadoop.metadata.CompressionCodecName.SNAPPY)
        .build()
      var rows = 0L
      var lo = Long.MaxValue
      var hi = Long.MinValue
      var bounded = false
      var nulls = 0L
    }
    private val open = scala.collection.mutable.Map.empty[Long, PartFile]
    private val done = scala.collection.mutable.ListBuffer.empty[SnapshotTable.FileEntry]

    private def closeEntry(f: PartFile): SnapshotTable.FileEntry = {
      f.writer.close()
      val hp = new org.apache.hadoop.fs.Path(f.path)
      val bytes = hp.getFileSystem(conf).getFileStatus(hp).getLen
      SnapshotTable.FileEntry(f.path, f.part, f.rows, bytes,
        if (f.bounded) Some(f.lo) else None, if (f.bounded) Some(f.hi) else None,
        if (statsIdx >= 0) Some(f.nulls) else None)
    }

    override def write(row: InternalRow): Unit = {
      require(!row.isNullAt(partIdx), "snapshot write: `part` must not be null")
      val p = row.getLong(partIdx)
      val f = open.getOrElseUpdate(p, new PartFile(p))
      f.writer.write(row)
      f.rows += 1
      if (statsIdx >= 0) {
        if (row.isNullAt(statsIdx)) f.nulls += 1
        else {
          val v = row.getLong(statsIdx)
          f.lo = math.min(f.lo, v); f.hi = math.max(f.hi, v); f.bounded = true
        }
      }
      // roll at the byte target; getDataSize (written + buffered) is
      // checked every 1024 rows — it walks the column writers, so a
      // per-row check would tax the hot loop
      if (f.rows % 1024 == 0 && f.writer.getDataSize >= targetBytes) {
        done += closeEntry(f)
        open.remove(p)
        ()
      }
    }

    override def commit(): WriterCommitMessage = {
      done ++= open.values.toSeq.sortBy(_.path).map(closeEntry)
      open.clear()
      SnapCommitMessage(done.toList)
    }

    override def abort(): Unit = {
      (open.values.map(f => { scala.util.Try(f.writer.close()); f.path }) ++ done.map(_.path))
        .foreach { p =>
          java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(p))
          ()
        }
    }

    override def close(): Unit = ()
  }

  /** Public ParquetWriter builder over Spark's InternalRow write support
    * (schema + codec settings ride the conf, set by [[writerConf]]). */
  private final class RowWriterBuilder(path: org.apache.hadoop.fs.Path)
      extends org.apache.parquet.hadoop.ParquetWriter.Builder[InternalRow, RowWriterBuilder](path) {
    override def getWriteSupport(conf: org.apache.hadoop.conf.Configuration)
        : org.apache.parquet.hadoop.api.WriteSupport[InternalRow] =
      new org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport()
    override def self(): RowWriterBuilder = this
  }

  // ------------------------------------------------------- DSv2 READ path

  /** One byte slice of one data file: `[start, start + length)` selects
    * the row groups whose midpoint the slice covers. `deletes` carries the
    * applicable equality-delete files (merge-on-read) and `morKeyIdx` the
    * key's index in the scan output; empty/-1 = plain columnar read. */
  final case class SnapInputPartition(path: String, part: Long,
      start: Long, length: Long, deletes: Seq[String] = Nil,
      morKeyIdx: Int = -1) extends InputPartition with HasPartitionKey {
    /** The slice's `part` value, exposed so Spark can KEY-GROUP slices
      * (storage-partitioned joins — see [[SnapScan.outputPartitioning]]). */
    override def partitionKey(): InternalRow = InternalRow(part)
  }

  /** Planned-slice observability for the DPP spec (tests run serially). */
  private[graft] object ScanProbe {
    @volatile var lastPlannedSlices: Int = -1
    /** Rows the vectorized readers actually DELIVERED (post row-group
      * filtering) — meaningful in local mode where executors share the
      * JVM; the row-group-skip spec resets and reads it around one query. */
    val rowsDelivered = new java.util.concurrent.atomic.LongAdder()
  }

  private final class SnapScan(out: StructType, table: SnapshotTable,
      parts0: Option[Set[Long]], range: Option[(Long, Long)], version: Int,
      target: Long,
      filePrune: Seq[SnapshotTable.FileEntry] => Seq[SnapshotTable.FileEntry],
      runtimeStatsCol: Option[String],
      morKeyIdx: Int,
      stats: (Long, Long), nParts: Int,
      conf: org.apache.spark.SerializableWritable[org.apache.hadoop.conf.Configuration],
      startVersion: Int = 0, maxVersions: Option[Int] = None)
      extends Scan with Batch with SupportsReportStatistics with SupportsRuntimeFiltering
      with SupportsReportPartitioning {

    /** Partition set, possibly NARROWED at runtime by [[filter]]. */
    @volatile private var parts: Option[Set[Long]] = parts0
    /** Stats range, possibly NARROWED at runtime by [[filter]] to the
      * envelope of a join's key values. */
    @volatile private var rangeNow: Option[(Long, Long)] = range

    override def readSchema(): StructType = out
    override def toBatch: Batch = this
    override def description(): String =
      s"graft-snapshot scan: parts=${parts0.fold("all")(_.size.toString)} " +
        s"range=${range.isDefined} v=$version"

    /**
     * DYNAMIC PARTITION PRUNING (DSv2 runtime filtering): a join whose
     * other side filters `part` (e.g. a region dim joined on the routing
     * cell) pushes the matching part VALUES into this scan at execution
     * time — [[planInputPartitions]] then re-prunes manifests and files to
     * the intersection, so the join reads only the dim-selected region of
     * a 100 TB table even when the predicate wasn't known at plan time.
     */
    override def filterAttributes(): Array[org.apache.spark.sql.connector.expressions.NamedReference] = {
      // only offer columns the scan OUTPUTS — PartitionPruning resolves
      // the refs against the scan's output and throws otherwise (a
      // column-pruned scan that drops part can't be runtime-filtered).
      // The STATS column is offered too (read scans only): a join on it
      // delivers its key values at execution and [[filter]] narrows the
      // file set to the values' [min, max] envelope — time-correlated
      // joins ("events of these sessions") then read only the matching
      // bands of an event-ordered table. NEVER offered for a COW rewrite
      // scan: the runtime group filter there carries the MATCHED rows'
      // values, and pruning survivor files inside a matched partition
      // would make the partition-replacing write drop their rows.
      val cols = Seq("part").filter(out.fieldNames.contains) ++
        runtimeStatsCol.filter(out.fieldNames.contains)
      cols.map(Expressions.column).toArray
    }

    override def filter(filters: Array[Filter]): Unit = filters.foreach {
      case In("part", vs) =>
        val ps = vs.collect { case l: Long => l; case i: Int => i.toLong }.toSet
        parts = Some(parts.fold(ps)(_.intersect(ps)))
      case EqualTo("part", v: Long) =>
        parts = Some(parts.fold(Set(v))(_.intersect(Set(v))))
      case In(c, vs) if runtimeStatsCol.contains(c) =>
        val longs = vs.collect { case l: Long => l; case i: Int => i.toLong }
        // a non-long or empty value set narrows nothing (conservative)
        if (longs.nonEmpty && longs.length == vs.length) {
          val (lo, hi) = (longs.min, longs.max)
          rangeNow = Some(rangeNow.fold((lo, hi)) { case (l0, h0) =>
            (math.max(l0, lo), math.min(h0, hi)) })
        }
      case EqualTo(c, v: Long) if runtimeStatsCol.contains(c) =>
        rangeNow = Some(rangeNow.fold((v, v)) { case (l0, h0) =>
          (math.max(l0, v), math.min(h0, v)) })
      case _ => ()
    }

    /** The `part` values of the files the LAST [[planInputPartitions]]
      * covered — AFTER runtime narrowing. This is the replaced-group set
      * for row-level COW rewrites: the write must replace exactly the
      * partitions whose rows the scan fed into the rewrite, no more (a
      * partition dropped without its rows rewritten is data loss), no
      * less (a matched partition kept would duplicate). */
    @volatile private[sources] var plannedParts: Set[Long] = Set.empty

    override def planInputPartitions(): Array[InputPartition] = {
      // limit/top-N file pruning composes AFTER runtime narrowing: both
      // rules only shrink the file set, in either order soundly
      val (entries0, dels) = table.pruneFilesSplit(parts, rangeNow, version)
      val entries = filePrune(entries0)
      plannedParts = entries.map(_.part).toSet
      val slices = sliceEntries(entries, target, dels, morKeyIdx)
      ScanProbe.lastPlannedSlices = slices.size
      slices.toArray
    }

    override def createReaderFactory(): PartitionReaderFactory =
      // row-based whenever any covering delete APPLIES to a covering file
      // (runtime narrowing only SHRINKS the file set, so applicable deletes
      // never appear after this; inert post-compaction deletes keep the
      // columnar path — round-7 ADVICE)
      new SnapReaderFactory(out, conf,
        rowBasedOnly = SnapshotSource.anyDeleteApplies(
          table.pruneFilesSplit(parts, rangeNow, version)))

    /**
     * CHANGE FEED (incremental partition refresh — Iceberg's incremental
     * scan, closed over COW rewrites): `spark.readStream` on the table
     * emits, per micro-batch, the CURRENT rows of every partition whose
     * file set changed in the offset window. Offsets are snapshot VERSIONS
     * (checkpoint-resumable integers); planning diffs only the manifest
     * pages the window's commits touched ([[SnapshotTable.changedParts]]),
     * so a 100 TB table's downstream consumers process new commits without
     * ever rescanning — O(delta pages) planning, delta-partition reads.
     * Re-emitting the whole current state of a changed partition (rather
     * than row diffs) makes every batch idempotently MERGE-able by key —
     * exactly-once table state downstream with at-least-once feeds, the
     * same convergence rule as [[graft.index.StreamIngest]]. A maintenance
     * rewrite (compaction) changes file sets without changing rows, so it
     * re-feeds the rewritten partitions — harmless under that contract.
     * `startingversion` (default 0 = from the beginning, whole snapshot as
     * the first batch) positions the initial offset, mirroring Kafka's
     * startingOffsets; `maxversionspertrigger` bounds a batch's commit
     * window (admission control — see the notes in the stream class).
     */
    override def toMicroBatchStream(checkpointLocation: String)
        : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
      new SnapMicroBatchStream(out, table, parts0, range, target, conf, startVersion,
        maxVersions)

    /**
     * STORAGE-PARTITIONED JOINS (Iceberg's SPJ): the table IS key-grouped
     * storage — every file holds exactly one `part` value — so the scan
     * can report `KeyGroupedPartitioning(identity(part))`, with each byte
     * slice carrying its key ([[SnapInputPartition.partitionKey]]). Spark
     * (`spark.sql.sources.v2.bucketing.enabled`, default ON in 4.x) then
     * groups slices by part and plans joins on `part` between two snapshot
     * tables (and aggregations whose grouping contains `part`) WITHOUT ANY
     * EXCHANGE — at 100 TB the fact↔fact cell-aligned join (points ⋈
     * per-cell stats, both routed by the same cell scheme) moves ZERO rows
     * over the network where a hash join would shuffle both full tables.
     *
     * Reporting is OPT-IN per read/table (`spj=true` option or table
     * property — Iceberg gates identically via `preserve-data-grouping`)
     * because grouping is unconditional once reported: a measured probe
     * showed a PLAIN scan of 256 slices across 8 partitions collapsing to
     * 8 tasks — correct, but 1/32 the parallelism on queries that never
     * join. With `spj` unset the scan reports unknown and per-slice
     * parallelism is untouched; a column-pruned scan that drops `part`
     * also reports unknown (Catalyst could not resolve the key against
     * the scan output anyway).
     */
    override def outputPartitioning(): Partitioning =
      if (nParts >= 0 && out.fieldNames.contains("part"))
        new KeyGroupedPartitioning(Array(Expressions.identity("part")), nParts)
      else new UnknownPartitioning(0)

    /** POST-PRUNING size/row statistics straight from the manifest entries
      * (already in hand — no extra I/O): Catalyst's join planning sees the
      * PRUNED scan size, so a part/range-filtered slice of a huge table
      * (or a small dim table) auto-broadcasts in SQL joins exactly like a
      * file-source scan would. */
    override def estimateStatistics(): Statistics = new Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(stats._1)
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.of(stats._2)
    }
  }

  /** A change-feed offset: the snapshot VERSION the feed has consumed
    * through (serialized as its decimal string in the checkpoint). */
  private final case class SnapVersionOffset(v: Int)
      extends org.apache.spark.sql.connector.read.streaming.Offset {
    override def json(): String = v.toString
  }

  /** The change-feed stream (see [[SnapScan.toMicroBatchStream]]): batch
    * (start, end] = current rows at `end` of the partitions changed in the
    * window, intersected with any pushed partition filter; file slicing
    * and the columnar reader are the batch path's, unchanged. */
  private final class SnapMicroBatchStream(out: StructType, table: SnapshotTable,
      parts0: Option[Set[Long]], range: Option[(Long, Long)], target: Long,
      conf: org.apache.spark.SerializableWritable[org.apache.hadoop.conf.Configuration],
      startVersion: Int, maxVersions: Option[Int])
      extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
      with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl {
    import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit, ReadMaxFiles}

    override def initialOffset(): Offset = SnapVersionOffset(startVersion)
    override def deserializeOffset(json: String): Offset = SnapVersionOffset(json.toInt)

    // ---- admission control: `maxversionspertrigger` bounds how many
    // COMMITS one micro-batch may span. A consumer resuming after a long
    // outage on a hot 100 TB table would otherwise plan ONE batch over
    // hundreds of versions — whose union of touched partitions approaches
    // the whole table; capping the window keeps each catch-up batch's read
    // set (and its executors' working set) commit-sized. The version cap
    // rides ReadLimit.maxFiles (a version = one commit's file group);
    // ReadAllAvailable (Trigger.Once semantics) is honoured uncapped.
    private def trueLatest: Int = math.max(startVersion, table.currentVersion)

    override def getDefaultReadLimit: ReadLimit =
      maxVersions.map(v => ReadLimit.maxFiles(v)).getOrElse(ReadLimit.allAvailable())

    override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
      val s = start.asInstanceOf[SnapVersionOffset].v
      val capped = limit match {
        case f: ReadMaxFiles => math.min(trueLatest, s + f.maxFiles())
        case _ => trueLatest
      }
      SnapVersionOffset(capped)
    }

    override def reportLatestOffset(): Offset = SnapVersionOffset(trueLatest)

    override def latestOffset(): Offset = throw new UnsupportedOperationException(
      "latestOffset(start, limit) drives this stream (SupportsAdmissionControl)")

    override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
      val s = start.asInstanceOf[SnapVersionOffset].v
      val e = end.asInstanceOf[SnapVersionOffset].v
      if (e <= s) return Array.empty
      val effective = (table.changedParts(s, e), parts0) match {
        case (None, p) => p
        case (Some(c), None) => Some(c)
        case (Some(c), Some(p)) => Some(c.intersect(p))
      }
      if (effective.exists(_.isEmpty)) return Array.empty
      // CURRENT rows of the changed partitions: equality deletes committed
      // up to the window's end apply in the batch (same delete-aware read
      // as the batch scan)
      val (data, dels) = table.pruneFilesSplit(effective, range, e)
      val keyIdx = table.morKey.filter(out.fieldNames.contains)
        .map(out.fieldIndex).getOrElse(-1)
      sliceEntries(data, target, dels, keyIdx).toArray
    }

    override def createReaderFactory(): PartitionReaderFactory =
      // a MOR table's stream stays row-based outright: later batches may
      // acquire deletes after the factory is built
      new SnapReaderFactory(out, conf, rowBasedOnly = table.morKey.isDefined)
    override def commit(end: Offset): Unit = ()
    override def stop(): Unit = ()
  }

  private final class SnapReaderFactory(out: StructType,
      conf: org.apache.spark.SerializableWritable[org.apache.hadoop.conf.Configuration],
      rowBasedOnly: Boolean = false)
      extends PartitionReaderFactory {

    // merge-on-read scans take the ROW path: the batches need per-row
    // surgery anyway, the key-set filter composes naturally with the row
    // iterator, and Spark requires ALL of a scan's partitions to agree on
    // columnar support ("Cannot mix row-based and columnar") — so the
    // SCAN decides, not the slice (compaction restores columnar reads)
    override def supportColumnarReads(partition: InputPartition): Boolean = !rowBasedOnly

    /** The union of the delete files' keys, loaded executor-side with the
      * same vectorized reader (requested schema = the key column alone).
      * Delete files are small — the set is bounded by the partition's
      * pending delete keys, reclaimed when compaction folds them. */
    private def deleteKeySet(paths: Seq[String], keyName: String)
        : java.util.HashSet[java.lang.Long] = {
      val set = new java.util.HashSet[java.lang.Long]()
      val keySchema = StructType(Seq(StructField(keyName, LongType)))
      paths.foreach { p =>
        val c = new org.apache.hadoop.conf.Configuration(conf.value)
        c.set(org.apache.spark.sql.execution.datasources.parquet
          .ParquetReadSupport.SPARK_ROW_REQUESTED_SCHEMA, keySchema.json)
        val hp = new org.apache.hadoop.fs.Path(p)
        val len = hp.getFileSystem(c).getFileStatus(hp).getLen
        val r = new org.apache.spark.sql.execution.datasources.parquet
          .VectorizedParquetRecordReader(false, 4096)
        try {
          r.initialize(new org.apache.hadoop.mapred.FileSplit(hp, 0, len,
            null: Array[String]),
            new org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl(
              c, new org.apache.hadoop.mapreduce.TaskAttemptID()))
          r.initBatch(new StructType(), InternalRow.empty)
          r.enableReturningBatches()
          while (r.nextBatch()) {
            val it = r.resultBatch().rowIterator()
            while (it.hasNext) {
              val row = it.next()
              if (!row.isNullAt(0)) { set.add(row.getLong(0)); () }
            }
          }
        } finally r.close()
      }
      set
    }

    override def createColumnarReader(p: InputPartition): PartitionReader[ColumnarBatch] = {
      val sp = p.asInstanceOf[SnapInputPartition]
      // `part` and metadata `_file` are VIRTUAL: their values come from
      // the manifest entry and are attached as partition columns — the
      // physical `_part` is not read, the path costs nothing. They trail
      // the data columns in `out` (scan build order), matching where the
      // vectorized reader appends partition values.
      val virtualFields = out.fields.filter(f => f.name == "part" || f.name == "_file")
      val reader = new org.apache.spark.sql.execution.datasources.parquet
        .VectorizedParquetRecordReader(false, 4096)
      var closed = false
      try {
        // split-based initialize: the reader opens the footer EXECUTOR-side
        // and keeps only this slice's row groups; column pruning rides the
        // requested-schema conf key
        val split = new org.apache.hadoop.mapred.FileSplit(
          new org.apache.hadoop.fs.Path(sp.path), sp.start, sp.length, null: Array[String])
        val ctx = new org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl(
          conf.value, new org.apache.hadoop.mapreduce.TaskAttemptID())
        reader.initialize(split, ctx)
        val (pSchema, pRow) =
          if (virtualFields.isEmpty) (new StructType(), InternalRow.empty)
          else (StructType(virtualFields.toSeq.map(f => StructField(f.name, f.dataType))),
            InternalRow.fromSeq(virtualFields.toSeq.map {
              case f if f.name == "part" => sp.part
              case _ => org.apache.spark.unsafe.types.UTF8String.fromString(sp.path)
            }))
        reader.initBatch(pSchema, pRow)
        reader.enableReturningBatches()
      } catch { case e: Throwable => reader.close(); closed = true; throw e }
      new PartitionReader[ColumnarBatch] {
        override def next(): Boolean = {
          val has = reader.nextBatch()
          if (has) ScanProbe.rowsDelivered.add(reader.resultBatch().numRows().toLong)
          has
        }
        override def get(): ColumnarBatch = reader.resultBatch()
        override def close(): Unit = if (!closed) reader.close()
      }
    }

    override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
      val sp = p.asInstanceOf[SnapInputPartition]
      val cr = createColumnarReader(p)
      // merge-on-read: rows whose key is in the slice's delete set vanish
      val deleted =
        if (sp.deletes.isEmpty) null
        else deleteKeySet(sp.deletes, out.fields(sp.morKeyIdx).name)
      new PartitionReader[InternalRow] {
        private var it: java.util.Iterator[InternalRow] = java.util.Collections.emptyIterator()
        private var cur: InternalRow = _
        override def next(): Boolean = {
          while (true) {
            while (!it.hasNext) {
              if (!cr.next()) return false
              it = cr.get().rowIterator()
            }
            cur = it.next()
            if (deleted == null || cur.isNullAt(sp.morKeyIdx) ||
              !deleted.contains(cur.getLong(sp.morKeyIdx))) return true
          }
          false
        }
        override def get(): InternalRow = cur
        override def close(): Unit = cr.close()
      }
    }
  }
}
