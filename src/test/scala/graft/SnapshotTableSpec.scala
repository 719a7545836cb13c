package graft

import org.apache.spark.sql.functions._
import graft.index.SnapshotTable

/** Iceberg-semantics pins for the snapshot table: COW partition scoping,
  * snapshot isolation / time travel, lineage, orphan expiry. */
class SnapshotTableSpec extends SparkSpec {

  import spark.implicits._

  private def freshTable() = {
    val root = java.nio.file.Files.createTempDirectory("snapspec").toString
    (root, new SnapshotTable(spark, root))
  }

  private def baseDf = (0L until 1000L).map(i => (i, i % 8, 1L))
    .toDF("id", "part", "ver").repartition(4)

  test("upsert rewrites ONLY touched partitions; others carry over by reference") {
    val (_, t) = freshTable()
    t.init(baseDf)
    val v1 = t.snapshot(1)
    // delta confined to partition 3: update ids 3, 11 and insert id 2003
    val delta = Seq((3L, 3L, 2L), (11L, 3L, 2L), (2003L, 3L, 2L)).toDF("id", "part", "ver")
    val v = t.upsert(delta, Seq("id"))
    assert(v === 2)
    val v2 = t.snapshot(2)
    val untouched1 = v1.filterNot(_.part == 3L).map(_.path).toSet
    val untouched2 = v2.filterNot(_.part == 3L).map(_.path).toSet
    assert(untouched1 === untouched2, "untouched partitions must keep the SAME files")
    assert(v2.filter(_.part == 3L).map(_.path).toSet
      .intersect(v1.filter(_.part == 3L).map(_.path).toSet).isEmpty,
      "touched partition files are fully rewritten")
  }

  test("merge result equals a from-scratch rebuild; time travel sees the old version") {
    val (_, t) = freshTable()
    t.init(baseDf)
    val delta = Seq((3L, 3L, 2L), (11L, 3L, 2L), (2003L, 3L, 2L)).toDF("id", "part", "ver")
    t.upsert(delta, Seq("id"))

    val got = t.read().select("id", "part", "ver").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val expect = (0L until 1000L).map(i =>
      (i, i % 8, if (i == 3L || i == 11L) 2L else 1L)).toSet + ((2003L, 3L, 2L))
    assert(got === expect)

    // snapshot isolation: version 1 is untouched by the upsert
    val old = t.read(1).select("id", "ver").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(old === (0L until 1000L).map((_, 1L)).toSet)
  }

  test("per-partition lineage sums to table rows at every version") {
    val (_, t) = freshTable()
    t.init(baseDf)
    t.upsert(Seq((1L, 1L, 2L)).toDF("id", "part", "ver"), Seq("id"))
    assert(t.partLineage(1).values.sum === 1000L)
    assert(t.partLineage(2).values.sum === 1000L)
    assert(t.partLineage(1).keySet === (0L until 8L).toSet)
    // partition 1 was rewritten with the same row count (1 update, 0 inserts)
    assert(t.partLineage(2)(1L) === t.partLineage(1)(1L))
  }

  test("expire drops old snapshots' orphan files but keeps everything current") {
    val (_, t) = freshTable()
    t.init(baseDf)
    t.upsert(Seq((1L, 1L, 2L)).toDF("id", "part", "ver"), Seq("id"))
    val v1Part1 = t.snapshot(1).filter(_.part == 1L).map(_.path)
    val deleted = t.expire(keepLast = 1)
    // exactly the replaced partition-1 files of v1 are orphans
    assert(deleted === v1Part1.size)
    v1Part1.foreach(p => assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(p))))
    // the current snapshot remains fully readable
    assert(t.read().count() === 1000L)
    assert(t.currentVersion === 2)
  }
}
