package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.index.SnapshotTable

/** The SQL catalog surface over snapshot tables: DDL (CREATE/ALTER/DROP),
  * DML (INSERT/DELETE), time travel, and the snapshot machinery riding
  * underneath (versions, metadata-only evolution, manifest pruning). */
class GraftCatalogSpec extends SparkSpec {

  import spark.implicits._
  import org.apache.spark.sql.functions._

  private lazy val warehouse = {
    val dir = java.nio.file.Files.createTempDirectory("graftcat").toString
    spark.conf.set("spark.sql.catalog.cat", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.cat.warehouse", dir)
    dir
  }

  test("CREATE TABLE persists schema only; INSERT commits version 1; SELECT reads it") {
    warehouse
    spark.sql("CREATE NAMESPACE cat.geo")
    spark.sql("CREATE TABLE cat.geo.cells (id BIGINT, cell BIGINT, part BIGINT) " +
      "PARTITIONED BY (part) TBLPROPERTIES ('statscol'='cell')")
    val t = new SnapshotTable(spark, s"$warehouse/geo/cells")
    assert(t.currentVersion === 0, "CREATE TABLE writes no snapshot")
    assert(t.statsColumn === Some("cell"), "statscol property persisted")
    assert(spark.sql("SELECT * FROM cat.geo.cells").count() === 0, "empty table readable")
    spark.sql("INSERT INTO cat.geo.cells SELECT id, id * 10 AS cell, id % 4 AS part " +
      "FROM range(100)")
    assert(t.currentVersion === 1)
    assert(spark.sql("SELECT count(*) AS n FROM cat.geo.cells").head().getLong(0) === 100)
    // pruning machinery live on catalog tables: part + stats range filters
    assert(spark.sql("SELECT count(*) AS n FROM cat.geo.cells " +
      "WHERE part = 3 AND cell BETWEEN 30 AND 330").head().getLong(0) === 8)
    assert(spark.sql("SHOW TABLES IN cat.geo").collect().map(_.getString(1)).toSet === Set("cells"))
  }

  test("ALTER TABLE ADD/DROP COLUMN is metadata-only; time travel reads old versions") {
    warehouse
    spark.sql("CREATE TABLE cat.geo.evo (id BIGINT, v BIGINT, part BIGINT) PARTITIONED BY (part)")
    spark.sql("INSERT INTO cat.geo.evo SELECT id, id AS v, id % 2 AS part FROM range(10)")
    val t = new SnapshotTable(spark, s"$warehouse/geo/evo")
    val filesV1 = t.snapshot(1).map(_.path).toSet
    spark.sql("ALTER TABLE cat.geo.evo ADD COLUMN score BIGINT")
    assert(t.snapshot(1).map(_.path).toSet === filesV1, "DDL touched no data file")
    assert(spark.sql("SELECT * FROM cat.geo.evo WHERE score IS NULL").count() === 10)
    spark.sql("INSERT INTO cat.geo.evo VALUES (100, 100, 7, 1)")
    assert(t.currentVersion === 2)
    assert(spark.sql("SELECT count(*) AS n FROM cat.geo.evo WHERE score = 7").head().getLong(0) === 1)
    // time travel: version 1 predates the insert (current schema, null col)
    val v1 = spark.sql("SELECT * FROM cat.geo.evo VERSION AS OF 1")
    assert(v1.count() === 10)
    assert(v1.schema.fieldNames.contains("score"))
    spark.sql("ALTER TABLE cat.geo.evo DROP COLUMN v")
    assert(spark.sql("SELECT * FROM cat.geo.evo").schema.fieldNames.toSeq ===
      Seq("id", "score", "part"))
    assert(spark.sql("SELECT count(*) AS n FROM cat.geo.evo").head().getLong(0) === 11)
  }

  test("DELETE FROM aligned on partitions is metadata-only; DROP TABLE removes the dir") {
    warehouse
    spark.sql("CREATE TABLE cat.geo.del (id BIGINT, part BIGINT) PARTITIONED BY (part)")
    spark.sql("INSERT INTO cat.geo.del SELECT id, id % 4 AS part FROM range(40)")
    val t = new SnapshotTable(spark, s"$warehouse/geo/del")
    val dataFiles = t.snapshot(1).map(_.path).toSet
    spark.sql("DELETE FROM cat.geo.del WHERE part = 2")
    assert(spark.sql("SELECT count(*) AS n FROM cat.geo.del").head().getLong(0) === 30)
    assert(t.snapshot(2).map(_.path).toSet.subsetOf(dataFiles),
      "partition delete rewrote no data file")
    spark.sql("DROP TABLE cat.geo.del")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$warehouse/geo/del")))
    assert(spark.sql("SHOW TABLES IN cat.geo").collect().map(_.getString(1)).toSet
      .intersect(Set("del")).isEmpty)
  }

  test("catalog guards: bad names, wrong partitioning, duplicate create") {
    warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS cat.guard")
    intercept[Exception](spark.sql(
      "CREATE TABLE cat.guard.bad (id BIGINT, part BIGINT) PARTITIONED BY (id)"))
    intercept[Exception](spark.sql(
      "CREATE TABLE cat.guard.nopart (id BIGINT, v BIGINT) PARTITIONED BY (v)"))
    spark.sql("CREATE TABLE cat.guard.ok (id BIGINT, part BIGINT) PARTITIONED BY (part)")
    intercept[Exception](spark.sql(
      "CREATE TABLE cat.guard.ok (id BIGINT, part BIGINT) PARTITIONED BY (part)"))
    // ALTER guards ride the table-level rules
    intercept[Exception](spark.sql("ALTER TABLE cat.guard.ok DROP COLUMN part"))
  }
}
