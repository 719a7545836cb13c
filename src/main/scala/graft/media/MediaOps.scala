package graft.media

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column plumbing: media spans as opaque `binary` payloads with
 * typed metadata, processed in batches via `mapPartitions` (the Scala
 * analog of a Pandas-UDF `mapInPandas` stage — same shape: per-partition
 * iterator of rows in, iterator of decoded rows out).
 *
 * The actual image/audio codecs are NOT in this container, so `decodeStub`
 * is a clearly-marked deterministic fake: it derives "decoded" metadata
 * (width/height/n_frames) arithmetically from the payload bytes. The
 * Spark-side plumbing — binary schema, partition-batch processing, output
 * schema — is real and oracle-checked (the fake is pure arithmetic over the
 * md5-derived payload, so DuckDB reproduces it from the hex digest).
 */
object MediaOps {

  /** Media table: one row per media span; payload = unhex(md5(media_ref))
    * (16 deterministic bytes standing in for real blob bytes). */
  def mediaTable(spark: SparkSession, sfDir: String): DataFrame = {
    val pts = graft.gen.GeoWorld.points(spark, sfDir)
    pts.filter(col("is_media"))
      .select(
        col("pid"),
        concat(lit("blob://p/"), (col("pid") % 1000).cast("string")).as("media_ref"),
        unhex(md5(concat(lit("blob://p/"), (col("pid") % 1000).cast("string")).cast("binary"))).as("payload"))
  }

  /**
   * STUB decode (deterministic fake — real codecs unavailable offline):
   *   width    = 64 + (payload[0] & 0x7f)
   *   height   = 64 + (payload[1] & 0x7f)
   *   n_frames = 1 + (payload[2] & 0x0f)
   * A real deployment swaps `decodeStub` for the codec call; the partition
   * batching, schema and downstream joins are unchanged.
   */
  def decodeStub(payload: Array[Byte]): (Int, Int, Int) =
    (64 + (payload(0) & 0x7f), 64 + (payload(1) & 0x7f), 1 + (payload(2) & 0x0f))

  private val decodedSchema = StructType(Seq(
    StructField("pid", LongType),
    StructField("media_ref", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType)))

  /** Batch "decode" over partitions (mapPartitions = the mapInPandas-shaped
    * stage; no per-row UDF dispatch, amortised per-batch setup). */
  def decodeMedia(spark: SparkSession, sfDir: String): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(decodedSchema)
    mediaTable(spark, sfDir).mapPartitions { rows =>
      // per-partition setup would open the codec once here
      rows.map { r =>
        val (w, h, f) = decodeStub(r.getAs[Array[Byte]]("payload"))
        Row(r.getAs[Long]("pid"), r.getAs[String]("media_ref"), w, h, f)
      }
    }(enc)
  }

  /** Oracle: recompute the fake decode from the md5 hex digest (payload
    * byte i = hex digits 2i..2i+1). */
  val decodeMediaSql: String =
    graft.query.GeoQueries.withWorld(
      """media AS (
        |  SELECT pid, 'blob://p/' || CAST(pid % 1000 AS VARCHAR) AS media_ref,
        |         md5('blob://p/' || CAST(pid % 1000 AS VARCHAR)) AS digest
        |  FROM pts WHERE is_media
        |)""".stripMargin) +
      """SELECT pid, media_ref,
        |       CAST(64 + (CAST('0x' || substr(digest, 1, 2) AS BIGINT) & 127) AS INTEGER) AS width,
        |       CAST(64 + (CAST('0x' || substr(digest, 3, 2) AS BIGINT) & 127) AS INTEGER) AS height,
        |       CAST(1 + (CAST('0x' || substr(digest, 5, 2) AS BIGINT) & 15) AS INTEGER) AS n_frames
        |FROM media""".stripMargin

  /**
   * Frame sampling + resize plan (the video half of the multimodal
   * pipeline): up to `maxFrames` evenly-spaced frames per media (step =
   * ceil(n_frames / maxFrames)), each with its aspect-preserving resize to
   * `targetSide` on the long edge (integer arithmetic) and a deterministic
   * frame fingerprint standing in for the decoded frame bytes (codecs are
   * offline; the real deployment swaps the fingerprint for the frame
   * tensor). Decode stays the batched mapPartitions stage; sampling and
   * resize are pure Catalyst ops AFTER it — at 100 TB the explode
   * multiplies rows only by ≤ maxFrames and never re-touches the payload.
   */
  def frameSample(spark: SparkSession, sfDir: String, maxFrames: Int = 4, targetSide: Int = 224): DataFrame = {
    val dec = decodeMedia(spark, sfDir)
    val step = greatest(lit(1), ceil(col("n_frames") / lit(maxFrames)).cast("int"))
    dec
      .select(col("pid"), col("media_ref"), col("width"), col("height"),
        explode(sequence(lit(0), col("n_frames") - 1, step)).as("frame_idx"))
      .select(
        col("pid"), col("frame_idx"),
        expr(s"CAST((width * $targetSide) DIV GREATEST(width, height) AS INTEGER)").as("out_w"),
        expr(s"CAST((height * $targetSide) DIV GREATEST(width, height) AS INTEGER)").as("out_h"),
        md5(concat(col("media_ref"), lit(":"), col("frame_idx").cast("string")).cast("binary")).as("frame_fp"))
  }

  def frameSampleSql(maxFrames: Int = 4, targetSide: Int = 224): String =
    graft.query.GeoQueries.withWorld(
      """media AS (
        |  SELECT pid, 'blob://p/' || CAST(pid % 1000 AS VARCHAR) AS media_ref,
        |         CAST(64 + (CAST('0x' || substr(md5('blob://p/' || CAST(pid % 1000 AS VARCHAR)), 1, 2) AS BIGINT) & 127) AS INTEGER) AS width,
        |         CAST(64 + (CAST('0x' || substr(md5('blob://p/' || CAST(pid % 1000 AS VARCHAR)), 3, 2) AS BIGINT) & 127) AS INTEGER) AS height,
        |         CAST(1 + (CAST('0x' || substr(md5('blob://p/' || CAST(pid % 1000 AS VARCHAR)), 5, 2) AS BIGINT) & 15) AS INTEGER) AS n_frames
        |  FROM pts WHERE is_media
        |)""".stripMargin) +
      s"""SELECT pid, CAST(f.frame_idx AS INTEGER) AS frame_idx,
         |       CAST((width * $targetSide) // GREATEST(width, height) AS INTEGER) AS out_w,
         |       CAST((height * $targetSide) // GREATEST(width, height) AS INTEGER) AS out_h,
         |       md5(media_ref || ':' || CAST(f.frame_idx AS VARCHAR)) AS frame_fp
         |FROM media
         |CROSS JOIN LATERAL (SELECT UNNEST(RANGE(0, n_frames, GREATEST(1, CAST(CEIL(n_frames / ${maxFrames}.0) AS INTEGER)))) AS frame_idx) f""".stripMargin

  /** Feature-extract + tile co-location: decoded media bucketed to slippy
    * tiles (join back to the point table for coordinates) — the
    * raster-side half of the raster<->vector assignment. */
  def mediaTiles(spark: SparkSession, sfDir: String, z: Int = 7): DataFrame = {
    val dec = decodeMedia(spark, sfDir)
    val t = graft.query.GeoQueries.tileAssign(spark, sfDir, z)
    dec.join(t, "pid")
      .groupBy("z", "tx", "ty")
      .agg(count(lit(1)).as("n_media"),
        sum(col("width").cast("long") * col("height").cast("long")).as("total_pixels"))
  }

  def mediaTilesSql(z: Int = 7): String =
    graft.query.GeoQueries.withWorld(
      """media AS (
        |  SELECT pid,
        |         CAST(64 + (CAST('0x' || substr(md5('blob://p/' || CAST(pid % 1000 AS VARCHAR)), 1, 2) AS BIGINT) & 127) AS BIGINT) AS width,
        |         CAST(64 + (CAST('0x' || substr(md5('blob://p/' || CAST(pid % 1000 AS VARCHAR)), 3, 2) AS BIGINT) & 127) AS BIGINT) AS height
        |  FROM pts WHERE is_media
        |)""".stripMargin) +
      s"""SELECT $z AS z,
         |       ${graft.cell.CellSql.tileX("p.lon", z)} AS tx,
         |       ${graft.cell.CellSql.tileY("p.lat", z)} AS ty,
         |       COUNT(*) AS n_media,
         |       CAST(SUM(m.width * m.height) AS BIGINT) AS total_pixels
         |FROM media m JOIN pts p ON p.pid = m.pid
         |GROUP BY 1, 2, 3""".stripMargin
}
