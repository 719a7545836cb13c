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
  /** Media rows per perceptual-hash group (consecutive pid range). */
  final val PHASH_GROUP = 50L

  /** 64-bit perceptual hash per media row. A real pipeline computes a DCT
    * pHash from decoded pixels; offline the hash is SYNTHESIZED from the
    * deterministic payload identity so the DEDUP layer is fully exercised
    * and oracle-checkable: media in the same pid-group share a base hash
    * (two md5 halves of the group tag), and non-canonical members
    * (`pid % 10 != 0`) flip one documented bit (position `group % 63` —
    * bit 63 avoided: DuckDB's `<<` is overflow-checked). Within a group
    * Hamming ≤ 1; across groups ~32 (md5 avalanche). */
  def phashes(spark: SparkSession, sfDir: String): DataFrame =
    phashesOf(mediaTable(spark, sfDir))

  /** Same over an arbitrary (pid)-bearing table (scale-probe entry point). */
  private[graft] def phashesOf(pids: DataFrame): DataFrame =
    pids.select(
      col("pid"),
      expr(s"""(
        |  (CAST(conv(substr(md5(CAST('img_' || CAST(CAST(pid / $PHASH_GROUP AS BIGINT) AS STRING) AS BINARY)), 9, 8), 16, 10) AS BIGINT) << 32)
        |  | CAST(conv(substr(md5(CAST('img_' || CAST(CAST(pid / $PHASH_GROUP AS BIGINT) AS STRING) AS BINARY)), 1, 8), 16, 10) AS BIGINT)
        |) ^ (
        |  CASE WHEN pid % 10 != 0
        |       THEN shiftleft(CAST(1 AS BIGINT), CAST(CAST(pid / $PHASH_GROUP AS BIGINT) % 63 AS INT))
        |       ELSE CAST(0 AS BIGINT) END
        |)""".stripMargin).as("ph"))

  /** Image near-duplicate pairs at Hamming ≤ 1 — the SimHash Hamming-band
    * plan applied to the media modality: 2×32-bit bands (2^32-bucket
    * ceiling, the round-2 lesson), per-band equi-join, exact popcount
    * refine on candidates only. */
  def phashPairs(spark: SparkSession, sfDir: String): DataFrame =
    phashPairsOf(spark, phashes(spark, sfDir))

  private[graft] def phashPairsOf(spark: SparkSession, ph: DataFrame): DataFrame = {
    val bandStructs = array(
      struct(lit(0).as("band"), expr("(ph >> 32) & 4294967295").as("bkey")),
      struct(lit(1).as("band"), expr("ph & 4294967295").as("bkey")))
    val bands = ph.select(col("pid"), explode(bandStructs).as("bs"))
      .select(col("pid"), col("bs.band").as("band"), col("bs.bkey").as("bkey"))
    val cand = bands.select(col("band"), col("bkey"), col("pid").as("a"))
      .join(bands.select(col("band"), col("bkey"), col("pid").as("b")), Seq("band", "bkey"))
      .filter(col("a") < col("b")).select("a", "b").distinct()
    cand
      .join(ph.select(col("pid").as("a"), col("ph").as("pha")), "a")
      .join(ph.select(col("pid").as("b"), col("ph").as("phb")), "b")
      .withColumn("ham", expr("CAST(bit_count(pha ^ phb) AS BIGINT)"))
      .filter(col("ham") <= 1)
      .select("a", "b", "ham")
  }

  val phashPairsSql: String = {
    val g = s"CAST(pid // $PHASH_GROUP AS VARCHAR)"
    // DuckDB's << is overflow-CHECKED, so the 64-bit assembly reinterprets
    // the high half as signed 32-bit and multiplies: identical bit pattern
    // to Spark's wrapping `hi << 32 | lo`, never out of BIGINT range.
    val hi = s"CAST('0x' || substr(md5('img_' || $g), 9, 8) AS BIGINT)"
    val lo = s"CAST('0x' || substr(md5('img_' || $g), 1, 8) AS BIGINT)"
    graft.query.GeoQueries.withWorld(
      s"""phh AS (
         |  SELECT pid,
         |         xor(
         |           (CASE WHEN $hi >= 2147483648 THEN $hi - 4294967296 ELSE $hi END) * 4294967296 + $lo,
         |           CASE WHEN pid % 10 != 0
         |                THEN CAST(1 AS BIGINT) << CAST((pid // $PHASH_GROUP) % 63 AS INT)
         |                ELSE CAST(0 AS BIGINT) END
         |         ) AS ph
         |  FROM pts WHERE is_media
         |)""".stripMargin,
      """pbands AS (
        |  SELECT pid, 0 AS band, (ph >> 32) & 4294967295 AS bkey FROM phh
        |  UNION ALL
        |  SELECT pid, 1 AS band, ph & 4294967295 AS bkey FROM phh
        |)""".stripMargin,
      """pcand AS (
        |  SELECT DISTINCT l.pid AS a, r.pid AS b
        |  FROM pbands l JOIN pbands r ON l.band = r.band AND l.bkey = r.bkey AND l.pid < r.pid
        |)""".stripMargin) +
      """SELECT c.a, c.b, CAST(bit_count(xor(pa.ph, pb.ph)) AS BIGINT) AS ham
        |FROM pcand c
        |JOIN phh pa ON pa.pid = c.a
        |JOIN phh pb ON pb.pid = c.b
        |WHERE bit_count(xor(pa.ph, pb.ph)) <= 1""".stripMargin
  }

  def mediaTiles(spark: SparkSession, sfDir: String, z: Int = 7): DataFrame = {
    val dec = decodeMedia(spark, sfDir)
    val t = graft.query.GeoQueries.tileAssign(spark, sfDir, z)
    dec.join(t, "pid")
      .groupBy("z", "tx", "ty")
      .agg(count(lit(1)).as("n_media"),
        sum(col("width").cast("long") * col("height").cast("long")).as("total_pixels"))
  }

  /**
   * Media↔text caption alignment over the INTERLEAVED span structure (the
   * multimodal-pretraining pairing step): each media span is paired with
   * the nearest PRECEDING text span of its own document — the caption a
   * web-page image inherits from the text that introduces it. A media span
   * with no preceding text keeps sentinel values (-1, '').
   *
   * Plan: explode spans (map-only), then one LOCF window PARTITIONED BY
   * doc_id ordered by span offset — the carried caption rides in a struct
   * so `last(_, ignoreNulls)` skips only non-text spans, never a genuine
   * null payload (the as-of join's NULL-carry rule). Documents are bounded
   * (≤8 spans here, ~10³ at web scale), so the window partition never
   * outgrows a task at any corpus size.
   */
  def mediaCaption(spark: SparkSession, sfDir: String): DataFrame = {
    val spans = graft.gen.GeoWorld.docs(spark, sfDir)
      .select(col("doc_id"), explode(col("spans")).as("s"))
      .select(col("doc_id"), col("s.offset").as("offset"), col("s.kind").as("kind"),
        col("s.text").as("text"), col("s.media_ref").as("media_ref"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("offset")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val cap = last(
      when(col("kind") === "point", struct(col("offset").as("o"), col("text").as("t"))),
      ignoreNulls = true).over(w)
    spans.withColumn("c", cap)
      .filter(col("kind") === "media")
      .select(col("doc_id"), col("offset").as("media_offset"), col("media_ref"),
        coalesce(col("c.o"), lit(-1)).as("caption_offset"),
        coalesce(col("c.t"), lit("")).as("caption_text"))
  }

  val mediaCaptionSql: String =
    graft.query.GeoQueries.withWorld(
      """capd AS (
        |  SELECT doc_id, "offset", kind, media_ref,
        |         last_value(CASE WHEN kind = 'point' THEN {'o': "offset", 't': text} END IGNORE NULLS)
        |           OVER (PARTITION BY doc_id ORDER BY "offset"
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS c
        |  FROM spansf
        |)""".stripMargin) +
      """SELECT doc_id, "offset" AS media_offset, media_ref,
        |       COALESCE(c.o, -1) AS caption_offset,
        |       COALESCE(c.t, '') AS caption_text
        |FROM capd WHERE kind = 'media'""".stripMargin

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
