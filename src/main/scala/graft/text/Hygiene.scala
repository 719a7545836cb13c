package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-hygiene operators a training-data pipeline runs beside dedup:
  * benchmark decontamination, incremental (new-batch-vs-corpus) dedup, and
  * PII redaction. All three are either map-only or a single keyed shuffle —
  * the shapes that survive 100 TB.
  */
object Hygiene {

  // ------------------------------------------------------- decontamination

  /** Benchmark decontamination: flag training docs that contain any eval-set
    * n-gram (the standard guard against test-set leakage into training
    * data). The eval set is the deterministic `doc_id % 13 == 5` slice of
    * `documents`; its distinct 3-word shingles are the contaminating
    * n-grams. Output one row per contaminated doc:
    * `(doc_id, n_hits, frac)` — distinct eval shingles hit and the fraction
    * of the doc's shingles that are contaminated (the drop/keep signal).
    *
    * Scale shape: an eval set is bounded (~10^5 docs) while the corpus is
    * not — the eval shingle set is BROADCAST, so the probe is a map-side
    * semi-join over the exploded doc shingles followed by one groupBy on
    * doc_id. No corpus-sized shuffle on the shingle key.
    */
  def decontaminate(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text", "lang", "source")
    val bench = docs.filter(col("doc_id") % 13 === 5)
    val evalSh = TextOps.distinctShinglesOf(spark, bench).select("sh").distinct()
    val train = TextOps.corpus(spark, sfDir)
      .join(bench.select("doc_id"), Seq("doc_id"), "left_anti")
    val docSh = TextOps.distinctShinglesOf(spark, train).select("doc_id", "sh")
    // map-only twin of docSh.groupBy.count (== row-for-row; see
    // TextOps.shingleCounts) — the explode was otherwise evaluated twice
    val sizes = TextOps.shingleCounts(spark, train)
    docSh.join(broadcast(evalSh), "sh")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
      .join(sizes, "doc_id")
      .select(col("doc_id"), col("n_hits"),
        round(col("n_hits").cast("double") / col("n_sh").cast("double"), 6).as("frac"))
  }

  /** The decontamination derivation as composable CTEs ending in
    * `contam(doc_id, n_hits, frac)`. */
  private[graft] val decontCtes: Seq[String] = Seq(
    s"""evalsh AS (
       |  SELECT DISTINCT UNNEST(list_distinct(${TextOps.shinglesSql})) AS sh
       |  FROM documents WHERE doc_id % 13 = 5
       |)""".stripMargin,
    s"""docsh AS (
       |  SELECT doc_id, UNNEST(list_distinct(${TextOps.shinglesSql})) AS sh
       |  FROM corpus
       |  WHERE doc_id NOT IN (SELECT doc_id FROM documents WHERE doc_id % 13 = 5)
       |)""".stripMargin,
    """dsz AS (
      |  SELECT doc_id, COUNT(*) AS n_sh FROM docsh GROUP BY 1
      |)""".stripMargin,
    """contam AS (
      |  SELECT d.doc_id, COUNT(*) AS n_hits,
      |         ROUND(CAST(COUNT(*) AS DOUBLE) / CAST(ANY_VALUE(s.n_sh) AS DOUBLE), 6) AS frac
      |  FROM docsh d
      |  JOIN evalsh e USING (sh)
      |  JOIN dsz s ON s.doc_id = d.doc_id
      |  GROUP BY d.doc_id
      |)""".stripMargin)

  val decontaminateSql: String =
    TextOps.withCorpus(decontCtes: _*) + "SELECT doc_id, n_hits, frac FROM contam"

  // --------------------------------------------------- incremental dedup

  /** Incremental dedup: a fresh crawl batch anti-joined on content digest
    * against the already-ingested corpus — only genuinely new documents
    * survive. The batch is the deterministic `doc_id % 3 == 0` slice
    * re-keyed at `+50000`, where every second one (`% 6 == 0`) keeps its
    * text verbatim (a re-crawl duplicate) and the rest get fresh content.
    *
    * Scale shape: one LEFT ANTI shuffle keyed on the 128-bit digest —
    * map-side the batch reduces to (id, digest), corpus to (digest); a
    * daily-batch-vs-historical-corpus run is exactly this plan with the
    * corpus side read from the digest index instead of raw text.
    */
  /** The deterministic fresh-crawl batch (doc_id % 3 slice re-keyed at
    * +50000; every second doc is a verbatim re-crawl). */
  private[graft] def freshBatch(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
      .filter(col("doc_id") % 3 === 0).select(
        (col("doc_id") + 50000).as("doc_id"),
        when(col("doc_id") % 6 === 0, col("text"))
          .otherwise(concat(lit("fresh crawl: "), col("text"))).as("text"))

  private[graft] def seenDigests(spark: SparkSession, sfDir: String): DataFrame =
    TextOps.corpus(spark, sfDir)
      .select(md5(col("text").cast("binary")).as("fp")).distinct()

  /** The dedup transform itself — works identically on a batch or a
    * STREAMING `batch` side (stream-static join against the digest index:
    * left outer + null filter, the anti-join shape Structured Streaming
    * supports stream-static; ZERO join state — the static side is
    * (re)broadcast per micro-batch). Streaming parity is pinned in
    * HygieneSpec. */
  private[graft] def incrDedupOf(batch: DataFrame, seen: DataFrame): DataFrame =
    batch.withColumn("fp", md5(col("text").cast("binary")))
      .join(seen.withColumn("seen", lit(true)), Seq("fp"), "left_outer")
      .filter(col("seen").isNull)
      .select("doc_id", "fp")

  def incrDedup(spark: SparkSession, sfDir: String): DataFrame =
    incrDedupOf(freshBatch(spark, sfDir), seenDigests(spark, sfDir))

  val incrDedupSql: String =
    TextOps.withCorpus(
      """batch AS (
        |  SELECT doc_id + 50000 AS doc_id,
        |         CASE WHEN doc_id % 6 = 0 THEN text
        |              ELSE 'fresh crawl: ' || text END AS text
        |  FROM documents WHERE doc_id % 3 = 0
        |)""".stripMargin) +
      """SELECT doc_id, md5(text) AS fp FROM batch b
        |WHERE NOT EXISTS (SELECT 1 FROM corpus c WHERE md5(c.text) = md5(b.text))""".stripMargin

  /** Bloom-guarded incremental dedup — the reference's approximate→exact
    * dedup pattern (`query-engine/src/main/scala/io/plasmap/query/engine/
    * Queries.scala:297,330,340` guards every fan-out with
    * `deduplicate(expectedItems, fpp)`, a Bloom filter) restated for
    * batch-vs-corpus: a Bloom filter over the corpus digests is broadcast
    * and splits the batch map-side into DEFINITELY-new rows (no negative
    * false — emitted without any join) and might-seen candidates; only the
    * candidates pay the exact anti-join shuffle. Output is EXACTLY
    * [[incrDedup]] (the Bloom only routes; the anti-join settles every
    * maybe), so both share one oracle. At fpp 0.01 a mostly-novel crawl
    * batch shuffles ~1% of its rows instead of all of them. */
  def bloomIncrDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val batch = freshBatch(spark, sfDir)
      .withColumn("fp", md5(col("text").cast("binary")))
    // one corpus digest pass serves the count, the Bloom build, and the
    // final anti-join (left persisted for the lazy join; ContextCleaner
    // reclaims it once the result is consumed and dereferenced)
    val seen = seenDigests(spark, sfDir).persist()
    val bf = seen.stat.bloomFilter("fp", math.max(1000L, seen.count()), 0.01)
    val bfB = spark.sparkContext.broadcast(bf)
    val mightSeen = udf((s: String) => bfB.value.mightContainString(s))
    val definitelyNew = batch.filter(!mightSeen(col("fp")))
    val maybes = batch.filter(mightSeen(col("fp")))
    definitelyNew.unionByName(maybes.join(seen, Seq("fp"), "left_anti"))
      .select("doc_id", "fp")
  }

  // -------------------------------------------------------- PII redaction

  /** Email/phone patterns restricted to syntax Java regex and RE2 (DuckDB)
    * interpret identically: char classes, bounded reps, no lookaround. */
  final val EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  final val PHONE_RE = "\\+[0-9][0-9() -]{6,}[0-9]"

  /** PII redaction: scrub emails then phone numbers to typed placeholders,
    * map-only. The corpus carries no PII by construction, so docs with
    * `doc_id % 4 == 0` get a deterministic contact trailer appended first —
    * both engines build the identical augmented text, so the redacted
    * digest is oracle-checkable. Output per doc:
    * `(doc_id, had_email, had_phone, clean_fp)`.
    */
  def redact(spark: SparkSession, sfDir: String): DataFrame = {
    val trailer = concat(lit(" contact agent"), col("doc_id").cast("string"),
      lit("@example.com or +1-555-01"), lpad((col("doc_id") % 100).cast("string"), 2, "0"))
    val aug = TextOps.corpus(spark, sfDir).withColumn("text",
      when(col("doc_id") % 4 === 0, concat(col("text"), trailer)).otherwise(col("text")))
    val clean = regexp_replace(regexp_replace(col("text"), EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>")
    aug.select(
      col("doc_id"),
      col("text").rlike(EMAIL_RE).as("had_email"),
      col("text").rlike(PHONE_RE).as("had_phone"),
      md5(clean.cast("binary")).as("clean_fp"))
  }

  val redactSql: String =
    TextOps.withCorpus(
      """aug AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 4 = 0
        |              THEN text || ' contact agent' || CAST(doc_id AS VARCHAR)
        |                   || '@example.com or +1-555-01' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')
        |              ELSE text END AS text
        |  FROM corpus
        |)""".stripMargin) +
      s"""SELECT doc_id,
         |       regexp_matches(text, '$EMAIL_RE') AS had_email,
         |       regexp_matches(text, '$PHONE_RE') AS had_phone,
         |       md5(regexp_replace(regexp_replace(text, '$EMAIL_RE', '<EMAIL>', 'g'), '$PHONE_RE', '<PHONE>', 'g')) AS clean_fp
         |FROM aug""".stripMargin
}
