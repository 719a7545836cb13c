package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The end-to-end curation pass — the composite every training-data
  * pipeline actually ships: token-length bounds, quality threshold,
  * benchmark decontamination, exact-dup collapse, and near-dup-cluster
  * collapse, applied in one plan. Each stage reuses the already-verified
  * operator (tokenCount / qualityScore / decontaminate / exactDedup /
  * dupClusters), so the composite's oracle is the same CTEs stitched
  * together — any drift in a component breaks BOTH its own query and this
  * one.
  *
  * Plan shape at 100 TB: the three drop sets arrive as LEFT ANTI joins on
  * doc_id (contamination is itself a broadcast semi-join; the exact-dup
  * keep rule is one window over digest groups; cluster drops are the CC
  * output) — all keyed work; the quality/token filters are map-only and
  * run first so the anti-joins see only plausible survivors.
  */
object Curate {

  // Calibrated so every filter bites on the synthetic corpus without
  // dominating: token bounds trim the ~5% tails, the score floor the
  // lowest ~6%, and the contamination cut isolates true eval-copies
  // (frac ≥ 0.5 — this corpus's generated texts share vocabulary, so
  // median frac is ~0.09 and a real-world 0.05 cut would drop 75%).
  final val MIN_TOKENS = 20L
  final val MAX_TOKENS = 140L
  final val MIN_SCORE = 0.05
  final val MAX_CONTAM_FRAC = 0.5

  def curate(spark: SparkSession, sfDir: String): DataFrame = {
    val c = TextOps.corpus(spark, sfDir)
    val toks = TextOps.tokenCount(spark, sfDir).select("doc_id", "n_tokens")
    val qual = TextOps.qualityScore(spark, sfDir).select("doc_id", "score")
    // the eval slice itself must never reach the training corpus —
    // decontaminate() deliberately excludes eval docs from ITS output (they
    // are not "contaminated", they are the benchmark), so curation drops
    // them explicitly alongside the docs that overlap them
    val evalDocs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") % 13 === 5).select("doc_id")
    val contaminated = Hygiene.decontaminate(spark, sfDir)
      .filter(col("frac") >= MAX_CONTAM_FRAC).select("doc_id")
      .unionByName(evalDocs)
    val exactDrops = c
      .select(col("doc_id"), md5(col("text").cast("binary")).as("fp"))
      .join(TextOps.exactDedup(spark, sfDir).select("fp", "keep_id"), "fp")
      .filter(col("doc_id") =!= col("keep_id"))
      .select("doc_id")
    val clusterDrops = DedupGraph.dupDrops(spark, c)
    c.select("doc_id", "lang")
      .join(toks, "doc_id")
      .join(qual, "doc_id")
      .filter(col("n_tokens").between(MIN_TOKENS, MAX_TOKENS) && col("score") >= MIN_SCORE)
      .join(contaminated, Seq("doc_id"), "left_anti")
      .join(exactDrops, Seq("doc_id"), "left_anti")
      .join(clusterDrops, Seq("doc_id"), "left_anti")
      .select("doc_id", "lang", "n_tokens", "score")
  }

  val curateSql: String =
    TextOps.withCorpusRecursive(
      DedupGraph.clusterCtes ++ Hygiene.decontCtes ++ Seq(
        TextOps.toksCte,
        TextOps.qualCte,
        TextOps.exDupGroupsCte,
        // same shape as the engine side: corpus joined to the dup groups,
        // non-keep members dropped
        """exdrop AS (
          |  SELECT c.doc_id FROM corpus c
          |  JOIN exgroups g ON md5(c.text) = g.fp
          |  WHERE c.doc_id <> g.keep_id
          |)""".stripMargin): _*) +
      s"""SELECT c.doc_id, c.lang, t.n_tokens, q.score
         |FROM corpus c
         |JOIN toks t ON t.doc_id = c.doc_id
         |JOIN qual q ON q.doc_id = c.doc_id
         |WHERE t.n_tokens BETWEEN $MIN_TOKENS AND $MAX_TOKENS
         |  AND q.score >= $MIN_SCORE
         |  AND c.doc_id NOT IN (SELECT doc_id FROM contam WHERE frac >= $MAX_CONTAM_FRAC)
         |  AND c.doc_id NOT IN (SELECT doc_id FROM documents WHERE doc_id % 13 = 5)
         |  AND c.doc_id NOT IN (SELECT doc_id FROM exdrop)
         |  AND c.doc_id NOT IN (SELECT node FROM mem WHERE rn <> 1)""".stripMargin
}
