package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Corpus-construction operators a training-data build runs AFTER hygiene:
 * passage-level dedup with document reassembly, unigram-LM scoring,
 * temperature-weighted language rebalancing and token-balanced shard
 * assignment. All four are built from codegen'd built-ins over the shared
 * augmented [[TextOps.corpus]] and are oracle-checked against DuckDB
 * restatements (portable md5 hashing, exact integer arithmetic, ROUND(,6)
 * only on values provably far from rounding boundaries).
 */
object Mixing {

  /** Non-overlapping passage width (words) for passage-level dedup. */
  final val PASS_WORDS = 16

  /** Shard count for the token-balanced shard assignment. */
  final val N_SHARDS = 8

  /** Fixed-point scale for the temperature-sampling keep rates (ppm). */
  final val TEMP_SCALE = 1000000L

  // ------------------------------------------------- passage-level dedup

  /**
   * Passage-level exact dedup with reassembly (the C4/RefinedWeb passage
   * step): each doc splits into non-overlapping [[PASS_WORDS]]-word
   * passages; a passage instance survives iff it is the corpus-wide FIRST
   * occurrence of its content (order: doc_id, then position); each doc is
   * re-assembled from its surviving passages in original order. Emits one
   * row per doc with passage counts and the md5 of the rebuilt text.
   *
   * Scale shape: the explode is map-only; the keeper rule is a groupBy on
   * the passage fingerprint with a map-side-combinable `min(struct)` (NOT a
   * `row_number` window — a boilerplate passage repeated 10^8 times would
   * pile one window partition onto one task, while the partial-min shrinks
   * it in the map stage and AQE can split the join's hot key); reassembly
   * is one groupBy on doc_id. Three linear shuffles, no pair blowup.
   */
  def passageDedup(spark: SparkSession, sfDir: String): DataFrame =
    passageDedupOf(TextOps.corpus(spark, sfDir))

  def passageDedupOf(c: DataFrame): DataFrame = {
    val words = split(col("text"), " ")
    val starts = sequence(lit(0), size(words) - 1, lit(PASS_WORDS))
    val pass = c
      .select(col("doc_id"), words.as("w"), explode(starts).as("start"))
      .select(col("doc_id"),
        (col("start") / PASS_WORDS).cast("int").as("pidx"),
        concat_ws(" ", slice(col("w"), col("start") + 1, lit(PASS_WORDS))).as("ptext"))
      .withColumn("fp", md5(col("ptext").cast("binary")))
    val keepers = pass.groupBy("fp")
      .agg(min(struct(col("doc_id"), col("pidx"))).as("k"))
    pass.join(keepers, "fp")
      .withColumn("kept", col("k.doc_id") === col("doc_id") && col("k.pidx") === col("pidx"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).cast("int").as("n_pass"),
        sum(when(col("kept"), 1L).otherwise(0L)).cast("int").as("n_kept"),
        md5(array_join(transform(
          array_sort(collect_list(when(col("kept"), struct(col("pidx"), col("ptext"))))),
          s => s.getField("ptext")), " ").cast("binary")).as("kept_fp"))
  }

  /** Oracle restates the keeper rule as a ROW_NUMBER window (equivalent to
    * min(struct) at toy scale; the engine avoids the window for skew). */
  val passageDedupSql: String =
    TextOps.withCorpus(
      s"""pass AS (
         |  SELECT doc_id, CAST(start // $PASS_WORDS AS INTEGER) AS pidx,
         |         array_to_string(w[start + 1 : start + $PASS_WORDS], ' ') AS ptext
         |  FROM (SELECT doc_id, str_split(text, ' ') AS w,
         |               UNNEST(range(0, len(str_split(text, ' ')), $PASS_WORDS)) AS start
         |        FROM corpus)
         |)""".stripMargin,
      """ranked AS (
        |  SELECT doc_id, pidx, ptext,
        |         ROW_NUMBER() OVER (PARTITION BY md5(ptext) ORDER BY doc_id, pidx) AS rk
        |  FROM pass
        |)""".stripMargin) +
      """SELECT doc_id,
        |       CAST(COUNT(*) AS INTEGER) AS n_pass,
        |       CAST(SUM(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS INTEGER) AS n_kept,
        |       md5(COALESCE(STRING_AGG(CASE WHEN rk = 1 THEN ptext END, ' ' ORDER BY pidx), '')) AS kept_fp
        |FROM ranked GROUP BY doc_id""".stripMargin

  // ----------------------------------------------------- unigram LM score

  /**
   * Unigram language-model scoring (the CCNet-style quality signal): train
   * token log-probabilities on the corpus itself (one count shuffle with
   * map-side combine), then score each document by the sum of its tokens'
   * log-probs. Per-token logp is rounded to 6 decimals BEFORE the per-doc
   * sum so both engines sum near-multiples of 1e-6 — the final ROUND(,6)
   * then lands on the same value regardless of float summation order (a
   * raw-double sum could straddle a rounding boundary across engines).
   *
   * The vocab join is BROADCAST: natural-language vocab grows ~sqrt(corpus)
   * (Heaps' law), so even a 100 TB corpus's token table fits executor
   * memory, and a broadcast join is immune to the Zipf-head skew that would
   * hammer a shuffle join on the word key.
   */
  def unigramLm(spark: SparkSession, sfDir: String): DataFrame =
    unigramLmOf(TextOps.corpus(spark, sfDir))

  def unigramLmOf(c: DataFrame): DataFrame = {
    val toks = c.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
    val vocab = toks.groupBy("w").agg(count(lit(1)).as("cnt"))
    val tot = vocab.agg(sum("cnt").as("tot"))
    val lp = vocab.crossJoin(broadcast(tot))
      .select(col("w"),
        round(log(col("cnt").cast("double") / col("tot").cast("double")), 6).as("logp"))
    toks.join(broadcast(lp), "w")
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_tokens"),
        round(sum("logp"), 6).as("sum_logp"))
  }

  val unigramLmSql: String =
    TextOps.withCorpus(
      "toks AS (SELECT doc_id, UNNEST(str_split(text, ' ')) AS w FROM corpus)",
      "vocab AS (SELECT w, COUNT(*) AS cnt FROM toks GROUP BY w)",
      """lp AS (
        |  SELECT w, ROUND(ln(CAST(cnt AS DOUBLE) / CAST((SELECT SUM(cnt) FROM vocab) AS DOUBLE)), 6) AS logp
        |  FROM vocab
        |)""".stripMargin) +
      """SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens, ROUND(SUM(lp.logp), 6) AS sum_logp
        |FROM toks t JOIN lp ON lp.w = t.w GROUP BY t.doc_id""".stripMargin

  // ------------------------------------------- temperature lang sampling

  /**
   * Temperature-weighted language rebalancing (alpha = 0.5, the multilingual
   * mixing rule): with language shares p_l, the target mix is proportional
   * to p_l^alpha, so the per-language keep rate is proportional to
   * p_l^(alpha-1) = 1/sqrt(p_l) — normalized so the RAREST language keeps
   * everything. Rates are materialized as exact ppm integers
   * (floor(sqrt(min_cnt / cnt_l) * 10^6): integer counts → correctly-rounded
   * IEEE division, sqrt and product, so both engines floor the same double)
   * and the keep decision is the reproducible hash rule
   * h32(doc_id || ':temp') mod 10^6 < rate — deterministic across runs,
   * engines and repartitioning, like [[TextOps.stratifiedSample]].
   *
   * Scale shape: one tiny lang-count aggregate, a broadcast of L rows, then
   * a map-only filter. No data-sized shuffle at any corpus size.
   */
  def temperatureSample(spark: SparkSession, sfDir: String): DataFrame = {
    val c = TextOps.corpus(spark, sfDir)
    val langCnt = c.groupBy("lang").agg(count(lit(1)).as("lcnt"))
    val minCnt = langCnt.agg(min("lcnt").as("mincnt"))
    val rates = langCnt.crossJoin(broadcast(minCnt))
      .select(col("lang"),
        floor(sqrt(col("mincnt").cast("double") / col("lcnt").cast("double")) * TEMP_SCALE)
          .cast("long").as("keep_ppm"))
    c.join(broadcast(rates), "lang")
      .filter(TextOps.h32(concat(col("doc_id").cast("string"), lit(":temp"))) % TEMP_SCALE
        < col("keep_ppm"))
      .select(col("doc_id"), col("lang"), col("keep_ppm"))
  }

  val temperatureSampleSql: String =
    TextOps.withCorpus(
      "langcnt AS (SELECT lang, COUNT(*) AS lcnt FROM corpus GROUP BY lang)",
      s"""rates AS (
         |  SELECT lang,
         |         CAST(FLOOR(sqrt(CAST((SELECT MIN(lcnt) FROM langcnt) AS DOUBLE) / CAST(lcnt AS DOUBLE)) * $TEMP_SCALE) AS BIGINT) AS keep_ppm
         |  FROM langcnt
         |)""".stripMargin) +
      s"""SELECT c.doc_id, c.lang, r.keep_ppm
         |FROM corpus c JOIN rates r ON r.lang = c.lang
         |WHERE ${TextOps.h32Sql("CAST(c.doc_id AS VARCHAR) || ':temp'")} % $TEMP_SCALE < r.keep_ppm""".stripMargin

  // ----------------------------------------------- frequent n-gram mining

  /** Minimum corpus-wide support for a mined n-gram. */
  final val NGRAM_MIN_SUPPORT = 4L

  /**
   * Frequent n-gram mining (the boilerplate-phrase detection pass a corpus
   * build runs before dedup thresholds are tuned): corpus-wide counts of
   * every word 2- and 3-gram with support ≥ [[NGRAM_MIN_SUPPORT]].
   *
   * Plan: map-only gram explode (~(2n−3)× token count rows), then ONE
   * count shuffle whose map-side combine absorbs the Zipf head — the same
   * linear shape as the vocab build, at any corpus size.
   */
  def ngramMine(spark: SparkSession, sfDir: String): DataFrame =
    ngramMineOf(TextOps.corpus(spark, sfDir))

  def ngramMineOf(corpus: DataFrame): DataFrame = {
    val c = corpus.select(split(col("text"), " ").as("w"))
    def grams(n: Int) = explode(
      when(size(col("w")) >= n,
        transform(sequence(lit(0), size(col("w")) - n),
          i => concat_ws(" ", slice(col("w"), i + 1, lit(n)))))
        .otherwise(array()))
    val g2 = c.select(lit(2).as("n"), grams(2).as("gram"))
    val g3 = c.select(lit(3).as("n"), grams(3).as("gram"))
    g2.unionByName(g3)
      .groupBy("n", "gram").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= NGRAM_MIN_SUPPORT)
  }

  val ngramMineSql: String =
    TextOps.withCorpus(
      "wlists AS (SELECT str_split(text, ' ') AS w FROM corpus)",
      """g AS (
        |  SELECT 2 AS n, UNNEST(list_transform(range(0, len(w) - 1), i -> array_to_string(w[i + 1 : i + 2], ' '))) AS gram
        |  FROM wlists WHERE len(w) >= 2
        |  UNION ALL
        |  SELECT 3 AS n, UNNEST(list_transform(range(0, len(w) - 2), i -> array_to_string(w[i + 1 : i + 3], ' '))) AS gram
        |  FROM wlists WHERE len(w) >= 3
        |)""".stripMargin) +
      s"""SELECT n, gram, CAST(COUNT(*) AS BIGINT) AS cnt
         |FROM g GROUP BY n, gram HAVING COUNT(*) >= $NGRAM_MIN_SUPPORT""".stripMargin

  // --------------------------------------------- token-balanced sharding

  /**
   * Token-balanced shard assignment for training output files: documents
   * are globally ranked by (n_tokens DESC, doc_id) and dealt to
   * [[N_SHARDS]] shards in snake (boustrophedon) order — the classic
   * greedy-balance approximation that keeps every shard's token total
   * within one document of the mean without any sequential pass.
   *
   * The global rank is computed WITHOUT a corpus-wide window (which would
   * be one task): phase 1 aggregates per-n_tokens counts (the distinct
   * token-length domain is tiny — bounded by max document length, not
   * corpus size) and turns them into base offsets with a window over that
   * aggregate; phase 2 ranks within each n_tokens group (partitioned
   * window) and adds the broadcast base — the same two-phase scheme as
   * [[Packing.seqPack]]'s prefix sum. Emits per-shard totals.
   */
  def shardPack(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = TextOps.corpus(spark, sfDir).select(col("doc_id"),
      aggregate(split(col("text"), " "), lit(0L),
        (acc, x) => acc + floor((length(x) + 3) / 4).cast("long")).as("n_tokens"))
    val counts = docs.groupBy("n_tokens").agg(count(lit(1)).as("c"))
    val bases = counts.withColumn("base",
      coalesce(sum("c").over(
        Window.orderBy(col("n_tokens").desc).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
    val ranked = docs
      .withColumn("rwithin", row_number().over(
        Window.partitionBy("n_tokens").orderBy("doc_id")))
      .join(broadcast(bases.select(col("n_tokens"), col("base"))), "n_tokens")
      .withColumn("rank", col("base") + col("rwithin") - 1)
    val pos = col("rank") % N_SHARDS
    val block = floor(col("rank") / N_SHARDS).cast("long")
    ranked
      .withColumn("shard",
        when(block % 2 === 0, pos).otherwise(lit(N_SHARDS.toLong - 1) - pos).cast("int"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("shard_tokens"))
  }

  /** Oracle restates the two-phase rank as one global ROW_NUMBER. */
  val shardPackSql: String =
    TextOps.withCorpus(
      "docs AS (SELECT doc_id, CAST(list_sum(list_transform(str_split(text, ' '), x -> (length(x) + 3) // 4)) AS BIGINT) AS n_tokens FROM corpus)",
      "ranked AS (SELECT doc_id, n_tokens, ROW_NUMBER() OVER (ORDER BY n_tokens DESC, doc_id) - 1 AS rank FROM docs)",
      s"""sharded AS (
         |  SELECT n_tokens,
         |         CASE WHEN (rank // $N_SHARDS) % 2 = 0 THEN rank % $N_SHARDS
         |              ELSE ${N_SHARDS - 1} - rank % $N_SHARDS END AS shard
         |  FROM ranked
         |)""".stripMargin) +
      """SELECT CAST(shard AS INTEGER) AS shard,
        |       CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens
        |FROM sharded GROUP BY shard""".stripMargin
}
