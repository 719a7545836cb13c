package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus statistics operators: exact grouped quantiles (with an
  * approx-sketch twin pinned in tests, the G7 HLL pattern) and a
  * multi-level ROLLUP — the relational shapes the reference never had
  * (SURVEY §2.5: no grouping sets / percentiles anywhere) but a corpus
  * report needs. */
object Stats {

  /** Exact length quantiles (p50/p90/p99) per (lang, source). Both engines
    * use linear interpolation (`lower + frac·(higher−lower)`); results are
    * rounded to 6 dp so formula-order ulp differences cannot flip the
    * compare. Exact percentile is a per-group sort — fine for bounded
    * group counts; the streaming-friendly alternative is
    * `percentile_approx`, whose error bound the spec pins against this
    * exact twin. */
  def lenQuantiles(spark: SparkSession, sfDir: String): DataFrame =
    TextOps.corpus(spark, sfDir)
      .select(col("lang"), col("source"), length(col("text")).cast("double").as("len"))
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n"),
        round(expr("percentile(len, 0.5)"), 6).as("p50"),
        round(expr("percentile(len, 0.9)"), 6).as("p90"),
        round(expr("percentile(len, 0.99)"), 6).as("p99"))

  val lenQuantilesSql: String =
    TextOps.withCorpus() +
      """SELECT lang, source, COUNT(*) AS n,
        |       ROUND(quantile_cont(CAST(length(text) AS DOUBLE), 0.5), 6) AS p50,
        |       ROUND(quantile_cont(CAST(length(text) AS DOUBLE), 0.9), 6) AS p90,
        |       ROUND(quantile_cont(CAST(length(text) AS DOUBLE), 0.99), 6) AS p99
        |FROM corpus GROUP BY lang, source""".stripMargin

  /** Doc/token totals at every rollup level of (lang, source) — corpus,
    * per-lang, per-(lang, source) — in ONE aggregate pass (Spark expands
    * grouping sets map-side; one shuffle, not one job per level). NULL
    * grouping columns are replaced by 'ALL' so the compare key is
    * explicit. */
  def corpusRollup(spark: SparkSession, sfDir: String): DataFrame = {
    val words = split(col("text"), " ")
    TextOps.corpus(spark, sfDir)
      .select(col("lang"), col("source"), size(words).cast("long").as("n_words"))
      .rollup("lang", "source")
      .agg(count(lit(1)).as("n_docs"), sum("n_words").as("n_words_sum"))
      .select(coalesce(col("lang"), lit("ALL")).as("lang"),
        coalesce(col("source"), lit("ALL")).as("source"),
        col("n_docs"), col("n_words_sum"))
  }

  val corpusRollupSql: String =
    TextOps.withCorpus() +
      """SELECT COALESCE(lang, 'ALL') AS lang, COALESCE(source, 'ALL') AS source,
        |       COUNT(*) AS n_docs, CAST(SUM(len(str_split(text, ' '))) AS BIGINT) AS n_words_sum
        |FROM corpus GROUP BY ROLLUP (lang, source)""".stripMargin
}
