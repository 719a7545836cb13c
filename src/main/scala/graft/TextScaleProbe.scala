package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off scale probe: replicate the text corpus K x with per-copy word
  * perturbation (every word suffixed with the copy ordinal, so copies share
  * NO shingles and the true near-dup structure stays per-copy) and time the
  * pair generators — evidence that candidate-scoped refines scale ~linearly
  * in corpus size, not quadratically in shingle/band frequency. */
object TextScaleProbe {
  def scaled(spark: SparkSession, sfDir: String, k: Int): DataFrame = {
    val c = graft.text.TextOps.corpus(spark, sfDir)
    c.withColumn("rep", explode(sequence(lit(0), lit(k - 1))))
      .select(
        (col("doc_id") + col("rep") * 1000000L).as("doc_id"),
        array_join(transform(split(col("text"), " "), w => concat(w, col("rep").cast("string"))), " ").as("text"),
        col("lang"), col("source"))
  }
  def t[A](label: String)(f: => A): Unit = {
    val t0 = System.nanoTime(); val r = f
    println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s -> $r")
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    for (k <- Seq(1, 4, 16)) {
      val c = scaled(spark, sf, k).persist()
      val n = c.count()
      t(s"minhash_pairs k=$k n=$n")(graft.text.TextOps.minhashPairsOf(spark, c).count())
      t(s"ngram_jaccard k=$k n=$n")(graft.text.TextOps.ngramJaccardOf(spark, c).count())
      t(s"simhash_pairs k=$k n=$n")(graft.text.TextOps.simhashPairsOf(spark, c).count())
      t(s"dup_clusters k=$k n=$n")(graft.text.DedupGraph.dupClustersOf(spark, c).count())
      c.unpersist()
    }
    spark.stop()
  }
}
