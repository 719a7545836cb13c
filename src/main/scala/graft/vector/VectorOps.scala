package graft.vector

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Similarity search over the `embeddings` table (vec_id, embedding
 * float[64], label): brute-force cosine top-k as the exact baseline, and a
 * random-hyperplane LSH-bucketed variant as the scale path (candidates only
 * from the probe's bucket — the IVF-style pruning that keeps 100 TB
 * tractable; buckets are an equi-join key, so the plan is scan + shuffle on
 * bucket, never O(n^2)).
 *
 * Dot products use `zip_with`+`aggregate` over doubles (codegen'd built-ins,
 * sequential fold -> deterministic, DuckDB-reproducible).
 */
object VectorOps {

  final val DIM = 64
  final val N_PLANES = 5

  /** Pseudo-random hyperplane coefficient (i-th dim of plane p), pure
    * integer arithmetic so the oracle can recompute it: ((p*131+i*31)%17)-8. */
  @inline private def planeCoefExpr(p: Int, i: Column): Column =
    ((lit(p) * 131 + i * 31) % 17 - 8).cast("double")

  private def emb(c: Column): Column = transform(c, x => x.cast("double"))

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  private def norm(a: Column): Column = sqrt(dot(a, a))

  def vectors(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), emb(col("embedding")).as("v"), col("label"))

  /** Probe vectors: every 100th id. */
  def probes(spark: SparkSession, sfDir: String): DataFrame =
    vectors(spark, sfDir).filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("v").as("qv"))

  // ------------------------------------------------------------ brute topk

  /** Exact cosine top-k per probe: broadcast the probe set, one scan of the
    * vector side, per-probe window top-k. */
  def cosineTopK(spark: SparkSession, sfDir: String, k: Int = 10): DataFrame = {
    val vs = vectors(spark, sfDir)
    val pr = probes(spark, sfDir)
    val cosine = dot(col("v"), col("qv")) / (norm(col("v")) * norm(col("qv")))
    topKByScore(spark, k,
      vs.crossJoin(broadcast(pr))
        .filter(col("vec_id") =!= col("qid"))
        .withColumn("score0", cosine))
  }

  /** Shared top-k-by-descending-score via the bounded [[graft.query.TopKSmallest]]
    * aggregator (map-side partial top-k: the shuffle carries O(probes x k)
    * rows — negated score turns largest-first into the aggregator's
    * smallest-first order, ties broken by vec_id ascending). */
  private def topKByScore(spark: SparkSession, k: Int, cands: DataFrame): DataFrame = {
    import spark.implicits._
    val agg = new graft.query.TopKSmallest(k).toColumn
    cands.select(col("qid"), (-col("score0")).as("d"), col("vec_id"))
      .as[(Long, Double, Long)]
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(agg)
      .flatMap { case (qid, top) =>
        top.iterator.zipWithIndex.map { case ((d, id), i) => (qid, i + 1, id, -d) }
      }
      .toDF("qid", "rank", "vec_id", "s0")
      .select(col("qid"), col("rank"), col("vec_id"), round(col("s0"), 6).as("score"))
  }

  private val dotSql =
    "list_sum(list_transform(range(1, 65), i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))"
  private val normSql = (t: String) =>
    s"sqrt(list_sum(list_transform(range(1, 65), i -> CAST($t.embedding[i] AS DOUBLE) * CAST($t.embedding[i] AS DOUBLE))))"

  def cosineTopKSql(k: Int = 10): String =
    s"""WITH pairs AS (
       |  SELECT b.vec_id AS qid, a.vec_id AS vec_id,
       |         $dotSql / (${normSql("a")} * ${normSql("b")}) AS score0
       |  FROM embeddings a CROSS JOIN embeddings b
       |  WHERE b.vec_id % 100 = 0 AND a.vec_id <> b.vec_id
       |)
       |SELECT qid, CAST(rank AS INTEGER) AS rank, vec_id, ROUND(score0, 6) AS score
       |FROM (SELECT qid, vec_id, score0,
       |             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score0 DESC, vec_id) AS rank
       |      FROM pairs)
       |WHERE rank <= $k""".stripMargin

  // --------------------------------------------------------------- LSH ANN

  /** Random-hyperplane signature bucket: bit p = (v . plane_p) > 0. */
  private def bucket(v: Column): Column =
    (0 until N_PLANES).map { p =>
      val d = aggregate(
        zip_with(v, sequence(lit(0), lit(DIM - 1)), (x, i) => x * planeCoefExpr(p, i)),
        lit(0.0), (acc, x) => acc + x)
      when(d > 0, lit(1L << p)).otherwise(0L)
    }.reduce(_ + _)

  private def bucketSql(t: String): String =
    (0 until N_PLANES).map { p =>
      s"CASE WHEN list_sum(list_transform(range(1, ${DIM + 1}), i -> CAST($t.embedding[i] AS DOUBLE) * ((($p * 131 + (i - 1) * 31) % 17) - 8))) > 0 THEN ${1L << p} ELSE 0 END"
    }.mkString("(", " + ", ")")

  /** ANN via LSH buckets: candidates share the probe's bucket; exact cosine
    * + top-k within the bucket (recall < 1 by design — the scale path). */
  def lshTopK(spark: SparkSession, sfDir: String, k: Int = 10): DataFrame = {
    val vs = vectors(spark, sfDir).withColumn("bucket", bucket(col("v")))
    val pr = probes(spark, sfDir).withColumn("bucket", bucket(col("qv")))
    val cosine = dot(col("v"), col("qv")) / (norm(col("v")) * norm(col("qv")))
    topKByScore(spark, k,
      vs.join(broadcast(pr), "bucket")
        .filter(col("vec_id") =!= col("qid"))
        .withColumn("score0", cosine))
  }

  def lshTopKSql(k: Int = 10): String =
    s"""WITH pairs AS (
       |  SELECT b.vec_id AS qid, a.vec_id AS vec_id,
       |         $dotSql / (${normSql("a")} * ${normSql("b")}) AS score0
       |  FROM embeddings a JOIN embeddings b
       |    ON b.vec_id % 100 = 0 AND a.vec_id <> b.vec_id
       |   AND ${bucketSql("a")} = ${bucketSql("b")}
       |)
       |SELECT qid, CAST(rank AS INTEGER) AS rank, vec_id, ROUND(score0, 6) AS score
       |FROM (SELECT qid, vec_id, score0,
       |             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score0 DESC, vec_id) AS rank
       |      FROM pairs)
       |WHERE rank <= $k""".stripMargin

  /** Bucket histogram (shape diagnostics for the ANN path). */
  def bucketHistogram(spark: SparkSession, sfDir: String): DataFrame =
    vectors(spark, sfDir).withColumn("bucket", bucket(col("v")))
      .groupBy("bucket").agg(count(lit(1)).as("n"))

  val bucketHistogramSql: String =
    s"""SELECT ${bucketSql("a")} AS bucket, COUNT(*) AS n
       |FROM embeddings a GROUP BY 1""".stripMargin
}
