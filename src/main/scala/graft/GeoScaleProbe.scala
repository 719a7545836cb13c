package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off scale probe for the round-5 geometry newcomers (the
  * [[TextScaleProbe]] pattern): replicate the POINT table K× (pid offset
  * per copy, coordinates unchanged — replicas land in the same cells, so
  * candidate volume grows exactly K×) and scale the kNN-batch PROBE grid
  * K× against the fixed corpus. Evidence that the hole-aware PIP join,
  * the wrapped dateline fetch and the distributed kNN widening all scale
  * linearly in their driving input. */
object GeoScaleProbe {

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
      val pts = graft.gen.GeoWorld.points(spark, sf)
        .withColumn("rep", explode(sequence(lit(0), lit(k - 1))))
        .withColumn("pid", col("pid") + col("rep") * 1000000000L)
        .drop("rep").persist()
      val n = pts.count()
      t(s"pip_enclave k=$k n=$n")(
        graft.query.GeoQueries.pipEnclaveOf(spark, sf, pts).count())
      t(s"dateline_bbox k=$k n=$n")(
        graft.query.GeoQueries.datelineBboxOf(spark, pts).count())
      pts.unpersist()
      // kNN batch: scale the PROBE side (the batch-join driver) K×
      val nProbes = graft.query.GeoQueries.KNN_BATCH_GRID * k
      val probes = spark.range(nProbes).select(
        col("id").as("qid"),
        (lit(graft.gen.GeoWorld.LON0) + (col("id") % (20 * k)) * (3.0 / k) + 0.05).as("qlon"),
        (lit(graft.gen.GeoWorld.LAT0) + floor(col("id") / (20 * k)) * 3.6 + 0.07).as("qlat"))
      t(s"knn_batch k=$k probes=$nProbes")(
        graft.query.GeoQueries.knnBatch(spark, sf, probes,
          graft.query.GeoQueries.KNN_BATCH_K, graft.query.GeoQueries.KNN_BATCH_PRUNE_M).count())
      // ranked name search: corpus ×k, output stays top-12 — the postings
      // filter drops non-matching tokens BEFORE any shuffle, so wall should
      // track the scan, not the shuffle
      val corpusK = spark.range(600000L * k).select(
        lit("node").as("kind"), col("id"),
        concat(lit("poi_"), col("id").cast("string")).as("name"))
        .unionByName(graft.gen.GeoWorld.areas(spark, sf)
          .select(lit("relation").as("kind"), col("area_id").as("id"),
            col("area_name").as("name")))
      t(s"name_ranked k=$k corpus=${600000L * k}")(
        graft.query.GeoQueries.nameRankedOf(spark, corpusK, "state 7", 12).count())
    }
    spark.stop()
  }
}
