package graft.bench

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/**
 * N -> 4N scaling evidence (BASELINE.json north_rule: throughput scaling
 * efficiency >= 0.8 between two cluster sizes). No real cluster exists in
 * this sandbox, so the sanctioned stand-in: run the IDENTICAL headline job
 * at local[8] and local[32] on the same input and report both throughputs
 * plus efficiency = (throughput@32 / throughput@8) / 4.
 *
 * Each parallelism level gets its own SparkSession (fresh context, shuffle
 * partitions = cores); 1 warmup + 3 timed runs, median reported.
 */
object ScalingBench {

  private def run(cpus: Int, sfDir: String): (Double, Long) = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-scaling-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      Headline.timed(spark, sfDir) // warmup (JIT + page cache)
      val runs = (1 to 3).map(_ => Headline.timed(spark, sfDir))
      val secs = runs.map(_._2).sorted.apply(1) // median of 3
      (secs, runs.head._1)
    } finally {
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val (secs8, docs) = run(8, sfDir)
    val (secs32, _) = run(32, sfDir)
    val tp8 = docs / secs8
    val tp32 = docs / secs32
    val eff = (tp32 / tp8) / 4.0
    val json =
      s"""{"metric":"scaling efficiency N->4N (local[8]->local[32])","docs":$docs,"sf":"$sfDir",
         |"secs_n8":$secs8,"secs_n32":$secs32,
         |"docs_per_sec_n8":$tp8,"docs_per_sec_n32":$tp32,
         |"efficiency":$eff,"target":0.8}""".stripMargin.replace("\n", "")
    println(json)
    Files.writeString(Paths.get("BENCH_SCALING.json"), json + "\n")
  }
}
