package graft.bench

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only stage profiler for the optimization rounds: splits the heavy
  * catalog queries into their component stages and reports wall + executor
  * CPU per stage (the Bench CpuMeter), so optimization work targets the
  * measured cost, not the guessed one. Not part of the driver contract.
  *
  * Usage: `sbt "runMain graft.bench.ProfileProbe [queryName ...]"`
  */
object ProfileProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpu = new CpuMeter(spark.sparkContext)

    // per-stage CPU attribution: stage name -> (tasks, cpuNs, runNs)
    val stages = new java.util.concurrent.ConcurrentHashMap[Int, (String, Int, Long, Long)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        stages.put(si.stageId,
          (si.name.take(90), si.numTasks, m.executorCpuTime, m.executorRunTime))
      }
    })
    def dumpStages(min: Double = 0.2): Unit = {
      import scala.jdk.CollectionConverters._
      stages.asScala.toSeq.sortBy(-_._2._3).filter(_._2._3 / 1e9 >= min).foreach {
        case (id, (name, n, c, r)) =>
          println(f"  STAGE $id%5d tasks=$n%4d cpu=${c / 1e9}%7.2f run=${r / 1e6 / 1000.0}%7.2f  $name")
      }
      stages.clear()
    }

    def step[A](name: String)(f: => A): A = {
      val c0 = cpu.snapshotNs(); val t0 = System.nanoTime()
      val r = f
      val wall = (System.nanoTime() - t0) / 1e9
      val c = (cpu.snapshotNs() - c0) / 1e9
      println(f"PROBE $name%-40s wall=$wall%7.2f cpu=$c%7.2f")
      if (sys.env.contains("PROBE_STAGES")) dumpStages()
      r
    }

    val only = args.toSet
    def want(n: String) = only.isEmpty || only(n)

    // generic: "run:<catalogQueryName>" times the declared query end-to-end
    args.filter(_.startsWith("run:")).map(_.stripPrefix("run:")).foreach { qn =>
      graft.SparkEntry.queries.get(qn) match {
        case Some(fn) =>
          step(s"run $qn (1st)")(fn(spark, sfDir).count())
          step(s"run $qn (2nd)")(fn(spark, sfDir).count())
        case None => println(s"no such query: $qn")
      }
    }

    if (want("q_index_upsert")) {
      import graft.cell.{CellFunctions, CellIndex}
      graft.gen.GeoWorld.registerUdfs(spark)
      val root = java.nio.file.Files.createTempDirectory("profile-up").toString
      val t = new graft.index.SnapshotTable(spark, root)
      val base = graft.gen.GeoWorld.points(spark, sfDir)
        .select(col("pid"),
          CellFunctions.zcell(col("lon"), col("lat"), lit(CellIndex.RES_MID)).as("cell"))
        .withColumn("part", CellFunctions.zcellParent(
          col("cell"), lit(CellIndex.RES_MID), lit(2)))
        .withColumn("ver", lit(1L))
      step("upsert: base count")(base.count())
      step("upsert: init")(t.init(base))
      step("upsert: upsert pid%3")(
        t.upsert(base.filter(col("pid") % 3 === 0).withColumn("ver", lit(2L)), Seq("pid")))
      step("upsert: read back count")(
        t.read().select(col("pid"), col("cell"), col("ver")).count())
      step("upsert: read back count AGAIN")(
        t.read().select(col("pid"), col("cell"), col("ver")).count())
    }

    if (want("initparts")) {
      import graft.cell.{CellFunctions, CellIndex}
      graft.gen.GeoWorld.registerUdfs(spark)
      val base = graft.gen.GeoWorld.points(spark, sfDir)
        .select(col("pid"),
          CellFunctions.zcell(col("lon"), col("lat"), lit(CellIndex.RES_MID)).as("cell"))
        .withColumn("part", CellFunctions.zcellParent(
          col("cell"), lit(CellIndex.RES_MID), lit(2)))
        .withColumn("ver", lit(1L))
      step("ib: base.count")(base.count())
      step("ib: base noop write")(
        base.write.format("noop").mode("overwrite").save())
      val cached = base.persist()
      step("ib: persist materialize (count)")(cached.count())
      step("ib: cached count again")(cached.count())
      val d1 = java.nio.file.Files.createTempDirectory("ib-flat").toString
      step("ib: cached write FLAT parquet")(
        cached.write.mode("overwrite").parquet(d1))
      val d2 = java.nio.file.Files.createTempDirectory("ib-parts").toString
      step("ib: cached write partitionBy(part)")(
        cached.withColumn("_part", col("part"))
          .write.partitionBy("part").mode("overwrite").parquet(d2))
      println("  files flat=" + new java.io.File(d1).listFiles().count(_.getName.endsWith("parquet"))
        + " parts=" + java.nio.file.Files.walk(java.nio.file.Paths.get(d2)).filter(p => p.toString.endsWith(".parquet")).count())
      val d3 = java.nio.file.Files.createTempDirectory("ib-parts1").toString
      step("ib: repartition(part)+partitionBy write")(
        cached.repartition(col("part")).withColumn("_part", col("part"))
          .write.partitionBy("part").mode("overwrite").parquet(d3))
      cached.unpersist()
    }

    if (want("persistcost")) {
      import graft.cell.{CellFunctions, CellIndex}
      graft.gen.GeoWorld.registerUdfs(spark)
      def base = graft.gen.GeoWorld.points(spark, sfDir)
        .select(col("pid"),
          CellFunctions.zcell(col("lon"), col("lat"), lit(CellIndex.RES_MID)).as("cell"))
        .withColumn("part", CellFunctions.zcellParent(
          col("cell"), lit(CellIndex.RES_MID), lit(2)))
        .withColumn("ver", lit(1L))
      step("pc: noop write (no cache)")(base.write.format("noop").mode("overwrite").save())
      // warm the cache-build machinery once, then measure each variant twice
      val w = base.persist(); w.count(); w.unpersist(true)
      for (round <- 1 to 2) {
        val c1 = base.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        step(s"pc$round: MEMORY_AND_DISK build")(c1.count()); c1.unpersist(true)
        val c2 = base.persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
        step(s"pc$round: MEMORY_ONLY build")(c2.count()); c2.unpersist(true)
        spark.conf.set("spark.sql.inMemoryColumnarStorage.compressed", "false")
        val c3 = base.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        step(s"pc$round: uncompressed columnar build")(c3.count()); c3.unpersist(true)
        spark.conf.set("spark.sql.inMemoryColumnarStorage.compressed", "true")
        step(s"pc$round: localCheckpoint")(base.localCheckpoint(true).count())
      }
    }

    if (want("q_text_curate")) {
      step("curate: corpus count")(graft.text.TextOps.corpus(spark, sfDir).count())
      step("curate: tokenCount")(graft.text.TextOps.tokenCount(spark, sfDir).count())
      step("curate: qualityScore")(graft.text.TextOps.qualityScore(spark, sfDir).count())
      step("curate: decontaminate")(graft.text.Hygiene.decontaminate(spark, sfDir).count())
      step("curate: exactDedup")(graft.text.TextOps.exactDedup(spark, sfDir).count())
      step("curate: dupClusters(full CC)")(graft.text.DedupGraph.dupClusters(spark, sfDir).count())
      step("curate: full")(graft.text.Curate.curate(spark, sfDir).count())
    }

    if (want("q_text_dup_clusters")) {
      val c = graft.text.TextOps.corpus(spark, sfDir)
      step("dup: minhashSignatures")(graft.text.TextOps.minhashSignaturesOf(spark, c).count())
      step("dup: minhashPairs")(graft.text.TextOps.minhashPairsOf(spark, c).count())
      step("dup: full clusters")(graft.text.DedupGraph.dupClustersOf(spark, c).count())
    }

    if (want("q_embed_dup_clusters")) {
      step("embdup: vectors count")(graft.vector.VectorOps.vectors(spark, sfDir).count())
      step("embdup: nearDupPairs")(graft.vector.VectorOps.nearDupPairs(spark, sfDir,
        planesOpt = Some(graft.vector.VectorOps.PLANES_PER_TABLE)).count())
      step("embdup: full")(graft.vector.VectorOps.embedDupClusters(spark, sfDir).count())
    }

    if (want("q_name_indexed")) {
      step("nameidx: full")(graft.index.SnapshotQueries.nameIndexedSearch(spark, sfDir).count())
      step("nameidx: full AGAIN")(graft.index.SnapshotQueries.nameIndexedSearch(spark, sfDir).count())
    }

    if (want("q_snap_feed")) {
      step("feed: full")(graft.index.SnapshotQueries.changeFeed(spark, sfDir).count())
    }

    if (want("q_snap_merge")) {
      step("merge: full")(graft.index.SnapshotQueries.sqlMergeUpsert(spark, sfDir).count())
    }

    if (want("q_embed_ivf")) {
      step("ivf: full")(graft.vector.VectorOps.ivfTopK(spark, sfDir).count())
    }

    if (want("q_knn_batch")) {
      step("knnb: full")(graft.query.GeoQueries.knnBatchGrid(spark, sfDir).count())
    }

    if (want("q_area_chain")) {
      step("chain: full")(graft.api.AstTranslator.areaChain(spark, sfDir).count())
    }

    spark.stop()
  }
}
