package graft
import org.apache.spark.sql.SparkSession

/** Dev utility: print the join shape of every catalog query
  * (`sbt "runMain graft.PlanAuditAll"`). Expected state: broadcast/shuffle
  * hash joins everywhere; the only BroadcastNestedLoop plans are the three
  * DOCUMENTED deliberate products — q_embed_topk (the labelled exact
  * brute-force baseline), q_embed_ivf's two-level assignment (a ONE-ROW
  * supers broadcast + the K × √K membership grouping — the n × K product
  * of rounds ≤ 3 is gone), and q_text_keywords' 1-row corpus-count
  * attach; SortMergeJoin only on big-big equi-joins (minhash refine, IVF
  * partition fetch). Anything else appearing here is a plan regression —
  * see PlanShapeSpec for the enforced subset. */
object PlanAuditAll {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val p = fn(spark, sf).queryExecution.executedPlan.toString
        val cart = if (p.contains("CartesianProduct")) "CARTESIAN!" else ""
        val bnl = if (p.contains("BroadcastNestedLoop")) "BNL!" else ""
        val smj = if (p.contains("SortMergeJoin")) "SMJ" else ""
        val joins = Seq(
          "BHJ" -> "BroadcastHashJoin", "SHJ" -> "ShuffledHashJoin").collect {
          case (tag, pat) if p.contains(pat) => tag }.mkString("+")
        println(f"$name%-24s $joins%-10s $smj $cart $bnl")
      } catch { case e: Throwable => println(s"$name ERROR ${e.getMessage.take(80)}") }
    }
    spark.stop()
  }
}
