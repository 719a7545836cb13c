package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Near-duplicate CLUSTER resolution — the step the pair generators feed.
  *
  * A web-scale dedup pipeline doesn't stop at pairs: transitively-linked
  * near-duplicates (A~B, B~C) must collapse into one cluster with a single
  * canonical survivor, or the "deduped" corpus still carries one copy per
  * pair component. The reference guards each fan-out with per-stream dedup
  * (`query-engine/src/main/scala/io/plasmap/query/engine/Queries.scala:330`)
  * but has no corpus-level notion; this is the batch restatement at corpus
  * scale.
  *
  * Connected components run as alternating large-star / small-star rounds
  * (Kiveris et al., "Connected Components in MapReduce and Beyond",
  * SoCC '14): each round is two groupBy-shuffles over the edge list, and the
  * edge set provably converges to min-rooted stars in O(log n) rounds — no
  * driver-side graph, no assumption that components fit anywhere. The
  * returned membership is the one DataFrame left persisted (callers
  * unpersist once consumed; the ContextCleaner reclaims it otherwise). Dedup
  * graphs are near-cliques (every copy pairs with most others), so in
  * practice 2-3 rounds close; the bound protects the adversarial chain case
  * (A~B~C~...~Z from chained small edits).
  */
object DedupGraph {

  /** Pairs below this Jaccard are LSH accidents, not duplicates. */
  final val MIN_JACCARD = 0.5

  /** Connected components of an undirected edge list `(u, v)`.
    *
    * Returns `(root, node)` membership rows — every node of every component
    * (roots included), rooted at the component's minimum id. Isolated nodes
    * never enter the edge list and are absent (a doc with no near-dup pair
    * is its own survivor; emitting it would just echo the corpus).
    *
    * Each round: large-star attaches every strictly-larger neighbor of x to
    * `m = min(N(x) ∪ {x})`, small-star attaches the smaller neighbors (and
    * x itself) of each x to the same minimum. Both are groupBy + join —
    * pure shuffles, no collect. The loop materializes each round (persist +
    * count) and releases the previous one; the fixpoint check is exact
    * (equal counts + empty except), not a hash heuristic.
    *
    * Hybrid dispatch: below `driverSideMax` edges the star rounds'
    * per-action scheduling overhead dwarfs the work — a driver-side
    * union-find (path-halving) answers in milliseconds (the same
    * driver-side-iteration call the kNN ring loop makes, bounded by the
    * same collect-fits-on-driver argument). Above it, the distributed star
    * rounds run; both paths are cross-checked in DedupGraphSpec.
    */
  def connectedComponents(edges0: DataFrame, driverSideMax: Long = 250000L): DataFrame = {
    val spark = edges0.sparkSession
    val canon0 = canonical(edges0).persist()
    val nEdges = canon0.count()
    if (nEdges <= driverSideMax) {
      import spark.implicits._
      val es = canon0.as[(Long, Long)].collect()
      canon0.unpersist()
      val parent = new java.util.HashMap[Long, Long]()
      def find(x0: Long): Long = {
        var x = x0
        while (parent.getOrDefault(x, x) != x) {
          val p = parent.get(x)
          parent.put(x, parent.getOrDefault(p, p)) // path halving
          x = parent.getOrDefault(x, x)
        }
        x
      }
      es.foreach { case (u, v) =>
        val (ru, rv) = (find(u), find(v))
        if (ru != rv) parent.put(math.max(ru, rv), math.min(ru, rv))
      }
      val nodes: Seq[Long] = es.iterator.flatMap(e => Iterator(e._1, e._2)).toSet.toSeq
      val members: Seq[(Long, Long)] = nodes.map(x => (find(x), x))
      return members.toDF("root", "node")
    }
    distributedComponents(spark, canon0)
  }

  private def distributedComponents(spark: SparkSession, canon0: DataFrame): DataFrame = {
    // Rebase each round on a LogicalRDD: the star operators reference their
    // input plan 4×, so carrying logical plans across rounds grows the tree
    // 4^k — analysis alone OOMs after ~10 rounds. Materializing to an RDD
    // gives every round a constant-size plan; RDD lineage grows linearly and
    // the persist guards recomputation.
    def materialize(df: DataFrame): DataFrame = {
      val out = spark.createDataFrame(df.rdd, df.schema).persist()
      out.count()
      out
    }
    var edges = materialize(canon0)
    canon0.unpersist()
    var n = edges.count()
    val spent = scala.collection.mutable.ListBuffer(edges)
    var converged = n == 0
    var it = 0
    while (!converged && it < 32) {
      val next = materialize(smallStar(largeStar(edges)))
      val m = next.count()
      converged = m == n && next.except(edges).isEmpty
      spent += next
      edges = next
      n = m
      it += 1
    }
    // converged star edges are (root=component min, node)
    val members = edges.select(col("u").as("root"), col("v").as("node"))
      .unionByName(edges.select(col("u").as("root"), col("u").as("node")))
      .distinct()
    val out = members.cache()
    out.count() // materialize before releasing the iteration caches
    spent.foreach(_.unpersist())
    out
  }

  /** Canonical undirected form: `u < v`, distinct, self-loops dropped. */
  private def canonical(e: DataFrame): DataFrame =
    e.select(least(col("u"), col("v")).as("u"), greatest(col("u"), col("v")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()

  /** Large-star: for every node x (over the symmetric neighborhood), emit
    * an edge from each neighbor y > x to `m = min(N(x) ∪ {x})`. `m ≤ x < y`
    * so the output is already canonical and self-loop-free. */
  private[graft] def largeStar(edges: DataFrame): DataFrame = {
    val sym = edges.select(col("u").as("x"), col("v").as("y"))
      .union(edges.select(col("v").as("x"), col("u").as("y")))
    val mins = sym.groupBy("x").agg(min("y").as("mn"))
      .select(col("x"), least(col("x"), col("mn")).as("m"))
    sym.join(mins, "x").filter(col("y") > col("x"))
      .select(col("m").as("u"), col("y").as("v"))
      .distinct()
  }

  /** Small-star: for every node v, attach its smaller neighbors (the u
    * side of canonical edges) AND v itself to `m = min` of those
    * neighbors. */
  private[graft] def smallStar(edges: DataFrame): DataFrame = {
    val mins = edges.groupBy("v").agg(min("u").as("m"))
    val attachSmaller = edges.join(mins, "v")
      .filter(col("u") =!= col("m"))
      .select(col("m").as("u"), col("u").as("v"))
    val attachSelf = mins.select(col("m").as("u"), col("v"))
    attachSmaller.unionByName(attachSelf).distinct()
  }

  /** Duplicate clusters over the MinHash-LSH near-dup pairs at
    * `jaccard ≥ 0.5`, with one canonical survivor per cluster: the longest
    * member (most complete copy), ties to the smallest doc_id. Output one
    * row per cluster: `(root, n_docs, keep_id)`.
    *
    * At 100 TB: pair generation is the bounded LSH path (TextOps), the CC
    * rounds shuffle only the edge list (|pairs| rows, corpus-independent),
    * and the survivor pick is one window over cluster members — every stage
    * is keyed work on the duplicate subset, never on the corpus.
    */
  def dupClusters(spark: SparkSession, sfDir: String): DataFrame =
    dupClustersOf(spark, TextOps.corpus(spark, sfDir))

  /** Cluster members ranked by the survivor rule: `(root, node, rn)` with
    * rn = 1 for the canonical doc. */
  private[graft] def memberRanks(spark: SparkSession, c: DataFrame): DataFrame = {
    val pairs = TextOps.minhashPairsOf(spark, c).filter(col("jaccard") >= MIN_JACCARD)
    val comp = connectedComponents(pairs.select(col("a").as("u"), col("b").as("v")))
    val mem = comp.join(c.select(col("doc_id").as("node"), length(col("text")).as("tl")), "node")
    val w = Window.partitionBy("root").orderBy(col("tl").desc, col("node"))
    mem.withColumn("rn", row_number().over(w))
  }

  def dupClustersOf(spark: SparkSession, c: DataFrame): DataFrame =
    memberRanks(spark, c)
      .groupBy("root")
      .agg(count(lit(1)).as("n_docs"),
        min(when(col("rn") === 1, col("node"))).as("keep_id"))

  /** Every non-canonical cluster member — the docs a curation pass drops. */
  private[graft] def dupDrops(spark: SparkSession, c: DataFrame): DataFrame =
    memberRanks(spark, c).filter(col("rn") =!= 1).select(col("node").as("doc_id"))

  /** The cluster derivation as composable CTEs (appended to
    * [[TextOps.pairCtes]], requires a `WITH RECURSIVE` list) ending in
    * `mem(root, node, tl, rn)`: components via recursive min-label
    * reachability (exact transitive closure — fine at oracle scale), same
    * survivor rule. */
  private[graft] val clusterCtes: Seq[String] =
    TextOps.pairCtes ++ Seq(
      s"""edges AS (
         |  SELECT a AS u, b AS v FROM pairs WHERE jaccard >= $MIN_JACCARD
         |  UNION
         |  SELECT b AS u, a AS v FROM pairs WHERE jaccard >= $MIN_JACCARD
         |)""".stripMargin,
      """reach(node, r) AS (
        |  SELECT u, u FROM edges
        |  UNION
        |  SELECT w.node, e.v FROM reach w JOIN edges e ON e.u = w.r
        |)""".stripMargin,
      """comp AS (
        |  SELECT node, MIN(r) AS root FROM reach GROUP BY node
        |)""".stripMargin,
      """mem AS (
        |  SELECT c.root, c.node, length(t.text) AS tl,
        |         ROW_NUMBER() OVER (PARTITION BY c.root ORDER BY length(t.text) DESC, c.node) AS rn
        |  FROM comp c JOIN corpus t ON t.doc_id = c.node
        |)""".stripMargin)

  val dupClustersSql: String =
    TextOps.withCorpusRecursive(clusterCtes: _*) +
      """SELECT root, COUNT(*) AS n_docs, MIN(CASE WHEN rn = 1 THEN node END) AS keep_id
        |FROM mem GROUP BY root""".stripMargin
}
