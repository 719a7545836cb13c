package graft

import org.apache.spark.sql.functions._
import graft.text.DedupGraph

/** Connected-components + canonical-survivor semantics on adversarial
  * graph shapes the corpus never produces. */
class DedupGraphSpec extends SparkSpec {

  private def cc(edges: Seq[(Long, Long)], driverSideMax: Long = 5000000L): Map[Long, Long] = {
    import spark.implicits._
    DedupGraph.connectedComponents(edges.toDF("u", "v"), driverSideMax)
      .collect().map(r => r.getLong(1) -> r.getLong(0)).toMap
  }

  test("chain graph collapses to one min-rooted component on BOTH paths (the O(log n) case)") {
    // 1-2-3-...-40: worst case for naive propagation (diameter 39)
    val edges = (1L until 40L).map(i => (i, i + 1))
    for (max <- Seq(0L, Long.MaxValue)) { // distributed stars / driver union-find
      val m = cc(edges, max)
      assert(m.keySet === (1L to 40L).toSet)
      assert(m.values.toSet === Set(1L))
    }
  }

  test("disjoint components keep separate roots; cliques and stars both converge") {
    val clique = for (a <- 10L to 14L; b <- (a + 1) to 14L) yield (a, b)
    val star = (31L to 35L).map(x => (30L, x))
    val m = cc(clique ++ star ++ Seq((50L, 51L)))
    assert(m.filter(_._1 <= 14L).values.toSet === Set(10L))
    assert(m.filter(kv => kv._1 >= 30L && kv._1 <= 35L).values.toSet === Set(30L))
    assert(m(51L) === 50L && m(50L) === 50L)
  }

  test("duplicate orientation / self-loop / unsorted input normalises away") {
    val m = cc(Seq((5L, 3L), (3L, 5L), (5L, 5L), (3L, 7L)))
    assert(m === Map(3L -> 3L, 5L -> 3L, 7L -> 3L))
  }

  test("empty edge list yields no components") {
    import spark.implicits._
    assert(DedupGraph.connectedComponents(
      Seq.empty[(Long, Long)].toDF("u", "v")).count() === 0L)
  }

  test("iteration caches are released after connectedComponents returns") {
    val before = spark.sparkContext.getPersistentRDDs.size
    val out = cc((1L until 30L).map(i => (i, i + 1)), driverSideMax = 0L)
    assert(out.nonEmpty)
    // only the returned membership cache may remain; iteration rounds must not
    assert(spark.sparkContext.getPersistentRDDs.size <= before + 1)
  }

  test("randomized: components match a union-find reference on 40 random graphs at once") {
    // 40 random graphs packed disjointly (node ids offset by 1000 per
    // trial) -> ONE distributed CC run cross-checked against a driver-side
    // union-find. Seeded sampling stands in for scalacheck's forAll.
    val rnd = new scala.util.Random(20260816L)
    val edges = (0 until 40).flatMap { trial =>
      val base = trial * 1000L
      val n = 2 + rnd.nextInt(30)
      Seq.fill(rnd.nextInt(50))((base + rnd.nextInt(n), base + rnd.nextInt(n)))
        .filter(e => e._1 != e._2)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val idx = nodes.zipWithIndex.toMap
    val parent = Array.tabulate(nodes.size)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(idx(a)), find(idx(b)))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = nodes.indices.groupBy(find).iterator.flatMap { case (_, mem) =>
      val mn = mem.map(nodes).min
      mem.map(i => nodes(i) -> mn)
    }.toMap
    assert(cc(edges, driverSideMax = 0L) === expected, "distributed star rounds")
    assert(cc(edges) === expected, "driver-side union-find")
  }

  test("survivor rule: longest member wins, ties break to smallest doc_id") {
    import spark.implicits._
    // cluster {1,2,3}: doc 2 longest; cluster {7,8}: equal length -> keep 7.
    // Texts share enough shingles to pair up under LSH at jaccard >= 0.5.
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val c = Seq(
      (1L, base, "en", "s"),
      (2L, base + " lambda", "en", "s"),
      (3L, base, "en", "s"),
      (7L, "one two three four five six seven eight nine ten", "en", "s"),
      (8L, "one two three four five six seven eight nine ten", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val rows = DedupGraph.dupClustersOf(spark, c)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows === Set((1L, 3L, 2L), (7L, 2L, 7L)))
  }
}
