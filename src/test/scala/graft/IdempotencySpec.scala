package graft

/** Same-session idempotency: queries that touch process-level caches
  * (area dim cache, WKB parse cache, corpus-count cache, CC iteration
  * caches, Bloom broadcasts) must return identical results when run twice
  * in one session — cache pollution across runs would corrupt a long-lived
  * multi-query driver exactly where the oracle gate (one run per query)
  * cannot see it. */
class IdempotencySpec extends SparkSpec {

  private def runTwice(name: String): Unit = {
    val fn = SparkEntry.queries(name)
    def snap() = fn(spark, sfDir).collect().map(_.toString).sorted.toSeq
    val a = snap()
    val b = snap()
    assert(a.nonEmpty, s"$name returned no rows")
    assert(a === b, s"$name differs across same-session runs")
  }

  test("cache-touching queries are idempotent within one session") {
    Seq(
      "q_area_chain",        // session-keyed persisted area dimension
      "q_knn",               // thread-local WKB discriminator + parse cache
      "q_embed_lsh_ann",     // memoized corpus count (plane sizing)
      "q_text_dup_clusters", // CC iteration persists + membership cache
      "q_text_bloom_dedup",  // broadcast Bloom + persisted digest pass
      "q_media_phash_pairs",
      "q_fuzzy_invalid").foreach(runTwice) // WKB parse cache sees INVALID geometries
  }
}
