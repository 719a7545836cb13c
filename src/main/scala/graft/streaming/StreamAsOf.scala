package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event on the stream — the events-table row shape. `ts` is
  * TIMESTAMP_NTZ in the events parquet → LocalDateTime encoder. */
final case class AsOfIn(user_id: Long, event_id: Long, ts: java.time.LocalDateTime,
    event_type: String, value: Option[Double])

/** Per-user carried profile: the latest signup observation. `sv` stays an
  * Option so a NULL-valued signup still REPLACES an older non-null one —
  * the same no-resurrection rule the batch LOCF enforces by carrying a
  * struct (AsOf.purchasesWithProfile). `tsUs` is MICROSECONDS — the events
  * parquet carries timestamp[us], and the batch join compares at full
  * precision, so millisecond truncation here would flip same-millisecond
  * signup/purchase orderings (review finding). */
final case class ProfileState(tsUs: Long, eventId: Long, sv: Option[Double])

final case class EnrichedOut(event_id: Long, user_id: Long,
    purchase_value: Option[Double], signup_value: Option[Double])

/**
 * STREAMING as-of enrichment — the unbounded restatement of
 * [[graft.query.AsOf.purchasesWithProfile]]: each purchase is enriched
 * with the user's most recent signup value at or before its event time,
 * continuously, with `flatMapGroupsWithState` holding ONE profile row per
 * user (the carried LOCF value). Purchases emit in the micro-batch they
 * arrive in.
 *
 * Delivery contract: per-key in-order arrival (each user's events reach
 * the stream in event-time order — the Kafka keyed-partition contract the
 * reference's keyed sub-streams assume, SURVEY G2/G3). Under it the
 * output is row-identical to the batch as-of join, pinned in
 * StreamAndStatsSpec across micro-batch splits AND a checkpoint restart.
 * Out-of-order arrivals inside a watermark would need the bounded
 * history+buffer variant (keep the signup list above the watermark,
 * release purchases as the watermark passes them); the per-key state here
 * is deliberately O(1), the right steady-state for 10^9 users.
 *
 * Tie rules, identical to the batch plan: at equal timestamps the signup
 * is applied before the purchase (the batch's `(ts, side)` sort), and
 * among equal-ts signups the greatest event_id wins (the batch's
 * `arg_max(value, event_id)` dedup).
 */
object StreamAsOf {

  private def enrichGroup(uid: Long, in: Iterator[AsOfIn],
      state: GroupState[ProfileState]): Iterator[EnrichedOut] = {
    // batch order within the micro-batch: (ts, signup-first, event_id) at
    // full microsecond precision — exactly the batch window's sort key
    def us(t: java.time.LocalDateTime): Long =
      t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + t.getNano / 1000L
    val arrived = in.toList.sortBy(e =>
      (us(e.ts), if (e.event_type == "signup") 0 else 1, e.event_id))
    var st = state.getOption
    val out = List.newBuilder[EnrichedOut]
    arrived.foreach { e =>
      e.event_type match {
        case "signup" =>
          if (st.forall(s => us(e.ts) > s.tsUs ||
              (us(e.ts) == s.tsUs && e.event_id > s.eventId)))
            st = Some(ProfileState(us(e.ts), e.event_id, e.value))
        case "purchase" =>
          out += EnrichedOut(e.event_id, uid, e.value, st.flatMap(_.sv))
        case _ => () // other event types don't touch profile state
      }
    }
    st.foreach(state.update)
    out.result().iterator
  }

  /** Enrich a (possibly streaming) event Dataset; works identically on a
    * batch Dataset (the degenerate one-micro-batch case). */
  def enrich(spark: SparkSession, events: Dataset[AsOfIn]): Dataset[EnrichedOut] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(enrichGroup)
  }
}
