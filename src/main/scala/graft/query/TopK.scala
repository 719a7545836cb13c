package graft.query

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/**
 * Bounded top-k typed Aggregator: keeps the k smallest (dist, id) pairs.
 *
 * This replaces the window `row_number() <= k` plan for kNN at scale: a
 * window shuffles EVERY candidate row to its group's partition and sorts
 * there (at 100 TB that is the whole candidate set through one shuffle);
 * an Aggregator participates in partial (map-side) aggregation, so each
 * input partition forwards at most k rows per group — the shuffle carries
 * O(groups x k), not O(candidates).
 *
 * The reference has no top-k (streams are unordered; SURVEY.md §2.5) — this
 * is the north-star kNN *ranking* addition.
 */
class TopKSmallest(k: Int) extends Aggregator[(Double, Long), List[(Double, Long)], Seq[(Double, Long)]] {

  override def zero: List[(Double, Long)] = Nil

  /** Insert keeping the list sorted ascending, bounded at k. */
  private def insert(buf: List[(Double, Long)], v: (Double, Long)): List[(Double, Long)] = {
    if (buf.lengthCompare(k) >= 0 && ordGte(v, buf.last)) buf
    else {
      val (lo, hi) = buf.span(b => ordLt(b, v))
      (lo ::: v :: hi).take(k)
    }
  }

  @inline private def ordLt(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)
  @inline private def ordGte(a: (Double, Long), b: (Double, Long)): Boolean = !ordLt(a, b)

  override def reduce(buf: List[(Double, Long)], v: (Double, Long)): List[(Double, Long)] =
    insert(buf, v)

  override def merge(a: List[(Double, Long)], b: List[(Double, Long)]): List[(Double, Long)] =
    b.foldLeft(a)(insert)

  override def finish(buf: List[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[List[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}
