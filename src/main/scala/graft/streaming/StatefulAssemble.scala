package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One span arriving on the stream: `n_spans` carries the doc's expected
  * span count (known at source — the producer wrote the doc). */
final case class SpanIn(doc_id: String, offset: Int, kind: String, text: String,
    media_ref: String, n_spans: Int)

/** Buffered partial document. */
final case class DocBuf(spans: List[(Int, String, String, String)])

/** A completed document: per-doc fingerprint over the ordered spans —
  * IDENTICAL formula to the batch [[graft.query.GeoQueries.spanRoundtrip]]
  * (md5 of "kind|text|media_ref|offset" joined by ";", span order), so
  * stream and batch outputs are directly comparable. */
final case class DocOut(doc_id: String, n_spans: Int, fp: String)

/**
 * Stateful document assembly on an unbounded span stream — the Structured
 * Streaming restatement of the reference's keyed sub-stream processing
 * (`groupAndMapSubflowWithKey`, SURVEY.md G3): spans of one doc may arrive
 * across micro-batches; `flatMapGroupsWithState` holds the partial span
 * list per doc_id and emits exactly one fingerprint row when the doc's
 * expected span count is reached.
 *
 * At scale: state is partitioned by doc_id (one shuffle), per-key state is
 * O(spans of one doc), and completed keys are REMOVED from the store —
 * steady-state memory is bounded by in-flight (incomplete) docs, not by
 * history. A production deployment would add a GroupStateTimeout eviction
 * for never-completing docs (dead-letter analog).
 */
object StatefulAssemble {

  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val sb = new StringBuilder(32)
    d.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }

  /** The batch-identical fingerprint of one doc's (offset-ordered) spans. */
  def fingerprint(spans: Seq[(Int, String, String, String)]): String =
    md5hex(spans.sortBy(_._1)
      .map { case (off, kind, text, ref) => s"$kind|$text|$ref|$off" }
      .mkString(";"))

  private def assembleGroup(
      docId: String, in: Iterator[SpanIn], state: GroupState[DocBuf]): Iterator[DocOut] = {
    val arrived = in.toList
    val expected = arrived.headOption.map(_.n_spans)
    val buf = state.getOption.map(_.spans).getOrElse(Nil) ++
      arrived.map(s => (s.offset, s.kind, s.text, s.media_ref))
    val need = expected.getOrElse(Int.MaxValue)
    if (buf.length >= need) {
      state.remove() // completed: bounded state
      Iterator.single(DocOut(docId, buf.length, fingerprint(buf)))
    } else {
      state.update(DocBuf(buf))
      Iterator.empty
    }
  }

  /** Assemble a (possibly streaming) span Dataset into completed-doc
    * fingerprints. Works identically on a batch Dataset (Spark plans
    * flatMapGroupsWithState as a regular agg-like operator there). */
  def assemble(spark: SparkSession, spans: Dataset[SpanIn]): Dataset[DocOut] = {
    import spark.implicits._
    spans.groupByKey(_.doc_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(assembleGroup)
  }
}
