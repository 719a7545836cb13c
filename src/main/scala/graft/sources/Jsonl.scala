package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * JSON-lines ingest for the documents table — the text-format sibling of
 * the parquet scan (reference S1 reads a foreign file format and routes
 * undecodable elements to the failure log, T16): PERMISSIVE parse with a
 * corrupt-record column, surfaced as the `_error` column the pipeline's
 * dead-letter stage ([[graft.pipeline.Stages]] runWithDeadLetter)
 * consumes — one malformed line never fails the ingest job.
 *
 * At scale: spark.read.json is a splittable line-oriented scan (each task
 * parses its byte range independently, exactly like the parquet path); the
 * explicit schema skips the whole-dataset inference pass a schemaless read
 * would pay.
 */
object Jsonl {

  /** The documents-table line schema (see TESTDATA.md). */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /**
   * Read a documents JSONL directory/file. Output carries the document
   * columns plus `_error` (null = parsed; otherwise the offending raw
   * line or a reason) — malformed lines, wrong-typed fields, and rows
   * with any missing/null field land in `_error` instead of failing the
   * scan (the table contract has no legitimate nulls; an id-less or
   * partial document can't join anything downstream, so it dead-letters
   * at the source).
   *
   * The `_error` expression deliberately references EVERY document
   * column: Spark's JSON scan only parses (and therefore only corrupt-
   * flags) the columns in the pruned required schema, so an `_error`
   * built from `_corrupt` alone would silently change classification
   * with the consuming projection — a wrong-typed field in a column the
   * query never reads would pass as clean (review finding). Referencing
   * all fields pins the full schema into the scan regardless of what the
   * caller selects.
   */
  def readDocs(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read
      .schema(docSchema.add(StructField("_corrupt", StringType)))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)
    val anyNull = docSchema.fieldNames
      .map(col(_).isNull).reduce(_ || _)
    raw.select(
      col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"),
      when(col("_corrupt").isNotNull, col("_corrupt"))
        .when(anyNull, lit("missing/null field"))
        .otherwise(lit(null).cast("string")).as("_error"))
  }

  /** Write the documents table as JSONL (the round-trip sink). */
  def writeDocs(df: DataFrame, path: String): Unit =
    df.select("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").json(path)
}
