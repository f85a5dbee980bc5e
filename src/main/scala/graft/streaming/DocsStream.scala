package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ext.TextAnalysis

/** Streaming ingest surface over the `documents` table — the curation
  * funnel's admission stages applied AT INGEST, so low-quality or
  * off-language crawl shards are cut before they ever hit corpus storage
  * (the batch funnel in [[graft.ext.Curation]] then only pays dedup over
  * admitted docs).
  */
object DocsStream {

  /** The documents schema (readStream needs it explicitly; matches the
    * driver testdata parquet byte-for-byte). */
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Open the unbounded documents source over a directory of parquet
    * files. */
  def readDocuments(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(schema).parquet(dir)

  /** Streaming quality admission — [[TextAnalysis.qualityScoreBp]] +
    * [[TextAnalysis.langIdColumn]] composed into an ingest gate: every
    * arriving doc is scored and carries an `admitted` verdict, so the
    * sink splits into the admitted corpus (`admitted`) and the rejection
    * audit trail (`NOT admitted`) — the [[EventsStream.budgetAdmission]]
    * filter-plus-audit idiom, stateless here (per-doc scores need no
    * state store, no watermark: the gate is a map-only streaming stage
    * that scales with source parallelism and emits in the arriving
    * micro-batch).
    *
    * Returned columns: (doc_id, lang_pred, quality_score_bp, admitted).
    * Batch-equivalence is exact by construction — the same deterministic
    * integer/argmax arithmetic as the batch operators, so the streamed
    * result hash-matches the batch scoring of the same files.
    */
  def qualityAdmission(docs: DataFrame, minBp: Long = 5000L): DataFrame = {
    require(minBp >= 0L && minBp <= 10000L,
      s"minBp $minBp must be within 0..10000 basis points")
    docs.select(col("doc_id"),
        TextAnalysis.langIdColumn(col("text")).as("lang_pred"),
        TextAnalysis.qualityScoreBp(col("text")))
      .withColumn("admitted", col("quality_score_bp") >= minBp)
  }
}
