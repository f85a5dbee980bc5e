package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.ext.TextAnalysis

/** Stream/batch equivalence of the quality admission gate: the same files
  * streamed through readStream → qualityAdmission → memory sink must
  * reproduce the batch scoring row-for-row, and the admitted/audit split
  * must partition the corpus. */
class DocsStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("streamed admission gate equals batch scoring; flag partitions") {
    val stage = java.nio.file.Files.createTempDirectory("graft-docs-stream")
    java.nio.file.Files.createSymbolicLink(
      stage.resolve("documents.parquet"),
      java.nio.file.Paths.get(sfDir, "documents.parquet").toAbsolutePath)
    try {
      val out = DocsStream.qualityAdmission(
        DocsStream.readDocuments(spark, stage.toString), minBp = 5000L)
      val q = out.writeStream.format("memory")
        .queryName("docs_quality_spec").outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      val streamed = spark.table("docs_quality_spec").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getBoolean(3))).toSet
      spark.catalog.dropTempView("docs_quality_spec")

      val batch = graft.sources.Sources.table(spark, sfDir, "documents")
        .select(col("doc_id"),
          TextAnalysis.langIdColumn(col("text")).as("lang_pred"),
          TextAnalysis.qualityScoreBp(col("text")))
        .withColumn("admitted", col("quality_score_bp") >= 5000L)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getBoolean(3))).toSet

      assert(streamed == batch)
      assert(streamed.nonEmpty)
      // the flag genuinely splits (both admitted docs and audit rows
      // exist at this SF and threshold)
      assert(streamed.exists(_._4) && streamed.exists(!_._4))
    } finally {
      java.nio.file.Files.deleteIfExists(stage.resolve("documents.parquet"))
      java.nio.file.Files.deleteIfExists(stage)
    }
  }

  test("minBp bounds enforced") {
    intercept[IllegalArgumentException] {
      DocsStream.qualityAdmission(
        graft.sources.Sources.table(spark, sfDir, "documents"),
        minBp = 10001L)
    }
  }
}
