package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.Sources

/** Semantic invariants for the corpus/event analytics queries whose
  * oracle check proves cross-engine equality but not the intended
  * meaning. Run against sf0.001 (the CatalogSpec smoke scale).
  */
class AnalyticsQueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("unigram logprob: MLE bounds and token-count conservation") {
    val out = Catalog.byName("q_x_unigram_logprob").run(spark, sfDir)
      .select(col("doc_id"), col("milli_nats"), col("n_toks")).collect()
    // ln p ≤ 0 for every token (p ≤ 1) → every doc sum is negative;
    // a doc of only-unique tokens still has p = 1/total < 1.
    assert(out.nonEmpty)
    assert(out.forall(_.getLong(1) < 0L))
    assert(out.forall(_.getLong(2) > 0L))
    // scored tokens == corpus tokens: the freq join drops nothing
    // (self-trained MLE means every token is in-vocabulary)
    val totalToks = Sources.table(spark, sfDir, "documents")
      .select(size(filter(split(col("text"), " ", -1), t => t =!= lit("")))
        .cast("long").as("n"))
      .agg(sum(col("n"))).collect().head.getLong(0)
    assert(out.map(_.getLong(2)).sum == totalToks)
  }

  test("unigram logprob: hand-checked tiny corpus") {
    // corpus: doc1 = "a a b", doc2 = "b" → freqs a:2 b:2, total 4
    // ln(2/4) = -0.6931... → floor(-693.1...) = -694 milli-nats per token
    val spark0 = spark
    import spark0.implicits._
    val dir = java.nio.file.Files.createTempDirectory("uni-spec").toString
    Seq((1L, "a a b"), (2L, "b")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Catalog.byName("q_x_unigram_logprob").run(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) == ((-694L * 3, 3L)))
    assert(out(2L) == ((-694L, 1L)))
  }

  test("event transitions: per-user step conservation") {
    val events = Sources.table(spark, sfDir, "events")
    val nEvents = events.count()
    val nUsers = events.select(col("user_id")).distinct().count()
    val out = Catalog.byName("q_x_event_transitions").run(spark, sfDir)
    // each user contributes exactly (n_events_user - 1) transitions
    val total = out.agg(sum(col("n"))).collect().head.getLong(0)
    assert(total == nEvents - nUsers)
    // transition endpoints are real event types
    val types = events.select(col("event_type")).distinct()
      .collect().map(_.getString(0)).toSet
    val pairs = out.select(col("prev_type"), col("event_type")).collect()
    assert(pairs.forall(r => types(r.getString(0)) && types(r.getString(1))))
  }
}
