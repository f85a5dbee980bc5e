package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Cache-lifetime regression guard for the library entry points that
  * persist intermediates for honest `sizeInBytes` stats (the
  * persist+count idiom): each must UNPERSIST those intermediates once its
  * result materializes, or every call leaks executor storage for the
  * session's lifetime — invisible at test scale, fatal in a long-lived
  * 100 TB session. A future persist-without-unpersist fails HERE, not in
  * production. (Dataset.persist registers in the session-wide
  * CacheManager; Dataset.unpersist deregisters synchronously even with
  * blocking = false, so `cacheManager.isEmpty` is the precise
  * observable.) localCheckpoint blocks are RDD-level and out of scope —
  * they are bounded driver-probe frames, not corpus-scale caches. */
class CacheHygieneSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs: DataFrame =
    (1 to 40).map { i =>
      val text = if (i % 4 == 0) "the quick brown fox jumps over the dog"
                 else s"unique text body number $i with words ${i * 7}"
      (i.toLong, text)
    }.toDF("doc_id", "text")

  private def assertNoResidentCache(label: String)(body: => DataFrame)
      : Unit = {
    spark.sharedState.cacheManager.clearCache()
    val n = body.collect().length
    assert(n >= 0) // materialized
    assert(spark.sharedState.cacheManager.isEmpty,
      s"$label left persisted frames in the CacheManager after its " +
        "result materialized — a persist without a matching unpersist")
  }

  test("minhash leaves no resident cache") {
    assertNoResidentCache("Dedup.minhash") {
      Dedup.minhash(docs, "doc_id", "text")
    }
  }

  test("simhashDedup leaves no resident cache") {
    assertNoResidentCache("Dedup.simhashDedup") {
      Dedup.simhashDedup(docs, "doc_id", "text")
    }
  }

  test("incrementalMatch leaves no resident cache") {
    val corpus = docs.filter(col("doc_id") <= 20L)
    val fresh = docs.filter(col("doc_id") > 20L)
    val index = Dedup.bandIndex(corpus, "doc_id", "text")
    assertNoResidentCache("Dedup.incrementalMatch") {
      Dedup.incrementalMatch(fresh, corpus, index, "doc_id", "text")
    }
  }

  test("prefixJaccardSelfJoin leaves no resident cache") {
    assertNoResidentCache("SimilarityJoin.prefixJaccardSelfJoin") {
      SimilarityJoin.prefixJaccardSelfJoin(docs, "doc_id", "text", 7, 10)
    }
  }

  test("associationRules leaves no resident cache") {
    val items = (1 to 30).flatMap(b =>
      Seq((b.toLong, s"item${b % 3}"), (b.toLong, s"item${b % 5 + 3}")))
      .toDF("basket", "item")
    assertNoResidentCache("MarketBasket.associationRules") {
      MarketBasket.associationRules(items, "basket", "item",
        minPairCount = 2L)
    }
  }

  test("importanceWeights leaves no resident cache") {
    // r13: Dsir persists the bucketed token stream (it feeds both the
    // estimate aggregate and the scoring join, with no exchange below
    // for Catalyst to reuse — the md5 pass otherwise runs twice)
    assertNoResidentCache("Dsir.importanceWeights") {
      Dsir.importanceWeights(docs, "doc_id", "text",
        col("doc_id") % 2 === 0)
    }
  }
}
