package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Planted-fixture semantics for the wave-8 curation operators. The gate
  * rows (q_x_dsir_weights, q_x_hard_negatives, q_x_semdedup,
  * q_x_compaction_plan) pin cross-engine exactness on the synthetic
  * corpus, where the interesting decisions are often vacuous (no
  * within-cell near-dups, near-uniform token mix); these fixtures plant
  * the structure the operators exist to find.
  */
class CurationWaveSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // --------------------------------------------------------------- DSIR --

  test("DSIR: target-vocab docs outweigh off-target docs on a skewed corpus") {
    // target domain speaks {alpha beta}, the rest speaks {gamma delta};
    // a held-out doc from each vocab must separate by importance weight.
    val docs = ((1 to 20).map(i => (i.toLong, "alpha beta alpha beta", true)) ++
      (21 to 40).map(i => (i.toLong, "gamma delta gamma delta", false)) ++
      Seq((41L, "alpha beta", false), (42L, "gamma delta", false)))
      .toDF("doc_id", "text", "is_t")
    val w = Dsir.importanceWeights(docs, "doc_id", "text", col("is_t"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(w(41L) > w(42L),
      s"target-vocab doc should outweigh off-target: ${w(41L)} vs ${w(42L)}")
    // weights are per-token sums: doc 1 (4 target tokens) doubles doc 41
    assert(w(1L) == 2 * w(41L))
  }

  test("DSIR: weights are exact longs, invariant to partition layout") {
    val docs = (1 to 50).map(i =>
      (i.toLong, if (i % 3 == 0) "x y z" else "p q r s", i % 2 == 0))
      .toDF("doc_id", "text", "is_t")
    def run(df: org.apache.spark.sql.DataFrame) =
      Dsir.importanceWeights(df, "doc_id", "text", col("is_t"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(run(docs) == run(docs.repartition(7)))
  }

  test("DSIR: empty-token docs drop; n_tok counts non-empty tokens") {
    val docs = Seq((1L, "a  b", true), (2L, "", false))
      .toDF("doc_id", "text", "is_t")
    val rows = Dsir.importanceWeights(docs, "doc_id", "text", col("is_t"))
      .collect()
    assert(rows.map(_.getLong(0)).toSet == Set(1L))
    assert(rows.head.getLong(1) == 2L) // "a", "b" — double space yields none
  }

  // ----------------------------------------------------- hard negatives --

  private def vec(xs: Float*): Array[Float] = xs.toArray

  test("hard negatives: same-label twin excluded, different-label near vector ranks first") {
    val emb = Seq(
      (0L, vec(1f, 0f, 0f), 0),   // anchor, label 0
      (1L, vec(1f, 0f, 0f), 0),   // identical twin, SAME label -> excluded
      (2L, vec(0.9f, 0.1f, 0f), 1), // near, different label -> rank 1
      (3L, vec(0f, 1f, 0f), 1),     // far, different label -> rank 2
      (4L, vec(0f, 0f, 1f), 2))     // far, different label -> rank 3
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.hardNegatives(emb, Seq(0L), 3)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(!got.map(_._2).contains(1L), "same-label twin must not appear")
    assert(got.head == (1L, 2L), s"nearest different-label first: ${got.toSeq}")
  }

  // ----------------------------------------------------------- SemDeDup --

  test("semDedupPrune: lower-id near-dup survives, higher-id dropped, cross-cell pair untouched") {
    val emb = Seq(
      (10L, vec(1f, 0f), 0),  // kept (lowest id of the near-dup pair)
      (11L, vec(1f, 0.001f), 0), // cos ~ 1 with 10, same cell -> dropped
      (12L, vec(0f, 1f), 0),  // orthogonal -> kept
      (20L, vec(1f, 0f), 1),  // same direction as 10 but DIFFERENT cell -> kept
      (21L, vec(0f, 1f), 1))
      .toDF("vec_id", "embedding", "label")
    val kept = Similarity.semDedupPrune(emb, "vec_id", "embedding", "label")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(kept == Map(10L -> 1L, 11L -> 0L, 12L -> 1L, 20L -> 1L, 21L -> 1L))
  }

  test("semDedupPrune: cells over maxCell are dropped entirely (refine-first contract)") {
    val emb = ((1 to 10).map(i => (i.toLong, vec(1f, 0f), 0)) ++
      Seq((100L, vec(1f, 0f), 1), (101L, vec(0f, 1f), 1)))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.semDedupPrune(
        emb, "vec_id", "embedding", "label", tau = 0.9, maxCell = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    // the 10-vector cell 0 exceeds the cap -> no rows for it at all
    assert(out.map(_._1).toSet == Set(100L, 101L))
    assert(out.toMap == Map(100L -> 1L, 101L -> 1L))
  }

  test("semDedupPrune: over the broadcast guard the un-hinted fallback " +
       "returns identical rows") {
    // A degenerate cellCol (very many cells just over maxCell) must not
    // force an unbounded driver broadcast: maxBroadcastCells = 0 drives
    // the guard into the fallback join, whose results must be identical.
    val emb = ((1 to 10).map(i => (i.toLong, vec(1f, 0f), 0)) ++
      Seq((100L, vec(1f, 0f), 1), (101L, vec(0f, 1f), 1)))
      .toDF("vec_id", "embedding", "label")
    def rows(maxBc: Int) = Similarity.semDedupPrune(
        emb, "vec_id", "embedding", "label", tau = 0.9, maxCell = 5,
        maxBroadcastCells = maxBc)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows(0) == rows(4 << 20))
  }

  test("semDedupPrune: cell-size cap uses an aggregate, not a window sort") {
    // The maxCell filter must come from groupBy(cell).count + anti-join
    // (map-side-collapsed) — count(*) over (partition by cell) would ship
    // the whole corpus through a shuffle+sort just to learn cell sizes.
    val emb = (1 to 20).map(i => (i.toLong, vec(1f, 0f), i % 3))
      .toDF("vec_id", "embedding", "label")
    val plan = Similarity.semDedupPrune(emb, "vec_id", "embedding", "label")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"expected no window operator in semDedupPrune's plan:\n$plan")
  }

  // --------------------------------------------------------- compaction --

  test("compaction plan: cumsum first-fit bins; big file overfills but never splits") {
    val files = Seq(
      ("f01", 40L), ("f02", 40L),       // bin 0: 80
      ("f03", 250L),                     // starts at cum 80 -> bin 0 (overfill)
      ("f04", 40L),                      // cum 330 -> bin 3
      ("f05", 40L))                      // cum 370 -> bin 3
      .toDF("file", "bytes")
    val plan = Compaction.plan(files, "file", "bytes", targetBytes = 100L)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3), r.getString(4))).toMap
    assert(plan == Map(
      0L -> ((3L, 330L, "f01", "f03")),
      3L -> ((2L, 80L, "f04", "f05"))))
    // conservation: every byte lands in exactly one bin
    assert(plan.values.map(_._2).sum == 410L)
  }

  // ------------------------------------------------------------ novelty --

  test("novelty: fully-covered doc scores 0 bp, fully-new doc 10000 bp") {
    val docs = Seq(
      (1L, "a b c d e", true),      // reference: grams abc bcd cde
      (2L, "a b c d e", false),     // all 3 grams known -> 0 bp
      (3L, "x y z w", false),       // grams xyz yzw unknown -> 10000 bp
      (4L, "a b c x y z", false))   // abc known; bcx cxy xyz: 1/4 known
      .toDF("doc_id", "text", "is_ref")
    val got = Decontaminate.noveltyScore(docs, "doc_id", "text",
        col("is_ref"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(2L) == ((3L, 3L, 0L)))
    assert(got(3L) == ((2L, 0L, 10000L)))
    assert(got(4L) == ((4L, 1L, 7500L)))
    assert(!got.contains(1L), "reference docs must not be scored")
  }

  test("novelty bloom path: never undercounts, exact on planted fixture") {
    val docs = Seq(
      (1L, "a b c d e", true),
      (2L, "a b c d e", false),    // all known
      (3L, "x y z w", false))      // none known
      .toDF("doc_id", "text", "is_ref")
    val est = Decontaminate.noveltyScoreBloom(docs, "doc_id", "text",
        col("is_ref"), expectedGrams = 1000L, fpp = 0.001)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val exact = Decontaminate.noveltyScore(docs, "doc_id", "text",
        col("is_ref"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // no false negatives: est >= exact per doc; at this fpp, equal
    est.foreach { case (id, (_, kEst, _)) => assert(kEst >= exact(id)) }
    assert(est(2L)._2 == 3L && est(2L)._3 == 0L)
    assert(est(3L)._2 == 0L && est(3L)._3 == 10000L)
  }

  // ------------------------------------------------------ hash embedding --

  test("hash embedding: signed counts are additive and layout-invariant") {
    val docs = Seq((1L, "alpha beta"), (2L, "alpha beta alpha beta"),
      (3L, "")).toDF("doc_id", "text")
    val rows = TextAnalysis.hashEmbedding(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (1 to 16).map(r.getLong(_)).toVector).toMap
    // doubling every token doubles the vector exactly
    assert(rows(2L) == rows(1L).map(_ * 2))
    // the empty doc has one row of zeros? no — zero tokens, no row
    assert(!rows.contains(3L))
    // total mass: |sum of abs| bounded by token count, nonzero for doc 1
    assert(rows(1L).map(math.abs).sum <= 2 && rows(1L).exists(_ != 0))
    val re = TextAnalysis.hashEmbedding(docs.repartition(5), "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (1 to 16).map(r.getLong(_)).toVector).toMap
    assert(re == rows)
  }

  // -------------------------------------------------- contrastive pairs --

  test("contrastive pairs: disjoint 32-token spans, short docs skipped") {
    val long = (1 to 70).map(i => s"t$i").mkString(" ")   // 70 tokens
    // 30 tokens: chunk starts 1, 17 only — no chunk 2, so no pair
    val short = (1 to 30).map(i => s"s$i").mkString(" ")
    val docs = Seq((1L, long), (2L, short)).toDF("doc_id", "text")
    val got = Curation.contrastivePairs(docs, "doc_id", "text").collect()
    assert(got.map(_.getLong(0)).toSet == Set(1L))
    val r = got.head
    assert(r.getString(1) == (1 to 32).map(i => s"t$i").mkString(" "))
    assert(r.getString(2) == (33 to 64).map(i => s"t$i").mkString(" "))
  }

  test("compaction plan: layout-invariant (global order, not partition order)") {
    val files = (1 to 40).map(i => (f"f$i%03d", (i * 7 % 13 + 1) * 10L))
      .toDF("file", "bytes")
    def run(df: org.apache.spark.sql.DataFrame) =
      Compaction.plan(df, "file", "bytes", 100L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(run(files) == run(files.repartition(11)))
  }
}
