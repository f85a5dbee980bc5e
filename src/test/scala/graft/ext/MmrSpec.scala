package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** MMR semantics (Carbonell & Goldstein 1998): the first pick is pure
  * relevance, later picks trade relevance against max-similarity to what
  * was already selected, scores are the exact documented longs
  * (λmilli·rel − (1000−λmilli)·maxSim over deci-milli-quantized dot
  * products), ties break by id, and λ=1000 degenerates to the relevance
  * ranking. */
class MmrSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // Probe 0 at e1. A (id 1) and B (id 2) are near-duplicates with the
  // highest (tied) relevance; C (id 3) is moderately relevant but nearly
  // orthogonal to A/B. Hand-computed quantized dots:
  //   rel(A)=rel(B)=80e6, rel(C)=70e6
  //   sim(A,B)=99.4e6, sim(A,C)=14e6, sim(B,C)=14.7e6
  private def emb = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (1L, Array(0.8f, 0.6f, 0.0f, 0.0f)),
    (2L, Array(0.8f, 0.59f, 0.01f, 0.0f)),
    (3L, Array(0.7f, -0.7f, 0.0f, 0.0f)))
    .toDF("vec_id", "embedding")

  test("diversity reorders near-duplicate runners-up; scores exact") {
    val got = Mmr.mmrRerank(emb, Seq(0L), topEach = 3, k = 3,
        lambdaMilli = 700)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    // rank 1: A by relevance (tie with B broken by id asc), score 700·80e6
    // rank 2: C — B's 99.4e6 similarity to A costs it 29.82e9, C wins
    // rank 3: B with the same penalized score
    assert(got.toSeq == Seq(
      (1L, 1L, 56000000000L),
      (2L, 3L, 44800000000L),
      (3L, 2L, 26180000000L)), got.mkString(","))
  }

  test("lambda=1000 is the pure relevance ranking") {
    val got = Mmr.mmrRerank(emb, Seq(0L), topEach = 3, k = 3,
        lambdaMilli = 1000)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, 1L, 80000000000L),
      (2L, 2L, 80000000000L),
      (3L, 3L, 70000000000L)), got.mkString(","))
  }

  test("testdata shape: k distinct picks per probe, ranks dense") {
    val df = Mmr.mmrRerank(
      graft.sources.Sources.table(spark, "/root/testdata/sf0.001",
        "embeddings"), (0L until 4L).toSeq, topEach = 8, k = 3)
    val rows = df.collect()
    assert(rows.length == 4 * 3)
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getLong(1)).sorted.toSeq == Seq(1L, 2L, 3L))
      assert(rs.map(_.getLong(2)).distinct.length == 3)
    }
  }

  test("fewer candidates than k yields the shorter honest list") {
    // corpus has only 2 non-probe vectors; k=3 must yield 2 ranked rows,
    // not a third null-id row
    val tiny = emb.filter("vec_id <= 2")
    val got = Mmr.mmrRerank(tiny, Seq(0L), topEach = 3, k = 3,
        lambdaMilli = 700)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(got.length == 2, got.mkString(","))
    assert(got.map(_._1).toSeq == Seq(1L, 2L))
    assert(got.forall(_._2 > 0L))
  }

  test("a 1-candidate pool emits its single honest row, not zero") {
    // corpus has ONE non-probe vector: the pairwise ca =!= cb self-join is
    // empty, so the sims aggregate has no row for the probe — the packed
    // join must not drop the probe (left join + empty-array default)
    val tiny = emb.filter("vec_id <= 1")
    val got = Mmr.mmrRerank(tiny, Seq(0L), topEach = 3, k = 3,
        lambdaMilli = 700)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // rank 1 = pure relevance: 700 · 80e6
    assert(got.toSeq == Seq((0L, 1L, 1L, 56000000000L)), got.mkString(","))
  }

  test("bounds enforced at the API boundary") {
    intercept[IllegalArgumentException] {
      Mmr.mmrRerank(emb, Seq(0L), topEach = 65)
    }
    intercept[IllegalArgumentException] {
      Mmr.mmrRerank(emb, Seq(0L), topEach = 4, k = 5)
    }
    intercept[IllegalArgumentException] {
      Mmr.mmrRerank(emb, Seq(0L), lambdaMilli = 1001)
    }
  }
}
