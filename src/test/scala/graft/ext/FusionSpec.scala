package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** RRF semantics (Cormack et al. 2009): consensus mid-ranks beat a single
  * list's head, scores are the exact integer Σ⌊10⁶/(k+r)⌋ (associative —
  * layout cannot change them), ties break by item id, and items absent
  * from a list simply contribute nothing. */
class FusionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // Two lists over one query: item 7 is mid-rank in BOTH lists; items 1
  // and 2 top one list each but miss the other. The RRF property under
  // test: consensus beats single-list excellence.
  private val rankings = Seq(
    (0L, 1L, 1L), (0L, 7L, 2L), (0L, 3L, 3L),   // list A
    (0L, 2L, 1L), (0L, 7L, 3L), (0L, 4L, 2L))   // list B
    .toDF("query_id", "item", "rank")

  private def micros(ranks: Seq[Long], k: Long = 60L): Long =
    ranks.map(r => 1000000L / (k + r)).sum

  test("consensus mid-rank item fuses above single-list heads") {
    val got = Fusion.reciprocalRankFusion(rankings, "query_id", "item",
        "rank", kRrf = 60, topN = 10)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    // exact integer scores
    assert(got.find(_._2 == 7L).get._3 == micros(Seq(2L, 3L)))
    assert(got.find(_._2 == 1L).get._3 == micros(Seq(1L)))
    // 7 (2 lists) outranks 1 and 2 (1 list each, rank 1)
    assert(got.head._2 == 7L, s"expected item 7 first, got ${got.head}")
    assert(got.find(_._2 == 7L).get._4 == 2L) // n_lists
    assert(got.find(_._2 == 1L).get._4 == 1L)
    // ranks 1..5, dense
    assert(got.map(_._1).toSeq == (1L to 5L))
  }

  test("equal scores break ties by item ascending") {
    // items 10 and 11 both rank 2 in one list each -> equal rrf_micros
    val r = Seq((0L, 10L, 2L), (0L, 11L, 2L)).toDF("query_id", "item", "rank")
    val got = Fusion.reciprocalRankFusion(r, "query_id", "item", "rank")
      .collect().map(x => (x.getLong(1), x.getLong(2))).sortBy(_._1)
    assert(got.toSeq == Seq((1L, 10L), (2L, 11L)))
  }

  test("topN bounds the fused output per query") {
    val r = (1L to 30L).map(i => (0L, i, i)).toDF("query_id", "item", "rank")
    val got = Fusion.reciprocalRankFusion(r, "query_id", "item", "rank",
      topN = 5)
    assert(got.count() == 5L)
  }

  test("int item ids are widened to long at the boundary (no deep " +
       "ClassCastException)") {
    val r = Seq((0, 10, 1), (0, 11, 2), (0, 10, 2))
      .toDF("query_id", "item", "rank") // all IntegerType
    val got = Fusion.reciprocalRankFusion(r, "query_id", "item", "rank")
      .collect().map(x => (x.getLong(1), x.getLong(2))).sortBy(_._1)
    assert(got.head._2 == 10L) // consensus item first, as with longs
  }

  test("non-integral item column fails at the API boundary") {
    val r = Seq((0L, "a", 1L), (0L, "b", 2L))
      .toDF("query_id", "item", "rank")
    val e = intercept[IllegalArgumentException](
      Fusion.reciprocalRankFusion(r, "query_id", "item", "rank"))
    assert(e.getMessage.contains("item"))
    assert(e.getMessage.contains("integral"))
  }

  test("scores are layout-invariant (exact integer sum)") {
    val base = (1L to 200L).flatMap(i =>
      Seq((i % 7, i, (i % 19) + 1), (i % 7, i, (i % 13) + 1)))
      .toDF("query_id", "item", "rank")
    def runOn(df: org.apache.spark.sql.DataFrame) =
      Fusion.reciprocalRankFusion(df, "query_id", "item", "rank")
        .collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(runOn(base.repartition(13)) == runOn(base.repartition(1)))
  }
}
