package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Cross-doc exact-substring semantics (Lee et al. 2022 ExactSubstr):
  * planted verbatim spans are found with exact boundaries, within-doc
  * repetition does NOT count, spans chain through overlapping anchors,
  * and docs shorter than k are ignored. */
class SubstringDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def run(docs: Seq[(Long, String)], k: Int = 4) = {
    val spark0 = spark
    import spark0.implicits._
    SubstringDedup.crossDocSpans(docs.toDF("doc_id", "text"),
        "doc_id", "text", k)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toSeq
  }

  test("planted shared span found with exact 1-based boundaries") {
    // docs 1 and 2 share the verbatim 6-token run "p q r s t u";
    // doc 3 is noise sharing nothing 4 tokens long
    val docs = Seq(
      (1L, "a b p q r s t u c d"),
      (2L, "x p q r s t u y z w"),
      (3L, "m n o k l j h g f e"))
    // k=4: doc1 anchors at pos 3..5 covered → span tokens [3, 8]
    //      doc2 anchors at pos 2..4 covered → span tokens [2, 7]
    assert(run(docs) == Seq(
      (1L, 3L, 8L, 6L),
      (2L, 2L, 7L, 6L)))
  }

  test("within-doc repetition alone does not count") {
    // the 4-gram "p q r s" repeats INSIDE doc 1 but no other doc has it
    val docs = Seq(
      (1L, "p q r s m m p q r s"),
      (2L, "a b c d e f g h i j"))
    assert(run(docs) == Seq())
  }

  test("two separate shared regions yield two spans; full-doc dup is one") {
    val docs = Seq(
      // shares "a b c d" (pos 1-4) and "w x y z" (pos 7-10) with doc 2,
      // separated by unshared filler — two spans, not one
      (1L, "a b c d m n w x y z"),
      (2L, "a b c d k l w x y z"),
      // doc 3 = doc 4 verbatim: one whole-doc span each
      (3L, "s t u v q p o r"),
      (4L, "s t u v q p o r"))
    assert(run(docs) == Seq(
      (1L, 1L, 4L, 4L), (1L, 7L, 10L, 4L),
      (2L, 1L, 4L, 4L), (2L, 7L, 10L, 4L),
      (3L, 1L, 8L, 8L), (4L, 1L, 8L, 8L)))
  }

  test("docs shorter than k are ignored; k bounds enforced") {
    val docs = Seq((1L, "a b c"), (2L, "a b c"))
    assert(run(docs, k = 4) == Seq())
    // at k=3 the 3-token docs match whole
    assert(run(docs, k = 3) == Seq((1L, 1L, 3L, 3L), (2L, 1L, 3L, 3L)))
    intercept[IllegalArgumentException] { run(docs, k = 1) }
  }

  test("adjacent-but-not-overlapping anchors chain into one covered run") {
    // doc1/doc2 share tokens 1..8 = two disjoint 4-anchors (pos 1, pos 5)
    // if the interior anchors were NOT shared this would still chain
    // (q − p = 4 ≤ k); here all interior anchors are shared too — either
    // way one maximal span [1, 8]
    val docs = Seq(
      (1L, "a b c d e f g h x1 y1"),
      (2L, "a b c d e f g h x2 y2"))
    assert(run(docs) == Seq((1L, 1L, 8L, 8L), (2L, 1L, 8L, 8L)))
  }
}
