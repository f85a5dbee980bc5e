package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class DupSpansSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("planted shared span is counted on both docs; unique text is clean") {
    val spark0 = spark
    import spark0.implicits._
    // docs 0 and 1 share the 6-token run "q w e r t y" → with k=5 that is
    // two duplicated 5-grams per doc; doc 2 is all-unique; doc 3 too short
    val d = Seq(
      (0L, "a1 a2 a3 q w e r t y a4 a5"),
      (1L, "b1 b2 q w e r t y b3 b4 b5"),
      (2L, "c1 c2 c3 c4 c5 c6 c7 c8"),
      (3L, "d1 d2 d3")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.dupSpans(d, "doc_id", "text", k = 5)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_grams"), r.getAs[Long]("n_dup_grams")))).toMap
    assert(out(0L) == ((7L, 2L)), s"doc0: ${out(0L)}")
    assert(out(1L) == ((7L, 2L)), s"doc1: ${out(1L)}")
    assert(out(2L) == ((4L, 0L)))
    assert(!out.contains(3L), "docs shorter than k yield no gram rows")
  }

  test("within-doc repeats alone do not mark a gram as duplicated") {
    val spark0 = spark
    import spark0.implicits._
    // doc 0 repeats its own 5-gram twice; no other doc has it
    val d = Seq(
      (0L, "x1 x2 x3 x4 x5 x1 x2 x3 x4 x5"),
      (1L, "y1 y2 y3 y4 y5 y6")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.dupSpans(d, "doc_id", "text", k = 5)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("n_dup_grams")).toMap
    assert(out(0L) == 0L, "self-repeats must not count as cross-doc dups")
    assert(out(1L) == 0L)
  }

  test("dup_ratio is the rounded fraction of duplicated gram positions") {
    val spark0 = spark
    import spark0.implicits._
    val d = Seq(
      (0L, "s1 s2 s3 s4 s5 s6"), // grams: 2, one shared with doc 1
      (1L, "s1 s2 s3 s4 s5 zz")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.dupSpans(d, "doc_id", "text", k = 5)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Double]("dup_ratio")).toMap
    assert(out(0L) == 0.5 && out(1L) == 0.5)
  }
}
