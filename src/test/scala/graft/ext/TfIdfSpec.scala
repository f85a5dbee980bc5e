package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TfIdfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def docs = {
    val spark0 = spark
    import spark0.implicits._
    Seq(
      (0L, "apple banana cherry date"),
      (1L, "apple banana cherry fig"),     // near-dup of 0
      (2L, "xylophone zebra quartz jolt"), // disjoint vocabulary
      (3L, "apple apple apple banana"),    // tf-skewed
      (4L, "stop stop stop stop")          // would be pruned if common
    ).toDF("doc_id", "text")
  }

  test("postings are unit-normalized and weights follow ln(N/df)") {
    val unit = TfIdf.postings(docs, "doc_id", "text", maxDfFraction = 1.0)
    val norms = unit.groupBy("doc_id").agg(sum(col("u") * col("u")).as("n2"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("n2")).toMap
    norms.values.foreach(n2 => assert(math.abs(n2 - 1.0) < 1e-9))
    // a term in every doc would have idf 0; here 'apple' is in 3 of 5
    val apple = unit.filter(col("term") === "apple" && col("doc_id") === 0L)
      .collect().head.getAs[Double]("u")
    assert(apple > 0.0)
  }

  test("maxDfFraction prunes common terms before the join") {
    val spark0 = spark
    import spark0.implicits._
    val d = Seq(
      (0L, "common rare0"), (1L, "common rare1"), (2L, "common rare2"),
      (3L, "common rare3")).toDF("doc_id", "text")
    val pruned = TfIdf.postings(d, "doc_id", "text", maxDfFraction = 0.5)
    assert(pruned.filter(col("term") === "common").count() == 0)
    assert(pruned.filter(col("term").startsWith("rare")).count() == 4)
    val kept = TfIdf.postings(d, "doc_id", "text", maxDfFraction = 1.0)
    assert(kept.filter(col("term") === "common").count() == 4)
  }

  test("top-1 finds the planted near-duplicate, not the disjoint doc") {
    val unit = TfIdf.postings(docs, "doc_id", "text", maxDfFraction = 1.0)
    val top = TfIdf.topSimilar(unit, Seq(0L)).collect()
    assert(top.length == 1)
    assert(top.head.getAs[Long]("neighbor_id") == 1L,
      s"expected near-dup doc 1, got ${top.head}")
    // idf makes each doc's unique term dominate its norm in a 5-doc
    // corpus, so even a 3-of-4-token overlap lands well under 0.5
    assert(top.head.getAs[Double]("cosine") > 0.2)
  }

  test("disjoint-vocabulary docs never pair (inverted index, not all-pairs)") {
    val unit = TfIdf.postings(docs, "doc_id", "text", maxDfFraction = 1.0)
    val probes = unit.filter(col("doc_id") === 2L)
      .select(col("doc_id").as("probe_id"), col("term"), col("u").as("ua"))
    val corpus = unit.select(col("doc_id").as("neighbor_id"), col("term"),
      col("u").as("ub"))
    val pairs = probes.join(corpus, "term")
      .filter(col("probe_id") =!= col("neighbor_id"))
    assert(pairs.count() == 0)
  }

  test("absolute maxDf cap bounds fan-out but keeps rare-term top-1") {
    val spark0 = spark
    import spark0.implicits._
    // 'mid' is in 6 of 12 docs — passes maxDfFraction = 0.5 exactly, and
    // without a cap pairs every probe with half the corpus; the planted
    // near-dup pair (0, 1) shares the rare terms. maxDf = 2 drops 'mid'
    // (df 6 > 2) while every rare term (df <= 2) survives.
    val d = ((0L, "ra rb rc mid") +: (1L, "ra rb rd mid") +:
      (2 to 5).map(i => (i.toLong, s"u$i mid")) ++:
      (6 to 11).map(i => (i.toLong, s"v$i w$i"))).toDF("doc_id", "text")
    val capped = TfIdf.postings(d, "doc_id", "text",
      maxDfFraction = 0.5, maxDf = 2)
    assert(capped.filter(col("term") === "mid").count() == 0)
    assert(capped.filter(col("term") === "ra").count() == 2)
    val top = TfIdf.topSimilar(capped, Seq(0L)).collect()
    assert(top.length == 1 && top.head.getAs[Long]("neighbor_id") == 1L)
    // and the uncapped default is unchanged: 'mid' survives the fraction
    // prune alone (df 6 = half of 12)
    val uncapped = TfIdf.postings(d, "doc_id", "text", maxDfFraction = 0.5)
    assert(uncapped.filter(col("term") === "mid").count() == 6)
  }

  test("bm25 top-1 finds the planted near-duplicate and scores by formula") {
    val top = TfIdf.bm25TopMatch(docs, "doc_id", "text", Seq(0L))
      .collect()
    assert(top.length == 1)
    assert(top.head.getAs[Long]("neighbor_id") == 1L,
      s"expected near-dup doc 1, got ${top.head}")
    // hand-computed score for the (0, 1) pair: docs share apple/banana/
    // cherry, each with qtf=1, tf=1, dl=4, avgdl=4 → the saturation term
    // is (k1+1)/(1+k1) = 1 per shared term, so score = Σ idf(t) with
    // idf = ln(1 + (5 - df + .5)/(df + .5))
    def idf(dfr: Double) = math.log(1.0 + (5.0 - dfr + 0.5) / (dfr + 0.5))
    val expected = idf(3) + idf(3) + idf(2) // apple df 3, banana df 3, cherry df 2
    assert(math.abs(top.head.getAs[Double]("score")
      - math.rint(expected * 100) / 100) < 1e-9)
  }

  test("bm25 absolute maxDf cap bounds fan-out but keeps rare-term top-1") {
    val spark0 = spark
    import spark0.implicits._
    // same corpus as the postings cap test: 'mid' (df 6 of 12) is the
    // fan-out term the cap must drop; the planted pair (0, 1) rides its
    // rare terms and must stay top-1 under maxDf = 2
    val d = ((0L, "ra rb rc mid") +: (1L, "ra rb rd mid") +:
      (2 to 5).map(i => (i.toLong, s"u$i mid")) ++:
      (6 to 11).map(i => (i.toLong, s"v$i w$i"))).toDF("doc_id", "text")
    val capped = TfIdf.bm25TopMatch(d, "doc_id", "text", Seq(0L),
      maxDfFraction = 0.5, maxDf = 2).collect()
    assert(capped.length == 1 &&
      capped.head.getAs[Long]("neighbor_id") == 1L,
      s"capped BM25 must keep the rare-term near-dup: ${capped.toSeq}")
  }

  test("bm25 length normalization prefers the concise match at equal overlap") {
    val spark0 = spark
    import spark0.implicits._
    // both candidates share exactly the two probe terms once; the long
    // doc pads with unique filler. b = 0.75 penalizes the padded doc's
    // length, so the short one must win; with b = 0 the tie breaks on id
    // (doc 1, the long one) since per-term weights equalize.
    val d = Seq(
      (0L, "alpha beta"),
      (1L, "alpha beta f1 f2 f3 f4 f5 f6"),
      (2L, "alpha beta")).toDF("doc_id", "text")
    val norm = TfIdf.bm25TopMatch(d, "doc_id", "text", Seq(0L)).collect()
    assert(norm.head.getAs[Long]("neighbor_id") == 2L,
      s"length-normalized BM25 must prefer the short doc: ${norm.head}")
    val flat = TfIdf.bm25TopMatch(d, "doc_id", "text", Seq(0L), b = 0.0)
      .collect()
    assert(flat.head.getAs[Long]("neighbor_id") == 1L,
      s"with b=0 the equal scores must tie-break on id: ${flat.head}")
  }
}
