package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TextRankSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("cooccurrenceEdges: symmetrized, self-loops dropped, counts summed") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq("a b a b", "b b c").toDF("text")
    // bigrams: (a,b)x2, (b,a)x1, (b,b) self-drop, (b,c)x1
    val e = TextRank.cooccurrenceEdges(df, "text")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(e == Set(("a", "b", 3L), ("b", "a", 3L),
      ("b", "c", 1L), ("c", "b", 1L)))
  }

  test("wordRanks: total mass 1, symmetry, hubs outrank leaves") {
    val spark0 = spark
    import spark0.implicits._
    // star graph: hub h adjacent to x/y/z (each doc one bigram)
    val df = Seq("h x", "h y", "h z").toDF("text")
    val r = TextRank.wordRanks(df, "text")
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    // damped PageRank with no dangling mass conserves Σr = 1
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
    // x, y, z are exchangeable — identical ranks
    assert(r("x") == r("y") && r("y") == r("z"))
    // the hub concentrates rank
    assert(r("h") > r("x") * 2)
  }

  test("triangleCounts: exact census on a known graph") {
    val spark0 = spark
    import spark0.implicits._
    // triangle {a,b,c} plus pendant edge c-d: one triangle, d untouched
    val df = Seq("a b", "b c", "a c", "c d").toDF("text")
    val got = TextRank.triangleCounts(df, "text", 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 1L, "b" -> 1L, "c" -> 1L))
    // K4: binom(4,3)=4 triangles, every node in exactly 3
    val k4 = Seq("a b", "b c", "c d", "a c", "a d", "b d").toDF("text")
    val g4 = TextRank.triangleCounts(k4, "text", 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(g4 == Map("a" -> 3L, "b" -> 3L, "c" -> 3L, "d" -> 3L))
  }

  test("topKeywords: deterministic under physical layout") {
    val spark0 = spark
    import spark0.implicits._
    val docs = (0 until 200)
      .map(i => s"w${i % 7} w${i % 5} w${i % 3} w${i % 11}").toDF("text")
    val a = TextRank.topKeywords(docs, "text", 10).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq
    val b = TextRank.topKeywords(docs.repartition(13), "text", 10)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(a == b)
    assert(a.length == 10)
    // ordered on the rounded score, word tie-break
    assert(a == a.sortBy { case (w, s) => (-s, w) })
  }
}
