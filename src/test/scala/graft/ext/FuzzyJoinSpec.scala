package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class FuzzyJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("blocked fuzzy self-join: in-block matches, contract exclusions") {
    val spark0 = spark
    import spark0.implicits._
    // duplicate rows collapse (value domain); "red wodget" is a typo of
    // "red widget" (dist 1); "blue widget" is dist 1 from "red widget"
    // in the last token but sits in another block → out of scope by
    // the blocking contract; "red bolt" is in-block but too far.
    val df = Seq("red widget", "red widget", "red wodget", "red bolt",
      "blue widget", null.asInstanceOf[String]).toDF("name")
    val out = FuzzyJoin.selfJoin(df, "name", maxDist = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq(("red widget", "red wodget", 1L)))
  }

  test("maxBlock cap drops degenerate blocks observably, keeps the rest") {
    val spark0 = spark
    import spark0.implicits._
    // block "x" holds 4 values (over the cap of 3); block "y" holds 2
    val df = Seq("x aaa", "x aab", "x aba", "x zzz", "y mmm", "y mmn")
      .toDF("name")
    val obs = org.apache.spark.sql.Observation()
    val out = FuzzyJoin.selfJoin(df, "name", maxDist = 2, maxBlock = 3,
        dropObservation = Some(obs))
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(out.toSeq == Seq(("y mmm", "y mmn"))) // x-block fully dropped
    assert(obs.get("dropped_values") == 4L)
    assert(obs.get("max_block_size") == 4L)
  }

  test("pairs are canonical (a < b) and distance-bounded") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq("aaa x", "aab x", "aba x", "zzz x").toDF("name")
    // one block "aaa"? no — block is first token, so each is its own
    // block here; use a shared first token instead
    val df2 = Seq("x aaa", "x aab", "x aba", "x zzz").toDF("name")
    val out = FuzzyJoin.selfJoin(df2, "name", maxDist = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.forall(p => p._1 < p._2 && p._3 <= 2))
    // aaa↔aab (1), aaa↔aba (2), aab↔aba (2); zzz matches nothing
    assert(out.length == 3)
    assert(!out.exists(p => p._1.contains("zzz") || p._2.contains("zzz")))
  }
}
