package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The profiling metrics must count exactly, and the quality checks must
  * DETECT: the gate corpus is clean by construction, so violations are
  * planted here — orphan FKs, duplicated keys, out-of-range and NULL
  * values — and the audit rows must count them precisely. */
class ProfileSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def metric(df: org.apache.spark.sql.DataFrame,
                     c: String, m: String): Double =
    df.filter(col("col_name") === c && col("metric") === m)
      .head().getAs[Double]("value")

  test("profile: counts, nulls, completeness, distinct, length moments") {
    val df = Seq(
      (1L, Option("aa"), Option(10.0)),
      (2L, Option("bbbb"), None),
      (3L, None, Option(30.0)),
      (4L, Option("aa"), Option(20.0))
    ).toDF("id", "s", "v")
    val p = Profile.profile(df, numericCols = Seq("id", "v"),
      stringCols = Seq("s")).cache()
    assert(metric(p, "id", "count") == 4.0)
    assert(metric(p, "id", "nulls") == 0.0)
    assert(metric(p, "id", "distinct") == 4.0)
    assert(metric(p, "id", "mean") == 2.5)
    assert(metric(p, "v", "count") == 3.0)
    assert(metric(p, "v", "nulls") == 1.0)
    assert(metric(p, "v", "completeness") == 0.75)
    assert(metric(p, "v", "min") == 10.0)
    assert(metric(p, "v", "max") == 30.0)
    assert(metric(p, "v", "mean") == 20.0)
    assert(metric(p, "s", "count") == 3.0)
    assert(metric(p, "s", "distinct") == 2.0)
    assert(metric(p, "s", "min_len") == 2.0)
    assert(metric(p, "s", "max_len") == 4.0)
    // (2 + 4 + 2) / 3
    assert(metric(p, "s", "avg_len") == 2.666667)
    // 2 numeric + 1 string column, 7 metrics each
    assert(p.count() == 21)
    p.unpersist()
  }

  test("fkCheck: orphans counted, including NULL child keys") {
    val child = Seq(Option(1L), Option(2L), Option(99L), None)
      .toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val r = Profile.fkCheck("fk", child, "fk", parent, "pk").head()
    assert(r.getAs[Long]("n_checked") == 4L)
    assert(r.getAs[Long]("n_violations") == 2L) // 99 and NULL
  }

  test("uniqueCheck: every row of a duplicated key is a violation") {
    val df = Seq(1L, 2L, 2L, 3L, 3L, 3L).toDF("k")
    val r = Profile.uniqueCheck("uk", df, Seq("k")).head()
    assert(r.getAs[Long]("n_checked") == 6L)
    assert(r.getAs[Long]("n_violations") == 5L) // 2x2 + 3x3
  }

  test("predicateCheck: NULL predicate counts as a violation") {
    val df = Seq(Option(5.0), Option(500.0), None).toDF("v")
    val r = Profile.predicateCheck("range", df,
      col("v").between(0, 100)).head()
    assert(r.getAs[Long]("n_checked") == 3L)
    assert(r.getAs[Long]("n_violations") == 2L) // 500 and NULL
  }

  test("fdCheck: rows of violating determinant groups counted; held FD clean") {
    val df = Seq(
      (1L, "a"), (1L, "a"),          // det 1 → {a}: holds
      (2L, "a"), (2L, "b"), (2L, "b"), // det 2 → {a,b}: 3 rows implicated
      (3L, "c")
    ).toDF("det", "dep")
    val bad = Profile.fdCheck("fd", df, "det", "dep").head()
    assert(bad.getAs[Long]("n_checked") == 6L)
    assert(bad.getAs[Long]("n_violations") == 3L)
    val held = Profile.fdCheck("fd2", df.filter(col("det") =!= 2L),
      "det", "dep").head()
    assert(held.getAs[Long]("n_violations") == 0L)
  }

  test("keySkew: exact hot-key share and multiplier, NULL keys grouped") {
    val df = Seq(Option("a"), Option("a"), Option("a"), Option("b"), None)
      .toDF("k")
    val r = Profile.keySkew("t.k", df, "k").head()
    assert(r.getAs[Long]("n_rows") == 5L)
    assert(r.getAs[Long]("n_keys") == 3L) // a, b, NULL
    assert(r.getAs[Long]("max_key_n") == 3L)
    assert(r.getAs[Double]("top_share") == 0.6)
    assert(r.getAs[Double]("skew_ratio") == 1.8) // 3 * 3 / 5
  }

  test("shared-scan forms equal their originals on planted violations") {
    // r14 scan-sharing rewrite of q_x_quality_checks: the folded forms
    // must emit byte-identical audit rows to the originals.
    val child = Seq(Option(1L), Option(2L), Option(99L), None).toDF("fk")
    val parent = Seq(1L, 1L, 2L, 3L).toDF("pk") // dup key 1
    val counts = Profile.keyCounts(parent, Seq("pk"))
    // fkCheckKeys over keyCounts == fkCheck over the raw parent
    val a = Profile.fkCheckKeys("fk", child, "fk", counts, "pk").head()
    val b = Profile.fkCheck("fk", child, "fk", parent, "pk").head()
    assert(a == b)
    // uniqueCheckFromCounts == uniqueCheck
    val c = Profile.uniqueCheckFromCounts("u", counts).head()
    val d = Profile.uniqueCheck("u", parent, Seq("pk")).head()
    assert(c == d)
    // predicateChecks == N × predicateCheck (NULL predicate = violation)
    val df = Seq(Option(5.0), Option(-1.0), None).toDF("v")
    val folded = Profile.predicateChecks(df, Seq(
        "pos" -> (col("v") > 0), "small" -> (col("v") < 4)))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val sep = Seq(
      Profile.predicateCheck("pos", df, col("v") > 0),
      Profile.predicateCheck("small", df, col("v") < 4))
      .map(_.head()).map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(folded == sep)
  }

  test("gate audit over sf0.001 is clean: zero violations on every check") {
    val q = graft.operators.Catalog.byName("q_x_quality_checks")
    val rows = q.run(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 8)
    assert(rows.forall(_.getAs[Long]("n_violations") == 0L))
    assert(rows.forall(_.getAs[Long]("n_checked") > 0L))
  }
}
