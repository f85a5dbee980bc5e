package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Unit pins for the length-guard optimizer rule. The shared test session
  * (GraftSession.builder) installs GraftExtensions, so `optimizedPlan`
  * ALREADY carries the session-applied guard — the rule-in-isolation
  * tests therefore apply EditDistancePrefilter to the ANALYZED plan
  * (pre-optimizer, guard provably absent first), and one test asserts
  * the session installation itself.
  */
class EditDistancePrefilterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val Guard = "abs((length"

  /** Parquet-backed two-string frame — a local Seq.toDF would be
    * constant-folded into a LocalRelation (ConvertToLocalRelation) and
    * leave no Filter node for the rule to match. */
  private def fixture = {
    val p = graft.sources.Sources
      .table(spark, "/root/testdata/sf0.001", "part")
    p.select(col("p_name").as("a"), reverse(col("p_name")).as("b"))
  }

  test("adds the length guard ahead of a bounded levenshtein filter") {
    val plan = fixture.filter(levenshtein(col("a"), col("b")) <= 2)
      .queryExecution.analyzed
    assert(!plan.toString.contains(Guard)) // absent BEFORE the rule
    val s = EditDistancePrefilter(plan).toString
    assert(s.contains(Guard) && s.contains("levenshtein"),
      s"expected length guard in:\n$s")
    // guard comes FIRST in the conjunction (short-circuit order)
    assert(s.indexOf(Guard) < s.indexOf("levenshtein"))
  }

  test("session-installed: optimizedPlan is guarded with no manual apply") {
    val s = fixture.filter(levenshtein(col("a"), col("b")) <= 2)
      .queryExecution.optimizedPlan.toString
    assert(s.contains(Guard), s"GraftExtensions did not inject the rule:\n$s")
  }

  test("idempotent: reapplication adds nothing") {
    val plan = fixture.filter(levenshtein(col("a"), col("b")) < 3)
      .queryExecution.analyzed
    val once = EditDistancePrefilter(plan)
    val twice = EditDistancePrefilter(once)
    assert(once.toString.contains(Guard))
    assert(once.toString == twice.toString)
  }

  test("thresholded levenshtein is NOT rewritten (unsound: -1 sentinel)") {
    fixture.createOrReplaceTempView("edp_fixture")
    val plan = spark.sql(
      "SELECT * FROM edp_fixture WHERE levenshtein(a, b, 5) <= 2")
      .queryExecution.optimizedPlan // session rule ran; must not have fired
    assert(plan.toString.contains("levenshtein"))
    assert(!plan.toString.contains(Guard), plan.toString)
    assert(!EditDistancePrefilter(plan).toString.contains(Guard))
  }

  test("nondeterministic operands are NOT rewritten (guard would re-draw)") {
    fixture.createOrReplaceTempView("edp_fixture")
    val plan = spark.sql(
      """SELECT * FROM edp_fixture
        | WHERE levenshtein(substr(a, 1, cast(rand() * 3 as int) + 1), b) <= 2"""
        .stripMargin)
      .queryExecution.optimizedPlan
    assert(plan.toString.contains("levenshtein"))
    assert(!plan.toString.contains(Guard), plan.toString)
    assert(!EditDistancePrefilter(plan).toString.contains(Guard))
  }

  test("semantics preserved on the fuzzy-join shape") {
    // the guarded (session-optimized) execution must match the DuckDB
    // oracle's guard-free result — proven by the q_x_fuzzy_join oracle
    // hash; here: the guard is present in the Join home, and executing
    // the guarded plan equals re-running the analyzed (pre-guard) plan
    val q = graft.operators.Catalog.byName("q_x_fuzzy_join")
    val df = q.run(spark, "/root/testdata/sf0.001")
    val optimized = df.queryExecution.optimizedPlan
    assert(optimized.toString.contains(Guard), optimized.toString)
    val viaGuarded = df.collect().map(_.toSeq.toVector).sortBy(_.toString)
    // manual apply on the analyzed plan, then execute — same rows
    val manual = EditDistancePrefilter(df.queryExecution.analyzed)
    val viaManual = spark.sessionState.executePlan(manual)
      .executedPlan.executeCollectPublic()
      .map(_.toSeq.toVector).sortBy(_.toString)
    assert(viaGuarded.toSeq == viaManual.toSeq)
  }
}
