package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Unit pins for the length-guard optimizer rule, applied directly to
  * optimized plans (the shared test JVM cannot install session
  * extensions — that path runs in tools.ExtensionsCheckMain's own JVM).
  */
class EditDistancePrefilterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

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
      .queryExecution.optimizedPlan
    val out = EditDistancePrefilter(plan)
    val s = out.toString
    assert(s.contains("abs((length(") && s.contains("levenshtein"),
      s"expected length guard in:\n$s")
    // guard comes FIRST in the conjunction (short-circuit order)
    assert(s.indexOf("abs((length") < s.indexOf("levenshtein"))
  }

  test("idempotent: reapplication adds nothing") {
    val plan = fixture.filter(levenshtein(col("a"), col("b")) < 3)
      .queryExecution.optimizedPlan
    val once = EditDistancePrefilter(plan)
    val twice = EditDistancePrefilter(once)
    assert(once.toString == twice.toString)
  }

  test("thresholded levenshtein is NOT rewritten (unsound: -1 sentinel)") {
    fixture.createOrReplaceTempView("edp_fixture")
    val plan = spark.sql(
      "SELECT * FROM edp_fixture WHERE levenshtein(a, b, 5) <= 2")
      .queryExecution.optimizedPlan
    // the filter survived (parquet-backed), but the rule must not touch it
    assert(plan.toString.contains("levenshtein"))
    val out = EditDistancePrefilter(plan)
    assert(!out.toString.contains("abs((length"), out.toString)
  }

  test("nondeterministic operands are NOT rewritten (guard would re-draw)") {
    fixture.createOrReplaceTempView("edp_fixture")
    val plan = spark.sql(
      """SELECT * FROM edp_fixture
        | WHERE levenshtein(substr(a, 1, cast(rand() * 3 as int) + 1), b) <= 2"""
        .stripMargin)
      .queryExecution.optimizedPlan
    assert(plan.toString.contains("levenshtein"))
    val out = EditDistancePrefilter(plan)
    assert(!out.toString.contains("abs((length"), out.toString)
  }

  test("semantics preserved on the fuzzy-join shape") {
    val q = graft.operators.Catalog.byName("q_x_fuzzy_join")
    val df = q.run(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.optimizedPlan
    val rewritten = EditDistancePrefilter(plan)
    assert(rewritten.toString.contains("abs((length"), rewritten.toString)
    // executing the rewritten plan yields the identical row set
    val viaRule = spark.sessionState.executePlan(rewritten)
      .executedPlan.executeCollectPublic()
      .map(_.toSeq.toVector).sortBy(_.toString)
    val plain = df.collect().map(_.toSeq.toVector).sortBy(_.toString)
    assert(viaRule.toSeq == plain.toSeq)
  }
}
