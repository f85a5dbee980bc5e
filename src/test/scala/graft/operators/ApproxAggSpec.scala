package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Accuracy pins for the approximate aggregates whose values are
  * engine-specific (rows-only under the driver's DuckDB oracle):
  * the at-scale variants must track their exact anchors.
  *
  *  - q_a7b_percentile_approx vs q_a7_percentile: with accuracy = 1000 the
  *    sketch's RANK error is ≤ n/1000 per group; on this data that bounds
  *    the VALUE error well inside 5% relative (prices are spread smoothly).
  *  - q_a6_approx_distinct vs q_a5_count_distinct: HLL++ at rsd = 0.02 —
  *    assert within 3σ (6%) of the exact distinct count.
  */
class ApproxAggSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.01"

  private def byFlag(q: Q, valueCols: Seq[String]): Map[String, Seq[Double]] =
    q.run(spark, sfDir).collect().map { r =>
      r.getString(r.fieldIndex("l_returnflag")) ->
        valueCols.map(c => r.getDouble(r.fieldIndex(c)))
    }.toMap

  test("percentile_approx tracks exact percentiles within 5% per group") {
    val cols = Seq("p25", "p50", "p75")
    val exact = byFlag(Catalog.byName("q_a7_percentile"), cols)
    val approx = byFlag(Catalog.byName("q_a7b_percentile_approx"), cols)
    assert(approx.keySet == exact.keySet)
    for ((flag, ex) <- exact; (e, a) <- ex.zip(approx(flag))) {
      assert(math.abs(a - e) / e <= 0.05,
        s"flag=$flag exact=$e approx=$a off by ${math.abs(a - e) / e}")
    }
  }

  test("approx_count_distinct within 3*rsd of exact per group") {
    val exact = Catalog.byName("q_a5_count_distinct").run(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(r.fieldIndex("n_parts"))).toMap
    val approx = Catalog.byName("q_a6_approx_distinct").run(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(r.fieldIndex("approx_parts"))).toMap
    assert(approx.keySet == exact.keySet)
    for ((flag, n) <- exact) {
      val a = approx(flag)
      assert(math.abs(a - n).toDouble / n <= 0.06,
        s"flag=$flag exact=$n approx=$a")
    }
  }
}
