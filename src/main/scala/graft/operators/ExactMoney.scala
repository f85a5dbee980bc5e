package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Order-independent aggregation of fixed-point money/measure columns.
  *
  * `sum(double)` is non-associative: the result's last ulps depend on
  * partition layout and merge order, and once a `round(sum(...), 2)`
  * sits on top, a layout change can flip the rounded output (caught at
  * sf1 by `ScaleSmokeMain xcheck` on the star join and Q8: same rows,
  * different cents). Every money column in the corpus is an exact
  * 2-decimal value (verified against the testdata), so the fix is the
  * `q_tpch_q9_profit` idiom generalized: round each TERM to integer
  * units of 10^scale per row (a pure, layout-independent map), sum the
  * longs (exact, commutative, associative — safe to any corpus size
  * that fits 2⁶³/10^scale units per group), divide once at the end.
  *
  * Oracle SQL mirror: `sum(CAST(round((E) * 100.0) AS BIGINT)) / 100.0`.
  */
object ExactMoney {
  /** Exact fixed-point sum: per-row round to 10^scale units, long sum,
    * scale back. Result is DOUBLE (one exact division of an exact sum). */
  def fixedSum(e: Column, scale: Int = 2): Column = {
    val f = math.pow(10.0, scale)
    sum(round(e * f, 0).cast("long")) / f
  }

  /** Exact fixed-point average with `avg`'s null semantics
    * (sum over 10^scale units / count of NON-NULL terms). */
  def fixedAvg(e: Column, scale: Int = 2): Column = {
    val f = math.pow(10.0, scale)
    sum(round(e * f, 0).cast("long")) / f / count(e)
  }
}
