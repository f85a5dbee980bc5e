package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** RFM (recency / frequency / monetary) customer segmentation — the
  * canonical warehouse marketing analysis, built to the repo's
  * exactness discipline.
  *
  * Per customer: recency = days between their last order and the
  * corpus's last order, frequency = order count, monetary = exact
  * centi-unit revenue ([[graft.operators.ExactMoney]] idiom). Each
  * metric is scored 1-4 by its exact interpolated quartiles
  * (score = 1 + [m > q1] + [m > q2] + [m > q3], so 1 is always the
  * "best" quartile bucket for recency and the "smallest" for
  * frequency/monetary — one fixed, documented direction keeps the
  * cross-engine comparison trivial). Output is the segment grid with
  * customer counts and exact revenue totals.
  *
  * Determinism: metrics are integers (days, counts, cents); quartile
  * cutoffs are `percentile(..)` exact linear interpolation — the same
  * definition DuckDB's `quantile_cont` implements, computed from the
  * same sorted integer values, so the cutoffs (and therefore every
  * score) agree bit-for-bit across engines. No ntile: ntile's bucket
  * boundaries depend on a total row order (ties broken arbitrarily) AND
  * force a single-partition global sort — both disqualifying.
  *
  * Scale shape: one custkey-keyed hash aggregate (map-side partials),
  * one 1-row corpus-max aggregate and one 1-row quartile frame, both
  * broadcast — the scores are then a map-only projection and the final
  * segment rollup has at most 64 cells. The exact `percentile` buffers
  * the per-customer metric vector on one reducer; at >10^9 customers
  * swap it for the (lo, hi]-histogram order-statistic cutoffs used by
  * `q_x_ppl_buckets` — the score assignment and everything downstream
  * is unchanged.
  */
object Rfm {

  def segments(
      orders: DataFrame,
      custCol: String,
      dateCol: String,
      amountCol: String): DataFrame = {
    val cust = orders
      .groupBy(col(custCol))
      .agg(
        max(to_date(col(dateCol))).as("last_order"),
        count(lit(1)).as("freq"),
        sum(round(col(amountCol) * 100, 0).cast("long")).as("mon_c"))
    val corpusMax = orders.agg(max(to_date(col(dateCol))).as("corpus_last"))
    val metrics = cust.crossJoin(broadcast(corpusMax))
      .select(col(custCol),
        datediff(col("corpus_last"), col("last_order")).cast("long").as("rec"),
        col("freq"), col("mon_c"))
    val qs = array(lit(0.25), lit(0.5), lit(0.75))
    val cuts = metrics.agg(
      percentile(col("rec"), qs).as("rq"),
      percentile(col("freq"), qs).as("fq"),
      percentile(col("mon_c"), qs).as("mq"))
    def score(m: String, q: String) =
      (lit(1) +
        (col(m) > col(q).getItem(0)).cast("int") +
        (col(m) > col(q).getItem(1)).cast("int") +
        (col(m) > col(q).getItem(2)).cast("int")).cast("long")
    metrics.crossJoin(broadcast(cuts))
      .select(
        score("rec", "rq").as("r_score"),
        score("freq", "fq").as("f_score"),
        score("mon_c", "mq").as("m_score"),
        col("mon_c"))
      .groupBy(col("r_score"), col("f_score"), col("m_score"))
      .agg(
        count(lit(1)).as("n_customers"),
        round(sum(col("mon_c")) / 100.0, 2).as("monetary_total"))
  }
}
