package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Sources

/** Round-5 coverage widening: the relational shapes the parity surface
  * didn't exercise yet (full-outer join, correlated EXISTS / scalar
  * subqueries, sliding window frames) plus two staple corpus-analytics
  * queries (cohort retention, bigram collocations). Every query here is
  * DuckDB-oracle-anchored.
  */
object AnalyticsQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Sources.table(s, dir, name)

  /** FULL OUTER join — both-sides-preserved merge of two aggregates. The
    * only join family missing from the J-series (left/inner/semi/anti/
    * star/salted). At scale this is one shuffle per side on the join key;
    * the aggregates shrink the inputs first (agg-before-join discipline),
    * so the outer join sees |users| rows, not |events|. */
  val fullOuter = Q(
    "q_j6_full_outer",
    "FULL OUTER join of first-half vs second-half monthly user activity",
    (s, dir) => {
      val e = t(s, dir, "events")
      val first = e.filter(dayofmonth(col("ts")) <= 15)
        .groupBy(col("user_id")).agg(count(lit(1)).as("n_first"))
      val second = e.filter(dayofmonth(col("ts")) > 15)
        .groupBy(col("user_id")).agg(count(lit(1)).as("n_second"))
      first.join(second, Seq("user_id"), "full_outer")
    },
    Some("""WITH f AS (SELECT user_id, count(*) AS n_first FROM events
           |   WHERE extract(day FROM ts) <= 15 GROUP BY user_id),
           | s AS (SELECT user_id, count(*) AS n_second FROM events
           |   WHERE extract(day FROM ts) > 15 GROUP BY user_id)
           | SELECT user_id, n_first, n_second FROM f FULL JOIN s USING (user_id)"""
      .stripMargin.replace("\n", "")))

  /** Correlated EXISTS / NOT EXISTS — Catalyst rewrites both into
    * semi/anti joins (RewritePredicateSubquery), so the 100 TB plan is
    * two hash joins, never a per-row subquery loop. Expressed through
    * spark.sql over temp views: predicate subqueries are a SQL-surface
    * feature, and this pins that the SQL front door supports them. */
  val existsSubquery = Q(
    "q_q3_exists",
    "Correlated EXISTS + NOT EXISTS (rewritten to semi/anti joins)",
    (s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("g5_customer")
      t(s, dir, "orders").createOrReplaceTempView("g5_orders")
      s.sql("""SELECT c_custkey, c_name, c_mktsegment
              | FROM g5_customer c
              | WHERE EXISTS (SELECT 1 FROM g5_orders o
              |   WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000)
              |   AND NOT EXISTS (SELECT 1 FROM g5_orders o
              |   WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')"""
        .stripMargin)
    },
    Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer c
           | WHERE EXISTS (SELECT 1 FROM orders o
           |   WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000)
           |   AND NOT EXISTS (SELECT 1 FROM orders o
           |   WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')"""
      .stripMargin.replace("\n", "")))

  /** Scalar subqueries — uncorrelated (global average, computed once and
    * broadcast as a literal) and correlated (per-customer order count,
    * rewritten to a left outer join + aggregate). */
  val scalarSubquery = Q(
    "q_q4_scalar_subquery",
    "Scalar subqueries: global-avg filter + correlated per-row count",
    (s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("g5_customer")
      t(s, dir, "orders").createOrReplaceTempView("g5_orders")
      s.sql("""SELECT c_custkey,
              |   (SELECT count(*) FROM g5_orders o
              |    WHERE o.o_custkey = c.c_custkey) AS n_orders
              | FROM g5_customer c
              | WHERE c_acctbal > (SELECT avg(c_acctbal) FROM g5_customer)"""
        .stripMargin)
    },
    Some("""SELECT c_custkey,
           |   (SELECT count(*) FROM orders o
           |    WHERE o.o_custkey = c.c_custkey) AS n_orders
           | FROM customer c
           | WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)"""
      .stripMargin.replace("\n", "")))

  /** Sliding window frames — ROWS BETWEEN k PRECEDING moving aggregate
    * plus first/last_value with explicit frames (the frame-spec family
    * beyond the unbounded running sums already covered). One (user_id;
    * ts, event_id) shuffle+sort serves all four frames. The moving sum
    * runs over integer milli-units: engines implement sliding frames
    * differently (DuckDB incrementally via segment trees, Spark by frame
    * re-scan), so float accumulation inside a frame is NOT bit-stable —
    * integers are. first/last_value are selections, no accumulation. */
  val movingAvg = Q(
    "q_w_moving_avg",
    "Window frames: 4-row moving sum + count, first/last_value",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val order = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      val sliding = order.rowsBetween(-3, Window.currentRow)
      val whole = order.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      t(s, dir, "events").select(
        col("event_id"), col("user_id"),
        sum(floor(col("value") * 1000).cast("long")).over(sliding)
          .as("moving_milli"),
        count(lit(1)).over(sliding).as("frame_n"),
        round(first_value(col("value")).over(order), 2).as("first_val"),
        round(last_value(col("value")).over(whole), 2).as("last_val"))
    },
    Some("""SELECT event_id, user_id,
           | CAST(sum(CAST(floor(value * 1000) AS BIGINT)) OVER (PARTITION BY user_id ORDER BY ts, event_id
           |   ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS BIGINT) AS moving_milli,
           | CAST(count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
           |   ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS BIGINT) AS frame_n,
           | round(first_value(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 2) AS first_val,
           | round(last_value(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
           |   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2) AS last_val
           | FROM events""".stripMargin.replace("\n", "")))

  /** Cohort retention — the canonical product-analytics matrix: users
    * grouped by first-activity week, counted per subsequent week. Two
    * aggregations over one events scan; the per-user cohort frame is tiny
    * (|users| rows) and rides a shuffle it shares with the activity
    * distinct. Week starts are Monday-aligned in both engines, so the
    * day-difference is exactly divisible by 7. */
  val cohortRetention = Q(
    "q_x_cohort_retention",
    "Cohort retention: users by first-activity week × week offset",
    (s, dir) => {
      val e = t(s, dir, "events")
      val cohort = e.groupBy(col("user_id"))
        .agg(date_trunc("week", min(col("ts"))).as("cohort_week"))
      val active = e.select(col("user_id"),
        date_trunc("week", col("ts")).as("week")).distinct()
      active.join(cohort, Seq("user_id"))
        .groupBy(col("cohort_week"),
          (datediff(to_date(col("week")), to_date(col("cohort_week"))) / 7)
            .cast("long").as("week_offset"))
        .agg(count_distinct(col("user_id")).as("n_users"))
    },
    Some("""WITH cohort AS (SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
           |   FROM events GROUP BY user_id),
           | active AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events)
           | SELECT cohort_week,
           |   CAST(date_diff('day', cohort_week, week) / 7 AS BIGINT) AS week_offset,
           |   count(DISTINCT user_id) AS n_users
           | FROM active JOIN cohort USING (user_id)
           | GROUP BY 1, 2""".stripMargin.replace("\n", "")))

  /** Bigram collocations — adjacent-token pair counts, the first step of
    * phrase mining / collocation scoring. Tokens materialize as a column
    * BEFORE the zip_with (no expensive expression re-evaluated inside the
    * HOF lambda), pairs explode map-side and partially aggregate before
    * the exchange; top-20 via TakeOrderedAndProject. Deterministic total
    * order (n DESC, w1, w2). */
  val collocations = Q(
    "q_x_collocations",
    "Bigram collocations: top-20 adjacent token pairs",
    (s, dir) => {
      val toks = t(s, dir, "documents")
        .select(filter(split(col("text"), " ", -1), x => x =!= "").as("toks"))
        .filter(size(col("toks")) >= 2)
      toks
        .select(explode(zip_with(
          slice(col("toks"), lit(1), size(col("toks")) - 1),
          slice(col("toks"), lit(2), size(col("toks")) - 1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
        .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
        .groupBy(col("w1"), col("w2"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("w1"), col("w2"))
        .limit(20)
    },
    Some("""WITH t AS (SELECT list_filter(string_split(text, ' '), x -> x <> '') AS toks
           |   FROM documents),
           | b AS (SELECT toks[i] AS w1, toks[i + 1] AS w2
           |   FROM t, UNNEST(generate_series(1, len(toks) - 1)) AS u(i)
           |   WHERE len(toks) >= 2)
           | SELECT w1, w2, count(*) AS n FROM b GROUP BY w1, w2
           | ORDER BY n DESC, w1, w2 LIMIT 20"""
      .stripMargin.replace("\n", "")))

  val all: Seq[Q] = Seq(fullOuter, existsSubquery, scalarSubquery,
    movingAvg, cohortRetention, collocations)
}
