package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Sources

/** Second wave of TPC-H-shaped headline queries (Q4/Q10/Q12/Q14/Q16/Q19/Q22
  * analogues), adapted to the driver testdata's column subset (no
  * l_commitdate/l_shipmode/p_container/c_phone — each query keeps its
  * classic PLAN SHAPE with stand-in columns).
  *
  * Like the first wave in [[ParityQueries]], every query is written for the
  * 1000-executor shape: selective predicates push into the parquet scan,
  * dimension tables broadcast, aggregation happens before joins where the
  * semantics allow, and the only wide exchanges are fact-to-fact spines.
  */
object TpchQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Sources.table(s, dir, name)

  private def ts(v: String) = lit(java.sql.Timestamp.valueOf(v))

  /** TPC-H Q4 shape — "order priority checking": an EXISTS semi-join whose
    * correlated predicate is a NON-EQUI comparison across the two tables
    * (classically l_commitdate < l_receiptdate; here l_shipdate >
    * o_orderdate, i.e. "shipped after it was ordered"). The quarter filter
    * pushes to the orders scan; the semi-join dedups lineitem matches
    * without materializing them. */
  val orderPriority = Q(
    "q_tpch_q4_priority",
    "TPC-H Q4-style order-priority check (EXISTS with non-equi correlation)",
    (s, dir) => {
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= ts("1997-01-01 00:00:00") &&
          col("o_orderdate") < ts("1997-04-01 00:00:00"))
      val l = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_shipdate"))
      o.join(l,
          o("o_orderkey") === l("l_orderkey") &&
            l("l_shipdate") > o("o_orderdate"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
    },
    Some("""SELECT o_orderpriority, count(*) AS order_count
           | FROM orders
           | WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
           |   AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
           |   AND EXISTS (SELECT 1 FROM lineitem
           |     WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
           | GROUP BY o_orderpriority""".stripMargin.replace("\n", "")))

  /** TPC-H Q10 shape — "returned item reporting": one quarter of orders,
    * returned lineitems only, revenue per customer, top 20. The fact spine
    * (lineitem⋈orders) shuffles once on orderkey; customer and nation ride
    * in as broadcasts; the top-k is TakeOrderedAndProject, never a global
    * sort. */
  val returnedItems = Q(
    "q_tpch_q10_returns",
    "TPC-H Q10-style returned-item revenue per customer (top 20)",
    (s, dir) => {
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= ts("1997-07-01 00:00:00") &&
          col("o_orderdate") < ts("1997-10-01 00:00:00"))
        .select(col("o_orderkey"), col("o_custkey"))
      val l = t(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      val c = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
          col("c_nationkey"))
      val n = t(s, dir, "nation").select(col("n_nationkey"), col("n_name"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"),
          round(col("c_acctbal"), 2).as("c_acctbal"), col("n_name"))
        .agg(ExactMoney.fixedSum(
            col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey").asc)
        .limit(20)
    },
    Some("""SELECT c_custkey, c_name, round(c_acctbal, 2) AS c_acctbal, n_name,
           | sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0)
           |   AS BIGINT)) / 100.0e0 AS revenue
           | FROM lineitem
           | JOIN orders ON l_orderkey = o_orderkey
           | JOIN customer ON o_custkey = c_custkey
           | JOIN nation ON c_nationkey = n_nationkey
           | WHERE l_returnflag = 'R'
           |   AND o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
           |   AND o_orderdate < TIMESTAMP '1997-10-01 00:00:00'
           | GROUP BY c_custkey, c_name, round(c_acctbal, 2), n_name
           | ORDER BY revenue DESC, c_custkey LIMIT 20"""
      .stripMargin.replace("\n", "")),
    headline = true)

  /** TPC-H Q12 shape — "shipping modes and order priority": CASE-inside-SUM
    * aggregation over the lineitem⋈orders join (l_returnflag stands in for
    * l_shipmode as the group key). The year filter pushes to the lineitem
    * scan; the CASE branches fold into the partial aggregate, so the
    * exchange carries two longs per group. */
  val shipmodePriority = Q(
    "q_tpch_q12_shipmode",
    "TPC-H Q12-style priority counts per group (CASE-in-aggregate)",
    (s, dir) => {
      val l = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= ts("1998-01-01 00:00:00") &&
          col("l_shipdate") < ts("1999-01-01 00:00:00"))
        .select(col("l_orderkey"), col("l_returnflag"))
      val o = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"))
      val isHigh = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(
          sum(when(isHigh, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(isHigh, 0L).otherwise(1L)).as("low_line_count"))
    },
    Some("""SELECT l_returnflag,
           | CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
           |   THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           | CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
           |   THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
           | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           | WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
           |   AND l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
           | GROUP BY l_returnflag""".stripMargin.replace("\n", "")))

  /** TPC-H Q14 shape — "promotion effect": conditional-revenue ratio over
    * one month of lineitem joined to a broadcast part dim. Both component
    * sums are emitted rounded, and the percentage is derived FROM the
    * rounded sums so both engines divide identical 2-dp values (a ratio of
    * raw doubles could straddle a rounding boundary across engines). */
  val promoEffect = Q(
    "q_tpch_q14_promo",
    "TPC-H Q14-style promotion revenue share (conditional aggregate ratio)",
    (s, dir) => {
      val l = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= ts("1998-03-01 00:00:00") &&
          col("l_shipdate") < ts("1998-04-01 00:00:00"))
        .select(col("l_partkey"), col("l_extendedprice"), col("l_discount"))
      val p = t(s, dir, "part").select(col("p_partkey"), col("p_type"))
      val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .agg(
          (sum(when(col("p_type") === "PROMO",
            round(rev * 100.0, 0).cast("long")).otherwise(0L)) / 100.0)
            .as("promo_revenue"),
          ExactMoney.fixedSum(rev).as("total_revenue"))
        .select(col("promo_revenue"), col("total_revenue"),
          round(lit(100.0) * col("promo_revenue") / col("total_revenue"), 2)
            .as("promo_pct"))
    },
    Some("""WITH a AS (SELECT
           |   sum(CASE WHEN p_type = 'PROMO'
           |     THEN CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0)
           |       AS BIGINT) ELSE 0 END) / 100.0e0 AS promo_revenue,
           |   sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0)
           |     AS BIGINT)) / 100.0e0 AS total_revenue
           | FROM lineitem JOIN part ON l_partkey = p_partkey
           | WHERE l_shipdate >= TIMESTAMP '1998-03-01 00:00:00'
           |   AND l_shipdate < TIMESTAMP '1998-04-01 00:00:00')
           | SELECT promo_revenue, total_revenue,
           |   round(100.0 * promo_revenue / total_revenue, 2) AS promo_pct
           | FROM a""".stripMargin.replace("\n", "")))

  /** TPC-H Q16 shape — "parts/supplier relationship": the partsupp table
    * doesn't exist in the testdata, so it is DERIVED as the distinct
    * (l_partkey, l_suppkey) pairs actually observed in lineitem — an
    * aggregate-before-join that collapses the fact table to the pair set
    * BEFORE touching the part dim. Exclusion predicates (NOT =, NOT IN)
    * ride the broadcast part join; COUNT(DISTINCT suppkey) per
    * (brand, type, size) is the final exchange. */
  val supplierRelationship = Q(
    "q_tpch_q16_supplier_cnt",
    "TPC-H Q16-style supplier counts per part attribute (derived partsupp)",
    (s, dir) => {
      // r13 (guide §2.3, shuffle fewer bytes): the old shape ran a
      // DISTINCT exchange over every (l_partkey, l_suppkey) pair BEFORE
      // the selective part join. countDistinct(l_suppkey) already
      // dedupes suppliers within each group, so the pre-distinct was
      // pure cost — join the (broadcast) filtered part dim first and let
      // the single grouped count-distinct aggregate do the dedup; the
      // only exchange now carries the ~16%-selectivity post-join rows.
      val p = t(s, dir, "part")
        .filter(col("p_brand") =!= "Brand#4" &&
          col("p_type") =!= "PROMO" &&
          col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))
        .select(col("p_partkey"), col("p_brand"), col("p_type"),
          col("p_size"))
      t(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey"))
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_type"),
          col("p_size").cast("long").as("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
    },
    Some("""SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
           | count(DISTINCT l_suppkey) AS supplier_cnt
           | FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
           | JOIN part ON l_partkey = p_partkey
           | WHERE p_brand <> 'Brand#4' AND p_type <> 'PROMO'
           |   AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
           | GROUP BY p_brand, p_type, p_size"""
      .stripMargin.replace("\n", "")))

  /** TPC-H Q19 shape — "discounted revenue": a DISJUNCTION of conjunctive
    * brand/size/quantity groups over lineitem⋈part. The per-table halves of
    * each OR-branch (p_size lower bound, l_quantity envelope) are pushable;
    * Catalyst extracts the common `p_size >= 1` and the quantity envelope
    * to the scans and evaluates the cross-table residual post-join. The
    * classic test that OR-of-AND predicates don't force a cartesian or kill
    * pushdown. */
  val discountedRevenue = Q(
    "q_tpch_q19_disjunct",
    "TPC-H Q19-style disjunctive brand/size/quantity revenue",
    (s, dir) => {
      val l = t(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"))
      val p = t(s, dir, "part")
        .select(col("p_partkey"), col("p_brand"), col("p_size"))
      val cond =
        (col("p_brand") === "Brand#4" && col("p_size").between(1, 5) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#19" && col("p_size").between(1, 10) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#16" && col("p_size").between(1, 15) &&
          col("l_quantity").between(20, 30))
      l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .filter(cond)
        .agg(ExactMoney.fixedSum(
            col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
    },
    Some("""SELECT sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0)
           |   AS BIGINT)) / 100.0e0 AS revenue
           | FROM lineitem JOIN part ON l_partkey = p_partkey
           | WHERE (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 5
           |     AND l_quantity BETWEEN 1 AND 11)
           |   OR (p_brand = 'Brand#19' AND p_size BETWEEN 1 AND 10
           |     AND l_quantity BETWEEN 10 AND 20)
           |   OR (p_brand = 'Brand#16' AND p_size BETWEEN 1 AND 15
           |     AND l_quantity BETWEEN 20 AND 30)"""
      .stripMargin.replace("\n", "")),
    headline = true)

  /** TPC-H Q22 shape — "global sales opportunity": an uncorrelated scalar
    * subquery (average positive balance) feeding a filter, an anti-join
    * against orders ("customers who never ordered"), grouped by a substring
    * key (the last-two digits of c_name stand in for the phone country
    * code). The uncorrelated average plans as a ScalarSubquery — evaluated
    * once and injected as a literal, NOT a 1-row nested-loop join; the NOT
    * EXISTS rewrites to a shuffled anti-join. "Idle" is scoped to the data's
    * final year (every testdata customer has SOME order — the unscoped
    * anti-join would be vacuously empty and prove nothing). */
  val salesOpportunity = Q(
    "q_tpch_q22_idle",
    "TPC-H Q22-style idle high-balance customers (scalar avg + anti-join)",
    (s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("q22_customer")
      t(s, dir, "orders").createOrReplaceTempView("q22_orders")
      s.sql("""SELECT substring(c_name, 17, 2) AS cntry,
              |   count(*) AS numcust,
              |   sum(CAST(round(c_acctbal * 100.0) AS BIGINT)) / 100.0e0
              |     AS totacctbal
              | FROM q22_customer
              | WHERE c_acctbal > (SELECT sum(CAST(round(c_acctbal * 100.0)
              |       AS BIGINT)) / 100.0e0 / count(*) FROM q22_customer
              |     WHERE c_acctbal > 0.0)
              |   AND NOT EXISTS (SELECT 1 FROM q22_orders
              |     WHERE o_custkey = c_custkey
              |     AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
              | GROUP BY substring(c_name, 17, 2)""".stripMargin)
    },
    Some("""SELECT substring(c_name, 17, 2) AS cntry,
           | count(*) AS numcust,
           |   sum(CAST(round(c_acctbal * 100.0) AS BIGINT)) / 100.0e0
           |   AS totacctbal
           | FROM customer
           | WHERE c_acctbal > (SELECT sum(CAST(round(c_acctbal * 100.0)
           |     AS BIGINT)) / 100.0e0 / count(*) FROM customer
           |   WHERE c_acctbal > 0.0)
           |   AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
           |     AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
           | GROUP BY substring(c_name, 17, 2)"""
      .stripMargin.replace("\n", "")))

  /** TPC-H Q13 shape — "customer distribution": the double aggregation
    * (count orders per customer, then count customers per order-count),
    * with a LEFT join so zero-order customers land in the c_count=0
    * bucket. The first aggregate shrinks orders to |customers| rows before
    * the second (tiny) regroup — no row explosion anywhere. */
  val customerDistribution = Q(
    "q_tpch_q13_custdist",
    "TPC-H Q13-style customer order-count distribution (double aggregation)",
    (s, dir) => {
      val o = t(s, dir, "orders")
        .filter(col("o_orderpriority") =!= "1-URGENT")
        .select(col("o_orderkey"), col("o_custkey"))
      val perCust = t(s, dir, "customer").select(col("c_custkey"))
        .join(o, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
      perCust.groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
    },
    Some("""SELECT c_count, count(*) AS custdist FROM (
           |   SELECT c_custkey, count(o_orderkey) AS c_count
           |   FROM customer LEFT JOIN orders ON c_custkey = o_custkey
           |     AND o_orderpriority <> '1-URGENT'
           |   GROUP BY c_custkey) pc
           | GROUP BY c_count""".stripMargin.replace("\n", "")))

  /** TPC-H Q17 shape — "small-quantity-order revenue": rows kept when
    * under 20% of their part's average quantity. The per-part average is
    * a WINDOW avg over the brand-filtered fact rows — not an
    * aggregate-and-rejoin, which would scan lineitem twice and broadcast
    * a per-part aggregate whose cardinality scales with |part| (a driver
    * OOM at real scale). The brand join drops whole parts, never rows
    * within a kept part, so the window sees every lineitem row of each
    * surviving part — identical semantics to the correlated form. */
  val smallQuantityRevenue = Q(
    "q_tpch_q17_small_qty",
    "TPC-H Q17-style small-quantity revenue (per-part window avg)",
    (s, dir) => {
      val l = t(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      val brandParts = t(s, dir, "part")
        .filter(col("p_brand") === "Brand#4")
        .select(col("p_partkey"))
      val perPart = org.apache.spark.sql.expressions.Window
        .partitionBy(col("l_partkey"))
      l.join(broadcast(brandParts), col("l_partkey") === col("p_partkey"))
        .withColumn("avg_qty", avg(col("l_quantity")).over(perPart))
        .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
        .agg(round(sum(round(col("l_extendedprice") * 100.0, 0).cast("long"))
          / 100.0 / 7.0, 2).as("avg_yearly"))
    },
    Some("""SELECT round(sum(CAST(round(l_extendedprice * 100.0) AS BIGINT))
           |   / 100.0e0 / 7.0, 2) AS avg_yearly
           | FROM lineitem,
           |   (SELECT l_partkey AS ap_partkey, avg(l_quantity) AS avg_qty
           |    FROM lineitem JOIN part ON l_partkey = p_partkey
           |    WHERE p_brand = 'Brand#4' GROUP BY l_partkey) ap
           | WHERE l_partkey = ap_partkey
           |   AND l_quantity < 0.2 * avg_qty"""
      .stripMargin.replace("\n", "")))

  /** TPC-H Q7 shape — "volume shipping" between two nations: the
    * symmetric pair predicate ((FR→DE) OR (DE→FR)) rides the two
    * broadcast nation joins; revenue groups by (supp nation, cust nation,
    * ship year). Nation names come from the testdata's generated set. */
  val volumeShipping = Q(
    "q_tpch_q7_volume",
    "TPC-H Q7-style two-nation shipping volume by year",
    (s, dir) => {
      val n1 = t(s, dir, "nation")
        .select(col("n_nationkey").as("s_nkey"), col("n_name").as("supp_nation"))
      val n2 = t(s, dir, "nation")
        .select(col("n_nationkey").as("c_nkey"), col("n_name").as("cust_nation"))
      val pairCond =
        (col("supp_nation") === "NATION_18" && col("cust_nation") === "NATION_19") ||
        (col("supp_nation") === "NATION_19" && col("cust_nation") === "NATION_18")
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"),
          col("l_extendedprice"), col("l_discount"), col("l_shipdate"))
        .join(t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "supplier")
            .select(col("s_suppkey"), col("s_nationkey"))),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "customer")
            .select(col("c_custkey"), col("c_nationkey"))),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(n1), col("s_nationkey") === col("s_nkey"))
        .join(broadcast(n2), col("c_nationkey") === col("c_nkey"))
        .filter(pairCond)
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(ExactMoney.fixedSum(
            col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
    },
    Some("""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           | CAST(extract(year FROM l_shipdate) AS BIGINT) AS l_year,
           | sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0)
           |   AS BIGINT)) / 100.0e0 AS revenue
           | FROM lineitem
           | JOIN orders ON l_orderkey = o_orderkey
           | JOIN supplier ON l_suppkey = s_suppkey
           | JOIN customer ON o_custkey = c_custkey
           | JOIN nation n1 ON s_nationkey = n1.n_nationkey
           | JOIN nation n2 ON c_nationkey = n2.n_nationkey
           | WHERE (n1.n_name = 'NATION_18' AND n2.n_name = 'NATION_19')
           |    OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_18')
           | GROUP BY n1.n_name, n2.n_name, extract(year FROM l_shipdate)"""
      .stripMargin.replace("\n", "")))

  /** TPC-H Q21 shape — "suppliers who kept orders waiting": the double
    * correlated subquery on one fact table. A supplier's late line (here
    * "late" = shipped >90 days after the order date) counts only when the
    * order HAS another supplier (EXISTS, → semi-join on orderkey with a
    * suppkey≠ residual) and has NO OTHER late supplier (NOT EXISTS, →
    * anti-join, same keys + the late predicate). Both probes are
    * orderkey-equi joins — the ≠ rides as a residual condition, never a
    * cartesian. */
  val waitingSuppliers = Q(
    "q_tpch_q21_waiting",
    "TPC-H Q21-style lone-late-supplier count (per-order window counts)",
    (s, dir) => {
      // The EXISTS/NOT EXISTS pair decorrelates to per-order supplier
      // counts: a late row qualifies iff its order has >= 2 distinct
      // suppliers (EXISTS another supplier) and exactly 1 distinct LATE
      // supplier (NOT EXISTS another late one — necessarily this row's).
      // One lineitem⋈orders pass + one orderkey window replaces the
      // semi+anti joins over two more fact references; the collect_set
      // window state is bounded by lines-per-order (≤7 in TPC-H data).
      val lateCutoffDays = 90
      val l = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_orderdate"))
      // r13 note: measured two alternatives to this window — a single
      // multi-countDistinct aggregate (1.69× SLOWER: Spark plans it via
      // a 3× Expand) and a two-level plain aggregate (1.08× slower: two
      // hash exchanges cost more than one sort over ≤7-line orders).
      // The bounded collect_set window is the right shape; kept.
      val perOrder = org.apache.spark.sql.expressions.Window
        .partitionBy(col("l_orderkey"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .withColumn("late",
          col("l_shipdate") > col("o_orderdate") +
            expr(s"INTERVAL $lateCutoffDays DAYS"))
        .withColumn("n_supp",
          size(collect_set(col("l_suppkey")).over(perOrder)))
        .withColumn("n_late_supp",
          size(collect_set(when(col("late"), col("l_suppkey")))
            .over(perOrder)))
        .filter(col("late") && col("n_supp") > 1 && col("n_late_supp") === 1)
        .join(broadcast(t(s, dir, "supplier")
            .select(col("s_suppkey"), col("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(countDistinct(col("l_orderkey")).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name").asc)
        .limit(20)
    },
    Some("""SELECT s_name, count(DISTINCT l1.l_orderkey) AS numwait
           | FROM lineitem l1
           | JOIN orders ON l1.l_orderkey = o_orderkey
           | JOIN supplier ON l1.l_suppkey = s_suppkey
           | WHERE l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
           |   AND EXISTS (SELECT 1 FROM lineitem l2
           |     WHERE l2.l_orderkey = l1.l_orderkey
           |       AND l2.l_suppkey <> l1.l_suppkey)
           |   AND NOT EXISTS (SELECT 1 FROM lineitem l3
           |     JOIN orders o3 ON l3.l_orderkey = o3.o_orderkey
           |     WHERE l3.l_orderkey = l1.l_orderkey
           |       AND l3.l_suppkey <> l1.l_suppkey
           |       AND l3.l_shipdate > o3.o_orderdate + INTERVAL 90 DAY)
           | GROUP BY s_name
           | ORDER BY numwait DESC, s_name LIMIT 20"""
      .stripMargin.replace("\n", "")))

  /** TPC-H Q15 shape — "top supplier": revenue per supplier over one
    * quarter (a CTE/view in the classic query), then keep the supplier(s)
    * whose revenue equals the global max. The max is a 1-row aggregate of
    * the already-tiny per-supplier frame and joins back as a BROADCAST —
    * never a window over a single partition, never a driver collect. Both
    * engines compare the 2-dp ROUNDED revenue so the equality can't
    * straddle an ulp difference in sum order. */
  val topSupplier = Q(
    "q_tpch_q15_top_supplier",
    "TPC-H Q15-style top revenue supplier (scalar max over an agg CTE)",
    (s, dir) => {
      val rev = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= ts("1997-01-01 00:00:00") &&
          col("l_shipdate") < ts("1997-04-01 00:00:00"))
        .groupBy(col("l_suppkey"))
        .agg(ExactMoney.fixedSum(
            col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("total_revenue"))
      val mx = rev.agg(max(col("total_revenue")).as("mx"))
      rev.join(broadcast(mx), col("total_revenue") === col("mx"))
        .join(broadcast(t(s, dir, "supplier")
            .select(col("s_suppkey"), col("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
    },
    Some("""WITH rev AS (SELECT l_suppkey,
           |   sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0)
           |     AS BIGINT)) / 100.0e0 AS total_revenue
           | FROM lineitem
           | WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
           |   AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
           | GROUP BY l_suppkey)
           | SELECT s_suppkey, s_name, total_revenue
           | FROM supplier JOIN rev ON s_suppkey = l_suppkey
           | WHERE total_revenue = (SELECT max(total_revenue) FROM rev)"""
      .stripMargin.replace("\n", "")))

  /** TPC-H Q8 shape — "national market share": the widest join tree in the
    * benchmark (lineitem⋈orders spine + FIVE broadcast dims, nation joined
    * TWICE under different roles). The share numerator is a CASE inside the
    * same SUM as the denominator — one pass, two accumulators — and the
    * percentage divides the ROUNDED components (the Q14 convention) so both
    * engines divide identical 2-dp values. */
  val marketShare = Q(
    "q_tpch_q8_market_share",
    "TPC-H Q8-style national market share per order year",
    (s, dir) => {
      val vol = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      val n1 = t(s, dir, "nation")
        .select(col("n_nationkey").as("c_nkey"), col("n_regionkey"))
      val n2 = t(s, dir, "nation")
        .select(col("n_nationkey").as("s_nkey"), col("n_name").as("supp_nation"))
      val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
        .select(col("r_regionkey"))
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          col("l_extendedprice"), col("l_discount"))
        .join(t(s, dir, "orders")
            .filter(col("o_orderdate") >= ts("1996-01-01 00:00:00") &&
              col("o_orderdate") < ts("1998-01-01 00:00:00"))
            .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "part").filter(col("p_type") === "STANDARD")
            .select(col("p_partkey"))),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(t(s, dir, "customer")
            .select(col("c_custkey"), col("c_nationkey"))),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(n1), col("c_nationkey") === col("c_nkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .join(broadcast(t(s, dir, "supplier")
            .select(col("s_suppkey"), col("s_nationkey"))),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n2), col("s_nationkey") === col("s_nkey"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        // volumes sum per-row INTEGER CENTS (the q_tpch_q9_profit idiom):
        // the sf1 xcheck sweep caught sum(double)'s layout-sensitive ulp
        // drift crossing the rounding boundary; integer sums are exact.
        .agg(
          (sum(when(col("supp_nation") === "NATION_7",
            round(vol * 100.0, 0).cast("long")).otherwise(0L)) / 100.0)
            .as("nation_volume"),
          (sum(round(vol * 100.0, 0).cast("long")) / 100.0)
            .as("total_volume"))
        .select(col("o_year"), col("nation_volume"), col("total_volume"),
          round(col("nation_volume") / col("total_volume"), 4).as("mkt_share"))
    },
    Some("""WITH v AS (SELECT
           |   CAST(extract(year FROM o_orderdate) AS BIGINT) AS o_year,
           |   sum(CASE WHEN n2.n_name = 'NATION_7'
           |     THEN CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0)
           |       AS BIGINT) ELSE 0 END) / 100.0e0 AS nation_volume,
           |   sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0)
           |     AS BIGINT)) / 100.0e0 AS total_volume
           | FROM lineitem
           | JOIN orders ON l_orderkey = o_orderkey
           | JOIN part ON l_partkey = p_partkey
           | JOIN customer ON o_custkey = c_custkey
           | JOIN nation n1 ON c_nationkey = n1.n_nationkey
           | JOIN region ON n1.n_regionkey = r_regionkey
           | JOIN supplier ON l_suppkey = s_suppkey
           | JOIN nation n2 ON s_nationkey = n2.n_nationkey
           | WHERE r_name = 'ASIA' AND p_type = 'STANDARD'
           |   AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
           |   AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
           | GROUP BY extract(year FROM o_orderdate))
           | SELECT o_year, nation_volume, total_volume,
           |   round(nation_volume / total_volume, 4) AS mkt_share FROM v"""
      .stripMargin.replace("\n", "")),
    headline = true)

  /** TPC-H Q9 shape — "product type profit": profit per (supplier nation,
    * order year) for parts matching a name pattern. The testdata has no
    * partsupp.ps_supplycost, so cost stands in as p_retailprice * quantity
    * (same multiplicative form, rides the SAME broadcast part join the
    * name filter needs anyway — no extra exchange vs the classic plan).
    *
    * Profit sums as per-row INTEGER CENTS, not doubles: the first cut
    * rounded sum(double) and lost a cent to sum-order ulp drift between
    * engines (spark 1033510.93 vs duckdb .94 at sf0.01). round each term
    * to cents → cast BIGINT → integer sum is order-independent and exact
    * in both engines; /100.0 at the end is the same double both sides. */
  val productProfit = Q(
    "q_tpch_q9_profit",
    "TPC-H Q9-style product-type profit by nation and year",
    (s, dir) => {
      val profitCents = round((col("l_extendedprice") *
        (lit(1.0) - col("l_discount")) -
        col("p_retailprice") * col("l_quantity")) * 100.0, 0).cast("long")
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          col("l_quantity"), col("l_extendedprice"), col("l_discount"))
        .join(broadcast(t(s, dir, "part")
            .filter(col("p_name").like("%widget%"))
            .select(col("p_partkey"), col("p_retailprice"))),
          col("l_partkey") === col("p_partkey"))
        .join(t(s, dir, "orders").select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "supplier")
            .select(col("s_suppkey"), col("s_nationkey"))),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation")
            .select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).cast("long").as("o_year"))
        .agg((sum(profitCents) / 100.0).as("sum_profit"))
    },
    Some("""SELECT n_name AS nation,
           | CAST(extract(year FROM o_orderdate) AS BIGINT) AS o_year,
           | sum(CAST(round((l_extendedprice * (1.0 - l_discount)
           |   - p_retailprice * l_quantity) * 100.0) AS BIGINT)) / 100.0e0
           |   AS sum_profit
           | FROM lineitem
           | JOIN part ON l_partkey = p_partkey
           | JOIN orders ON l_orderkey = o_orderkey
           | JOIN supplier ON l_suppkey = s_suppkey
           | JOIN nation ON s_nationkey = n_nationkey
           | WHERE p_name LIKE '%widget%'
           | GROUP BY n_name, extract(year FROM o_orderdate)"""
      .stripMargin.replace("\n", "")))

  /** TPC-H Q11 shape — "important stock identification": per-part value
    * held by one nation's suppliers, HAVING sum(value) above a FRACTION OF
    * THE GLOBAL TOTAL — an uncorrelated scalar aggregate reused against
    * every group. The per-part frame is computed ONCE and the threshold is
    * a 1-row aggregate of it broadcast back (the classic
    * view-reused-twice plan, no recompute of the fact scan). Value stands
    * in as extendedprice*quantity (no ps_supplycost*ps_availqty here).
    *
    * Written through the SQL surface (the Q22 route) so the threshold
    * plans as an uncorrelated ScalarSubquery — evaluated once, injected
    * as a literal into the filter. The DataFrame spellings (inequality
    * join, constant-key join) both degenerate to BroadcastNestedLoopJoin
    * because Catalyst constant-folds the key away. */
  val importantParts = Q(
    "q_tpch_q11_important_parts",
    "TPC-H Q11-style important parts (HAVING vs global scalar aggregate)",
    (s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("q11_lineitem")
      t(s, dir, "supplier").createOrReplaceTempView("q11_supplier")
      t(s, dir, "nation").createOrReplaceTempView("q11_nation")
      s.sql("""WITH v AS (SELECT l_partkey,
              |   sum(l_extendedprice * l_quantity) AS raw_value
              | FROM q11_lineitem
              | WHERE l_suppkey IN (SELECT s_suppkey FROM q11_supplier
              |   JOIN q11_nation ON s_nationkey = n_nationkey
              |   WHERE n_name = 'NATION_3')
              | GROUP BY l_partkey)
              | SELECT l_partkey AS ps_partkey,
              |   round(raw_value, 2) AS part_value
              | FROM v
              | WHERE raw_value > (SELECT sum(raw_value) * 0.002 FROM v)"""
        .stripMargin)
    },
    Some("""WITH v AS (SELECT l_partkey,
           |   sum(l_extendedprice * l_quantity) AS raw_value
           | FROM lineitem
           | WHERE l_suppkey IN (SELECT s_suppkey FROM supplier
           |   JOIN nation ON s_nationkey = n_nationkey
           |   WHERE n_name = 'NATION_3')
           | GROUP BY l_partkey)
           | SELECT l_partkey AS ps_partkey, round(raw_value, 2) AS part_value
           | FROM v
           | WHERE raw_value > (SELECT sum(raw_value) * 0.002 FROM v)"""
      .stripMargin.replace("\n", "")))

  /** TPC-H Q2 shape — "minimum cost supplier": the correlated-min
    * subquery. partsupp is DERIVED from lineitem (min observed unit price
    * per (part, supplier) pair — deterministic, same construction both
    * engines), region-scoped via the supplier's nation, and a part keeps a
    * supplier only when its cost equals the per-part MIN across the
    * region. The per-part min is a WINDOW min over the derived pair frame
    * — not an aggregate-and-rejoin, which would reference the frame twice
    * and (absent AQE stage reuse) re-run the whole lineitem aggregation;
    * the window form scans lineitem exactly once and pays one extra
    * partkey exchange over the already-collapsed pair set. The part
    * filter joins BEFORE the window: it drops whole parts, never
    * suppliers within a kept part, so the per-part min is unchanged.
    * Ordered output with a tie-proof key suffix. */
  val minCostSupplier = Q(
    "q_tpch_q2_min_cost_supplier",
    "TPC-H Q2-style minimum-cost supplier per part (correlated min)",
    (s, dir) => {
      val eu = broadcast(t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation")
            .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")
            .filter(col("r_name") === "EUROPE").select(col("r_regionkey"))),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"),
          col("n_name")))
      // r13 (guide §2.3 / §3.2): broadcast-join the highly selective part
      // dim BEFORE the (l_partkey, l_suppkey) aggregate — the per-partsupp
      // min is unchanged by dropping other parts' rows, and the grouped
      // aggregate's exchange now carries only the ~3% of lineitem that
      // survives the filter instead of the whole fact table.
      val partDim = broadcast(t(s, dir, "part")
        .filter(col("p_size").between(10, 20) && col("p_type") === "LARGE")
        .select(col("p_partkey"), col("p_name")))
      val ps = t(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey"),
          col("l_extendedprice"), col("l_quantity"))
        .join(partDim, col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_partkey"), col("l_suppkey"), col("p_partkey"),
          col("p_name"))
        .agg(min(col("l_extendedprice") / col("l_quantity"))
          .as("ps_supplycost"))
        .join(eu, col("l_suppkey") === col("s_suppkey"))
      val perPart = org.apache.spark.sql.expressions.Window
        .partitionBy(col("l_partkey"))
      ps
        .withColumn("min_cost", min(col("ps_supplycost")).over(perPart))
        .filter(col("ps_supplycost") === col("min_cost"))
        .select(col("s_name"), col("n_name"), col("p_partkey"), col("p_name"),
          round(col("s_acctbal"), 2).as("s_acctbal"),
          round(col("ps_supplycost"), 2).as("supplycost"))
        .orderBy(col("s_acctbal").desc, col("n_name").asc, col("s_name").asc,
          col("p_partkey").asc)
        .limit(100)
    },
    Some("""WITH ps AS (
           |   SELECT l_partkey, l_suppkey,
           |     min(l_extendedprice / l_quantity) AS ps_supplycost
           |   FROM lineitem GROUP BY l_partkey, l_suppkey),
           | eu AS (SELECT s_suppkey, s_name, s_acctbal, n_name
           |   FROM supplier
           |   JOIN nation ON s_nationkey = n_nationkey
           |   JOIN region ON n_regionkey = r_regionkey
           |   WHERE r_name = 'EUROPE')
           | SELECT s_name, n_name, p_partkey, p_name,
           |   round(s_acctbal, 2) AS s_acctbal,
           |   round(ps_supplycost, 2) AS supplycost
           | FROM part
           | JOIN ps ON p_partkey = ps.l_partkey
           | JOIN eu ON ps.l_suppkey = eu.s_suppkey
           | WHERE p_size BETWEEN 10 AND 20 AND p_type = 'LARGE'
           |   AND ps_supplycost = (SELECT min(ps2.ps_supplycost)
           |     FROM ps ps2 JOIN eu eu2 ON ps2.l_suppkey = eu2.s_suppkey
           |     WHERE ps2.l_partkey = p_partkey)
           | ORDER BY round(s_acctbal, 2) DESC, n_name, s_name, p_partkey
           | LIMIT 100""".stripMargin.replace("\n", "")))

  /** TPC-H Q20 shape — "potential part promotion": the nested-IN chain.
    * Per-(part, supplier) shipped quantity over one year for name-matched
    * parts; a pair qualifies when its quantity exceeds a fraction of the
    * per-part MAX (availqty stand-in: a WINDOW max over the pair frame —
    * one pass, no re-reference, no per-part-aggregate broadcast);
    * qualifying suppliers then SEMI-join into the region-scoped supplier
    * list — suppliers are emitted once no matter how many parts qualify
    * them, and the fact table is scanned exactly once. */
  val partPromotion = Q(
    "q_tpch_q20_part_promotion",
    "TPC-H Q20-style promotable-part suppliers (nested semi-join chain)",
    (s, dir) => {
      val pq = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= ts("1997-01-01 00:00:00") &&
          col("l_shipdate") < ts("1998-01-01 00:00:00"))
        .join(broadcast(t(s, dir, "part")
            .filter(col("p_name").like("red%")).select(col("p_partkey"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(col("l_quantity")).as("qty"))
      val qualifying = pq
        .withColumn("maxq", max(col("qty")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("l_partkey"))))
        .filter(col("qty") > lit(0.6) * col("maxq"))
        .select(col("l_suppkey"))
      t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation")
            .join(broadcast(t(s, dir, "region")
                .filter(col("r_name") === "ASIA").select(col("r_regionkey"))),
              col("n_regionkey") === col("r_regionkey"))
            .select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .join(qualifying, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_name"), col("n_name"))
    },
    Some("""WITH pq AS (
           |   SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty
           |   FROM lineitem JOIN part ON l_partkey = p_partkey
           |   WHERE p_name LIKE 'red%'
           |     AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
           |     AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
           |   GROUP BY l_partkey, l_suppkey),
           | pm AS (SELECT l_partkey AS m_partkey, max(qty) AS maxq
           |   FROM pq GROUP BY l_partkey)
           | SELECT s_name, n_name
           | FROM supplier
           | JOIN nation ON s_nationkey = n_nationkey
           | JOIN region ON n_regionkey = r_regionkey
           | WHERE r_name = 'ASIA'
           |   AND EXISTS (SELECT 1 FROM pq JOIN pm ON pq.l_partkey = m_partkey
           |     WHERE pq.l_suppkey = s_suppkey AND qty > 0.6 * maxq)"""
      .stripMargin.replace("\n", "")))

  val all: Seq[Q] = Seq(
    orderPriority, returnedItems, shipmodePriority, promoEffect,
    supplierRelationship, discountedRevenue, salesOpportunity,
    customerDistribution, smallQuantityRevenue, volumeShipping,
    waitingSuppliers, topSupplier, marketShare, productProfit,
    importantParts, minCostSupplier, partPromotion)
}
