package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TimeFns
import graft.sources.Sources

/** The reference-parity query surface (SURVEY.md §2) expressed over the
  * driver testdata star schema. Each query exercises one operator family from
  * the §2 inventory; names carry the §2 IDs. Every query has a DuckDB oracle.
  *
  * Scale notes are per-query: these run at sf0.01 for correctness and sf0.1+
  * for bench, but are written for the 1000-executor / 100 TB shape — filters
  * and projections push into the parquet scan, small dims broadcast, and the
  * only shuffles are the ones the semantics require.
  */
object ParityQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Sources.table(s, dir, name)

  // ---------------------------------------------------------------- S / P --

  /** S-series scan + P1 projection-with-alias: column pruning reaches the
    * parquet reader (ReadSchema shows only the two columns). */
  val scanProject = Q(
    "q_p1_scan_project",
    "P1/P2 projection with aliases over a scan (sql_queries.py:157-173)",
    (s, dir) => t(s, dir, "region")
      .select(col("r_regionkey").cast("long").as("region_key"),
              col("r_name").as("region_name")),
    Some("SELECT CAST(r_regionkey AS BIGINT) AS region_key, r_name AS region_name FROM region"))

  /** P3 equality filter — the reference's WHERE page='NextSong'
    * (sql_queries.py:181). Predicate pushes to the parquet scan. */
  val filterEq = Q(
    "q_p3_filter_eq",
    "P3 equality filter (WHERE page='NextSong' analogue)",
    (s, dir) => t(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("value"), col("props")),
    Some("SELECT event_id, user_id, value, props FROM events WHERE event_type = 'purchase'"))

  /** P4 + E13/E14 — lower() + LIKE '%…%' (Fiddle cells 59-60). */
  val filterLike = Q(
    "q_p4_filter_like",
    "P4 lower()+LIKE filter (Fiddle F59-F60)",
    (s, dir) => t(s, dir, "part")
      .filter(lower(col("p_type")).like("%promo%"))
      .select(col("p_partkey"), col("p_name"), col("p_type")),
    Some("SELECT p_partkey, p_name, p_type FROM part WHERE lower(p_type) LIKE '%promo%'"))

  /** P6 IN-list + P7 BETWEEN + P8 compound booleans
    * (sql_queries.py:252-300). */
  val filterInBetween = Q(
    "q_p6_in_between",
    "P6 IN-list + P7 BETWEEN + P8 AND-chain",
    (s, dir) => t(s, dir, "part")
      .filter(col("p_size").between(10, 30) &&
        col("p_brand").isin("Brand#1", "Brand#2", "Brand#13"))
      .select(col("p_partkey"), col("p_brand"),
              col("p_size").cast("long").as("p_size")),
    Some("""SELECT p_partkey, p_brand, CAST(p_size AS BIGINT) AS p_size FROM part
           | WHERE p_size BETWEEN 10 AND 30 AND p_brand IN ('Brand#1','Brand#2','Brand#13')"""
      .stripMargin.replace("\n", "")))

  // -------------------------------------------------------------------- J --

  /** J1 left outer equi-join preserving unmatched probe rows (the
    * events←songs join, sql_queries.py:174-180): orders without lineitems
    * survive with NULL line columns. The fact side stays the probe; at scale
    * both sides are large → sort-merge on the shuffled key, AQE may convert
    * to broadcast when the build side is small. */
  val joinLeft = Q(
    "q_j1_join_left",
    "J1 left outer equi-join, unmatched rows preserved (sql_queries.py:174-180)",
    (s, dir) => {
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      o.join(l, o("o_orderkey") === l("l_orderkey"), "left")
        .select(o("o_orderkey"), col("o_orderstatus"),
                l("l_linenumber").cast("long").as("l_linenumber"),
                col("l_quantity"))
    },
    Some("""SELECT o.o_orderkey, o.o_orderstatus,
           | CAST(l.l_linenumber AS BIGINT) AS l_linenumber, l.l_quantity
           | FROM orders o LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey"""
      .stripMargin.replace("\n", "")))

  /** J1 two-key join variant (the reference joins on artist AND song title):
    * events against a derived per-(user,type) dim on both keys. The dim's
    * cardinality scales with |users| (derived FROM the fact), so no
    * explicit broadcast hint — AQE converts to broadcast at runtime while
    * it fits and falls back to a shuffle join at scale. */
  val joinTwoKey = Q(
    "q_j1_join_two_key",
    "J1 two-key equi-join against a derived dim (artist+title analogue)",
    (s, dir) => {
      val e = t(s, dir, "events")
      val d = e.groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("n_ev"))
      e.join(d, Seq("user_id", "event_type"), "left")
        .select(col("event_id"), col("user_id"), col("event_type"), col("n_ev"))
    },
    Some("""WITH d AS (SELECT user_id, event_type, count(*) AS n_ev FROM events GROUP BY 1, 2)
           | SELECT e.event_id, e.user_id, e.event_type, d.n_ev
           | FROM events e LEFT JOIN d ON e.user_id = d.user_id AND e.event_type = d.event_type"""
      .stripMargin.replace("\n", "")))

  /** J3 — the Fiddle cell 61 "left join + IS NULL" unmatched probe, written
    * the idiomatic Spark way: left_anti (no null-probe round trip, and the
    * anti join needs only the join key from the right side → smaller build). */
  val joinAnti = Q(
    "q_j3_join_anti",
    "J3 anti-join (left join + IS NULL probe, Fiddle F61)",
    (s, dir) => {
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      o.join(l, o("o_orderkey") === l("l_orderkey"), "left_anti")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    },
    Some("""SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders o
           | WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)"""
      .stripMargin.replace("\n", "")))

  /** Semi-join companion (EXISTS): customers with ≥1 order. */
  val joinSemi = Q(
    "q_j2_join_semi",
    "J2 family: semi-join (EXISTS) — customers having orders",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
    },
    Some("""SELECT c_custkey, c_name FROM customer c
           | WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)"""
      .stripMargin.replace("\n", "")))

  /** J4 — the flagship star join (README.md:63-87 schema design): fact
    * lineitem through orders→customer→nation→region, revenue by region/year.
    * nation+region are broadcast (DISTSTYLE ALL analogue); lineitem⋈orders is
    * the one genuine shuffle pair; aggregation is partial (map-side) before
    * the final group exchange. */
  val starJoin = Q(
    "q_j4_star_join",
    "J4 star join: revenue by region × order-year (flagship)",
    (s, dir) => {
      val l = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name").as("region_name"),
                 year(col("o_orderdate")).cast("long").as("o_year"))
        // revenue sums per-row INTEGER CENTS (the q_tpch_q9_profit idiom):
        // sum(double) is order-sensitive, and at sf1 the ulp drift between
        // two partition layouts crossed the cent boundary (caught by the
        // xcheck sweep); an integer sum is exact under any layout/engine.
        .agg(
          (sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * 100.0, 0).cast("long")) / 100.0).as("revenue"),
          count(lit(1)).as("n_items"))
    },
    Some("""SELECT r_name AS region_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
           | sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0)
           |   AS BIGINT)) / 100.0e0 AS revenue,
           | count(*) AS n_items
           | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           | JOIN customer ON o_custkey = c_custkey
           | JOIN nation ON c_nationkey = n_nationkey
           | JOIN region ON n_regionkey = r_regionkey
           | GROUP BY 1, 2""".stripMargin.replace("\n", "")),
    headline = true)

  // -------------------------------------------------------------------- A --

  /** A1 — COUNT(1) global (the Fiddle row-count probes). */
  val aggCount = Q(
    "q_a1_count",
    "A1 global COUNT (Fiddle F44-F50)",
    (s, dir) => t(s, dir, "lineitem").agg(count(lit(1)).as("n_rows")),
    Some("SELECT count(*) AS n_rows FROM lineitem"))

  /** A2 — GROUP BY + count, plus sum/avg (§2.4 note: reference only counts;
    * the engine exposes the full agg family). Partial aggregation keeps the
    * shuffle at |groups| rows, not |input|. */
  val aggGroup = Q(
    "q_a2_group_agg",
    "A2 grouped count/sum/avg (Fiddle F38-F39 + §2.4 extension)",
    (s, dir) => t(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
           ExactMoney.fixedSum(col("value")).as("sum_value"),
           round(ExactMoney.fixedAvg(col("value")), 2).as("avg_value")),
    Some("""SELECT event_type, count(*) AS n,
           | sum(CAST(round(value * 100.0) AS BIGINT)) / 100.0e0 AS sum_value,
           | round(sum(CAST(round(value * 100.0) AS BIGINT)) / 100.0e0
           |   / count(value), 2) AS avg_value FROM events GROUP BY event_type"""
      .stripMargin.replace("\n", "")))

  /** A3 — GROUPING SETS ((a),(a,b)) (Fiddle F53): multi-granularity counts
    * in one pass; Catalyst expands then partially aggregates. */
  val groupingSets = Q(
    "q_a3_grouping_sets",
    "A3 GROUPING SETS ((event_type),(event_type,user_id)) (Fiddle F53)",
    (s, dir) => {
      t(s, dir, "events").createOrReplaceTempView("events")
      s.sql("""SELECT event_type, user_id, count(*) AS n FROM events
              |GROUP BY GROUPING SETS ((event_type), (event_type, user_id))"""
        .stripMargin)
    },
    Some("""SELECT event_type, user_id, count(*) AS n FROM events
           | GROUP BY GROUPING SETS ((event_type), (event_type, user_id))"""
      .stripMargin.replace("\n", "")))

  /** A-family extension: DISTINCT-inside-aggregate (multiple distinct
    * columns → Catalyst Expand-based plan; each distinct column shuffles
    * once on (group, value)). */
  val countDistinct = Q(
    "q_a5_count_distinct",
    "Grouped multi-column COUNT(DISTINCT) (§2.4 extension)",
    (s, dir) => t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(count_distinct(col("l_partkey")).as("n_parts"),
           count_distinct(col("l_suppkey")).as("n_supps")),
    Some("""SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
           | count(DISTINCT l_suppkey) AS n_supps FROM lineitem GROUP BY l_returnflag"""
      .stripMargin.replace("\n", "")))

  /** A-family extension: approximate distinct (HyperLogLog++). The 100 TB
    * answer to COUNT(DISTINCT): one pass, map-side sketch merge, no Expand.
    * Sketch values differ per engine → rows-only check; the spec pins the
    * estimate within rsd of the exact count. */
  val approxDistinct = Q(
    "q_a6_approx_distinct",
    "approx_count_distinct (HLL++) per group (§2.4 scale extension)",
    (s, dir) => t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts")),
    None)

  /** HLL++ anchor: the estimate must land within 5× the configured rsd of
    * the exact per-group count (0.02 rsd → 10% band, a ≥5σ margin). The
    * sketch is deterministic for a given dataset, so this either always
    * passes or exposes a real estimator/merge bug — driver-visible via a
    * 0-row oracle, complementing ApproxAggSpec's tighter in-JVM pin.
    *
    * The exact and approximate aggregates run as SEPARATE aggregations
    * joined on the 3-row group frame rather than one mixed agg: combining
    * a DISTINCT aggregate with a non-distinct one forces Catalyst's
    * Expand plan (row count × 2 before the first exchange), which made
    * this instrument the most expensive row of the sf1 suite. Split, the
    * exact side shuffles only the distinct (group, value) pairs and the
    * HLL side ships 3 sketches — same semantics, no Expand. */
  val approxDistinctAnchor = Q(
    "q_a6_approx_distinct_anchor",
    "HLL++ estimate within 10% of exact per group (violations; expect 0 rows)",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      val exact = li.groupBy(col("l_returnflag"))
        .agg(count_distinct(col("l_partkey")).as("exact_parts"))
      val approx = li.groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"))
      exact.join(approx, Seq("l_returnflag"))
        .filter(abs(col("approx_parts") - col("exact_parts")) >
          col("exact_parts") * 0.10)
        .select(col("l_returnflag"), col("exact_parts"), col("approx_parts"))
    },
    Some("""SELECT CAST(NULL AS VARCHAR) AS l_returnflag,
           | CAST(NULL AS BIGINT) AS exact_parts,
           | CAST(NULL AS BIGINT) AS approx_parts WHERE 1 = 0"""
      .stripMargin.replace("\n", "")), expectEmpty = true)

  /** A4 — multi-column DISTINCT (the dim builds, sql_queries.py:184-211). */
  val distinctDim = Q(
    "q_a4_distinct",
    "A4 multi-column DISTINCT dim build (sql_queries.py:184-211)",
    (s, dir) => t(s, dir, "customer")
      .select(col("c_nationkey").cast("long").as("c_nationkey"),
              col("c_mktsegment"))
      .distinct(),
    Some("SELECT DISTINCT CAST(c_nationkey AS BIGINT) AS c_nationkey, c_mktsegment FROM customer"))

  // -------------------------------------------------------------------- E --

  /** E1-E12 — the full time-dimension build (sql_queries.py:214-303) over
    * distinct event hours. The reference's LIMIT 100 source cap is dropped
    * (SURVEY.md §7.4.7 — parameterized hack, default unlimited). */
  val timeDims = Q(
    "q_e_time_dims",
    "E1-E12 time-dimension derivation (sql_queries.py:214-303)",
    (s, dir) => {
      val hours = t(s, dir, "events")
        .select(date_trunc("hour", col("ts")).as("h")).distinct()
      val h = col("h")
      // int-valued derivations cast to long to match DuckDB's BIGINT extracts
      hours.select(
        TimeFns.timeKey(h).as("time_key"),
        h.as("trunc_time"),
        to_date(h).as("date"),
        dayofmonth(h).cast("long").as("day"),
        TimeFns.week(h).cast("long").as("week"),
        month(h).cast("long").as("month"),
        quarter(h).cast("long").as("quarter"),
        year(h).cast("long").as("year"),
        TimeFns.hourOfDay(h).cast("long").as("hour"),
        TimeFns.dayOfWeek(h).cast("long").as("day_of_week"),
        TimeFns.isWeekend(h).as("is_weekend"),
        TimeFns.fiscalYear(h).cast("long").as("fiscal_year"),
        TimeFns.fiscalQuarter(h).cast("long").as("fiscal_quarter"),
        TimeFns.season(h).as("season"),
        lit(null).cast("string").as("special_event"))
    },
    Some("""WITH u AS (SELECT DISTINCT date_trunc('hour', ts) AS h FROM events)
           | SELECT CAST(strftime(h, '%Y%m%d%H') AS BIGINT) AS time_key,
           | h AS trunc_time, CAST(h AS DATE) AS date,
           | CAST(day(h) AS BIGINT) AS day, CAST(weekofyear(h) AS BIGINT) AS week,
           | CAST(month(h) AS BIGINT) AS month, CAST(quarter(h) AS BIGINT) AS quarter,
           | CAST(year(h) AS BIGINT) AS year, CAST(hour(h) AS BIGINT) AS hour,
           | CAST(dayofweek(h) + 1 AS BIGINT) AS day_of_week,
           | dayofweek(h) IN (0, 6) AS is_weekend,
           | CAST(CASE WHEN month(h) BETWEEN 1 AND 3 THEN year(h) - 1 ELSE year(h) END AS BIGINT) AS fiscal_year,
           | CAST(CASE WHEN month(h) BETWEEN 1 AND 3 THEN 4 WHEN month(h) BETWEEN 4 AND 6 THEN 1
           |      WHEN month(h) BETWEEN 7 AND 9 THEN 2 ELSE 3 END AS BIGINT) AS fiscal_quarter,
           | CASE WHEN month(h) IN (12,1,2) THEN 'Winter' WHEN month(h) IN (3,4,5) THEN 'Spring'
           |      WHEN month(h) IN (6,7,8) THEN 'Summer' ELSE 'Fall' END AS season,
           | CAST(NULL AS VARCHAR) AS special_event
           | FROM u""".stripMargin.replace("\n", "")))

  /** E1 + E3 — epoch-millis integer-division round trip (the highest
    * silent-divergence risk, SURVEY.md §7.4.1): ms → floor-to-second
    * timestamp + YYYYMMDDHH bigint key. */
  val epochRoundtrip = Q(
    "q_e1_epoch_roundtrip",
    "E1 integer-division epoch-ms→timestamp + E3 time key (sql_queries.py:164-173)",
    (s, dir) => t(s, dir, "events")
      .select(col("event_id"),
        TimeFns.epochMillisToTs(unix_millis(col("ts"))).as("ts_sec"),
        TimeFns.timeKey(col("ts")).as("time_key")),
    Some("""SELECT event_id, make_timestamp((epoch_ms(ts) // 1000) * 1000000) AS ts_sec,
           | CAST(strftime(ts, '%Y%m%d%H') AS BIGINT) AS time_key FROM events"""
      .stripMargin.replace("\n", "")))

  /** E9-E11 — fiscal year / fiscal quarter / season CASE chains over six
    * years of order dates (hits every month boundary). */
  val caseFiscal = Q(
    "q_e9_case_fiscal",
    "E9-E11 fiscal year/quarter + season CASEs (sql_queries.py:258-300)",
    (s, dir) => {
      val d = col("o_orderdate")
      t(s, dir, "orders").select(
        col("o_orderkey"),
        month(d).cast("long").as("month"),
        TimeFns.fiscalYear(d).cast("long").as("fiscal_year"),
        TimeFns.fiscalQuarter(d).cast("long").as("fiscal_quarter"),
        TimeFns.season(d).as("season"),
        TimeFns.isWeekend(d).as("is_weekend"))
    },
    Some("""SELECT o_orderkey, CAST(month(o_orderdate) AS BIGINT) AS month,
           | CAST(CASE WHEN month(o_orderdate) BETWEEN 1 AND 3 THEN year(o_orderdate) - 1 ELSE year(o_orderdate) END AS BIGINT) AS fiscal_year,
           | CAST(CASE WHEN month(o_orderdate) BETWEEN 1 AND 3 THEN 4 WHEN month(o_orderdate) BETWEEN 4 AND 6 THEN 1
           |      WHEN month(o_orderdate) BETWEEN 7 AND 9 THEN 2 ELSE 3 END AS BIGINT) AS fiscal_quarter,
           | CASE WHEN month(o_orderdate) IN (12,1,2) THEN 'Winter' WHEN month(o_orderdate) IN (3,4,5) THEN 'Spring'
           |      WHEN month(o_orderdate) IN (6,7,8) THEN 'Summer' ELSE 'Fall' END AS season,
           | dayofweek(o_orderdate) IN (0, 6) AS is_weekend
           | FROM orders""".stripMargin.replace("\n", "")))

  // -------------------------------------------------------------------- Q --

  /** Q1/Q2 + LIMIT — CTE over a derived table with a deterministic
    * ORDER BY + LIMIT (the reference's limit-fed CTE, sql_queries.py:215-302,
    * made deterministic). TopK compiles to TakeOrderedAndProject — no global
    * sort at scale. */
  val cteTopK = Q(
    "q_q1_cte_topk",
    "Q1/Q2 CTE + derived table + deterministic ORDER BY/LIMIT",
    (s, dir) => t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10),
    Some("""WITH ranked AS (SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders)
           | SELECT * FROM ranked ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10"""
      .stripMargin.replace("\n", "")))

  /** Window function (beyond-reference capability, §2.5): per-user event
    * sequence numbers. One shuffle on user_id, sort within partitions. */
  val windowRank = Q(
    "q_w_row_number",
    "Window: row_number per user ordered by time (capability extension)",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"),
                row_number().over(w).cast("long").as("rn"))
    },
    Some("""SELECT event_id, user_id,
           | CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS BIGINT) AS rn
           | FROM events""".stripMargin.replace("\n", "")))

  /** TPC-H Q1-shaped pricing summary — the classic heavy-aggregation
    * headline: one scan, map-side partial agg over 4 sums + 3 avgs + count,
    * tiny group cardinality. */
  val pricingSummary = Q(
    "q_tpch_q1_pricing",
    "TPC-H Q1-style pricing summary (heavy grouped aggregation, headline)",
    (s, dir) => t(s, dir, "lineitem")
      .filter(col("l_shipdate") <=
        lit(java.sql.Timestamp.valueOf("2000-12-01 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      // money sums/avgs go through ExactMoney (per-row integer cents →
      // exact long sum): layout/merge-order independent at any scale.
      // quantity is integral, so its double sum/avg is already exact.
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        ExactMoney.fixedSum(col("l_extendedprice")).as("sum_base_price"),
        ExactMoney.fixedSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("sum_disc_price"),
        ExactMoney.fixedSum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * (lit(1.0) + col("l_tax"))).as("sum_charge"),
        round(avg(col("l_quantity")), 2).as("avg_qty"),
        round(ExactMoney.fixedAvg(col("l_extendedprice")), 2).as("avg_price"),
        round(ExactMoney.fixedAvg(col("l_discount"), 4), 4).as("avg_disc"),
        count(lit(1)).as("count_order")),
    Some("""SELECT l_returnflag, l_linestatus,
           | round(sum(l_quantity), 2) AS sum_qty,
           | sum(CAST(round(l_extendedprice * 100.0) AS BIGINT)) / 100.0e0 AS sum_base_price,
           | sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT)) / 100.0e0 AS sum_disc_price,
           | sum(CAST(round(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) * 100.0) AS BIGINT)) / 100.0e0 AS sum_charge,
           | round(avg(l_quantity), 2) AS avg_qty,
           | round(sum(CAST(round(l_extendedprice * 100.0) AS BIGINT)) / 100.0e0 / count(l_extendedprice), 2) AS avg_price,
           | round(sum(CAST(round(l_discount * 10000.0) AS BIGINT)) / 10000.0e0 / count(l_discount), 4) AS avg_disc,
           | count(*) AS count_order
           | FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
           | GROUP BY l_returnflag, l_linestatus"""
      .stripMargin.replace("\n", "")),
    headline = true)

  /** TPC-H Q3 shape (shipping priority): selective filters on both fact
    * sides, customer filter broadcast into the orders scan, one genuine
    * lineitem⋈orders shuffle pair, grouped revenue, top 10. The classic
    * filter-pushdown + join-order benchmark query. */
  val shippingPriority = Q(
    "q_tpch_q3_shipping",
    "TPC-H Q3-style shipping priority (filters + join + agg + top-k)",
    (s, dir) => {
      val cutoff = lit(java.sql.Timestamp.valueOf("1998-06-15 00:00:00"))
      val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, dir, "orders").filter(col("o_orderdate") < cutoff)
      val l = t(s, dir, "lineitem").filter(col("l_shipdate") > cutoff)
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("l_orderkey"),
          date_trunc("day", col("o_orderdate")).as("o_orderdate"),
          col("o_orderpriority"))
        .agg(ExactMoney.fixedSum(
            col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)
    },
    Some("""SELECT l_orderkey, date_trunc('day', o_orderdate) AS o_orderdate,
           | o_orderpriority,
           | sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0)
           |   AS BIGINT)) / 100.0e0 AS revenue
           | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           | JOIN customer ON o_custkey = c_custkey
           | WHERE c_mktsegment = 'BUILDING'
           |   AND o_orderdate < TIMESTAMP '1998-06-15 00:00:00'
           |   AND l_shipdate > TIMESTAMP '1998-06-15 00:00:00'
           | GROUP BY l_orderkey, date_trunc('day', o_orderdate), o_orderpriority
           | ORDER BY revenue DESC, l_orderkey LIMIT 10"""
      .stripMargin.replace("\n", "")),
    headline = true)

  /** TPC-H Q6 shape (forecast revenue): pure filter+sum — the canonical
    * predicate-pushdown benchmark. Every predicate must reach the scan
    * (PushedFilters); the aggregate is a single map-side-combined scalar. */
  val forecastRevenue = Q(
    "q_tpch_q6_forecast",
    "TPC-H Q6-style forecast revenue (filter + scalar sum)",
    (s, dir) => t(s, dir, "lineitem")
      .filter(col("l_shipdate") >=
          lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")) &&
        col("l_shipdate") <
          lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00")) &&
        col("l_discount").between(0.03, 0.07) &&
        col("l_quantity") < 24)
      .agg(ExactMoney.fixedSum(col("l_extendedprice") * col("l_discount"))
        .as("revenue")),
    Some("""SELECT sum(CAST(round(l_extendedprice * l_discount * 100.0)
           |   AS BIGINT)) / 100.0e0 AS revenue
           | FROM lineitem
           | WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
           |   AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
           |   AND l_discount BETWEEN 0.03 AND 0.07
           |   AND l_quantity < 24"""
      .stripMargin.replace("\n", "")),
    headline = true)

  /** Equi-width histogram — the distribution-profiling primitive behind
    * every numeric dashboard: fixed [lo, hi) domain, `floor((x-lo)/w)`
    * binning in exact double arithmetic (identical IEEE result in any
    * engine — no width_bucket dialect differences), out-of-range values
    * clamped into the edge bins. One partial-aggregated shuffle of ≤ nBins
    * rows regardless of input size. */
  val histogram = Q(
    "q_a10_histogram",
    "Equi-width 20-bin histogram of lineitem extendedprice",
    (s, dir) => {
      val lo = 900.0; val hi = 105000.0; val w = (hi - lo) / 20.0
      val bin = least(greatest(
        floor((col("l_extendedprice") - lo) / w), lit(0.0)), lit(19.0))
      t(s, dir, "lineitem")
        .groupBy(bin.cast("long").as("bin"))
        .agg(count(lit(1)).as("n"),
          round(min(col("l_extendedprice")), 2).as("lo_seen"),
          round(max(col("l_extendedprice")), 2).as("hi_seen"))
    },
    Some("""SELECT CAST(least(greatest(
           |   floor((l_extendedprice - 900.0) / 5205.0), 0.0), 19.0) AS BIGINT) AS bin,
           | count(*) AS n,
           | round(min(l_extendedprice), 2) AS lo_seen,
           | round(max(l_extendedprice), 2) AS hi_seen
           | FROM lineitem GROUP BY 1""".stripMargin.replace("\n", "")))

  /** Ordered conversion funnel — the event-analytics staple: how far did
    * each user get through view → click → purchase, where each stage must
    * occur AT OR AFTER the previous stage's first occurrence (a plain
    * "has event" count ignores ordering and overcounts). Three staged
    * min-aggregations, each joined on the (small) per-user frame from the
    * previous stage. Oracle truncates to microseconds so both engines
    * compare identical timestamps. */
  val funnel = Q(
    "q_a9_funnel",
    "Ordered funnel: view → click → purchase stage per user",
    (s, dir) => {
      val e = t(s, dir, "events")
        .select(col("user_id"), col("event_type"), col("ts"))
      val v = e.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("mv"))
      val c = e.join(v, Seq("user_id"))
        .filter(col("event_type") === "click" && col("ts") >= col("mv"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("mc"))
      val p = e.join(c, Seq("user_id"))
        .filter(col("event_type") === "purchase" && col("ts") >= col("mc"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("mp"))
      e.select(col("user_id")).distinct()
        .join(v, Seq("user_id"), "left")
        .join(c, Seq("user_id"), "left")
        .join(p, Seq("user_id"), "left")
        .select(col("user_id"),
          when(col("mp").isNotNull, 3L)
            .when(col("mc").isNotNull, 2L)
            .when(col("mv").isNotNull, 1L)
            .otherwise(0L).as("funnel_stage"))
    },
    Some("""WITH e AS (SELECT user_id, event_type,
           |   date_trunc('microsecond', ts) AS ts FROM events),
           | v AS (SELECT user_id, min(ts) AS mv FROM e
           |   WHERE event_type = 'view' GROUP BY 1),
           | c AS (SELECT e.user_id, min(e.ts) AS mc FROM e JOIN v USING (user_id)
           |   WHERE event_type = 'click' AND e.ts >= v.mv GROUP BY 1),
           | p AS (SELECT e.user_id, min(e.ts) AS mp FROM e JOIN c USING (user_id)
           |   WHERE event_type = 'purchase' AND e.ts >= c.mc GROUP BY 1)
           | SELECT u.user_id, CAST(CASE
           |   WHEN p.user_id IS NOT NULL THEN 3
           |   WHEN c.user_id IS NOT NULL THEN 2
           |   WHEN v.user_id IS NOT NULL THEN 1
           |   ELSE 0 END AS BIGINT) AS funnel_stage
           | FROM (SELECT DISTINCT user_id FROM e) u
           | LEFT JOIN v USING (user_id)
           | LEFT JOIN c USING (user_id)
           | LEFT JOIN p USING (user_id)"""
      .stripMargin.replace("\n", "")))

  /** TPC-H Q5 shape — the 6-table "local supplier volume" join: the
    * region/nation dims prune to one region BEFORE joining (broadcast),
    * the orders year-filter pushes to its scan, and the only wide
    * exchanges are the lineitem⋈orders⋈customer fact spine. The
    * c_nationkey = s_nationkey "local" constraint rides the supplier
    * broadcast join — no extra shuffle. */
  val localSupplierVolume = Q(
    "q_tpch_q5_local_supplier",
    "TPC-H Q5-style local supplier volume (6-table join, one region/year)",
    (s, dir) => {
      val region = t(s, dir, "region").filter(col("r_name") === "ASIA")
      val nation = t(s, dir, "nation")
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      val orders = t(s, dir, "orders")
        .filter(col("o_orderdate") >=
            lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
          col("o_orderdate") <
            lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")))
        .select(col("o_orderkey"), col("o_custkey"))
      val supplier = t(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey"))
      val customer = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"))
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"),
          col("l_extendedprice"), col("l_discount"))
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .join(customer, col("o_custkey") === col("c_custkey"))
        .join(broadcast(supplier),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(ExactMoney.fixedSum(
            col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
    },
    Some("""SELECT n_name, sum(CAST(round(l_extendedprice * (1.0 - l_discount)
           |   * 100.0) AS BIGINT)) / 100.0e0 AS revenue
           | FROM lineitem
           | JOIN orders ON l_orderkey = o_orderkey
           | JOIN customer ON o_custkey = c_custkey
           | JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
           | JOIN nation ON s_nationkey = n_nationkey
           | JOIN region ON n_regionkey = r_regionkey
           | WHERE r_name = 'ASIA'
           |   AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
           |   AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
           | GROUP BY n_name""".stripMargin.replace("\n", "")),
    headline = true)

  /** TPC-H Q18 shape — "large volume orders": aggregate lineitem FIRST
    * (partial map-side sum per orderkey), HAVING-filter to the few whale
    * orders, THEN join the filtered keys to orders/customer — the
    * aggregate-before-join discipline that keeps the join inputs tiny at
    * scale (joining first would shuffle every lineitem row twice). */
  val largeOrders = Q(
    "q_tpch_q18_large_orders",
    "TPC-H Q18-style large-volume orders (agg-then-join, HAVING filter)",
    (s, dir) => {
      val whales = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("total_qty"))
        .filter(col("total_qty") > 200.0)
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .join(whales, col("o_orderkey") === col("l_orderkey"))
        .join(t(s, dir, "customer").select(col("c_custkey"), col("c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_mktsegment"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"),
          round(col("total_qty"), 2).as("total_qty"))
    },
    Some("""WITH w AS (SELECT l_orderkey, sum(l_quantity) AS total_qty
           |   FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 200.0)
           | SELECT c_custkey, c_mktsegment, o_orderkey,
           |   round(o_totalprice, 2) AS o_totalprice,
           |   round(total_qty, 2) AS total_qty
           | FROM orders JOIN w ON o_orderkey = l_orderkey
           | JOIN customer ON o_custkey = c_custkey"""
      .stripMargin.replace("\n", "")))

  /** Sessionization — gap-based session assignment per user (lag + running
    * sum over one user-partitioned sort; the canonical event-analytics
    * window pattern). Timestamps compare in integer microseconds so both
    * engines see the same boundaries. */
  val sessionize = Q(
    "q_w_sessionize",
    "Window: gap-based sessionization (lag + running sum)",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      val gapUs = unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w))
      val newSession = when(gapUs.isNull || gapUs > 1800000000L, 1L).otherwise(0L)
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("ts"),
          newSession.as("ns"))
        .select(col("event_id"), col("user_id"),
          sum(col("ns")).over(
            Window.partitionBy(col("user_id"))
              .orderBy(col("ts").asc, col("event_id").asc)
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .as("session_idx"))
    },
    Some("""WITH g AS (SELECT event_id, user_id, ts,
           | CASE WHEN lag(ts) OVER w IS NULL
           |   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END AS ns
           | FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
           | SELECT event_id, user_id,
           | CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
           | FROM g""".stripMargin.replace("\n", "")))

  /** Whale-safe sessionization ([[graft.ext.Sessionize.shardedSessions]]):
    * window partitions bounded at (user × day) with exact seam repair on
    * the bounded boundary frame — the engineered escape hatch for the
    * windows skew ceiling the skew smoke documents (AQE cannot split a
    * window partition). Session numbers are IDENTICAL to q_w_sessionize's
    * single-window form, so this query shares its DuckDB oracle verbatim:
    * a hash match proves the sharded plan computes the same function. */
  val sessionizeSharded = Q(
    "q_w_sessionize_sharded",
    "Whale-safe sessionization: (user, day)-bounded windows + seam repair",
    (s, dir) => graft.ext.Sessionize.shardedSessions(
        t(s, dir, "events"), "user_id", "ts", "event_id")
      .select(col("event_id"), col("user_id"), col("session_idx")),
    Some("""WITH g AS (SELECT event_id, user_id, ts,
           | CASE WHEN lag(ts) OVER w IS NULL
           |   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END AS ns
           | FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
           | SELECT event_id, user_id,
           | CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
           | FROM g""".stripMargin.replace("\n", "")))

  /** Grouped EXACT percentiles — Spark `percentile` and DuckDB
    * `quantile_cont` share the linear-interpolation definition, so the
    * rounded values hash-match. (percentile_approx is the scale path for
    * streaming/huge groups; the exact form is the oracle-able anchor.) */
  val percentiles = Q(
    "q_a7_percentile",
    "Grouped exact percentiles (p25/p50/p75 extendedprice per returnflag)",
    (s, dir) => t(s, dir, "lineitem")
      // r14: the r13 histogram-first rewrite is REVERTED. l_extendedprice
      // is quasi-unique (583k distinct cents / 600k rows at sf0.1), so the
      // (flag, price) pre-count bought no multiplicity reduction and paid
      // an extra exchange — measured 0.909 s direct vs 1.006 s histogram
      // (dedicated JVM, min of 4) and 0.80× in the banked r13 suite. The
      // at-scale unbounded-buffer concern stays solved by the approx
      // variant (q_a7b_percentile_approx), which IS the 100 TB path.
      .groupBy(col("l_returnflag"))
      // ONE percentile aggregate with an array of fractions: a single
      // per-group value buffer instead of three (3× less agg memory/work)
      .agg(
        expr("percentile(l_extendedprice, array(0.25, 0.5, 0.75))").as("ps"),
        round(max(col("l_extendedprice")), 2).as("pmax"))
      .select(col("l_returnflag"),
        round(col("ps").getItem(0), 2).as("p25"),
        round(col("ps").getItem(1), 2).as("p50"),
        round(col("ps").getItem(2), 2).as("p75"),
        col("pmax")),
    Some("""SELECT l_returnflag,
           | round(quantile_cont(l_extendedprice, 0.25), 2) AS p25,
           | round(quantile_cont(l_extendedprice, 0.5), 2) AS p50,
           | round(quantile_cont(l_extendedprice, 0.75), 2) AS p75,
           | round(max(l_extendedprice), 2) AS pmax
           | FROM lineitem GROUP BY l_returnflag"""
      .stripMargin.replace("\n", "")))

  /** Grouped APPROX percentiles — the 100 TB percentile path. Exact
    * `percentile` buffers EVERY group value in one aggregation buffer
    * (per-group memory grows with the data → executor OOM at scale);
    * `percentile_approx` keeps a bounded mergeable sketch
    * (Greenwald-Khanna variant, accuracy=1/ε memory), so per-group state
    * is fixed no matter how many rows flow in. Sketch results are
    * engine-specific → rows-only driver check; ApproxAggSpec pins the
    * estimates against the exact percentiles. */
  val percentilesApprox = Q(
    "q_a7b_percentile_approx",
    "Grouped approx percentiles (bounded sketch — the at-scale variant)",
    (s, dir) => t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile_approx(l_extendedprice, array(0.25, 0.5, 0.75), 1000)")
          .as("ps"),
        round(max(col("l_extendedprice")), 2).as("pmax"))
      .select(col("l_returnflag"),
        round(col("ps").getItem(0), 2).as("p25"),
        round(col("ps").getItem(1), 2).as("p50"),
        round(col("ps").getItem(2), 2).as("p75"),
        col("pmax")),
    None)

  /** The approx-percentile EXACT-TIE regime — the oracle-checkable
    * companion to `q_a7b_percentile_approx`: quantiles of `l_linenumber`,
    * a 7-value column whose tie-runs each span ~14.3% of every group
    * (line numbers are near-uniform over 1..7 at every SF). The GK sketch
    * guarantees rank error ≤ n/1000; a requested rank whose tie-run
    * extends further than that on BOTH sides FORCES the estimate to the
    * run's value, which is also what any discrete-quantile convention
    * (DuckDB `quantile_disc`, any rank rounding) returns — so the sketch
    * output is deterministic and hash-checkable cross-engine even though
    * the sketch itself compresses (group n ≫ accuracy).
    *
    * Quantile choice is the load-bearing part: 0.36 / 0.50 / 0.64 sit
    * INTERIOR to the value-3 / value-4 / value-5 runs with ≥6.8% rank
    * margin to the nearest run boundary (boundaries fall at multiples of
    * ≈1/7: .143 .286 .429 .572 .714 .857) — a 68× safety factor over the
    * 0.1% sketch bound, invariant across SF because the distribution is.
    * The classic 0.25/0.75 points sit only ~3.6% from the .286/.714
    * boundaries, close enough that a partitioning or Spark-version change
    * could flip the hash; they are deliberately NOT used. The un-tied
    * price quantiles of a7b stay rows-only with the envelope anchor
    * (`q_a7b_percentile_anchor`). */
  val percentilesApproxTies = Q(
    "q_a7c_percentile_approx_ties",
    "Approx percentiles on a heavily-tied column = exact quantile_disc",
    (s, dir) => t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile_approx(l_linenumber, array(0.36, 0.5, 0.64), 1000)")
          .as("ps"),
        count(lit(1)).as("n"))
      .select(col("l_returnflag"),
        col("ps").getItem(0).cast("long").as("p36"),
        col("ps").getItem(1).cast("long").as("p50"),
        col("ps").getItem(2).cast("long").as("p64"),
        col("n")),
    Some("""SELECT l_returnflag,
           | CAST(quantile_disc(l_linenumber, 0.36) AS BIGINT) AS p36,
           | CAST(quantile_disc(l_linenumber, 0.50) AS BIGINT) AS p50,
           | CAST(quantile_disc(l_linenumber, 0.64) AS BIGINT) AS p64,
           | count(*) AS n FROM lineitem GROUP BY l_returnflag"""
      .stripMargin.replace("\n", "")))

  /** CUBE — all 2^k grouping combinations (GROUPING SETS' bigger sibling;
    * same single-pass expand+aggregate plan in Spark). */
  val cubeAgg = Q(
    "q_a8_cube",
    "CUBE over (orderstatus, orderpriority): counts + revenue",
    (s, dir) => t(s, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        ExactMoney.fixedSum(col("o_totalprice")).as("revenue")),
    Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
           | sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) / 100.0e0 AS revenue
           | FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)"""
      .stripMargin.replace("\n", "")))

  /** Set operations — INTERSECT / EXCEPT (bag-distinct semantics): users
    * seen in both halves of the month vs only the first half. */
  val setOps = Q(
    "q_q2_set_ops",
    "Set ops: INTERSECT and EXCEPT over first/second-half user sets",
    (s, dir) => {
      val e = t(s, dir, "events")
      val firstHalf = e.filter(dayofmonth(col("ts")) <= 15)
        .select(col("user_id"))
      val secondHalf = e.filter(dayofmonth(col("ts")) > 15)
        .select(col("user_id"))
      firstHalf.intersect(secondHalf)
        .withColumn("membership", lit("both"))
        .unionByName(firstHalf.except(secondHalf)
          .withColumn("membership", lit("first_only")))
    },
    Some("""WITH f AS (SELECT user_id FROM events WHERE extract(day FROM ts) <= 15),
           | s AS (SELECT user_id FROM events WHERE extract(day FROM ts) > 15)
           | SELECT user_id, 'both' AS membership FROM (SELECT user_id FROM f INTERSECT SELECT user_id FROM s)
           | UNION ALL
           | SELECT user_id, 'first_only' AS membership FROM (SELECT user_id FROM f EXCEPT SELECT user_id FROM s)"""
      .stripMargin.replace("\n", "")))

  /** lag/lead + running sum — the remaining core window shapes beyond
    * row_number (windowRank) and sessionize. The running sum accumulates
    * in the same deterministic (ts, event_id) order in both engines, so
    * even the floating-point prefix sums agree bit-for-bit. */
  val windowLagLead = Q(
    "q_w_lag_lead",
    "Window: lag/lead/running-sum of value per user in event order",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      t(s, dir, "events").select(
        col("event_id"), col("user_id"),
        round(lag(col("value"), 1).over(w), 2).as("prev_value"),
        round(lead(col("value"), 1).over(w), 2).as("next_value"),
        round(sum(col("value")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2)
          .as("running_value"))
    },
    Some("""SELECT event_id, user_id,
           | round(lag(value) OVER w, 2) AS prev_value,
           | round(lead(value) OVER w, 2) AS next_value,
           | round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
           |   ROWS UNBOUNDED PRECEDING), 2) AS running_value
           | FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)"""
      .stripMargin.replace("\n", "")))

  /** Distribution-rank windows — ntile/percent_rank/dense_rank, the
    * remaining rank family beyond row_number/lag/lead. One partition key
    * (event_type) → a single exchange; the two orderings (value alone for
    * the tie-sharing ranks, value+event_id for ntile whose tie split must
    * be total to be deterministic) are two sorts over the same shuffle. */
  val windowNtile = Q(
    "q_w_ntile",
    "Window ranks: ntile(4) / percent_rank / dense_rank per event_type",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val byVal = Window.partitionBy(col("event_type")).orderBy(col("value"))
      val byValId = Window.partitionBy(col("event_type"))
        .orderBy(col("value"), col("event_id"))
      t(s, dir, "events").select(
        col("event_id"), col("event_type"),
        ntile(4).over(byValId).cast("long").as("quartile"),
        round(percent_rank().over(byVal), 6).as("prank"),
        dense_rank().over(byVal).cast("long").as("drank"))
    },
    Some("""SELECT event_id, event_type,
           | CAST(ntile(4) OVER (PARTITION BY event_type ORDER BY value, event_id) AS BIGINT) AS quartile,
           | round(percent_rank() OVER (PARTITION BY event_type ORDER BY value), 6) AS prank,
           | CAST(dense_rank() OVER (PARTITION BY event_type ORDER BY value) AS BIGINT) AS drank
           | FROM events""".stripMargin.replace("\n", "")))

  /** Explicit salt-based skew mitigation, PARITY-CHECKED: the salted join
    * (hot keys scattered over 8 sub-keys, small side replicated per salt —
    * Skew.saltedJoin) must produce exactly the plain join's aggregate. The
    * oracle runs the UNsalted SQL join, so the hash match proves the
    * rewrite is semantics-preserving, not just plan-shaped. */
  val saltedJoinParity = Q(
    "q_j5_salted_join",
    "Salted skew join == plain join (revenue per supplier nation)",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      val sup = t(s, dir, "supplier")
        .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey"))
      Skew.saltedJoin(li, sup, "l_suppkey", salts = 8,
          saltBy = col("l_orderkey"))
        .groupBy(col("s_nationkey").cast("long").as("s_nationkey"))
        .agg(count(lit(1)).as("n"),
          ExactMoney.fixedSum(col("l_extendedprice")).as("revenue"))
    },
    Some("""SELECT CAST(s_nationkey AS BIGINT) AS s_nationkey, count(*) AS n,
           | sum(CAST(round(l_extendedprice * 100.0) AS BIGINT)) / 100.0e0 AS revenue
           | FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
           | GROUP BY 1""".stripMargin.replace("\n", "")))

  /** Pivot (groupBy().pivot() — the spreadsheet turn): events per user ×
    * event_type as columns. Fixed value list on the Spark side (the 100 TB
    * discipline: a discovery pass over the pivot column is a full extra
    * scan); DuckDB mirrors with FILTERed counts. */
  val pivotCounts = Q(
    "q_p9_pivot",
    "Pivot: per-user event counts, one column per event_type",
    (s, dir) => t(s, dir, "events")
      .groupBy(col("user_id"))
      .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
      .count()
      .select(col("user_id"),
        coalesce(col("click"), lit(0L)).as("n_click"),
        coalesce(col("view"), lit(0L)).as("n_view"),
        coalesce(col("purchase"), lit(0L)).as("n_purchase"),
        coalesce(col("signup"), lit(0L)).as("n_signup"),
        coalesce(col("error"), lit(0L)).as("n_error")),
    Some("""SELECT user_id,
           | count(*) FILTER (WHERE event_type = 'click') AS n_click,
           | count(*) FILTER (WHERE event_type = 'view') AS n_view,
           | count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
           | count(*) FILTER (WHERE event_type = 'signup') AS n_signup,
           | count(*) FILTER (WHERE event_type = 'error') AS n_error
           | FROM events GROUP BY user_id"""
      .stripMargin.replace("\n", "")))

  val all: Seq[Q] = Seq(
    scanProject, filterEq, filterLike, filterInBetween,
    joinLeft, joinTwoKey, joinAnti, joinSemi, starJoin,
    aggCount, aggGroup, groupingSets, countDistinct, approxDistinct,
    approxDistinctAnchor, distinctDim,
    percentiles, percentilesApprox, percentilesApproxTies, pivotCounts,
    cubeAgg, setOps, funnel,
    histogram,
    timeDims, epochRoundtrip, caseFiscal,
    cteTopK, windowRank, windowLagLead, windowNtile, sessionize,
    sessionizeSharded,
    saltedJoinParity, pricingSummary, shippingPriority, forecastRevenue,
    localSupplierVolume, largeOrders)
}
