package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Physical-plan shape assertions — the scale contract, pinned so a
  * refactor can't silently regress it:
  *  - filters/projections reach the parquet scan (zone-map analogue);
  *  - small dims broadcast (DISTSTYLE ALL analogue), no shuffle join for
  *    the star dims;
  *  - hash aggregates are partial (map-side combine) before the exchange;
  *  - hot paths stay inside WholeStageCodegen (incl. custom expressions).
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df = Catalog.byName(name).run(spark, sfDir)
    df.queryExecution.executedPlan.toString
  }

  test("P3 filter pushes down to the parquet scan") {
    val p = plan("q_p3_filter_eq")
    assert(p.contains("PushedFilters: [IsNotNull(event_type), EqualTo(event_type,purchase)]"),
      s"missing pushdown:\n$p")
  }

  test("projection prunes the scan schema (no full-row reads)") {
    val p = plan("q_p1_scan_project")
    assert(p.contains("ReadSchema: struct<r_regionkey:int,r_name:string>"),
      s"scan not pruned:\n$p")
  }

  test("star join broadcasts the dims and keeps one shuffle pair") {
    val p = plan("q_j4_star_join")
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join:\n$p")
    // nation+region explicitly broadcast; customer/orders small enough that
    // AQE or the threshold broadcasts them too — assert no cartesian and no
    // more than the lineitem⋈orders sort-merge pair
    assert(!p.contains("CartesianProduct"))
  }

  test("grouped agg is partial before the exchange (map-side combine)") {
    val p = plan("q_a2_group_agg")
    assert(p.contains("partial_count") || p.contains("HashAggregate"),
      s"no partial aggregation:\n$p")
    val aggIdx = p.indexOf("HashAggregate")
    assert(aggIdx >= 0)
  }

  test("custom expressions stay inside WholeStageCodegen") {
    import graft.functions.TextExprs._
    import org.apache.spark.sql.functions.col
    val df = graft.sources.Sources.table(spark, sfDir, "documents")
      .select(simhash(col("text")).as("sh"))
    val p = df.queryExecution.executedPlan.toString
    // "*(n)" prefixes mark WholeStageCodegen spans in the plan string; the
    // Project evaluating simhash must carry one
    assert(p.linesIterator.exists(l => l.contains("*(") && l.contains("Project")),
      s"codegen broken:\n$p")
    // and the expression actually evaluates via the generated path
    assert(df.limit(5).collect().length == 5)
  }

  test("round-4 expressions (repetition/zorder) stay inside WholeStageCodegen") {
    import graft.functions.TextExprs._
    import org.apache.spark.sql.functions.col
    val df = graft.sources.Sources.table(spark, sfDir, "documents")
      .select(repetition_stats(col("text")).as("rs"),
        zorder_key(col("doc_id"), col("n_chars")).as("z"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.linesIterator.exists(l => l.contains("*(") && l.contains("Project")),
      s"codegen broken:\n$p")
    assert(df.limit(5).collect().length == 5)
  }

  test("ANN probe side broadcasts (corpus streams, no corpus shuffle)") {
    val df = graft.ext.Similarity.bruteForceTopK(
      graft.sources.Sources.table(spark, sfDir, "embeddings"), Seq(0L, 1L), 3)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"probes not broadcast:\n$p")
  }

  test("TopK compiles to TakeOrderedAndProject (no global sort)") {
    val p = plan("q_q1_cte_topk")
    assert(p.contains("TakeOrderedAndProject"), s"global sort instead of topK:\n$p")
  }

  test("rank windows share one exchange and one sort (order prefix reuse)") {
    val p = plan("q_w_ntile")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"expected 1 exchange:\n$p")
    // the (value) ordering is a prefix of (value, event_id): both Window
    // operators must run off a single Sort
    val sorts = "\\bSort\\b".r.findAllIn(p).length
    assert(sorts == 1, s"expected 1 sort, the prefix rule regressed:\n$p")
  }

  test("salted join broadcasts the replicated small side; agg stays partial") {
    val p = plan("q_j5_salted_join")
    assert(p.contains("BroadcastHashJoin"), s"salted small side not broadcast:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
    // salt explode (Generate) must sit UNDER the broadcast, so the
    // replication happens once on the small side, not per large-side row
    assert(p.indexOf("Generate") > p.indexOf("BroadcastExchange"),
      s"salt explode outside the broadcast build:\n$p")
  }

  test("dedup verify keeps the probe side broadcast (corpus streams once)") {
    val p = plan("q_x_dedup_verify")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"probes not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("shuffle positions: corpus window is shard-partitioned, offsets broadcast") {
    val p = plan("q_x_corpus_shuffle")
    // the corpus-sized window must partition by shard (never a global
    // single-partition window); the ≤256-row offset table rides a broadcast
    assert(p.contains("hashpartitioning(shard"),
      s"corpus window not shard-partitioned:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"offsets not broadcast:\n$p")
  }

  test("Q19 disjunction: per-table OR-halves push to both scans") {
    val p = plan("q_tpch_q19_disjunct")
    // the quantity envelope (OR of the three between-ranges) reaches the
    // lineitem scan; the size/brand disjunction reaches the part scan
    assert(p.contains("PushedFilters: [IsNotNull(l_partkey), Or("),
      s"lineitem OR-envelope not pushed:\n$p")
    assert(p.contains("GreaterThanOrEqual(p_size,1)"),
      s"part size bound not pushed:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"part dim not broadcast:\n$p")
  }

  test("Q10 top-k is TakeOrderedAndProject over broadcast dims") {
    val p = plan("q_tpch_q10_returns")
    assert(p.contains("TakeOrderedAndProject"), s"global sort for top-20:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"customer/nation not broadcast:\n$p")
    assert(p.contains("PushedFilters: [IsNotNull(l_returnflag), EqualTo(l_returnflag,R)"),
      s"returnflag filter not pushed:\n$p")
  }

  test("Q4 non-equi EXISTS plans as a semi-join, date filter pushed") {
    val p = plan("q_tpch_q4_priority")
    assert(p.contains("LeftSemi"), s"EXISTS not a semi-join:\n$p")
    assert(p.contains("GreaterThanOrEqual(o_orderdate,"),
      s"order date filter not pushed:\n$p")
  }

  test("Q16 derived partsupp: distinct pairs BEFORE the part join") {
    val p = plan("q_tpch_q16_supplier_cnt")
    // the (l_partkey, l_suppkey) distinct must sit below the join with part
    val joinIdx = p.indexOf("BroadcastHashJoin")
    assert(joinIdx >= 0, s"part dim not broadcast:\n$p")
    assert(p.contains("HashAggregate"), s"no distinct aggregate:\n$p")
    assert(p.contains("ReadSchema: struct<l_partkey:bigint,l_suppkey:bigint>"),
      s"lineitem scan not pruned to the pair columns:\n$p")
  }

  test("Q15 top supplier: 1-row max broadcasts back, no global window") {
    val p = plan("q_tpch_q15_top_supplier")
    assert(p.contains("BroadcastHashJoin"), s"max frame not broadcast:\n$p")
    assert(!p.contains("Window"),
      s"global-partition window instead of broadcast max:\n$p")
    assert(p.contains("GreaterThanOrEqual(l_shipdate,"),
      s"quarter filter not pushed:\n$p")
  }

  test("Q8 market share: date+type filters pushed, dims broadcast") {
    val p = plan("q_tpch_q8_market_share")
    assert(p.contains("EqualTo(p_type,STANDARD)"),
      s"part type filter not pushed:\n$p")
    assert(p.contains("GreaterThanOrEqual(o_orderdate,"),
      s"order date window not pushed:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"dims not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"a dim fell back to a shuffle join at this scale:\n$p")
  }

  test("Q9 profit: p_name contains-filter pushed, integer-cents aggregate") {
    val p = plan("q_tpch_q9_profit")
    assert(p.contains("StringContains(p_name,widget)"),
      s"name filter not pushed:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"part dim not broadcast:\n$p")
  }

  test("Q11 important parts: threshold is a scalar subquery, not a join") {
    val p = plan("q_tpch_q11_important_parts")
    assert(p.contains("scalar-subquery") || p.contains("Subquery"),
      s"threshold did not plan as a scalar subquery:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"threshold degenerated to a nested-loop join:\n$p")
  }

  test("Q2 min-cost supplier: lineitem scan pruned to the pair columns") {
    val p = plan("q_tpch_q2_min_cost_supplier")
    assert(p.contains(
      "ReadSchema: struct<l_partkey:bigint,l_suppkey:bigint,l_quantity:double,l_extendedprice:double>"),
      s"derived-partsupp scan reads more than the 4 needed columns:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"global sort for top-100:\n$p")
  }

  test("Q20 part promotion: qualifying suppliers SEMI-join (emitted once)") {
    val p = plan("q_tpch_q20_part_promotion")
    assert(p.contains("LeftSemi"), s"supplier dedup not a semi-join:\n$p")
    assert(p.contains("StringStartsWith(p_name,red)"),
      s"name prefix filter not pushed:\n$p")
  }

  test("HLL anchor: split aggregations, no Expand over the fact input") {
    // Mixing count_distinct with approx_count_distinct in ONE agg plans
    // Expand (input rows × 2 before the first exchange) — 3× the sf1 wall.
    // The anchor runs them as separate aggregations joined on the 3-row
    // group frame; pin the shape so a refactor can't fold them back.
    val p = plan("q_a6_approx_distinct_anchor")
    assert(!p.contains("Expand"), s"mixed-distinct Expand regressed:\n$p")
  }

  test("runtime Bloom-filter join pruning stays available (100 TB lever)") {
    // At production sizes Spark's InjectRuntimeFilter decorates the fact
    // side of a selective shuffle join with a bloom-filter semi-join
    // (might_contain), pruning the big scan before the exchange. The
    // size thresholds (creation ≤ 100 MB build, application ≥ 10 GB
    // scan) mean it can never fire at gate SFs, so this pins the
    // capability itself: with thresholds scaled to the fixture, the
    // session's config must still inject the filter — a conf regression
    // (e.g. disabling the optimizer rule or AQE interplay) would
    // silently cost exactly the at-scale scans the defaults target.
    import org.apache.spark.sql.functions._
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = graft.sources.Sources.table(spark, sfDir, "lineitem")
      val ord = graft.sources.Sources.table(spark, sfDir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      val j = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)))
      val p = j.queryExecution.optimizedPlan.toString
      assert(p.contains("might_contain") || p.contains("BloomFilter"),
        s"runtime bloom filter no longer injects:\n$p")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
