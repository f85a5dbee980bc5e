package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.Sources

/** Dual-surface parity (SURVEY.md §1.2/§3.4): the same catalog serves the
  * DataFrame API and spark.sql. For every query whose oracle SQL is also
  * valid Spark SQL (ANSI subset), running the SQL text over registered temp
  * views must produce exactly the DataFrame result. */
class SqlSurfaceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  /** Oracle SQL that is portable to Spark SQL (no DuckDB-only functions —
    * strftime, make_timestamp, list_*, string_split — and no DOW-convention
    * differences). */
  private val sparkCompatible = Set(
    "q_p1_scan_project", "q_p3_filter_eq", "q_p4_filter_like",
    "q_p6_in_between", "q_j1_join_left", "q_j1_join_two_key",
    "q_j3_join_anti", "q_j2_join_semi", "q_j4_star_join",
    "q_a1_count", "q_a2_group_agg", "q_a3_grouping_sets", "q_a4_distinct",
    "q_q1_cte_topk", "q_w_row_number", "q_x_dedup_exact",
    "q_a5_count_distinct", "q_tpch_q1_pricing",
    "q_j5_salted_join", "q_w_ntile", "q_x_edit_distance",
    "q_s_stream_dedup", "q_s_stream_window",
    "q_a9_funnel", "q_tpch_q5_local_supplier", "q_tpch_q18_large_orders",
    "q_a10_histogram",
    "q_tpch_q4_priority", "q_tpch_q10_returns", "q_tpch_q12_shipmode",
    "q_tpch_q14_promo", "q_tpch_q16_supplier_cnt", "q_tpch_q19_disjunct",
    "q_tpch_q22_idle", "q_a8b_rollup",
    "q_tpch_q13_custdist", "q_tpch_q17_small_qty", "q_tpch_q7_volume",
    "q_tpch_q21_waiting",
    "q_x_event_transitions", "q_x_incremental_agg")

  sparkCompatible.toSeq.sorted.foreach { name =>
    test(s"$name: spark.sql(oracle text) == DataFrame result") {
      val q = Catalog.byName(name)
      Sources.registerTestdataViews(spark, sfDir)
      val viaSql = spark.sql(q.oracle.get)
      val viaDf = q.run(spark, sfDir)
      assert(viaSql.columns.sorted.toSeq == viaDf.columns.sorted.toSeq)
      val s1 = viaSql.collect().map(_.toSeq.toVector).sortBy(_.toString)
      val s2 = viaDf.collect().map(_.toSeq.toVector).sortBy(_.toString)
      assert(s1.length == s2.length)
      s1.zip(s2).foreach { case (a, b) => assert(a == b) }
    }
  }
}
