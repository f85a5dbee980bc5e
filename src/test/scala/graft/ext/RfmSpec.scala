package graft.ext

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class RfmSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def day(d: Int) = Timestamp.valueOf(f"2026-01-${d}%02d 00:00:00")

  private def orders(rows: (Long, Int, Double)*) = {
    val spark0 = spark
    import spark0.implicits._
    rows.map { case (c, d, amt) => (c, day(d), amt) }
      .toDF("o_custkey", "o_orderdate", "o_totalprice")
  }

  test("single customer lands in segment (1,1,1) with exact revenue") {
    val out = Rfm.segments(orders((1L, 5, 10.10), (1L, 7, 20.20)),
        "o_custkey", "o_orderdate", "o_totalprice")
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((1L, 1L, 1L)))
    assert(r.getLong(3) == 1L)
    assert(r.getDouble(4) == 30.30)
  }

  test("scores split a 4-way spread customer base as quartiles") {
    // 4 customers, strictly increasing recency / frequency / monetary in
    // opposite directions so each gets a distinct (r, f, m) cell.
    val out = Rfm.segments(orders(
        // cust 1: last day 20 (rec 0), 4 orders, total 400
        (1L, 20, 100.0), (1L, 15, 100.0), (1L, 10, 100.0), (1L, 5, 100.0),
        // cust 2: last day 18 (rec 2), 3 orders, total 300
        (2L, 18, 100.0), (2L, 12, 100.0), (2L, 6, 100.0),
        // cust 3: last day 14 (rec 6), 2 orders, total 200
        (3L, 14, 100.0), (3L, 8, 100.0),
        // cust 4: last day 9 (rec 11), 1 order, total 100
        (4L, 9, 100.0)),
      "o_custkey", "o_orderdate", "o_totalprice")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // recency quartile cutoffs over {0,2,6,11}; freq over {4,3,2,1};
    // monetary over {400,300,200,100}: each customer occupies one cell.
    assert(out == Set(
      (1L, 4L, 4L, 1L), // most recent, most frequent, biggest spender
      (2L, 3L, 3L, 1L),
      (3L, 2L, 2L, 1L),
      (4L, 1L, 1L, 1L))) // least recent -> HIGHEST recency score... see doc
  }

  test("monetary totals are exact centi-sums (no float drift)") {
    // 0.1 + 0.2 != 0.3 in doubles; in exact cents it is.
    val out = Rfm.segments(orders((1L, 5, 0.10), (1L, 6, 0.20)),
        "o_custkey", "o_orderdate", "o_totalprice")
      .collect().head
    assert(out.getDouble(4) == 0.30)
  }

  test("segment grid partitions all customers exactly once") {
    val rows = (1L to 50L).flatMap { c =>
      (0 until (c % 5 + 1).toInt).map(j =>
        (c, ((c + j * 3) % 27 + 1).toInt, (c * 7 % 90) + 1.5))
    }
    val seg = Rfm.segments(orders(rows: _*),
      "o_custkey", "o_orderdate", "o_totalprice")
    val total = seg.agg(org.apache.spark.sql.functions.sum("n_customers"))
      .collect().head.getLong(0)
    assert(total == 50L)
    // scores stay in [1, 4]
    val bad = seg.filter(
      "r_score < 1 or r_score > 4 or f_score < 1 or f_score > 4" +
        " or m_score < 1 or m_score > 4").count()
    assert(bad == 0L)
  }
}
