package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Exact-moment statistics against hand-computed ground truth: Pearson
  * endpoints (+1, −1) and a hand-worked 0.8, mutual information on an
  * identity (1 bit) and an independent (0 bits) joint, and Benford digit
  * binning through the string route (including the 1000.00 power-of-ten
  * boundary the log10 route can misbin). */
class StatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("corrMatrixCenti: +1, -1, and a hand-computed 0.8") {
    val df = Seq(
      (1.0, 2.0, 4.0, 1.0),
      (2.0, 4.0, 3.0, 3.0),
      (3.0, 6.0, 2.0, 2.0),
      (4.0, 8.0, 1.0, 4.0)
    ).toDF("x", "y", "z", "w")
    val m = Stats.corrMatrixCenti(df, Seq("x", "y", "z", "w"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(m(("x", "y")) == (4L, 1.0))
    assert(m(("x", "z")) == (4L, -1.0))
    assert(m(("x", "w")) == (4L, 0.8))
    assert(m(("y", "z"))._2 == -1.0)
    assert(m.size == 6)
  }

  test("corrMatrixCenti: constant column yields NULL corr, never NaN") {
    val df = Seq((1.0, 5.0), (2.0, 5.0), (3.0, 5.0)).toDF("x", "k")
    val rows = Stats.corrMatrixCenti(df, Seq("x", "k")).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getLong(2) == 3L)
    // 0/0 would be NaN (and engine-dependent in DuckDB); the contract
    // is NULL, matching TimeSeries.acf's zero-variance convention
    assert(r.isNullAt(3), s"expected NULL corr, got ${r.get(3)}")
  }

  test("mutualInfoCells: identity joint carries 1 bit, independent 0") {
    val ident = Seq(("x", "x"), ("x", "x"), ("y", "y"), ("y", "y"))
      .toDF("l", "r")
    val cells = Stats.mutualInfoCells(ident, "l", "r").collect()
    assert(cells.length == 2)
    cells.foreach { c =>
      assert(c.getAs[Double]("pmi") == 1.0)
      assert(c.getAs[Double]("mi_contrib") == 0.5)
    }
    val indep = Seq(("x", "u"), ("x", "v"), ("y", "u"), ("y", "v"))
      .toDF("l", "r")
    val flat = Stats.mutualInfoCells(indep, "l", "r").collect()
    assert(flat.length == 4)
    flat.foreach { c =>
      assert(c.getAs[Double]("pmi") == 0.0)
      assert(c.getAs[Double]("mi_contrib") == 0.0)
    }
  }

  test("benford: string-route digit binning, zero/negative filtered") {
    val df = Seq(1.23, 0.05, 999.99, 1000.00, -3.0, 0.0).toDF("v")
    val rows = Stats.benford(df, "v").collect()
      .map(r => r.getAs[Long]("digit") ->
        (r.getAs[Long]("n"), r.getAs[Double]("share"),
          r.getAs[Double]("benford_p"))).toMap
    assert(rows.keySet == Set(1L, 5L, 9L))
    assert(rows(1L)._1 == 2L) // 1.23 and 1000.00 both bin to digit 1
    assert(rows(5L)._1 == 1L)
    assert(rows(9L)._1 == 1L)
    assert(rows(1L)._2 == 0.5)
    assert(rows(1L)._3 == math.rint(math.log10(2.0) * 1e6) / 1e6)
  }
}
