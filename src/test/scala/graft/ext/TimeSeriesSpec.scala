package graft.ext

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TimeSeriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private def events(rows: (Long, Long, Long, Double)*) = {
    val spark0 = spark
    import spark0.implicits._
    rows.map { case (u, t, e, v) => (u, ts(t), e, v) }
      .toDF("user_id", "ts", "event_id", "value")
  }

  test("ewma: single observation returns that observation") {
    val out = TimeSeries.ewma(events((1L, 100L, 1L, 42.5)),
        "user_id", "ts", "event_id", "value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq((1L, 1L, 42.5)))
  }

  test("ewma: matches the recurrence for a short series") {
    // alpha=1/4, newest-first weights (3/4)^j; three points x2=newest.
    // truncated normalized ewma = (x2 + 0.75*x1 + 0.5625*x0) / 2.3125
    val out = TimeSeries.ewma(
        events((1L, 10L, 1L, 1.0), (1L, 20L, 2L, 2.0), (1L, 30L, 3L, 4.0)),
        "user_id", "ts", "event_id", "value")
      .collect().head
    val expected = (4.0 + 0.75 * 2.0 + 0.5625 * 1.0) / (1.0 + 0.75 + 0.5625)
    assert(out.getLong(1) == 3L)
    assert(math.abs(out.getDouble(2) - expected) < 1e-6)
  }

  test("ewma: truncation keeps only the newest k observations") {
    val rows = (1L to 40L).map(i => (1L, i * 10L, i, if (i <= 24) 0.0 else 8.0))
    val out = TimeSeries.ewma(events(rows: _*),
        "user_id", "ts", "event_id", "value", k = 16)
      .collect().head
    // the 16 newest rows (i = 25..40) are all 8.0 -> ewma is exactly 8
    assert(out.getLong(1) == 16L)
    assert(out.getDouble(2) == 8.0)
  }

  test("ewma: tie on ts breaks by event_id descending") {
    val out = TimeSeries.ewma(
        events((1L, 10L, 1L, 0.0), (1L, 10L, 2L, 100.0)),
        "user_id", "ts", "event_id", "value")
      .collect().head
    // event_id=2 is newest: ewma = (100 + 0.75*0) / 1.75
    assert(math.abs(out.getDouble(2) - 100.0 / 1.75) < 1e-6)
  }

  test("trend: recovers an exact linear signal with r = 1") {
    // value = 2 centi-units per hour exactly
    val rows = (0L until 10L).map(i => (1L, i * 3600L, i, 0.02 * i))
    val out = TimeSeries.trend(
        events(rows: _*).withColumn("event_type",
          org.apache.spark.sql.functions.lit("a")),
        "event_type", "ts", "value")
      .collect().head
    assert(out.getLong(1) == 10L)
    assert(out.getDouble(2) == 2.0) // slope in centi-units/hour
    assert(out.getDouble(3) == 1.0)
  }

  test("trend: flat series has slope 0 and NULL correlation") {
    val rows = (0L until 5L).map(i => (1L, i * 3600L, i, 7.0))
    val out = TimeSeries.trend(
        events(rows: _*).withColumn("event_type",
          org.apache.spark.sql.functions.lit("a")),
        "event_type", "ts", "value")
      .collect().head
    assert(out.getDouble(2) == 0.0)
    assert(out.isNullAt(3)) // varY = 0: correlation undefined
  }

  test("trend: single-instant group yields NULL slope, not an ANSI error") {
    val out = TimeSeries.trend(
        events((1L, 100L, 1L, 3.0), (1L, 100L, 2L, 5.0))
          .withColumn("event_type",
            org.apache.spark.sql.functions.lit("a")),
        "event_type", "ts", "value")
      .collect().head
    assert(out.isNullAt(2) && out.isNullAt(3)) // varX = 0
  }

  test("changePoint: finds a planted mean shift at the exact boundary hour") {
    // hours 0..9 worth of values at 10.0, hours 10..19 at 90.0: the
    // cumulative deviation |D| peaks at the last low hour (hour 9)
    val rows = (0L until 20L).flatMap { h =>
      (0L until 5L).map(i =>
        (1L, h * 3600L + i * 60L, h * 10 + i, if (h < 10) 10.0 else 90.0))
    }
    val out = TimeSeries.changePoint(
        events(rows: _*).withColumn("event_type",
          org.apache.spark.sql.functions.lit("a")),
        "event_type", "ts", "value")
      .collect().head
    assert(out.getTimestamp(1) == ts(9 * 3600L)) // change at hour 9
    assert(out.getLong(2) == 50L && out.getLong(3) == 50L)
    assert(out.getDouble(4) == 10.0 && out.getDouble(5) == 90.0)
  }

  test("changePoint: constant series ties break to the earliest hour") {
    val rows = (0L until 6L).map(h => (1L, h * 3600L, h, 5.0))
    val out = TimeSeries.changePoint(
        events(rows: _*).withColumn("event_type",
          org.apache.spark.sql.functions.lit("a")),
        "event_type", "ts", "value")
      .collect().head
    assert(out.getTimestamp(1) == ts(0L)) // all D = 0 -> first hour
    assert(out.getDouble(4) == 5.0 && out.getDouble(5) == 5.0)
  }

  test("changePoint: layout-independent under repartition") {
    val rows = (0L until 300L).map(i =>
      (1L, i * 700L, i, ((i * 13) % 97).toDouble / 10.0))
    val df = events(rows: _*).withColumn("event_type",
      org.apache.spark.sql.functions.lit("a"))
    val a = TimeSeries.changePoint(df, "event_type", "ts", "value")
      .collect().head
    val b = TimeSeries.changePoint(df.repartition(11), "event_type", "ts", "value")
      .collect().head
    assert(a.getTimestamp(1) == b.getTimestamp(1))
    assert(a.getDouble(4) == b.getDouble(4) && a.getDouble(5) == b.getDouble(5))
  }

  test("trend: layout-independent — repartitioned input gives identical bits") {
    val rows = (0L until 200L).map(i =>
      (1L, i * 977L, i, ((i * 37) % 101).toDouble / 100.0))
    val df = events(rows: _*).withColumn("event_type",
      org.apache.spark.sql.functions.lit("a"))
    val a = TimeSeries.trend(df, "event_type", "ts", "value").collect().head
    val b = TimeSeries.trend(df.repartition(7), "event_type", "ts", "value")
      .collect().head
    assert(a.getDouble(2) == b.getDouble(2))
    assert(a.getDouble(3) == b.getDouble(3))
  }

  test("acf: hand-computed lags over [1,2,3,4] — 0.25, -0.3, -0.45") {
    import spark.implicits._
    val s = Seq(("a", 0L, 1L), ("a", 1L, 2L), ("a", 2L, 3L), ("a", 3L, 4L))
      .toDF("key", "t", "x")
    val r = TimeSeries.acf(s, "key", "t", "x", Seq(1, 2, 3))
      .collect().map(row => row.getAs[Long]("lag") ->
        (row.getAs[Long]("n_obs"), row.getAs[Long]("n_pairs"),
          row.getAs[Double]("acf"))).toMap
    assert(r(1L) == (4L, 3L, 0.25))
    assert(r(2L) == (4L, 2L, -0.3))
    assert(r(3L) == (4L, 1L, -0.45))
  }

  test("acf: grid gaps pair only existing points; zero variance is NULL") {
    import spark.implicits._
    // t=2 missing: lag-1 pairs only (t0,t1) → m=1, r = 4/42
    val gap = Seq(("a", 0L, 1L), ("a", 1L, 2L), ("a", 3L, 4L))
      .toDF("key", "t", "x")
    val g = TimeSeries.acf(gap, "key", "t", "x", Seq(1)).head()
    assert(g.getAs[Long]("n_pairs") == 1L)
    assert(g.getAs[Double]("acf") == 0.095238)
    val const = Seq(("c", 0L, 7L), ("c", 1L, 7L), ("c", 2L, 7L))
      .toDF("key", "t", "x")
    val c = TimeSeries.acf(const, "key", "t", "x", Seq(1)).head()
    assert(c.isNullAt(c.fieldIndex("acf")))
  }

  test("acf: layout-independent — repartitioned input gives identical bits") {
    import spark.implicits._
    val s = (0L until 300L).map(i => ("k", i, (i * 37) % 101))
      .toDF("key", "t", "x")
    val a = TimeSeries.acf(s, "key", "t", "x", Seq(1, 2))
      .collect().map(r => r.getLong(1) -> r.getDouble(4)).toMap
    val b = TimeSeries.acf(s.repartition(13), "key", "t", "x", Seq(1, 2))
      .collect().map(r => r.getLong(1) -> r.getDouble(4)).toMap
    assert(a == b)
  }
}
