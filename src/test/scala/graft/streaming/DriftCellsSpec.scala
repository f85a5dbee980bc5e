package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** driftCells' scoring arithmetic on planted rates (the streaming path —
  * source → watermarked window state → append finalization — is covered
  * by the q_s_stream_drift gate against DuckDB at three SFs; window() and
  * the join/score columns behave identically on a batch frame, which is
  * what makes the math testable in isolation here). */
class DriftCellsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("log rate ratio cells: on-profile ~0, doubled rate = floor(1000 ln 2)") {
    val spark0 = spark
    import spark0.implicits._
    val h = 3600L * 1000000L // one hour in us
    val base = 1700000000000000L
    // type A: 2 events in each of hours 0,1; type B: 2 then 4 (doubles)
    def ev(id: Long, us: Long, t: String) =
      (id, new java.sql.Timestamp(us / 1000), 1L, t, 1.0, "{}")
    val rows = Seq(
      ev(1, base, "A"), ev(2, base + 1, "A"),
      ev(3, base + h, "A"), ev(4, base + h + 1, "A"),
      ev(5, base, "B"), ev(6, base + 1, "B"),
      ev(7, base + h, "B"), ev(8, base + h + 1, "B"),
      ev(9, base + h + 2, "B"), ev(10, base + h + 3, "B"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val expected = Seq(("A", 2.0), ("B", 3.0))
      .toDF("event_type", "exp_per_window")
    val got = EventsStream.driftCells(rows, expected)
      .collect()
      .map(r => (r.getString(1), r.getLong(2)) -> r.getLong(3)).toMap
    assert(got(("A", 2L)) == 0L)   // ln(2/2) = 0
    // B hour 0: ln(2/3) = -0.405..., milli-floored
    assert(got(("B", 2L)) == math.floor(math.log(2.0 / 3.0) * 1000).toLong)
    assert(got(("B", 4L)) == math.floor(math.log(4.0 / 3.0) * 1000).toLong)
  }

  test("types absent from the expected table drop (schema alarm, not rate)") {
    val spark0 = spark
    import spark0.implicits._
    val rows = Seq(
      (1L, new java.sql.Timestamp(1700000000000L), 1L, "A", 1.0, "{}"),
      (2L, new java.sql.Timestamp(1700000000000L), 1L, "Z", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val expected = Seq(("A", 1.0)).toDF("event_type", "exp_per_window")
    val types = EventsStream.driftCells(rows, expected)
      .collect().map(_.getString(1)).toSet
    assert(types == Set("A"))
  }
}
