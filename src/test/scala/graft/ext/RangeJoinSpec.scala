package graft.ext

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  private def fixtures = {
    val spark0 = spark
    import spark0.implicits._
    val points = Seq(
      (1L, 1L, ts("2024-01-01 10:05:00")),
      (2L, 1L, ts("2024-01-01 10:59:59")), // end-exclusive boundary probe
      (3L, 1L, ts("2024-01-01 11:00:00")), // == end → out
      (4L, 2L, ts("2024-01-01 10:05:00")), // other key, no interval
      (5L, 1L, ts("2024-01-01 09:59:59"))  // == start-1 → out
    ).toDF("event_id", "user_id", "ts")
    val intervals = Seq(
      (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00"), "w1"),
      (1L, ts("2024-01-01 10:04:00"), ts("2024-01-01 10:06:00"), "w2"),
      (1L, ts("2024-01-01 12:00:00"), ts("2024-01-01 12:00:00"), "empty"),
      (1L, ts("2024-01-01 13:00:00"), ts("2024-01-01 12:00:00"), "inverted")
    ).toDF("user_id", "w_start", "w_end", "tag")
    (points, intervals)
  }

  test("containment semantics: [start, end), keys respected, bad intervals dropped") {
    val (points, intervals) = fixtures
    val out = RangeJoin.pointInInterval(points, intervals,
        "ts", "w_start", "w_end", keys = Seq("user_id"), binSeconds = 60L)
      .select("event_id", "tag").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out == Set((1L, "w1"), (1L, "w2"), (2L, "w1")))
  }

  test("bin width does not change results (only performance)") {
    val (points, intervals) = fixtures
    val expected = RangeJoin.pointInInterval(points, intervals,
      "ts", "w_start", "w_end", Seq("user_id"), binSeconds = 1L)
      .select("event_id", "tag").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    for (bin <- Seq(7L, 600L, 86400L)) {
      val got = RangeJoin.pointInInterval(points, intervals,
        "ts", "w_start", "w_end", Seq("user_id"), binSeconds = bin)
        .select("event_id", "tag").collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == expected, s"bin=$bin")
    }
  }

  test("maxBinsPerInterval caps pathological intervals instead of exploding") {
    val spark0 = spark
    import spark0.implicits._
    val (points, _) = fixtures
    // one sane 2-minute window + one all-day window: at binSeconds=1 the
    // all-day interval would explode into 86,400 rows from a single input
    // row — the cap (default 4096) drops it; the sane window still joins
    val intervals = Seq(
      (1L, ts("2024-01-01 10:04:00"), ts("2024-01-01 10:06:00"), "sane"),
      (1L, ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00"), "all_day")
    ).toDF("user_id", "w_start", "w_end", "tag")
    val obs = new org.apache.spark.sql.Observation()
    val capped = RangeJoin.pointInInterval(points, intervals,
        "ts", "w_start", "w_end", Seq("user_id"), binSeconds = 1L,
        dropObservation = Some(obs))
      .select("event_id", "tag").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(capped == Set((1L, "sane")),
      "oversized interval must be dropped, sane one kept")
    // the drop is observable, not silent: count + how far over the cap
    assert(obs.get("dropped_intervals") == 1L)
    assert(obs.get("max_interval_bins") == 86400L)
    // raising the cap deliberately restores the dropped interval's matches
    val uncapped = RangeJoin.pointInInterval(points, intervals,
        "ts", "w_start", "w_end", Seq("user_id"), binSeconds = 1L,
        maxBinsPerInterval = 100000L)
      .select("event_id", "tag").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(uncapped == Set((1L, "sane"),
      (1L, "all_day"), (2L, "all_day"), (3L, "all_day"), (5L, "all_day")))
  }

  test("keyless range join works and stays hash-join-shaped") {
    val (points, intervals) = fixtures
    val df = RangeJoin.pointInInterval(points.drop("user_id"),
      intervals.drop("user_id"), "ts", "w_start", "w_end",
      keys = Nil, binSeconds = 600L)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"range join degenerated to a nested loop:\n$plan")
    // every point matches w1/w2 windows regardless of key now
    assert(df.count() == 5)
  }
}
