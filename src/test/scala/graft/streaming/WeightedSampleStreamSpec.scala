package graft.streaming

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.Sources

/** windowedWeightedSample's selection math on a batch frame (window() and
  * the E-S key behave identically batch/stream; the streaming path —
  * state-store heap merge + append finalization — is the
  * q_s_stream_sample gate's job): the bounded-heap top-k per window must
  * equal the window-function ranking, and zero-weight rows must be
  * excluded by contract. */
class WeightedSampleStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("per-window heap selection equals the window-function E-S ranking") {
    val ev = Sources.table(spark, "/root/testdata/sf0.001", "events")
    val got = EventsStream.windowedWeightedSample(ev, k = 5)
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2)))
      .toSet

    val u = (conv(substring(md5(col("event_id").cast("string")), 1, 12),
      16, 10).cast("double") + lit(0.5)) / lit(math.pow(2.0, 48))
    val w = Window.partitionBy(col("window_start"))
      .orderBy(col("esk").desc, col("event_id"))
    val want = ev.filter(col("value") > 0)
      .select(date_trunc("hour", col("ts")).as("window_start"),
        col("event_id"), (log(u) / col("value")).as("esk"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .collect().map(r => (r.getTimestamp(0), r.getInt(3).toLong,
        r.getLong(1))).toSet
    assert(want.nonEmpty)
    assert(got == want,
      s"heap ${got.size} vs window ${want.size}; " +
        s"diff=${(want diff got).take(3)}")
  }

  test("zero and negative weights are excluded (E-S domain contract)") {
    val spark0 = spark
    import spark0.implicits._
    val rows = Seq(
      (1L, new java.sql.Timestamp(1700000000000L), 1L, "view", 0.0, "{}"),
      (2L, new java.sql.Timestamp(1700000000000L), 1L, "view", -1.0, "{}"),
      (3L, new java.sql.Timestamp(1700000000000L), 1L, "view", 2.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val ids = EventsStream.windowedWeightedSample(rows, k = 5)
      .collect().map(_.getLong(2)).toSet
    assert(ids == Set(3L))
  }
}
