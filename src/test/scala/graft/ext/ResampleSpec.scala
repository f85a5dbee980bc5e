package graft.ext

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ResampleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  test("forwardFill: aligned grid, ffill semantics, leading NULL, span cap") {
    val spark0 = spark
    import spark0.implicits._
    val obs = Seq(
      (1L, ts("2024-01-01 10:07:00"), 1.0),
      (1L, ts("2024-01-01 10:31:00"), 2.0),
      (1L, ts("2024-01-01 11:22:00"), 3.0),
      (2L, ts("2024-01-01 00:00:30"), 9.0) // single point
    ).toDF("k", "ts", "v")

    val out = Resample.forwardFill(obs, "k", "ts", "v", stepSeconds = 600L)
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1),
        Option(r.getAs[java.lang.Double]("v")).map(_.toDouble)))

    val k1 = out.filter(_._1 == 1L).sortBy(_._2.getTime)
    // grid aligned DOWN to 10-minute multiples: 10:00, 10:10, ..., 11:20
    assert(k1.head._2 == ts("2024-01-01 10:00:00"))
    assert(k1.last._2 == ts("2024-01-01 11:20:00"))
    assert(k1.length == 9)
    val byTs = k1.map(r => r._2 -> r._3).toMap
    assert(byTs(ts("2024-01-01 10:00:00")) == None)      // before first obs
    assert(byTs(ts("2024-01-01 10:10:00")) == Some(1.0)) // filled forward
    assert(byTs(ts("2024-01-01 10:30:00")) == Some(1.0)) // 10:31 not yet seen
    assert(byTs(ts("2024-01-01 10:40:00")) == Some(2.0))
    assert(byTs(ts("2024-01-01 11:20:00")) == Some(2.0)) // 11:22 after last grid point
    // single-observation key: one grid point at the aligned-down start,
    // which PRECEDES the 00:00:30 observation — as-of sampling leaves it
    // NULL (grid instants sample state; they don't bucket future obs)
    val k2 = out.filter(_._1 == 2L)
    assert(k2.length == 1 && k2.head._2 == ts("2024-01-01 00:00:00"))
    assert(k2.head._3 == None)

    // span cap: a key spanning > maxPointsPerKey grid points is dropped
    val wide = obs.union(Seq(
      (3L, ts("2024-01-01 00:00:00"), 1.0),
      (3L, ts("2024-03-01 00:00:00"), 2.0)).toDF("k", "ts", "v"))
    val capped = Resample.forwardFill(wide, "k", "ts", "v", 600L,
      maxPointsPerKey = 100L)
    assert(capped.filter("k = 3").count() == 0)
    assert(capped.filter("k = 1").count() == 9)
  }

  test("twap: step-function weighting, single-event keys report NULL") {
    val spark0 = spark
    import spark0.implicits._
    // u1: v=10 holds 10s, v=20 holds 20s, last value weightless
    //     -> (10*10 + 20*20) / 30 = 16.666..., centi 1666.67
    // u2: one event -> no interval -> NULL span and twap
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, 10.0),
      (1L, ts("2024-01-01 00:00:10"), 2L, 20.0),
      (1L, ts("2024-01-01 00:00:30"), 3L, 99.0),
      (2L, ts("2024-01-01 00:00:05"), 4L, 7.0)
    ).toDF("user_id", "t", "event_id", "value")
    val got = Resample.twap(df, "user_id", "t", "event_id", "value")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)),
         if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(got == Map(
      1L -> (Some(30L), Some(1666.67)),
      2L -> (None, None)))
  }
}
