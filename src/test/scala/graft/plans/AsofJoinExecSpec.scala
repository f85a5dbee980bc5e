package graft.plans

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.ext.AsofJoin

/** The native plan-node as-of join (AsofJoinNode → AsofJoinStrategy →
  * AsofJoinExec) must be semantically identical to the union+window
  * composition `AsofJoin.backward/forward` — which is itself DuckDB-
  * oracle-anchored via q_x_asof_join — while planning as a co-partitioned
  * streaming merge (two exchanges, no Window, no Union).
  */
class AsofJoinExecSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def randomFrames(seed: Long, nLeft: Int, nRight: Int, nKeys: Int) = {
    val spark0 = spark
    import spark0.implicits._
    val rnd = new java.util.Random(seed)
    def t(): Timestamp = new Timestamp(1700000000000L + rnd.nextInt(100000) * 100L)
    val left = (1 to nLeft).map(i =>
      (i.toLong, rnd.nextInt(nKeys).toLong, t(), rnd.nextDouble()))
      .toDF("event_id", "user_id", "ts", "lv")
    // unique per (key, ts), deduped driver-side so the DF carries no agg
    // (keeps px non-nullable — exercising the forced-nullable binding —
    // and keeps the plan test's exchange count to the join's own two)
    val right = (1 to nRight).map(i =>
        (rnd.nextInt(nKeys).toLong, t(), math.round(rnd.nextDouble() * 100) / 10.0))
      .groupBy(r => (r._1, r._2)).map(_._2.maxBy(_._3)).toSeq
      .toDF("user_id", "ts", "px")
    (left, right)
  }

  private def collectPairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Option[Double])] =
    df.collect().map(r => (r.getAs[Long]("event_id"),
      Option(r.getAs[java.lang.Double]("px")).map(_.toDouble))).toSet

  test("native == composed: backward, forward, tolerance (randomized)") {
    for (seed <- Seq(1L, 2L, 3L)) {
      val (left, right) = randomFrames(seed, nLeft = 300, nRight = 200, nKeys = 7)
      for (tol <- Seq(None, Some(3600L))) {
        val composedB = collectPairs(
          AsofJoin.backward(left, right, "user_id", "ts", Seq("px"), tol))
        val nativeB = collectPairs(
          AsofJoin.native(left, right, "user_id", "ts", Seq("px"), tol))
        assert(nativeB == composedB, s"backward mismatch seed=$seed tol=$tol")
        val composedF = collectPairs(
          AsofJoin.forward(left, right, "user_id", "ts", Seq("px"), tol))
        val nativeF = collectPairs(
          AsofJoin.native(left, right, "user_id", "ts", Seq("px"), tol,
            forward = true))
        assert(nativeF == composedF, s"forward mismatch seed=$seed tol=$tol")
      }
    }
  }

  test("self-join safe: same source on both sides (fresh right expr ids)") {
    val spark0 = spark
    import spark0.implicits._
    val e = Seq(
      (1L, 1L, Timestamp.valueOf("2024-01-01 10:00:05"), 1.0),
      (2L, 1L, Timestamp.valueOf("2024-01-01 10:00:30"), 2.0)
    ).toDF("event_id", "user_id", "ts", "px")
    val out = AsofJoin.native(
      e.select("event_id", "user_id", "ts"),
      e.select($"user_id", $"ts", $"px"), "user_id", "ts", Seq("px"))
    assert(out.collect().length == 2)
  }

  test("keyless users get NULL payload; exact-ts ties match; tolerance gates") {
    val spark0 = spark
    import spark0.implicits._
    val trades = Seq(
      (1L, 1L, Timestamp.valueOf("2024-01-01 10:00:05")),
      (2L, 1L, Timestamp.valueOf("2024-01-01 10:00:30")),
      (3L, 1L, Timestamp.valueOf("2024-01-01 10:02:00")),
      (4L, 2L, Timestamp.valueOf("2024-01-01 10:00:10")),
      (5L, 3L, Timestamp.valueOf("2024-01-01 09:59:59"))
    ).toDF("event_id", "user_id", "ts")
    val quotes = Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:00:00"), 100.0),
      (1L, Timestamp.valueOf("2024-01-01 10:00:30"), 200.0),
      (1L, Timestamp.valueOf("2024-01-01 10:01:00"), 300.0),
      (3L, Timestamp.valueOf("2024-01-01 10:00:00"), 999.0)
    ).toDF("user_id", "ts", "px")
    val out = collectPairs(
      AsofJoin.native(trades, quotes, "user_id", "ts", Seq("px"))).toMap
    assert(out(1L) == Some(100.0) && out(2L) == Some(200.0) &&
      out(3L) == Some(300.0) && out(4L) == None && out(5L) == None)
    val gated = collectPairs(AsofJoin.native(trades, quotes, "user_id", "ts",
      Seq("px"), toleranceSeconds = Some(10L))).toMap
    assert(gated(3L) == None && gated(1L) == Some(100.0))
    val fwd = collectPairs(AsofJoin.native(trades, quotes, "user_id", "ts",
      Seq("px"), forward = true)).toMap
    assert(fwd(1L) == Some(200.0) && fwd(3L) == None && fwd(5L) == Some(999.0))
  }

  test("plan: AsofJoinExec streaming merge — 2 exchanges, no Window/Union") {
    val (left, right) = randomFrames(9L, nLeft = 100, nRight = 80, nKeys = 5)
    val df = AsofJoin.native(left, right, "user_id", "ts", Seq("px"))
    df.collect() // finalize AQE
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("AsofJoin"), s"expected AsofJoinExec in:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 2, s"expected 2 exchanges, plan:\n$plan")
    assert(!plan.contains("Window") && !plan.contains("Union"),
      s"merge shape must not plan a window or union:\n$plan")
  }

  test("payload name collision with left columns is rejected") {
    val (left, right) = randomFrames(4L, 10, 10, 2)
    intercept[IllegalArgumentException] {
      AsofJoin.native(left, right.withColumnRenamed("px", "lv"),
        "user_id", "ts", Seq("lv"))
    }
  }
}
