package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.Sources

/** The streaming funnel must equal the batch funnel over every user whose
  * history is final under the watermark — including users whose ordering
  * information arrives OUT OF ORDER across micro-batches (a late view
  * below the already-buffered clicks must validate them). The chained
  * dedup→window distinct-users stream must equal batch COUNT(DISTINCT)
  * on every finalized hour. */
class FunnelStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def batchFunnel(dir: String) = {
    val e = Sources.table(spark, dir, "events")
      .select(col("user_id"), col("event_type"), col("ts"))
    val v = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("mv"))
    val c = e.join(v, Seq("user_id"))
      .filter(col("event_type") === "click" && col("ts") >= col("mv"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("mc"))
    val p = e.join(c, Seq("user_id"))
      .filter(col("event_type") === "purchase" && col("ts") >= col("mc"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("mp"))
    e.select(col("user_id")).distinct()
      .join(v, Seq("user_id"), "left")
      .join(c, Seq("user_id"), "left")
      .join(p, Seq("user_id"), "left")
      .select(col("user_id"),
        when(col("mp").isNotNull, 3L)
          .when(col("mc").isNotNull, 2L)
          .when(col("mv").isNotNull, 1L)
          .otherwise(0L).as("funnel_stage"))
  }

  test("streaming funnel = batch funnel over watermark-final users (sf0.001)") {
    val dir = Files.createTempDirectory("graft-funnel")
    Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("batch1.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val out = EventsStream.funnelStream(
      EventsStream.readEvents(spark, dir.toString))
    val q = out.writeStream.format("memory").queryName("funnel_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("funnel_out")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

      val ev = Sources.table(spark, "/root/testdata/sf0.001", "events")
      val wm = ev.agg(max(unix_millis(col("ts")))).head().getLong(0) - 60000L
      val done = ev.groupBy(col("user_id"))
        .agg(max(unix_millis(col("ts"))).as("lastMs"))
        .filter(col("lastMs") + 1 < wm)
        .select(col("user_id"))
      val want = batchFunnel("/root/testdata/sf0.001")
        .join(done, "user_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

      assert(got == want)
      assert(got.nonEmpty)
      // every stage must actually occur in the fixture output
      assert(got.map(_._2).subsetOf(Set(0L, 1L, 2L, 3L)))
    } finally q.stop()
    }

  test("late view across micro-batches validates earlier-buffered clicks") {
    val dir = Files.createTempDirectory("graft-funnel-ooo")
    def write(name: String, rows: Seq[(Long, Timestamp, Long, String, Double)])
        : Unit = {
      val tmp = Files.createTempDirectory("funnel-batch")
      rows.toDF("event_id", "ts", "user_id", "event_type", "value")
        .withColumn("props", lit("{}"))
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val listing = Files.list(tmp)
      val part = try listing
        .filter(_.getFileName.toString.matches("part-.*\\.parquet"))
        .findFirst().get()
      finally listing.close()
      Files.move(part, dir.resolve(s"$name.parquet"))
    }

    def ts(s: String) = Timestamp.valueOf(s)
    // batch 1: user 1's click+purchase arrive BEFORE their view does;
    // user 2's click predates the (eventual) view — must NOT count.
    // Everything sits inside one 45-second span so the views arriving in
    // batch 2 (event-time earlier than the clicks) are still ABOVE the
    // post-batch-1 watermark (10:00:45 − 1 min): the supported
    // out-of-orderness is bounded by the watermark delay, and rows below
    // it are dropped by the late filter before they reach the operator.
    write("b1", Seq(
      (10L, ts("2024-01-01 10:00:30"), 1L, "click", 1.0),
      (11L, ts("2024-01-01 10:00:45"), 1L, "purchase", 5.0),
      (20L, ts("2024-01-01 10:00:10"), 2L, "click", 1.0)))

    val out = EventsStream.funnelStream(
      EventsStream.readEvents(spark, dir.toString))
    val q = out.writeStream.format("memory").queryName("funnel_ooo")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // batch 2: the out-of-order views, plus a far-future event
      // advancing the watermark past everything so both users finalize
      write("b2", Seq(
        (12L, ts("2024-01-01 10:00:00"), 1L, "view", 0.0),
        (21L, ts("2024-01-01 10:00:20"), 2L, "view", 0.0),
        (99L, ts("2024-06-01 00:00:00"), 9L, "signup", 0.0)))
      q.processAllAvailable()
      val got = spark.table("funnel_ooo")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      // user 1: late view 10:00:00 validates the already-buffered click
      // 10:00:30, which validates the purchase 10:00:45 → stage 3
      assert(got(1L) == 3L)
      // user 2: their only click (10:00:10) PRECEDES the view (10:00:20)
      // → the click must not count → stage 1
      assert(got(2L) == 1L)
      assert(!got.contains(9L)) // still pending under the watermark
    } finally q.stop()
  }

  test("view-less user: below-watermark clicks prune without changing the stage") {
    // User 7 streams clicks every batch but no view until late — the shape
    // where compact()'s watermark floor matters (bound=None kept EVERY
    // click before the fix). Old clicks fall below the advancing watermark
    // and are provably dead (a view validating them would arrive late), so
    // pruning them must not change the final stage; a prune that is too
    // aggressive (dropping ABOVE-watermark events) would break stage 2/3.
    val dir = Files.createTempDirectory("graft-funnel-prune")
    def write(name: String, rows: Seq[(Long, Timestamp, Long, String, Double)])
        : Unit = {
      val tmp = Files.createTempDirectory("funnel-prune-batch")
      rows.toDF("event_id", "ts", "user_id", "event_type", "value")
        .withColumn("props", lit("{}"))
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val listing = Files.list(tmp)
      val part = try listing
        .filter(_.getFileName.toString.matches("part-.*\\.parquet"))
        .findFirst().get()
      finally listing.close()
      Files.move(part, dir.resolve(s"$name.parquet"))
    }
    def ts(s: String) = Timestamp.valueOf(s)

    write("b1", Seq((70L, ts("2024-01-01 10:00:00"), 7L, "click", 1.0)))
    val out = EventsStream.funnelStream(
      EventsStream.readEvents(spark, dir.toString))
    val q = out.writeStream.format("memory").queryName("funnel_prune")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // batch 2: wm is now 09:59 — click@10:00 still above it, kept
      write("b2", Seq((71L, ts("2024-01-01 10:30:00"), 7L, "click", 1.0)))
      q.processAllAvailable()
      // batch 3: wm 10:29 — click@10:00 is BELOW the watermark now and
      // prunes (a view <= 10:00 would be late); click@10:30 survives
      write("b3", Seq((72L, ts("2024-01-01 11:00:00"), 7L, "click", 1.0)))
      q.processAllAvailable()
      // batch 4: the view (above wm 10:59), plus a click and purchase
      // after it — the events stage 3 is built from
      write("b4", Seq(
        (73L, ts("2024-01-01 11:10:00"), 7L, "view", 0.0),
        (74L, ts("2024-01-01 11:11:00"), 7L, "click", 1.0),
        (75L, ts("2024-01-01 11:12:00"), 7L, "purchase", 9.0)))
      q.processAllAvailable()
      // batch 5: far-future pacer finalizes user 7
      write("b5", Seq((99L, ts("2024-06-01 00:00:00"), 9L, "signup", 0.0)))
      q.processAllAvailable()
      val got = spark.table("funnel_prune")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      // view@11:10 → first valid click 11:11 → purchase 11:12 → stage 3;
      // the pruned 10:00 click is < view anyway, so semantics agree
      assert(got(7L) == 3L)
    } finally q.stop()
  }

  test("streaming hopping windows = batch sliding aggregation, exact cents") {
    val dir = Files.createTempDirectory("graft-hop")
    Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("batch1.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val out = EventsStream.hoppingCounts(
      EventsStream.readEvents(spark, dir.toString))
    val q = out.writeStream.format("memory").queryName("hop_out")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("hop_out").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
          r.getDouble(3))).toSet
      val want = Sources.table(spark, "/root/testdata/sf0.001", "events")
        .groupBy(window(col("ts"), "1 hour", "15 minutes"),
          col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("value") * 100, 0).cast("long")).as("vc"))
        .select(col("window.start"), col("event_type"), col("n"),
          (col("vc") / 100.0).as("sum_value"))
        .collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
          r.getDouble(3))).toSet
      assert(got == want)
      assert(got.nonEmpty)
      // overlap sanity: events land in 4 windows, so the per-window row
      // count sum is 4x the tumbling count sum
      val n = Sources.table(spark, "/root/testdata/sf0.001", "events").count()
      assert(got.toSeq.map(_._3).sum == 4L * n)
    } finally q.stop()
  }

  test("left-outer interval join: batch pairs + NULL rows for evicted unmatched clicks") {
    val dir = Files.createTempDirectory("graft-ssjo")
    Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("batch1.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val out = EventsStream.clickToPurchaseLeftJoin(
      EventsStream.readEvents(spark, dir.toString))
    val q = out.writeStream.format("memory").queryName("ssjo_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("ssjo_out").collect()
        .map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2))).toSet

      val e = Sources.table(spark, "/root/testdata/sf0.001", "events")
      val c = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"),
          col("ts").as("click_ts"))
      val p = e.filter(col("event_type") === "purchase")
        .select(col("user_id").as("pu"), col("event_id").as("purchase_id"),
          col("ts").as("purchase_ts"))
      val pairs = c.join(p, col("user_id") === col("pu") &&
          col("click_ts") <= col("purchase_ts") &&
          col("click_ts") >= col("purchase_ts") - expr("INTERVAL 24 HOURS"))
        .select(col("user_id"), col("click_id"), col("purchase_id"))
      val wm = math.min(
        e.filter(col("event_type") === "click")
          .agg(max(unix_millis(col("ts")))).head().getLong(0),
        e.filter(col("event_type") === "purchase")
          .agg(max(unix_millis(col("ts")))).head().getLong(0)) - 60000L
      val unmatched = c
        .join(pairs.select(col("click_id")).distinct(), Seq("click_id"),
          "left_anti")
        .filter(unix_millis(col("click_ts")) + 86400000L < wm)
        .select(col("user_id"), col("click_id"))
      val want = pairs.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet ++
        unmatched.collect().map(r => (r.getLong(0), r.getLong(1), -1L)).toSet

      assert(got == want)
      // both behaviors must actually occur in the fixture
      assert(got.exists(_._3 == -1L) && got.exists(_._3 != -1L))
    } finally q.stop()
  }

  test("dedup→window chain = batch COUNT(DISTINCT) per finalized hour") {
    val dir = Files.createTempDirectory("graft-distinct")
    Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("batch1.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val out = EventsStream.windowedDistinctUsers(
      EventsStream.readEvents(spark, dir.toString))
    val q = out.writeStream.format("memory").queryName("distinct_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("distinct_out")
        .collect().map(r => (r.getTimestamp(0), r.getLong(1))).toSet

      val ev = Sources.table(spark, "/root/testdata/sf0.001", "events")
      val wm = ev.agg(max(unix_millis(col("ts")))).head().getLong(0) -
        3900000L
      val want = ev
        .groupBy(date_trunc("hour", col("ts")).as("window_start"))
        .agg(count_distinct(col("user_id")).as("n_users"))
        .filter(unix_millis(col("window_start")) + 3600000L <= wm)
        .collect().map(r => (r.getTimestamp(0), r.getLong(1))).toSet

      assert(got == want)
      assert(got.nonEmpty)
    } finally q.stop()
  }
}
