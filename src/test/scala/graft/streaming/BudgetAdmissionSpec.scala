package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.Sources

/** The streaming budget admission must equal the batch two-window
  * (cumsum → running-max) take-while cut over finalized users — including
  * across micro-batch splits, where the fold carries in state — and the
  * prefix semantics must hold under negative values (running max, not
  * plain cumsum) and reject later-fitting events (take-while, not
  * knapsack). */
class BudgetAdmissionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def runStream(srcDir: String, budgetCenti: Long,
                        name: String): Map[Long, (Long, Long)] = {
    val src = spark.readStream
      .schema(EventsStream.rawSchema(
        org.apache.spark.sql.types.LongType))
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val out = EventsStream.budgetAdmission(src, budgetCenti)
    val q = out.toDF().writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      spark.table(name).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    } finally {
      q.stop()
      spark.catalog.dropTempView(name)
    }
  }

  private def write(dir: java.nio.file.Path,
                    rows: Seq[(Long, Long, Long, String, Double)]): Unit =
    rows.map { case (eid, ns, uid, et, v) => (eid, ns, uid, et, v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(dir.toString)

  private val base = 1700000000000000000L // ns
  private val minNs = 60L * 1000000000L

  test("take-while: a later event that would fit is still rejected") {
    val dir = Files.createTempDirectory("graft-budget-unit")
    write(dir, Seq(
      (1L, base, 9L, "view", 2.0),          // cum 200
      (2L, base + minNs, 9L, "view", 1.5),  // cum 350
      (3L, base + 2 * minNs, 9L, "view", 3.0), // cum 650 > 500 -> reject
      (4L, base + 3 * minNs, 9L, "view", 0.5), // would fit; still rejected
      // a far-future closer advances the watermark past user 9
      (5L, base + 2000L * minNs, 99L, "view", 1.0)))
    val got = runStream(dir.toString, budgetCenti = 500L, "budget_unit")
    assert(got == Map(9L -> ((2L, 350L))),
      s"expected only finalized user 9 admitted (2, 350): $got")
  }

  test("running max, not cumsum: negative values cannot reopen admission") {
    val dir = Files.createTempDirectory("graft-budget-neg")
    write(dir, Seq(
      (1L, base, 7L, "view", 2.0),             // cum 200, max 200 admit
      (2L, base + minNs, 7L, "view", -1.0),    // cum 100, max 200 admit
      (3L, base + 2 * minNs, 7L, "view", 6.0), // cum 700 > 300 reject
      (4L, base + 3 * minNs, 7L, "refund", -4.0), // cum 300; max 700 reject
      (5L, base + 2000L * minNs, 99L, "view", 1.0)))
    val got = runStream(dir.toString, budgetCenti = 300L, "budget_neg")
    assert(got == Map(7L -> ((2L, 100L))),
      s"negative tail must stay rejected once the prefix overflowed: $got")
  }

  test("multi-batch stream = batch window cut over finalized users") {
    // split the fixture into 4 event-time-ordered part files: the fold of
    // a user whose events span parts must carry across micro-batches
    val dir = Files.createTempDirectory("graft-budget-mb")
    val ev = Sources.table(spark, "/root/testdata/sf0.001", "events")
      .withColumn("part", ntile(4).over(
        Window.orderBy(col("ts"), col("event_id"))))
    val flat = Files.createTempDirectory("graft-budget-flat")
    (1 to 4).foreach { p =>
      val sub = Files.createTempDirectory("graft-budget-part")
      ev.filter(col("part") === p)
        .select(col("event_id"), (unix_micros(col("ts")) * 1000).as("ts"),
          col("user_id"), col("event_type"), col("value"), col("props"))
        .coalesce(1).write.mode("overwrite").parquet(sub.toString)
      val src = sub.toFile.listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = flat.resolve(f"b$p%02d.parquet")
      Files.copy(src.toPath, dst)
      dst.toFile.setLastModified(1000000000000L + p * 60000L)
    }
    val budget = 300000L
    val got = runStream(flat.toString, budget, "budget_mb")

    val e = Sources.table(spark, "/root/testdata/sf0.001", "events")
      .select(col("user_id"), col("event_id"), col("ts"),
        (unix_micros(col("ts")) / 1000).cast("long").as("ems"),
        round(col("value") * 100, 0).cast("long").as("vc"))
    val wm = e.agg(max(col("ems"))).head.getLong(0) - 60000L
    val ord = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val want = e
      .withColumn("cum", sum(col("vc")).over(ord))
      .withColumn("cummax", max(col("cum")).over(ord))
      .groupBy(col("user_id"))
      .agg(max(col("ems")).as("last_ms"),
        sum(when(col("cummax") <= budget, 1L).otherwise(0L)).as("n"),
        sum(when(col("cummax") <= budget, col("vc")).otherwise(0L)).as("sp"))
      .filter(col("last_ms") + 1 < wm)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(want.nonEmpty, "no finalized users — vacuous fixture")
    assert(got == want,
      s"stream ${got.size} users vs batch ${want.size}; " +
        s"diff=${(want.toSet diff got.toSet).take(3)}")
  }
}
