package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.Sources

/** The streaming late-data quarantine must equal the batch running-max
  * frontier audit — including when the arrival sequence is split across
  * MICRO-BATCHES (the per-key frontier carries in two longs of state) —
  * and its state must evict for keys idle past the watermark. */
class LateQuarantineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val arrivalExpr =
    "((event_id DIV 50) * 7 + event_id % 7) * 10000000 + event_id"

  private def batchQuarantine(dir: String, latenessUs: Long) = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("arrival_seq"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    Sources.table(spark, dir, "events")
      .withColumn("arrival_seq", expr(arrivalExpr))
      .withColumn("frontier_us", max(unix_micros(col("ts"))).over(w))
      .filter(col("frontier_us") - unix_micros(col("ts")) > latenessUs)
      .select(col("user_id"), col("event_id"),
        (col("frontier_us") - unix_micros(col("ts"))).as("lateness_us"))
  }

  private def runStream(srcDir: String, latenessUs: Long,
                        name: String): Set[(Long, Long, Long)] = {
    // readEvents' int64-nanos path, plus the per-file trigger that forces
    // real multi-batch execution (the fixture writers below store ts as
    // nanos longs, matching the driver testdata encoding)
    val src = spark.readStream
      .schema(EventsStream.rawSchema(
        org.apache.spark.sql.types.LongType))
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .withColumn("arrival_seq", expr(arrivalExpr))
    val out = EventsStream.lateQuarantine(src, "arrival_seq", latenessUs)
    val q = out.toDF().writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    } finally {
      q.stop()
      spark.catalog.dropTempView(name)
    }
  }

  test("multi-batch stream = batch frontier audit, frontier carried in state") {
    val dir = Files.createTempDirectory("graft-late")
    // split the fixture into 4 arrival-ordered part files: the frontier of
    // a user whose events span parts must persist across micro-batches
    val ev = Sources.table(spark, "/root/testdata/sf0.001", "events")
      .withColumn("arrival_seq", expr(arrivalExpr))
      .orderBy(col("arrival_seq"))
      .withColumn("part", ntile(4).over(
        org.apache.spark.sql.expressions.Window.orderBy(col("arrival_seq"))))
    (1 to 4).foreach { p =>
      ev.filter(col("part") === p)
        .select(col("event_id"),
          (unix_micros(col("ts")) * 1000).as("ts"),
          col("user_id"), col("event_type"), col("value"), col("props"))
        .coalesce(1).write.mode("overwrite")
        .parquet(dir.resolve(f"part$p%02d").toString)
    }
    // re-stage as a flat dir of files in lexicographic = arrival order
    val flat = Files.createTempDirectory("graft-late-flat")
    (1 to 4).foreach { p =>
      val src = dir.resolve(f"part$p%02d").toFile.listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = flat.resolve(f"b$p%02d.parquet")
      Files.copy(src.toPath, dst)
      // FileStreamSource drains the initial listing in modification-time
      // order; same-millisecond copies would leave the arrival order up
      // to listing luck, so stamp strictly increasing mtimes
      dst.toFile.setLastModified(1000000000000L + p * 60000L)
    }
    val lateness = 3600L * 1000000L
    val got = runStream(flat.toString, lateness, "late_multi")
    val want = batchQuarantine("/root/testdata/sf0.001", lateness)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want,
      s"stream ${got.size} rows vs batch ${want.size}: " +
        s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    assert(want.nonEmpty, "fixture produced no late events — vacuous test")
  }

  test("in-order single key never quarantines; one regression does") {
    val dir = Files.createTempDirectory("graft-late-unit")
    val base = 1700000000000000000L // ns
    val m = 60L * 1000000000L // one minute in ns
    val rows = Seq(
      // arrival_seq encodes directly as event_id here (all DIV 50 == 0)
      (1L, base, 9L, "view", 1.0, "{}"),
      (2L, base + 10L * m, 9L, "click", 1.0, "{}"),
      (3L, base + 20L * m, 9L, "view", 1.0, "{}"),
      // event 4 regresses 2 h behind the frontier set by event 3
      (4L, base + 20L * m - 120L * m, 9L, "view", 1.0, "{}"),
      (5L, base + 30L * m, 9L, "view", 1.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(dir.toString)
    val got = runStream(dir.toString, 3600L * 1000000L, "late_unit")
    assert(got == Set((9L, 4L, 7200L * 1000000L)))
  }
}
