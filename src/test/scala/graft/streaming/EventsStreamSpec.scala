package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.Sources

/** Streaming correctness via the memory sink: a parquet-backed micro-batch
  * stream must produce the same windowed aggregates as the batch plan over
  * identical data, and stateful session stats must accumulate across
  * micro-batches. */
class EventsStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def stageDir(): String = {
    val dir = Files.createTempDirectory("graft-stream")
    Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("batch1.parquet"), StandardCopyOption.REPLACE_EXISTING)
    dir.toAbsolutePath.toString
  }

  test("windowed agg over the stream matches the batch computation") {
    val dir = stageDir()
    val streamed = EventsStream.windowedCounts(
      EventsStream.readEvents(spark, dir))
    val q = streamed.writeStream
      .format("memory").queryName("win_out").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("win_out")
        .select(col("window_start"), col("event_type"), col("n"),
          round(col("sum_value"), 2).as("sum_value"))
        .collect().map(_.toSeq).toSet
      val batch = Sources.table(spark, "/root/testdata/sf0.001", "events")
        .groupBy(date_trunc("hour", col("ts")).as("window_start"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
        .collect().map(_.toSeq).toSet
      assert(got == batch)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("session state accumulates across micro-batches") {
    val dir = stageDir()
    val sessions = EventsStream.sessionStats(
      EventsStream.readEvents(spark, dir))
    val q = sessions.toDF().writeStream
      .format("memory").queryName("sess_out").outputMode("update").start()
    try {
      q.processAllAvailable()
      val after1 = spark.table("sess_out")
        .groupBy("user_id").agg(max("n_events").as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

      // second micro-batch: same file again → counts must double
      Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"),
        Paths.get(dir, "batch2.parquet"), StandardCopyOption.REPLACE_EXISTING)
      q.processAllAvailable()
      val after2 = spark.table("sess_out")
        .groupBy("user_id").agg(max("n_events").as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

      val batchCounts = Sources.table(spark, "/root/testdata/sf0.001", "events")
        .groupBy("user_id").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(after1 == batchCounts)
      assert(after2 == batchCounts.map { case (k, v) => k -> v * 2 })
    } finally q.stop()
  }
}
