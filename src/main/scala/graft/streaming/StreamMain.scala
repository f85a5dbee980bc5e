package graft.streaming

import org.apache.spark.sql.SparkSession

/** Executable streaming driver:
  *
  *   runMain graft.streaming.StreamMain <eventsParquetDir>
  *
  * Opens the directory as an unbounded source, runs the watermarked
  * windowed aggregation to a memory sink, drains all available
  * micro-batches, prints the aggregate table.
  */
object StreamMain {
  def main(args: Array[String]): Unit = {
    if (args.length != 1) {
      System.err.println("usage: graft.streaming.StreamMain <eventsParquetDir>")
      sys.exit(2)
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-stream")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val agg = EventsStream.windowedCounts(
      EventsStream.readEvents(spark, args(0)))
    val q = agg.writeStream.format("memory").queryName("win")
      .outputMode("complete").start()
    q.processAllAvailable()
    val rows = spark.table("win").orderBy("window_start", "event_type")
    println(s"[stream] ${rows.count()} aggregate rows:")
    rows.show(20, truncate = false)
    q.stop()
    spark.stop()
  }
}
