package graft.operators

import org.apache.spark.sql.functions._

/** Driver-visible checks for the Structured Streaming surface. The
  * streaming operators are spec-verified in EventsStreamSpec; this entry
  * additionally runs one under the driver's correctness gate: a bounded
  * fixture streamed through the real `readStream → dropDuplicatesWithin
  * Watermark → memory sink` path must reproduce the batch answer.
  */
object StreamingQueries {

  private val nextId = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Streaming exact dedup, batch-equivalence form: stream the events
    * parquet as a micro-batch source, dedup on (user_id, event_type)
    * within a horizon covering the fixture, and emit the surviving KEY
    * SET. Which physical row survives per key is arrival-order dependent
    * (not cross-engine checkable), but the key set is deterministic and
    * equals batch DISTINCT — so the full streaming path (source → state
    * store → sink) gets a DuckDB-anchored driver check, not just a spec. */
  val streamDedup = Q(
    "q_s_stream_dedup",
    "Streaming dedup (dropDuplicatesWithinWatermark) key-set = batch DISTINCT",
    (s, dir) => {
      val name = s"graft_stream_dedup_${nextId.incrementAndGet()}"
      // the file stream source needs a DIRECTORY; stage the fixture as a
      // symlink (no copy) in a fresh temp dir
      val stage = java.nio.file.Files.createTempDirectory("graft-stream-q")
      java.nio.file.Files.createSymbolicLink(
        stage.resolve("events.parquet"),
        java.nio.file.Paths.get(dir, "events.parquet"))
      val src = graft.streaming.EventsStream.readEvents(s, stage.toString)
      val q = graft.streaming.EventsStream
        .dedupStream(src, Seq("user_id", "event_type"), watermark = "365 days")
        .writeStream.format("memory").queryName(name).outputMode("append")
        .start()
      try q.processAllAvailable() finally q.stop()
      s.table(name).select(col("user_id"), col("event_type"))
    },
    Some("SELECT DISTINCT user_id, event_type FROM events"))

  val all: Seq[Q] = Seq(streamDedup)
}
