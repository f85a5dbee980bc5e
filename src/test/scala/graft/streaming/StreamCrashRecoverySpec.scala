package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.etl.{IncrementalAgg, Maintenance}

/** Crash-recovery through the REAL checkpoint machinery — not the unit-
  * level replay tests (IncrementalAggSinkSpec/UpsertSinkSpec), which call
  * the fold/merge functions directly. Here a query is killed INSIDE a
  * micro-batch, in the worst at-least-once window: the sink's side effect
  * (state fold / table merge) has committed, but the streaming checkpoint
  * has not. Spark must replay that batch id on restart, and the sink's
  * idempotence contract (batch-id marker for the counting fold,
  * greatest-version-wins for the merge) must turn the replay into a no-op
  * so the final result equals the one-shot batch oracle — exactly-once
  * CONTENT on top of at-least-once delivery. */
class StreamCrashRecoverySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Move a single-part parquet file into the watched source dir (the
    * file source lists only the root, no recursion). */
  private def addFile(df: DataFrame, srcDir: java.nio.file.Path,
                      name: String): Unit = {
    val tmp = Files.createTempDirectory("crash-batch")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val listing = Files.list(tmp)
    val part =
      try listing.filter(_.getFileName.toString
        .matches("part-.*\\.parquet")).findFirst().get()
      finally listing.close()
    Files.move(part, srcDir.resolve(s"$name.parquet"))
  }

  /** Run a query expected to die on an injected failure; swallow the
    * in-flight exception and assert the query really terminated dead. */
  private def awaitCrash(q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    scala.util.Try(q.processAllAvailable())
    scala.util.Try(q.awaitTermination(60000))
    scala.util.Try(q.stop())
    assert(q.exception.isDefined, "injected crash did not surface")
  }

  test("IncrementalAggSink: kill after state fold, before checkpoint commit; restart is exactly-once") {
    val spark0 = spark
    import spark0.implicits._
    val stateDir = Files.createTempDirectory("crash-incragg").toString + "/state"
    val srcDir = Files.createTempDirectory("crash-incragg-src")
    val ckpt = Files.createTempDirectory("crash-incragg-ckpt").toString

    val b0 = Seq(("a", 1.0), ("b", 10.0)).toDF("k", "v")
    val b1 = Seq(("a", 3.0), ("c", 7.0)).toDF("k", "v")
    val b2 = Seq(("b", -2.0), ("c", 1.0)).toDF("k", "v")

    addFile(b0, srcDir, "b0")
    def stream = spark.readStream.schema(b0.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir.toString)

    // phase 1: healthy — batch 0 folds and commits
    val q1 = IncrementalAggSink.start(stream, stateDir, Seq("k"), Seq("v"), ckpt)
    try q1.processAllAvailable() finally q1.stop()

    // phase 2: the crash window — SAME checkpoint, same fold, but the
    // batch function dies after IncrementalAgg.refresh promoted the
    // state. Spark never records batch 1 as committed.
    addFile(b1, srcDir, "b1")
    val crashing = stream.writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          IncrementalAgg.refresh(batch.sparkSession, stateDir, batch,
            Seq("k"), Seq("v"), batchId = Some(batchId))
        }
        throw new RuntimeException("injected crash after state commit")
      }
      .start()
    awaitCrash(crashing)
    // the side effect DID land before the crash: state already holds b1
    val midView = IncrementalAgg.finalize(spark.read.parquet(stateDir), Seq("k"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(midView == Map("a" -> 2L, "b" -> 1L, "c" -> 1L),
      s"crash was injected before the fold landed: $midView")

    // phase 3: restart the PRODUCTION sink on the same checkpoint. Spark
    // replays batch 1 (uncommitted) against state that already folded it
    // — the batch-id marker must make the replay a no-op — then batch 2
    // applies normally.
    addFile(b2, srcDir, "b2")
    val q3 = IncrementalAggSink.start(stream, stateDir, Seq("k"), Seq("v"), ckpt)
    try q3.processAllAvailable() finally q3.stop()

    val got = IncrementalAgg.finalize(spark.read.parquet(stateDir), Seq("k"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val want = IncrementalAgg.finalize(
        IncrementalAgg.partials(b0.unionAll(b1).unionAll(b2),
          Seq("k"), Seq("v")),
        Seq("k"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(got == want,
      s"replayed batch double-counted: got $got, want $want")
  }

  test("as-of attribution: buffered state survives restart; file sink stays exactly-once") {
    val spark0 = spark
    import spark0.implicits._
    import org.apache.spark.sql.functions._
    val srcDir = Files.createTempDirectory("crash-asof-src")
    val outDir = Files.createTempDirectory("crash-asof-out").toString
    val ckpt = Files.createTempDirectory("crash-asof-ckpt").toString
    val base = 1700000000000L

    def batch(rows: Seq[(Long, Long, Long, String)]) =
      rows.toDF("event_id", "ms", "user_id", "event_type")
        .select(col("event_id"), timestamp_millis(col("ms")).as("ts"),
          col("user_id"), col("event_type"), lit(1.0).as("value"),
          lit("{}").as("props"))
    val schema = batch(Seq((0L, base, 0L, "click"))).schema
    def start() = {
      val src = spark.readStream.schema(schema).parquet(srcDir.toString)
      EventsStream.asofAttribution(src).toDF()
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").start()
    }
    def results() = spark.read.parquet(outDir)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]))).toSeq.sorted

    // phase 1: click c1 and a purchase still above the watermark — ALL
    // of the answer-relevant state (buffered click + pending purchase)
    // exists only in the state store when the query dies.
    addFile(batch(Seq((101L, base, 1L, "click"),
      (201L, base + 30000, 1L, "purchase"))), srcDir, "b1")
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    assert(results().isEmpty, "purchase above the watermark leaked early")

    // phase 2: restart from the checkpoint; an out-of-order click BEFORE
    // the pending purchase plus a second purchase, with a far click
    // advancing the watermark past both. Correct attribution (p1→c2,
    // p2→c2) requires the restored state to still hold c1, p1 and order
    // c2 between them.
    addFile(batch(Seq((102L, base + 20000, 1L, "click"),
      (202L, base + 10800000, 1L, "purchase"),
      (103L, base + 14400000, 1L, "click"))), srcDir, "b2")
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    assert(results() == Seq((1L, 201L, Some(102L)), (1L, 202L, Some(102L))),
      s"state-restored attribution wrong: ${results()}")

    // phase 3: restart again with only a watermark-advancing event — no
    // purchase is pending, so nothing may re-emit (exactly-once output
    // across two recoveries).
    addFile(batch(Seq((104L, base + 86400000, 1L, "click"))), srcDir, "b3")
    val q3 = start()
    try q3.processAllAvailable() finally q3.stop()
    assert(results() == Seq((1L, 201L, Some(102L)), (1L, 202L, Some(102L))),
      s"restart re-emitted or lost rows: ${results()}")
  }

  test("budgeted interval join: click/purchase buffers survive restart; budget + audit hold across recovery") {
    val spark0 = spark
    import spark0.implicits._
    import org.apache.spark.sql.functions._
    val srcDir = Files.createTempDirectory("crash-budget-src")
    val outDir = Files.createTempDirectory("crash-budget-out").toString
    val ckpt = Files.createTempDirectory("crash-budget-ckpt").toString
    val base = 1700000000000L

    def batch(rows: Seq[(Long, Long, Long, String)]) =
      rows.toDF("event_id", "ms", "user_id", "event_type")
        .select(col("event_id"), timestamp_millis(col("ms")).as("ts"),
          col("user_id"), col("event_type"), lit(1.0).as("value"),
          lit("{}").as("props"))
    val schema = batch(Seq((0L, base, 0L, "click"))).schema
    def start() = {
      val src = spark.readStream.schema(schema).parquet(srcDir.toString)
      EventsStream.intervalJoinBudgeted(src, maxPairsPerPurchase = 2).toDF()
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").start()
    }
    def results() = spark.read.parquet(outDir)
      .collect().map(r => (r.getLong(0),
        Option(r.get(1)).map(_.asInstanceOf[Long]),
        r.getLong(2), r.getLong(3))).toSeq
      .sortBy(t => (t._1, t._2.getOrElse(-1L), t._3))

    // phase 1: three in-window clicks and a purchase still above the
    // watermark — the entire answer (click buffer + pending purchase)
    // exists only in the state store when the query dies.
    addFile(batch(Seq((101L, base, 1L, "click"),
      (102L, base + 10000, 1L, "click"), (103L, base + 20000, 1L, "click"),
      (201L, base + 60000, 1L, "purchase"))), srcDir, "b1")
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    assert(results().isEmpty, "purchase above the watermark leaked early")

    // phase 2: restart from the checkpoint; an out-of-order click BEFORE
    // the pending purchase, plus a far click advancing the watermark past
    // it. Budget 2 must keep the two LATEST of the four candidates
    // (103, 104) — 104 exists only post-restart, 101-103 only in restored
    // state — and audit the two suppressed in ONE overflow row.
    addFile(batch(Seq((104L, base + 30000, 1L, "click"),
      (105L, base + 7200000, 1L, "click"))), srcDir, "b2")
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val want = Seq((1L, None, 201L, 2L),
      (1L, Some(103L), 201L, 0L), (1L, Some(104L), 201L, 0L))
    assert(results() == want,
      s"state-restored budgeted join wrong: ${results()}")

    // phase 3: restart again with only a watermark-advancing event on
    // another user — the emitted purchase must not re-emit and the
    // suppressed pairs must not resurface (exactly-once across two
    // recoveries).
    addFile(batch(Seq((301L, base + 86400000 * 2, 2L, "click"))),
      srcDir, "b3")
    val q3 = start()
    try q3.processAllAvailable() finally q3.stop()
    assert(results() == want,
      s"restart re-emitted or resurfaced rows: ${results()}")
  }

  test("UpsertSink: kill after merge, before checkpoint commit; restart re-merge is a no-op") {
    val spark0 = spark
    import spark0.implicits._
    val tableDir = Files.createTempDirectory("crash-upsert-table").toString
    val srcDir = Files.createTempDirectory("crash-upsert-src")
    val ckpt = Files.createTempDirectory("crash-upsert-ckpt").toString

    (1 to 4).map(k => (k.toLong, 1L, s"base$k")).toDF("k", "version", "v")
      .coalesce(1).write.mode("overwrite").parquet(tableDir)
    val schema = spark.read.parquet(tableDir).schema
    def stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir.toString)

    // phase 1: healthy — batch 0 merges and commits
    addFile(Seq((2L, 2L, "new2")).toDF("k", "version", "v"), srcDir, "b0")
    val q1 = UpsertSink.start(stream, tableDir, "k", "version", ckpt)
    try q1.processAllAvailable() finally q1.stop()

    // phase 2: crash after the merge landed, before the commit
    addFile(Seq((3L, 3L, "new3"), (5L, 1L, "ins5")).toDF("k", "version", "v"),
      srcDir, "b1")
    val crashing = stream.writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          Maintenance.mergeUpsert(batch.sparkSession, tableDir,
            UpsertSink.latestPerKey(batch, "k", "version"), "k", "version")
        }
        throw new RuntimeException("injected crash after merge")
      }
      .start()
    awaitCrash(crashing)
    assert(spark.read.parquet(tableDir).count() == 5,
      "crash was injected before the merge landed")

    // phase 3: production sink restarts, replays batch 1 (same rows
    // re-merge; greatest-version-wins absorbs them), then applies a new
    // batch with a stale row that must still lose.
    addFile(Seq((3L, 0L, "stale3"), (4L, 4L, "new4")).toDF("k", "version", "v"),
      srcDir, "b2")
    val q3 = UpsertSink.start(stream, tableDir, "k", "version", ckpt)
    try q3.processAllAvailable() finally q3.stop()

    val got = spark.read.parquet(tableDir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2)))
      .toMap
    assert(got == Map(
      1L -> (1L, "base1"), 2L -> (2L, "new2"), 3L -> (3L, "new3"),
      4L -> (4L, "new4"), 5L -> (1L, "ins5")),
      s"replayed merge corrupted the table: $got")
  }
}
