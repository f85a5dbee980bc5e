package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Streaming CDC-apply: micro-batches of versioned change rows merge into
  * a parquet table; newer versions win, stale updates are ignored, and the
  * table stays correct across multiple batches. */
class UpsertSinkSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("multi-batch stream of versioned updates merges with version-wins semantics") {
    val spark0 = spark
    import spark0.implicits._

    val tableDir = Files.createTempDirectory("graft-upsert-table").toString
    val srcDir = Files.createTempDirectory("graft-upsert-src")
    val ckpt = Files.createTempDirectory("graft-upsert-ckpt").toString

    // base: keys 1..5 at version 1
    (1 to 5).map(k => (k.toLong, 1L, s"base$k")).toDF("k", "version", "v")
      .coalesce(1).write.mode("overwrite").parquet(tableDir)

    val schema = spark.read.parquet(tableDir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir.toString)
    val q = UpsertSink.start(stream, tableDir, "k", "version", ckpt)

    def addBatch(rows: Seq[(Long, Long, String)], name: String): Unit = {
      // the file source lists only the watched root (no recursion): write
      // the batch aside, then move its part file in as <name>.parquet
      val tmp = Files.createTempDirectory("graft-upsert-batch")
      rows.toDF("k", "version", "v").coalesce(1)
        .write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).filter(_.getFileName.toString
        .matches("part-.*\\.parquet")).findFirst().get()
      Files.move(part, srcDir.resolve(s"$name.parquet"))
    }

    try {
      // batch 1: update k=2 to v2, insert k=6; intra-batch duplicate for
      // k=4 at the same version — deterministic tiebreak keeps the larger
      // struct ("dup-b")
      addBatch(Seq((2L, 2L, "new2"), (6L, 1L, "ins6"),
        (4L, 5L, "dup-a"), (4L, 5L, "dup-b")), "b1")
      q.processAllAvailable()
      val after1 = spark.read.parquet(tableDir)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2)))
        .toMap
      assert(after1(2L) == (2L, "new2"))
      assert(after1(6L) == (1L, "ins6"))
      assert(after1(4L) == (5L, "dup-b"))
      assert(after1(1L) == (1L, "base1"))
      assert(after1.size == 6)

      // batch 2: STALE update for k=2 (version 0 — must not clobber v2),
      // genuine update for k=3
      addBatch(Seq((2L, 0L, "stale2"), (3L, 3L, "new3")), "b2")
      q.processAllAvailable()
      val after2 = spark.read.parquet(tableDir)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2)))
        .toMap
      assert(after2(2L) == (2L, "new2"), "stale update clobbered a newer row")
      assert(after2(3L) == (3L, "new3"))
      assert(after2.size == 6)
    } finally q.stop()
  }
}
