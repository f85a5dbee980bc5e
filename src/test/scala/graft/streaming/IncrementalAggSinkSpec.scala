package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.etl.IncrementalAgg

/** Streaming MV maintenance: micro-batches fold into the partial-state
  * table; replayed batch ids are no-ops (the marker commits with the
  * state through one rename), and the final view equals the one-shot
  * batch aggregate of everything streamed. */
class IncrementalAggSinkSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("replayed batch ids are no-ops; out-of-order ids don't skip") {
    val spark0 = spark
    import spark0.implicits._
    val dir = Files.createTempDirectory("incragg-replay").toString + "/state"
    val b = Seq(("a", 1.0), ("b", 2.0)).toDF("k", "v")
    IncrementalAgg.refresh(spark, dir, b, Seq("k"), Seq("v"),
      batchId = Some(0L))
    // replay of batch 0: must not double-count
    IncrementalAgg.refresh(spark, dir, b, Seq("k"), Seq("v"),
      batchId = Some(0L))
    val afterReplay = IncrementalAgg
      .finalize(spark.read.parquet(dir), Seq("k"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(afterReplay == Map("a" -> 1L, "b" -> 1L))
    // next batch id applies
    IncrementalAgg.refresh(spark, dir, b, Seq("k"), Seq("v"),
      batchId = Some(1L))
    val after1 = IncrementalAgg.finalize(spark.read.parquet(dir), Seq("k"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(after1 == Map("a" -> 2L, "b" -> 2L))
    // replay of an OLDER id after newer state: still a no-op
    IncrementalAgg.refresh(spark, dir, b, Seq("k"), Seq("v"),
      batchId = Some(0L))
    val after2 = IncrementalAgg.finalize(spark.read.parquet(dir), Seq("k"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(after2 == after1)
  }

  test("multi-batch stream: final view equals the one-shot batch aggregate") {
    val spark0 = spark
    import spark0.implicits._
    val stateDir = Files.createTempDirectory("incragg-sink").toString + "/state"
    val srcDir = Files.createTempDirectory("incragg-src")
    val ckpt = Files.createTempDirectory("incragg-ckpt").toString

    def writeBatchFile(rows: Seq[(String, Double)], name: String): Unit = {
      val tmp = Files.createTempDirectory("incragg-batch")
      rows.toDF("k", "v").coalesce(1)
        .write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).filter(_.getFileName.toString
        .matches("part-.*\\.parquet")).findFirst().get()
      Files.move(part, srcDir.resolve(s"$name.parquet"))
    }

    val all = Seq(
      Seq(("a", 1.0), ("b", 10.0), ("a", 3.0)),
      Seq(("b", -2.0), ("c", 7.0)),
      Seq(("a", 5.0), ("c", 1.0)))
    writeBatchFile(all.head, "b0")
    val schema = spark.read.parquet(srcDir.toString).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir.toString)
    val q = IncrementalAggSink.start(stream, stateDir, Seq("k"), Seq("v"), ckpt)
    try {
      q.processAllAvailable()
      writeBatchFile(all(1), "b1")
      writeBatchFile(all(2), "b2")
      q.processAllAvailable()
    } finally q.stop()

    val got = IncrementalAgg.finalize(spark.read.parquet(stateDir), Seq("k"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(5)))
      .sortBy(_._1)
    // one-shot reference over the concatenation of all batches
    val flat = all.flatten
    val want = flat.groupBy(_._1).map { case (k, vs) =>
      (k, vs.size.toLong, vs.map(_._2).sum,
        vs.map(_._2).sum / vs.size)
    }.toSeq.sortBy(_._1)
    assert(got.toSeq == want)
  }
}
