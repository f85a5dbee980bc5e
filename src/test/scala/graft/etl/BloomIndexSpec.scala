package graft.etl

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.Sources

/** Per-file Bloom sidecar: point lookups scan a strict subset of files on
  * a key-clustered table, with results identical to the full scan, and
  * absent keys prune everything (modulo fpp). */
class BloomIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def writeClustered(): String = {
    val dir = Files.createTempDirectory("graft-bloom").toString
    // range-cluster orders by custkey into 8 files: each file holds a
    // narrow custkey slice, the layout bloom skipping rewards
    Sources.table(spark, "/root/testdata/sf0.01", "orders")
      .repartitionByRange(8, col("o_custkey"))
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("point lookup: subset of files scanned, same rows as full scan") {
    val dir = writeClustered()
    BloomIndex.build(spark, dir, "o_custkey",
      expectedPerFile = 10000, numBits = 1L << 20)

    val probe = 123L
    val (rows, stats) = BloomIndex.readPointLookup(spark, dir, "o_custkey", probe)
    assert(stats.totalFiles == 8)
    assert(stats.scannedFiles < stats.totalFiles,
      s"bloom pruned nothing: $stats")
    val got = rows.select("o_orderkey").collect().map(_.getLong(0)).toSet
    val want = spark.read.parquet(dir).filter(col("o_custkey") === probe)
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    assert(got == want)
    assert(want.nonEmpty, "probe key should exist in sf0.01 orders")
  }

  test("INT key column probed with a Long value still hashes correctly") {
    val dir = Files.createTempDirectory("graft-bloom-int").toString
    Sources.table(spark, "/root/testdata/sf0.01", "part")
      .repartitionByRange(4, col("p_size")) // p_size is INT
      .write.mode("overwrite").parquet(dir)
    BloomIndex.build(spark, dir, "p_size",
      expectedPerFile = 1000, numBits = 1L << 18)
    // probe passed as a Scala Long — must cast to the column's INT type
    // before hashing, or every file would be (wrongly) pruned
    val (rows, stats) = BloomIndex.readPointLookup(spark, dir, "p_size", 5L)
    assert(rows.count() > 0, s"typed-probe lookup found nothing: $stats")
    assert(stats.scannedFiles >= 1)
  }

  test("absent key: every file pruned (within fpp), empty result") {
    val dir = writeClustered()
    BloomIndex.build(spark, dir, "o_custkey",
      expectedPerFile = 10000, numBits = 1L << 20)
    val (rows, stats) = BloomIndex.readPointLookup(
      spark, dir, "o_custkey", 999999999L)
    assert(rows.count() == 0)
    // 8 files at fpp << 1%: a false positive here is ~impossible
    assert(stats.scannedFiles == 0, s"unexpected bloom hits: $stats")
  }
}
