package graft.etl

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.Sources

class MaintenanceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("compact: many small files collapse, data identical, report sane") {
    val spark0 = spark
    import spark0.implicits._
    val dir = Files.createTempDirectory("graft-compact").toString + "/t"
    val df = (0L until 5000L).map(i => (i, s"row_$i")).toDF("id", "payload")
    df.repartition(64).write.parquet(dir) // simulate a small-file mess
    val before = spark.read.parquet(dir)
      .orderBy("id").collect().map(_.toSeq)

    val report = Maintenance.compact(spark, dir, targetFileBytes = 1L << 30)
    assert(report.filesBefore == 64)
    assert(report.filesAfter == 1)
    assert(report.bytes > 0)
    val after = spark.read.parquet(dir).orderBy("id").collect().map(_.toSeq)
    assert(after.toSeq == before.toSeq)
    // idempotent: compacting a compacted table is a no-op shape-wise
    assert(Maintenance.compact(spark, dir, 1L << 30).filesAfter == 1)
  }

  test("compact: Hive-partitioned table keeps its dt= layout and data") {
    val spark0 = spark
    import spark0.implicits._
    val dir = Files.createTempDirectory("graft-compact-part").toString + "/t"
    val df = (0L until 2000L)
      .map(i => (i, s"2024-01-0${i % 3 + 1}", s"row_$i")).toDF("id", "dt", "v")
    df.repartition(16).write.partitionBy("dt").parquet(dir)
    val before = spark.read.parquet(dir)
      .orderBy("id").collect().map(_.toSeq)

    val report = Maintenance.compact(spark, dir, targetFileBytes = 1L << 30)
    assert(report.filesAfter == 3, "one file per dt partition")
    assert(report.filesBefore > report.filesAfter)

    // layout preserved: dt= subdirectories still present → pruning works
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val subdirs = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(_.isDirectory).map(_.getPath.getName).toSet
    assert(subdirs.count(_.startsWith("dt=")) == 3, s"got $subdirs")

    val after = spark.read.parquet(dir).orderBy("id").collect().map(_.toSeq)
    assert(after.toSeq == before.toSeq)
  }

  test("writePartitionedIncremental: dynamic overwrite touches only incoming partitions") {
    val spark0 = spark
    import spark0.implicits._
    val dir = Files.createTempDirectory("graft-incr").toString + "/t"
    val day1 = Seq((1L, "2024-01-01", "a"), (2L, "2024-01-01", "b"))
      .toDF("id", "dt", "v")
    val day2 = Seq((3L, "2024-01-02", "c")).toDF("id", "dt", "v")
    Sources.writePartitionedIncremental(day1.union(day2), dir, Seq("dt"))
    assert(spark.read.parquet(dir).count() == 3)

    // late-data rewrite of day2 only; day1 must survive untouched
    val day2fix = Seq((3L, "2024-01-02", "c2"), (4L, "2024-01-02", "d"))
      .toDF("id", "dt", "v")
    Sources.writePartitionedIncremental(day2fix, dir, Seq("dt"))
    val out = spark.read.parquet(dir)
    assert(out.count() == 4)
    assert(out.filter(col("dt") === "2024-01-01").count() == 2) // intact
    assert(out.filter(col("dt") === "2024-01-02" && col("v") === "c").count() == 0)
    assert(out.filter(col("v") === "c2").count() == 1)
  }
}
