package graft.etl

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class AnalyzeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("footer-only stats: rows, files, per-column min/max/nulls") {
    val spark0 = spark
    import spark0.implicits._
    val dir = Files.createTempDirectory("graft-analyze").toString + "/t"
    val df = (0L until 5000L)
      .map(i => (i, if (i % 10 == 0) None else Some(s"v$i")))
      .toDF("id", "payload")
    df.repartition(4).write.parquet(dir)

    val st = Analyze.analyze(spark, dir)
    assert(st.files == 4)
    assert(st.rows == 5000)
    assert(st.compressedBytes > 0 &&
      st.uncompressedBytes >= st.compressedBytes)
    val byName = st.columns.map(c => c.column -> c).toMap
    assert(byName.keySet == Set("id", "payload"))
    assert(byName("id").nullCount == 0)
    assert(byName("payload").nullCount == 500)
    assert(byName("id").min.contains("0"))
    assert(byName("id").max.contains("4999"))
  }

  test("partitioned table: recurses into dt= leaves; rows add up") {
    val spark0 = spark
    import spark0.implicits._
    val dir = Files.createTempDirectory("graft-analyze-p").toString + "/t"
    (0L until 300L).map(i => (i, s"2024-01-0${i % 3 + 1}"))
      .toDF("id", "dt")
      .write.partitionBy("dt").parquet(dir)
    val st = Analyze.analyze(spark, dir)
    assert(st.rows == 300)
    // dt is a path column — footers only carry id
    assert(st.columns.map(_.column) == Seq("id"))
  }
}
