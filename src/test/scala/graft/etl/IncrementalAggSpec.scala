package graft.etl

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class IncrementalAggSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def fixture = {
    val spark0 = spark
    import spark0.implicits._
    Seq(
      ("a", 1.0), ("a", 3.0), ("b", 10.0),
      ("a", 5.0), ("b", -2.0), ("c", 7.5)
    ).toDF("k", "v")
  }

  test("partials + finalize == direct aggregate") {
    val got = IncrementalAgg.finalize(
        IncrementalAgg.partials(fixture, Seq("k"), Seq("v")), Seq("k"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).sortBy(_._1)
    assert(got.toSeq == Seq(
      ("a", 3L, 9.0, 1.0, 5.0, 3.0),
      ("b", 2L, 8.0, -2.0, 10.0, 4.0),
      ("c", 1L, 7.5, 7.5, 7.5, 7.5)))
  }

  test("merge is order-independent and matches the one-shot partials") {
    val b1 = fixture.filter(col("v") > 2)
    val b2 = fixture.filter(col("v") <= 2)
    val p1 = IncrementalAgg.partials(b1, Seq("k"), Seq("v"))
    val p2 = IncrementalAgg.partials(b2, Seq("k"), Seq("v"))
    val direct = IncrementalAgg.partials(fixture, Seq("k"), Seq("v"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.head.toString)
    assert(rows(IncrementalAgg.merge(p1, p2, Seq("k"))).sameElements(rows(direct)))
    assert(rows(IncrementalAgg.merge(p2, p1, Seq("k"))).sameElements(rows(direct)))
  }

  test("NULL measure values: avg uses the non-null count (SQL semantics)") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq(("a", Some(2.0)), ("a", None), ("a", Some(4.0)))
      .toDF("k", "v")
    val out = IncrementalAgg.finalize(
        IncrementalAgg.partials(df, Seq("k"), Seq("v")), Seq("k"))
      .collect().head
    assert(out.getAs[Long]("n_rows") == 3L)   // rows counted
    assert(out.getAs[Double]("avg_v") == 3.0) // (2+4)/2, not /3
  }

  test("legacy state without cnt columns upgrades on refresh (cnt := __n)") {
    val dir = java.nio.file.Files.createTempDirectory("incragg-legacy")
      .toString + "/state"
    // simulate a pre-cnt_m on-disk state
    IncrementalAgg.partials(fixture.limit(3), Seq("k"), Seq("v"))
      .drop("cnt_v")
      .write.parquet(dir)
    IncrementalAgg.refresh(spark, dir, fixture.exceptAll(fixture.limit(3)),
      Seq("k"), Seq("v"))
    val got = IncrementalAgg.finalize(spark.read.parquet(dir), Seq("k"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(got.toSeq == Seq(("a", 3L, 9.0), ("b", 2L, 8.0), ("c", 1L, 7.5)))
  }

  test("refresh: bootstrap, fold two batches, survive and equal recompute") {
    val dir = java.nio.file.Files.createTempDirectory("incragg").toString + "/state"
    val b1 = fixture.limit(3)
    val b2 = fixture.exceptAll(b1)
    IncrementalAgg.refresh(spark, dir, b1, Seq("k"), Seq("v"))
    IncrementalAgg.refresh(spark, dir, b2, Seq("k"), Seq("v"))
    val got = IncrementalAgg.finalize(spark.read.parquet(dir), Seq("k"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(got.toSeq == Seq(("a", 3L, 9.0), ("b", 2L, 8.0), ("c", 1L, 7.5)))
    // no staging leftovers visible to partition discovery
    val parent = new org.apache.hadoop.fs.Path(dir).getParent
    val fs = parent.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val leftovers = fs.listStatus(parent).map(_.getPath.getName)
      .filter(n => n.contains("incragg") && !n.startsWith("_"))
    assert(leftovers.isEmpty)
  }
}
