package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SamplingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ids(n: Int) = {
    val spark0 = spark
    import spark0.implicits._
    (0L until n.toLong).toDF("id")
  }

  test("deterministicSplit: stable, partition-independent, ~87.5/6.25/6.25") {
    val df = ids(4000)
    val a = Sampling.deterministicSplit(df, "id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Sampling.deterministicSplit(df.repartition(13), "id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b) // layout-independent
    val counts = a.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(math.abs(counts("train") - 3500) < 200)
    assert(math.abs(counts("val") - 250) < 100)
    assert(math.abs(counts("test") - 250) < 100)
    // known anchor: md5("0") = cfcd2084... → bucket 0xc = 12 → train
    assert(a(0L) == "train")
  }

  test("deterministicSample: rate respected, subset monotone in rate") {
    val df = ids(8000)
    val s10 = Sampling.deterministicSample(df, "id", 0.1)
      .collect().map(_.getLong(0)).toSet
    val s30 = Sampling.deterministicSample(df, "id", 0.3)
      .collect().map(_.getLong(0)).toSet
    assert(math.abs(s10.size - 800) < 150)
    assert(math.abs(s30.size - 2400) < 300)
    assert(s10.subsetOf(s30)) // nested samples: a row kept at 10% stays at 30%
    assert(Sampling.deterministicSample(df, "id", 0.0).count() == 0)
    assert(Sampling.deterministicSample(df, "id", 1.0).count() == 8000)
  }

  test("stratified: per-stratum rates honored approximately") {
    val spark0 = spark
    import spark0.implicits._
    val df = (0 until 4000).map(i => (i.toLong, if (i % 2 == 0) "a" else "b"))
      .toDF("id", "src")
    val out = Sampling.stratified(df, "src", Map("a" -> 0.5, "b" -> 0.1), seed = 7L)
      .groupBy("src").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(out("a") - 1000L) < 220)
    assert(math.abs(out("b") - 200L) < 120)
  }
}
