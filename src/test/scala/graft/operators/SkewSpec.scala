package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("salted join equals plain join on a skewed key distribution") {
    import spark.implicits._
    // 10k rows, 90% on one hot key
    val large = spark.range(10000)
      .select(when(col("id") % 10 =!= 0, lit(1L)).otherwise(col("id")).as("k"),
        col("id").as("payload"))
    val small = Seq((1L, "hot"), (20L, "cold"), (30L, "cold2"))
      .toDF("k", "label")

    val plain = large.join(small, Seq("k"), "inner")
      .select("k", "payload", "label")
    val salted = Skew.saltedJoin(large, small, "k", 8, col("payload"))
      .select("k", "payload", "label")

    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)

    // the salted shuffle spreads the hot key: join key includes __salt
    val p = Skew.saltedJoin(large, small, "k", 8, col("payload"))
      .queryExecution.executedPlan.toString
    assert(p.contains("__salt"), s"salt column not in join plan:\n$p")
  }

  test("left join preserves unmatched large-side rows exactly once") {
    import spark.implicits._
    val large = Seq((1L, "a"), (2L, "b"), (99L, "unmatched"))
      .toDF("k", "payload")
    val small = Seq((1L, "x"), (2L, "y")).toDF("k", "label")
    val out = Skew.saltedJoin(large, small, "k", 4, col("payload"), "left")
    assert(out.count() == 3)
    assert(out.filter(col("k") === 99L && col("label").isNull).count() == 1)
  }
}
