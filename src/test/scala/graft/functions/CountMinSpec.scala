package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Count-min sketch invariants (Cormode & Muthukrishnan '05): estimates
  * never undercount; overcount is bounded by ε·N (ε ≈ e/width); sketches
  * merge additively (union = sum). */
class CountMinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val depth = 4
  private val width = 2048

  /** Skewed stream: item i ∈ [1, 100] appears i times (N = 5050). */
  private val stream: Seq[Long] =
    (1 to 100).flatMap(i => Seq.fill(i)(i.toLong))

  private def sketchOf(items: Seq[Long]): Array[Long] = {
    val agg = new CountMinAgg(depth, width)
    items.foldLeft(agg.zero)(agg.reduce)
  }

  test("never undercounts; overcount within eps*N") {
    val sk = sketchOf(stream)
    val n = stream.size
    val epsN = math.ceil(math.E / width * n).toLong + 1
    (1 to 100).foreach { i =>
      val est = CountMinAgg.estimate(sk, i.toLong, depth, width)
      assert(est >= i.toLong, s"undercount for $i: $est")
      assert(est <= i.toLong + epsN, s"overcount for $i: $est > $i + $epsN")
    }
    // absent items estimate at most eps*N (usually 0 at this load factor)
    val ghost = CountMinAgg.estimate(sk, 999999L, depth, width)
    assert(ghost <= epsN)
  }

  test("inner product estimates the exact join size, never undercounting") {
    // A: item i in [1,100] appears i times; B: evens in [2,100] appear
    // 3 times each. Exact inner product = sum over evens of i*3.
    val a = sketchOf(stream)
    val bItems = (1 to 50).flatMap(i => Seq.fill(3)(2L * i))
    val b = sketchOf(bItems)
    val exact = (1 to 50).map(i => 2L * i * 3L).sum
    val est = CountMinAgg.innerProduct(a, b, depth, width)
    assert(est >= exact, s"undercount: $est < $exact")
    val bound = exact +
      3L * stream.size * bItems.size / width
    assert(est <= bound, s"overcount: $est > $bound")
    // disjoint key sets: estimate must collapse to (near) zero
    val c = sketchOf(Seq.fill(100)(1000001L))
    assert(CountMinAgg.innerProduct(a, c, depth, width) <=
      3L * stream.size * 100 / width)
  }

  test("merge of half-sketches == sketch of whole") {
    val (a, b) = stream.splitAt(stream.size / 2)
    val agg = new CountMinAgg(depth, width)
    val merged = agg.merge(sketchOf(a), sketchOf(b))
    assert(merged.toSeq == sketchOf(stream).toSeq)
  }

  test("Spark aggregation path: map-side partial merge, same estimates") {
    val spark0 = spark
    import spark0.implicits._
    val df = stream.toDF("h").repartition(7)
    val cm = udaf(new CountMinAgg(depth, width),
      org.apache.spark.sql.Encoders.scalaLong)
    val viaSpark = df.select(cm(col("h")).as("sk"))
      .head().getAs[scala.collection.Seq[Long]]("sk").toArray
    assert(viaSpark.toSeq == sketchOf(stream).toSeq)
    // and the codegen estimate expression agrees with the direct call
    val est = df.distinct()
      .select(col("h"),
        TextExprs.countmin_estimate(col("h"), viaSpark, depth, width)
          .as("est"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1 to 100).foreach { i =>
      assert(est(i.toLong) ==
        CountMinAgg.estimate(viaSpark, i.toLong, depth, width))
    }
  }
}
