package graft.ext

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.etl.Analyze
import graft.sources.Sources

class ZOrderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("interleave: order-preserving Morton code, bit-exact") {
    assert(ZOrder.interleave(0L, 0L) == 0L)
    assert(ZOrder.interleave(1L, 0L) == 1L)
    assert(ZOrder.interleave(0L, 1L) == 2L)
    assert(ZOrder.interleave(3L, 3L) == 15L)
    assert(ZOrder.interleave(0xffffffffL, 0xffffffffL) == -1L) // all 64 bits
    // monotone in each argument when the other is fixed
    val xs = (0L until 64L)
    assert(xs.map(ZOrder.interleave(_, 7L)) == xs.map(ZOrder.interleave(_, 7L)).sorted)
    assert(xs.map(ZOrder.interleave(7L, _)) == xs.map(ZOrder.interleave(7L, _)).sorted)
  }

  test("rankBuckets: monotone, near-uniform occupancy on skewed data") {
    val spark0 = spark
    import spark0.implicits._
    // heavily skewed: x^3 over 0..999, plus negatives — raw Morton on this
    // would pack most rows into a few codes
    val df = (0L until 2000L).map(i => (i, (i - 1000) * (i - 1000) * (i - 1000)))
      .toDF("id", "skewed")
    val bucketed = Sources.rankBuckets(df, "skewed", 16, "b")
    val rows = bucketed.select("skewed", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    // monotone in the input
    assert(rows.map(_._2).sorted.toSeq == rows.map(_._2).toSeq)
    // all buckets in range and occupancy within 2x of uniform
    val counts = rows.groupBy(_._2).map(_._2.length)
    assert(rows.forall(r => r._2 >= 0 && r._2 < 16))
    assert(counts.max <= 2 * (2000 / 16), s"skewed occupancy: $counts")
  }

  test("writeZOrdered narrows per-file ranges on BOTH columns vs round-robin") {
    val spark0 = spark
    import spark0.implicits._
    // a 100×100 grid: every (x, y) combination once — the worst case for
    // single-column sorting (perfect on one axis, useless on the other)
    val grid = (for (x <- 0L until 100L; y <- 0L until 100L) yield (x, y))
      .toDF("x", "y")
    val zDir = Files.createTempDirectory("graft-z").toString + "/t"
    val rrDir = Files.createTempDirectory("graft-rr").toString + "/t"
    Sources.writeZOrdered(grid, zDir, "x", "y", numFiles = 16)
    grid.repartition(16).write.parquet(rrDir)

    def meanWidth(dir: String, col: String): Double = {
      val ranges = Analyze.perFileRange(spark, dir, col)
      assert(ranges.nonEmpty)
      ranges.map(r => r.max.toLong - r.min.toLong).sum.toDouble / ranges.size
    }
    for (c <- Seq("x", "y")) {
      val z = meanWidth(zDir, c)
      val rr = meanWidth(rrDir, c)
      // round-robin files span ~the whole 0..99 range on both axes; a
      // 16-file z-order layout covers ~quadrants (≤ ~1/2 span each axis)
      assert(z < rr * 0.7, s"col $c: z-order mean width $z vs round-robin $rr")
    }
    // data survives the layout intact
    val back = spark.read.parquet(zDir).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(back.size == 10000)
  }
}
