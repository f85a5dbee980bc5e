package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** SpaceSaving invariants (Metwally et al. 2005 + the mergeable-summaries
  * combine): tracked estimates never undercount, est − err never
  * overcounts, every item above the N/capacity threshold is tracked, and
  * the guarantees survive partial aggregation under any partitioning. */
class SpaceSavingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val cap = 8

  /** Skewed stream over 50 items: three dominant heavies (2000/800/400)
    * over a light tail — item 1 exceeds even the 4×N/cap merged-summary
    * threshold, so the missed-heavy check is non-vacuous in every test. */
  private val stream: Seq[Long] =
    Seq.fill(2000)(1L) ++ Seq.fill(800)(2L) ++ Seq.fill(400)(3L) ++
      (4 to 50).flatMap(i => Seq.fill(200 / i + 1)(i.toLong))
  private val exact: Map[Long, Long] =
    stream.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
  private val n = stream.size.toLong

  private def checkInvariants(entries: Seq[(Long, Long, Long)],
                              marginFactor: Long): Unit = {
    val tracked = entries.map(_._1).toSet
    entries.foreach { case (item, est, err) =>
      val truth = exact.getOrElse(item, 0L)
      assert(est >= truth, s"undercount for $item: est=$est true=$truth")
      assert(est - err <= truth,
        s"overclaim for $item: est-err=${est - err} true=$truth")
    }
    exact.foreach { case (item, c) =>
      if (c > marginFactor * n / cap)
        assert(tracked(item), s"missed heavy hitter $item (count $c)")
    }
  }

  test("single-stream: bounds hold and top heavies are tracked exactly") {
    val agg = new SpaceSavingAgg(cap)
    val sk = agg.finish(stream.foldLeft(agg.zero)(agg.reduce))
    val entries = SpaceSavingAgg.entries(sk)
    assert(entries.size == cap)
    checkInvariants(entries, marginFactor = 1L)
    // un-merged SpaceSaving is exact for items that never got evicted:
    // item 1 (count 2000) dominates and must carry err 0 and est == true
    val top = entries.head
    assert(top._1 == 1L && top._2 == 2000L && top._3 == 0L)
  }

  test("merge: invariants hold for arbitrary splits and merge orders") {
    val agg = new SpaceSavingAgg(cap)
    // deterministic pseudo-shuffle, then 7 uneven chunks merged two ways
    // key on each occurrence's own position so identical items scatter
    // across chunks (indexOf would give every occurrence the same key and
    // keep duplicates contiguous, never exercising interleaved merges)
    val shuffled = stream.zipWithIndex
      .sortBy { case (x, i) => graft.ext.TextHashing.mix64(x * 31 + i) }
      .map(_._1)
    val chunks = shuffled.grouped((shuffled.size / 7) + 1).toSeq
      .map(c => agg.finish(c.foldLeft(agg.zero)(agg.reduce)))
    val leftFold = chunks.reduceLeft(agg.merge)
    val rightFold = chunks.reduceRight(agg.merge)
    // merged trimmed summaries sum error bounds → allow the 4× margin the
    // anchor query uses
    checkInvariants(SpaceSavingAgg.entries(agg.finish(leftFold)), 4L)
    checkInvariants(SpaceSavingAgg.entries(agg.finish(rightFold)), 4L)
  }

  test("distributed: same invariants via udaf over 1 and 8 partitions") {
    val spark0 = spark
    import spark0.implicits._
    val ss = udaf(new SpaceSavingAgg(cap),
      org.apache.spark.sql.Encoders.scalaLong)
    Seq(1, 8).foreach { parts =>
      val sk = stream.toDF("item").repartition(parts)
        .select(ss(col("item")).as("sk"))
        .head().getAs[scala.collection.Seq[Long]]("sk").toArray
      val entries = SpaceSavingAgg.entries(sk)
      assert(entries.size == cap)
      checkInvariants(entries, marginFactor = 4L)
      // summary is capacity-bounded no matter the partitioning
      assert(sk.length == 3 * cap)
    }
  }

  test("small domain: capacity >= cardinality degrades to exact counts") {
    val agg = new SpaceSavingAgg(64)
    val sk = agg.finish(stream.foldLeft(agg.zero)(agg.reduce))
    SpaceSavingAgg.entries(sk).foreach { case (item, est, err) =>
      assert(est == exact(item) && err == 0L)
    }
  }
}
