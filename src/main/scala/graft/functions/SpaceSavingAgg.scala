package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** SpaceSaving heavy-hitter summary over 64-bit item hashes (Metwally,
  * Agrawal & El Abbadi 2005, "Efficient computation of frequent and top-k
  * elements in data streams"), with the mergeable-summaries combine rule
  * (Agarwal et al. 2012): at most `capacity` tracked items, each carrying
  * an estimated count and an error bound, such that for every tracked item
  *
  *   true ≤ est   and   est − err ≤ true
  *
  * and any item whose true count exceeds N/capacity is guaranteed tracked
  * (N = stream length) — the deterministic-guarantee complement to the
  * count-min sketch row ([[CountMinAgg]]): count-min answers "how often is
  * X?", SpaceSaving answers "WHICH items are frequent?" without knowing
  * the candidates up front. Fixed memory regardless of cardinality.
  *
  * Distribution shape: the buffer is a flat long array of (item, count,
  * err) triples, partially aggregated map-side — a corpus-wide
  * heavy-hitter pass over 100 TB shuffles |partitions| summaries of
  * 3·capacity longs each, never the token stream. The merge rule keeps
  * both invariants under ANY merge order (shuffle-fetch order is not
  * deterministic): items missing from a FULL side are charged that side's
  * minimum tracked count as both count and error — the largest count the
  * missing side could have absorbed into an untracked item — then the
  * union is trimmed back to the top `capacity` by count. Estimates (not
  * the guarantees) therefore vary run-to-run; consumers compare against
  * the invariants, not golden values (see HeavyHittersAnchor +
  * SpaceSavingSpec).
  *
  * A production single-node implementation indexes the counters with the
  * Stream-Summary linked structure for O(1) updates; this linear-scan form
  * is O(capacity) per item, which at the intended capacities (≤ a few
  * hundred) stays cache-resident and codegen-friendly.
  */
final class SpaceSavingAgg(val capacity: Int = 64)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  require(capacity > 0, "capacity must be positive")

  override def zero: Array[Long] = Array.empty

  // Buffer layout: 3·size longs, triple i = (item, count, err) at 3i.
  private def size(b: Array[Long]): Int = b.length / 3

  override def reduce(b: Array[Long], item: Long): Array[Long] = {
    var i = 0
    while (i < b.length) {
      if (b(i) == item) { b(i + 1) += 1L; return b }
      i += 3
    }
    if (size(b) < capacity) {
      val out = java.util.Arrays.copyOf(b, b.length + 3)
      out(b.length) = item
      out(b.length + 1) = 1L
      out(b.length + 2) = 0L
      out
    } else {
      // evict the min-count entry (deterministic tiebreak: lowest item):
      // the newcomer inherits minCount+1 with err = minCount — it may have
      // occurred up to minCount times while untracked.
      var mi = 0; var i2 = 3
      while (i2 < b.length) {
        if (b(i2 + 1) < b(mi + 1) ||
          (b(i2 + 1) == b(mi + 1) && b(i2) < b(mi))) mi = i2
        i2 += 3
      }
      val minCount = b(mi + 1)
      b(mi) = item; b(mi + 1) = minCount + 1L; b(mi + 2) = minCount
      b
    }
  }

  private def minCountOf(b: Array[Long]): Long = {
    var m = Long.MaxValue
    var i = 1
    while (i < b.length) { if (b(i) < m) m = b(i); i += 3 }
    m
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      // A full side bounds any untracked item's true count by its min
      // tracked count; a non-full side has seen every one of its items.
      val chargeA = if (size(a) == capacity) minCountOf(a) else 0L
      val chargeB = if (size(b) == capacity) minCountOf(b) else 0L
      val m = scala.collection.mutable.LongMap.empty[(Long, Long)]
      var i = 0
      while (i < a.length) { m(a(i)) = (a(i + 1), a(i + 2)); i += 3 }
      i = 0
      while (i < b.length) {
        val (c, e) = m.getOrElse(b(i), (chargeA, chargeA))
        m(b(i)) = (c + b(i + 1), e + b(i + 2))
        i += 3
      }
      // items tracked only in a: charge b's bound. Membership against b
      // goes through a sorted key array + binary search — O(cap·log cap)
      // total, vs the O(cap²) linear rescan this replaced.
      if (chargeB > 0L) {
        val bKeys = new Array[Long](size(b))
        i = 0
        while (i < b.length) { bKeys(i / 3) = b(i); i += 3 }
        java.util.Arrays.sort(bKeys)
        i = 0
        while (i < a.length) {
          val key = a(i)
          if (java.util.Arrays.binarySearch(bKeys, key) < 0) {
            val (c, e) = m(key)
            m(key) = (c + chargeB, e + chargeB)
          }
          i += 3
        }
      }
      val kept = m.toSeq.map { case (k, (c, e)) => (k, c, e) }
        .sortBy { case (k, c, _) => (-c, k) }
        .take(capacity)
      val out = new Array[Long](kept.length * 3)
      var o = 0
      kept.foreach { case (k, c, e) =>
        out(o) = k; out(o + 1) = c; out(o + 2) = e; o += 3
      }
      out
    }

  /** Final summary: triples sorted by (count DESC, item ASC). */
  override def finish(r: Array[Long]): Array[Long] = {
    val n = size(r)
    val idx = Array.tabulate(n)(identity).sortBy(i => (-r(3 * i + 1), r(3 * i)))
    val out = new Array[Long](r.length)
    var o = 0
    idx.foreach { i =>
      out(o) = r(3 * i); out(o + 1) = r(3 * i + 1); out(o + 2) = r(3 * i + 2)
      o += 3
    }
    out
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object SpaceSavingAgg {

  /** Decode a finished summary into (item, est, err) triples. */
  def entries(sketch: Array[Long]): Seq[(Long, Long, Long)] =
    sketch.grouped(3).map(t => (t(0), t(1), t(2))).toSeq
}
