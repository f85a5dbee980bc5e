package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

import graft.ext.TextHashing

/** Count-min sketch over 64-bit item hashes (Cormode & Muthukrishnan '05):
  * `depth` rows × `width` counters; an item increments one counter per row
  * (row-seeded remix of its hash); its estimate is the MIN over its row
  * counters. Estimates NEVER undercount; they overcount by at most
  * ε·N (ε ≈ e/width) with probability 1 − (1/2)^depth — fixed memory
  * regardless of cardinality, the frequency analogue of HLL.
  *
  * The buffer is one flat long array (depth·width ≈ 64 KB at the defaults):
  * Catalyst aggregates it partially map-side, so a corpus-wide frequency
  * sketch over 100 TB shuffles |partitions| sketches, not the token stream.
  * Counter arrays merge by element-wise ADD (the sketch of a union is the
  * sum of the sketches).
  */
final class CountMinAgg(val depth: Int = 4, val width: Int = 2048)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  require(depth > 0 && width > 0, "depth and width must be positive")

  override def zero: Array[Long] = Array.empty

  private def alloc(): Array[Long] = new Array[Long](depth * width)

  override def reduce(b0: Array[Long], item: Long): Array[Long] = {
    val b = if (b0.isEmpty) alloc() else b0
    var d = 0
    while (d < depth) {
      b(d * width + CountMinAgg.slot(item, d, width)) += 1L
      d += 1
    }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

  override def finish(r: Array[Long]): Array[Long] =
    if (r.isEmpty) alloc() else r

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object CountMinAgg {

  /** Row-d counter index for an item hash: splitmix-style remix seeded by
    * the row, reduced mod width. */
  def slot(item: Long, d: Int, width: Int): Int = {
    val h = TextHashing.mix64(item ^ (0x9e3779b97f4a7c15L * (d + 1)))
    ((h % width + width) % width).toInt
  }

  /** Inner-product estimate of Σ_k f_A(k)·f_B(k) from two sketches built
    * with the SAME (depth, width): min over rows of the row dot product
    * (Cormode & Muthukrishnan '05 §4.2). Never undercounts (every row dot
    * product = true inner product + non-negative collision mass) and
    * overcounts by ≤ ε·N_A·N_B per row in expectation (ε ≈ 1/width, e/width
    * at the tail) — i.e. a JOIN SIZE estimate: |A ⋈ B| on an equi-key is
    * exactly the frequency inner product. A planner over 100 TB inputs
    * reads two map-side-mergeable 64 KB sketches instead of scanning
    * either table to choose broadcast vs sort-merge. */
  def innerProduct(a: Array[Long], b: Array[Long], depth: Int,
                   width: Int): Long = {
    require(a.length == depth * width && b.length == depth * width,
      s"sketch lengths ${a.length}/${b.length} != $depth*$width")
    var est = Long.MaxValue
    var d = 0
    while (d < depth) {
      var s = 0L
      var w = 0
      while (w < width) { s += a(d * width + w) * b(d * width + w); w += 1 }
      if (s < est) est = s
      d += 1
    }
    est
  }

  /** Point estimate from a finished sketch (min over the item's counters). */
  def estimate(sketch: Array[Long], item: Long, depth: Int, width: Int): Long = {
    require(sketch.length == depth * width,
      s"sketch length ${sketch.length} != $depth*$width")
    var est = Long.MaxValue
    var d = 0
    while (d < depth) {
      val c = sketch(d * width + slot(item, d, width))
      if (c < est) est = c
      d += 1
    }
    est
  }
}
