package graft.ext

/** Morton/Z-order bit interleaving — multi-dimensional clustering for data
  * layout (the technique behind Delta/Iceberg OPTIMIZE ZORDER BY): sorting
  * by the interleaved key co-locates rows close in BOTH dimensions, so
  * per-file min/max ranges stay narrow on each column and scan pruning
  * works for filters on either one. A single-column sort gives perfect
  * pruning on that column and none on the other; z-order trades a little
  * of each for useful pruning on both.
  *
  * Pure-JVM kernel, called from codegen (functions.TextExprs.ZOrderKey).
  */
object ZOrder {

  /** Spread the low 32 bits of v into the even bit positions of a long. */
  @inline private def spread(v0: Long): Long = {
    var v = v0 & 0xffffffffL
    v = (v | (v << 16)) & 0x0000ffff0000ffffL
    v = (v | (v << 8)) & 0x00ff00ff00ff00ffL
    v = (v | (v << 4)) & 0x0f0f0f0f0f0f0f0fL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  /** Interleave the low 32 bits of x (even positions) and y (odd): the
    * Morton code. Order-preserving for NON-NEGATIVE inputs — rank- or
    * bucket-normalize signed/skewed columns first. */
  def interleave(x: Long, y: Long): Long = spread(x) | (spread(y) << 1)
}
