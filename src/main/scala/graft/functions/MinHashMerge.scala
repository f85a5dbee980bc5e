package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed aggregate merging per-document minhash signatures into one
  * corpus/group-level signature (element-wise min — the minhash of a union
  * of sets is the element-wise min of the sets' signatures, Broder '97).
  *
  * With Catalyst this aggregates partially on the map side: each input
  * partition collapses to ONE k-long array before the exchange, so a
  * per-group signature over 100 TB shuffles |groups| × k longs total.
  * Register with `functions.udaf(MinHashMerge)` for DataFrame/SQL use.
  */
object MinHashMerge extends Aggregator[Array[Long], Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.empty

  private def minInto(acc: Array[Long], x: Array[Long]): Array[Long] =
    if (acc.isEmpty) x.clone()
    else if (x.isEmpty) acc
    else {
      require(acc.length == x.length,
        s"signature length mismatch: ${acc.length} vs ${x.length}")
      var i = 0
      while (i < acc.length) { if (x(i) < acc(i)) acc(i) = x(i); i += 1 }
      acc
    }

  override def reduce(b: Array[Long], a: Array[Long]): Array[Long] = minInto(b, a)
  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = minInto(b1, b2)
  override def finish(r: Array[Long]): Array[Long] = r

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  /** Estimated Jaccard between two equal-length signatures: fraction of
    * agreeing components. */
  def estimatedJaccard(a: Array[Long], b: Array[Long]): Double = {
    if (a.isEmpty || b.isEmpty) return 0.0
    var same = 0
    var i = 0
    while (i < a.length) { if (a(i) == b(i)) same += 1; i += 1 }
    same.toDouble / a.length
  }
}
