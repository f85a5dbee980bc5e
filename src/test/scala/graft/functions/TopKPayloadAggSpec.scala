package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TopKPayloadAggSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("heap keeps best k by (score desc, id asc) with payloads attached") {
    val h = new TopKPayloadAgg.PHeap(3)
    Seq((0.5, 10L), (0.9, 2L), (0.9, 1L), (0.1, 7L), (0.7, 4L))
      .foreach { case (s, i) => h.insert(s, i, Array(i, i * 10)) }
    val got = h.sorted.toSeq.map { case (id, s, p) => (id, s, p.toSeq) }
    assert(got == Seq(
      (1L, 0.9, Seq(1L, 10L)),
      (2L, 0.9, Seq(2L, 20L)),
      (4L, 0.7, Seq(4L, 40L))))

    val h2 = new TopKPayloadAgg.PHeap(3)
    h2.insert(0.95, 99L, Array(99L, 990L))
    var i = 0
    while (i < h2.size) { h.insert(h2.scores(i), h2.ids(i), h2.payloads(i)); i += 1 }
    assert(h.sorted.map(_._1).toSeq == Seq(99L, 1L, 2L))
    assert(h.sorted.head._3.toSeq == Seq(99L, 990L))
  }

  test("serialize/deserialize roundtrips entries and payloads") {
    val agg = TopKPayloadAgg.TopKByScorePayload(null, null, null, 4)
    val h = new TopKPayloadAgg.PHeap(4)
    h.insert(1.5, 3L, Array(7L, 8L, 9L))
    h.insert(0.5, 1L, Array.empty[Long])
    val back = agg.deserialize(agg.serialize(h))
    val got = back.sorted.toSeq.map { case (id, s, p) => (id, s, p.toSeq) }
    assert(got == Seq((3L, 1.5, Seq(7L, 8L, 9L)), (1L, 0.5, Seq())))
  }

  test("DataFrame aggregate: ids match TopKAgg, payload matches source row") {
    import org.apache.spark.sql.functions._
    val df = spark.range(500).select(
      (col("id") % 5).as("g"),
      col("id").as("nid"),
      (hash(col("id")).cast("double") / 1e9).as("score"),
      array(col("id") * 2, col("id") * 3).as("vec"))
    val viaPayload = df.groupBy(col("g"))
      .agg(TopKPayloadAgg
        .topk_by_score_payload(col("score"), col("nid"), col("vec"), 4)
        .as("top"))
      .select(col("g"), explode(col("top")).as("s"))
      .select(col("g"), col("s.neighbor_id").as("nid"),
        col("s.payload").as("p"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2).toSeq))
    // every returned payload is exactly the source row's vector
    viaPayload.foreach { case (_, nid, p) =>
      assert(p == Seq(nid * 2, nid * 3), s"payload mismatch for $nid")
    }
    // id set matches the payload-free aggregate (same ordering contract)
    val viaPlain = df.groupBy(col("g"))
      .agg(TopKAgg.topk_by_score(col("score"), col("nid"), 4).as("top"))
      .select(col("g"), explode(col("top")).as("s"))
      .select(col("g"), col("s.neighbor_id").as("nid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaPayload.map(t => (t._1, t._2)).toSet == viaPlain)
  }
}
