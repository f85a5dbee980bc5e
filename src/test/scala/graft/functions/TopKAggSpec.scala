package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TopKAggSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("heap keeps the best k by (score desc, id asc), merge included") {
    val h = new TopKAgg.Heap(3)
    Seq((0.5, 10L), (0.9, 2L), (0.9, 1L), (0.1, 7L), (0.7, 4L))
      .foreach { case (s, i) => h.insert(s, i) }
    assert(h.sorted.toSeq == Seq((1L, 0.9), (2L, 0.9), (4L, 0.7)))

    val h2 = new TopKAgg.Heap(3)
    h2.insert(0.95, 99L); h2.insert(0.2, 5L)
    // merge h2 into h (same op the partial-agg exchange performs)
    var i = 0
    while (i < h2.size) { h.insert(h2.scores(i), h2.ids(i)); i += 1 }
    assert(h.sorted.toSeq == Seq((99L, 0.95), (1L, 0.9), (2L, 0.9)))
  }

  test("k larger than group size returns everything, ordered") {
    val h = new TopKAgg.Heap(10)
    Seq((0.1, 3L), (0.3, 1L)).foreach { case (s, i) => h.insert(s, i) }
    assert(h.sorted.toSeq == Seq((1L, 0.3), (3L, 0.1)))
  }

  test("aggregate over a DataFrame matches a window row_number plan") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = spark.range(1000).select(
      (col("id") % 7).as("g"),
      col("id").as("nid"),
      (hash(col("id")).cast("double") / 1e9).as("score"))
    val viaAgg = df.groupBy(col("g").as("vec_id"))
      .agg(TopKAgg.topk_by_score(col("score"), col("nid"), 5).as("top"))
      .select(col("vec_id"), posexplode(col("top")).as(Seq("r0", "s")))
      .select(col("vec_id"), (col("r0") + 1).as("rank"),
        col("s.neighbor_id").as("nid"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val w = Window.partitionBy(col("g")).orderBy(col("score").desc, col("nid").asc)
    val viaWindow = df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .collect().map(r => (r.getAs[Long]("g"), r.getAs[Int]("rank"),
        r.getAs[Long]("nid"))).toSet
    assert(viaAgg == viaWindow)
  }
}
