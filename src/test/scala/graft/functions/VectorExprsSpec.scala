package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.TextExprs._

class VectorExprsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def oneVec(v: Seq[Float]) = {
    val spark0 = spark
    import spark0.implicits._
    Seq(Tuple1(v.toArray)).toDF("v")
  }

  test("l2_normalize: unit norm, direction preserved, zero vector unchanged") {
    val r = oneVec(Seq(3f, 4f))
      .select(l2_normalize(col("v")).as("n")).collect().head
      .getSeq[Float](0)
    assert(math.abs(r(0) - 0.6f) < 1e-6 && math.abs(r(1) - 0.8f) < 1e-6)
    val z = oneVec(Seq(0f, 0f, 0f))
      .select(l2_normalize(col("v"))).collect().head.getSeq[Float](0)
    assert(z == Seq(0f, 0f, 0f))
    // cosine is invariant under normalization
    val emb = graft.sources.Sources
      .table(spark, "/root/testdata/sf0.001", "embeddings").limit(50)
    val both = emb.select(
      cosine_sim(col("embedding"), col("embedding")).as("c1"),
      cosine_sim(l2_normalize(col("embedding")),
        l2_normalize(col("embedding"))).as("c2")).collect()
    both.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-6))
  }

  test("quantize_int8: range bounded, dequantization error bounded by scale/2") {
    val emb = graft.sources.Sources
      .table(spark, "/root/testdata/sf0.001", "embeddings").limit(100)
    val rows = emb.select(col("embedding"),
        quantize_int8(col("embedding")).as("q"),
        quantize_scale(col("embedding")).as("s")).collect()
    rows.foreach { r =>
      val v = r.getSeq[Float](0)
      val q = r.getSeq[Byte](1)
      val s = r.getFloat(2)
      assert(q.length == v.length)
      assert(q.forall(b => b >= -127 && b <= 127))
      v.zip(q).foreach { case (x, b) =>
        assert(math.abs(x - b * s) <= s / 2 + 1e-6, s"x=$x b=$b s=$s")
      }
    }
    // cosine on dequantized vectors stays close to the float cosine
    val sim = emb.as("a").crossJoin(emb.as("b"))
      .limit(200)
      .select(
        cosine_sim(col("a.embedding"), col("b.embedding")).as("cf"),
        cosine_sim(
          transform(quantize_int8(col("a.embedding")),
            x => x.cast("float") * quantize_scale(col("a.embedding"))),
          transform(quantize_int8(col("b.embedding")),
            x => x.cast("float") * quantize_scale(col("b.embedding")))).as("cq"))
      .collect()
    sim.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 0.02))
  }

  test("SQL surface: functions callable after registration") {
    TextExprs.registerSql(spark)
    val r = spark.sql(
      """SELECT l2_normalize(array(3.0F, 4.0F)) AS n,
        |  quantize_int8(array(1.0F, -0.5F, 0.0F)) AS q,
        |  quantize_scale(array(1.0F, -0.5F, 0.0F)) AS s""".stripMargin)
      .collect().head
    assert(math.abs(r.getSeq[Float](0).head - 0.6f) < 1e-6)
    assert(r.getSeq[Byte](1) == Seq[Byte](127, -63, 0)) // round-half-up: -63.5 → -63
    assert(math.abs(r.getFloat(2) - 1.0f / 127f) < 1e-6)
  }
}
