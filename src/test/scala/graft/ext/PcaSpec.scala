package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class PcaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // deterministic synthetic cloud with a planted dominant direction u:
  // x_i = t_i·u + ε_i where t_i sweeps ±5 and ε is a small fixed ripple
  private def planted(dim: Int, n: Int) = {
    val spark0 = spark
    import spark0.implicits._
    val u = Array.tabulate(dim)(d => math.sin(d + 1.0))
    val nrm = math.sqrt(u.map(x => x * x).sum)
    val un = u.map(_ / nrm)
    val rows = (0 until n).map { i =>
      val t = (i - n / 2.0) / (n / 10.0)
      Array.tabulate(dim)(d =>
        (t * un(d) + 0.01 * math.cos(3.0 * i + d)).toFloat).toSeq
    }
    (rows.toDF("embedding"), un)
  }

  test("topComponent: recovers a planted dominant direction, unit norm") {
    val (df, u) = planted(16, 400)
    val v = Pca.topComponent(df, "embedding", iterations = 8)
      .collect().sortBy(_.getLong(0)).map(_.getDouble(1) / 1e6)
    assert(v.length == 16)
    // unit norm (ppm rounding tolerance)
    assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-6)
    // alignment with the planted direction (sign-free)
    val cos = math.abs(v.zip(u).map { case (a, b) => a * b }.sum)
    assert(cos > 0.999, s"cosine to planted direction $cos")
  }

  test("topComponent: deterministic under physical layout") {
    val (df, _) = planted(8, 300)
    val a = Pca.topComponent(df, "embedding").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    val b = Pca.topComponent(df.repartition(11), "embedding").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    assert(a == b)
  }
}
