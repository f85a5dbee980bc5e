package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class PrivacySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def df = {
    val spark0 = spark
    import spark0.implicits._
    // class (a, x): 5 rows; (a, y): 2 rows; (b, x): 1 row
    (Seq.fill(5)(("a", "x")) ++ Seq.fill(2)(("a", "y")) ++ Seq(("b", "x")))
      .zipWithIndex.map { case ((q1, q2), i) => (i.toLong, q1, q2) }
      .toDF("id", "q1", "q2")
  }

  test("kAnonymityAudit: exactly the classes below k, with sizes") {
    val got = Privacy.kAnonymityAudit(df, Seq("q1", "q2"), 3L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(got == Set(("a", "y", 2L), ("b", "x", 1L)))
  }

  test("kAnonymize: suppression leaves a k-anonymous table, survivors intact") {
    val out = Privacy.kAnonymize(df, Seq("q1", "q2"), 3L)
    assert(out.count() == 5L) // only the (a, x) class survives
    // every remaining class is >= k
    val sizes = out.groupBy("q1", "q2").count()
      .collect().map(_.getLong(2))
    assert(sizes.forall(_ >= 3L))
    // surviving rows are the original rows, untouched
    assert(out.select("q1", "q2").distinct().count() == 1L)
    assert(out.select("id").collect().map(_.getLong(0)).sorted
      .sameElements(Array(0L, 1L, 2L, 3L, 4L)))
  }

  test("dpCountRelease: noise matches the driver-side Laplace inverse CDF") {
    val spark0 = spark
    import spark0.implicits._
    val data = (1 to 30).map(i => (i.toLong, s"g${i % 3}"))
      .toDF("id", "g")
    val got = Privacy.dpCountRelease(data, "g", epsilon = 1.0)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def expected(key: String, n: Long): Long = {
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val u = (java.lang.Long.parseLong(md5.take(12), 16) + 0.5) /
        math.pow(2.0, 48)
      val z = u - 0.5
      val noise = -1.0 * (if (z >= 0) 1.0 else -1.0) *
        math.log(1.0 - 2.0 * math.abs(z))
      math.floor((n + noise) * 1000).toLong
    }
    assert(got == Map("g0" -> expected("g0", 10L),
      "g1" -> expected("g1", 10L), "g2" -> expected("g2", 10L)))
    // the mechanism perturbs: some released figure differs from n*1000
    assert(got.values.exists(_ != 10000L))
  }

  test("dpCountRelease: noise scale shrinks as epsilon grows") {
    val spark0 = spark
    import spark0.implicits._
    val data = (1 to 40).map(i => (i.toLong, s"k${i % 4}")).toDF("id", "g")
    def maxAbsErrMilli(eps: Double): Long =
      Privacy.dpCountRelease(data, "g", eps)
        .collect().map(r => math.abs(r.getLong(1) - 10000L)).max
    assert(maxAbsErrMilli(10.0) * 5 < maxAbsErrMilli(0.1),
      "eps=10 noise should be far smaller than eps=0.1 noise")
  }
}
