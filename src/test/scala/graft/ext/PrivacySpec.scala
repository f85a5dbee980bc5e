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

  private def laplaceMilli(hexDigest: String, n: Long,
                           eps: Double): Long = {
    val u = (java.lang.Long.parseLong(hexDigest.take(12), 16) + 0.5) /
      math.pow(2.0, 48)
    val z = u - 0.5
    val noise = -1.0 / eps * (if (z >= 0) 1.0 else -1.0) *
      math.log(1.0 - 2.0 * math.abs(z))
    math.floor((n + noise) * 1000).toLong
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def hmacSha256Hex(secret: String, msg: String): String = {
    val mac = javax.crypto.Mac.getInstance("HmacSHA256")
    mac.init(new javax.crypto.spec.SecretKeySpec(
      secret.getBytes("UTF-8"), "HmacSHA256"))
    mac.doFinal(msg.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  test("deterministicLaplaceRelease: noise matches the driver-side " +
       "Laplace inverse CDF of the PUBLIC md5 (test-only, not private)") {
    val spark0 = spark
    import spark0.implicits._
    val data = (1 to 30).map(i => (i.toLong, s"g${i % 3}"))
      .toDF("id", "g")
    val got = Privacy.deterministicLaplaceRelease(data, "g", epsilon = 1.0)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def expected(key: String, n: Long): Long =
      laplaceMilli(md5Hex(key), n, 1.0)
    assert(got == Map("g0" -> expected("g0", 10L),
      "g1" -> expected("g1", 10L), "g2" -> expected("g2", 10L)))
    // the mechanism perturbs: some released figure differs from n*1000
    assert(got.values.exists(_ != 10000L))
  }

  test("deterministicLaplaceRelease: noise scale shrinks as epsilon grows") {
    val spark0 = spark
    import spark0.implicits._
    val data = (1 to 40).map(i => (i.toLong, s"k${i % 4}")).toDF("id", "g")
    def maxAbsErrMilli(eps: Double): Long =
      Privacy.deterministicLaplaceRelease(data, "g", eps)
        .collect().map(r => math.abs(r.getLong(1) - 10000L)).max
    assert(maxAbsErrMilli(10.0) * 5 < maxAbsErrMilli(0.1),
      "eps=10 noise should be far smaller than eps=0.1 noise")
  }

  test("dpCountRelease (keyed): identical mechanism, reproducible WITH " +
       "the secret, and the public-md5 recompute does NOT invert it") {
    val spark0 = spark
    import spark0.implicits._
    val data = (1 to 30).map(i => (i.toLong, s"g${i % 3}")).toDF("id", "g")
    val secret = "release-2026-08-16-xyzzy"
    val got = Privacy.dpCountRelease(data, "g", epsilon = 1.0, secret)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // Same mechanism as the public variant, keyed digest: an auditor
    // holding the secret re-derives every released figure exactly.
    def expected(key: String, n: Long): Long =
      laplaceMilli(hmacSha256Hex(secret, key), n, 1.0)
    assert(got == Map("g0" -> expected("g0", 10L),
      "g1" -> expected("g1", 10L), "g2" -> expected("g2", 10L)))
    // An observer recomputing the PUBLIC md5 noise (the attack the
    // test-only variant admits) gets a different figure for at least one
    // group — the keyed noise is not the public noise.
    def publicGuess(key: String, n: Long): Long =
      laplaceMilli(md5Hex(key), n, 1.0)
    assert(Seq("g0", "g1", "g2").exists(k => got(k) != publicGuess(k, 10L)),
      "keyed release reproduced the public-md5 noise — secret not mixed in")
    // A different secret yields a different release for at least one group.
    val other = Privacy.dpCountRelease(data, "g", epsilon = 1.0,
        secret = "a-different-secret")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got != other, "two secrets produced the identical release")
  }

  test("dpCountRelease: empty secret is rejected loudly") {
    val spark0 = spark
    import spark0.implicits._
    val data = Seq((1L, "g")).toDF("id", "g")
    intercept[IllegalArgumentException](
      Privacy.dpCountRelease(data, "g", epsilon = 1.0, secret = ""))
  }

  test("dpCountRelease: the secret never appears in the query plan " +
       "(explain / UI / event-log leak guard)") {
    val spark0 = spark
    import spark0.implicits._
    val data = (1 to 10).map(i => (i.toLong, s"g${i % 2}")).toDF("id", "g")
    val secret = "plan-leak-canary-7f3a9c"
    val released = Privacy.dpCountRelease(data, "g", epsilon = 1.0, secret)
    // every plan rendering an observer sees: parsed/analyzed/optimized
    // logical + the physical plan (what explain(), the SQL tab, and the
    // event log print)
    val renderings = Seq(
      released.queryExecution.logical.toString,
      released.queryExecution.analyzed.toString,
      released.queryExecution.optimizedPlan.toString,
      released.queryExecution.executedPlan.toString,
      released.queryExecution.toString)
    renderings.foreach { plan =>
      assert(!plan.contains(secret),
        "release secret leaked into a plan rendering")
    }
    assert(released.count() == 2L) // and the release still runs
  }
}
