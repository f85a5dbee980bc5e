package graft.ext

import java.sql.Timestamp

import org.scalacheck.{Gen, rng}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Randomized cross-checks: AsofJoin and RangeJoin against brute-force
  * Scala-collection references on generated data. Deterministic seeds —
  * failures reproduce. Small key/time domains force the interesting
  * collisions (equal timestamps, multi-match, empty keys) to actually
  * occur in every run. */
class JoinPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val base = 1704067200000L // 2024-01-01 00:00:00 UTC, millis

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, rng.Seed(seed))

  // (id, key, second-offset) rows; tight domains to force collisions
  private def rowsGen(n: Int): Gen[List[(Long, Long, Int)]] =
    Gen.listOfN(n, for {
      key <- Gen.choose(0L, 4L)
      off <- Gen.choose(0, 120)
    } yield (key, off)).map(_.zipWithIndex.map {
      case ((k, o), i) => (i.toLong, k, o)
    })

  test("AsofJoin.backward matches brute force on random data (5 seeds)") {
    val spark0 = spark
    import spark0.implicits._
    for (seed <- 1L to 5L) {
      val left = sample(rowsGen(60), seed)
      val rightRaw = sample(rowsGen(40), seed + 100)
      // unique per (key, ts): operator contract — keep max id
      val right = rightRaw.groupBy(r => (r._2, r._3)).values
        .map(_.maxBy(_._1)).toList
      val ldf = left.map { case (id, k, o) =>
        (id, k, new Timestamp(base + o * 1000L)) }.toDF("id", "k", "ts")
      val rdf = right.map { case (id, k, o) =>
        (k, new Timestamp(base + o * 1000L), id.toDouble) }.toDF("k", "ts", "px")

      val got = AsofJoin.backward(ldf, rdf, "k", "ts", Seq("px"))
        .collect().map(r => r.getAs[Long]("id") ->
          Option(r.getAs[java.lang.Double]("px")).map(_.toDouble)).toMap

      left.foreach { case (id, k, o) =>
        val expected = right.filter(r => r._2 == k && r._3 <= o)
          .sortBy(r => (r._3, r._1)).lastOption.map(_._1.toDouble)
        assert(got(id) == expected, s"seed=$seed left id=$id key=$k off=$o")
      }
    }
  }

  test("AsofJoin.forward + tolerance match brute force on random data (5 seeds)") {
    val spark0 = spark
    import spark0.implicits._
    for (seed <- 21L to 25L) {
      val left = sample(rowsGen(50), seed)
      val right = sample(rowsGen(35), seed + 100)
        .groupBy(r => (r._2, r._3)).values.map(_.maxBy(_._1)).toList
      val ldf = left.map { case (id, k, o) =>
        (id, k, new Timestamp(base + o * 1000L)) }.toDF("id", "k", "ts")
      val rdf = right.map { case (id, k, o) =>
        (k, new Timestamp(base + o * 1000L), id.toDouble) }.toDF("k", "ts", "px")

      val fwd = AsofJoin.forward(ldf, rdf, "k", "ts", Seq("px"))
        .collect().map(r => r.getAs[Long]("id") ->
          Option(r.getAs[java.lang.Double]("px")).map(_.toDouble)).toMap
      val tol = AsofJoin.backward(ldf, rdf, "k", "ts", Seq("px"),
          toleranceSeconds = Some(15L))
        .collect().map(r => r.getAs[Long]("id") ->
          Option(r.getAs[java.lang.Double]("px")).map(_.toDouble)).toMap

      left.foreach { case (id, k, o) =>
        val expFwd = right.filter(r => r._2 == k && r._3 >= o)
          .sortBy(r => (r._3, -r._1)).headOption.map(_._1.toDouble)
        assert(fwd(id) == expFwd, s"fwd seed=$seed id=$id")
        val expTol = right.filter(r => r._2 == k && r._3 <= o && o - r._3 <= 15)
          .sortBy(r => (r._3, r._1)).lastOption.map(_._1.toDouble)
        assert(tol(id) == expTol, s"tol seed=$seed id=$id")
      }
    }
  }

  test("AsofJoin tolerance at millisecond resolution matches brute force (5 seeds)") {
    val spark0 = spark
    import spark0.implicits._
    // sub-second offsets: the tolerance gate must compare true microsecond
    // gaps — a floor-to-seconds gate is off by up to ~1s either way here
    val msGen: Gen[List[(Long, Long, Int)]] =
      Gen.listOfN(50, for {
        key <- Gen.choose(0L, 3L)
        off <- Gen.choose(0, 5000) // milliseconds
      } yield (key, off)).map(_.zipWithIndex.map {
        case ((k, o), i) => (i.toLong, k, o)
      })
    for (seed <- 31L to 35L) {
      val left = sample(msGen, seed)
      val right = sample(msGen, seed + 100)
        .groupBy(r => (r._2, r._3)).values.map(_.maxBy(_._1)).toList
      val ldf = left.map { case (id, k, o) =>
        (id, k, new Timestamp(base + o)) }.toDF("id", "k", "ts")
      val rdf = right.map { case (id, k, o) =>
        (k, new Timestamp(base + o), id.toDouble) }.toDF("k", "ts", "px")

      val tol = AsofJoin.backward(ldf, rdf, "k", "ts", Seq("px"),
          toleranceSeconds = Some(2L))
        .collect().map(r => r.getAs[Long]("id") ->
          Option(r.getAs[java.lang.Double]("px")).map(_.toDouble)).toMap

      left.foreach { case (id, k, o) =>
        val exp = right
          .filter(r => r._2 == k && r._3 <= o && o - r._3 <= 2000)
          .sortBy(r => (r._3, r._1)).lastOption.map(_._1.toDouble)
        assert(tol(id) == exp, s"ms-tol seed=$seed id=$id off=$o")
      }
    }
  }

  test("RangeJoin.pointInInterval matches brute force on random data (5 seeds)") {
    val spark0 = spark
    import spark0.implicits._
    for (seed <- 11L to 15L) {
      val points = sample(rowsGen(60), seed)
      val intervals = sample(rowsGen(30), seed + 100).map {
        case (id, k, o) =>
          val len = ((id * 7919 + seed) % 40).toInt - 5 // some empty/inverted
          (id, k, o, o + len)
      }
      val pdf = points.map { case (id, k, o) =>
        (id, k, new Timestamp(base + o * 1000L)) }.toDF("id", "k", "ts")
      val idf = intervals.map { case (id, k, s, e) =>
        (id, k, new Timestamp(base + s * 1000L), new Timestamp(base + e * 1000L))
      }.toDF("iid", "k", "w_start", "w_end")

      val got = RangeJoin.pointInInterval(pdf, idf, "ts", "w_start", "w_end",
          keys = Seq("k"), binSeconds = 13L)
        .select("id", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

      val expected = (for {
        (pid, pk, po) <- points
        (iid, ik, s, e) <- intervals
        if pk == ik && po >= s && po < e
      } yield (pid, iid)).toSet
      assert(got == expected, s"seed=$seed")
    }
  }
}
