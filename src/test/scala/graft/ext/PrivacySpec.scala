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
}
