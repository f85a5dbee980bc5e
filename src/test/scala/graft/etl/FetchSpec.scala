package graft.etl

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class FetchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("frame: columns, rows, records, column access") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "name")
    val f = Fetch.frame(df.orderBy("id"))
    assert(f.columns == Seq("id", "name"))
    assert(f.numRows == 3)
    assert(f.column("id") == Seq(1L, 2L, 3L))
    assert(f.records.head == Map("id" -> 1L, "name" -> "a"))
    assert(f.formatted().contains("name"))
    intercept[IllegalArgumentException](f.column("missing"))
  }

  test("frame fails loudly past the row cap (S8 scale guard)") {
    val spark0 = spark
    import spark0.implicits._
    val big = (1 to 100).toDF("n")
    intercept[IllegalArgumentException](Fetch.frame(big, maxRows = 50))
    assert(Fetch.frame(big, maxRows = 100).numRows == 100)
  }
}
