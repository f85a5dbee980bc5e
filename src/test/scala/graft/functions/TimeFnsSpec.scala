package graft.functions

import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.TestSpark

/** Unit + property tests for the E-series expression library — the
  * SURVEY.md §7.4 hard parts: integer-division epoch semantics, DOW
  * convention, fiscal boundaries, weekend ⇔ DOW consistency.
  *
  * Property samples are drawn with scalacheck Gen (fixed seed) but derived
  * in ONE DataFrame pass — one Spark job for 500 samples, not 500 jobs.
  */
class TimeFnsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def deriveAll(ms: Seq[Long]): Array[org.apache.spark.sql.Row] =
    ms.toDF("ts")
      .select(TimeFns.timeDimensionColumns(
        TimeFns.epochMillisToTs(col("ts"))): _*)
      .collect()

  test("E1: epoch-ms → ts truncates to whole seconds (Redshift int division)") {
    val got = Seq(1522491300999L).toDF("ts")
      .select(TimeFns.epochMillisToTs(col("ts")).as("t"))
      .collect().head.getAs[Timestamp]("t")
    assert(got.toInstant == Instant.parse("2018-03-31T10:15:00Z"))
  }

  test("E3: time key formats as YYYYMMDDHH bigint") {
    val got = Seq(Timestamp.from(Instant.parse("2018-11-03T01:04:33Z")))
      .toDF("ts").select(TimeFns.timeKey(col("ts")).as("k"))
      .collect().head.getAs[Long]("k")
    assert(got == 2018110301L)
  }

  test("E9/E10 fiscal boundaries: Mar 31 → FY-1 Q4; Apr 1 → FY Q1") {
    val Array(mar, apr) = deriveAll(Seq(1522491300000L, 1522573200000L))
    assert(mar.getAs[Int]("fiscal_year") == 2017)
    assert(mar.getAs[Int]("fiscal_quarter") == 4)
    assert(apr.getAs[Int]("fiscal_year") == 2018)
    assert(apr.getAs[Int]("fiscal_quarter") == 1)
  }

  test("E11 season mapping at month boundaries") {
    def seasonOf(iso: String): String =
      Seq(Timestamp.from(Instant.parse(iso))).toDF("ts")
        .select(TimeFns.season(col("ts")).as("s")).collect().head.getString(0)
    assert(seasonOf("2018-12-01T00:00:00Z") == "Winter")
    assert(seasonOf("2018-02-28T23:59:59Z") == "Winter")
    assert(seasonOf("2018-03-01T00:00:00Z") == "Spring")
    assert(seasonOf("2018-06-01T00:00:00Z") == "Summer")
    assert(seasonOf("2018-09-01T00:00:00Z") == "Fall")
  }

  // 500 deterministic samples across 1990-01-01 .. 2030-01-01
  private lazy val samples: Seq[Long] =
    Gen.listOfN(500, Gen.choose(631152000000L, 1893456000000L))
      .apply(Gen.Parameters.default, Seed(42L)).get

  test("property: is_weekend ⇔ day_of_week ∈ {1,7}") {
    deriveAll(samples).foreach { r =>
      assert(r.getAs[Boolean]("is_weekend") ==
        Set(1, 7).contains(r.getAs[Int]("day_of_week")),
        s"at time_key=${r.getAs[Long]("time_key")}")
    }
  }

  test("property: fiscal year/quarter consistent with calendar month") {
    deriveAll(samples).foreach { r =>
      val m = r.getAs[Int]("month")
      val fy = r.getAs[Int]("fiscal_year")
      val y = r.getAs[Int]("year")
      if (m <= 3) {
        assert(fy == y - 1, s"month=$m year=$y")
        assert(r.getAs[Int]("fiscal_quarter") == 4)
      } else assert(fy == y, s"month=$m year=$y")
    }
  }

  test("property: time_key encodes the calendar fields it truncates to") {
    deriveAll(samples).foreach { r =>
      val expected = f"${r.getAs[Int]("year")}%04d${r.getAs[Int]("month")}%02d" +
        f"${r.getAs[Int]("day")}%02d${r.getAs[Int]("hour")}%02d"
      assert(r.getAs[Long]("time_key").toString == expected)
    }
  }
}
