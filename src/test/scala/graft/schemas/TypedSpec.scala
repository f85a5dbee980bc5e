package graft.schemas

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.Sources

/** Dataset[T] surface: `.as[T]` binds each testdata table to its case
  * class, and a typed pipeline (filter → groupByKey → mapGroups) agrees
  * with the equivalent untyped plan. */
class TypedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("every testdata table binds to its typed model") {
    import spark.implicits._
    assert(Sources.table(spark, dir, "region").as[Typed.Region].count() == 5)
    assert(Sources.table(spark, dir, "nation").as[Typed.Nation].count() == 25)
    assert(Sources.table(spark, dir, "customer").as[Typed.Customer].count() == 150)
    assert(Sources.table(spark, dir, "supplier").as[Typed.Supplier].count() == 10)
    assert(Sources.table(spark, dir, "part").as[Typed.Part].count() == 200)
    assert(Sources.table(spark, dir, "orders").as[Typed.Order].count() == 1500)
    assert(Sources.table(spark, dir, "lineitem").as[Typed.Lineitem].count() == 6000)
    assert(Sources.table(spark, dir, "events").as[Typed.Event].count() == 1000)
    assert(Sources.table(spark, dir, "documents").as[Typed.Document].count() == 500)
    assert(Sources.table(spark, dir, "embeddings").as[Typed.Embedding].count() == 500)
  }

  test("typed aggregation equals untyped aggregation") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val li = Sources.table(spark, dir, "lineitem")
    val typed = li.as[Typed.Lineitem]
      .filter(_.l_quantity > 25.0)
      .groupByKey(_.l_returnflag)
      .mapGroups((flag, rows) => (flag, rows.map(_.l_quantity).sum))
      .collect().map { case (f, q) => f -> math.round(q * 100) }.toMap
    val untyped = li.filter(col("l_quantity") > 25.0)
      .groupBy("l_returnflag").agg(sum("l_quantity").as("q"))
      .collect().map(r => r.getString(0) -> math.round(r.getDouble(1) * 100)).toMap
    assert(typed == untyped)
  }
}
