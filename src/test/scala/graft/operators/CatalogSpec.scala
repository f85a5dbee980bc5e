package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Smoke + shape checks for the registered query surface: every catalog
  * entry runs at sf0.001 and returns rows; oracle-bearing queries follow the
  * hash-stability conventions (no raw int32 outputs — DuckDB extracts are
  * BIGINT and the driver's hash compares values per sorted column name). */
class CatalogSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("query names are unique and oracle keys ⊆ query keys") {
    assert(Catalog.byName.size == Catalog.all.size)
    val qNames = Catalog.all.map(_.name).toSet
    assert(Catalog.all.flatMap(q => q.oracle.map(_ => q.name)).toSet.subsetOf(qNames))
  }

  Catalog.all.foreach { q =>
    test(s"${q.name} runs at sf0.001 and returns rows") {
      val df = q.run(spark, sfDir)
      if (q.expectEmpty)
        assert(df.count() == 0,
          s"${q.name} is a violation anchor but emitted rows")
      else assert(df.count() > 0, s"${q.name} returned no rows")
      // conventions: oracle-checked queries must not emit int32 columns
      if (q.oracle.isDefined) {
        val intCols = df.schema.fields.collect {
          case f if f.dataType == org.apache.spark.sql.types.IntegerType => f.name
        }
        assert(intCols.isEmpty,
          s"${q.name} emits int32 columns ${intCols.mkString(",")} — cast to long for the oracle hash")
      }
    }
  }

  test("SparkEntry contract: entry returns rows; maps are consistent") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
    assert(graft.SparkEntry.oracleSql.keySet.subsetOf(graft.SparkEntry.queries.keySet))
  }
}
