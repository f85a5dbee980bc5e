package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test run (per spark_guide.md:
  * one SparkSession per suite, lazy). UTC + small shuffle partitions keep
  * goldens deterministic and fast. */
object TestSpark {
  lazy val spark: SparkSession = GraftSession.builder("graft-test", "4")
    .config("spark.sql.warehouse.dir",
      s"${sys.props("java.io.tmpdir")}/graft-test-warehouse")
    .getOrCreate()

  def resource(name: String): String =
    getClass.getResource(name).getPath
}
