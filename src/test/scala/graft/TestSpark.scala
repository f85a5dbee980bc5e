package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test run (per spark_guide.md:
  * one SparkSession per suite, lazy). UTC + small shuffle partitions keep
  * goldens deterministic and fast. */
object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.warehouse.dir",
      s"${sys.props("java.io.tmpdir")}/graft-test-warehouse")
    .getOrCreate()

  def resource(name: String): String =
    getClass.getResource(name).getPath
}
