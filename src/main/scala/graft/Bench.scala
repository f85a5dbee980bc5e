package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — driver contract: run the query surface on
  * SPARK_GRAFT_SF_DIR, print ONE JSON line with per-query seconds.
  * Each query is forced with count() (runs the whole plan, returns a
  * scalar — no driver-side result materialization in the timing).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm the JVM/codegen paths on the smallest SF so per-query timings
    // measure the plan, not first-use classloading.
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory) {
      operators.Catalog.all.foreach { q =>
        try q.run(spark, warmDir).count()
        catch { case _: Throwable => () }
      }
    }

    val results = operators.Catalog.all.map { q =>
      val t0 = System.nanoTime()
      try q.run(spark, sfDir).count()
      catch { case e: Throwable =>
        System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}")
      }
      q.name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
