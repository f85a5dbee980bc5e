package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main — driver contract: run the query surface on
  * SPARK_GRAFT_SF_DIR, print ONE JSON line with per-query seconds.
  *
  * Forcing: `df.write.format("noop")` — a DataSource-V2 sink that executes
  * the FULL plan (every projected column is computed and serialized to the
  * sink boundary) and discards rows. `count()` would let Catalyst prune
  * map-only expression work down to a row-group-metadata scan, silently
  * under-measuring exactly the expression-heavy queries.
  */
object Bench {
  private def force(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Local iteration aid: SPARK_GRAFT_ONLY=q_a,q_b restricts the run.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val queries = only.fold(operators.Catalog.all)(
      names => operators.Catalog.all.filter(q => names(q.name)))
    val spark = GraftSession.builder("graft-bench", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm the JVM/codegen paths on the smallest SF so per-query timings
    // measure the plan, not first-use classloading.
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory) {
      queries.foreach { q =>
        try force(q.run(spark, warmDir))
        catch { case _: Throwable => () }
      }
    }

    // Median of 3 timed runs per query: single-shot sub-second timings are
    // noisy enough (GC/JIT/scheduler jitter under a 50-query JVM) to mask
    // or fake regressions; the median is robust to one bad run.
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val results = queries.map { q =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try force(q.run(spark, sfDir))
        catch { case e: Throwable =>
          System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }.sorted
      q.name -> times(times.length / 2)
    }
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
