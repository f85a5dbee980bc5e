package graft.tools

/** Single-query timing for the optimization loop:
  *
  *   runMain graft.tools.QueryTimeMain <reps> <q1> [q2 ...]
  *
  * Times each named catalog query against the noop sink (guide §1.4 —
  * computation, not the sink) for <reps> repetitions in ONE JVM/session
  * with the same conf as Bench (SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS),
  * dropping cached blocks between reps, and prints per-rep and min
  * seconds to stderr. A dedicated-JVM complement to the full Bench run
  * for iterating on one operator without paying the 232-query suite.
  */
object QueryTimeMain {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println(
        "usage: runMain graft.tools.QueryTimeMain <reps> <q1> [q2 ...]")
      sys.exit(2)
    }
    val reps = args(0).toInt
    val names = args.drop(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.builder("graft-qtime", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the scan path once so rep 1 is not a JIT/pagecache outlier
    graft.sources.Sources.table(spark, sfDir, "lineitem").count()
    for (name <- names) {
      val q = graft.operators.Catalog.byName.getOrElse(name, {
        System.err.println(s"unknown query '$name'"); sys.exit(2)
        throw new IllegalStateException
      })
      val times = (1 to reps).map { rep =>
        spark.sparkContext.setJobDescription(s"qtime $name rep $rep")
        val t0 = System.nanoTime()
        q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        graft.GraftSession.dropCachedBlocks(spark)
        System.err.println(f"[qtime] $name rep $rep: $dt%.3f s")
        dt
      }
      System.err.println(f"[qtime] $name min: ${times.min}%.3f s")
    }
    spark.stop()
  }
}
