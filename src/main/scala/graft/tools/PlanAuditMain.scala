package graft.tools
object PlanAuditMain {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("plan-audit", "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // optional leading arg: the testdata dir (plans are SIZE-dependent —
    // a broadcast that is right at sf0.01 can be a driver bomb at sf1,
    // the MarketBasket stats-erasure class; audit at the scale you mean)
    val (dir, names) = args.toList match {
      case d :: rest if d.startsWith("/") || d.startsWith("testdata") =>
        (d, rest)
      case rest => ("/root/testdata/sf0.01", rest)
    }
    for (name <- names) {
      val df = graft.operators.Catalog.byName(name).run(spark, dir)
      println(s"===== $name =====")
      println(df.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Exchange") || l.contains("TakeOrdered") ||
          l.contains("Scan") || l.contains("Join") || l.contains("Window") ||
          l.contains("HashAggregate") || l.contains("Sort"))
        .map(_.take(180)).mkString("\n"))
    }
    spark.stop()
  }
}
