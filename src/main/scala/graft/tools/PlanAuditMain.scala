package graft.tools
object PlanAuditMain {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("plan-audit", "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (name <- args) {
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
