package graft.tools

/** Tiny registry census: prints total and oracled query counts, so README
  * bookkeeping never drifts from the actual Catalog. */
object QueryCountMain {
  def main(args: Array[String]): Unit = {
    val all = graft.operators.Catalog.all
    println(s"TOTAL=${all.size} ORACLED=${all.count(_.oracle.isDefined)}")
  }
}
