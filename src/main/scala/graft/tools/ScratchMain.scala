package graft.tools
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

object ScratchMain {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("scratch", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def tm[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[tm] $label: ${(System.nanoTime()-t0)/1e9}%.3f s"); r
    }
    // warm
    graft.sources.Sources.table(spark, dir, "lineitem").count()
    for (rep <- 1 to 3) {
      val items = graft.sources.Sources.table(spark, dir, "lineitem")
      val b0 = items.select(col("l_orderkey").as("basket"), col("l_partkey").as("item")).distinct()
      val kept = b0.groupBy(col("basket")).agg(count(lit(1)).as("sz")).filter(col("sz") <= 64)
      val b = tm("persist b")( { val x = b0.join(kept.select(col("basket")), "basket").persist(StorageLevel.MEMORY_AND_DISK); x.count(); x } )
      val n = b.agg(countDistinct(col("basket")).as("n_baskets"))
      val itemCnt = b.groupBy(col("item")).agg(count(lit(1)).as("c"))
      val pa = b.select(col("basket"), col("item").as("item_a"))
      val pb = b.select(col("basket"), col("item").as("item_b"))
      val pairs = pa.join(pb, pa("basket") === pb("basket") && col("item_a") < col("item_b"))
        .groupBy(col("item_a"), col("item_b")).agg(count(lit(1)).as("n_pair"))
        .filter(col("n_pair") >= 2)
      tm("pairs count")(pairs.count())
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val rules = pairs
        .join(itemCnt.select(col("item").as("item_a"), col("c").as("n_a")), "item_a")
        .join(itemCnt.select(col("item").as("item_b"), col("c").as("n_b")), "item_b")
        .crossJoin(broadcast(n))
        .select(col("item_a"), col("item_b"), col("n_pair"), col("n_a"), col("n_b"),
          round(col("n_pair").cast("double") / col("n_baskets"), 6).as("support"),
          round(col("n_pair").cast("double") / col("n_a"), 6).as("conf_a_b"),
          round(col("n_pair").cast("double") / col("n_b"), 6).as("conf_b_a"),
          round((dec(col("n_pair")) * col("n_baskets")).cast("double") /
            (dec(col("n_a")) * col("n_b")).cast("double"), 6).as("lift"))
      tm("rules checkpoint")(rules.localCheckpoint(true))
      b.unpersist(blocking = false)
      graft.GraftSession.dropCachedBlocks(spark)
      System.err.println(s"--- rep $rep done")
    }
    spark.stop()
  }
}
