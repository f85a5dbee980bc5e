package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The distkey story (SURVEY.md §4): tables bucketed on the join key with
  * equal bucket counts must join with NO exchange on either side. */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("partitioned write prunes non-matching partitions at the scan") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    val ev = Sources.table(spark, "/root/testdata/sf0.001", "events")
      .withColumn("event_date", to_date(col("ts")))
    Sources.writePartitioned(ev, s"$dir/events", Seq("event_date"))
    val back = spark.read.parquet(s"$dir/events")
      .filter(col("event_date") === "2024-01-05")
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_date"),
      s"no partition pruning:\n$plan")
    // only the matching directory's rows are read
    val expected = ev.filter(to_date(col("ts")) === "2024-01-05").count()
    assert(back.count() == expected && expected > 0)
  }

  test("co-bucketed join is shuffle-free; unbucketed join is not") {
    val dir = "/root/testdata/sf0.001"
    val li = Sources.table(spark, dir, "lineitem")
    val ord = Sources.table(spark, dir, "orders")

    // baseline: the same join over unbucketed sources has exchanges
    // (or a broadcast at this tiny scale) — capture for contrast
    val plain = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .queryExecution.executedPlan.toString

    Sources.writeBucketed(li, "li_bkt", "l_orderkey", 8, Seq("l_orderkey"))
    Sources.writeBucketed(ord, "ord_bkt", "o_orderkey", 8, Seq("o_orderkey"))
    try {
      // disable auto-broadcast so the bucketed SMJ path is what's planned
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val a = spark.table("li_bkt")
      val b = spark.table("ord_bkt")
      val joined = a.join(b, a("l_orderkey") === b("o_orderkey"))
      val p = joined.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"), s"bucketed join still shuffles:\n$p")
      assert(joined.count() > 0)

      val unbucketed = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      val pu = unbucketed.queryExecution.executedPlan.toString
      assert(pu.contains("Exchange"), s"expected shuffle without buckets:\n$pu")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS li_bkt")
      spark.sql("DROP TABLE IF EXISTS ord_bkt")
    }
  }
}
