package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sub-operator profiling scratchpad for the optimization rounds:
  *
  *   runMain graft.tools.OpProbeMain <probe> [reps]
  *
  * Each probe times the INTERIOR steps of one expensive operator in a
  * dedicated JVM (same session conf as Bench), printing per-step seconds
  * to stderr — the guide §1.1 empirical loop at sub-plan granularity,
  * where QueryTimeMain only gives the whole-query figure. Probes are
  * read-only over SPARK_GRAFT_SF_DIR and write nothing but stderr.
  */
object OpProbeMain {
  private def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    System.err.println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }

  private def force(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val probe = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.builder("graft-opprobe", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.sources.Sources.table
    table(spark, sfDir, "lineitem").count() // warm scan path
    for (rep <- 1 to reps) {
      System.err.println(s"[probe] --- rep $rep ---")
      probe match {
        case "qdigest" =>
          import graft.functions.{QDigestAgg, QDigestWeightedAgg}
          val bits = 24; val k = 2048
          val hist = time("hist agg + checkpoint") {
            table(spark, sfDir, "lineitem")
              .select(round(col("l_extendedprice") * 100).cast("long").as("c"))
              .groupBy(col("c")).agg(count(lit(1)).as("cnt"))
              .localCheckpoint(true)
          }
          val qd = udaf(new QDigestWeightedAgg(bits, k),
            org.apache.spark.sql.Encoders.tuple(
              org.apache.spark.sql.Encoders.scalaLong,
              org.apache.spark.sql.Encoders.scalaLong))
          val agg = time("weighted digest UDAF") {
            hist.agg(qd(col("c"), col("cnt")).as("digest"),
              sum(col("cnt")).as("n")).head()
          }
          val digest = agg.getAs[scala.collection.Seq[Long]]("digest").toArray
          val n = agg.getAs[Long]("n")
          val qs = Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
          val reported = time("quantile reads (driver)") {
            qs.map(q => QDigestAgg.quantile(digest, bits, q))
          }
          time("rank envelope agg") {
            val rankCols = reported.zipWithIndex.flatMap { case (v, i) => Seq(
              sum(when(col("c") < v, col("cnt")).otherwise(0L)).as(s"lo$i"),
              sum(when(col("c") <= v, col("cnt")).otherwise(0L)).as(s"hi$i")) }
            hist.agg(rankCols.head, rankCols.tail: _*).head()
          }
          val _ = n
          graft.GraftSession.dropCachedBlocks(spark)
        case "qdigest2" =>
          // candidate shape: key-repartition BEFORE the groupBy so the
          // histogram aggregate runs P-way (one exchange, reused by the
          // agg) and the checkpoint keeps P partitions for the UDAF
          import graft.functions.{QDigestAgg, QDigestWeightedAgg}
          val bits = 24; val k = 2048
          val p = spark.sparkContext.defaultParallelism
          val hist = time("hist agg + checkpoint (pre-repartitioned)") {
            table(spark, sfDir, "lineitem")
              .select(round(col("l_extendedprice") * 100).cast("long").as("c"))
              .repartition(p, col("c"))
              .groupBy(col("c")).agg(count(lit(1)).as("cnt"))
              .localCheckpoint(true)
          }
          val qd = udaf(new QDigestWeightedAgg(bits, k),
            org.apache.spark.sql.Encoders.tuple(
              org.apache.spark.sql.Encoders.scalaLong,
              org.apache.spark.sql.Encoders.scalaLong))
          val agg = time("weighted digest UDAF") {
            hist.agg(qd(col("c"), col("cnt")).as("digest"),
              sum(col("cnt")).as("n")).head()
          }
          val digest = agg.getAs[scala.collection.Seq[Long]]("digest").toArray
          val qs = Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
          val reported = qs.map(q => QDigestAgg.quantile(digest, bits, q))
          time("rank envelope agg") {
            val rankCols = reported.zipWithIndex.flatMap { case (v, i) => Seq(
              sum(when(col("c") < v, col("cnt")).otherwise(0L)).as(s"lo$i"),
              sum(when(col("c") <= v, col("cnt")).otherwise(0L)).as(s"hi$i")) }
            hist.agg(rankCols.head, rankCols.tail: _*).head()
          }
          graft.GraftSession.dropCachedBlocks(spark)
        case "a7_fan" =>
          val p = spark.sparkContext.defaultParallelism
          time("a7 direct percentile + RR fanout") {
            force(table(spark, sfDir, "lineitem")
              .select(col("l_returnflag"), col("l_extendedprice"))
              .repartition(p)
              .groupBy(col("l_returnflag"))
              .agg(
                expr("percentile(l_extendedprice, array(0.25, 0.5, 0.75))").as("ps"),
                round(max(col("l_extendedprice")), 2).as("pmax"))
              .select(col("l_returnflag"),
                round(col("ps").getItem(0), 2).as("p25"),
                round(col("ps").getItem(1), 2).as("p50"),
                round(col("ps").getItem(2), 2).as("p75"),
                col("pmax")))
          }
          graft.GraftSession.dropCachedBlocks(spark)
        case "fd_fan" =>
          import graft.ext.Profile
          val p = spark.sparkContext.defaultParallelism
          def fdCheckFan(name: String, df: DataFrame, detCol: String,
                         depCol: String): DataFrame = {
            val grouped = df.select(col(detCol), col(depCol))
              .repartition(p, col(detCol))
              .groupBy(col(detCol))
              .agg(count(lit(1)).as("__k"),
                count_distinct(col(depCol)).as("__d"))
            grouped.agg(
              coalesce(sum(col("__k")), lit(0L)).as("n_checked"),
              coalesce(sum(when(col("__d") > 1, col("__k")).otherwise(0L)),
                lit(0L)).as("n_violations"))
              .select(lit(name).as("check_name"),
                col("n_checked").cast("long"),
                col("n_violations").cast("long").as("n_violations"))
          }
          time("fd_audit fan-keyed") {
            force(Seq(
              fdCheckFan("nation_key_name", table(spark, sfDir, "nation"),
                "n_nationkey", "n_name"),
              fdCheckFan("order_custkey", table(spark, sfDir, "orders"),
                "o_orderkey", "o_custkey"),
              fdCheckFan("order_single_supplier", table(spark, sfDir, "lineitem"),
                "l_orderkey", "l_suppkey"),
              fdCheckFan("user_single_event_type", table(spark, sfDir, "events"),
                "user_id", "event_type")
            ).reduce(_ unionByName _))
          }
          val _ = Profile
          graft.GraftSession.dropCachedBlocks(spark)
        case "tfidf2" =>
          import org.apache.spark.sql.expressions.Window
          val p = spark.sparkContext.defaultParallelism
          time("tfidf top1, doc_id-repartitioned pipeline") {
            val docs = table(spark, sfDir, "documents")
            val n = docs.count()
            val tf = docs
              .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
              .filter(length(col("term")) > 0)
              .repartition(p, col("doc_id"))
              .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
            val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
            val w = tf.join(dfreq, "term")
              .withColumn("w", col("tf") * log(lit(n.toDouble) / col("df")))
            val norm = w.groupBy("doc_id")
              .agg(sqrt(sum(col("w") * col("w"))).as("norm"))
            val unit = w.join(norm, "doc_id")
              .select(col("doc_id"), col("term"),
                (col("w") / col("norm")).as("u"))
              .localCheckpoint(true)
            val probes = unit.filter(col("doc_id").isin((0L until 10L): _*))
              .select(col("doc_id").as("probe_id"), col("term"),
                col("u").as("ua"))
            val corpus = unit.select(col("doc_id").as("neighbor_id"),
              col("term"), col("u").as("ub"))
            val sims = broadcast(probes).join(corpus, "term")
              .filter(col("probe_id") =!= col("neighbor_id"))
              .groupBy("probe_id", "neighbor_id")
              .agg(sum(col("ua") * col("ub")).as("cosine"))
            val win = Window.partitionBy(col("probe_id"))
              .orderBy(round(col("cosine"), 6).desc, col("neighbor_id").asc)
            force(sims.withColumn("rn", row_number().over(win))
              .filter(col("rn") === 1)
              .select(col("probe_id"), col("neighbor_id"),
                round(col("cosine"), 2).as("cosine")))
          }
          graft.GraftSession.dropCachedBlocks(spark)
        case "qdigest_raw" =>
          // r12 shape for comparison: raw rows through the unweighted UDAF
          import graft.functions.QDigestAgg
          val bits = 24; val k = 2048
          val qd = udaf(new QDigestAgg(bits, k))
          time("raw digest UDAF (no hist)") {
            table(spark, sfDir, "lineitem")
              .select(round(col("l_extendedprice") * 100).cast("long").as("c"))
              .agg(qd(col("c")).as("digest"), count(lit(1)).as("n")).head()
          }
          graft.GraftSession.dropCachedBlocks(spark)
        case "a7_old" =>
          time("a7 direct percentile") {
            force(table(spark, sfDir, "lineitem")
              .groupBy(col("l_returnflag"))
              .agg(
                expr("percentile(l_extendedprice, array(0.25, 0.5, 0.75))").as("ps"),
                round(max(col("l_extendedprice")), 2).as("pmax"))
              .select(col("l_returnflag"),
                round(col("ps").getItem(0), 2).as("p25"),
                round(col("ps").getItem(1), 2).as("p50"),
                round(col("ps").getItem(2), 2).as("p75"),
                col("pmax")))
          }
          graft.GraftSession.dropCachedBlocks(spark)
        case "a7_hist" =>
          time("a7 histogram-first percentile") {
            force(table(spark, sfDir, "lineitem")
              .groupBy(col("l_returnflag"), col("l_extendedprice"))
              .agg(count(lit(1)).as("cnt"))
              .groupBy(col("l_returnflag"))
              .agg(
                expr("percentile(l_extendedprice, array(0.25, 0.5, 0.75), cnt)")
                  .as("ps"),
                round(max(col("l_extendedprice")), 2).as("pmax"))
              .select(col("l_returnflag"),
                round(col("ps").getItem(0), 2).as("p25"),
                round(col("ps").getItem(1), 2).as("p50"),
                round(col("ps").getItem(2), 2).as("p75"),
                col("pmax")))
          }
          graft.GraftSession.dropCachedBlocks(spark)
        case "jobs" =>
          // count Spark jobs + sum task time per catalog query (args(2))
          val name = args(2)
          val q = graft.operators.Catalog.byName(name)
          val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
          val taskNanos = new java.util.concurrent.atomic.AtomicLong(0L)
          val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
          val jobTask = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.atomic.AtomicLong]()
          val stageJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
          val jobSite = new java.util.concurrent.ConcurrentHashMap[Int, String]()
          val listener = new org.apache.spark.scheduler.SparkListener {
            override def onJobStart(
                j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
              jobs.incrementAndGet()
              jobStart.put(j.jobId, System.nanoTime())
              jobTask.put(j.jobId, new java.util.concurrent.atomic.AtomicLong(0L))
              jobSite.put(j.jobId, Option(j.properties)
                .map(p => p.getProperty("callSite.short", ""))
                .getOrElse("") + " nstages=" + j.stageIds.length)
              j.stageIds.foreach(sid => stageJob.put(sid, j.jobId))
            }
            override def onJobEnd(
                j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
              val t0 = jobStart.getOrDefault(j.jobId, 0L)
              val tt = Option(jobTask.get(j.jobId)).map(_.get).getOrElse(0L)
              val site = jobSite.getOrDefault(j.jobId, "")
              System.err.println(f"[probe]   job ${j.jobId}%3d wall=${(System.nanoTime() - t0) / 1e9}%6.3f task=${tt / 1e9}%6.2f  $site")
            }
            override def onTaskEnd(
                t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
              if (t.taskMetrics != null) {
                val n = t.taskMetrics.executorRunTime * 1000000L
                taskNanos.addAndGet(n)
                val jid = stageJob.getOrDefault(t.stageId, -1)
                val a = jobTask.get(jid)
                if (a != null) a.addAndGet(n)
              }
          }
          spark.sparkContext.addSparkListener(listener)
          time(s"$name total") { force(q.run(spark, sfDir)) }
          Thread.sleep(300) // let the listener bus drain
          spark.sparkContext.removeSparkListener(listener)
          System.err.println(f"[probe] $name jobs=${jobs.get} " +
            f"taskTime=${taskNanos.get / 1e9}%.2f s")
          graft.GraftSession.dropCachedBlocks(spark)
        case "stream" =>
          // per-micro-batch durationMs breakdown for one streaming catalog
          // query (guide §1.1: decide WHERE the drain constant goes —
          // planning, state commit, addBatch, wal — before touching it).
          // Optional conf overrides: args = stream <name> [k=v,k=v,...]
          val name = args(2)
          val overrides = if (args.length > 3)
            args(3).split(",").toSeq.map { kv =>
              val Array(k, v) = kv.split("=", 2); (k, v) } else Seq.empty
          val prev = overrides.map { case (k, _) =>
            (k, spark.conf.getOption(k)) }
          overrides.foreach { case (k, v) => spark.conf.set(k, v) }
          val q = graft.operators.Catalog.byName(name)
          val progress =
            new java.util.concurrent.ConcurrentLinkedQueue[String]()
          val listener =
            new org.apache.spark.sql.streaming.StreamingQueryListener {
              override def onQueryStarted(e: org.apache.spark.sql.streaming
                  .StreamingQueryListener.QueryStartedEvent): Unit = ()
              override def onQueryProgress(e: org.apache.spark.sql.streaming
                  .StreamingQueryListener.QueryProgressEvent): Unit = {
                val p = e.progress
                val st = p.stateOperators.toSeq.map(s =>
                  f"op=${s.operatorName} commit=${s.commitTimeMs}ms " +
                    f"rows=${s.numRowsTotal} mem=${s.memoryUsedBytes}")
                  .mkString("; ")
                progress.add(
                  s"batch=${p.batchId} durationMs=${p.durationMs} $st")
              }
              override def onQueryTerminated(e: org.apache.spark.sql
                  .streaming.StreamingQueryListener
                  .QueryTerminatedEvent): Unit = ()
            }
          spark.streams.addListener(listener)
          try time(s"$name total") { force(q.run(spark, sfDir)) }
          finally {
            spark.streams.removeListener(listener)
            prev.foreach {
              case (k, Some(v)) => spark.conf.set(k, v)
              case (k, None) => spark.conf.unset(k)
            }
          }
          progress.forEach(p => System.err.println(s"[probe]   $p"))
          graft.GraftSession.dropCachedBlocks(spark)
        case "streamsweep" =>
          // interleaved A/B of state-store confs over one streaming query
          // (min per variant across reps — the Bench interleaving trick,
          // because co-tenant bursts on this host last minutes and would
          // otherwise contaminate whole variants). args: streamsweep
          // <reps> <name>; prints per-variant seconds each rep.
          val name = args(2)
          val qs = if (name == "ALL_STREAMS")
            graft.operators.Catalog.all.filter(_.name.startsWith("q_s_"))
          else Seq(graft.operators.Catalog.byName(name))
          val variants: Seq[(String, Seq[(String, String)])] = Seq(
            "default" -> Seq.empty,
            "sp4" -> Seq("spark.graft.stream.statePartitions" -> "4"),
            "sp2" -> Seq("spark.graft.stream.statePartitions" -> "2"))
          variants.foreach { case (vname, confs) =>
            val prev = confs.map { case (k, _) => (k, spark.conf.getOption(k)) }
            confs.foreach { case (k, v) => spark.conf.set(k, v) }
            val t0 = System.nanoTime()
            try qs.foreach { q =>
              try time(s"${q.name} [$vname]") { force(q.run(spark, sfDir)) }
              catch { case e: Throwable =>
                System.err.println(s"[probe] ${q.name} [$vname] FAILED: ${e.getMessage}")
              }
              graft.GraftSession.dropCachedBlocks(spark)
            }
            finally prev.foreach {
              case (k, Some(v)) => spark.conf.set(k, v)
              case (k, None) => spark.conf.unset(k)
            }
            System.err.println(
              f"[probe] SUM [$vname]: ${(System.nanoTime() - t0) / 1e9}%.3f s")
          }
        case other =>
          System.err.println(s"unknown probe '$other'"); sys.exit(2)
      }
    }
    spark.stop()
  }
}
