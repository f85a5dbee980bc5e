package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Adversarial skew probe for the exact all-pairs similarity join: run
  * [[graft.ext.SimilarityJoin.prefixJaccardSelfJoin]] against a docs dir
  * (use the `genskew` corpus, whose planted hot-template family is ONE
  * giant near-dup cluster) and report wall, output pairs, and task
  * balance. A k-doc template cluster makes the TRUE output quadratic
  * (k(k-1)/2 pairs) — the question this probe answers is whether the
  * engine emits that semantically-required output with bounded task
  * skew, or wedges on the hot prefix-token key.
  *
  * Usage: SimJoinSkewMain <docsDir> [tNum tDen]
  */
object SimJoinSkewMain {
  def main(args: Array[String]): Unit = {
    require(args.length == 1 || args.length == 3,
      "usage: SimJoinSkewMain <dir> [tNum tDen] — both threshold args or neither")
    val dir = args.head
    val (tn, td) =
      if (args.length == 3) (args(1).toInt, args(2).toInt) else (4, 5)
    val spark = graft.GraftSession.builder("sim-join-skew", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.sources.Sources.table(spark, dir, "documents")
    // count() BEFORE registering the listener, so its tasks can never
    // race into the join's duration population via the async bus
    val nDocs = docs.count()
    Thread.sleep(1000)
    val durations = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        if (te.taskInfo != null) durations.add(te.taskInfo.duration)
    })
    val t0 = System.nanoTime()
    val out = graft.ext.SimilarityJoin
      .prefixJaccardSelfJoin(docs, "doc_id", "text", tn, td)
    val pairs = out.count()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(2000) // listener-bus drain before reading the durations
    val ds = {
      val it = durations.iterator()
      val b = Seq.newBuilder[Long]
      while (it.hasNext) b += it.next()
      b.result().sorted
    }
    val med = if (ds.nonEmpty) ds(ds.size / 2) else 0L
    val mx = if (ds.nonEmpty) ds.last else 0L
    println(f"[sim-join-skew] dir=$dir docs=$nDocs t=$tn/$td pairs=$pairs " +
      f"wall=$wall%.1fs task_med=${med}ms task_max=${mx}ms " +
      f"mx/md=${if (med > 0) mx.toDouble / med else 0.0}%.1f")
    spark.stop()
  }
}
