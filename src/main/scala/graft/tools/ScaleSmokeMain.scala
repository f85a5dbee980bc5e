package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Catalog

/** Scale-up smoke harness: synthesize an N× copy of the
  * documents/events/embeddings tables and time the headline
  * document/event queries at 1× vs N×, recording wall time and total
  * shuffle read+write bytes per query — the evidence for the "would the
  * plan survive a 100× scale-up" argument (PERF_NOTES.md).
  *
  * Usage:
  *   runMain graft.tools.ScaleSmokeMain gen <srcSfDir> <outDir> <N>
  *   runMain graft.tools.ScaleSmokeMain run <srcSfDir> <scaledDir>
  *   runMain graft.tools.ScaleSmokeMain bpe <srcSfDir> <k>
  *   runMain graft.tools.ScaleSmokeMain stream <srcSfDir> <scaledDir>
  *   runMain graft.tools.ScaleSmokeMain bloom <srcSfDir> <workDir>
  *
  * Replica construction keeps the similarity structure honest:
  * replica 0 is the original; replica i>0 re-ids rows and REWRITES each
  * document's token stream with a replica-constant marker token inserted
  * every 5 positions. Within a replica the planted near-dup pairs stay
  * near-dups (both members get the same insertion pattern); across
  * replicas ~3/5 of word-3-grams differ, pushing Jaccard far below the
  * 0.7 dedup threshold — so an N× corpus has N× clusters, not N-wide
  * cross-replica ones, and dedup work scales the way a real N× corpus
  * would. Embeddings get the matching treatment: replica i>0 applies a
  * replica-specific diagonal ±1 sign-flip (orthogonal, so within-replica
  * cosines are preserved exactly while cross-replica copies land near
  * cos 0). Events keep `ts` as the raw nanos long so the scaled parquet
  * reads back through the same Sources.table nanos path as the original.
  */
object ScaleSmokeMain {

  // Headline queries over the three scalable tables (documents / events /
  // embeddings — the only ones `gen` replicates; TPC-H-table queries
  // can't run against a scaled dir).
  private val smokeQueries = Seq(
    "q_x_dedup_minhash", "q_x_dedup_simhash", "q_x_range_join",
    "q_x_asof_join", "q_x_asof_native", "q_x_text_tokens",
    "q_x_train_split", "q_x_corpus_shuffle", "q_x_bpe_pairs",
    "q_x_resample_ffill", "q_x_ann_cosine_topk",
    "q_x_decontaminate_semantic", "q_x_lang_id", "q_x_tfidf_top1",
    "q_x_domain_balance", "q_x_seq_pack", "q_x_incremental_agg")

  def main(args: Array[String]): Unit = args.toList match {
    case "gen" :: src :: out :: n :: Nil => gen(src, out, n.toInt)
    case "run" :: src :: scaled :: Nil => run(src, scaled)
    case "bpe" :: src :: k :: Nil => bpe(src, k.toInt)
    case "stream" :: src :: scaled :: Nil => stream(src, scaled)
    case "bloom" :: src :: work :: Nil => bloom(src, work)
    case _ =>
      System.err.println(
        "usage: ScaleSmokeMain gen <srcSfDir> <outDir> <N> | " +
          "run <srcSfDir> <scaledDir> | bpe <srcSfDir> <k> | " +
          "stream <srcSfDir> <scaledDir> | bloom <srcSfDir> <workDir>")
      sys.exit(2)
  }

  /** Storage-layer scale evidence: Bloom-sidecar point-lookup pruning at
    * 1× vs 10×. Both corpora are written range-clustered on the key with
    * files ∝ corpus size (the 100 TB layout: fixed-size clustered files),
    * indexed with [[graft.etl.BloomIndex]], and probed with the same key
    * set. The claim under test: lookup cost is the number of files
    * SCANNED, which stays ~1 while total files grow 10× — the sidecar
    * prune, not the scan, absorbs corpus growth. */
  private def bloom(src: String, work: String): Unit = {
    val spark = session()
    val docs = spark.read.parquet(s"$src/documents.parquet")
      .select(col("doc_id"), col("source"), col("n_chars"))
    val docOff = 10000000L
    val docs10 = (0 until 10).map(i =>
      docs.withColumn("doc_id", col("doc_id") + lit(i * docOff)))
      .reduce(_.unionAll(_))

    def prepare(d: DataFrame, nFiles: Int, out: String): String = {
      d.repartitionByRange(nFiles, col("doc_id"))
        .write.mode("overwrite").parquet(out)
      graft.etl.BloomIndex.build(spark, out, "doc_id",
        expectedPerFile = 1L << 16, numBits = 1L << 20)
      out
    }
    val dir1 = prepare(docs, 8, s"$work/docs_1x")
    val dirN = prepare(docs10, 80, s"$work/docs_10x")

    // Deterministic probe set spread across the 10x id space (replica i,
    // base id 137*i mod the ACTUAL 1x id range — hard-coding the range
    // would let out-of-range probes prune every file and overstate the
    // stat) — every probe exists in 10x; the first 10 also exist in 1x.
    val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
    require(maxId >= 0, "bloom smoke expects non-negative 0-based doc_ids")
    val probes = (0 until 20).map(i =>
      (i % 10) * docOff + (137L * i) % (maxId + 1))
    def stats(dir: String, ps: Seq[Long]): (Double, Int, Long) = {
      var scanned = 0L; var total = 0
      ps.foreach { p =>
        val (rows, st) = graft.etl.BloomIndex.readPointLookup(
          spark, dir, "doc_id", p)
        rows.write.format("noop").mode("overwrite").save()
        scanned += st.scannedFiles; total = st.totalFiles
      }
      (scanned.toDouble / ps.size, total, scanned)
    }
    val (avg1, tot1, _) = stats(dir1, probes.take(10).map(_ % docOff))
    val (avgN, totN, _) = stats(dirN, probes)
    println(f"[scale-smoke] bloom point lookup: 1x avg ${avg1}%.1f of $tot1 files scanned; " +
      f"10x avg ${avgN}%.1f of $totN files scanned")
    spark.stop()
  }

  /** Streaming state boundedness at 1× vs N×: run the stateful streaming
    * operators over the events table at both scales and record, from
    * `StreamingQueryProgress.stateOperators`, the peak state rows and
    * state memory. The 100 TB claim under test: state scales with each
    * operator's INTRINSIC cardinality — (window × event_type) for the
    * windowed agg (constant in input rows, since replicas share the time
    * range), distinct keys for dedup, watermark-buffered rows for the
    * stream-stream join — never with raw input volume beyond that. */
  private def stream(src: String, scaled: String): Unit = {
    val spark = session()

    def stage(dir: String): java.nio.file.Path = {
      val st = java.nio.file.Files.createTempDirectory("graft-scale-stream")
      try java.nio.file.Files.createSymbolicLink(
        st.resolve("events.parquet"),
        // absolutize: a relative target would resolve against the temp dir
        java.nio.file.Paths.get(dir, "events.parquet").toAbsolutePath)
      catch { case e: Throwable =>
        java.nio.file.Files.deleteIfExists(st); throw e
      }
      st
    }
    def unstage(st: java.nio.file.Path): Unit = {
      java.nio.file.Files.deleteIfExists(st.resolve("events.parquet"))
      java.nio.file.Files.deleteIfExists(st)
    }

    // (input rows, peak state rows, peak state bytes) for one stream run.
    // The testdata events.parquet is a single FILE (needs a staged symlink
    // dir for the file source); the gen-written scaled one is a Spark
    // DIRECTORY of part files, streamable directly.
    def measure(label: String, dir: String,
                mk: DataFrame => DataFrame, mode: String): (Long, Long, Long) = {
      val evp = java.nio.file.Paths.get(dir, "events.parquet")
      val st = if (java.nio.file.Files.isDirectory(evp)) None else Some(stage(dir))
      val streamDir = st.fold(evp.toString)(_.toString)
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      try {
        val events = graft.streaming.EventsStream.readEvents(spark, streamDir)
        val name = s"smoke_${label}_${System.nanoTime()}"
        val q = mk(events).writeStream.format("memory").queryName(name)
          .outputMode(mode).start()
        try {
          try q.processAllAvailable() finally q.stop()
          val ps = q.recentProgress.toSeq
          def stateSum(f: org.apache.spark.sql.streaming.StateOperatorProgress => Long) =
            ps.map(p => Option(p.stateOperators).map(_.map(f).sum).getOrElse(0L))
          val inRows = ps.map(_.numInputRows).sum
          val peakRows = (0L +: stateSum(_.numRowsTotal)).max
          val peakBytes = (0L +: stateSum(_.memoryUsedBytes)).max
          (inRows, peakRows, peakBytes)
        } finally spark.catalog.dropTempView(name)
      } finally {
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        st.foreach(unstage)
      }
    }

    val ops: Seq[(String, DataFrame => DataFrame, String)] = Seq(
      ("window_agg",
        (e: DataFrame) => graft.streaming.EventsStream.windowedCounts(e),
        "append"),
      ("dedup",
        (e: DataFrame) => graft.streaming.EventsStream
          .dedupStream(e, Seq("user_id", "event_type")),
        "append"),
      ("ss_join",
        (e: DataFrame) => graft.streaming.EventsStream.clickToPurchaseJoin(e),
        "append"))

    println(f"${"op"}%-12s ${"in_1x"}%9s ${"state_1x"}%9s ${"MB_1x"}%7s ${"in_Nx"}%9s ${"state_Nx"}%9s ${"MB_Nx"}%7s ${"stateR"}%6s")
    ops.foreach { case (label, mk, mode) =>
      val (i1, r1, m1) = measure(label, src, mk, mode)
      val (in, rn, mn) = measure(label, scaled, mk, mode)
      println(f"$label%-12s $i1%9d $r1%9d ${m1 / 1e6}%7.1f $in%9d $rn%9d ${mn / 1e6}%7.1f ${if (r1 > 0) f"${rn.toDouble / r1}%.1f" else "-"}%6s")
    }
    spark.stop()
  }

  /** Wall-clock learnMerges(k) over the documents vocabulary — the
    * end-to-end tokenizer-induction number PERF_NOTES records (the
    * bench's q_x_bpe_pairs covers only round-0 pair counting). */
  private def bpe(src: String, k: Int): Unit = {
    val spark = session()
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val words = graft.ext.Bpe.wordCounts(docs, "text")
    words.write.format("noop").mode("overwrite").save() // warm scan
    val t0 = System.nanoTime()
    val (merges, syms) = graft.ext.Bpe.learnMerges(words, k)
    syms.write.format("noop").mode("overwrite").save()
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"[scale-smoke] learnMerges(k=$k) at $src: $dt%.2f s, " +
      s"${merges.size} merges learned")
    spark.stop()
  }

  private def session(): SparkSession = {
    val s = GraftSession.builder("graft-scale-smoke", "32").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def gen(src: String, out: String, n: Int): Unit = {
    val spark = session()
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val events = spark.read.parquet(s"$src/events.parquet") // ts stays long nanos
    val embs = spark.read.parquet(s"$src/embeddings.parquet")
    val docOff = 10000000L
    val evtOff = 100000000L
    val vecOff = 10000000L

    def replicas(i0: DataFrame, f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until n).map(i => f(i0, i)).reduce(_.unionAll(_))

    val docsN = replicas(docs, { (d, i) =>
      val base = d.withColumn("doc_id", col("doc_id") + lit(i * docOff))
      if (i == 0) base
      else base.withColumn("text", array_join(flatten(transform(
        filter(split(col("text"), " ", -1), t => t =!= lit("")),
        (t, j) => when(j % 5 === 0, array(lit(s"r${i}x"), t))
          .otherwise(array(t)))), " "))
        .withColumn("n_chars", length(col("text")))
    })
    val eventsN = replicas(events, { (e, i) =>
      e.withColumn("event_id", col("event_id") + lit(i * evtOff))
        .withColumn("user_id", col("user_id") + lit(i * 10000L))
    })
    // Embeddings get the same honesty treatment as documents: replica i>0
    // sign-flips a replica-specific ~half of the coordinates (a diagonal
    // ±1 orthogonal transform). Within a replica every cosine is preserved
    // EXACTLY (planted near-dups stay near-dups); across replicas the copy
    // of a vector lands at cos ≈ 0, so the N× corpus has N× similarity
    // structure instead of N verbatim copies of every vector.
    val embsN = replicas(embs, { (e, i) =>
      val base = e.withColumn("vec_id", col("vec_id") + lit(i * vecOff))
      if (i == 0) base
      else base.withColumn("embedding",
        transform(col("embedding"), (v, j) =>
          when(pmod(xxhash64(j.cast("long") * lit(1000003L) + lit(i.toLong)),
            lit(2)) === 0, -v).otherwise(v).cast("float")))
    })

    docsN.repartition(32).write.mode("overwrite").parquet(s"$out/documents.parquet")
    eventsN.repartition(32).write.mode("overwrite").parquet(s"$out/events.parquet")
    embsN.repartition(32).write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    println(s"[scale-smoke] wrote ${n}x tables to $out")
    spark.stop()
  }

  /** Wall time + shuffle bytes per query, 1× vs N×. Same noise protocol
    * as Bench: the full (query × dir) grid runs `reps` times end-to-end
    * and each cell keeps its min across passes, so a co-tenant burst
    * (multi-minute, frequent on this host) inflates one pass, not every
    * measurement of one cell. Shuffle bytes are deterministic per plan,
    * but the listener bus is async — each pass's value is recorded after
    * polling the counter to quiescence, and the report takes the per-cell
    * MEDIAN across passes (flagged `!` on disagreement), so one pass with
    * a late-posted stage event can't misattribute bytes silently. */
  private def run(src: String, scaled: String): Unit = {
    val spark = session()
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        if (m != null) shuffleBytes.addAndGet(
          m.shuffleWriteMetrics.bytesWritten + m.shuffleReadMetrics.totalBytesRead)
      }
    }
    spark.sparkContext.addSparkListener(listener)

    def force(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // Poll the counter until it stops moving (3 consecutive quiet 100 ms
    // polls, 10 s cap) — a fixed sleep loses the race against a slow
    // listener-bus drain and attributes this query's bytes to the next.
    def drainedBytes(): Long = {
      var last = shuffleBytes.get(); var stable = 0; var polls = 0
      while (stable < 3 && polls < 100) {
        Thread.sleep(100); polls += 1
        val now = shuffleBytes.get()
        if (now == last) stable += 1 else { stable = 0; last = now }
      }
      // Cap exit with the counter still moving = the next cell's bytes are
      // suspect; say so rather than letting a systematic slow drain agree
      // across passes and dodge the `!` flag.
      if (stable < 3) System.err.println(
        "[scale-smoke] WARNING: listener bus still draining after 10 s; " +
          "next shuffle-byte cell may be misattributed")
      last
    }

    def timed(name: String, dir: String): (Double, Long) = {
      val q = Catalog.byName(name)
      GraftSession.dropCachedBlocks(spark)
      val b0 = drainedBytes()
      val t0 = System.nanoTime()
      force(q.run(spark, dir))
      val dt = (System.nanoTime() - t0) / 1e9
      (dt, drainedBytes() - b0)
    }

    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    require(reps >= 1, s"SPARK_GRAFT_REPS must be >= 1, got $reps")
    val t1 = scala.collection.mutable.Map[String, Double]().withDefaultValue(Double.MaxValue)
    val tn = scala.collection.mutable.Map[String, Double]().withDefaultValue(Double.MaxValue)
    val b1 = scala.collection.mutable.Map[String, scala.collection.mutable.ArrayBuffer[Long]]()
    val bn = scala.collection.mutable.Map[String, scala.collection.mutable.ArrayBuffer[Long]]()
    val failed = scala.collection.mutable.Set[String]()
    // warm pass (codegen/classloading) on the small dir only
    smokeQueries.foreach { name =>
      try timed(name, src)
      catch { case e: Throwable =>
        println(s"$name FAILED: ${e.getMessage}"); failed += name }
    }
    for (pass <- 1 to reps) {
      smokeQueries.filterNot(failed).foreach { name =>
        try {
          val (a, ba) = timed(name, src)
          val (b, bb) = timed(name, scaled)
          t1(name) = math.min(t1(name), a); tn(name) = math.min(tn(name), b)
          b1.getOrElseUpdate(name,
            scala.collection.mutable.ArrayBuffer[Long]()) += ba
          bn.getOrElseUpdate(name,
            scala.collection.mutable.ArrayBuffer[Long]()) += bb
        } catch {
          case e: Throwable =>
            println(s"$name FAILED: ${e.getMessage}"); failed += name
        }
      }
      System.err.println(s"[scale-smoke] pass $pass/$reps done")
    }
    // Median across passes; `!` marks cells whose passes disagreed (a
    // late-posted stage event landed in the wrong query's window).
    def med(xs: Seq[Long]): Long = { val s = xs.sorted; s(s.size / 2) }
    def flag(xs: Seq[Long]): String = if (xs.distinct.size > 1) "!" else ""
    println(f"${"query"}%-24s ${"t_1x"}%8s ${"t_Nx"}%8s ${"ratio"}%6s ${"shuf_1x"}%10s ${"shuf_Nx"}%10s ${"shufR"}%6s")
    smokeQueries.filterNot(failed).foreach { name =>
      def mb(x: Long) = f"${x / 1e6}%.1fMB"
      val (s1, sn) = (med(b1(name).toSeq), med(bn(name).toSeq))
      println(f"$name%-24s ${t1(name)}%8.2f ${tn(name)}%8.2f ${tn(name) / t1(name)}%6.1f ${mb(s1) + flag(b1(name).toSeq)}%10s ${mb(sn) + flag(bn(name).toSeq)}%10s ${if (s1 > 0) f"${sn.toDouble / s1}%.1f" else "-"}%6s")
    }
    spark.stop()
  }
}
