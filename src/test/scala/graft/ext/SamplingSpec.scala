package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SamplingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ids(n: Int) = {
    val spark0 = spark
    import spark0.implicits._
    (0L until n.toLong).toDF("id")
  }

  test("deterministicSplit: stable, partition-independent, ~87.5/6.25/6.25") {
    val df = ids(4000)
    val a = Sampling.deterministicSplit(df, "id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Sampling.deterministicSplit(df.repartition(13), "id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b) // layout-independent
    val counts = a.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(math.abs(counts("train") - 3500) < 200)
    assert(math.abs(counts("val") - 250) < 100)
    assert(math.abs(counts("test") - 250) < 100)
    // known anchor: md5("0") = cfcd2084... → bucket 0xc = 12 → train
    assert(a(0L) == "train")
  }

  test("deterministicSample: rate respected, subset monotone in rate") {
    val df = ids(8000)
    val s10 = Sampling.deterministicSample(df, "id", 0.1)
      .collect().map(_.getLong(0)).toSet
    val s30 = Sampling.deterministicSample(df, "id", 0.3)
      .collect().map(_.getLong(0)).toSet
    assert(math.abs(s10.size - 800) < 150)
    assert(math.abs(s30.size - 2400) < 300)
    assert(s10.subsetOf(s30)) // nested samples: a row kept at 10% stays at 30%
    assert(Sampling.deterministicSample(df, "id", 0.0).count() == 0)
    assert(Sampling.deterministicSample(df, "id", 1.0).count() == 8000)
  }

  test("shufflePositions: exact global md5 rank, no gaps, layout-independent") {
    val df = ids(3000)
    val out = Sampling.shufflePositions(df, "id")
      .collect().map(r => (r.getLong(1), r.getAs[Long]("pos"))).toMap
    // positions are a permutation of 1..n
    assert(out.values.toSeq.sorted == (1L to 3000L))
    // hierarchical rank == the naive global rank
    def md5Hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val naive = (0L until 3000L)
      .sortBy(id => (md5Hex(id.toString), id))
      .zipWithIndex.map { case (id, i) => id -> (i + 1L) }.toMap
    assert(out == naive)
    val re = Sampling.shufflePositions(df.repartition(17), "id")
      .collect().map(r => (r.getLong(1), r.getAs[Long]("pos"))).toMap
    assert(re == out)
  }

  test("domainQuota exact; domainRateCap approximate, nested, skew-proof") {
    val spark0 = spark
    import spark0.implicits._
    // skewed domains: 'big' 3000 rows, 'small' 40 rows
    val df = ((0 until 3000).map(i => (i.toLong, "big")) ++
      (3000 until 3040).map(i => (i.toLong, "small"))).toDF("id", "src")
    val exact = Sampling.domainQuota(df, "id", "src", quota = 100)
      .filter(col("kept") === 1L)
      .groupBy("src").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact == Map("big" -> 100L, "small" -> 40L)) // cap binds only where exceeded
    val approx = Sampling.domainRateCap(df, "id", "src", quota = 100)
      .filter(col("kept") === 1L)
      .groupBy("src").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx("small") == 40L)            // rate 1.0 keeps everything
    assert(math.abs(approx("big") - 100L) < 60) // binomial around the quota
  }

  test("domainQuotaExact: heap selection == window selection, skew-proof, " +
      "layout-independent, partial-aggregated") {
    val spark0 = spark
    import spark0.implicits._
    val df = ((0 until 3000).map(i => (i.toLong, "big")) ++
      (3000 until 3040).map(i => (i.toLong, "small"))).toDF("id", "src")
    def keyOf(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val heap = Sampling.domainQuotaExact(df, "id", "src", quota = 100)
    val heapRows = keyOf(heap.collect())
    // exactly the window variant's kept rows, with identical ranks
    // (order keys differ only under a 52-bit md5-prefix collision —
    // absent here, and id-tiebroken deterministically regardless)
    val win = Sampling.domainQuota(df, "id", "src", quota = 100)
      .filter(col("kept") === 1L)
      .select(col("src"), col("quota_rank"), col("id"))
    assert(heapRows == keyOf(win.collect()))
    // short stratum keeps everything: 40 < quota
    assert(heapRows.count(_._1 == "small") == 40)
    assert(heapRows.count(_._1 == "big") == 100)
    // layout-independent
    val re = Sampling.domainQuotaExact(
      df.repartition(17), "id", "src", quota = 100)
    assert(keyOf(re.collect()) == heapRows)
    // the skew-proof claim is structural: the plan aggregates PARTIALLY
    // (map-side heaps), so no whale-domain sort partition exists — unlike
    // domainQuota, whose plan carries a window over the full domain
    val plan = heap.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan.take(2000))
    assert(plan.toLowerCase.contains("partial_topk_by_score"),
      plan.take(2000))
    assert(!plan.contains("Window"), plan.take(2000))
  }

  test("mixtureUpsample: copies in {floor(w), ceil(w)}, expected total ~ w*n") {
    val spark0 = spark
    import spark0.implicits._
    val df = ((0 until 2000).map(i => (i.toLong, "hi")) ++
      (2000 until 4000).map(i => (i.toLong, "lo"))).toDF("id", "src")
    val w = when(col("src") === "hi", 2.5).otherwise(0.75)
    val out = Sampling.mixtureUpsample(df, "id", w)
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getLong(2), r.getLong(3)))
    val byId = out.groupBy(_._1)
    // copy counts land on floor/ceil of the weight; copy_idx is 1..n
    byId.foreach { case (_, rows) =>
      val n = rows.head._3
      assert(rows.length == n)
      assert(rows.map(_._4).sorted.toSeq == (1L to n))
      if (rows.head._2 == "hi") assert(n == 2L || n == 3L)
      else assert(n == 1L)
    }
    // expected totals: hi 2000*2.5 = 5000, lo 2000*0.75 = 1500
    val hiTotal = out.count(_._2 == "hi")
    val loTotal = out.count(_._2 == "lo")
    assert(math.abs(hiTotal - 5000) < 200, s"hi total $hiTotal")
    assert(math.abs(loTotal - 1500) < 200, s"lo total $loTotal")
    // dropped lo docs (n_copies = 0) appear nowhere
    assert(byId.size < 4000)
  }

  test("temperatureSample: exact-sum targets, tail upsampled, layout-independent") {
    val spark0 = spark
    import spark0.implicits._
    // Zipf-ish domain sizes: 640 / 160 / 40 / 10
    val df = (
      (0 until 640).map(i => (i.toLong, "head")) ++
      (640 until 800).map(i => (i.toLong, "mid")) ++
      (800 until 840).map(i => (i.toLong, "tail")) ++
      (840 until 850).map(i => (i.toLong, "rare"))).toDF("id", "dom")

    val s = Sampling.temperatureSample(df, "id", "dom", alpha = 0.5,
      targetN = 100L)
    val targets = s.select(col("dom"), col("target_n")).distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // largest-remainder: targets sum EXACTLY to targetN
    assert(targets.values.sum == 100L, s"targets: $targets")
    // sqrt weights: 25.3 / 12.65 / 6.32 / 3.16 → shares ~53/27/13/7
    // vs natural shares 75/19/5/1: head down-, tail/rare up-sampled
    assert(targets("head") < 640 * 100 / 850)
    assert(targets("tail") > 40 * 100 / 850)
    assert(targets("rare") > 10 * 100 / 850)
    // kept counts = min(target, n_d); all targets here fit availability
    val kept = s.filter(col("kept") === 1L).groupBy(col("dom"))
      .agg(count(lit(1)).as("k"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept == targets.filter(_._2 > 0))
    // layout independence
    val a = s.select(col("id"), col("kept"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Sampling.temperatureSample(df.repartition(13), "id", "dom",
        alpha = 0.5, targetN = 100L)
      .select(col("id"), col("kept"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
    // alpha = 1 recovers ~proportional targets; alpha = 0 ~uniform
    val prop = Sampling.temperatureSample(df, "id", "dom", 1.0, 100L)
      .select(col("dom"), col("target_n")).distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(prop("head") - 75L) <= 1)
    val unif = Sampling.temperatureSample(df, "id", "dom", 0.0, 100L)
      .select(col("dom"), col("target_n")).distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(unif.values.forall(v => v == 25L))
    // over-subscribed domain keeps only its n_d rows, shortfall visible
    val tight = Sampling.temperatureSample(df, "id", "dom", 0.0, 200L)
    val rareKept = tight.filter(col("dom") === "rare" && col("kept") === 1L)
      .count()
    assert(rareKept == 10L) // target 50, only 10 rows exist
  }

  test("stratified: per-stratum rates honored approximately") {
    val spark0 = spark
    import spark0.implicits._
    val df = (0 until 4000).map(i => (i.toLong, if (i % 2 == 0) "a" else "b"))
      .toDF("id", "src")
    val out = Sampling.stratified(df, "src", Map("a" -> 0.5, "b" -> 0.1), seed = 7L)
      .groupBy("src").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(out("a") - 1000L) < 220)
    assert(math.abs(out("b") - 200L) < 120)
  }

  /** Brute-force reference for tokenBudgetSelect: the literal global-sort
    * take-while over (score DESC, id ASC). */
  private def bruteBudget(rows: Seq[(Long, String)], budget: Long): Set[Long] = {
    def tokens(t: String) = t.split(" ", -1).length.toLong
    val spark0 = spark
    import spark0.implicits._
    // score via the engine's own expression, one tiny frame
    val withScore = rows.toDF("doc_id", "text")
      .select(col("doc_id"),
        TextAnalysis.qualityScoreBp(col("text")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ordered = rows.map { case (id, t) => (id, tokens(t), withScore(id)) }
      .sortBy { case (id, _, s) => (-s, id) }
    var cum = 0L
    val sel = scala.collection.mutable.Set[Long]()
    var stopped = false
    for ((id, n, _) <- ordered if !stopped) {
      cum += n
      if (cum <= budget) sel += id else stopped = true
    }
    sel.toSet
  }

  test("tokenBudgetSelect: equals the global-sort take-while at every level") {
    val spark0 = spark
    import spark0.implicits._
    // texts engineered so many docs tie on score (forcing the id-range
    // levels) and ids span shards incl. negatives (arithmetic shift order)
    val rows = (0 until 400).map { i =>
      val id = (i.toLong - 200L) * 37L // negative and positive, sparse
      val words = Seq.fill(4 + i % 7)("the word mix alpha beta")
      (id, words.mkString(" "))
    }
    val df = rows.toDF("doc_id", "text")
    for (budget <- Seq(0L, 1L, 500L, 3000L, 7000L, 1000000L)) {
      val got = Sampling
        .tokenBudgetSelect(df, "doc_id", "text", budget, shardShift = 6)
        .collect().map(_.getLong(0)).toSet
      assert(got == bruteBudget(rows, budget), s"budget=$budget")
    }
  }

  test("leakageSafeSplit: no cluster straddles splits, incl. near-dups") {
    val docs = graft.sources.Sources
      .table(spark, "/root/testdata/sf0.001", "documents")
    // near-dup clusters (the hard case: members differ textually, so a
    // per-doc md5 split WOULD scatter them across splits)
    val clusters = Dedup.minhash(docs, "doc_id", "text")
    val out = Sampling.leakageSafeSplit(clusters)
    val perCluster = out.groupBy(col("cluster_id"))
      .agg(countDistinct(col("split")).as("k"), count(lit(1)).as("n"))
    assert(perCluster.filter(col("k") =!= 1L).count() == 0L)
    // the invariant is non-vacuous: multi-member clusters exist
    assert(perCluster.filter(col("n") > 1L).count() > 0L)
    // and the per-doc split really would leak: some multi-member cluster
    // has members whose OWN md5 buckets differ from the cluster's
    val perDoc = Sampling.deterministicSplit(out, "doc_id")
      .withColumnRenamed("split", "split2")
    assert(out.join(perDoc.select(col("doc_id"), col("split2")), "doc_id")
      .filter(col("split") =!= col("split2")).count() > 0L)
  }

  test("tokenBudgetSelect: layout-independent, exact token accounting") {
    val docs = graft.sources.Sources
      .table(spark, "/root/testdata/sf0.001", "documents")
    val a = Sampling.tokenBudgetSelect(docs, "doc_id", "text", 15000L)
    val b = Sampling
      .tokenBudgetSelect(docs.repartition(13), "doc_id", "text", 15000L)
    val selA = a.collect().map(_.getLong(0)).toSet
    assert(selA == b.collect().map(_.getLong(0)).toSet)
    // the prefix property: selected tokens fit the budget, and the next
    // doc in (score DESC, id) order would overflow it
    val spent = a.agg(sum(col("n_tokens"))).head().getLong(0)
    assert(spent <= 15000L)
    val all = docs.select(col("doc_id"),
        size(split(col("text"), " ", -1)).cast("long").as("n"),
        TextAnalysis.qualityScoreBp(col("text")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy { case (id, _, s) => (-s, id) }
    val firstOut = all.find { case (id, _, _) => !selA.contains(id) }
    assert(firstOut.exists { case (_, n, _) => spent + n > 15000L })
  }

  test("weightedSample: exact k, deterministic, weight-monotone in expectation") {
    val spark0 = spark
    import spark0.implicits._
    // two weight classes: heavy (w=1000) ids 0-99, light (w=10) ids 100-999
    val df = ((0L until 100L).map((_, 1000L)) ++
      (100L until 1000L).map((_, 10L))).toDF("id", "w")
    val s1 = Sampling.weightedSample(df, "id", "w", 200)
      .collect().map(_.getLong(0)).sorted
    assert(s1.length == 200)
    // deterministic under a different physical layout
    val s2 = Sampling.weightedSample(df.repartition(7), "id", "w", 200)
      .collect().map(_.getLong(0)).sorted
    assert(s1.sameElements(s2))
    // heavy items are 100x likelier per unit: with total weight
    // 100k + 9k, a 200-draw E-S sample keeps nearly all 100 heavy ids
    val nHeavy = s1.count(_ < 100L)
    assert(nHeavy > 80, s"expected heavy class to dominate, got $nHeavy/100")
    // k >= n degenerates to the full set
    assert(Sampling.weightedSample(df, "id", "w", 5000).count() == 1000L)
  }

  test("weightedSamplePerDomain: heap selection == window selection, per stratum") {
    val spark0 = spark
    import spark0.implicits._
    val df = (0L until 900L)
      .map(i => (i, s"d${i % 3}", 1L + i % 50)).toDF("id", "dom", "w")
    val got = Sampling.weightedSamplePerDomain(df, "id", "dom", "w", 20)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.length == 60 &&
      got.groupBy(_._1).values.forall(_.length == 20))
    // reference: explicit per-domain window over the identical E-S key
    val h = conv(substring(md5(col("id").cast("string")), 1, 12), 16, 10)
      .cast("double")
    val key = log((h + lit(0.5)) / lit(math.pow(2.0, 48))) /
      col("w").cast("double")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("dom")).orderBy(col("__k").desc, col("id"))
    val ref = df.withColumn("__k", key)
      .withColumn("sample_rank", row_number().over(w).cast("long"))
      .filter(col("sample_rank") <= 20)
      .select(col("dom"), col("sample_rank"), col("id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.sortBy(x => (x._1, x._2)).toSeq ==
      ref.sortBy(x => (x._1, x._2)).toSeq)
    // layout-independent
    val again = Sampling
      .weightedSamplePerDomain(df.repartition(17), "id", "dom", "w", 20)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.sortBy(x => (x._1, x._2)).toSeq ==
      again.sortBy(x => (x._1, x._2)).toSeq)
  }
}
