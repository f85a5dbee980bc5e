package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.Sources

/** Ground-truth checks for the dedup family against the planted
  * near-duplicates in the synthetic corpus (verified externally: sf0.001 has
  * 28 doc pairs with 3-gram Jaccard > 0.7, e.g. the {8,12,120,360} cluster
  * and {0,50,82}). */
class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val docs = Sources.table(spark, "/root/testdata/sf0.001", "documents")

  test("exact dedup: synthetic dups collapse, canonical = min id") {
    import spark.implicits._
    val df = Seq((1L, "aaa"), (2L, "bbb"), (3L, "aaa"), (4L, "aaa"))
      .toDF("id", "text")
    val out = Dedup.exact(df, "id", Seq("text")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out(1L) == (1L, true))
    assert(out(3L) == (1L, false))
    assert(out(4L) == (1L, false))
    assert(out(2L) == (2L, true))
  }

  test("hash-keyed exact dedup equals full-key exact dedup on real corpus") {
    val byKey = Dedup.exact(docs, "doc_id", Seq("text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byHash = Dedup.exactByHash(docs, "doc_id", Seq("text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byKey == byHash)
  }

  test("minhash: planted near-dup clusters are found (recall)") {
    val out = Dedup.minhash(docs, "doc_id", "text", threshold = 0.7)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == 500) // full assignment, one row per doc
    // known cluster {8,12,120,360}: all should share cluster_id 8
    assert(Set(out(8L), out(12L), out(120L), out(360L)) == Set(8L))
    // known cluster {0,50,82}
    assert(Set(out(0L), out(50L), out(82L)) == Set(0L))
    // a doc with no near-dups stays its own cluster
    assert(out(1L) == 1L)
  }

  test("incrementalMatch: held-out near-dups rematch their cluster; novel docs don't") {
    import org.apache.spark.sql.functions.col
    // hold out one member of each planted cluster plus a known-novel doc
    val newIds = Set(12L, 50L, 1L)
    val corpus = docs.filter(!col("doc_id").isin(newIds.toSeq: _*))
    val newDocs = docs.filter(col("doc_id").isin(newIds.toSeq: _*))
    val index = Dedup.bandIndex(corpus, "doc_id", "text")
    val matches = Dedup.incrementalMatch(newDocs, corpus, index,
        "doc_id", "text", threshold = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byNew = matches.groupBy(_._1)
    // 12 belongs to planted cluster {8,12,120,360}; 50 to {0,50,82}
    assert(byNew.contains(12L), "held-out 12 found no corpus match")
    assert(byNew(12L).map(_._2).toSet.subsetOf(Set(8L, 120L, 360L)))
    assert(byNew.contains(50L), "held-out 50 found no corpus match")
    assert(byNew(50L).map(_._2).toSet.subsetOf(Set(0L, 82L)))
    // novel doc matches nothing; all emitted jaccards honor the threshold
    assert(!byNew.contains(1L))
    assert(matches.forall(_._3 >= 0.7))
  }

  test("writeBandIndex: bucketed table joins shuffle-free and matches in-memory index") {
    import org.apache.spark.sql.functions.col
    val newIds = Set(12L, 50L, 1L)
    val corpus = docs.filter(!col("doc_id").isin(newIds.toSeq: _*))
    val newDocs = docs.filter(col("doc_id").isin(newIds.toSeq: _*))
    Dedup.writeBandIndex(corpus, "doc_id", "text", "corpus_band_index",
      numBuckets = 4)
    try {
      val table = spark.table("corpus_band_index")

      // plan-level: the candidate join (the only corpus-index touchpoint)
      // exchanges+sorts ONLY the new-batch side — the index's parquet
      // layout IS the join partitioning and ordering. At test scale the
      // planner would (correctly) broadcast the tiny new batch and touch
      // no partitioning at all; disable auto-broadcast to exercise the
      // at-scale SortMergeJoin shape the bucketing exists for.
      val bcKey = "spark.sql.autoBroadcastJoinThreshold"
      // bucketed-scan output ORDERING is off by default since Spark 3
      // (multi-file buckets would need a merge); one-file-per-bucket
      // layouts may opt in and drop the index-side local sort too
      val ordKey = "spark.sql.legacy.bucketedTableScan.outputOrdering"
      val bcOld = spark.conf.get(bcKey)
      def joinPlan(): String = {
        val newBands = Dedup.bandIndex(newDocs, "doc_id", "text")
        table.join(newBands, Seq("band", "bh"))
          .queryExecution.executedPlan.toString
      }
      val (plan, planOrdered) = try {
        spark.conf.set(bcKey, "-1")
        val p = joinPlan()
        spark.conf.set(ordKey, "true")
        (p, joinPlan())
      } finally {
        spark.conf.set(bcKey, bcOld)
        spark.conf.set(ordKey, "false")
      }
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(plan.contains("Bucketed: true"),
        s"index scan not bucketed:\n$plan")
      assert("Exchange".r.findAllIn(plan).size == 1,
        s"expected exactly 1 exchange (new side only):\n$plan")
      assert(" Sort ".r.findAllIn(planOrdered).size == 1,
        s"expected index-side sort elided under outputOrdering:\n$planOrdered")

      // result-level: table-backed index ≡ in-memory index
      val fromTable = Dedup.incrementalMatch(newDocs, corpus, table,
          "doc_id", "text", threshold = 0.7)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val fromMemory = Dedup.incrementalMatch(newDocs, corpus,
          Dedup.bandIndex(corpus, "doc_id", "text"),
          "doc_id", "text", threshold = 0.7)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(fromTable == fromMemory)
      assert(fromTable.nonEmpty)
    } finally spark.sql("DROP TABLE IF EXISTS corpus_band_index")
  }

  test("minhash: precision — clustered pairs really have high Jaccard") {
    val out = Dedup.minhash(docs, "doc_id", "text", threshold = 0.7)
    val clustered = out.filter("doc_id != cluster_id").collect()
    assert(clustered.nonEmpty)
    val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    clustered.foreach { r =>
      val jac = TextHashing.ngramJaccard(
        org.apache.spark.unsafe.types.UTF8String.fromString(texts(r.getLong(0))),
        org.apache.spark.unsafe.types.UTF8String.fromString(texts(r.getLong(1))), 3)
      // transitive closure can chain below the pairwise threshold, but not far
      assert(jac > 0.5, s"pair ${r.getLong(0)},${r.getLong(1)} jac=$jac")
    }
  }

  test("simhash: near-identical docs collide within hamming 3") {
    val out = Dedup.simhashDedup(docs, "doc_id", "text", maxHamming = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == 500)
    // the tightest planted pair (jaccard ≈ 0.99) should simhash-cluster
    assert(out(8L) == out(360L) || out(12L) == out(360L),
      "0.99-jaccard pair not clustered by simhash")
  }

  test("connected components: chain collapses to min label (both paths)") {
    import spark.implicits._
    val nodes = (1L to 6L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("a", "b")
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L, 6L -> 6L)
    // driver union-find path (edges below the small limit)
    val cc = Dedup.connectedComponents(nodes, edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == expected)
    // distributed label-propagation path (forced)
    val dcc = Dedup.distributedCC(nodes, edges, maxIter = 15).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dcc == expected)
    // is_canonical marks exactly the cluster roots on both paths
    val canon = Dedup.connectedComponents(nodes, edges)
      .filter("is_canonical").collect().map(_.getLong(0)).toSet
    assert(canon == Set(1L, 4L, 6L))
  }

  test("embedding near-dup report covers every vector") {
    val emb = Sources.table(spark, "/root/testdata/sf0.001", "embeddings")
    val out = Dedup.embeddingNearDup(emb, "vec_id", "embedding")
    assert(out.count() == 500)
    assert(out.columns.toSeq == Seq("vec_id", "n_candidates", "n_near_dups"))
  }

  test("segmentDedup: keep-first by (doc, pos), docs rewritten in order") {
    val spark0 = spark
    import spark0.implicits._
    // 2-token segments. "a b" occurs at (1,0), (1,2 — intra-doc repeat),
    // (2,0); only (1,0) survives. "c d" at (1,1) and (3,1); (1,1) wins.
    // Doc 4 is entirely the duplicate segment → rewritten to "".
    val df = Seq(
      (1L, "a b c d a b"),
      (2L, "a b x y"),
      (3L, "z w c d tail"), // 5 tokens → short tail segment "tail"
      (4L, "a b"),
      (5L, "")               // empty doc → no segments, absent from output
    ).toDF("doc_id", "text")
    val out = Dedup.segmentDedup(df, "doc_id", "text", segmentTokens = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L))
    assert(out(1L) == ((3L, 1L, "a b c d")))      // intra-doc repeat removed
    assert(out(2L) == ((2L, 1L, "x y")))          // first segment lost to doc 1
    assert(out(3L) == ((3L, 1L, "z w tail")))     // "c d" lost, tail kept
    assert(out(4L) == ((1L, 1L, "")))             // fully removed
  }

  test("segmentDedup: layout-independent and idempotent") {
    val docs = Sources.table(spark, "/root/testdata/sf0.001", "documents")
    val a = Dedup.segmentDedup(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    val b = Dedup.segmentDedup(docs.repartition(17), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(a == b)
    // a second pass removes nothing: every surviving segment is unique.
    // (Re-segmentation shifts windows where segments were removed, so
    // compare on the corpus rewritten once — the fixpoint property.)
    val spark0 = spark
    import spark0.implicits._
    val once = a.toSeq.toDF("doc_id", "text")
    val twice = Dedup.segmentDedup(once, "doc_id", "text")
    assert(twice.agg(org.apache.spark.sql.functions.sum("n_removed"))
      .head().getLong(0) == 0L)
  }
}
