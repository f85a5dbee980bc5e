package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.ext.Similarity

/** Positive controls for the violation anchors: CatalogSpec already
  * asserts every anchor is EMPTY on healthy operators; these tests prove
  * the anchors are not vacuously empty — each invariant family emits rows
  * when fed a deliberately broken result. */
class AnchorQueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def emb = graft.sources.Sources.table(spark, sfDir, "embeddings")

  test("annAnchor flags self-neighbors and duplicates (structure)") {
    val broken = Similarity.lshTopK(emb, (0L until 10L).toSeq, 3)
      .withColumn("neighbor_id", col("vec_id")) // every row a self-loop + dup
    val v = AnchorQueries.annAnchor(emb, broken, k = 3,
      minTotalHits = 0L, gapBound = 1.0)
    assert(v.filter(col("reason") === "structure").count() > 0)
  }

  test("annAnchor flags an unreachable recall floor (recall_total)") {
    val ok = Similarity.lshTopK(emb, (0L until 10L).toSeq, 3)
    val v = AnchorQueries.annAnchor(emb, ok, k = 3,
      minTotalHits = Long.MaxValue, gapBound = 1.0)
    assert(v.filter(col("reason") === "recall_total").count() == 1)
  }

  test("annAnchor flags far-from-exact neighbors (quality_gap)") {
    // replace every neighbor's cosine with a terrible score: the gap
    // check compares the REPORTED cos against the exact kth-best
    val broken = Similarity.lshTopK(emb, (0L until 10L).toSeq, 3)
      .withColumn("cos", lit(-1.0))
    val v = AnchorQueries.annAnchor(emb, broken, k = 3,
      minTotalHits = 0L, gapBound = 0.15)
    assert(v.filter(col("reason") === "quality_gap").count() > 0)
  }

  test("kmeansViolations flags out-of-range cell ids (unmatched_cell)") {
    val centroids = Similarity.trainCentroids(emb, k = 4, maxSample = 20000)
    // Regression control for the silent-drop bug: a kernel emitting
    // 1-based ids pushes the last cell out of range — the anchor must
    // report those rows, not drop them in the join.
    val broken = Similarity.assignCells(emb, centroids)
      .withColumn("cluster_id", col("cluster_id") + lit(1L))
    val v = AnchorQueries.kmeansViolations(emb, centroids, broken)
    assert(v.filter(col("reason") === "unmatched_cell").count() > 0)
  }

  test("tfidfCappedViolations: healthy cap empty, planted-term-dropping cap flags") {
    val docs = graft.sources.Sources.table(spark, sfDir, "documents")
    // maxDf = 20 keeps the planted df-2 pair terms → no violations
    assert(AnchorQueries.tfidfCappedViolations(docs, maxDf = 20).count() == 0)
    // maxDf = 1 drops even the planted terms: every probe loses its capped
    // top-1 and must surface as a null-capped violation, proving the
    // anchor's left join can't pass vacuously on empty capped postings
    val v = AnchorQueries.tfidfCappedViolations(docs, maxDf = 1)
    assert(v.filter(col("capped_neighbor").isNull).count() == 10)
  }

  test("anchor queries carry expectEmpty and a 0-row oracle") {
    AnchorQueries.all.foreach { q =>
      assert(q.expectEmpty, s"${q.name} must be marked expectEmpty")
      val sql = q.oracle.getOrElse(fail(s"${q.name} has no oracle"))
      assert(sql.contains("WHERE 1 = 0"), s"${q.name} oracle is not 0-row")
    }
  }
}
