package graft.ext

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.Sources

/** The persisted IVF index must serve the SAME results as the in-memory
  * IVF path, and its scan must actually prune: the probes' nProbe cells
  * become a static PartitionFilters predicate, so only those cells'
  * files are read — the property that makes a 100 TB vector corpus
  * servable per query. */
class IvfIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def emb = Sources.table(spark, "/root/testdata/sf0.001", "embeddings")

  private lazy val centroids = Similarity.trainCentroids(emb, k = 8)
  private lazy val indexDir = {
    val dir = Files.createTempDirectory("graft-ivf-index").toString
    Similarity.writeIvfIndex(emb, centroids, dir)
    dir
  }

  test("index-served top-k identical to in-memory IVF") {
    val probes = (0L until 10L).toSeq
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val direct = rows(Similarity.ivfTopK(emb, probes, 3, centroids))
    val served = rows(Similarity.ivfTopKFromIndex(indexDir,
      emb.filter(org.apache.spark.sql.functions.col("vec_id") < 10), 3,
      centroids))
    assert(served == direct,
      s"served ${served.size} vs direct ${direct.size}; " +
        s"diff=${(direct diff served).take(3)}")
  }

  test("index scan carries a static cell PartitionFilter (pruned read)") {
    val probeFrame = emb.filter(
      org.apache.spark.sql.functions.col("vec_id") < 3)
    val plan = Similarity.ivfTopKFromIndex(indexDir, probeFrame, 3,
        centroids, nProbe = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cell"),
      s"expected a static cell partition filter in:\n$plan")
    // and the filter is selective: nProbe=2 over 3 probes <= 6 cells of 8
    val scanned = Similarity.ivfTopKFromIndex(indexDir, probeFrame, 3,
        centroids, nProbe = 1)
      .queryExecution.executedPlan.toString
    assert(scanned.contains("PartitionFilters: [cell"),
      "nProbe=1 scan lost its partition filter")
  }

  test("unbounded probe frames are rejected before any driver collect") {
    // ivfTopKFromIndex broadcasts the probes and collects their cells —
    // an unbounded probe frame must fail loudly at the gate, not scale
    // the driver collect silently.
    val ex = intercept[IllegalArgumentException](
      Similarity.ivfTopKFromIndex(indexDir, emb, 3, centroids,
        maxProbes = 10))
    assert(ex.getMessage.contains("maxProbes"))
    // at exactly the bound it serves
    val atBound = Similarity.ivfTopKFromIndex(indexDir,
      emb.filter(org.apache.spark.sql.functions.col("vec_id") < 10), 3,
      centroids, maxProbes = 10)
    assert(atBound.collect().nonEmpty)
  }

  test("probe pipeline is evaluated exactly once per call (guard rides " +
       "the checkpoint, not a second pass)") {
    // An expensive upstream probe pipeline must not pay twice: the bound
    // check counts the eagerly-checkpointed limit slice, and the query
    // reuses that snapshot. Instrument with an accumulator inside a
    // single-partition source so one full evaluation is exactly nRows.
    import org.apache.spark.sql.functions._
    val sc = spark.sparkContext
    val evals = sc.longAccumulator("probe-evals")
    val src = emb.filter(col("vec_id") < 5)
      .select(col("vec_id"), col("embedding"))
      .repartition(1)
      .collect() // fixed seed rows, then rebuild as an instrumented RDD
    val rdd = sc.parallelize(src.toSeq, 1).map { r =>
      evals.add(1L)
      (r.getLong(0), r.getSeq[Float](1).toArray)
    }
    val probeFrame = {
      val spark0 = spark
      import spark0.implicits._
      rdd.toDF("vec_id", "embedding")
    }
    val out = Similarity.ivfTopKFromIndex(indexDir, probeFrame, 3,
      centroids, maxProbes = 16)
    out.collect()
    assert(evals.value == src.length.toLong,
      s"probe source evaluated ${evals.value} row-passes for " +
        s"${src.length} rows — the guard re-ran the probe pipeline")
  }

  test("append maintains the index: new batch's vectors become servable") {
    val dir = Files.createTempDirectory("graft-ivf-append").toString
    val old = emb.filter(
      org.apache.spark.sql.functions.col("vec_id") >= 10)
    val batch = emb.filter(
      org.apache.spark.sql.functions.col("vec_id") < 10)
    Similarity.writeIvfIndex(old, centroids, dir)
    // append the new batch — existing partitions' files are untouched
    import org.apache.spark.sql.functions._
    batch.select(col("vec_id"), col("embedding"),
        element_at(graft.functions.TextExprs.nearest_cells(
          col("embedding"), centroids, 1), 1).as("cell"))
      .write.mode("append").partitionBy("cell").parquet(dir)
    val probes = emb.filter(col("vec_id") < 3)
    val served = Similarity.ivfTopKFromIndex(dir, probes, 3, centroids)
      .collect()
    assert(served.nonEmpty)
    // full-corpus parity: the rebuilt-from-two-writes index serves the
    // same rows as a single-shot index over everything
    val full = Files.createTempDirectory("graft-ivf-full").toString
    Similarity.writeIvfIndex(emb, centroids, full)
    val fullServed = Similarity.ivfTopKFromIndex(full, probes, 3, centroids)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(served.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet == fullServed)
  }
}
