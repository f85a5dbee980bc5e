package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.Sources

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def emb = Sources.table(spark, "/root/testdata/sf0.001", "embeddings")

  test("brute-force top-1 matches a driver-side exact computation") {
    val vecs = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val probe = 0L
    val expected = vecs.keys.filter(_ != probe)
      .maxBy(id => (cos(vecs(probe), vecs(id)), -id))
    val got = Similarity.bruteForceTopK(emb, Seq(probe), 1)
      .collect().head.getLong(2)
    assert(got == expected)
  }

  test("int8-quantized brute force: high recall, cosine within rounding noise") {
    val probes = (0L until 20L).toSeq
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val exact = pairs(Similarity.bruteForceTopK(emb, probes, 3))
    val quant = Similarity.bruteForceTopKInt8(emb, probes, 3)
    val recall = (exact & pairs(quant)).size.toDouble / exact.size
    assert(recall >= 0.8, s"int8 recall $recall too low")
    // int8 cosine tracks float cosine closely on the shared pairs
    val floatCos = Similarity.bruteForceTopK(emb, probes, 3)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    quant.collect().foreach { r =>
      floatCos.get((r.getLong(0), r.getLong(2))).foreach { cf =>
        assert(math.abs(cf - r.getDouble(3)) < 0.02)
      }
    }
  }

  test("LSH top-3 recall vs brute force ≥ 0.5 on probe set") {
    val probes = (0L until 20L).toSeq
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val exact = pairs(Similarity.bruteForceTopK(emb, probes, 3))
    val approx = pairs(Similarity.lshTopK(emb, probes, 3))
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"LSH recall $recall too low")
    // every probe still gets k results (buckets + multiprobe are dense
    // enough at this corpus size)
    assert(approx.groupBy(_._1).forall(_._2.size == 3))
  }

  test("IVF top-3 recall vs brute force ≥ 0.5 on probe set") {
    val probes = (0L until 20L).toSeq
    val centroids = Similarity.trainCentroids(emb, k = 16)
    assert(centroids.length == 16 && centroids.head.length == 64)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val exact = pairs(Similarity.bruteForceTopK(emb, probes, 3))
    val approx = pairs(Similarity.ivfTopK(emb, probes, 3, centroids, nProbe = 4))
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF recall $recall too low")
  }

  test("PQ+refine top-3: recall >= 0.8, scores plausible, codes in range") {
    val probes = (0L until 20L).toSeq
    val codebook = Similarity.trainPqCodebook(emb, m = 16, kStar = 64)
    assert(codebook.length == 16 && codebook.head.length == 64 &&
      codebook.head.head.length == 4)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val exact = pairs(Similarity.bruteForceTopK(emb, probes, 3))
    val approxDf = Similarity.pqTopK(emb, probes, 3, codebook, rerank = 32)
    val approx = pairs(approxDf)
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"PQ recall $recall too low")
    info(f"PQ recall@3 on sf0.001 = $recall%.3f")
    // refined scores are exact cosines: bounded by 1, and positive for
    // the best pairs (this corpus's probe top-1s sit ~0.3-0.5 by design
    // -- see annAnchor's recall note)
    val maxCos = approxDf.agg(org.apache.spark.sql.functions.max("cos"))
      .head().getDouble(0)
    assert(maxCos <= 1.0 + 1e-9 && maxCos > 0.2,
      s"refined scores out of plausible range: max=$maxCos")
    // codes are dense in [0, kStar)
    val codes = Similarity.pqEncode(emb, codebook)
      .selectExpr("explode(codes) c").distinct()
      .collect().map(_.getInt(0)).toSet
    assert(codes.forall(c => c >= 0 && c < 64))
  }

  test("PQ encoding is deterministic across partition layouts") {
    val codebook = Similarity.trainPqCodebook(emb, m = 16, kStar = 64)
    def fp(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Golden.fingerprint(
        df.selectExpr("vec_id", "cast(codes as string) cs"))
        .head().getString(1)
    val a = fp(Similarity.pqEncode(emb, codebook))
    val b = fp(Similarity.pqEncode(emb.repartition(7), codebook))
    assert(a == b, "PQ codes changed under repartition")
  }

  test("k-means planted clusters: pure cells, deterministic across layouts") {
    val spark0 = spark
    import spark0.implicits._
    // 4 well-separated axis clusters in 8-d, 50 points each, tiny jitter
    val pts = (0 until 200).map { i =>
      val c = i % 4
      val v = Array.fill(8)(0.001f * ((i * 7 + 3) % 11))
      v(c * 2) = 1.0f
      (i.toLong, v.toSeq)
    }
    val df = pts.toDF("vec_id", "embedding")
    val centroids = Similarity.trainCentroids(df, k = 4, iters = 15)
    val assign = Similarity.assignCells(df, centroids)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every planted cluster lands WHOLLY in one cell, 4 distinct cells
    val cells = (0 until 4).map { c =>
      val ids = (0 until 200).filter(_ % 4 == c).map(_.toLong)
      val cellIds = ids.map(assign).distinct
      assert(cellIds.size == 1, s"cluster $c split across cells $cellIds")
      cellIds.head
    }
    assert(cells.distinct.size == 4, s"clusters merged: $cells")
    // assignment is layout-independent (same centroids, shuffled input)
    val re = Similarity.assignCells(df.repartition(13), centroids)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(re == assign)
  }

  test("ANN output shape: (vec_id, rank, neighbor_id, cos), ranks 1..k") {
    val out = Similarity.bruteForceTopK(emb, Seq(1L, 2L), 3)
    assert(out.columns.toSeq == Seq("vec_id", "rank", "neighbor_id", "cos"))
    val ranks = out.collect().groupBy(_.getLong(0)).values
      .map(_.map(_.getLong(1)).sorted.toSeq)
    assert(ranks.forall(_ == Seq(1L, 2L, 3L)))
  }

  test("labelStats: exact moments match driver arithmetic, layout-free") {
    import org.apache.spark.sql.functions._
    val raw = emb.collect()
      .map(r => r.getInt(2) -> r.getSeq[Float](1).toArray)
    val stats = Similarity.labelStats(emb, "embedding", "label")
      .collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // brute-force reference: identical quantization on the driver
    val expected = raw.flatMap { case (lab, v) =>
      v.zipWithIndex.map { case (x, d) =>
        (lab, d.toLong) -> math.round(x.toDouble * 1e6)
      }
    }.groupBy(_._1).map { case (k, qs0) =>
      val qs = qs0.map(_._2)
      k -> ((qs.length.toLong, qs.sum, qs.map(q => q * q).sum))
    }
    assert(stats == expected)
    // variance non-negative in every cell: n·Σq² ≥ (Σq)²
    assert(stats.values.forall { case (n, s, ss) =>
      BigInt(n) * BigInt(ss) >= BigInt(s) * BigInt(s) })
    // layout-independent (bit-exact, not approximately)
    val re = Similarity.labelStats(
        Sources.table(spark, "/root/testdata/sf0.001", "embeddings")
          .repartition(17), "embedding", "label")
      .collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(re == stats)
  }

  test("labelOutliers: planted far vector counted, uniform label clean") {
    val spark0 = spark
    import spark0.implicits._
    // label 0: 20 vectors in a tight ball + ONE far point (the outlier);
    // label 1: 10 identical vectors — every deviation equals the mean,
    // so nothing can exceed 4x the mean and the census must be 0
    val tight = (0 until 20).map(i =>
      (i.toLong, Seq.tabulate(4)(d => (0.01f * ((i + d) % 3))), 0))
    val far = Seq((99L, Seq(5.0f, -5.0f, 5.0f, -5.0f), 0))
    val same = (100 until 110).map(i =>
      (i.toLong, Seq(1.0f, 2.0f, 3.0f, 4.0f), 1))
    val df = (tight ++ far ++ same).toDF("vec_id", "embedding", "label")
    val got = Similarity.labelOutliers(df, "embedding", "label")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got == Map(0L -> (21L, 1L), 1L -> (10L, 0L)))
    // layout-independent
    val again = Similarity
      .labelOutliers(df.repartition(7), "embedding", "label")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got == again)
  }
}
