package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class DecontaminateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // benchmark probes + a corpus with planted overlaps:
  //  - doc 1 embeds probe A's text verbatim (shares its 8-grams)
  //  - doc 2 is clean prose
  //  - doc 3 shares an 8-token window with probe B
  //  - doc 4 is a short text identical to short probe C (whole-text gram)
  //  - doc 5 is a short text that differs from C
  private def fixtures = {
    val spark0 = spark
    import spark0.implicits._
    val probeA = "the quick brown fox jumps over the lazy dog tonight"
    val probeB = "colorless green ideas sleep furiously under a pale moon forever"
    val probeC = "short probe"
    val probes = Seq((100L, probeA), (101L, probeB), (102L, probeC))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, s"prefix words here $probeA and suffix words"),
      (2L, "completely unrelated text about spark catalyst optimizer rules " +
        "and tungsten memory management internals for analytics"),
      (3L, "intro colorless green ideas sleep furiously under a pale moon " +
        "outro words"),
      (4L, "short probe"),
      (5L, "short other")
    ).toDF("doc_id", "text")
    (corpus, probes)
  }

  test("exact: removes overlapping + whole-short-text matches, keeps clean docs") {
    val (corpus, probes) = fixtures
    val surv = Decontaminate.exact(corpus, probes, "doc_id", "text", n = 8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(surv == Set(2L, 5L),
      s"expected only clean docs to survive, got $surv")
  }

  test("bloom: no false negatives (superset of exact removals)") {
    val (corpus, probes) = fixtures
    val exactSurv = Decontaminate.exact(corpus, probes, "doc_id", "text", n = 8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val bloomSurv = Decontaminate.bloom(corpus, probes, "doc_id", "text",
        n = 8, expectedGrams = 10000L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // everything exact removed must also be bloom-removed (no false negs)
    assert(bloomSurv.subsetOf(exactSurv), s"bloom kept a contaminated doc: " +
      s"bloom=$bloomSurv exact=$exactSurv")
    // at fpp 0.001 over a handful of grams, over-removal should be nil here
    assert(bloomSurv == exactSurv)
  }

  test("bloom on the testdata corpus stays close to exact (fp rate bound)") {
    val docs = graft.sources.Sources.table(
      spark, "/root/testdata/sf0.001", "documents")
    val probes = docs.filter("doc_id % 50 = 0")
    val nExact = Decontaminate.exact(docs, probes, "doc_id", "text", 8).count()
    val bloomSurv = Decontaminate.bloom(docs, probes, "doc_id", "text", 8,
      expectedGrams = 100000L, fpp = 0.001)
    val nBloom = bloomSurv.count()
    assert(nBloom <= nExact, "bloom can only over-remove")
    // expected extra removals ≈ docs × P(any of ~60 grams FPs) ≈ 500×0.06;
    // allow 10× headroom
    assert(nExact - nBloom <= 30, s"fp over-removal too high: $nExact vs $nBloom")
    // and the probe docs themselves never survive either path
    val survIds = bloomSurv.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!survIds.exists(_ % 50 == 0))
  }

  // semantic fixtures: a probe direction p, corpus vectors at known
  // cosines to it — c1 ≈ p (0.999…), c3 lightly perturbed (≈0.95),
  // c2 orthogonal, c4 anti-parallel
  private def semanticFixtures = {
    val spark0 = spark
    import spark0.implicits._
    val dim = 16
    def unit(xs: Array[Float]): Array[Float] = {
      val n = math.sqrt(xs.map(x => x * x.toDouble).sum).toFloat
      xs.map(_ / n)
    }
    val p = unit(Array.tabulate(dim)(i => if (i == 0) 1f else 0.01f * i))
    val near = unit(p.zipWithIndex.map { case (x, i) =>
      x + (if (i == 1) 0.01f else 0f) })
    val perturbed = unit(p.zipWithIndex.map { case (x, i) =>
      x + (if (i % 3 == 0) 0.18f else -0.05f) })
    val ortho = unit(Array.tabulate(dim)(i => if (i == dim - 1) 1f else 0f))
    val anti = p.map(-_)
    val probes = Seq((100L, p)).toDF("vec_id", "embedding")
    val corpus = Seq((1L, near), (2L, ortho), (3L, perturbed), (4L, anti))
      .toDF("vec_id", "embedding")
    (corpus, probes)
  }

  test("semanticExact: near/perturbed removed, orthogonal/anti kept") {
    val (corpus, probes) = semanticFixtures
    val surv = Decontaminate.semanticExact(corpus, probes,
        "vec_id", "embedding", threshold = 0.9)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(surv == Set(2L, 4L), s"expected clean vectors to survive: $surv")
  }

  test("semanticLsh: sound (subset of exact removals) and catches near-dups") {
    val (corpus, probes) = semanticFixtures
    val exactSurv = Decontaminate.semanticExact(corpus, probes,
        "vec_id", "embedding", threshold = 0.9)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val lshSurv = Decontaminate.semanticLsh(corpus, probes,
        "vec_id", "embedding", threshold = 0.9)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    // soundness: lsh removes only what exact removes ⟺ keeps a superset
    assert(exactSurv.subsetOf(lshSurv),
      s"lsh dropped an exact-kept vector: lsh=$lshSurv exact=$exactSurv")
    // recall at cos≈1: the verbatim near-copy cannot be missed (all
    // hyperplane signs agree); the 0.95 perturbation is overwhelmingly
    // likely across 8 tables — assert both, pinning the defaults
    assert(!lshSurv.contains(1L), "lsh missed the verbatim near-copy")
    assert(!lshSurv.contains(3L), "lsh missed the 0.95 near-dup")
  }
}
