package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def words(pairs: (String, Long)*) = {
    val spark0 = spark
    import spark0.implicits._
    pairs.toSeq.toDF("word", "n")
  }

  test("learnMerges: the classic low/lower/newest/widest corpus") {
    // Sennrich-style example. Weighted vocab:
    //   low:5  lower:2  newest:6  widest:3
    // round 1: pair counts — (e,s):9 (w,e):8* (s,t):9 (l,o):7 (o,w):7 ...
    //   (e,s) 9 from newest+widest; (s,t) 9; tiebreak (cnt desc, a, b):
    //   e < s so (e,s) wins round 1 → "es"
    // round 2: (es,t) 9 vs (l,o) 7 ... → "est"
    // round 3: (l,o) 7 wins (vs (o,w) 7 — l < o) → "lo"
    val vocab = words("low" -> 5L, "lower" -> 2L, "newest" -> 6L,
      "widest" -> 3L)
    val (merges, syms) = Bpe.learnMerges(vocab, 3)
    assert(merges == Seq(("e", "s"), ("es", "t"), ("l", "o")))
    val out = syms.collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(out("low") == List("lo", "w"))
    assert(out("lower") == List("lo", "w", "e", "r"))
    assert(out("newest") == List("n", "e", "w", "est"))
    assert(out("widest") == List("w", "i", "d", "est"))
  }

  test("mergeStep semantics: non-overlapping left-to-right (a,a) on aaa") {
    val vocab = words("aaa" -> 10L)
    val (merges, syms) = Bpe.learnMerges(vocab, 1)
    assert(merges == Seq(("a", "a")))
    assert(syms.collect().head.getSeq[String](1).toList == List("aa", "a"))
  }

  test("learnMerges stops early below minCount") {
    val vocab = words("ab" -> 1L, "cd" -> 1L)
    val (merges, _) = Bpe.learnMerges(vocab, 5, minCount = 2)
    assert(merges.isEmpty)
  }

  test("property: random corpora — pieces always concat back to the word") {
    import org.scalacheck.{Gen, rng}
    def sample[A](g: Gen[A], seed: Long): A =
      g.pureApply(Gen.Parameters.default, rng.Seed(seed))
    // tiny alphabet forces heavy pair collisions → deep merge chains
    val wordGen = Gen.listOfN(8, Gen.oneOf('a', 'b', 'c')).map(_.mkString)
    val corpusGen = Gen.listOfN(30, Gen.zip(wordGen, Gen.choose(1L, 9L)))
    for (seed <- 1L to 3L) {
      val corpus = sample(corpusGen, seed)
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      val vocab = words(corpus: _*)
      val (merges, syms) = Bpe.learnMerges(vocab, 10)
      val out = syms.collect()
        .map(r => (r.getString(0), r.getSeq[String](1).toList))
      // lossless at every merge depth: pieces concat to the word, no
      // empty pieces, counts conserved
      out.foreach { case (word, pieces) =>
        assert(pieces.mkString == word, s"seed $seed: $pieces != $word")
        assert(pieces.forall(_.nonEmpty))
      }
      // merges are distinct pairs (no pair learned twice)
      assert(merges.distinct.length == merges.length, s"seed $seed: $merges")
    }
  }

  test("learnMerges runs a bounded number of Spark jobs per round") {
    // The merge loop's scale contract: each round costs ONE driver-visible
    // action (the argmax collect) — the per-round checkpoint is lazy and
    // materializes inside that same action. AQE may split one action into
    // a couple of scheduler jobs (per exchange stage), so pin jobs-per-
    // round ≤ 3; the eager-checkpoint form costed an extra full
    // materialization job per round on top.
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        counter.incrementAndGet()
    }
    val vocab = words("low" -> 5L, "lower" -> 2L, "newest" -> 6L,
      "widest" -> 3L)
    val k = 3
    spark.sparkContext.addSparkListener(listener)
    try {
      val (merges, _) = Bpe.learnMerges(vocab, k)
      assert(merges.length == k)
      // listener delivery is async — poll until the count is stable
      var last = -1
      var stable = 0
      var waited = 0
      while (stable < 3 && waited < 5000) {
        Thread.sleep(100); waited += 100
        val c = counter.get()
        if (c == last) stable += 1 else { stable = 0; last = c }
      }
      val jobs = counter.get()
      assert(jobs <= 3 * k,
        s"learnMerges($k) ran $jobs jobs — expected ≤ ${3 * k} (≤3/round)")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("applyMerges tokenizes with learned order; piece counts conserve") {
    val spark0 = spark
    import spark0.implicits._
    val vocab = words("low" -> 5L, "lower" -> 2L, "newest" -> 6L,
      "widest" -> 3L)
    val (merges, _) = Bpe.learnMerges(vocab, 3)
    val docs = Seq((1L, "low lower"), (2L, "newest")).toDF("doc_id", "text")
    val out = Bpe.applyMerges(docs, "doc_id", "text", merges)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getSeq[String](3).toList, r.getLong(4)))
    val d1 = out.filter(_._1 == 1L).sortBy(_._2)
    assert(d1.map(_._4).toList == List(List("lo", "w"), List("lo", "w", "e", "r")))
    assert(out.forall(r => r._4.map(_.length).sum == r._3.length))
    assert(out.forall(r => r._5 == r._4.length))
  }
}
