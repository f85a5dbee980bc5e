package graft.ext

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM tests of the hashing/sketching core (no Spark session). */
class TextHashingSpec extends AnyFunSuite {
  private def u(s: String) = UTF8String.fromString(s)

  private val docA = "the quick brown fox jumps over the lazy dog again and again"
  private val docB = "the quick brown fox jumps over the lazy cat again and again"
  private val docC = "completely different words with nothing shared at all here"

  test("hashing is deterministic and text-sensitive") {
    assert(TextHashing.hashString("abc") == TextHashing.hashString("abc"))
    assert(TextHashing.hashString("abc") != TextHashing.hashString("abd"))
    assert(TextHashing.simhash64(u(docA)) == TextHashing.simhash64(u(docA)))
  }

  test("minhash signature estimates Jaccard") {
    val k = 256
    val sa = TextHashing.minhashSignature(u(docA), k, 3)
    val sb = TextHashing.minhashSignature(u(docB), k, 3)
    val sc = TextHashing.minhashSignature(u(docC), k, 3)
    val estAB = sa.zip(sb).count { case (x, y) => x == y }.toDouble / k
    val estAC = sa.zip(sc).count { case (x, y) => x == y }.toDouble / k
    val exactAB = TextHashing.ngramJaccard(u(docA), u(docB), 3)
    assert(math.abs(estAB - exactAB) < 0.15, s"est $estAB vs exact $exactAB")
    assert(estAC < 0.05)
  }

  test("simhash hamming distance tracks similarity") {
    val hAB = TextHashing.hamming64(
      TextHashing.simhash64(u(docA)), TextHashing.simhash64(u(docB)))
    val hAC = TextHashing.hamming64(
      TextHashing.simhash64(u(docA)), TextHashing.simhash64(u(docC)))
    assert(hAB < hAC)
    assert(hAC > 10)
  }

  test("ngram jaccard edge cases") {
    assert(TextHashing.ngramJaccard(u(""), u(""), 3) == 1.0)
    assert(TextHashing.ngramJaccard(u("a b c"), u(""), 3) == 0.0)
    assert(TextHashing.ngramJaccard(u(docA), u(docA), 3) == 1.0)
  }

  test("sorted-shingle jaccard equals direct ngram jaccard") {
    for ((a, b) <- Seq((docA, docB), (docA, docC), (docA, docA), ("", docA))) {
      val direct = TextHashing.ngramJaccard(u(a), u(b), 3)
      val viaArrays = TextHashing.sortedArrayJaccard(
        TextHashing.sortedShingleHashes(u(a), 3),
        TextHashing.sortedShingleHashes(u(b), 3))
      assert(math.abs(direct - viaArrays) < 1e-12, s"($a, $b)")
    }
  }

  test("winnowing: local edit preserves most fingerprints") {
    val fa = TextHashing.winnowFingerprints(u(docA), 9, 12).toLongArray().toSet
    val fb = TextHashing.winnowFingerprints(u(docB), 9, 12).toLongArray().toSet
    assert(fa.nonEmpty)
    val overlap = (fa & fb).size.toDouble / math.max(fa.size, fb.size)
    assert(overlap > 0.5, s"winnow overlap $overlap")
    // shorter than k → empty signature, no crash
    assert(TextHashing.winnowFingerprints(u("tiny"), 9, 12).numElements() == 0)
  }

  test("cosine: orthogonal/parallel/zero vectors") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    def arr(fs: Float*) = new GenericArrayData(fs.toArray)
    assert(math.abs(TextHashing.cosineFloat(arr(1f, 0f), arr(0f, 1f))) < 1e-12)
    assert(math.abs(TextHashing.cosineFloat(arr(1f, 2f), arr(2f, 4f)) - 1.0) < 1e-12)
    assert(TextHashing.cosineFloat(arr(0f, 0f), arr(1f, 1f)) == 0.0)
  }

  test("hyperplane bucket: deterministic, in range, similar vecs collide") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val v1 = new GenericArrayData(Array.fill(8)(0.5f))
    val v2 = new GenericArrayData(Array.fill(8)(0.51f))
    val b1 = TextHashing.hyperplaneBucket(v1, 12, 42L)
    assert(b1 == TextHashing.hyperplaneBucket(v1, 12, 42L))
    assert(b1 >= 0 && b1 < (1 << 12))
    assert(b1 == TextHashing.hyperplaneBucket(v2, 12, 42L))
  }

  test("repetitionStats matches a string-based brute force on random docs") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "bb", "ccc", "dd", "e", "ffff", "gg", "hij")
    for (_ <- 1 to 200) {
      val nTok = rnd.nextInt(12) // includes 0 and < n edge cases
      val toks = Vector.fill(nTok)(vocab(rnd.nextInt(vocab.length)))
      val text = toks.mkString(" ")
      val st = TextHashing.repetitionStats(u(text))
      for (n <- 1 to 3) {
        val grams = toks.sliding(n).filter(_.length == n).map(_.mkString(" ")).toVector
        assert(st.getLong(2 * (n - 1)) == grams.length,
          s"total $n-grams of '$text'")
        assert(st.getLong(2 * (n - 1) + 1) == grams.distinct.length,
          s"distinct $n-grams of '$text'")
      }
    }
  }
}
