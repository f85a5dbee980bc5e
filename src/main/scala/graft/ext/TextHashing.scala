package graft.ext

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Pure-JVM hashing/sketching core for the dedup + fingerprint operators.
  * Static, allocation-light, deterministic — called from Catalyst expression
  * codegen (graft.functions.TextExprs), so every method here is a single
  * static call from generated Java.
  *
  * Hash construction: FNV-1a 64 over UTF-8 bytes with a splitmix64 finalizer
  * (public-domain constructions); the k minhash permutations are
  * splitmix64(base ^ seed_i) — standard "one strong hash + k cheap mixes"
  * minhash (Broder '97 shape).
  */
object TextHashing {

  final val GOLDEN: Long = 0x9e3779b97f4a7c15L

  /** splitmix64 finalizer — full-avalanche 64-bit mix. */
  @inline def mix64(z0: Long): Long = {
    var z = z0 + GOLDEN
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** FNV-1a 64 over a byte range + avalanche. */
  def hashBytes(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < until) { h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    mix64(h)
  }

  def hashString(s: String): Long = {
    val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    hashBytes(b, 0, b.length)
  }

  /** Whitespace tokenization directly over UTF-8 bytes (ASCII ws only —
    * matches split(text, ' ') semantics for the corpus; multi-byte chars pass
    * through untouched). Returns (start, end) offsets to avoid per-token
    * String allocation. */
  private def tokenOffsets(bytes: Array[Byte]): Array[Int] = {
    val offs = new java.util.ArrayList[Integer](64)
    var i = 0
    val n = bytes.length
    while (i < n) {
      while (i < n && bytes(i) == ' ') i += 1
      if (i < n) {
        val start = i
        while (i < n && bytes(i) != ' ') i += 1
        offs.add(start); offs.add(i)
      }
    }
    val out = new Array[Int](offs.size())
    var j = 0
    while (j < out.length) { out(j) = offs.get(j); j += 1 }
    out
  }

  /** Hashes of word n-gram shingles (rolling over token hashes — the
    * document's set signature for Jaccard/minhash). */
  def shingleHashes(text: UTF8String, n: Int): Array[Long] = {
    val bytes = text.getBytes
    val offs = tokenOffsets(bytes)
    val nTok = offs.length / 2
    if (nTok == 0) return Array.empty
    val tokHash = new Array[Long](nTok)
    var i = 0
    while (i < nTok) {
      tokHash(i) = hashBytes(bytes, offs(2 * i), offs(2 * i + 1)); i += 1
    }
    val nSh = math.max(1, nTok - n + 1)
    val out = new Array[Long](nSh)
    var s = 0
    while (s < nSh) {
      var h = 0x27d4eb2f165667c5L
      var j = 0
      while (j < math.min(n, nTok)) { h = mix64(h ^ tokHash(s + j)); j += 1 }
      out(s) = h
      s += 1
    }
    out
  }

  /** k-value minhash signature over word-n-gram shingles. */
  def minhashSignature(text: UTF8String, k: Int, shingleN: Int): Array[Long] = {
    val shingles = shingleHashes(text, shingleN)
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var si = 0
    while (si < shingles.length) {
      val s = shingles(si)
      var i = 0
      while (i < k) {
        val h = mix64(s ^ (i * GOLDEN))
        if (h < sig(i)) sig(i) = h
        i += 1
      }
      si += 1
    }
    sig
  }

  def minhashArrayData(text: UTF8String, k: Int, shingleN: Int): ArrayData =
    new GenericArrayData(minhashSignature(text, k, shingleN))

  /** Band hashes for LSH bucketing: the signature split into `bands` equal
    * slices, one hash per slice. Docs sharing any band hash are candidates. */
  def bandHashes(sig: ArrayData, bands: Int): ArrayData = {
    val k = sig.numElements()
    val rows = k / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 0x2545f4914f6cdd1dL ^ b
      var j = 0
      while (j < rows) { h = mix64(h ^ sig.getLong(b * rows + j)); j += 1 }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }

  /** 64-bit SimHash over whitespace tokens (Charikar '02): per-bit vote of
    * token hashes, sign → bit. */
  def simhash64(text: UTF8String): Long = {
    val bytes = text.getBytes
    val offs = tokenOffsets(bytes)
    val votes = new Array[Int](64)
    var i = 0
    while (i < offs.length / 2) {
      val h = hashBytes(bytes, offs(2 * i), offs(2 * i + 1))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** Exact word-n-gram Jaccard similarity — the verify step behind MinHash
    * candidates (and a standalone near-dup measure). */
  def ngramJaccard(a: UTF8String, b: UTF8String, n: Int): Double = {
    val sa = shingleHashes(a, n)
    val sb = shingleHashes(b, n)
    if (sa.isEmpty && sb.isEmpty) return 1.0
    if (sa.isEmpty || sb.isEmpty) return 0.0
    val setA = new java.util.HashSet[java.lang.Long](sa.length * 2)
    sa.foreach(setA.add(_))
    val setB = new java.util.HashSet[java.lang.Long](sb.length * 2)
    sb.foreach(setB.add(_))
    var inter = 0
    val it = setA.iterator()
    while (it.hasNext) if (setB.contains(it.next())) inter += 1
    val union = setA.size() + setB.size() - inter
    if (union == 0) 1.0 else inter.toDouble / union
  }

  /** ALL word-n-gram hashes in document order — the MULTISET form
    * (duplicates kept), with ZERO grams for documents shorter than n tokens
    * (positions 1..nTok-n+1; contrast [[shingleHashes]]' max(1, …) floor
    * used by the set-signature family). The exact-substring dup-span unit:
    * exploding these 8-byte longs replaces exploding string grams, so the
    * Generate output and the gram shuffle carry a long per position instead
    * of a k-token string (two distinct grams alias only on a 64-bit
    * collision — ~n²/2⁶⁵ for n distinct grams, negligible vs the count
    * semantics it feeds). */
  def gramHashArray(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.getBytes
    val offs = tokenOffsets(bytes)
    val nTok = offs.length / 2
    if (nTok < n) return new GenericArrayData(Array.empty[Long])
    val tokHash = new Array[Long](nTok)
    var i = 0
    while (i < nTok) {
      tokHash(i) = hashBytes(bytes, offs(2 * i), offs(2 * i + 1)); i += 1
    }
    val out = new Array[Long](nTok - n + 1)
    var s = 0
    while (s < out.length) {
      var h = 0x27d4eb2f165667c5L
      var j = 0
      while (j < n) { h = mix64(h ^ tokHash(s + j)); j += 1 }
      out(s) = h
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Distinct shingle hashes, sorted — precompute once per document so
    * pairwise Jaccard is a sort-merge over longs (no re-shingling, no
    * per-pair hash-set allocation). */
  def sortedShingleHashes(text: UTF8String, n: Int): ArrayData = {
    val sh = shingleHashes(text, n)
    if (sh.isEmpty) return new GenericArrayData(Array.empty[Long])
    java.util.Arrays.sort(sh)
    var uniq = 1
    var i = 1
    while (i < sh.length) { if (sh(i) != sh(i - 1)) uniq += 1; i += 1 }
    val out = new Array[Long](uniq)
    out(0) = sh(0)
    var j = 1; i = 1
    while (i < sh.length) {
      if (sh(i) != sh(i - 1)) { out(j) = sh(i); j += 1 }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Jaccard of two sorted distinct long arrays by sort-merge. */
  def sortedArrayJaccard(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements(); val nb = b.numElements()
    if (na == 0 && nb == 0) return 1.0
    if (na == 0 || nb == 0) return 0.0
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter.toDouble / (na + nb - inter)
  }

  /** One-pass repetition stats over word n-grams (n = 1, 2, 3):
    * [total_1, distinct_1, total_2, distinct_2, total_3, distinct_3].
    * Totals are exact; distinct counts are over 64-bit gram hashes (the
    * same rolling-mix construction as shingleHashes, WITHOUT its <n-token
    * whole-text fallback — here fewer than n tokens means zero n-grams).
    * Per-document collision odds ~m²/2⁶⁵ — immaterial for quality signals.
    * Replaces a 1/2/3-gram string-array build (3× the text in short-lived
    * allocations per row) with long arithmetic over one token-hash array. */
  def repetitionStats(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    val offs = tokenOffsets(bytes)
    val nTok = offs.length / 2
    val tokHash = new Array[Long](nTok)
    var i = 0
    while (i < nTok) {
      tokHash(i) = hashBytes(bytes, offs(2 * i), offs(2 * i + 1)); i += 1
    }
    val out = new Array[Long](6)
    var n = 1
    while (n <= 3) {
      val total = math.max(0, nTok - n + 1)
      val set = new java.util.HashSet[java.lang.Long](math.max(16, total * 2))
      var s = 0
      while (s < total) {
        var h = 0x27d4eb2f165667c5L
        var j = 0
        while (j < n) { h = mix64(h ^ tokHash(s + j)); j += 1 }
        set.add(h)
        s += 1
      }
      out(2 * (n - 1)) = total
      out(2 * (n - 1) + 1) = set.size()
      n += 1
    }
    new GenericArrayData(out)
  }

  /** Winnowing document fingerprint (Schleimer/Wilkerson/Aiken '03): rolling
    * char k-gram hashes, minimum per window of w, distinct mins sorted —
    * robust to local edits, used for overlap detection. */
  def winnowFingerprints(text: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    if (n < k) return new GenericArrayData(Array.empty[Long])
    val grams = new Array[Long](n - k + 1)
    var i = 0
    while (i + k <= n) { grams(i) = hashBytes(bytes, i, i + k); i += 1 }
    val sel = new java.util.TreeSet[java.lang.Long]()
    val nWin = math.max(1, grams.length - w + 1)
    var s = 0
    while (s < nWin) {
      var m = Long.MaxValue
      var j = 0
      while (j < math.min(w, grams.length - s)) {
        if (grams(s + j) < m) m = grams(s + j); j += 1
      }
      sel.add(m)
      s += 1
    }
    val out = new Array[Long](sel.size())
    val it = sel.iterator()
    var idx = 0
    while (it.hasNext) { out(idx) = it.next(); idx += 1 }
    new GenericArrayData(out)
  }

  // ------------------------------------------------------------- vectors --

  /** Cosine similarity between two float-array embeddings, accumulated in
    * double (same formula as DuckDB's list_cosine_similarity). */
  /** L2-normalize a float vector (unit length; zero vectors pass through
    * unchanged). One pass for the norm, one for the scale — kept as a JVM
    * kernel so the expression stays in whole-stage codegen and avoids the
    * lambda-re-evaluation trap of expressing this with transform(). */
  def l2NormalizeFloat(v: ArrayData): ArrayData = {
    val n = v.numElements()
    var ss = 0.0
    var i = 0
    while (i < n) { val x = v.getFloat(i).toDouble; ss += x * x; i += 1 }
    val out = new Array[Float](n)
    if (ss == 0.0) {
      i = 0
      while (i < n) { out(i) = v.getFloat(i); i += 1 }
    } else {
      val inv = 1.0 / math.sqrt(ss)
      i = 0
      while (i < n) { out(i) = (v.getFloat(i) * inv).toFloat; i += 1 }
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  /** Symmetric linear int8 quantization: clamp(round(x / scale), -127, 127)
    * with scale = maxAbs/127 — the standard embedding compression (4× less
    * storage/shuffle). Returns bytes; dequantize ≈ value * scale. */
  def quantizeInt8(v: ArrayData): ArrayData = {
    val n = v.numElements()
    var maxAbs = 0.0f
    var i = 0
    while (i < n) {
      val a = math.abs(v.getFloat(i)); if (a > maxAbs) maxAbs = a; i += 1
    }
    val out = new Array[Byte](n)
    if (maxAbs > 0.0f) {
      val scale = 127.0 / maxAbs
      i = 0
      while (i < n) {
        val q = math.round(v.getFloat(i) * scale)
        out(i) = math.max(-127L, math.min(127L, q)).toByte
        i += 1
      }
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  /** The per-vector scale quantizeInt8 used (for dequantization). */
  def quantizeScale(v: ArrayData): Float = {
    val n = v.numElements()
    var maxAbs = 0.0f
    var i = 0
    while (i < n) {
      val a = math.abs(v.getFloat(i)); if (a > maxAbs) maxAbs = a; i += 1
    }
    if (maxAbs == 0.0f) 0.0f else maxAbs / 127.0f
  }

  /** Cosine over int8-quantized vectors. Symmetric linear quantization
    * preserves direction up to rounding, and cosine is scale-invariant, so
    * the per-vector scales cancel — compare quantized codes directly
    * (integer multiply-adds; ~4× less memory traffic than floats). */
  def cosineInt8(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var dot = 0L; var na = 0L; var nb = 0L
    var i = 0
    while (i < n) {
      val x = a.getByte(i).toLong
      val y = b.getByte(i).toLong
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na.toDouble) * math.sqrt(nb.toDouble)
    if (denom == 0.0) 0.0 else dot / denom
  }

  def cosineFloat(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  /** Random-hyperplane LSH bucket (Charikar '02 SRP): sign bits of dot
    * products with `nPlanes` pseudo-random unit-free planes derived from
    * `seed` — deterministic across executors, no plane matrix to ship. */
  def hyperplaneBucket(v: ArrayData, nPlanes: Int, seed: Long): Int = {
    val n = v.numElements()
    var bucket = 0
    var p = 0
    while (p < nPlanes) {
      var dot = 0.0
      var i = 0
      while (i < n) {
        // plane weight in [-1,1) from (seed, plane, dim)
        val h = mix64(seed ^ (p * GOLDEN) ^ (i * 0xc2b2ae3d27d4eb4fL))
        val w = (h >> 11).toDouble / (1L << 52).toDouble // [-1, 1)
        dot += v.getFloat(i) * w
        i += 1
      }
      if (dot >= 0) bucket |= (1 << p)
      p += 1
    }
    bucket
  }

  /** Hamming distance between two 64-bit sketches. */
  @inline def hamming64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** The `n` nearest coarse-quantizer cells for a vector, by cosine —
    * IVF assignment (corpus: n=1; probes: n=nProbe). Centroids ride into
    * generated code as a reference object. */
  def nearestCells(v: ArrayData, centroids: Array[Array[Float]], n: Int): ArrayData = {
    val k = centroids.length
    val scores = new Array[Double](k)
    var c = 0
    while (c < k) {
      val cent = centroids(c)
      var dot = 0.0; var nv = 0.0; var nc = 0.0
      var i = 0
      val dim = math.min(v.numElements(), cent.length)
      while (i < dim) {
        val x = v.getFloat(i).toDouble; val y = cent(i).toDouble
        dot += x * y; nv += x * x; nc += y * y
        i += 1
      }
      val denom = math.sqrt(nv) * math.sqrt(nc)
      scores(c) = if (denom == 0.0) -2.0 else dot / denom
      c += 1
    }
    val order = (0 until k).sortBy(i => (-scores(i), i)).take(math.min(n, k))
    new GenericArrayData(order.map(_.toLong).toArray)
  }
}
