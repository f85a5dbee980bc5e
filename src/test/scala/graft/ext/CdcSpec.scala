package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** CDC invariants (Xia et al. 2016): chunks tile the input exactly,
  * respect [min, max] bounds, are a pure function of the bytes, and —
  * the property fixed-size blocking lacks — an edit near the front only
  * disturbs chunks up to the first content boundary after it, so shared
  * byte ranges dedup across blobs regardless of alignment. */
class CdcSpec extends AnyFunSuite {

  private val min = 64
  private val avgBits = 8
  private val max = 1024

  // Deterministic pseudo-random bytes: content-boundary-friendly (high
  // entropy), reproducible without any RNG object.
  private def bytes(n: Int, seed: Long): Array[Byte] =
    Array.tabulate(n)(i =>
      (TextHashing.mix64(seed ^ (i.toLong * TextHashing.GOLDEN)) & 0xff)
        .toByte)

  private def cut(b: Array[Byte]) = Cdc.chunkBytes(b, min, avgBits, max)

  test("chunks tile the input: offsets contiguous from 0, lens sum to n") {
    val b = bytes(20000, 7L)
    val cs = cut(b)
    assert(cs.nonEmpty)
    assert(cs.head._1 == 0L)
    cs.sliding(2).foreach {
      case Seq((o1, l1, _), (o2, _, _)) => assert(o1 + l1 == o2)
      case _ =>
    }
    assert(cs.map(_._2.toLong).sum == b.length)
  }

  test("size bounds: every chunk in [min, max], last may undershoot min") {
    val b = bytes(50000, 11L)
    val cs = cut(b)
    cs.init.foreach { case (_, len, _) =>
      assert(len >= min && len <= max, s"len $len outside [$min,$max]")
    }
    assert(cs.last._2 >= 1 && cs.last._2 <= max)
  }

  test("constant bytes never match the content mask: max-size force cuts") {
    val b = Array.fill[Byte](5000)(0x41)
    val cs = cut(b)
    // all but the remainder must be exactly max (no content boundary fires)
    cs.init.foreach { case (_, len, _) => assert(len == max) }
    assert(cs.map(_._2).sum == 5000)
  }

  test("boundary-shift containment: a front edit leaves the tail chunks intact") {
    val b = bytes(30000, 13L)
    // insert one byte at position 100
    val edited = (b.take(100) :+ 0x7f.toByte) ++ b.drop(100)
    val orig = cut(b).map { case (_, len, h) => (len, h) }
    val ed = cut(edited).map { case (_, len, h) => (len, h) }
    // compare the chunk (len, hash) sequences from the END: everything
    // after the first content boundary past the edit must be identical.
    val common = orig.reverse.zip(ed.reverse).takeWhile { case (a, c) =>
      a == c
    }.size
    assert(common >= orig.size - 4,
      s"edit disturbed ${orig.size - common} of ${orig.size} chunks")
    assert(common < ed.size, "edit changed nothing — test is vacuous")
  }

  test("identical inputs produce identical chunk sequences (dedup key)") {
    val b = bytes(10000, 17L)
    assert(cut(b) == cut(b.clone()))
  }

  test("shared suffix across two blobs yields shared chunks (cross-blob dedup)") {
    val shared = bytes(8000, 19L)
    val a = bytes(3000, 23L) ++ shared
    val c = bytes(5000, 29L) ++ shared
    val hashesA = cut(a).map(_._3).toSet
    val hashesC = cut(c).map(_._3).toSet
    val common = hashesA.intersect(hashesC).size
    // ~8000/256 ≈ 31 chunks in the shared range; alignment loses only the
    // first one or two after the prefix divergence
    assert(common >= 20, s"only $common shared chunks found")
  }

  test("empty and sub-min inputs degrade to zero / one remainder chunk") {
    assert(cut(Array.emptyByteArray).isEmpty)
    val tiny = bytes(10, 31L)
    val cs = cut(tiny)
    assert(cs == Seq((0L, 10, TextHashing.hashBytes(tiny, 0, 10))))
  }

  test("chunkTableKeyed = chunkTable + key join, without the join") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = (1 to 8).map(i =>
        (i.toLong, bytes(400 + 97 * i, i.toLong), s"g${i % 3}"))
      .toDF("doc_id", "bytes", "grp")
    val keyed = Cdc.chunkTableKeyed(df, "doc_id", "bytes", "grp",
        minSize = 16, avgBits = 6, maxSize = 256).toDF()
      .select("doc_id", "grp", "chunk_idx", "offset", "len", "chunk_hash")
      .collect().map(_.toSeq).toSet
    val joined = Cdc.chunkTable(df, "doc_id", "bytes",
        minSize = 16, avgBits = 6, maxSize = 256).toDF()
      .join(df.select(col("doc_id"), col("grp")), "doc_id")
      .select("doc_id", "grp", "chunk_idx", "offset", "len", "chunk_hash")
      .collect().map(_.toSeq).toSet
    assert(keyed == joined)
    // and the keyed plan has no join operator at all
    val plan = Cdc.chunkTableKeyed(df, "doc_id", "bytes", "grp",
      minSize = 16, avgBits = 6, maxSize = 256)
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("join"),
      s"keyed chunk table should be map-only:\n$plan")
  }
}
