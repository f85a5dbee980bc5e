package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.TextExprs

class SimilarityJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def docs(rows: (Long, String)*) = {
    val spark0 = spark
    import spark0.implicits._
    rows.toDF("doc_id", "text")
  }

  /** Brute-force ground truth over the same hashed shingles. */
  private def bruteforce(df: org.apache.spark.sql.DataFrame,
                         t: Double): Set[(Long, Long)] = {
    val sh = df.select(col("doc_id"),
        TextExprs.sorted_shingles(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
    val a = sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val b = sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("jac", TextExprs.array_jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jac") >= t)
      .select(col("id_a"), col("id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  private def run(df: org.apache.spark.sql.DataFrame, tNum: Int, tDen: Int) =
    SimilarityJoin.prefixJaccardSelfJoin(df, "doc_id", "text", tNum, tDen)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("matches brute force exactly on a mixed corpus") {
    val base = "the quick brown fox jumps over the lazy dog near the red barn"
    val df = docs(
      1L -> base,
      2L -> base, // identical
      3L -> (base + " today"), // near-dup
      4L -> "completely different words in this unrelated document text here",
      5L -> "another entirely distinct sentence about spark catalyst planning",
      6L -> (base + " yesterday evening")) // near-dup of 1/2/3
    val got = run(df, 4, 5)
    assert(got == bruteforce(df, 0.8))
    assert(got.contains((1L, 2L))) // the identical pair must be found
  }

  test("prefix filter drops no true pair at a low threshold (recall stress)") {
    // Random-ish word soup with planted overlaps: low thresholds maximize
    // prefix length and candidate volume — exactness must hold regardless.
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    val rows = (0L until 30L).map { i =>
      val txt = (0 until 10).map(j => words(((i * 7 + j * 3) % 12).toInt))
        .mkString(" ")
      i -> txt
    }
    val df = docs(rows: _*)
    assert(run(df, 1, 2) == bruteforce(df, 0.5))
  }

  test("rational threshold: ceil(t*sz) is exact where double ceil is not") {
    // sz=5, t=4/5: true prefix length = 5 - 4 + 1 = 2. A double-based
    // ceil(0.8*5) = ceil(4.0000000000000002) = 5 would shrink it to 1 —
    // this corpus is built so the pair's smallest shared token is the
    // SECOND prefix token of one side, so a shortened prefix misses it
    // only if the implementation were wrong; equality with brute force
    // certifies the integer math end-to-end.
    val df = docs(
      1L -> "a b c d e f g", // 5 shingles
      2L -> "a b c d e f h") // shares 4 of 6
    assert(run(df, 4, 5) == bruteforce(df, 0.8))
  }

  test("empty and tiny docs are handled (<=n tokens -> one shingle)") {
    val df = docs(
      1L -> "",
      2L -> "one two",
      3L -> "one two",
      4L -> "one two three four five six seven")
    val got = run(df, 4, 5)
    assert(got == Set((2L, 3L)))
  }

  test("length filter prunes size-incompatible pairs but keeps true ones") {
    val long = (1 to 40).map(i => s"w$i").mkString(" ")
    val df = docs(
      1L -> long,
      2L -> (long + " extra"), // jac = 38/40 >= 0.8
      3L -> "w1 w2 w3 w4 w5") // subset but far too short
    val got = run(df, 4, 5)
    assert(got == bruteforce(df, 0.8))
    assert(got.contains((1L, 2L)) && !got.exists(p => p._2 == 3L))
  }
}
