package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The golden-snapshot pins must (a) hold on the committed corpora,
  * (b) actually FLAG drift — a fingerprint that can't go red is no pin —
  * and (c) stay vacuous on corpora with no committed record (smoke
  * dirs), never spuriously red. */
class GoldenSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("all three golden anchors are clean at sf0.001") {
    Seq("q_x_phash_golden", "q_x_multimodal_golden", "q_x_kmeans_golden")
      .foreach { name =>
        val rows = Catalog.byName(name).run(spark, dir).collect()
        assert(rows.isEmpty, s"$name flagged: ${rows.mkString("; ")}")
      }
  }

  test("positive control: a perturbed snapshot flags both count and hash") {
    val result = Catalog.byName("q_x_kmeans_sizes").run(spark, dir)
    val bad = Map("sf0.001" -> (7L, "123"))
    val v = Golden.violations(result, dir, bad).collect()
    assert(v.map(_.getString(0)).sorted.toSeq ==
      Seq("row_count", "row_hash_sum"))
  }

  test("uncommitted corpus dir is vacuous, not red") {
    val result = Catalog.byName("q_x_kmeans_sizes").run(spark, dir)
    val v = Golden.violations(result, "/tmp/smoke10x",
      GoldenSnapshots.kmeansSizes)
    assert(v.collect().isEmpty)
    assert(v.columns.toSeq == Seq("reason", "got", "want"))
  }

  test("fingerprint is layout-independent") {
    val result = Catalog.byName("q_x_image_phash").run(spark, dir)
    val a = Golden.fingerprint(result).head()
    val b = Golden.fingerprint(result.repartition(13)).head()
    assert(a == b)
  }

  test("fingerprint distinguishes WHICH column is null, and null from empty") {
    // concat_ws silently skips null args; without the U+0000 sentinel
    // (null, x) and (x, null) — e.g. rollup/cube grouping nulls — would
    // hash identically and mask drift
    val spark0 = spark
    import spark0.implicits._
    def fp(a: Option[String], b: Option[String]): String =
      Golden.fingerprint(Seq((a, b)).toDF("a", "b")).head().getString(1)
    val nullA = fp(None, Some("x"))
    val nullB = fp(Some("x"), None)
    val emptyA = fp(Some(""), Some("x"))
    assert(nullA != nullB, "null-in-a vs null-in-b collided")
    assert(nullA != emptyA, "null vs empty string collided")
  }
}
