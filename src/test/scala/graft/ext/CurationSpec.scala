package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.Sources

class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("full pipeline over testdata docs: monotone counts, deterministic output") {
    val docs = Sources.table(spark, "/root/testdata/sf0.001", "documents")
    val r = Curation.run(docs, minQualityBp = 4000L)
    assert(r.report.input == 500)
    // each stage can only shrink the doc set
    assert(r.report.afterExactDedup <= r.report.input)
    assert(r.report.afterNearDedup <= r.report.afterExactDedup)
    assert(r.report.afterQuality <= r.report.afterNearDedup)
    // sf0.001 has no byte-identical texts (500 distinct), but the corpus
    // plants NEAR-dup clusters and a quality spread: those stages fire
    assert(r.report.afterNearDedup < r.report.afterExactDedup)
    assert(r.report.afterQuality < r.report.afterNearDedup)
    assert(r.report.chunks >= r.report.afterQuality) // ≥1 chunk per doc
    assert(r.chunks.columns.toSeq ==
      Seq("doc_id", "chunk_idx", "chunk", "split"))
    assert(r.chunks.select("split").distinct().count() <= 3)
    // deterministic end to end: rerun produces identical chunk rows
    val a = r.chunks.collect().map(_.toSeq).toSet
    val b = Curation.run(docs, minQualityBp = 4000L)
      .chunks.collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("optional decontamination stage drops benchmark-overlapping docs") {
    val docs = Sources.table(spark, "/root/testdata/sf0.001", "documents")
    val probes = docs.filter("doc_id % 50 = 0")
    val r = Curation.run(docs, minQualityBp = 0L,
      decontaminateAgainst = Some(probes))
    val n2b = r.report.afterDecontamination.get
    assert(n2b < r.report.afterNearDedup, "probe overlaps must be dropped")
    assert(r.report.afterQuality <= n2b)
    // none of the probe ids survive into chunks
    val ids = r.chunks.select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(!ids.exists(_ % 50 == 0))
    // without the stage, the report carries no decontamination count
    assert(Curation.run(docs, minQualityBp = 0L)
      .report.afterDecontamination.isEmpty)
  }

  test("layout: every chunk packed once, seqs contiguous per (split, shard), deterministic") {
    import org.apache.spark.sql.functions.{col, countDistinct}
    val docs = Sources.table(spark, "/root/testdata/sf0.001", "documents")
      .limit(100)
    val r = Curation.run(docs, minQualityBp = 0L)
    val packed = r.chunks.transform(c => Curation.layout(c, budget = 64))
    assert(packed.count() == r.chunks.count()) // bijective over chunks
    assert(packed.columns.toSeq ==
      Seq("chunk_id", "split", "shard", "n_tok", "seq", "straddles"))
    // per (split, shard): sequences start at 0 and are contiguous
    val groups = packed.groupBy(col("split"), col("shard"))
      .agg(org.apache.spark.sql.functions.min(col("seq")).as("lo"),
        org.apache.spark.sql.functions.max(col("seq")).as("hi"),
        countDistinct(col("seq")).as("n"))
      .collect()
    groups.foreach { g =>
      assert(g.getAs[Long]("lo") == 0L)
      assert(g.getAs[Long]("n") == g.getAs[Long]("hi") + 1,
        s"gap in seq ids: $g")
    }
    // reproducible under repartition
    val again = Curation.layout(r.chunks.repartition(11), budget = 64)
      .collect().map(_.toSeq).toSet
    assert(again == packed.collect().map(_.toSeq).toSet)
  }

  test("writeShards: one file per (split, shard), rows in seq order") {
    import org.apache.spark.sql.functions.{col, input_file_name}
    val docs = Sources.table(spark, "/root/testdata/sf0.001", "documents")
      .limit(100)
    val r = Curation.run(docs, minQualityBp = 0L)
    val dir = java.nio.file.Files.createTempDirectory("graft-shards").toString
    Curation.writeShards(r.chunks, dir, budget = 64)

    val back = spark.read.parquet(dir)
    assert(back.count() == r.chunks.count())
    // exactly one data file per (split, shard) partition dir
    val filesPerShard = back
      .select(col("split"), col("shard"), input_file_name().as("f"))
      .distinct().groupBy(col("split"), col("shard")).count()
      .collect()
    assert(filesPerShard.nonEmpty)
    filesPerShard.foreach(row => assert(row.getLong(2) == 1L, s"$row"))
    // within one shard file, rows come back in packed-sequence order
    val one = filesPerShard.head
    // partition discovery infers `shard` back as INT — access untyped
    val rows = spark.read.parquet(
        s"$dir/split=${one.get(0)}/shard=${one.get(1)}")
      .select(col("seq"), col("chunk_id")).collect()
      .map(r0 => (r0.getLong(0), r0.getString(1)))
    assert(rows.sameElements(rows.sortBy(identity)), "shard file not ordered")
  }

  test("planted PII never reaches a chunk") {
    val spark0 = spark
    import spark0.implicits._
    val base = Sources.table(spark, "/root/testdata/sf0.001", "documents")
      .limit(20)
    val pii = Seq((9001L,
      ("contact me at leak@example.com or 555-123-4567 " * 8).trim,
      "en", "web", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = Curation.run(base.unionByName(pii), minQualityBp = 0L)
    val hits = r.chunks
      .filter(col => col.getAs[String]("chunk").contains("example.com") ||
        col.getAs[String]("chunk").contains("555-123-4567"))
    assert(hits.isEmpty)
    assert(r.chunks.filter($"chunk".contains("<EMAIL>")).count() > 0)
  }

  test("filterFunnel: first-fail attribution, conservation, zero-drop rows") {
    import org.apache.spark.sql.functions._
    val spark0 = spark
    import spark0.implicits._
    // doc 1 fails rules 0 AND 1 → attributed to 0 only; doc 2 fails only
    // rule 1; doc 3 fails rule 2; docs 4-5 survive; rule 3 drops nothing
    val df = Seq(
      (1L, 2, "x"), (2L, 50, "x"), (3L, 80, "en"),
      (4L, 50, "en"), (5L, 55, "en")
    ).toDF("id", "n", "lang")
      .withColumn("ok3", lit(true))
    val out = Curation.filterFunnel(df, Seq(
        "min_n" -> (col("n") >= 10),
        "lang_en" -> (col("lang") === "en"),
        "n_cap" -> (col("n") <= 55),
        "always" -> col("ok3")))
      .collect().map(r => r.getString(1) ->
        ((r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out("min_n") == ((0L, 5L, 1L, 4L)))
    assert(out("lang_en") == ((1L, 4L, 1L, 3L)))
    assert(out("n_cap") == ((2L, 3L, 1L, 2L)))
    assert(out("always") == ((3L, 2L, 0L, 2L))) // zero-drop rule kept
    // conservation: drops + final survivors = corpus
    assert(out.values.map(_._3).sum + out("always")._4 == 5L)
  }

  test("filterFunnel: funnel counts equal sequential filtering") {
    import org.apache.spark.sql.functions._
    val docs = Sources.table(spark, "/root/testdata/sf0.001", "documents")
    val rules = Seq(
      "min_tokens" -> (size(split(col("text"), " ", -1)) >= 40),
      "lang_en" -> (col("lang") === "en"),
      "quality" -> (TextAnalysis.qualityScoreBp(col("text")) >= 8200L))
    val funnel = Curation.filterFunnel(docs, rules)
      .collect().map(r => r.getString(1) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    // reference: apply the same rules one at a time
    var cur = docs
    for ((name, pred) <- rules) {
      val before = cur.count()
      cur = cur.filter(pred)
      assert(funnel(name) == ((before, before - cur.count())), name)
    }
  }
}
