package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** packSegments invariants: segments tile every doc exactly, every bin
  * except the last is exactly full, bins are the contiguous split of one
  * id-ordered stream — and the distributed prefix sum (bucketed offsets,
  * no global window) produces the identical table under any partition
  * layout and any bucket count, which is what makes it a 100 TB plan. */
class PackingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val L = 10L

  // doc_id -> n_tok; includes a doc longer than 2 windows (35), an
  // exactly-window-filling prefix, an empty doc (drops), sparse ids.
  private val docs = Seq(
    (1L, 4L), (2L, 6L),          // bin 0 exactly full
    (5L, 35L),                   // spans bins 1..4
    (9L, 0L),                    // empty: no segments
    (100L, 3L), (101L, 2L))      // tail, last bin underfull
    .toDF("doc_id", "n_tok")

  private def run(df: org.apache.spark.sql.DataFrame, buckets: Int = 0) =
    Packing.packSegments(df, "doc_id", "n_tok", L, buckets)
      .collect().map(s => (s.doc_id, s.bin, s.seg_start, s.seg_len)).toSet

  test("segments tile docs; bins full except the last; spans exact") {
    val got = run(docs)
    val want = Set(
      (1L, 0L, 0L, 4L), (2L, 0L, 0L, 6L),
      // doc 5: cb=10, spans tokens 10..44 -> bins 1..4
      (5L, 1L, 0L, 10L), (5L, 2L, 10L, 10L), (5L, 3L, 20L, 10L),
      (5L, 4L, 30L, 5L),
      // doc 100: cb=45 -> tokens 45..47 stay in bin 4
      (100L, 4L, 0L, 3L),
      // doc 101: cb=48, tokens 48..49 fill bin 4 to exactly 50
      (101L, 4L, 0L, 2L))
    assert(got == want)
    // per-doc tiling: seg lens sum to n_tok, seg_starts contiguous
    val byDoc = got.groupBy(_._1)
    assert(byDoc(5L).toSeq.sortBy(_._2).map(_._3) == Seq(0L, 10L, 20L, 30L))
    assert(byDoc(5L).toSeq.map(_._4).sum == 35L)
    assert(!byDoc.contains(9L), "empty doc must drop")
    // every bin except the last holds exactly L tokens
    val binTotals = got.groupBy(_._2).view.mapValues(_.map(_._4).sum).toMap
    val lastBin = binTotals.keys.max
    binTotals.foreach { case (b, tot) =>
      if (b < lastBin) assert(tot == L, s"bin $b holds $tot, want $L")
    }
  }

  test("layout-independent: any partitioning, any bucket count") {
    val want = run(docs)
    assert(run(docs.repartition(7, col("doc_id"))) == want)
    assert(run(docs.repartition(1)) == want)
    assert(run(docs, buckets = 1) == want)
    assert(run(docs, buckets = 3) == want)
    assert(run(docs, buckets = 64) == want)
  }

  test("plan has no global window and no corpus sort to one partition") {
    val plan = Packing.packSegments(docs, "doc_id", "n_tok", L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"no window expected:\n$plan")
    assert(!plan.contains("SinglePartition"),
      s"no single-partition exchange expected:\n$plan")
  }

  test("empty input yields an empty segment table") {
    val empty = Seq.empty[(Long, Long)].toDF("doc_id", "n_tok")
    assert(Packing.packSegments(empty, "doc_id", "n_tok", L).count() == 0L)
    val allZero = Seq((1L, 0L)).toDF("doc_id", "n_tok")
    assert(Packing.packSegments(allZero, "doc_id", "n_tok", L).count() == 0L)
  }

  test("packSequences auto shard default covers the session parallelism") {
    // auto = smallest d with 16^d >= shuffle partitions (so the canonical
    // 32-partition gate session gets d = 2, 256 shards — window partitions
    // track parallelism instead of the former fixed corpus/16).
    val par = spark.sessionState.conf.numShufflePartitions
    val expectDigits = math.max(1,
      math.ceil(math.log(par) / math.log(16)).toInt)
    assert(math.pow(16, expectDigits) >= par)
    val many = (1L to 400L).map(i => (i, 5L)).toDF("doc_id", "n_tok")
    def rows(hex: Int) = Packing.packSequences(many, "doc_id",
        col("n_tok"), budget = 10, hexDigits = hex)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4))).toSet
    val auto = rows(0)
    assert(auto == rows(expectDigits),
      s"auto at $par partitions must equal hexDigits=$expectDigits")
    val shards = auto.map(_._2)
    val bound = math.pow(16, expectDigits).toLong
    assert(shards.forall(s => s >= 0 && s < bound))
    // and two digits genuinely differ from one (the default used to be 1)
    assert(rows(2) != rows(1), "2-digit sharding must differ from 1-digit")
  }
}
