package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining: documents are laid out in a
  * deterministic order and sliced into fixed token-budget training
  * sequences ("concat-and-chunk" — the standard pretraining layout, where
  * a document may straddle two adjacent sequences).
  *
  * Packing is per-SHARD: each md5-prefix shard is packed independently, so
  * every window partition is corpus/|shards| and no global cumulative sum
  * exists anywhere — the same hierarchical discipline as
  * [[Sampling.shufflePositions]]. Real pipelines pack per output file/shard
  * for exactly this reason.
  */
object Packing {

  /** Assign every document its training-sequence index.
    *
    * Within each shard, documents are ordered by (md5(id), id); the
    * running token total before a document determines the sequence it
    * STARTS in: `seq = floor(prev_cum / budget)`. `straddles` flags
    * documents whose tail crosses into the next sequence. All arithmetic
    * is integer counts + one double division of small magnitudes —
    * bit-identical in any engine.
    *
    * `hexDigits` sets the shard count (16^digits); the default 0 means
    * AUTO — the smallest digit count whose shard fan-out covers the
    * session's `spark.sql.shuffle.partitions` (the [[packSegments]]
    * idiom), so the per-shard window partition width tracks the cluster's
    * parallelism instead of a fixed corpus/16: a 1000-executor session
    * over 100 TB gets ≥ its parallelism in shards BY DEFAULT rather than
    * sixteen 6 TB window sorts. Because the shard assignment is part of
    * the OUTPUT, the auto default makes results parallelism-dependent
    * across sessions with different shuffle fan-outs (16^d is a step
    * function, so e.g. both 32 and 53 partitions give d = 2) — pass an
    * explicit `hexDigits` when cross-session layout stability matters
    * more than default scale-safety (as [[Curation.layout]] does).
    *
    * Output: id, shard, n_tok, seq (0-based within shard), straddles (0/1).
    */
  def packSequences(df: DataFrame, idCol: String, tokenCount: Column,
                    budget: Int, hexDigits: Int = 0,
                    extraPartitionCols: Seq[String] = Nil): DataFrame = {
    require(budget > 0, s"budget $budget must be positive")
    require(hexDigits >= 0 && hexDigits <= 8,
      s"hexDigits $hexDigits must be in [0, 8] (0 = auto)")
    val digits =
      if (hexDigits > 0) hexDigits
      else {
        val par = math.max(1,
          df.sparkSession.sessionState.conf.numShufflePartitions)
        math.max(1, math.ceil(math.log(par) / math.log(16)).toInt)
      }
    val key = md5(col(idCol).cast("string"))
    val extra = extraPartitionCols.map(col)
    val w = Window.partitionBy(extra :+ col("shard"): _*)
      .orderBy(col("__pack_key"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(idCol) +: extra ++: Seq(
        tokenCount.cast("long").as("n_tok"),
        key.as("__pack_key"),
        Sampling.md5Shard(col(idCol), digits).cast("long").as("shard")): _*)
      .withColumn("__cum", sum(col("n_tok")).over(w))
      .select(col(idCol) +: extra ++: Seq(
        col("shard"), col("n_tok"),
        floor((col("__cum") - col("n_tok")) * 1.0 / budget).cast("long")
          .as("seq"),
        when(floor((col("__cum") - 1) * 1.0 / budget) >
            floor((col("__cum") - col("n_tok")) * 1.0 / budget), 1L)
          .otherwise(0L).as("straddles")): _*)
  }

  final case class PackedSeg(doc_id: Long, bin: Long, seg_start: Long,
                             seg_len: Long)

  /** GLOBAL-ORDER segment table — [[packSequences]]'s loader-grade
    * companion: where packSequences assigns each doc its starting
    * sequence per md5 shard (an index), packSegments emits the exact
    * per-(doc, bin) token spans of ONE corpus-wide id-ordered stream —
    * which token range of which doc fills which part of which training
    * example, bins exactly `contextLen` full except the last.
    *
    * Scale shape — a distributed PREFIX SUM, not a global window
    * (`sum(n) over (order by id)` would drag the corpus through one
    * partition): the id span splits into fixed-width DETERMINISTIC
    * buckets (a pure function of (id, min, max) — no range sampling, so
    * recomputation sees identical boundaries and no persist barrier is
    * needed); a per-bucket token-sum aggregate (≤ |buckets| rows —
    * bounded driver probe) prefix-sums on the driver into per-bucket
    * stream offsets; one exchange clusters each bucket's rows sorted by
    * id and a map-only pass adds the bucket offset to the local running
    * sum and emits segments. Three scans of a 2-column projection, one
    * corpus-sized exchange (the unavoidable one — a global order needs
    * co-location by id range), zero windows. Bucket widths are
    * id-uniform, not row-uniform: dense ids (the normal case for ingest
    * sequence numbers) balance evenly; clustered ids unbalance tasks but
    * never correctness. Empty docs (0 tokens) occupy no stream positions
    * and drop out, like [[Dsir.importanceWeights]]'s no-evidence docs.
    *
    * @param docs       (idCol, nTokCol) frame — compute nTokCol with the
    *                   repo's token-count expression upstream
    * @param contextLen tokens per training example (bin)
    * @param buckets    prefix-sum granularity (defaults to the session's
    *                   shuffle parallelism)
    * @return (doc_id, bin, seg_start, seg_len): token span
    *         [seg_start, seg_start + seg_len) of doc_id fills bin `bin`;
    *         spans tile each doc exactly and every bin except the last
    *         holds exactly contextLen tokens across its segments */
  def packSegments(docs: DataFrame, idCol: String, nTokCol: String,
                    contextLen: Long, buckets: Int = 0): Dataset[PackedSeg] = {
    require(contextLen >= 1, s"contextLen $contextLen must be >= 1")
    val spark = docs.sparkSession
    import spark.implicits._
    val base = docs
      .select(col(idCol).cast("long").as("id"),
        col(nTokCol).cast("long").as("n"))
      .filter(col("n") > 0L)
    val bounds = base.agg(min(col("id")), max(col("id"))).head()
    if (bounds.isNullAt(0)) return spark.emptyDataset[PackedSeg]
    val minId = bounds.getLong(0)
    val maxId = bounds.getLong(1)
    val nBuckets = math.max(1,
      if (buckets > 0) buckets
      else spark.conf.get("spark.sql.shuffle.partitions").toInt)
    // Fixed-width id buckets: width = ceil(span / buckets), computed in
    // BigInt so a full-range id span cannot overflow the addition.
    val width = ((BigInt(maxId) - BigInt(minId) + nBuckets) / nBuckets)
      .max(BigInt(1)).toLong
    // try_divide/`/` coerce to double; DIV (integer division) stays exact
    // at any id span.
    val withPid = base.withColumn("pid",
      expr(s"CAST((id - ${minId}L) DIV ${width}L AS INT)"))
    // ≤ |buckets| rows — bounded driver probe (the IVF probe-cell class).
    val partSums = withPid.groupBy(col("pid"))
      .agg(sum(col("n")).as("s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = new Array[Long](nBuckets + 1)
    var p = 0
    while (p < nBuckets) {
      offsets(p + 1) = offsets(p) + partSums.getOrElse(p, 0L)
      p += 1
    }
    val offBc = spark.sparkContext.broadcast(offsets)
    val l = contextLen
    withPid
      .repartition(nBuckets, col("pid"))
      .sortWithinPartitions("pid", "id")
      .as[(Long, Long, Int)]
      .mapPartitions { rows =>
        // A hash-partitioned task may hold SEVERAL pid buckets; rows are
        // sorted (pid, id), so reseed the running sum at each pid edge.
        val off = offBc.value
        var curPid = -1
        var cum = 0L
        rows.flatMap { case (id, n, pid) =>
          if (pid != curPid) { curPid = pid; cum = off(pid) }
          val cb = cum
          cum += n
          val first = cb / l
          val last = (cb + n - 1) / l
          (first to last).iterator.map { b =>
            val s = math.max(cb, b * l)
            val e = math.min(cb + n, (b + 1) * l)
            PackedSeg(id, b, s - cb, e - s)
          }
        }
      }
  }
}
