package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The composed training-data curation pipeline — the end-to-end flow the
  * individual operators exist for:
  *
  *   exact dedup → near-dup dedup (MinHash+LSH) →
  *   [benchmark decontamination] → quality gate →
  *   PII redaction → chunking → deterministic split assignment
  *
  * Each stage is the already-tested operator; this object owns the
  * composition order (cheap exact dedup BEFORE the sketch pass shrinks
  * the LSH input; redaction BEFORE chunking so no chunk straddles a
  * half-redacted span) and the per-stage accounting a production run logs.
  *
  * Scale shape: stages 1-2 are the only shuffling stages (hash agg +
  * bucketed LSH); quality, redaction, chunking, and split are map-only,
  * so the pipeline's cost at 100 TB is dedup's cost plus one linear pass.
  */
object Curation {

  final case class Report(input: Long, afterExactDedup: Long,
                          afterNearDedup: Long, afterQuality: Long,
                          chunks: Long,
                          afterDecontamination: Option[Long] = None)

  final case class Result(chunks: DataFrame, report: Report)

  /** Run the full pipeline over a documents frame.
    *
    * @param minQualityBp   quality-gate floor in basis points (0..10000)
    * @param jaccardThreshold near-dup verify threshold
    * @param decontaminateAgainst optional benchmark/eval corpus: docs
    *   sharing a word `decontaminateN`-gram with it are dropped (between
    *   near-dup dedup and the quality gate — overlap removal before any
    *   text rewriting)
    * @return chunk-level frame (doc_id, chunk_idx, chunk, split) of
    *         surviving canonical docs, plus per-stage counts
    */
  def run(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
          minQualityBp: Long = 5000L, jaccardThreshold: Double = 0.7,
          windowTokens: Int = 32, strideTokens: Int = 16,
          decontaminateAgainst: Option[DataFrame] = None,
          decontaminateN: Int = 8): Result = {
    val input = docs.count()

    // Each stage's survivors are localCheckpoint'd (the repo's convention
    // for multiply-consumed frames): without the barrier, every per-stage
    // count() plus the returned chunks frame would re-execute the whole
    // upstream plan — the expensive LSH dedup ~4× instead of once.

    // 1. exact dedup (hash-agg; canonical = min id)
    val exact = Dedup.exactByHash(docs, idCol, Seq(textCol))
      .filter(col("is_canonical")).select(col(idCol))
    val d1 = docs.join(exact, Seq(idCol), "left_semi").localCheckpoint(true)
    val n1 = d1.count()

    // 2. near-dup dedup on the exact-deduped survivors
    val near = Dedup.minhash(d1, idCol, textCol, threshold = jaccardThreshold)
      .filter(col("is_canonical")).select(col(idCol))
    val d2 = d1.join(near, Seq(idCol), "left_semi").localCheckpoint(true)
    val n2 = d2.count()

    // 2b. optional benchmark decontamination (before any text rewriting)
    val (d2b, n2b) = decontaminateAgainst match {
      case Some(probes) =>
        val kept = Decontaminate
          .exact(d2, probes, idCol, textCol, decontaminateN)
          .localCheckpoint(true)
        (kept, Some(kept.count()))
      case None => (d2, None)
    }

    // 3. quality gate (map-only)
    val d3 = d2b
      .withColumn("__q", struct(TextAnalysis.qualityColumns(col(textCol)): _*))
      .filter(col("__q.quality_score_bp") >= minQualityBp)
      .drop("__q")
      .localCheckpoint(true)
    val n3 = d3.count()

    // 4. PII redaction, then 5. chunking over the REDACTED text
    val redacted = d3.select(
      col(idCol) +: TextAnalysis.redactPii(col(textCol)): _*)
    val chunked = TextAnalysis.chunk(
      redacted.withColumnRenamed("redacted", "__text"),
      idCol, "__text", windowTokens, strideTokens)

    // 6. deterministic split (stable across reruns/engines)
    val split = Sampling.deterministicSplit(chunked, idCol)
      .select(col(idCol), col("chunk_idx"), col("chunk"), col("split"))
    Result(split, Report(input, n1, n2, n3, split.count(), n2b))
  }

  /** Final layout pass over the curated chunk frame ([[Result.chunks]]):
    * concat-and-chunk sequence packing PER (split, shard) — the step that
    * turns curated chunks into serializable training sequences. Every
    * window partition is split-local and shard-bounded (corpus/|shards|),
    * and the whole pass is one shuffle; writing the result partitioned by
    * (split, shard) ordered by (seq) yields the training shard files.
    * Chunk identity is (doc, chunk_idx) — deterministic, so the layout is
    * reproducible run-to-run like the split assignment itself. */
  def layout(chunks: DataFrame, idCol: String = "doc_id",
             budget: Int = 512, hexDigits: Int = 1): DataFrame = {
    val withId = chunks.withColumn("__chunk_id",
      concat_ws("#", col(idCol), col("chunk_idx")))
    Packing.packSequences(withId, "__chunk_id",
        size(split(col("chunk"), " ", -1)), budget, hexDigits,
        extraPartitionCols = Seq("split"))
      .withColumnRenamed("__chunk_id", "chunk_id")
  }

  /** Serialize the packed layout as training shards: one parquet file per
    * (split, shard), rows in (seq, chunk_id) order — the file set a
    * sequential trainer consumes directly. `repartition(split, shard)`
    * makes each task own exactly one shard directory (one output file),
    * and `sortWithinPartitions` fixes the in-file row order (parquet
    * preserves it). One shuffle + one sorted write; no driver involvement
    * regardless of corpus size. */
  def writeShards(chunks: DataFrame, dir: String, idCol: String = "doc_id",
                  budget: Int = 512, hexDigits: Int = 1): Unit = {
    val packed = layout(chunks, idCol, budget, hexDigits)
    val text = chunks.select(
      concat_ws("#", col(idCol), col("chunk_idx")).as("chunk_id"),
      col("chunk"))
    packed.join(text, Seq("chunk_id"))
      .repartition(col("split"), col("shard"))
      // the dynamic-partition writer requires ordering by the partition
      // columns and inserts its own (non-stable) sort when unsatisfied —
      // leading with (split, shard) keeps OUR (seq) order the one written
      .sortWithinPartitions(col("split"), col("shard"),
        col("seq"), col("chunk_id"))
      .write.partitionBy("split", "shard")
      .mode("overwrite").parquet(dir)
  }

  /** Filter-funnel accounting — the per-rule drop report every production
    * curation run logs (cf. Gopher's "% removed by each filter" tables and
    * Dolma's per-tagger attrition): rules are applied IN ORDER, each
    * document is attributed to its FIRST failing rule, and the result is
    * one row per rule with how many docs reached it, how many it dropped,
    * and how many moved on. `sum(n_dropped) + final n_out = corpus`.
    *
    * Scale shape: ONE map-only pass evaluates the whole rule chain per
    * document (a coalesced CASE — no per-rule passes, no intermediate
    * materialization), then one hash aggregate over |rules|+1 stage codes.
    * The funnel arithmetic (windows for totals/running drops) runs on the
    * |rules|+1-row frame, never on the corpus.
    *
    * Output: (stage, rule, n_in, n_dropped, n_out), stage 0-based in rule
    * order; rules that drop nothing still appear (n_dropped = 0). */
  def filterFunnel(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "at least one rule required")
    require(rules.map(_._1).distinct.size == rules.size,
      "rule names must be unique")
    val spark = df.sparkSession
    import spark.implicits._
    // first failing rule index; survivors get the sentinel |rules|
    val stage = coalesce(rules.zipWithIndex.map { case ((_, pred), i) =>
      when(!pred, lit(i.toLong))
    } :+ lit(rules.length.toLong): _*)
    val counts = df.select(stage.as("__stage"))
      .groupBy(col("__stage")).agg(count(lit(1)).as("__n"))
    // left-join the rule list (plus the survivor sentinel) so zero-drop
    // rules keep a row; everything below is |rules|+1 rows
    val ruleRows = (rules.map(_._1) :+ "__kept__").zipWithIndex
      .map { case (n, i) => (i.toLong, n) }.toDF("stage", "rule")
    val whole = Window
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val before = Window.orderBy(col("stage"))
      .rowsBetween(Window.unboundedPreceding, -1)
    ruleRows.join(counts, col("stage") === col("__stage"), "left")
      .select(col("stage"), col("rule"),
        coalesce(col("__n"), lit(0L)).as("__cnt"))
      .withColumn("__total", sum(col("__cnt")).over(whole))
      .withColumn("__before", coalesce(sum(col("__cnt")).over(before), lit(0L)))
      .filter(col("rule") =!= "__kept__")
      .select(col("stage"), col("rule"),
        (col("__total") - col("__before")).as("n_in"),
        col("__cnt").as("n_dropped"),
        (col("__total") - col("__before") - col("__cnt")).as("n_out"))
  }

  /** Contrastive training-pair synthesis — the DPR/retrieval-trainer prep
    * step: from every document long enough, (query = its first 32-token
    * chunk, positive = its third), the stride-16 chunking making the two
    * spans token-disjoint (tokens 1-32 vs 33-64) so the positive is
    * semantically related but textually distinct; in-batch negatives are
    * the trainer's business (pair with [[Similarity.hardNegatives]] for
    * mined ones). Output: (idCol, query_chunk, positive_chunk), one pair per doc with
    * >= 33 tokens. Scale shape: one chunking pass, one self-join by doc
    * id on the two chunk indexes -- co-keyed, no fan-out. */
  def contrastivePairs(docs: DataFrame, idCol: String,
                       textCol: String): DataFrame = {
    val ch = TextAnalysis.chunk(docs, idCol, textCol, 32, 16)
    val q = ch.filter(col("chunk_idx") === 0)
      .select(col(idCol), col("chunk").as("query_chunk"))
    val p = ch.filter(col("chunk_idx") === 2)
      .select(col(idCol), col("chunk").as("positive_chunk"))
    q.join(p, Seq(idCol))
  }
}
