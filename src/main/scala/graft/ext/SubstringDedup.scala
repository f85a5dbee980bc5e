package graft.ext

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-document EXACT-substring duplication (Lee et al. 2022,
  * "Deduplicating Training Data Makes Language Models Better", ACL,
  * arXiv:2107.06499 — the ExactSubstr stage): find, per document, the
  * maximal token spans that appear VERBATIM in at least one OTHER
  * document, so a curation pipeline can cut the duplicated span (their
  * removal semantics) rather than drop whole near-duplicate docs. This is
  * the exact companion to the near-dup family: minhash/simhash flag
  * mostly-similar DOCUMENTS; this flags shared SPANS — boilerplate
  * headers, license blocks, syndicated paragraphs — inside otherwise
  * distinct documents. Within-doc repetition is deliberately out of
  * scope (that's [[TextAnalysis.duplicateSpans]]); an anchor must occur
  * in ≥2 DISTINCT documents to count.
  *
  * Algorithm — anchor-grouping, NOT an all-pairs join and NOT a
  * monolithic suffix array: a span of ≥k shared tokens exists iff some
  * k-token anchor (window) is shared, so
  *   1. explode each doc into its k-token anchors (pos, anchor text);
  *   2. aggregate anchors, keep those in ≥2 distinct docs (exact
  *      count-distinct — one corpus-sized exchange keyed by the anchor);
  *   3. join the anchor stream back against the shared-anchor set
  *      (second corpus-sized exchange, co-partitioned with the
  *      aggregate's output so AQE reuses the layout);
  *   4. per doc, merge covered anchor positions into maximal covered
  *      TOKEN runs (two covered anchors p ≤ q chain iff q − p ≤ k) with
  *      a doc-partitioned window — bounded by document length, never by
  *      corpus size (the shardedSessions per-key argument).
  * Lee et al.'s single-node suffix array wins constants on one machine;
  * on a cluster the anchor form is embarrassingly parallel, strictly
  * linear in corpus size (k× anchor blowup in the two exchanges), and
  * needs no global suffix ordering or seam repair. The exchange key is
  * xxhash64 over the k-token slice (r13; previously the raw k-token
  * string): 8 bytes per anchor on both corpus-sized exchanges and no
  * per-position string construction, at the exactByHash collision trade
  * — P(any collision) ≈ (#distinct anchors)²/2⁶⁵, negligible through
  * trillion-anchor corpora, and verified hash-green against the
  * raw-string DuckDB oracle at both gate SFs.
  *
  * All-integer output — positions are 1-based token indices, span
  * boundaries inclusive — so the frame hash-checks against an engine
  * rebuilding the same pipeline.
  *
  * @param k minimum shared-span length in tokens (= anchor width); every
  *          emitted span has span_tokens ≥ k by construction
  * @return (doc_id, span_start, span_end, span_tokens), one row per
  *         maximal cross-doc duplicated span
  */
object SubstringDedup {

  def crossDocSpans(df: DataFrame, idCol: String, textCol: String,
                    k: Int = 8): DataFrame = {
    require(k >= 2 && k <= 256, s"k $k must be in 2..256 tokens")

    // r13 optimization (the class doc's own 100 TB note, now the default):
    // key the anchor stream by xxhash64 OVER THE TOKEN SLICE instead of a
    // built k-token string. Per position this replaces an array_join
    // string allocation (~k·token bytes, twice — the stream is traversed
    // by both the aggregate and the join-back) with one 8-byte hash, and
    // shrinks both corpus-sized exchange keys from ~k·token bytes to 8 B.
    // Collision cost: two DIFFERENT k-token windows sharing a 64-bit hash
    // could mark a span as shared; P ≈ (#distinct anchors)²/2⁶⁵ — the
    // exactByHash trade, ≪ 1 through trillion-anchor corpora, and the
    // DuckDB oracle (which compares raw strings) stays hash-green at both
    // gate SFs, i.e. zero collisions on the driver data. fanOut: the
    // k-slice + hash anchor explode is codec-grade per-row CPU (measured
    // 1.7 s -> 1.2 s at sf0.1 with the fan-out, unlike the plain
    // tokenize chains where it regresses — see Sources.fanOut doc).
    val anchors = graft.sources.Sources.fanOut(
        df.select(col(idCol).as("doc_id"), col(textCol).as("__text")),
        col("doc_id"))
      .select(col("doc_id"),
        filter(split(col("__text"), " ", -1), x => x =!= "").as("toks"))
      .filter(size(col("toks")) >= k)
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), size(col("toks")) - (k - 1)),
        i => struct(i.cast("long").as("pos"),
          xxhash64(slice(col("toks"), i, lit(k))).as("anchor"))))
        .as("a"))
      .select(col("doc_id"), col("a.pos").as("pos"),
        col("a.anchor").as("anchor"))

    // shared anchors: exact distinct-doc count ≥ 2, keyed by the anchor
    // hash (partial aggregation bounds the exchange at one row per
    // (anchor, doc) pair per map task)
    val shared = anchors.groupBy(col("anchor"))
      .agg(countDistinct(col("doc_id")).as("n_docs"))
      .filter(col("n_docs") >= 2)
      .select(col("anchor"))

    // occurrences covered by a shared anchor; then maximal covered token
    // runs per doc: anchors p ≤ q chain iff q − p ≤ k (token ranges
    // [p, p+k−1] and [q, q+k−1] overlap or touch)
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    anchors.join(shared, Seq("anchor"))
      .select(col("doc_id"), col("pos"))
      .withColumn("brk",
        when(col("pos") - lag(col("pos"), 1).over(byDoc) <= k, lit(0L))
          .otherwise(lit(1L)))
      .withColumn("sid", sum(col("brk")).over(byDoc))
      .groupBy(col("doc_id"), col("sid"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + (k - 1)).as("span_end"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("span_tokens"))
  }
}
