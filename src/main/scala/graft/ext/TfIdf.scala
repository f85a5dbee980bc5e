package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TF-IDF document similarity over an inverted index — the classic
  * sparse-vector complement to the dense-embedding ANN family in
  * [[Similarity]] (the reference analytics surface has no text-similarity
  * operator; this is part of the LLM-pipeline extension set).
  *
  * Shape, 100 TB story:
  *  - one explode + hash-agg builds the postings (doc, term, tf);
  *  - document frequency is a second hash-agg over the postings — no
  *    driver state but one scalar `count()` job for N;
  *  - cosine similarity between a bounded PROBE set and the corpus goes
  *    through a postings self-join keyed on term (the inverted index):
  *    only docs sharing ≥1 term ever pair, never all-pairs;
  *  - ultra-common terms are dropped (`maxDfFraction`) BEFORE the join —
  *    they carry ≈0 idf weight but dominate the join fan-out (a term in
  *    half the corpus pairs every probe with half the corpus). This is
  *    the standard stop-word prune, applied by df, not by list;
  *  - a FRACTION prune alone does not bound fan-out at scale: a term in
  *    10% of an N-doc corpus passes `maxDfFraction = 0.5` at every N and
  *    pairs each probe with N/10 docs, so per-probe join work grows
  *    LINEARLY with the corpus (the 1×-vs-10× smoke measured 36.7×
  *    shuffle on 10× data through exactly this path — see PERF_NOTES).
  *    `maxDf` is the scale knob: an ABSOLUTE posting-length cap that
  *    bounds per-probe candidates at `terms-per-probe × maxDf` regardless
  *    of corpus size. Dropped terms are the highest-df survivors of the
  *    fraction prune — the lowest-idf weights in the frame — so top-1
  *    ranking is disturbed only for pairs whose similarity rests on
  *    mid-frequency terms alone (spec-pinned: planted near-dups keep
  *    their rare-term overlap and stay top-1 under the cap).
  *
  * Weights: w = tf · ln(N/df), L2-normalized per doc, so the postings
  * dot product IS the cosine.
  */
object TfIdf {

  /** (doc_id, term, tf) term frequencies — the ONE corpus scan
    * (tokenize-explode + hash-agg) every postings configuration shares.
    * Callers comparing configurations (e.g. the capped-vs-uncapped
    * anchor) should `localCheckpoint` this frame and feed it to
    * [[postingsFromTf]] twice, instead of re-scanning the corpus. */
  def termFrequencies(docs: DataFrame, idCol: String,
                      textCol: String): DataFrame = docs
    .select(col(idCol).as("doc_id"),
      explode(split(col(textCol), " ")).as("term"))
    .filter(length(col("term")) > 0)
    .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    // r13 note: measured a Sources.fanOut here as a 1.4-1.6× REGRESSION
    // across the tfidf/bm25 rows — whitespace tokenize is too cheap to
    // pay for the extra text-carrying exchange (fanOut pays off for
    // codec-grade per-row CPU only; see Sources.fanOut doc).
    // r14 note: a doc_id-keyed fanOut AFTER the explode (replacing the
    // aggregate's exchange via the subset rule, letting norm/doclen ride
    // the partitioning) measured as a regression too — tfidf_top1
    // 1.066→1.153 s, bm25_top1 0.869→1.117 s, capped anchor
    // 0.999→1.595 s (same-session 6-rep A/B): shuffling the raw token
    // STRINGS costs more than the partial-aggregated (doc, term, tf)
    // exchange it replaces. Both fanOut placements rejected on numbers.

  /** (term, df) document frequencies with the fan-out caps applied — the
    * ONE definition of the cap rule (fraction prune with a floor of 1,
    * then the absolute `maxDf` cut) that every retrieval path shares;
    * the spec-pinned 100 TB mitigation must not fork per scorer. */
  private def cappedDocFreq(tf: DataFrame, n: Long,
                            maxDfFraction: Double,
                            maxDf: Long): DataFrame =
    tf.groupBy("term").agg(count(lit(1)).as("df"))
      .filter(col("df") <=
        lit(math.min(maxDf, math.max(1L, (n * maxDfFraction).toLong))))

  /** Weights + norms over a precomputed [[termFrequencies]] frame; `n`
    * is the corpus document count. See [[postings]] for the knobs.
    *
    * @param dfOver optional frame to compute document frequencies from
    *               when it differs from `tf` — e.g. an instrument that
    *               builds postings for a BOUNDED doc slice but needs df
    *               (and therefore idf and the `maxDf` cut) taken against
    *               the FULL corpus, so the cap semantics under test are
    *               the at-scale ones (see AnchorQueries
    *               `tfidfCappedViolations`). Defaults to `tf`.
    */
  def postingsFromTf(tf: DataFrame, n: Long,
                     maxDfFraction: Double = 0.5,
                     maxDf: Long = Long.MaxValue,
                     dfOver: Option[DataFrame] = None): DataFrame = {
    val dfreq = cappedDocFreq(dfOver.getOrElse(tf), n, maxDfFraction, maxDf)
    val w = tf.join(dfreq, "term")
      .withColumn("w", col("tf") * log(lit(n.toDouble) / col("df")))
    val norm = w.groupBy("doc_id").agg(sqrt(sum(col("w") * col("w"))).as("norm"))
    // materialize: the postings feed BOTH sides of the similarity
    // self-join (probe + corpus), and w itself is referenced twice here —
    // without a barrier Catalyst re-derives the full explode+agg chain
    // per reference (~5 corpus scans in the top-1 plan)
    w.join(norm, "doc_id")
      .select(col("doc_id"), col("term"), (col("w") / col("norm")).as("u"))
      .localCheckpoint(true)
  }

  /** Unit-normalized TF-IDF postings: (doc_id, term, u).
    *
    * @param maxDfFraction drop terms in more than this fraction of the
    *                      corpus (stop-word prune)
    * @param maxDf         ABSOLUTE df cap — the 100 TB knob bounding the
    *                      similarity join's per-probe fan-out (see class
    *                      doc); default unbounded = exact postings
    */
  def postings(docs: DataFrame, idCol: String, textCol: String,
               maxDfFraction: Double = 0.5,
               maxDf: Long = Long.MaxValue): DataFrame = {
    val n = docs.count() // one scalar job; the only driver-side value
    postingsFromTf(termFrequencies(docs, idCol, textCol), n,
      maxDfFraction, maxDf)
  }

  /** Okapi BM25 top-1 retrieval: each probe document (its terms as the
    * query, term frequency as query weight) scores every corpus document
    * sharing at least one term through the same inverted-index join shape
    * as [[topSimilar]] — never all-pairs — and keeps the best match.
    *
    *   score(q,d) = Σ_t qtf(t) · idf(t) · tf(t,d)·(k1+1)
    *                              / (tf(t,d) + k1·(1−b+b·|d|/avgdl))
    *   idf(t)     = ln(1 + (N − df + 0.5)/(df + 0.5))   (Lucene form —
    *                never negative, unlike the classic log odds)
    *
    * BM25's saturation (k1) and length normalization (b) are what the
    * curation literature actually retrieves with when ranking corpus
    * documents against a quality prototype — TF-IDF cosine overweights
    * repeated terms and long documents. Same 100 TB shape as the cosine
    * path: one corpus scan for tf, two hash-aggs (df, doclen), a 1-row
    * broadcast for avgdl, bounded broadcast probes, and the same
    * `maxDfFraction`/`maxDf` fan-out caps applied to df BEFORE the join.
    * Ties break on the smaller neighbor id, deterministic cross-engine. */
  def bm25TopMatch(docs: DataFrame, idCol: String, textCol: String,
                   probeIds: Seq[Long], k1: Double = 1.2, b: Double = 0.75,
                   maxDfFraction: Double = 1.0,
                   maxDf: Long = Long.MaxValue): DataFrame = {
    val n = docs.count() // one scalar job; the only driver-side value
    val tf = termFrequencies(docs, idCol, textCol).localCheckpoint(true)
    val dfreq = cappedDocFreq(tf, n, maxDfFraction, maxDf)
    val dl = tf.groupBy("doc_id").agg(sum(col("tf")).as("dl"))
    val avgdl = dl.agg(avg(col("dl")).as("avgdl")) // 1 row, broadcast below
    val sat = tf.join(dfreq, "term").join(dl, "doc_id")
      .crossJoin(broadcast(avgdl))
      .select(col("doc_id"), col("term"),
        (log(lit(1.0) + (lit(n.toDouble) - col("df") + lit(0.5))
            / (col("df") + lit(0.5)))
          * col("tf") * lit(k1 + 1.0)
          / (col("tf") + lit(k1) * (lit(1.0 - b)
            + lit(b) * col("dl") / col("avgdl")))).as("s"))
    val probes = tf.filter(col("doc_id").isin(probeIds: _*))
      .select(col("doc_id").as("probe_id"), col("term"), col("tf").as("qtf"))
    val scores = broadcast(probes).join(sat, "term")
      .filter(col("probe_id") =!= col("doc_id"))
      .groupBy(col("probe_id"), col("doc_id").as("neighbor_id"))
      .agg(sum(col("qtf") * col("s")).as("score"))
    // rank on the 1e-6-rounded score: EXACT score ties (replicated docs —
    // a certainty in any deduplicating corpus) sum the same multiset of
    // doubles in different orders, so raw sums for tied neighbors differ
    // in the last ulp and the winner would be layout/engine-dependent;
    // rounding collapses ulp noise into the deterministic id tie-break
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(round(col("score"), 6).desc, col("neighbor_id").asc)
    scores.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("probe_id"), col("neighbor_id"),
        round(col("score"), 2).as("score"))
  }

  /** Top-1 most-similar corpus doc per probe doc, by TF-IDF cosine.
    * Probes and corpus share the postings frame; ties break on the
    * smaller neighbor id so the result is deterministic cross-engine.
    * Ranking uses the 1e-6-rounded cosine for the same reason as
    * [[bm25TopMatch]]: exactly-tied neighbors (replicated docs) sum the
    * same doubles in different orders, and the raw-ulp winner would be
    * layout- and engine-dependent. */
  def topSimilar(unit: DataFrame, probeIds: Seq[Long]): DataFrame = {
    val probes = unit.filter(col("doc_id").isin(probeIds: _*))
      .select(col("doc_id").as("probe_id"), col("term"), col("u").as("ua"))
    val corpus = unit
      .select(col("doc_id").as("neighbor_id"), col("term"), col("u").as("ub"))
    val sims = broadcast(probes).join(corpus, "term")
      .filter(col("probe_id") =!= col("neighbor_id"))
      .groupBy("probe_id", "neighbor_id")
      .agg(sum(col("ua") * col("ub")).as("cosine"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(round(col("cosine"), 6).desc, col("neighbor_id").asc)
    sims.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("probe_id"), col("neighbor_id"),
        round(col("cosine"), 2).as("cosine"))
  }
}
