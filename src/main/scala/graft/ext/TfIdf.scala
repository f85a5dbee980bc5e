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
    val dfreq = dfOver.getOrElse(tf)
      .groupBy("term").agg(count(lit(1)).as("df"))
      .filter(col("df") <=
        lit(math.min(maxDf, math.max(1L, (n * maxDfFraction).toLong))))
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

  /** Top-1 most-similar corpus doc per probe doc, by TF-IDF cosine.
    * Probes and corpus share the postings frame; ties break on the
    * smaller neighbor id so the result is deterministic cross-engine. */
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
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    sims.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("probe_id"), col("neighbor_id"),
        round(col("cosine"), 2).as("cosine"))
  }
}
