package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextExprs._

/** Benchmark decontamination — the n-gram overlap removal every serious
  * training-data pipeline runs before a corpus ships (the standard recipe:
  * drop any training document sharing a word n-gram with an evaluation
  * set; n = 8..13 in the published pipelines).
  *
  * Two shapes:
  *  - `exact`: explode doc grams, broadcast-semi-join against the probe
  *    gram set, anti-join the contaminated ids back. The corpus never
  *    shuffles (grams meet the broadcast in the map stage; only the small
  *    contaminated-id set moves). Deterministic → DuckDB-oracle-able.
  *  - `bloom`: build a Bloom filter of probe gram hashes (distributed
  *    treeAggregate via DataFrameStatFunctions), ship it into a codegen
  *    membership probe, filter map-only. ZERO joins and zero corpus
  *    shuffle — the 100 TB shape when even the exploded-gram broadcast
  *    probe is too hot. False positives (rate `fpp`) over-remove
  *    harmlessly; false negatives cannot occur, so the decontamination
  *    guarantee holds.
  *
  * Gram construction is `sorted_shingles` (distinct word-n-gram hashes,
  * TextHashing): documents shorter than n tokens contribute their whole
  * text as one gram — i.e. short texts are matched exactly.
  */
object Decontaminate {

  private def gramCol(textCol: String, n: Int): Column =
    sorted_shingles(col(textCol), n)

  /** Exact decontamination: `docs` minus every row sharing an n-gram with
    * `probes`. */
  def exact(docs: DataFrame, probes: DataFrame, idCol: String,
            textCol: String, n: Int = 8): DataFrame = {
    val probeGrams = probes
      .select(explode(gramCol(textCol, n)).as("__g")).distinct()
    val docGrams = docs
      .select(col(idCol), explode(gramCol(textCol, n)).as("__g"))
    val contaminated = docGrams
      .join(broadcast(probeGrams), Seq("__g"), "left_semi")
      .select(col(idCol)).distinct()
    docs.join(contaminated, Seq(idCol), "left_anti")
  }

  /** Bloom decontamination: map-only filter against a sketch of the probe
    * grams. `expectedGrams` sizes the filter (overestimate freely — memory
    * is ~1.2 bytes/item at fpp 0.001). */
  def bloom(docs: DataFrame, probes: DataFrame, idCol: String,
            textCol: String, n: Int = 8, expectedGrams: Long = 1000000L,
            fpp: Double = 0.001): DataFrame = {
    require(expectedGrams > 0 && fpp > 0 && fpp < 1, "bad bloom parameters")
    val bf = probes.select(explode(gramCol(textCol, n)).as("__g"))
      .stat.bloomFilter("__g", expectedGrams, fpp)
    // one projection materializes the gram array; the filter's exists()
    // lambda then probes the ATTRIBUTE (no re-shingling per element — the
    // HOF re-evaluation trap)
    docs.withColumn("__sh", gramCol(textCol, n))
      .filter(!exists(col("__sh"), g => bloom_contains(g, bf)))
      .drop("__sh")
  }

  /** SEMANTIC decontamination — the paraphrase-robust companion to the
    * n-gram shapes above: drop every corpus row whose EMBEDDING sits
    * within `threshold` cosine of any probe (benchmark) vector, catching
    * reworded eval contamination that shares no n-gram with the source.
    *
    * Exact form: the probe set (benchmark suites — thousands of vectors,
    * not corpus-scale) broadcasts; the corpus streams once through a
    * codegen cosine + left-anti. No corpus shuffle. DuckDB-oracle-able
    * (list_cosine_similarity). */
  def semanticExact(corpus: DataFrame, probes: DataFrame, idCol: String,
                    vecCol: String, threshold: Double = 0.9): DataFrame = {
    val flagged = corpus
      .join(broadcast(probes.select(col(vecCol).as("__pv"))), lit(true))
      .filter(cosine_sim(col(vecCol), col("__pv")) >= threshold)
      .select(col(idCol)).distinct()
    corpus.join(flagged, Seq(idCol), "left_anti")
  }

  /** Semantic decontamination at 100 TB: when even one cosine per
    * (corpus row × probe) is too hot, bucket BOTH sides with a
    * multi-table hyperplane LSH and evaluate cosine only for bucket
    * mates — the corpus pays one map-only sketch pass plus an equi-join
    * on (table, bucket) against the (small) exploded probe side, never
    * an all-pairs pass. Sound by construction: every removal still
    * passes the exact cosine test, so removed(lsh) ⊆ removed(exact) —
    * anchored driver-visibly by `q_x_decontaminate_semantic_anchor`.
    * Recall follows the standard LSH-forest curve (1−(1−p^nPlanes)^
    * nTables, p = 1−arccos(cos)/π); near-duplicate contamination at
    * cos ≳ 0.9 is retrieved with probability ≈ 1 at the defaults. */
  def semanticLsh(corpus: DataFrame, probes: DataFrame, idCol: String,
                  vecCol: String, threshold: Double = 0.9,
                  nPlanes: Int = 8, nTables: Int = 8,
                  seed: Long = 42L): DataFrame = {
    def tableBuckets(vec: Column): Column = array((0 until nTables).map { t =>
      struct(lit(t).as("tbl"),
        hyperplane_bucket(vec, nPlanes, seed + t * 7919L).as("bucket"))
    }: _*)
    val probeB = probes.select(col(vecCol).as("__pv"),
        explode(tableBuckets(col(vecCol))).as("tb"))
      .select(col("__pv"), col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
      .dropDuplicates("tbl", "bucket", "__pv")
    val corpusB = corpus.select(col(idCol), col(vecCol),
        explode(tableBuckets(col(vecCol))).as("tb"))
      .select(col(idCol), col(vecCol),
        col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
    val flagged = corpusB.join(broadcast(probeB), Seq("tbl", "bucket"))
      .filter(cosine_sim(col(vecCol), col("__pv")) >= threshold)
      .select(col(idCol)).distinct()
    corpus.join(flagged, Seq(idCol), "left_anti")
  }

  /** N-gram novelty scoring — the inverse reading of decontamination: how
    * much of each document is NOT already covered by a reference slice
    * (memorization-risk / novelty audit: a doc whose grams the reference
    * corpus mostly contains adds little new signal and inflates
    * repetition). Per non-reference document: its distinct-gram count,
    * how many of those grams the reference slice contains, and
    * novelty_bp = floor(10000·(n_grams − n_known)/n_grams).
    *
    * Scale shape: the same gram-join skeleton as [[exact]] — grams are
    * 64-bit shingle hashes (8 B each, never gram STRINGS, on the
    * exchange), the reference gram set joins by hash (AQE broadcasts a
    * benchmark-sized reference; a corpus-sized one degrades to a shuffle
    * join, still linear), and the per-doc aggregate is map-side
    * combined. For a reference too big to join at all, swap the
    * membership join for [[bloom]]'s sketch — identical scoring, ±FPP.
    * Docs with no tokens produce no gram rows and drop out, as in the
    * dedup family. */
  /** The map-only scale path for [[noveltyScore]]: reference grams fold
    * into a Bloom sketch (one pass, ~1.2 B/gram at fpp 0.001), and
    * scoring becomes a single corpus pass probing the broadcast sketch
    * per gram — no membership JOIN at all, the [[bloom]] shape applied
    * to counting instead of filtering. `n_known_est` can only OVERCOUNT
    * (Bloom filters have no false negatives), so `novelty_bp_est` is a
    * certified LOWER bound on true novelty — the safe direction for a
    * keep-the-novel selection policy; the overshoot is fpp-bounded and
    * the q_x_novelty_bloom_anchor pins both properties against the
    * exact operator. */
  def noveltyScoreBloom(docs: DataFrame, idCol: String, textCol: String,
                        isRef: Column, n: Int = 3,
                        expectedGrams: Long = 1000000L,
                        fpp: Double = 0.01): DataFrame = {
    require(expectedGrams > 0 && fpp > 0 && fpp < 1, "bad bloom parameters")
    val bf = docs.filter(isRef)
      .select(explode(gramCol(textCol, n)).as("__g"))
      .stat.bloomFilter("__g", expectedGrams, fpp)
    docs.filter(!isRef)
      .withColumn("__sh", gramCol(textCol, n))
      .select(col(idCol), size(col("__sh")).cast("long").as("n_grams"),
        size(filter(col("__sh"), g => bloom_contains(g, bf)))
          .cast("long").as("n_known_est"))
      .filter(col("n_grams") > 0)
      .withColumn("novelty_bp_est",
        floor(lit(10000.0) * (col("n_grams") - col("n_known_est"))
          .cast("double") / col("n_grams").cast("double")).cast("long"))
  }

  def noveltyScore(docs: DataFrame, idCol: String, textCol: String,
                   isRef: Column, n: Int = 3): DataFrame = {
    val grams = docs.select(col(idCol), isRef.as("__is_ref"),
      explode(gramCol(textCol, n)).as("__g"))
    val ref = grams.filter(col("__is_ref")).select(col("__g")).distinct()
    grams.filter(!col("__is_ref"))
      .join(ref.withColumn("__known", lit(1L)), Seq("__g"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("__known"), lit(0L))).as("n_known"))
      .select(col(idCol), col("n_grams"), col("n_known"),
        floor(lit(10000.0) * (col("n_grams") - col("n_known")).cast("double")
          / col("n_grams").cast("double")).cast("long").as("novelty_bp"))
  }
}
