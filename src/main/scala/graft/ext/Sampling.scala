package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sampling and split assignment for training-data pipelines.
  *
  * The core requirement is DETERMINISM across runs, engines, and
  * repartitions: a document's train/val/test assignment must never depend
  * on partition layout, RNG seeds, or engine hash functions (Spark's
  * xxhash64 and DuckDB's hash disagree; `rand(seed)` depends on row
  * order). md5 of the id is bit-identical everywhere, so bucketing on its
  * hex digits gives portable, stable assignment — re-verifiable outside
  * the JVM. Map-only: at 100 TB the split adds zero shuffles.
  */
object Sampling {

  /** 16-bucket value (0-15) from the first hex digit of md5(id). */
  def md5Bucket(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 1), 16, 10).cast("int")

  /** Deterministic train/val/test assignment: buckets 0-13 → train
    * (87.5%), 14 → val, 15 → test (6.25% each). Stable under reruns,
    * engine changes, and data reordering. */
  def deterministicSplit(df: DataFrame, idCol: String): DataFrame =
    df.withColumn("split",
      when(md5Bucket(col(idCol)) <= 13, "train")
        .when(md5Bucket(col(idCol)) === 14, "val")
        .otherwise("test"))

  /** Deterministic ~rate sample: keep rows whose 4-hex-digit md5 prefix
    * (0-65535) falls under rate. Finer-grained than md5Bucket; same
    * portability. */
  def deterministicSample(df: DataFrame, idCol: String,
                          rate: Double): DataFrame = {
    require(rate >= 0 && rate <= 1, s"rate $rate outside [0,1]")
    val h = conv(substring(md5(col(idCol).cast("string")), 1, 4), 16, 10)
      .cast("long")
    df.filter(h < lit((rate * 65536).toLong))
  }

  /** Stratified sampling by a column (per-stratum rates) — the seeded
    * Bernoulli path for when statistical (not deterministic) sampling is
    * wanted; thin wrapper documenting the tradeoff vs deterministicSample. */
  def stratified(df: DataFrame, strataCol: String,
                 rates: Map[String, Double], seed: Long): DataFrame =
    df.stat.sampleBy(strataCol, rates, seed)

  /** Integer shard (0 .. 16^hexDigits-1) from the leading hex digits of
    * md5(id). Same portability story as [[md5Bucket]]; wider digit counts
    * give more shards for bigger corpora. */
  def md5Shard(id: Column, hexDigits: Int): Column =
    conv(substring(md5(id.cast("string")), 1, hexDigits), 16, 10).cast("int")

  /** Deterministic GLOBAL shuffle position for every row — the "shuffle the
    * corpus once, reproducibly" step before training-data serialization.
    *
    * A naive `row_number() OVER (ORDER BY md5(id))` is a single-partition
    * window — the whole corpus funnels through one task. Instead the rank
    * is computed hierarchically, the way it scales to 100 TB:
    *  1. shard every row by the md5 prefix (uniform by construction);
    *  2. rank WITHIN each shard (parallel window, one shuffle);
    *  3. offset each shard by the running total of preceding shard counts
    *     (a ≤`16^hexDigits`-row aggregate — broadcast back).
    * The result is exactly the global md5-order rank, with no global sort
    * and no single-partition stage on the corpus.
    *
    * Output adds `shard`, `shard_rank` (1-based within shard) and `pos`
    * (1-based global). */
  def shufflePositions(df: DataFrame, idCol: String,
                       hexDigits: Int = 2): DataFrame = {
    val key = md5(col(idCol).cast("string"))
    val sharded = df
      .withColumn("__shuffle_key", key)
      .withColumn("shard", md5Shard(col(idCol), hexDigits).cast("long"))
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("__shuffle_key"), col(idCol))
    val ranked = sharded
      .withColumn("shard_rank", row_number().over(w).cast("long"))
    val offsets = sharded.groupBy(col("shard"))
      .agg(count(lit(1)).as("__n"))
      .select(col("shard"),
        coalesce(sum(col("__n")).over(
            Window.orderBy(col("shard"))
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
          .as("__offset"))
    ranked.join(broadcast(offsets), Seq("shard"))
      .withColumn("pos", col("__offset") + col("shard_rank"))
      .drop("__shuffle_key", "__offset")
  }

  /** Deterministic per-domain quota: keep the `quota` docs with the lowest
    * md5 rank inside each domain — the "cap any one source at N documents"
    * balancing step. Exact and portable; the per-domain window means the
    * largest domain bounds the sort partition, so use this when domain
    * sizes are bounded (or pre-shard giant domains) — for unbounded skew
    * see [[domainQuotaExact]] (exact, heap-aggregated) or
    * [[domainRateCap]] (approximate). Adds `quota_rank` and `kept`
    * (0/1); unlike those two it keeps every input row, so the REJECTED
    * side is queryable too. */
  def domainQuota(df: DataFrame, idCol: String, domainCol: String,
                  quota: Int): DataFrame = {
    val w = Window.partitionBy(col(domainCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("quota_rank", row_number().over(w).cast("long"))
      .withColumn("kept",
        when(col("quota_rank") <= quota, 1L).otherwise(0L))
  }

  /** Exact AND skew-proof per-domain quota — closes the gap the two ops
    * above leave open: [[domainQuota]] is exact but its window sorts the
    * whole domain in one partition (a whale domain = one whale task);
    * [[domainRateCap]] is whale-proof but binomial-approximate. Here the
    * per-domain selection is a bounded-heap aggregate
    * ([[graft.functions.TopKAgg]], same machinery as the ANN top-k):
    * each map task keeps at most `quota` candidates per domain and
    * aggregates PARTIALLY, so the exchange carries ≤ |domains|·quota·
    * |tasks| rows regardless of domain skew — a 10¹⁰-row domain costs
    * the same shuffle as a 10³-row one, and the result is exactly the
    * `quota` lowest-md5-rank docs.
    *
    * Order key: the first 13 hex digits of md5(id) as a 52-bit integer
    * (exact in the heap's double score; fixed-width lowercase hex means
    * numeric order = lexicographic order, so a SQL oracle can reproduce
    * it with `ORDER BY substring(md5(id),1,13), id`), ties on id asc —
    * deterministic and engine-portable like every sampling op here. The
    * 13-digit prefix differs from [[domainQuota]]'s full-hex sort key
    * only when two ids collide in 52 bits AND the id tiebreak would
    * order them differently than digits 14-32 — immaterial for
    * selection, and the id tiebreak makes it deterministic regardless.
    *
    * Memory bound: one `quota`-element heap (16 B/entry) per domain per
    * task buffer — sized for quotas up to ~10⁶ (16 MB); past that, use
    * [[domainRateCap]] or shard first. Output: kept docs only —
    * (domain, quota_rank 1..quota, id), rank in md5 order. */
  def domainQuotaExact(df: DataFrame, idCol: String, domainCol: String,
                       quota: Int): DataFrame = {
    require(quota > 0, s"quota $quota must be positive")
    // 52-bit md5 prefix; negated because the heap keeps HIGHEST scores
    // (ties → lowest id), so lowest-hash-first selection falls out.
    val h = conv(substring(md5(col(idCol).cast("string")), 1, 13), 16, 10)
      .cast("double")
    df.select(col(domainCol), col(idCol), (-h).as("__s"))
      .groupBy(col(domainCol))
      .agg(graft.functions.TopKAgg
        .topk_by_score(col("__s"), col(idCol), quota).as("__top"))
      .select(col(domainCol), posexplode(col("__top")).as(Seq("__r0", "__e")))
      .select(col(domainCol),
        (col("__r0") + 1).cast("long").as("quota_rank"),
        col("__e.neighbor_id").as(idCol))
  }

  /** Mixture upsampling — the per-source epoch weighting step of a
    * pretraining data recipe: a doc with weight w is replicated
    * floor(w) times plus one more when its md5 fraction falls under
    * frac(w), so a source weighted 2.5 contributes each doc 2–3 times
    * (expected 2.5 epochs) and one weighted 0.75 keeps 75% of docs once.
    * Deterministic per doc (same portability as [[deterministicSplit]]),
    * map-only + a bounded ≤⌈w⌉-wide explode: zero shuffles at 100 TB.
    * Output: one row per (doc, copy_idx ∈ 1..n_copies). */
  def mixtureUpsample(df: DataFrame, idCol: String,
                      weight: Column): DataFrame = {
    val u = conv(substring(md5(col(idCol).cast("string")), 1, 4), 16, 10)
      .cast("double") / 65536.0
    val n = (floor(weight) +
      when(u < weight - floor(weight), 1.0).otherwise(0.0)).cast("long")
    df.withColumn("n_copies", n)
      .filter(col("n_copies") > 0)
      // n_copies >= 1 here, so sequence() is ascending by construction
      // (Spark's sequence(1, 0) would yield the DESCENDING [1, 0])
      .withColumn("copy_idx",
        explode(sequence(lit(1L), col("n_copies"))))
  }

  /** Skew-proof approximate quota: compute per-domain counts (a tiny
    * aggregate), derive a keep-rate `min(1, quota/n)` per domain, and keep
    * rows whose 4-hex md5 prefix falls under the rate — i.e.
    * [[deterministicSample]] with a per-domain rate. No per-domain sort, no
    * giant window partitions: a domain with 10^10 rows costs the same two
    * map passes as one with 10^2. Kept counts are binomial around the
    * quota rather than exact — the standard trade at corpus scale. */
  def domainRateCap(df: DataFrame, idCol: String, domainCol: String,
                    quota: Int): DataFrame = {
    val counts = df.groupBy(col(domainCol))
      .agg(count(lit(1)).as("__dn"))
    val h = conv(substring(md5(col(idCol).cast("string")), 1, 4), 16, 10)
      .cast("long")
    df.join(broadcast(counts), Seq(domainCol))
      .withColumn("kept",
        when(h < least(lit(1.0), lit(quota.toDouble) / col("__dn"))
          * 65536.0, 1L).otherwise(0L))
      .drop("__dn")
  }

  /** Temperature-reweighted domain sampling — the p^α mixture-flattening
    * step of a pretraining data recipe (α < 1 upsamples tail domains
    * relative to their natural share; α = 1 is proportional, α = 0
    * uniform-per-domain). Domain d with n_d docs gets a target allocation
    * ∝ n_d^α, materialized by deterministic largest-remainder rounding so
    * the targets sum EXACTLY to `targetN`, then filled with the domain's
    * lowest-md5-rank docs (the same engine-portable order every sampling
    * op here uses).
    *
    * Cross-engine exactness: after the one α-power, every step is exact
    * integer arithmetic — weights are quantized to round(w·10⁶) longs,
    * targets come from `div`/`%` in DECIMAL(38,0) (Spark) / HUGEINT
    * (DuckDB) against the weight sum, and remainder ties break on domain
    * name — so two engines agree bit-for-bit. The wide types matter at
    * the scale this operator targets: w·targetN in long arithmetic wraps
    * once quantized weights meet targets in the millions (the same
    * overflow class q_x_event_anomaly's z² test guards against); 38
    * digits cover any physical corpus (w ≤ 10⁶·n_d^α ≤ 10¹⁹ at 10¹³
    * docs, × targetN ≤ 10¹³ → 10³² ≪ 10³⁸). α = 0.5 (the common
    * "square-root sampling") uses `sqrt`, which IEEE 754 requires to be
    * correctly rounded in every implementation; other α go through
    * `pow`, where the last ulp is libm-dependent (the 10⁶ quantization
    * absorbs it except on exact .5 boundaries — vanishingly unlikely, and
    * why the ORACLED configuration is α = 0.5).
    *
    * 100 TB shape: one hash-agg for counts; the allocation windows run on
    * the |domains|-row aggregate (bounded, like the anomaly stats frame);
    * selection is a per-domain window rank — no global sort. A domain
    * with n_d < target keeps all its rows; the shortfall is visible
    * (target_n vs samp_rank) rather than silently rebalanced, which would
    * make every domain's allocation data-dependent on every other's.
    *
    * Output: one row per input doc with `samp_rank` (md5 order within
    * domain), `target_n` (the domain's allocation), `kept` (0/1). */
  def temperatureSample(df: DataFrame, idCol: String, domainCol: String,
                        alpha: Double, targetN: Long): DataFrame = {
    require(alpha >= 0.0 && targetN >= 0, "alpha and targetN must be >= 0")
    val wExpr =
      if (alpha == 0.5) sqrt(col("__n_d").cast("double"))
      else pow(col("__n_d").cast("double"), lit(alpha))
    // Overflow guard: pow(n_d, alpha)·10⁶ can exceed double range for
    // large alpha, and a non-ANSI cast of ±Inf/NaN to long SILENTLY
    // saturates — corrupting the weight ordering with no error. Quantized
    // weights must land in [0, 9.2e18) (long range with margin) or the
    // job fails loudly. Never fires for sane (alpha, corpus) pairs.
    val wGuard = (q: Column) =>
      when(q.isNotNull && q >= 0 && q < lit(9.2e18), q.cast("long"))
        .otherwise(raise_error(concat(
          lit("temperatureSample: quantized weight out of long range for domain "),
          col(domainCol).cast("string"))).cast("long"))
    val whole = Window.partitionBy() // bounded: |domains| rows
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val alloc = df.groupBy(col(domainCol))
      .agg(count(lit(1)).as("__n_d"))
      .withColumn("__w", wGuard(round(wExpr * 1e6)))
      .withColumn("__denom",
        sum(col("__w").cast("decimal(38,0)")).over(whole))
      .withColumn("__num", col("__w").cast("decimal(38,0)") * targetN)
      .withColumn("__base", expr("__num div __denom")) // IntegralDivide → long
      .withColumn("__rem", col("__num") % col("__denom"))
      .withColumn("__deficit", lit(targetN) - sum(col("__base")).over(whole))
      .withColumn("__fr", row_number().over(
        Window.orderBy(col("__rem").desc, col(domainCol).asc)))
      .withColumn("target_n",
        (col("__base") + when(col("__fr") <= col("__deficit"), 1L)
          .otherwise(0L)).cast("long"))
      .select(col(domainCol), col("target_n"))
    val rank = Window.partitionBy(col(domainCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.join(broadcast(alloc), Seq(domainCol))
      .withColumn("samp_rank", row_number().over(rank).cast("long"))
      .withColumn("kept",
        when(col("samp_rank") <= col("target_n"), 1L).otherwise(0L))
  }

  /** Leakage-safe train/val/test split — assignment at the duplicate-
    * CLUSTER level, so no two copies (or near-copies) of a document ever
    * straddle splits: with per-doc assignment, a train doc's duplicate in
    * the validation set silently leaks training data into eval. The input
    * is any clustered frame `(id, clusterCol)` — [[graft.ext.Dedup.exact]]
    * / [[graft.ext.Dedup.exactByHash]] / [[graft.ext.Dedup.minhash]]
    * clusters all fit — and the split is [[deterministicSplit]]'s md5
    * bucketing applied to the CLUSTER id, inherited by every member.
    * Same portability guarantees as the per-doc split (pure md5, engine-
    * and layout-independent); map-only over the clustered frame, so it
    * adds zero shuffles beyond whatever clustering produced the input.
    *
    * Output: the input frame + `split`, every cluster wholly inside one
    * split. */
  def leakageSafeSplit(clustered: DataFrame,
                       clusterCol: String = "cluster_id"): DataFrame =
    clustered.withColumn("split",
      when(md5Bucket(col(clusterCol)) <= 13, "train")
        .when(md5Bucket(col(clusterCol)) === 14, "val")
        .otherwise("test"))

  /** Exact token-budget selection — "take the best documents until the
    * token budget is spent", the final cut of a curation pipeline sizing a
    * training set to a target token count. Documents are ordered by
    * (quality score DESC, id ASC) and the MAXIMAL PREFIX whose cumulative
    * token count fits `budgetTokens` is kept (take-while: the first doc
    * that would overflow is excluded along with everything after it, even
    * if a later smaller doc would still fit). Token counts are
    * `len(split(text, ' '))` and the score is the integer basis-point
    * [[graft.ext.TextAnalysis.qualityScoreBp]] — both engine-portable, so
    * the selection is reproducible bit-for-bit from plain SQL.
    *
    * The semantics are a global ordered cumulative sum, but the engine
    * never sorts the corpus. Three-level exact refinement, each level a
    * histogram-sized computation:
    *   1. per-SCORE token histogram (≤ 10 001 rows — the score range) →
    *      cumulative in score-descending order → boundary score s* (the
    *      first that overflows) and its remaining budget; scores above s*
    *      are fully in.
    *   2. within s*: per-ID-RANGE histogram (shard = id >> `shardShift`,
    *      arithmetic shift — contiguous 2^shift-wide id ranges preserve
    *      id order) → boundary shard b* and its remaining budget.
    *   3. within (s*, b*): one window over ≤ 2^shardShift docs (dense
    *      ids; sparse ids only make the cell smaller) picks the exact
    *      take-while cut.
    * The histogram windows run on single partitions of histogram size,
    * never corpus size; each level's boundary is a single row (two longs)
    * collected to the driver — the bounded-collect pattern of
    * [[graft.ext.Similarity]]'s centroid training — so the final
    * selection is a pure map filter with literal thresholds, no join.
    * The (id, tokens, score) projection — ~24 B/row, text dropped — is
    * materialized once (localCheckpoint, the repo's multiply-consumed-
    * frame convention), so the corpus TEXT is scanned and scored exactly
    * once; the four level passes run against the tiny projection.
    *
    * Output: (idCol, n_tokens, quality_score_bp) of selected docs. */
  def tokenBudgetSelect(df: DataFrame, idCol: String, textCol: String,
                        budgetTokens: Long, shardShift: Int = 12): DataFrame = {
    require(budgetTokens >= 0, "budget must be >= 0")
    require(shardShift >= 0 && shardShift < 63, "shardShift out of range")
    val scored = df.select(col(idCol),
      size(split(col(textCol), " ", -1)).cast("long").as("n_tokens"),
      TextAnalysis.qualityScoreBp(col(textCol)).as("quality_score_bp"))
      .localCheckpoint(true) // one text scan; levels run on 24 B/row
    // level 1: score histogram, cumulative by score descending
    val wScore = Window.orderBy(col("__s").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val scoreCum = scored.groupBy(col("quality_score_bp").as("__s"))
      .agg(sum(col("n_tokens")).as("__tok"))
      .withColumn("__cum", sum(col("__tok")).over(wScore))
    // boundary = first overflowing score in DESC order = max such score;
    // max(struct) carries its remaining budget along. Empty filter (the
    // whole corpus fits) → null → sentinel MinValue selects everything.
    // One row, two longs — collected, not joined.
    val thr1 = scoreCum.filter(col("__cum") > budgetTokens)
      .agg(max(struct(col("__s"),
        (lit(budgetTokens) - col("__cum") + col("__tok")).as("__r"))).as("__b"))
      .select(
        coalesce(col("__b.__s"), lit(Long.MinValue)).as("__s_star"),
        coalesce(col("__b.__r"), lit(0L)).as("__r_star"))
      .head()
    val (sStar, rStar) = (thr1.getLong(0), thr1.getLong(1))
    val sharded = scored
      .withColumn("__shard", shiftright(col(idCol), shardShift))
    // level 2: id-range histogram inside the boundary score
    val wShard = Window.orderBy(col("__shard").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val shardCum = sharded
      .filter(col("quality_score_bp") === sStar)
      .groupBy(col("__shard"))
      .agg(sum(col("n_tokens")).as("__tok"))
      .withColumn("__cum", sum(col("__tok")).over(wShard))
    // guaranteed non-empty when s* exists (s* overflows by construction)
    val thr2 = shardCum.filter(col("__cum") > rStar)
      .agg(min(struct(col("__shard"),
        (lit(rStar) - col("__cum") + col("__tok")).as("__r2"))).as("__b"))
      .select(
        coalesce(col("__b.__shard"), lit(Long.MinValue)).as("__b_star"),
        coalesce(col("__b.__r2"), lit(0L)).as("__r2_star"))
      .head()
    val (bStar, r2Star) = (thr2.getLong(0), thr2.getLong(1))
    // fully-selected region: above the boundary score, or boundary score
    // in an id range strictly before the boundary range — a map filter
    // over literal thresholds
    val base = sharded.filter(col("quality_score_bp") > sStar ||
      (col("quality_score_bp") === sStar && col("__shard") < bStar))
    // level 3: exact cut inside the boundary cell (≤ 2^shardShift rows —
    // the one window whose partition is data, and it is shift-bounded)
    val wCell = Window.orderBy(col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val cell = sharded
      .filter(col("quality_score_bp") === sStar && col("__shard") === bStar)
      .withColumn("__cum", sum(col("n_tokens")).over(wCell))
      .filter(col("__cum") <= r2Star)
    val out = Seq(col(idCol), col("n_tokens"), col("quality_score_bp"))
    base.select(out: _*).unionByName(cell.select(out: _*))
  }

  /** Deterministic weighted sampling WITHOUT replacement (Efraimidis-
    * Spirakis, "Weighted random sampling with a reservoir", IPL 2006):
    * each row gets key uᵢ^(1/wᵢ) with uᵢ uniform, and the k largest keys
    * are exactly a weight-proportional without-replacement sample. Here
    * uᵢ is the 48-bit md5 prefix of the id — the repo's portable,
    * layout-independent uniform — so the sample is reproducible across
    * runs AND engines, and the ranking uses the monotone ln(uᵢ)/wᵢ
    * transform (no pow, one log).
    *
    * Scale shape: map-only key computation + `orderBy(...).limit(k)` =
    * TakeOrderedAndProject — a per-partition bounded heap, never a global
    * sort. At 100 TB this moves k rows per partition to the driver-side
    * merge, nothing else. Ties (md5 prefix collisions) break by id.
    *
    * Output: the input columns of the k selected rows. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     k: Int): DataFrame = {
    require(k >= 0, s"k $k must be >= 0")
    // u in (0,1): (h + 0.5) / 2^48 where h is the first 12 md5 hex digits
    val h = conv(substring(md5(col(idCol).cast("string")), 1, 12), 16, 10)
      .cast("double")
    val key = log((h + lit(0.5)) / lit(Math.pow(2.0, 48))) /
      col(weightCol).cast("double")
    df.withColumn("__es_key", key)
      .orderBy(col("__es_key").desc, col(idCol).asc)
      .limit(k)
      .drop("__es_key")
  }

  /** Per-domain weighted sampling without replacement — [[weightedSample]]
    * stratified by a domain column, SKEW-PROOF: selection is the same
    * bounded-heap aggregate as [[domainQuotaExact]] (each map task keeps
    * ≤ k candidates per domain and aggregates partially), so the exchange
    * carries ≤ |domains|·k·|tasks| rows and a whale domain costs the same
    * shuffle as a tiny one — the window formulation (`row_number OVER
    * (PARTITION BY domain ORDER BY key DESC)`) would sort the whole whale
    * domain in one task. The Efraimidis-Spirakis key makes the k kept
    * rows per domain an exact weight-proportional without-replacement
    * sample, deterministic across engines.
    *
    * Output: (domainCol, sample_rank 1..k best-first, idCol). */
  def weightedSamplePerDomain(df: DataFrame, idCol: String,
                              domainCol: String, weightCol: String,
                              k: Int): DataFrame = {
    require(k > 0, s"k $k must be positive")
    val h = conv(substring(md5(col(idCol).cast("string")), 1, 12), 16, 10)
      .cast("double")
    val key = log((h + lit(0.5)) / lit(Math.pow(2.0, 48))) /
      col(weightCol).cast("double")
    df.select(col(domainCol), col(idCol), key.as("__s"))
      .groupBy(col(domainCol))
      .agg(graft.functions.TopKAgg
        .topk_by_score(col("__s"), col(idCol), k).as("__top"))
      .select(col(domainCol), posexplode(col("__top")).as(Seq("__r0", "__e")))
      .select(col(domainCol),
        (col("__r0") + 1).cast("long").as("sample_rank"),
        col("__e.neighbor_id").as(idCol))
  }
}
