package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket association rules — the classic warehouse co-purchase
  * analysis (Agrawal/Srikant-style support–confidence–lift over item
  * pairs), built exact: every emitted statistic is a ratio of integer
  * counts divided once at the end, so the output is layout- and
  * engine-independent.
  *
  * Pair generation is a self-join of the distinct (basket, item) table
  * keyed by basket — fan-out is bounded by the basket SIZE, not the
  * corpus, so the whale hazard here is a single enormous basket (one
  * order with 10⁶ items would emit 5·10¹¹ pairs from one join key).
  * `maxBasket` is that guardrail, the `maxBucket`/`maxBlock` idiom:
  * baskets larger than the cap are excluded from the analysis entirely
  * (denominator included — the mined rules stay internally consistent
  * over the kept population), and the caller can audit exclusions with
  * [[oversized]]. The gate corpus tops out at 13 items per basket, far
  * under the default cap, so gate rows measure the uncapped semantics.
  *
  * Scale shape (100 TB): one distinct exchange on (basket, item), two
  * hash aggregates (basket sizes, item supports), the basket-keyed pair
  * self-join (≤ maxBasket² rows per basket), and the (a, b) pair
  * aggregate — all linear in the pair volume; no windows, no global
  * sort, no driver state.
  */
object MarketBasket {

  /** Baskets excluded by the cap, with their sizes — the audit frame. */
  def oversized(items: DataFrame, basketCol: String, itemCol: String,
                maxBasket: Int = 64): DataFrame =
    items.select(col(basketCol).as("basket"), col(itemCol).as("item"))
      .distinct()
      .groupBy(col("basket")).agg(count(lit(1)).as("basket_size"))
      .filter(col("basket_size") > maxBasket)

  /** Undirected item-pair rules with exact support, both directional
    * confidences, and lift, over baskets of 2..maxBasket distinct items
    * (plus singleton baskets in the denominator).
    *
    * Output: (item_a, item_b, n_pair, n_a, n_b, support, conf_a_b,
    * conf_b_a, lift) for pairs co-occurring in >= minPairCount baskets;
    * item_a < item_b. All ratios are exact-integer divisions rounded to
    * 6 decimals.
    */
  def associationRules(
      items: DataFrame,
      basketCol: String,
      itemCol: String,
      minPairCount: Long,
      maxBasket: Int = 64): DataFrame = {
    val b0 = graft.sources.Sources.fanOut(
        items.select(col(basketCol).as("basket"), col(itemCol).as("item")),
        col("basket"))
      .distinct()
    val kept = b0
      .groupBy(col("basket")).agg(count(lit(1)).as("sz"))
      .filter(col("sz") <= maxBasket)
    // The kept (basket, item) table feeds FOUR consumers (both pair-join
    // sides, item supports, the basket-universe count); without a
    // materialization each re-runs the scan+distinct+size-join subtree —
    // measured 5.1 s -> 1.4 s at sf0.1. Materialize via persist+count,
    // NOT localCheckpoint: a checkpoint erases plan statistics, and with
    // no stats Catalyst judged this table broadcastable at ANY size —
    // at sf1 it broadcast all ~6M rows into both pair-join sides (29.6 s
    // measured, and a driver OOM at 100 TB). The counted InMemoryRelation
    // carries exact sizeInBytes, so join planning stays size-aware:
    // broadcast while the basket table is small, shuffled hash join once
    // it isn't.
    val b = b0.join(kept.select(col("basket")), "basket")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    b.count()
    // one tiny frame: the kept-basket universe size (support denominator).
    // r13: derived from the CACHED kept-item table — `kept.agg(count)`
    // re-ran the whole scan→distinct→size-aggregate pipeline from
    // scratch inside the rules plan (the cache boundary hides `kept`'s
    // subtree from exchange reuse), i.e. one extra corpus pass for one
    // scalar. Every kept basket has ≥ 1 item row in `b`, so
    // count(DISTINCT basket) over `b` is the same integer.
    val n = b.agg(countDistinct(col("basket")).as("n_baskets"))
    val itemCnt = b.groupBy(col("item")).agg(count(lit(1)).as("c"))
    val pa = b.select(col("basket"), col("item").as("item_a"))
    val pb = b.select(col("basket"), col("item").as("item_b"))
    val pairs = pa.join(pb,
        pa("basket") === pb("basket") && col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minPairCount)
    // r13: lift products in DOUBLE, not DECIMAL(38,0). Counts are exact
    // doubles below 2^53, and one double multiply of two exact values is
    // the correctly-rounded true product — bit-identical to the old
    // exact-decimal-product-then-cast (and to DuckDB's HUGEINT product
    // cast to DOUBLE), without a BigDecimal multiply per rule row.
    val rules = pairs
      .join(itemCnt.select(col("item").as("item_a"), col("c").as("n_a")), "item_a")
      .join(itemCnt.select(col("item").as("item_b"), col("c").as("n_b")), "item_b")
      .crossJoin(broadcast(n))
      .select(
        col("item_a"), col("item_b"), col("n_pair"), col("n_a"), col("n_b"),
        round(col("n_pair").cast("double") / col("n_baskets"), 6).as("support"),
        round(col("n_pair").cast("double") / col("n_a"), 6).as("conf_a_b"),
        round(col("n_pair").cast("double") / col("n_b"), 6).as("conf_b_a"),
        round((col("n_pair").cast("double") * col("n_baskets").cast("double")) /
          (col("n_a").cast("double") * col("n_b").cast("double")), 6).as("lift"))
    // The rule set is minPairCount-thresholded and therefore far smaller
    // than the basket table; materialize it eagerly (ContextCleaner-
    // reclaimed localCheckpoint) so the corpus-scale `b` cache can drop
    // now — CacheManager would otherwise pin it for the session lifetime
    // of any library caller outside the Bench/Verify cache sweep.
    try rules.localCheckpoint(true)
    finally b.unpersist(blocking = false)
  }
}
