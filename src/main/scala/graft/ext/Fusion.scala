package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Reciprocal-rank fusion (Cormack, Clarke & Büttcher 2009, "Reciprocal
  * rank fusion outperforms Condorcet and individual rank learning
  * methods", SIGIR) — the standard way a retrieval pipeline combines
  * rankings from heterogeneous retrievers (dense embedding top-k, lexical
  * BM25/overlap top-k, recency, ...) without score calibration: each list
  * contributes 1/(k + rank) for the items it ranked, summed across lists;
  * k (=60 in the paper and everywhere since) damps the head so one
  * retriever's #1 can't dominate three retrievers' #3s.
  *
  * Exactness: the fused score here is `rrf_micros = Σ ⌊10⁶/(k + rank)⌋`
  * — INTEGER summation (the [[graft.operators.ExactMoney]] discipline),
  * so the fusion is associative, layout-independent, and reproducible by
  * any engine with integer division, unlike a float Σ 1/(k+r) whose
  * value depends on summation order once ≥3 lists fuse. At 10⁶ scaling
  * the floor loses nothing that matters: adjacent ranks differ by
  * ≥ 10⁶/(k+r)² ≫ 1 for any practical k + top-K.
  *
  * Scale shape: input lists are top-K per query by construction (each
  * retriever already bounded its output — the bruteForceTopK /
  * bounded-probe contract), so the fusion frame is |queries|·|lists|·K
  * rows: one hash aggregate on (query, item) with map-side combine, then
  * the bounded TopKAgg heap per query — at most `topN` rows per query per
  * map task enter the final exchange. Nothing corpus-sized moves. */
object Fusion {

  /** Fuse per-query rankings from multiple retrievers.
    *
    * @param rankings one row per (query, item, rank) per list — pass the
    *                 UNION of the retrievers' top-K outputs; rank is
    *                 1-based within its list
    * @return (queryCol, fused_rank, itemCol, rrf_micros, n_lists) —
    *         topN rows per query, ordered by (rrf_micros desc, item asc);
    *         n_lists = how many input lists ranked the item */
  def reciprocalRankFusion(rankings: DataFrame, queryCol: String,
                           itemCol: String, rankCol: String,
                           kRrf: Int = 60, topN: Int = 10): DataFrame = {
    require(kRrf >= 1, s"kRrf $kRrf must be >= 1")
    require(topN >= 1, s"topN $topN must be >= 1")
    // TopKAgg carries item ids as Long internally; fail at the API
    // boundary (not with a ClassCastException deep inside the aggregate)
    // for non-integral item columns, and widen narrow integrals here so
    // every downstream reference sees one type.
    val itemType = rankings.schema(itemCol).dataType
    val integral = itemType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    require(integral,
      s"itemCol '$itemCol' must be an integral id column (TopKAgg " +
        s"carries ids as long); got $itemType — map string/struct ids " +
        "to a dense long surrogate upstream")
    val scored = rankings
      .withColumn(itemCol, col(itemCol).cast("long"))
      .groupBy(col(queryCol), col(itemCol))
      .agg(
        sum(floor(lit(1000000L) / (lit(kRrf.toLong) + col(rankCol))))
          .cast("long").as("rrf_micros"),
        count(lit(1)).as("n_lists"))
    // Bounded-heap fused rank (the Similarity.topK idiom): partial
    // aggregation ships at most topN candidates per query per map task —
    // a row_number window would shuffle+sort the whole fused frame.
    // rrf_micros < 2^53 so the double-scored heap is exact; heap ties
    // break by item ascending, matching row_number(score desc, item).
    val fused = scored
      .groupBy(col(queryCol))
      .agg(graft.functions.TopKAgg
        .topk_by_score(col("rrf_micros").cast("double"),
          col(itemCol), topN).as("top"))
      .select(col(queryCol), posexplode(col("top")).as(Seq("r0", "s")))
      .select(col(queryCol),
        (col("r0") + 1).cast("long").as("fused_rank"),
        col("s.neighbor_id").as(itemCol),
        col("s.cos").cast("long").as("rrf_micros"))
    fused.join(
        scored.select(col(queryCol), col(itemCol), col("n_lists")),
        Seq(queryCol, itemCol))
      .select(col(queryCol), col("fused_rank"), col(itemCol),
        col("rrf_micros"), col("n_lists"))
  }
}
