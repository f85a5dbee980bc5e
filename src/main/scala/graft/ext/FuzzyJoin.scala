package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Blocked string-similarity self-join — the fuzzy-matching operator
  * entity-resolution pipelines need (dirty dimension keys, free-text
  * name reconciliation) and relational engines lack.
  *
  * Shape, in scale order:
  *  1. collapse to DISTINCT values — fuzzy joins run on the value
  *     domain, not the row domain (the reference's own J1 join keys,
  *     artist/title strings, have exactly this many-rows-few-values
  *     profile);
  *  2. candidates = pairs sharing a deterministic BLOCKING key (default:
  *     first whitespace token), so the quadratic verify is bounded per
  *     block — never all-pairs across the domain;
  *  3. verify = exact Levenshtein ≤ maxDist inside the pair join
  *     (codegen built-in, no UDF).
  *
  * Pairs whose members disagree on the blocking key are out of scope BY
  * CONTRACT — the same candidate-recall trade the MinHash/SimHash dedup
  * family documents (`Dedup.scala`); pick a blocking function with the
  * recall the use case needs (first token, length bucket, phonetic key).
  * Blocking keeps the construction deterministic, which is what lets the
  * oracle rebuild it cross-engine (unlike LSH buckets).
  */
object FuzzyJoin {

  /** First whitespace-delimited token — the default blocking key. */
  def firstTokenBlock(c: Column): Column = split(c, " ", 2).getItem(0)

  /** Distinct-value fuzzy self-join: (a, b, dist) with a < b, dist ≤
    * maxDist, both sharing `blockKey`. Output is value-domain pairs;
    * join back to rows by value if row pairs are needed.
    *
    * `maxBlock` caps the per-block quadratic: a degenerate blocking key
    * (every value sharing one first token) would square the whole domain
    * — the same failure mode `maxBucket` caps in Dedup and
    * `maxBinsPerInterval` in RangeJoin. Values in oversized blocks are
    * DROPPED from matching; never silently — pass `dropObservation` and
    * read `dropped_values` / `max_block_size` after the first action
    * (CollectMetrics rides the existing plan; `max_block_size` says what
    * to raise the cap to, or that the blocking key needs rethinking).
    * The observe node rides the LEFT side only: the self-join's right
    * side rebuilds the frame without it, because duplicating a named
    * CollectMetrics in one query is an analysis error. */
  def selfJoin(df: DataFrame, valueCol: String, maxDist: Int,
               blockKey: Column => Column = firstTokenBlock,
               maxBlock: Int = 1024,
               dropObservation: Option[Observation] = None): DataFrame = {
    require(maxDist >= 0, "maxDist must be non-negative")
    require(maxBlock > 1, "maxBlock must exceed 1")
    val counted = df.select(col(valueCol).as("a")).filter(col("a").isNotNull)
      .distinct()
      .withColumn("block", blockKey(col("a")))
      .withColumn("__bn", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("block"))))
    val observed = dropObservation.fold(counted)(o => counted.observe(o,
      sum(when(col("__bn") > maxBlock, 1L).otherwise(0L)).as("dropped_values"),
      max(col("__bn")).as("max_block_size")))
    val left = observed.filter(col("__bn") <= maxBlock).drop("__bn")
    val right = counted.filter(col("__bn") <= maxBlock)
      .select(col("a").as("b"), col("block"))
    left.join(right, Seq("block"))
      .filter(col("a") < col("b"))
      .withColumn("dist", levenshtein(col("a"), col("b")))
      .filter(col("dist") <= maxDist)
      .select(col("a"), col("b"), col("dist").cast("long").as("dist"))
  }
}
