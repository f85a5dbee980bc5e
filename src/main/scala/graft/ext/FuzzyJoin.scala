package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
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
    * join back to rows by value if row pairs are needed. */
  def selfJoin(df: DataFrame, valueCol: String, maxDist: Int,
               blockKey: Column => Column = firstTokenBlock): DataFrame = {
    require(maxDist >= 0, "maxDist must be non-negative")
    val vals = df.select(col(valueCol).as("a")).filter(col("a").isNotNull)
      .distinct()
      .withColumn("block", blockKey(col("a")))
    val right = vals.select(col("a").as("b"), col("block"))
    vals.join(right, Seq("block"))
      .filter(col("a") < col("b"))
      .withColumn("dist", levenshtein(col("a"), col("b")))
      .filter(col("dist") <= maxDist)
      .select(col("a"), col("b"), col("dist").cast("long").as("dist"))
  }
}
