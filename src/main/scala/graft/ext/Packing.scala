package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining: documents are laid out in a
  * deterministic order and sliced into fixed token-budget training
  * sequences ("concat-and-chunk" — the standard pretraining layout, where
  * a document may straddle two adjacent sequences).
  *
  * Packing is per-SHARD: each md5-prefix shard is packed independently, so
  * every window partition is corpus/|shards| and no global cumulative sum
  * exists anywhere — the same hierarchical discipline as
  * [[Sampling.shufflePositions]]. Real pipelines pack per output file/shard
  * for exactly this reason.
  */
object Packing {

  /** Assign every document its training-sequence index.
    *
    * Within each shard, documents are ordered by (md5(id), id); the
    * running token total before a document determines the sequence it
    * STARTS in: `seq = floor(prev_cum / budget)`. `straddles` flags
    * documents whose tail crosses into the next sequence. All arithmetic
    * is integer counts + one double division of small magnitudes —
    * bit-identical in any engine.
    *
    * Output: id, shard, n_tok, seq (0-based within shard), straddles (0/1).
    */
  def packSequences(df: DataFrame, idCol: String, tokenCount: Column,
                    budget: Int, hexDigits: Int = 1,
                    extraPartitionCols: Seq[String] = Nil): DataFrame = {
    require(budget > 0, s"budget $budget must be positive")
    val key = md5(col(idCol).cast("string"))
    val extra = extraPartitionCols.map(col)
    val w = Window.partitionBy(extra :+ col("shard"): _*)
      .orderBy(col("__pack_key"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(idCol) +: extra ++: Seq(
        tokenCount.cast("long").as("n_tok"),
        key.as("__pack_key"),
        Sampling.md5Shard(col(idCol), hexDigits).cast("long").as("shard")): _*)
      .withColumn("__cum", sum(col("n_tok")).over(w))
      .select(col(idCol) +: extra ++: Seq(
        col("shard"), col("n_tok"),
        floor((col("__cum") - col("n_tok")) * 1.0 / budget).cast("long")
          .as("seq"),
        when(floor((col("__cum") - 1) * 1.0 / budget) >
            floor((col("__cum") - col("n_tok")) * 1.0 / budget), 1L)
          .otherwise(0L).as("straddles")): _*)
  }
}
