package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge learning — the tokenizer-induction stage of
  * an LLM data pipeline (Sennrich et al. 2016, "Neural Machine
  * Translation of Rare Words with Subword Units").
  *
  * The scale trick is classic BPE's own: merges are learned over the
  * DISTINCT-WORD frequency table, not the token stream. One corpus scan
  * builds (word, count); every one of the k merge rounds then touches
  * only the vocab-sized word table — pair counting is a weighted
  * explode + hash-agg with map-side partials, the argmax pair comes to
  * the driver via a bounded top-1 (never the pair table), and the merge
  * applies as a map-only higher-order-function fold (no UDF, no
  * shuffle). Plan depth is reset with a localCheckpoint each round, so
  * k rounds cost k vocab passes, not a k-deep nested plan.
  */
object Bpe {

  /** One corpus scan → (word, n) weighted vocabulary. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(filter(split(col(textCol), " ", -1),
        t => t =!= lit(""))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))

  /** Split a word into single-character symbols. */
  private def charSymbols(word: Column): Column =
    filter(split(word, "", -1), s => s =!= lit(""))

  /** Adjacent symbol pairs of `syms`, weighted by `n`: one row per
    * (a, b, n) occurrence, ready for a weighted count. */
  private def explodePairs(df: DataFrame): DataFrame =
    df.filter(size(col("syms")) >= 2)
      .select(col("n"), explode(zip_with(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1),
          (a, b) => struct(a.as("a"), b.as("b")))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"), col("n"))

  /** Replace non-overlapping left-to-right occurrences of (a, b) with the
    * merged symbol — the BPE merge step as a pure fold over the symbol
    * array (aggregate HOF: accumulator = (output, carry)). The merged
    * symbol cannot re-merge within the same pass (non-overlapping
    * semantics: "a a a" under (a,a) → ["aa", "a"]). */
  private def mergeStep(syms: Column, a: String, b: String): Column = {
    val zero = struct(
      array().cast("array<string>").as("out"),
      lit(null).cast("string").as("carry"))
    aggregate(
      syms,
      zero,
      (acc, s) => {
        val out = acc.getField("out")
        val carry = acc.getField("carry")
        val isMerge = carry === lit(a) && s === lit(b)
        struct(
          when(isMerge, concat(out, array(lit(a + b))))
            .otherwise(when(carry.isNull, out)
              .otherwise(concat(out, array(carry)))).as("out"),
          when(isMerge, lit(null).cast("string")).otherwise(s).as("carry"))
      },
      acc => when(acc.getField("carry").isNull, acc.getField("out"))
        .otherwise(concat(acc.getField("out"), array(acc.getField("carry")))))
  }

  /** Round-0 pair statistics over the weighted vocabulary — the exact
    * frame the first merge argmaxes over; exposed for the oracle-checked
    * query surface. */
  def pairCounts(words: DataFrame): DataFrame =
    explodePairs(words.select(col("word"),
        charSymbols(col("word")).as("syms"), col("n")))
      .groupBy(col("a"), col("b")).agg(sum(col("n")).as("cnt"))

  /** Learn `k` merges. Returns the ordered merge list and the final
    * symbolized vocabulary (word, syms, n). Deterministic: the argmax
    * pair tiebreaks on (count desc, a asc, b asc). Stops early when no
    * pair occurs at least `minCount` times. */
  def learnMerges(words: DataFrame, k: Int, minCount: Long = 2)
      : (Seq[(String, String)], DataFrame) = {
    require(k >= 0, "k must be non-negative")
    // LAZY checkpoints: each round's argmax job materializes the current
    // syms frame as a side effect (truncating its lineage), so a round
    // costs exactly ONE Spark job — the eager-checkpoint form paid a
    // second stop-the-world job per round just to materialize the merge.
    // The previous frame is unpersisted only AFTER the argmax job runs:
    // before that job the new frame's plan still reads the old frame's
    // blocks (a lazy localCheckpoint truncates lineage at first
    // materialization, not at creation).
    var syms = words.select(col("word"), charSymbols(col("word")).as("syms"),
      col("n")).localCheckpoint(false)
    var prev: DataFrame = null
    val merges = Seq.newBuilder[(String, String)]
    var round = 0
    var done = false
    while (round < k && !done) {
      // TakeOrderedAndProject: per-partition top-1 partials, single job,
      // never the full pair table on the driver
      val top = explodePairs(syms)
        .groupBy(col("a"), col("b")).agg(sum(col("n")).as("cnt"))
        .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      if (prev != null) { prev.unpersist(blocking = false); prev = null }
      if (top.isEmpty || top.head.getLong(2) < minCount) done = true
      else {
        val (a, b) = (top.head.getString(0), top.head.getString(1))
        merges += ((a, b))
        val next = syms.select(col("word"),
          mergeStep(col("syms"), a, b).as("syms"), col("n"))
          .localCheckpoint(false)
        prev = syms
        syms = next
      }
      round += 1
    }
    // `prev` (if any) must stay cached here: the returned syms frame is
    // still lazy and reads prev's blocks until the caller's first action
    // materializes it. One vocab-sized frame outliving the loop is the
    // price of the one-job rounds.
    (merges.result(), syms)
  }

  /** Tokenize text with a learned merge list: per-word char split, then
    * the merges applied in learned order. Map-only (the merge list rides
    * into the plan as literals); words explode and re-assemble per doc. */
  def applyMerges(docs: DataFrame, idCol: String, textCol: String,
                  merges: Seq[(String, String)]): DataFrame = {
    val pieces = docs
      .select(col(idCol), posexplode(filter(split(col(textCol), " ", -1),
        t => t =!= lit(""))).as(Seq("word_pos", "word")))
    val sym = merges.foldLeft(charSymbols(col("word"))) {
      case (c, (a, b)) => mergeStep(c, a, b)
    }
    // materialize the k-deep fold ONCE, derive the count off the column —
    // two copies of the HOF chain in one projection would each pay the
    // full O(k·|word|) fold (no subexpression elimination across lambdas)
    pieces.select(col(idCol), col("word_pos"), col("word"),
        sym.as("pieces"))
      .withColumn("n_pieces", size(col("pieces")).cast("long"))
  }
}
