package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Small-file compaction planning — the table-maintenance step every
  * long-lived 100 TB lake needs: group an ordered file manifest into
  * merge bins of ≈`targetBytes` so a rewrite job can coalesce thousands
  * of small files into scan-efficient ones without splitting the sort
  * order (the same cumulative-sum grouping Iceberg/Delta-style
  * `binPack` compactors apply to a sorted manifest).
  *
  * Scale shape: the input is FILE METADATA — |files| rows, never corpus
  * rows (a healthy 100 TB table is ~10⁵–10⁶ files) — so the one global
  * ordered window here is a single-partition pass over manifest-sized
  * data, the same bounded-input argument as `q_x_unigram_logprob`'s
  * vocab-total window. The assignment itself is pure arithmetic:
  * bin = (bytes cumulated BEFORE this file) div targetBytes — the
  * streaming first-fit rule, which overfills a bin by at most one file
  * and never reorders the manifest. Exact integers end-to-end.
  */
object Compaction {

  /** Plan merge bins over `files` ordered by `keyCol`. Output one row per
    * bin: (bin, n_files, bin_bytes, first_file, last_file). Bin ids are
    * the cum-bytes quotient, so a file larger than `targetBytes` consumes
    * several ids and bins need not be contiguous — callers treat `bin` as
    * an opaque group key. */
  def plan(files: DataFrame, keyCol: String, bytesCol: String,
           targetBytes: Long): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val before = Window.orderBy(col(keyCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    files
      .withColumn("cum_before",
        coalesce(sum(col(bytesCol)).over(before), lit(0L)))
      .withColumn("bin", expr(s"cum_before div ${targetBytes}L"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_files"),
        sum(col(bytesCol)).as("bin_bytes"),
        min(col(keyCol)).as("first_file"),
        max(col(keyCol)).as("last_file"))
  }
}
