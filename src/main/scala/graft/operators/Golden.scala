package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Golden-snapshot determinism pins for the rows-only queries.
  *
  * Three catalog queries emit values no DuckDB oracle can re-derive —
  * `q_x_image_phash` / `q_x_multimodal_features` (JVM codec outputs) and
  * `q_x_kmeans_sizes` (engine-specific centroid values). Each already has
  * a green invariant anchor (hash drift bounds, schema/format invariants,
  * argmax-optimality), but invariants alone don't pin CROSS-RUN
  * DETERMINISM: a codec or init change that moved every value while
  * preserving the invariants would be driver-invisible. These anchors
  * close that: the canonical output fingerprint at each committed scale
  * factor is recorded in [[GoldenSnapshots]], and the anchor recomputes
  * it and emits violation rows on any drift — a driver-visible 0-row
  * oracle like every other anchor.
  *
  * The fingerprint is layout- and order-independent by construction:
  * per-row xxhash64 over the U+0001-joined string form of every column
  * (all three queries emit only integral/string columns — no
  * float-formatting hazard), combined with an exact DECIMAL(38,0) sum
  * (partial-aggregation order can't matter; |h| < 2⁶³ per row keeps even
  * a 10¹³-row corpus ~12 digits below the 38-digit ceiling, and ANSI
  * mode would throw on a wrapping long sum) plus the row count.
  * Snapshots are keyed by the testdata dir's basename (row counts
  * collide: sf0.001 and sf0.01 both hold 500 docs/embeddings), so the
  * anchors pin every committed SF and go vacuous (not red) on synthetic
  * smoke corpora, whose dirs carry other names; refresh via
  * `graft.tools.GoldenDumpMain` after an INTENDED output-affecting
  * change (or a driver-side testdata regeneration).
  */
object Golden {

  /** One-row (n, hsum) canonical fingerprint of a result frame; `hsum`
    * is the decimal sum rendered as a string. NULL cells encode as a
    * distinct U+0000 sentinel before the U+0001 join: `concat_ws` SKIPS
    * null arguments, so without the coalesce two rows differing only in
    * WHICH column is null (e.g. the null grouping columns of rollup/cube
    * results fingerprinted by ScaleSmokeMain xcheck/spill) would hash
    * identically and mask real drift. Null-free rows hash exactly as
    * before, so committed [[GoldenSnapshots]] stay valid. */
  def fingerprint(df: DataFrame): DataFrame = df
    .select(xxhash64(concat_ws("\u0001",
      df.columns.map(c =>
        coalesce(col(c).cast("string"), lit("\u0000"))): _*)).as("__h"))
    .agg(count(lit(1)).cast("long").as("n"),
      coalesce(sum(col("__h").cast("decimal(38,0)")),
        lit(0).cast("decimal(38,0)")).cast("string").as("hsum"))

  /** Violation rows (reason, got, want) when `result`'s fingerprint
    * drifts from the committed snapshot for this corpus key; empty when
    * it matches, or when the key names no committed corpus (smoke dirs
    * replicate the tables to sizes with no golden record). */
  def violations(result: DataFrame, sfDir: String,
                 expected: Map[String, (Long, String)]): DataFrame = {
    val fp = fingerprint(result)
    val key = new java.io.File(sfDir).getName
    expected.get(key) match {
      case None =>
        fp.filter(lit(false))
          .select(lit("uncommitted_corpus").as("reason"),
            lit("").as("got"), lit("").as("want"))
      case Some((en, eh)) =>
        fp.select(explode(array(
            struct(lit("row_count").as("reason"),
              col("n").cast("string").as("got"),
              lit(en).cast("string").as("want")),
            struct(lit("row_hash_sum").as("reason"),
              col("hsum").as("got"), lit(eh).as("want")))).as("v"))
          .select(col("v.reason"), col("v.got"), col("v.want"))
          .filter(col("got") =!= col("want"))
    }
  }
}
