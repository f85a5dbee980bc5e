package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
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
}
