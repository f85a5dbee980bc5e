package graft.ext

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Range join (point-in-interval) — Spark turns a pure inequality join
  * condition into BroadcastNestedLoopJoin/CartesianProduct: per-key
  * quadratic, a scale killer. This operator uses the standard BINNING
  * reduction instead: quantize the time axis into `binSeconds` buckets,
  * explode each interval into the bins it covers, map each point to its
  * single bin, then EQUI-join on (keys…, bin) and post-filter exact
  * containment. Shuffle payload is rows × (covered bins), the join is a
  * hash join, and a point lands in exactly one bin so no dedup pass is
  * needed.
  *
  * Pick `binSeconds` near the typical interval length: bins too fine
  * multiply the exploded interval rows; too coarse degrades the equi-join
  * into the post-filter. Either way the plan stays hash-join-shaped.
  */
object RangeJoin {

  /** Inner-join points to intervals `[start, end)` sharing `keys` (may be
    * empty for a keyless/global range join). Output: every (point,
    * covering interval) pair, point columns first.
    *
    * `maxBinsPerInterval` bounds the explode: a pathological interval (a
    * year-long window against 1-second bins) would otherwise fabricate
    * millions of rows from ONE input row — the same failure mode
    * `maxBucket` caps in Dedup. Intervals covering more bins are DROPPED
    * (they match nothing); pick binSeconds near the typical interval
    * length so real intervals sit at a handful of bins, and raise the cap
    * deliberately if genuinely-long intervals must join.
    *
    * Dropping data must never be silent: pass `dropObservation` and read
    * `dropped_intervals` / `max_interval_bins` from it after the first
    * action on the result — zero extra jobs (Spark's CollectMetrics rides
    * the existing plan), works identically on a cluster (unlike an
    * accumulator read mid-plan). `max_interval_bins` tells callers how far
    * above the cap their data sits, i.e. what to raise it to. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointTs: String, startCol: String, endCol: String,
                      keys: Seq[String] = Nil,
                      binSeconds: Long = 3600L,
                      maxBinsPerInterval: Long = 4096L,
                      dropObservation: Option[Observation] = None): DataFrame = {
    require(binSeconds > 0, "binSeconds must be positive")
    require(maxBinsPerInterval > 0, "maxBinsPerInterval must be positive")
    val binUs = binSeconds * 1000000L
    // exactly representable micros arithmetic; end is exclusive so the
    // last covered bin is floor((end-1µs)/bin)
    val p = points.withColumn("__bin",
      floor(unix_micros(col(pointTs)) / binUs))
    val firstBin = floor(unix_micros(col(startCol)) / binUs)
    val lastBin = floor((unix_micros(col(endCol)) - 1) / binUs)
    val valid = intervals
      // empty/inverted intervals match nothing (and Spark's sequence()
      // would otherwise run DESCENDING for them, fabricating bins)
      .filter(col(endCol) > col(startCol))
      .withColumn("__nbins", lastBin - firstBin + lit(1L))
    val observed = dropObservation.fold(valid)(o => valid.observe(o,
      sum(when(col("__nbins") > maxBinsPerInterval, 1L).otherwise(0L))
        .as("dropped_intervals"),
      max(col("__nbins")).as("max_interval_bins")))
    val i = observed
      .filter(col("__nbins") <= maxBinsPerInterval)
      .drop("__nbins")
      .withColumn("__bin", explode(sequence(firstBin, lastBin)))
    p.join(i, keys :+ "__bin")
      .filter(unix_micros(col(pointTs)) >= unix_micros(col(startCol)) &&
        unix_micros(col(pointTs)) < unix_micros(col(endCol)))
      .drop("__bin")
  }
}
