package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Whale-safe sessionization.
  *
  * The classic gap-sessionize (`q_w_sessionize`) runs ONE window
  * partitioned by user — correct, but a whale key (a bot holding 20% of a
  * 100 TB stream) makes its partition irreducible: AQE cannot split a
  * window partition, so one task sorts the whale (the skew smoke's
  * documented windows ceiling, PERF_NOTES "Skew"). This is the engineered
  * escape hatch: shard the window by (user, TIME BUCKET) so no partition
  * exceeds one whale-day, then repair the bucket seams EXACTLY on a
  * bounded per-(user, bucket) boundary frame.
  *
  * Exactness argument: a session's consecutive events are ≤ gap apart, so
  * a session can only cross a bucket seam between the LAST event of one
  * active bucket and the FIRST event of the user's next active bucket.
  * Let k_b = local session count in bucket b and m_b ∈ {0,1} mark a seam
  * merge (first_ts(b) − last_ts(prev b) ≤ gap). The global session number
  * of local session j in bucket b is then
  *
  *   Σ_{b' < b} k_{b'} − Σ_{b' ≤ b} m_{b'} + j
  *
  * which equals the single-window numbering even when merges CASCADE
  * through single-session buckets (each merge reduces the global count by
  * exactly one; substituting j = 1 and m_b = 1 reproduces the previous
  * bucket's last number). The boundary frame holds one row per
  * (user, active bucket) — for a whale, days-not-events — so the stitch
  * windows are bounded at any stream size.
  */
object Sessionize {

  /** Gap-sessionize with bounded window partitions: session numbers are
    * IDENTICAL to the single-window form (same strict-`>` gap split, same
    * (ts, tie) ordering), but no window partition ever exceeds one
    * (user, bucket) cell. Output: input columns + `session_idx`.
    *
    * @param gapUs  session gap in microseconds (new session when the gap
    *               is strictly greater)
    * @param bucket time-bucket expression. Any granularity is CORRECT
    *               (the seam-merge cascade handles sessions spanning many
    *               buckets); the knob trades boundary-frame size (finer →
    *               more seam rows) against per-cell bound (coarser → a
    *               whale's cell grows). "day" suits a 30-minute gap.
    */
  def shardedSessions(df: DataFrame, userCol: String, tsCol: String,
                      tieCol: String, gapUs: Long = 1800000000L,
                      bucket: Column => Column =
                        date_trunc("day", _)): DataFrame = {
    val user = col(userCol)
    val ts = col(tsCol)

    // phase 1 feeds BOTH the seam-offset aggregate and the final join;
    // materialize it once (the simhashDedup `memb` idiom) — uncached, the
    // dominant corpus scan + per-cell window ran twice (the ~2× wall
    // overhead PERF_NOTES measured on the sharded form).
    val loc = localSessions(df, userCol, tsCol, tieCol, gapUs, bucket)
      .localCheckpoint(true)

    // phase 2: seam repair on the bounded (user, bucket) boundary frame.
    // This window DOES partition by the bare user key — safely: it runs
    // over the per-(user, bucket) aggregate, one row per active bucket,
    // so a whale contributes days-not-events rows.
    val wSeam = Window.partitionBy(user).orderBy(col("__bucket").asc)
    val offsets = loc.groupBy(user, col("__bucket"))
      .agg(min(ts).as("__first_ts"), max(ts).as("__last_ts"),
        max(col("__lsid")).as("__k"))
      .withColumn("__prev_last", lag(col("__last_ts"), 1).over(wSeam))
      .withColumn("__m", when(col("__prev_last").isNotNull &&
          unix_micros(col("__first_ts")) -
            unix_micros(col("__prev_last")) <= gapUs, 1L)
        .otherwise(0L))
      .withColumn("__koff", coalesce(sum(col("__k")).over(
        wSeam.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__moff", sum(col("__m")).over(
        wSeam.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(user, col("__bucket"),
        (col("__koff") - col("__moff")).as("__off"))

    loc.join(offsets, Seq(userCol, "__bucket"))
      .withColumn("session_idx", col("__lsid") + col("__off"))
      .drop("__bucket", "__ns", "__lsid", "__off")
  }

  /** Phase 1: local sessionize inside each (user, bucket) cell — the
    * corpus-scale pass, and the one whose windows must NEVER partition by
    * the bare user key (SessionizeSpec plan-asserts this frame directly;
    * `shardedSessions` checkpoints it, which truncates it out of the
    * final plan). Adds `__bucket`, `__ns`, `__lsid`. */
  private[ext] def localSessions(df: DataFrame, userCol: String,
                                 tsCol: String, tieCol: String,
                                 gapUs: Long,
                                 bucket: Column => Column): DataFrame = {
    val user = col(userCol)
    val ts = col(tsCol)
    val tie = col(tieCol)
    val wCell = Window.partitionBy(user, col("__bucket"))
      .orderBy(ts.asc, tie.asc)
    val gap = unix_micros(ts) - unix_micros(lag(ts, 1).over(wCell))
    df.withColumn("__bucket", bucket(ts))
      .withColumn("__ns", when(gap.isNull || gap > gapUs, 1L).otherwise(0L))
      .withColumn("__lsid", sum(col("__ns")).over(
        wCell.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }
}
