package graft.tools

import org.apache.spark.sql.DataFrame

/** Interior-plan capture for the optimization evidence trail.
  *
  * Several operators eagerly materialize (localCheckpoint / driver probes)
  * mid-construction, so the frame a query RETURNS is a degenerate
  * `LocalTableScan` / `Scan ExistingRDD` and `explain` on it proves nothing
  * about the work — the r13 verdict flagged exactly this for the q-digest /
  * assoc-rules / dsir dumps. Operators call [[trace]] on the interesting
  * interior frames right BEFORE materializing them; outside a capture the
  * call is a ThreadLocal read and a no-op (Bench/Verify pay nothing), and
  * inside [[PlanDumpMain]]'s capture the formatted plan of the frame as it
  * is about to execute is appended to the dump.
  */
object PlanTrace {
  private val sink = new ThreadLocal[StringBuilder]()

  /** Record `df`'s formatted physical plan under `label` when a capture is
    * active on this thread; no-op otherwise. */
  def trace(label: String, df: DataFrame): Unit = {
    val sb = sink.get()
    if (sb != null) {
      sb.append(s"\n== Interior plan: $label ==\n")
      sb.append(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
  }

  /** Run `f` with interior-plan capture active on this thread; returns
    * (result, captured text — empty when nothing traced). */
  def capture[T](f: => T): (T, String) = {
    val sb = new StringBuilder
    sink.set(sb)
    try { val r = f; (r, sb.toString) } finally sink.remove()
  }
}
