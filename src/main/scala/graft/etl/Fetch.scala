package graft.etl

import org.apache.spark.sql.DataFrame

/** S8 — fetch-to-driver ergonomics, the notebook's `pd.read_sql` /
  * `df.toPandas()` analogue (Fiddle F36/F52): a small, named, column-major
  * driver-side frame for probing and plotting.
  *
  * Scale guard: `collect()` on an unbounded frame is the classic driver
  * OOM; `frame` hard-caps rows (default 10k) and FAILS LOUDLY past the cap
  * instead of silently truncating — at 100 TB a probe that overflows the
  * cap is a bug in the probe, not a reason to stream the corpus to the
  * driver. The limit+1 trick detects overflow with one job and no count.
  */
object Fetch {

  final case class DriverFrame(columns: Seq[String], rows: Seq[Seq[Any]]) {
    def numRows: Int = rows.length

    /** One column as a driver-side vector (notebook `frame['col']`). */
    def column(name: String): Seq[Any] = {
      val i = columns.indexOf(name)
      require(i >= 0, s"no column '$name' in ${columns.mkString(", ")}")
      rows.map(_(i))
    }

    /** Rows as name→value maps (notebook `to_dict('records')`). */
    def records: Seq[Map[String, Any]] =
      rows.map(r => columns.zip(r).toMap)

    /** Plain-text table for println-debugging, `show()`-style. */
    def formatted(maxRows: Int = 20): String = {
      val shown = rows.take(maxRows).map(_.map(v => String.valueOf(v)))
      val widths = columns.indices.map { i =>
        (columns(i).length +: shown.map(_(i).length)).max
      }
      def line(vs: Seq[String]) =
        vs.zip(widths).map { case (v, w) => v.padTo(w, ' ') }.mkString(" | ")
      (line(columns) +: line(widths.map("-" * _)) +: shown.map(line))
        .mkString("\n")
    }
  }

  /** Collect up to `maxRows` rows; throws if the result exceeds the cap. */
  def frame(df: DataFrame, maxRows: Int = 10000): DriverFrame = {
    val collected = df.limit(maxRows + 1).collect()
    require(collected.length <= maxRows,
      s"Fetch.frame: result exceeds maxRows=$maxRows — aggregate or filter " +
        "before fetching to the driver (S8 is a probe, not a transfer path)")
    DriverFrame(df.columns.toSeq, collected.toSeq.map(_.toSeq))
  }
}
