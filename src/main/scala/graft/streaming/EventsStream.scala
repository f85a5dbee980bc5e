package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming variant of the events pipeline (SURVEY.md §7.2.7 —
  * a capability extension; the reference is batch-only). The same transforms
  * the batch surface runs (filter → time derivation → windowed agg) expressed
  * over an unbounded source:
  *
  *   readStream(parquet dir) → withWatermark → window agg → sink
  *
  * plus a stateful per-user session aggregator via mapGroupsWithState.
  *
  * Scale shape: the windowed agg is a streaming hash-aggregate whose state is
  * bounded by the watermark horizon × |group keys|; the session state store
  * is keyed by user — both shard across executors by groupBy key, identical
  * to the batch shuffle layout.
  */
object EventsStream {

  /** Raw schema of the streaming source: events parquet with ts as
    * NANOSECOND int64 (the testdata's physical type — see Sources.table for
    * the batch-side handling). */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // nanos (legacy.parquet.nanosAsLong)
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Open the unbounded events source over a directory of parquet files,
    * converting nano-longs to Spark timestamps. */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream
      .schema(rawSchema)
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Event-time windowed aggregation with a watermark: count + sum(value)
    * per (window, event_type). Late data beyond `watermark` is dropped and
    * its state evicted — the property that keeps state bounded on an
    * unbounded stream. */
  def windowedCounts(events: DataFrame,
                     windowLen: String = "1 hour",
                     watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  final case class EventIn(event_id: Long, ts: java.sql.Timestamp,
                           user_id: Long, event_type: String, value: Double)
  final case class UserSession(user_id: Long, n_events: Long,
                               total_value: Double, last_type: String)

  /** Stateful per-user running session stats via mapGroupsWithState:
    * arbitrary state (count, value sum, last event type) maintained per key
    * across micro-batches. */
  def sessionStats(events: DataFrame): Dataset[UserSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .as[EventIn]
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserSession, UserSession](
        GroupStateTimeout.NoTimeout) {
        case (userId, batch, state: GroupState[UserSession]) =>
          val prev = state.getOption
            .getOrElse(UserSession(userId, 0L, 0.0, ""))
          val evs = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          val next = UserSession(
            userId,
            prev.n_events + evs.size,
            prev.total_value + evs.map(_.value).sum,
            if (evs.nonEmpty) evs.last.event_type else prev.last_type)
          state.update(next)
          next
      }
  }
}
