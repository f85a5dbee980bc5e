package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.etl.Maintenance

/** Continuous MERGE: the streaming CDC-apply pattern. Each micro-batch of
  * keyed, versioned change rows is applied to a parquet table as a
  * versioned upsert ([[Maintenance.mergeUpsert]] — greatest version wins,
  * stale updates can't clobber newer rows).
  *
  * Delivery is foreachBatch's checkpointed at-least-once: a replayed batch
  * re-merges the same (key, version) rows, and greatest-version-wins makes
  * that a no-op — so the sink is effectively exactly-once on table CONTENT
  * without a transactional format. Within one batch the latest version per
  * key is pre-selected (mergeUpsert leaves intra-side duplicates
  * undefined).
  *
  * At 100 TB the same composition holds per partition: route each batch
  * through writePartitionedIncremental-style pruning so only touched
  * partitions rewrite; the MERGE semantics stay identical.
  */
object UpsertSink {

  /** Latest version per key within one micro-batch (ties broken by the
    * remaining columns' struct order for determinism). */
  private[streaming] def latestPerKey(batch: DataFrame, key: String,
                                      versionCol: String): DataFrame = {
    val tiebreak = struct(
      batch.columns.filterNot(c => c == key || c == versionCol)
        .map(col).toIndexedSeq: _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col(versionCol).desc, tiebreak.desc)
    batch.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Start the sink: `updates` (a streaming frame whose schema matches the
    * table at `tableDir`) merges into the table every micro-batch. */
  def start(updates: DataFrame, tableDir: String, key: String,
            versionCol: String, checkpointDir: String): StreamingQuery =
    updates.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          Maintenance.mergeUpsert(batch.sparkSession, tableDir,
            latestPerKey(batch, key, versionCol), key, versionCol)
        }
        ()
      }
      .start()
}
