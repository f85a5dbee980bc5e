package graft.etl

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{SaveMode, SparkSession}

/** Table maintenance — the background jobs a 100 TB parquet warehouse
  * cannot live without. The reference delegates these to Redshift
  * (auto-vacuum/analyze); on files we do them explicitly.
  */
object Maintenance {

  final case class CompactionReport(filesBefore: Long, filesAfter: Long,
                                    bytes: Long)

  /** Small-file compaction: streaming/incremental writers leave thousands
    * of KB-sized files per partition; every query then pays per-file open
    * + footer-parse + scheduling overhead (the classic small-file
    * problem). Rewrite the directory into ~`targetFileBytes` files:
    * read → coalesce(ceil(bytes/target)) → write aside → atomic-ish swap
    * (rename old out of the way, promote new, drop old). `coalesce`, not
    * `repartition`: compaction must not pay a shuffle, it only narrows
    * partitions.
    */
  def compact(spark: SparkSession, dir: String,
              targetFileBytes: Long = 128L * 1024 * 1024): CompactionReport = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)

    // Hive-partitioned layout (what writePartitionedIncremental produces):
    // recurse into each `col=value` subdirectory and compact it in place.
    // A flat rewrite of the root would silently FLATTEN the layout (the
    // partition column lives in the directory name, not the files) and
    // lose partition pruning. Per-leaf compaction preserves the layout,
    // stays shuffle-free, and sizes files per partition.
    val partDirs = fs.listStatus(path).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.contains("="))
    if (partDirs.nonEmpty) {
      val reports = partDirs.map(p =>
        compact(spark, p.getPath.toString, targetFileBytes))
      return CompactionReport(reports.map(_.filesBefore).sum,
        reports.map(_.filesAfter).sum, reports.map(_.bytes).sum)
    }

    val dataFiles = fs.listStatus(path).toSeq
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val totalBytes = dataFiles.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)

    val tmp = new Path(dir + "__compact_tmp")
    val old = new Path(dir + "__compact_old")
    spark.read.parquet(dir).coalesce(nOut)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    // swap: dir -> old, tmp -> dir, drop old. Not transactional (a table
    // format like Iceberg/Delta makes it so); the old copy survives any
    // mid-swap crash for manual recovery.
    if (fs.exists(old)) fs.delete(old, true)
    if (!fs.rename(path, old))
      throw new java.io.IOException(s"compact: could not move $dir aside")
    if (!fs.rename(tmp, path)) {
      fs.rename(old, path) // roll back
      throw new java.io.IOException(s"compact: could not promote $tmp")
    }
    fs.delete(old, true)

    val after = fs.listStatus(path).toSeq
      .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    CompactionReport(dataFiles.size.toLong, after.toLong, totalBytes)
  }
}
