package graft.etl

import scala.collection.mutable

import org.apache.hadoop.fs.Path
import org.apache.parquet.column.statistics.Statistics
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession

/** ANALYZE for a parquet table — the other half of the Redshift
  * maintenance pair the reference delegates (auto-vacuum = `Maintenance.
  * compact`, auto-analyze = this). Reads ONLY file footers: row counts,
  * sizes, and per-column min/max/null statistics come from parquet
  * metadata, so analyzing a 100 TB table costs one small read per file,
  * not a data scan. The same min/max stats are what scan pruning uses —
  * the report doubles as a "will my filter skip files?" diagnostic.
  */
object Analyze {

  final case class ColumnStats(column: String, nullCount: Long,
                               min: Option[String], max: Option[String])
  final case class TableStats(files: Long, rows: Long, compressedBytes: Long,
                              uncompressedBytes: Long,
                              columns: Seq[ColumnStats])

  // mergeStatistics' self-referential Java bound (T <: Comparable[T]) can't
  // be named from a wildcard in Scala; both sides are the SAME runtime
  // primitive-type stats, so an erased cast is safe
  private def mergeInto(acc: Statistics[_], other: Statistics[_]): Unit =
    acc.asInstanceOf[Statistics[java.lang.Long]]
      .mergeStatistics(other.asInstanceOf[Statistics[java.lang.Long]])

  /** Footer-only table statistics; recurses through Hive-partition
    * subdirectories (partition-path columns don't appear — they live in
    * directory names, not footers). */
  def analyze(spark: SparkSession, dir: String): TableStats = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)

    def parquetFiles(p: Path): Seq[Path] = {
      val entries = fs.listStatus(p).toSeq
      entries.filter(e => e.isFile && e.getPath.getName.endsWith(".parquet"))
        .map(_.getPath) ++
        entries.filter(_.isDirectory).flatMap(d => parquetFiles(d.getPath))
    }

    var files = 0L
    var rows = 0L
    var compressed = 0L
    var uncompressed = 0L
    val nulls = mutable.LinkedHashMap[String, Long]()
    val merged = mutable.LinkedHashMap[String, Statistics[_]]()

    parquetFiles(root).foreach { file =>
      files += 1
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
      try {
        val blocks = reader.getFooter.getBlocks
        blocks.forEach { block =>
          rows += block.getRowCount
          block.getColumns.forEach { col =>
            val name = col.getPath.toDotString
            compressed += col.getTotalSize
            uncompressed += col.getTotalUncompressedSize
            val st = col.getStatistics
            if (st != null) {
              nulls(name) = nulls.getOrElse(name, 0L) +
                (if (st.isNumNullsSet) st.getNumNulls else 0L)
              if (st.hasNonNullValue) {
                val acc = merged.getOrElseUpdate(name,
                  Statistics.createStats(col.getPrimitiveType))
                mergeInto(acc, st)
              }
            }
          }
        }
      } finally reader.close()
    }

    val cols = nulls.keys.toSeq.map { name =>
      val mm = merged.get(name)
      ColumnStats(name, nulls(name),
        mm.map(_.minAsString), mm.map(_.maxAsString))
    }
    TableStats(files, rows, compressed, uncompressed, cols)
  }

  final case class FileRange(file: String, min: String, max: String)

  /** Per-FILE footer (min, max) for one column — the pruning-width
    * diagnostic: a filter on `column` skips every file whose range
    * excludes the predicate. `Sources.writeZOrdered` exists to make these
    * ranges narrow on two columns at once. */
  def perFileRange(spark: SparkSession, dir: String,
                   column: String): Seq[FileRange] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    fs.listStatus(root).toSeq
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .flatMap { f =>
        val reader = ParquetFileReader.open(HadoopInputFile.fromPath(f.getPath, conf))
        try {
          var acc: Statistics[_] = null
          reader.getFooter.getBlocks.forEach { block =>
            block.getColumns.forEach { col =>
              if (col.getPath.toDotString == column) {
                val st = col.getStatistics
                if (st != null && st.hasNonNullValue) {
                  if (acc == null) {
                    acc = Statistics.createStats(col.getPrimitiveType)
                  }
                  mergeInto(acc, st)
                }
              }
            }
          }
          Option(acc).map(a =>
            FileRange(f.getPath.getName, a.minAsString, a.maxAsString))
        } finally reader.close()
      }
  }
}
