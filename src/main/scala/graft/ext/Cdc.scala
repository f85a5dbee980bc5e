package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Content-defined chunking (CDC) — byte-level dedup below the document
  * granularity the MinHash/SimHash family works at. A gear rolling hash
  * (Xia et al. 2016, "FastCDC: a fast and efficient content-defined
  * chunking approach for data deduplication", USENIX ATC) cuts each blob
  * at content-determined boundaries, so a shared byte range between two
  * blobs yields the SAME chunks regardless of where it sits — unlike
  * fixed-size blocks, an insertion only disturbs the chunk containing it
  * (the boundary-shift problem CDC exists to solve). Storage systems use
  * this for dedup ratios; a training-data pipeline uses the same chunk
  * table to find byte-identical regions across near-duplicate documents
  * and to dedup multimodal payload storage.
  *
  * Distribution shape: chunking is MAP-ONLY — each blob's boundaries
  * depend on its own bytes, never on other rows, so a 100 TB corpus
  * chunks embarrassingly parallel with zero shuffle. The dedup statistics
  * shuffle only (chunk_hash, len) pairs — 16 bytes per chunk, never the
  * payload bytes (the same ids-only discipline as the dedup family), with
  * map-side partial aggregation collapsing repeats before the exchange.
  *
  * Determinism: the gear table derives from [[TextHashing.mix64]] of the
  * byte value — no RNG — so chunk boundaries and hashes are pure functions
  * of the payload bytes, stable across runs, partitionings, and JVMs
  * (pinned by CdcSpec + the q_x_cdc anchor/golden rows).
  */
object Cdc {

  final case class Chunk(doc_id: Long, chunk_idx: Int, offset: Long,
                         len: Int, chunk_hash: Long)

  /** Deterministic 256-entry gear table: one mixed 64-bit constant per
    * byte value. mix64 is a bijective finalizer, so the table has full
    * 64-bit entropy per entry without any seed material. */
  private val Gear: Array[Long] =
    Array.tabulate(256)(b => TextHashing.mix64(b.toLong * TextHashing.GOLDEN))

  /** Cut one blob into content-defined chunks. `avgBits` sets the expected
    * chunk size to ~2^avgBits bytes via an avgBits-wide boundary mask;
    * minSize suppresses boundaries inside a fresh chunk (also warming the
    * rolling hash past its 64-byte window), maxSize force-cuts pathological
    * runs (e.g. constant bytes, which never satisfy a content mask).
    * The final chunk is the remainder and may undershoot minSize. */
  def chunkBytes(bytes: Array[Byte], minSize: Int, avgBits: Int,
                 maxSize: Int): Seq[(Long, Int, Long)] = {
    require(minSize >= 1 && maxSize >= minSize, "need 1 <= min <= max")
    require(avgBits >= 1 && avgBits <= 48, s"avgBits out of range: $avgBits")
    val mask = (1L << avgBits) - 1L
    val out = Seq.newBuilder[(Long, Int, Long)]
    var start = 0
    var i = 0
    var h = 0L
    while (i < bytes.length) {
      h = (h << 1) + Gear(bytes(i) & 0xff)
      i += 1
      val len = i - start
      if ((len >= minSize && (h & mask) == 0L) || len == maxSize ||
        i == bytes.length) {
        out += ((start.toLong, len,
          TextHashing.hashBytes(bytes, start, i)))
        start = i
        h = 0L
      }
    }
    out.result()
  }

  /** The chunk table of a (id, binary) frame: map-only, one output row per
    * chunk, payload bytes never leave the partition. */
  def chunkTable(df: DataFrame, idCol: String, bytesCol: String,
                 minSize: Int = 64, avgBits: Int = 8,
                 maxSize: Int = 1024): Dataset[Chunk] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          val b = if (bytes == null) Array.emptyByteArray else bytes
          chunkBytes(b, minSize, avgBits, maxSize).iterator.zipWithIndex
            .map { case ((off, len, h), idx) => Chunk(id, idx, off, len, h) }
        }
      }
  }

  final case class KeyedChunk(doc_id: Long, grp: String, chunk_idx: Int,
                              offset: Long, len: Int, chunk_hash: Long)

  /** [[chunkTable]] with a group column carried THROUGH the map-only
    * chunking — for accounting grouped by an attribute of the source row
    * (lang, source, mime type). Carrying the key beats chunking then
    * joining the attribute back on doc_id: the join form ships every
    * full chunk row through a doc_id exchange (and flips from broadcast
    * to shuffle join once the doc side outgrows the budget — the 100×
    * census caught `q_x_cdc_dedup` at 127× shuffle for 100× data on
    * exactly that), while this form's only exchange remains the 16-byte
    * (grp, hash, len) partial-aggregate output. */
  def chunkTableKeyed(df: DataFrame, idCol: String, bytesCol: String,
                      keyCol: String, minSize: Int = 64, avgBits: Int = 8,
                      maxSize: Int = 1024): Dataset[KeyedChunk] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(bytesCol),
        col(keyCol).cast("string"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes, key) =>
          val b = if (bytes == null) Array.emptyByteArray else bytes
          chunkBytes(b, minSize, avgBits, maxSize).iterator.zipWithIndex
            .map { case ((off, len, h), idx) =>
              KeyedChunk(id, key, idx, off, len, h) }
        }
      }
  }

  /** Storage-dedup accounting over a chunk table: logical vs unique bytes
    * and the dedup ratio, grouped by `groupCol` (pass a literal for a
    * global row). Chunks are identified by (hash, len) — a 64-bit hash
    * collision at equal length is the standard storage-dedup risk and is
    * acceptable for ACCOUNTING (a content-addressable store would verify
    * bytes on write). Two hash aggregates over 16-byte rows; the heavy
    * frame never materializes. */
  def dedupStats(chunks: DataFrame, groupCol: Column,
                 groupName: String): DataFrame = {
    val perChunk = chunks
      .groupBy(groupCol.as(groupName), col("chunk_hash"), col("len"))
      .agg(count(lit(1)).as("n_copies"))
    perChunk
      .groupBy(col(groupName))
      .agg(
        sum(col("n_copies")).cast("long").as("n_chunks"),
        count(lit(1)).cast("long").as("n_unique_chunks"),
        sum(col("n_copies") * col("len")).cast("long").as("logical_bytes"),
        sum(col("len")).cast("long").as("unique_bytes"),
        round(sum(col("n_copies") * col("len")) /
          sum(col("len")).cast("double"), 4).as("dedup_ratio"))
  }
}
