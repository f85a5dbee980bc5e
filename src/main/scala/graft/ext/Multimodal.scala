package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / frame-sample
  * operators shaped for executor-side batch processing (`mapPartitions` —
  * the JVM analogue of a pandas-batch UDF: per-partition setup cost is paid
  * once, rows stream through).
  *
  * The actual codec calls are STUBBED (no image/audio libraries in this
  * environment): `FakeCodec` derives deterministic pseudo-features from the
  * bytes. The Spark-side contract — schemas, binary handling, partition
  * batching, feature shapes — is real and tested; swapping `FakeCodec` for
  * a JNI/javacv decoder changes no plan shape.
  */
object Multimodal {

  val FeatureDim = 16

  final case class MediaRow(doc_id: Long, media: Array[Byte], format: String,
                            width: Int, height: Int, duration_ms: Long)
  final case class MediaFeatures(doc_id: Long, format: String, n_bytes: Long,
                                 feat_dim: Int, features: Array[Float])
  final case class Frame(doc_id: Long, frame_idx: Int, offset_ms: Long,
                         frame_hash: Long)

  /** ==== STUB ==== deterministic stand-in for a real media codec. A real
    * implementation decodes with an image/audio library per partition;
    * this derives stable pseudo-features purely from the bytes so tests
    * and plans are reproducible. */
  object FakeCodec {
    def features(bytes: Array[Byte]): Array[Float] = {
      val base = TextHashing.hashBytes(bytes, 0, bytes.length)
      Array.tabulate(FeatureDim) { i =>
        // map each mixed hash into [-1, 1)
        (TextHashing.mix64(base ^ (i * TextHashing.GOLDEN)) >> 11).toFloat /
          (1L << 52).toFloat
      }
    }
    def frameHash(bytes: Array[Byte], idx: Int): Long =
      TextHashing.mix64(TextHashing.hashBytes(bytes, 0, bytes.length) ^ idx)
  }

  /** Attach a media column to the documents table: bytes = the UTF-8 text
    * (an opaque stand-in payload), metadata derived deterministically from
    * doc_id. Real pipelines read the bytes from object storage instead;
    * everything downstream only sees (binary, metadata). */
  def attachMedia(docs: DataFrame): DataFrame = {
    val fmt = element_at(
      array(lit("image/png"), lit("audio/wav"), lit("video/mp4")),
      (col("doc_id") % 3 + 1).cast("int"))
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("media"),
      fmt.as("format"),
      (col("doc_id") % 640 + 32).cast("int").as("width"),
      (col("doc_id") % 480 + 32).cast("int").as("height"),
      (col("doc_id") % 90000).as("duration_ms"))
  }

  /** Decode + feature-extract: executor-side, batched per partition.
    * Output rows: (doc_id, format, n_bytes, feat_dim, features). */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "media", "format", "width", "height", "duration_ms")
      .as[MediaRow]
      .mapPartitions { rows =>
        // per-partition setup (a real codec would init here, once)
        rows.map { r =>
          val feats = FakeCodec.features(r.media)
          MediaFeatures(r.doc_id, r.format, r.media.length.toLong,
            FeatureDim, feats)
        }
      }
  }

  /** Resize images to (targetW, targetH): metadata updates for real; the
    * pixel transform is the ==== STUB ==== (a real codec re-encodes; the
    * stub re-hashes bytes with the target shape so output is deterministic
    * and shape-dependent). Non-image rows pass through untouched. */
  def resizeImages(media: DataFrame, targetW: Int, targetH: Int): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "media", "format", "width", "height", "duration_ms")
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          if (r.format != "image/png") r
          else {
            val resized = {
              // STUB: real impl decodes + rescales; fake payload derives
              // deterministically from (bytes, target shape)
              val seed = TextHashing.hashBytes(r.media, 0, r.media.length) ^
                (targetW.toLong << 32) ^ targetH.toLong
              val out = new Array[Byte](math.max(16, r.media.length / 2))
              var i = 0
              while (i < out.length) {
                out(i) = (TextHashing.mix64(seed + i) & 0xff).toByte; i += 1
              }
              out
            }
            r.copy(media = resized, width = targetW, height = targetH)
          }
        }
      }
  }

  /** Frame sampling for video rows: n evenly-spaced frames per document.
    * Real impl seeks the container; stub hashes (bytes, idx). */
  def sampleFrames(media: DataFrame, n: Int): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("format") === "video/mp4")
      .select("doc_id", "media", "format", "width", "height", "duration_ms")
      .as[MediaRow]
      .flatMap { r =>
        val step = math.max(1L, r.duration_ms / math.max(1, n))
        (0 until n).map(i => Frame(r.doc_id, i, i * step,
          FakeCodec.frameHash(r.media, i)))
      }
  }
}
