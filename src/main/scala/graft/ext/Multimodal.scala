package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / frame-sample
  * operators shaped for executor-side batch processing (`mapPartitions` —
  * the JVM analogue of a pandas-batch UDF: per-partition setup cost is paid
  * once, rows stream through).
  *
  * ALL THREE modalities decode for REAL with JDK-native codecs:
  * image/png rows carry genuine PNG bytes decoded with javax.imageio
  * (ImageCodec → true width/height/channels + per-channel mean/std);
  * audio/wav rows carry genuine PCM16 WAV bytes decoded with
  * javax.sound.sampled (AudioCodec → true sample-rate/channels/duration +
  * per-channel RMS/peak); video/avi rows carry genuine MJPEG-in-AVI bytes
  * parsed + frame-decoded with VideoCodec (RIFF container walk +
  * javax.imageio JPEG frames → true dims/fps/frame-count + luma/motion
  * stats, and real frame sampling). `FakeCodec` survives only as the
  * fallback for undecodable payloads, so every operator stays total.
  */
object Multimodal {

  val FeatureDim = 16

  final case class MediaRow(doc_id: Long, media: Array[Byte], format: String,
                            width: Int, height: Int, duration_ms: Long)
  final case class MediaFeatures(doc_id: Long, format: String, n_bytes: Long,
                                 feat_dim: Int, features: Array[Float])
  final case class Frame(doc_id: Long, frame_idx: Int, offset_ms: Long,
                         frame_hash: Long)

  /** Fallback pseudo-codec for UNDECODABLE payloads (corrupt bytes, alien
    * formats): derives stable pseudo-features purely from the bytes so the
    * operators stay total and reproducible. The happy paths never touch
    * this — image/audio/video all decode for real via
    * ImageCodec/AudioCodec/VideoCodec. */
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

  /** Attach a media column to the documents table. Image rows (doc_id%3==0)
    * carry a REAL deterministic PNG (pixels seeded from doc_id); audio rows
    * (doc_id%3==1) carry a REAL deterministic PCM16 WAV (a doc_id-seeded
    * sine, 8 kHz); video rows carry a REAL deterministic MJPEG AVI
    * (doc_id-seeded frames, 10 fps). All encoded executor-side per
    * partition. Real pipelines read the bytes from object storage instead;
    * everything downstream only sees (binary, metadata). */
  def attachMedia(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // Fan the codec work out to every core (Sources.fanOut, r13): the gate
    // corpus is ONE parquet file = one row group = one scan task, so
    // without this the encode/decode chain of every multimodal operator
    // runs single-threaded however many cores the session has.
    graft.sources.Sources
      .fanOut(docs.select(col("doc_id"), col("text")), col("doc_id"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text) =>
          (id % 3).toInt match {
            case 0 =>
              // tiny real PNG: dims small enough that encode stays cheap at
              // corpus scale, large enough to exercise real pixel stats
              val w = (id % 24 + 8).toInt
              val h = (id % 16 + 8).toInt
              MediaRow(id, ImageCodec.encodePng(w, h, id), "image/png",
                w, h, 0L)
            case 1 =>
              // short real WAV clip (0.1–1.1 s @ 8 kHz): cheap at corpus
              // scale, long enough for stable amplitude statistics
              val sr = 8000
              val n = (id % 8000 + 800).toInt
              MediaRow(id,
                AudioCodec.encodeWav(n, sr, 100.0 + (id % 1000), 0.5),
                "audio/wav", 0, 0, n.toLong * 1000L / sr)
            case _ =>
              // short real MJPEG AVI (3–8 frames, 16–31×12–23 px, 10 fps):
              // cheap at corpus scale, real enough for container parse +
              // frame decode + motion stats
              val w = (id % 16 + 16).toInt
              val h = (id % 12 + 12).toInt
              val nf = (id % 6 + 3).toInt
              val fps = 10
              MediaRow(id, VideoCodec.encodeAvi(w, h, nf, fps, id),
                "video/avi", w, h, nf * 1000L / fps)
          }
        }
      }.toDF()
  }

  /** Decode + feature-extract: executor-side, batched per partition.
    * Images decode for REAL (javax.imageio): features =
    * [width, height, channels, meanR, meanG, meanB, stdR, stdG, stdB, 0…].
    * Audio decodes for REAL (javax.sound.sampled): features =
    * [sampleRate, channels, nFrames, durationMs, rms_ch0, peak_ch0,
    *  rms_ch1, peak_ch1, 0…].
    * Video decodes for REAL (VideoCodec container parse + JPEG frames):
    * features = [width, height, fps, nFrames, durationMs, meanLuma,
    *  stdLuma, motion, 0…].
    * Undecodable payloads fall back to FakeCodec so the operator is total.
    * Output rows: (doc_id, format, n_bytes, feat_dim, features). */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "media", "format", "width", "height", "duration_ms")
      .as[MediaRow]
      .mapPartitions { rows =>
        // per-partition setup (a real video codec would init here)
        rows.map { r =>
          val feats =
            if (r.format == "image/png")
              ImageCodec.decode(r.media).map { d =>
                val f = new Array[Float](FeatureDim)
                f(0) = d.width.toFloat
                f(1) = d.height.toFloat
                f(2) = d.channels.toFloat
                System.arraycopy(d.meanRgb, 0, f, 3, 3)
                System.arraycopy(d.stdRgb, 0, f, 6, 3)
                f
              }.getOrElse(FakeCodec.features(r.media))
            else if (r.format == "audio/wav")
              AudioCodec.decode(r.media).map { d =>
                val f = new Array[Float](FeatureDim)
                f(0) = d.sampleRateHz
                f(1) = d.channels.toFloat
                f(2) = d.nFrames.toFloat
                f(3) = d.durationMs.toFloat
                var c = 0
                while (c < math.min(d.channels, 2)) {
                  f(4 + 2 * c) = d.rms(c)
                  f(5 + 2 * c) = d.peak(c)
                  c += 1
                }
                f
              }.getOrElse(FakeCodec.features(r.media))
            else if (r.format == "video/avi")
              VideoCodec.stats(r.media).map { s =>
                val f = new Array[Float](FeatureDim)
                f(0) = s.info.width.toFloat
                f(1) = s.info.height.toFloat
                f(2) = s.info.fps.toFloat
                f(3) = s.info.nFrames.toFloat
                f(4) = s.info.durationMs.toFloat
                f(5) = s.meanLuma
                f(6) = s.stdLuma
                f(7) = s.motion
                f
              }.getOrElse(FakeCodec.features(r.media))
            else FakeCodec.features(r.media)
          MediaFeatures(r.doc_id, r.format, r.media.length.toLong,
            FeatureDim, feats)
        }
      }
  }

  /** Resize images to (targetW, targetH) — REAL: decode, bilinear rescale,
    * PNG re-encode (ImageCodec.resizePng). Undecodable image payloads fall
    * back to a deterministic pseudo-resize so the operator stays total.
    * Non-image rows pass through untouched. */
  def resizeImages(media: DataFrame, targetW: Int, targetH: Int): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "media", "format", "width", "height", "duration_ms")
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          if (r.format != "image/png") r
          else {
            val resized = ImageCodec.resizePng(r.media, targetW, targetH)
              .getOrElse {
                // fallback for non-decodable payloads: deterministic bytes
                // derived from (input, target shape)
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

  final case class ImageHashRow(doc_id: Long, ahash: Long, dhash: Long,
                                resized_hamming: Int)

  /** Perceptual image hashes for near-dup detection — REAL decode path:
    * 64-bit aHash (8×8 area-averaged luma vs grid mean) + dHash (9×8
    * horizontal gradients), per image row. `resized_hamming` re-encodes
    * each image at 2× via the real resize path and reports the aHash
    * hamming drift — the per-row proof of the property that makes these
    * hashes dedup keys (a rescaled copy hashes within a few bits, so
    * exact-bucket or chunk-LSH grouping on the hash finds resized/
    * re-encoded duplicates). Map-only, executor-side; undecodable
    * payloads fall back to a byte-hash so the operator stays total. */
  def imageHashes(media: DataFrame): Dataset[ImageHashRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("format") === "image/png")
      .select("doc_id", "media", "format", "width", "height", "duration_ms")
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          // ONE decode serves both hash grids and the resize check —
          // ImageIO decode dominates this stage, and PNG is lossless so
          // hashing the in-memory resize equals hashing a re-encoded copy
          ImageCodec.readImage(r.media) match {
            case Some(img) =>
              val a = ImageCodec.aHashImage(img)
              val d = ImageCodec.dHashImage(img)
              // DECODED dims, not row metadata: metadata can be absent or
              // wrong (0×0 would crash BufferedImage; a lying aspect
              // ratio would make the drift metric meaningless)
              val a2 = ImageCodec.aHashImage(ImageCodec.resizeImage(img,
                img.getWidth * 2, img.getHeight * 2))
              ImageHashRow(r.doc_id, a, d, java.lang.Long.bitCount(a ^ a2))
            case None =>
              val fallback = TextHashing.mix64(
                TextHashing.hashBytes(r.media, 0, r.media.length))
              ImageHashRow(r.doc_id, fallback, fallback, 64)
          }
        }
      }
  }

  /** Frame sampling for video rows — REAL: parse the AVI container, pick n
    * evenly-spaced source frames, decode each JPEG, and hash its actual
    * pixels; offset_ms comes from the stream's true fps. Emits exactly n
    * rows per video (stable fan-out for planning); undecodable payloads
    * fall back to FakeCodec so the operator stays total. */
  def sampleFrames(media: DataFrame, n: Int): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("format") === "video/avi")
      .select("doc_id", "media", "format", "width", "height", "duration_ms")
      .as[MediaRow]
      .flatMap { r =>
        VideoCodec.probe(r.media) match {
          case Some(info) if info.nFrames > 0 =>
            (0 until n).map { i =>
              val src = (i.toLong * info.nFrames / math.max(1, n)).toInt
              val offsetMs =
                if (info.fps > 0) math.round(src * 1000.0 / info.fps) else 0L
              val hash = VideoCodec.decodeFrame(r.media, src)
                .map(VideoCodec.pixelHash)
                .getOrElse(FakeCodec.frameHash(r.media, src))
              Frame(r.doc_id, i, offsetMs, hash)
            }
          case _ =>
            val step = math.max(1L, r.duration_ms / math.max(1, n))
            (0 until n).map(i => Frame(r.doc_id, i, i * step,
              FakeCodec.frameHash(r.media, i)))
        }
      }
  }

  /** `clip_ms` (r13) carries the source clip's duration through to the
    * segment rows: consumers checking segments against clip bounds (the
    * VAD anchor) would otherwise need a SECOND full attachMedia/decode
    * pass over the corpus just to re-read the metadata column — the
    * mapPartitions boundary is opaque to column pruning, so that second
    * pass re-encodes every modality (guide §1.2: don't compute what you
    * already had in hand). */
  final case class VadRow(doc_id: Long, seg_idx: Int, start_ms: Long,
                          end_ms: Long, n_frames: Int, clip_ms: Long)

  /** Voice-activity segments for the corpus's audio rows
    * ([[AudioCodec.vadSegments]] batched per partition — the speech
    * prep stage before transcription/ASR cost is spent on silence).
    * Map-only like every codec stage here: no shuffle, bytes never
    * leave their partition, output is (doc, segment) rows on the frame
    * grid. Non-audio rows are filtered BEFORE deserialization to the
    * typed row; undecodable audio contributes no segments (the codec
    * totality convention). */
  def audioVad(media: DataFrame, frameMs: Int = 20,
               thresholdMilli: Long = 50): Dataset[VadRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("format") === "audio/wav")
      .select("doc_id", "media", "format", "width", "height", "duration_ms")
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.flatMap { r =>
          AudioCodec.vadSegments(r.media, frameMs, thresholdMilli)
            .zipWithIndex.map { case (seg, i) =>
              VadRow(r.doc_id, i, seg.startMs, seg.endMs, seg.nFrames,
                r.duration_ms)
            }
        }
      }
  }
}
