package graft.ext

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.{ByteBuffer, ByteOrder}

import javax.imageio.ImageIO

/** Real, JDK-native video codec: MJPEG-in-AVI. The AVI (RIFF) container is
  * simple enough to write and parse by hand — fourcc chunks with
  * little-endian sizes — and MJPEG frames are plain JPEGs, which
  * javax.imageio decodes natively. Zero extra dependencies, same route as
  * ImageCodec (PNG/JPEG) and AudioCodec (WAV): the multimodal surface's
  * video column carries genuine, ffprobe-readable media bytes.
  *
  * Layout written/understood (the minimal single-video-stream profile):
  * {{{
  * RIFF('AVI '
  *   LIST('hdrl' avih(56B main header)
  *     LIST('strl' strh(56B 'vids'/'MJPG') strf(40B BITMAPINFOHEADER)))
  *   LIST('movi' ('00dc' <jpeg>)*)
  *   idx1(16B per frame))
  * }}}
  * The parser walks chunks structurally (no idx1 dependence), so AVIs from
  * other writers decode too as long as frames are '..dc'/'..db' JPEGs.
  */
object VideoCodec {

  // in-memory-only ImageIO streams (see ImageCodec): JPEG frame
  // encode/decode must not churn temp files at corpus scale
  ImageIO.setUseCache(false)

  /** Container-level metadata, readable without decoding any frame. */
  final case class Info(width: Int, height: Int, fps: Double, nFrames: Int) {
    def durationMs: Long =
      if (fps <= 0) 0L else math.round(nFrames * 1000.0 / fps)
  }

  /** Frame-content statistics over up to `sampleN` evenly-spaced decoded
    * frames: mean/std of luma in [0,1], and mean absolute luma difference
    * between consecutive sampled frames (a motion proxy). */
  final case class Stats(info: Info, sampledFrames: Int,
                         meanLuma: Float, stdLuma: Float, motion: Float)

  // ------------------------------------------------------------ writing --

  private def fourcc(s: String): Array[Byte] = {
    require(s.length == 4, s"fourcc must be 4 chars: '$s'")
    s.getBytes("US-ASCII")
  }

  /** id + LE32 size + body, padded to even length (RIFF rule). */
  private def chunk(id: String, body: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(body.length + 12)
    out.write(fourcc(id))
    out.write(le32(body.length))
    out.write(body)
    if ((body.length & 1) == 1) out.write(0)
    out.toByteArray
  }

  private def list(listType: String, body: Array[Byte]): Array[Byte] =
    chunk("LIST", fourcc(listType) ++ body)

  private def le32(v: Int): Array[Byte] =
    ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(v).array()

  /** Deterministic test frame: pixel (x,y) of frame f = low 24 bits of
    * mix64(seed ^ f<<48 ^ y<<24 ^ x) — every frame differs, so motion
    * statistics are non-trivial. Same generator family as
    * ImageCodec.encodePng. */
  private def frameImage(width: Int, height: Int, seed: Long,
                         frame: Int): BufferedImage = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val h = TextHashing.mix64(
          seed ^ (frame.toLong << 48) ^ (y.toLong << 24) ^ x.toLong)
        img.setRGB(x, y, (h & 0xffffffL).toInt)
        x += 1
      }
      y += 1
    }
    img
  }

  private def encodeJpeg(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** Deterministic MJPEG AVI: `nFrames` JPEG frames of doc_id-seeded
    * pixels. Java's JPEG writer emits no timestamps, so identical inputs →
    * identical bytes (reproducible hashes). */
  def encodeAvi(width: Int, height: Int, nFrames: Int, fps: Int,
                seed: Long): Array[Byte] = {
    require(width > 0 && height > 0 && nFrames > 0 && fps > 0,
      "encodeAvi: all dimensions must be positive")
    val jpegs = Array.tabulate(nFrames)(f =>
      encodeJpeg(frameImage(width, height, seed, f)))
    val maxFrame = jpegs.map(_.length).max

    val avih = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
    avih.putInt(1000000 / fps) // dwMicroSecPerFrame
    avih.putInt(0)             // dwMaxBytesPerSec
    avih.putInt(0)             // dwPaddingGranularity
    avih.putInt(0x10)          // dwFlags = AVIF_HASINDEX
    avih.putInt(nFrames)       // dwTotalFrames
    avih.putInt(0)             // dwInitialFrames
    avih.putInt(1)             // dwStreams
    avih.putInt(maxFrame)      // dwSuggestedBufferSize
    avih.putInt(width)
    avih.putInt(height)
    // dwReserved[4] stays zero

    val strh = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
    strh.put(fourcc("vids"))
    strh.put(fourcc("MJPG"))
    strh.putInt(0)        // dwFlags
    strh.putShort(0)      // wPriority
    strh.putShort(0)      // wLanguage
    strh.putInt(0)        // dwInitialFrames
    strh.putInt(1)        // dwScale
    strh.putInt(fps)      // dwRate → fps = rate/scale
    strh.putInt(0)        // dwStart
    strh.putInt(nFrames)  // dwLength
    strh.putInt(maxFrame) // dwSuggestedBufferSize
    strh.putInt(-1)       // dwQuality (default)
    strh.putInt(0)        // dwSampleSize (0 = variable, one frame per chunk)
    strh.putShort(0); strh.putShort(0) // rcFrame left, top
    strh.putShort(width.toShort); strh.putShort(height.toShort)

    val strf = ByteBuffer.allocate(40).order(ByteOrder.LITTLE_ENDIAN)
    strf.putInt(40)    // biSize
    strf.putInt(width)
    strf.putInt(height)
    strf.putShort(1)   // biPlanes
    strf.putShort(24)  // biBitCount
    strf.put(fourcc("MJPG")) // biCompression
    strf.putInt(width * height * 3) // biSizeImage
    // xPels/yPels/clrUsed/clrImportant stay zero

    val hdrl = list("hdrl", chunk("avih", avih.array()) ++
      list("strl", chunk("strh", strh.array()) ++ chunk("strf", strf.array())))

    val moviBody = new ByteArrayOutputStream()
    // idx1 offsets are relative to the 'movi' fourcc; first chunk sits 4 in
    val offsets = new Array[Int](nFrames)
    jpegs.zipWithIndex.foreach { case (j, i) =>
      offsets(i) = moviBody.size() + 4
      moviBody.write(chunk("00dc", j))
    }
    val movi = list("movi", moviBody.toByteArray)

    val idx = ByteBuffer.allocate(16 * nFrames).order(ByteOrder.LITTLE_ENDIAN)
    jpegs.zipWithIndex.foreach { case (j, i) =>
      idx.put(fourcc("00dc"))
      idx.putInt(0x10) // AVIIF_KEYFRAME — every MJPEG frame is one
      idx.putInt(offsets(i))
      idx.putInt(j.length)
    }

    val riffBody = fourcc("AVI ") ++ hdrl ++ movi ++ chunk("idx1", idx.array())
    chunk("RIFF", riffBody)
  }

  // ------------------------------------------------------------ parsing --

  private def u32(bytes: Array[Byte], off: Int): Long =
    ByteBuffer.wrap(bytes, off, 4).order(ByteOrder.LITTLE_ENDIAN)
      .getInt & 0xffffffffL

  private def tag(bytes: Array[Byte], off: Int): String =
    new String(bytes, off, 4, "US-ASCII")

  /** Header-only parse — Info without touching a single frame. None when
    * the bytes aren't a RIFF/AVI with an avih header. */
  def probe(bytes: Array[Byte]): Option[Info] =
    try {
      if (bytes.length < 12 || tag(bytes, 0) != "RIFF" ||
        tag(bytes, 8) != "AVI ") return None
      var avih: Option[(Int, Int, Double, Int)] = None
      var strFps: Option[Double] = None
      // chunk walker over a [from, until) region; recurses into LISTs
      def walk(from: Int, until: Int): Unit = {
        var p = from
        while (p + 8 <= until && avihMissing) {
          val id = tag(bytes, p)
          val size = u32(bytes, p + 4).toInt
          val dataStart = p + 8
          if (dataStart + size > until || size < 0) return // malformed
          if (id == "LIST" && size >= 4) {
            walk(dataStart + 4, dataStart + size) // skip list-type fourcc
          } else if (id == "avih" && size >= 40) {
            val usPerFrame = u32(bytes, dataStart)
            val nFrames = u32(bytes, dataStart + 16).toInt
            val w = u32(bytes, dataStart + 32).toInt
            val h = u32(bytes, dataStart + 36).toInt
            val fps = if (usPerFrame == 0) 0.0 else 1000000.0 / usPerFrame
            avih = Some((w, h, fps, nFrames))
          } else if (id == "strh" && size >= 32 &&
            tag(bytes, dataStart) == "vids") {
            val scale = u32(bytes, dataStart + 20)
            val rate = u32(bytes, dataStart + 24)
            if (scale > 0 && rate > 0) strFps = Some(rate.toDouble / scale)
          }
          p = dataStart + size + (size & 1) // even padding
        }
      }
      def avihMissing = avih.isEmpty || strFps.isEmpty
      walk(12, math.min(bytes.length, 8 + u32(bytes, 4).toInt))
      avih.map { case (w, h, fps, n) =>
        // the stream header's rate/scale is the authoritative fps; avih's
        // µs-per-frame is its rounded mirror
        Info(w, h, strFps.getOrElse(fps), n)
      }
    } catch { case _: Exception => None }

  /** Byte ranges of the video frames ('..dc'/'..db' chunks inside movi),
    * in stream order. */
  private[ext] def frameRanges(bytes: Array[Byte]): Seq[(Int, Int)] =
    try {
      if (bytes.length < 12 || tag(bytes, 0) != "RIFF" ||
        tag(bytes, 8) != "AVI ") return Nil
      val frames = Seq.newBuilder[(Int, Int)]
      def walk(from: Int, until: Int, inMovi: Boolean): Unit = {
        var p = from
        while (p + 8 <= until) {
          val id = tag(bytes, p)
          val size = u32(bytes, p + 4).toInt
          val dataStart = p + 8
          if (dataStart + size > until || size < 0) return
          if (id == "LIST" && size >= 4) {
            val listType = tag(bytes, dataStart)
            walk(dataStart + 4, dataStart + size,
              inMovi || listType == "movi" || listType == "rec ")
          } else if (inMovi && id.length == 4 &&
            (id.endsWith("dc") || id.endsWith("db"))) {
            frames += ((dataStart, size))
          }
          p = dataStart + size + (size & 1)
        }
      }
      walk(12, math.min(bytes.length, 8 + u32(bytes, 4).toInt), inMovi = false)
      frames.result()
    } catch { case _: Exception => Nil }

  /** Decode frame `idx` (stream order) to a BufferedImage; None when the
    * container is unreadable or the frame isn't a decodable JPEG. */
  def decodeFrame(bytes: Array[Byte], idx: Int): Option[BufferedImage] = {
    val ranges = frameRanges(bytes)
    if (idx < 0 || idx >= ranges.size) None
    else {
      val (off, len) = ranges(idx)
      try Option(ImageIO.read(new ByteArrayInputStream(bytes, off, len)))
      catch { case _: Exception => None }
    }
  }

  /** Content hash of a decoded frame's actual pixels (row-major RGB fold
    * through mix64) — stable across container re-muxes of identical
    * frames, unlike a byte hash. */
  def pixelHash(img: BufferedImage): Long = {
    var h = TextHashing.GOLDEN ^ (img.getWidth.toLong << 32) ^ img.getHeight
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        h = TextHashing.mix64(h ^ (img.getRGB(x, y) & 0xffffffL))
        x += 1
      }
      y += 1
    }
    h
  }

  /** Decode up to `sampleN` evenly-spaced frames and summarize luma +
    * motion. None when the container or every sampled frame is
    * undecodable. */
  def stats(bytes: Array[Byte], sampleN: Int = 4): Option[Stats] =
    probe(bytes).flatMap { info =>
      val ranges = frameRanges(bytes)
      if (ranges.isEmpty) return None
      val n = math.min(math.max(1, sampleN), ranges.size)
      val picks = Array.tabulate(n)(i => i.toLong * ranges.size / n)
      var count = 0L
      var sum = 0.0
      var sumSq = 0.0
      var motionSum = 0.0
      var motionPairs = 0L
      var prev: Array[Double] = null
      picks.foreach { fi =>
        decodeFrame(bytes, fi.toInt).foreach { img =>
          val w = img.getWidth
          val h = img.getHeight
          val lumas = new Array[Double](w * h)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              // Rec. 601 luma in [0,1]
              val l = (0.299 * ((rgb >> 16) & 0xff) +
                0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)) / 255.0
              lumas(y * w + x) = l
              sum += l
              sumSq += l * l
              x += 1
            }
            y += 1
          }
          count += lumas.length
          if (prev != null && prev.length == lumas.length) {
            var i = 0
            var d = 0.0
            while (i < lumas.length) { d += math.abs(lumas(i) - prev(i)); i += 1 }
            motionSum += d / lumas.length
            motionPairs += 1
          }
          prev = lumas
        }
      }
      if (count == 0) None
      else {
        val mean = sum / count
        val std = math.sqrt(math.max(0.0, sumSq / count - mean * mean))
        val motion =
          if (motionPairs == 0) 0.0f else (motionSum / motionPairs).toFloat
        Some(Stats(info, n, mean.toFloat, std.toFloat, motion))
      }
    }
}
