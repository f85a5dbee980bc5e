package graft.ext

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

/** Real, JDK-native image codec (javax.imageio — zero extra dependencies):
  * PNG encode/decode plus per-channel pixel statistics. Audio decodes via
  * AudioCodec (javax.sound.sampled) and video via VideoCodec (MJPEG-AVI
  * over the same javax.imageio JPEG path) — the whole multimodal surface
  * is real.
  *
  * Everything here is executor-side and allocation-conscious: decode is
  * called from mapPartitions batches, one BufferedImage at a time.
  */
object ImageCodec {

  // ImageIO defaults to a DISK-backed stream cache: every encode/decode of
  // an in-memory byte[] would otherwise create+delete a temp file. For
  // thousands of tiny media per partition that file churn dominates the
  // actual codec work — keep it all on-heap.
  ImageIO.setUseCache(false)

  /** Decoded image summary: dimensions, channel count, and per-channel
    * mean/stddev in [0,1] — the classic cheap image-quality features. */
  final case class Decoded(width: Int, height: Int, channels: Int,
                           meanRgb: Array[Float], stdRgb: Array[Float])

  /** Deterministic tiny RGB PNG: pixel (x,y) = low 24 bits of
    * mix64(seed ^ (y<<32) ^ x). Java's PNG writer emits no timestamp
    * chunks, so identical pixels → identical bytes (reproducible tests
    * and hashes). */
  def encodePng(width: Int, height: Int, seed: Long): Array[Byte] = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val h = TextHashing.mix64(seed ^ (y.toLong << 32) ^ x.toLong)
        img.setRGB(x, y, (h & 0xffffffL).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Decode any ImageIO-supported payload (PNG/JPEG/GIF/BMP); None when
    * the bytes aren't a decodable image. */
  def decode(bytes: Array[Byte]): Option[Decoded] =
    try Option(ImageIO.read(new ByteArrayInputStream(bytes))).map(stats)
    catch { case _: Exception => None }

  private def stats(img: BufferedImage): Decoded = {
    val (w, h) = (img.getWidth, img.getHeight)
    val n = (w.toLong * h).toDouble
    val sum = new Array[Double](3)
    val sumSq = new Array[Double](3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        var c = 0
        while (c < 3) {
          val v = ((rgb >> (16 - 8 * c)) & 0xff) / 255.0
          sum(c) += v
          sumSq(c) += v * v
          c += 1
        }
        x += 1
      }
      y += 1
    }
    val mean = Array.tabulate(3)(c => (sum(c) / n).toFloat)
    val std = Array.tabulate(3) { c =>
      val m = sum(c) / n
      math.sqrt(math.max(0.0, sumSq(c) / n - m * m)).toFloat
    }
    Decoded(w, h, img.getColorModel.getNumComponents, mean, std)
  }

  /** Exact area-averaged luma grid (gw × gh cells): every source pixel
    * contributes to exactly one cell, so the grid — and every hash built
    * on it — is deterministic and robust to rescaling (cell means change
    * little when the same content is resampled; a Graphics2D bilinear
    * shrink would sample sparsely and wreck that stability on busy
    * images). Luma = ITU-R BT.601 integer weights. */
  private def lumaGrid(img: BufferedImage, gw: Int, gh: Int): Array[Double] = {
    val (w, h) = (img.getWidth, img.getHeight)
    val sum = new Array[Double](gw * gh)
    val cnt = new Array[Long](gw * gh)
    var y = 0
    while (y < h) {
      val gy = math.min(gh - 1, y * gh / h)
      var x = 0
      while (x < w) {
        val gx = math.min(gw - 1, x * gw / w)
        val rgb = img.getRGB(x, y)
        val luma = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
          114 * (rgb & 0xff)) / 1000.0
        val i = gy * gw + gx
        sum(i) += luma
        cnt(i) += 1
        x += 1
      }
      y += 1
    }
    Array.tabulate(gw * gh)(i => if (cnt(i) == 0) 0.0 else sum(i) / cnt(i))
  }

  /** Decode to a BufferedImage for multi-hash callers — ImageIO PNG
    * decode dominates the hashing stage, so hash both grids (and any
    * resize) off ONE decode instead of re-reading the bytes per hash. */
  def readImage(bytes: Array[Byte]): Option[BufferedImage] =
    try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
    catch { case _: Exception => None }

  /** In-memory bilinear resize of an already-decoded image (no PNG
    * round-trip — PNG is lossless, so hashes of the resized image are
    * identical to hashing a re-encoded copy). */
  def resizeImage(img: BufferedImage, targetW: Int, targetH: Int): BufferedImage = {
    val dst = new BufferedImage(targetW, targetH, BufferedImage.TYPE_INT_RGB)
    val g = dst.createGraphics()
    try {
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, targetW, targetH, null)
    } finally g.dispose()
    dst
  }

  /** Images smaller than the hash grid would leave empty cells (luma
    * 0.0) — an artificial black border that systematically diverges a
    * narrow image's hash from its resized copy's. Upscale below-grid
    * images to at least 2× the grid first, so every cell averages real
    * pixels. */
  private def atLeastGridSize(img: BufferedImage): BufferedImage =
    if (img.getWidth >= 9 && img.getHeight >= 8) img
    else resizeImage(img, math.max(img.getWidth, 18), math.max(img.getHeight, 16))

  /** 64-bit average hash (aHash) of a decoded image: 8×8 luma grid, bit
    * set where the cell exceeds the grid mean. Identical images →
    * identical hash; a resized or re-encoded copy stays within a few
    * bits (region means survive resampling) — the standard cheap image
    * near-dup key. */
  def aHashImage(img0: BufferedImage): Long = {
    val img = atLeastGridSize(img0)
    val g = lumaGrid(img, 8, 8)
    val mean = g.sum / 64.0
    var bits = 0L
    var i = 0
    while (i < 64) { if (g(i) > mean) bits |= (1L << i); i += 1 }
    bits
  }

  /** 64-bit difference hash (dHash) of a decoded image: 9×8 luma grid,
    * bit set where a cell is brighter than its right neighbor — captures
    * gradients, robust to global brightness shifts (which flip aHash
    * bits near the mean). */
  def dHashImage(img0: BufferedImage): Long = {
    val img = atLeastGridSize(img0)
    val g = lumaGrid(img, 9, 8)
    var bits = 0L
    var gy = 0
    while (gy < 8) {
      var gx = 0
      while (gx < 8) {
        if (g(gy * 9 + gx) > g(gy * 9 + gx + 1)) bits |= (1L << (gy * 8 + gx))
        gx += 1
      }
      gy += 1
    }
    bits
  }

  /** Byte-level conveniences (one decode each; batch callers hashing
    * multiple grids should readImage once and use the *Image forms). */
  def aHash(bytes: Array[Byte]): Option[Long] = readImage(bytes).map(aHashImage)
  def dHash(bytes: Array[Byte]): Option[Long] = readImage(bytes).map(dHashImage)

  /** Real resize: decode → Graphics2D bilinear scale → PNG re-encode.
    * None when the input isn't decodable. */
  def resizePng(bytes: Array[Byte], targetW: Int, targetH: Int): Option[Array[Byte]] =
    readImage(bytes).map { src =>
      val bos = new ByteArrayOutputStream()
      ImageIO.write(resizeImage(src, targetW, targetH), "png", bos)
      bos.toByteArray
    }
}
