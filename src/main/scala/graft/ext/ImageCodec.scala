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

  /** Real resize: decode → Graphics2D bilinear scale → PNG re-encode.
    * None when the input isn't decodable. */
  def resizePng(bytes: Array[Byte], targetW: Int, targetH: Int): Option[Array[Byte]] =
    try Option(ImageIO.read(new ByteArrayInputStream(bytes))).map { src =>
      val dst = new BufferedImage(targetW, targetH, BufferedImage.TYPE_INT_RGB)
      val g = dst.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(src, 0, 0, targetW, targetH, null)
      } finally g.dispose()
      val bos = new ByteArrayOutputStream()
      ImageIO.write(dst, "png", bos)
      bos.toByteArray
    } catch { case _: Exception => None }
}
