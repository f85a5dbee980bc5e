package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.Sources

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def docs = Sources.table(spark, "/root/testdata/sf0.001", "documents")

  test("attachMedia: binary payload + typed metadata per doc") {
    val media = Multimodal.attachMedia(docs)
    assert(media.count() == 500)
    val schema = media.schema
    assert(schema("media").dataType == org.apache.spark.sql.types.BinaryType)
    assert(schema("format").dataType == org.apache.spark.sql.types.StringType)
    val formats = media.select("format").distinct().collect().map(_.getString(0)).toSet
    assert(formats == Set("image/png", "audio/wav", "video/avi"))
  }

  test("extractFeatures: fixed-dim deterministic features, one row per doc") {
    val media = Multimodal.attachMedia(docs)
    val f1 = Multimodal.extractFeatures(media).collect()
    val f2 = Multimodal.extractFeatures(media).collect()
    assert(f1.length == 500)
    assert(f1.forall(_.features.length == Multimodal.FeatureDim))
    assert(f1.forall(_.n_bytes > 0))
    // deterministic stub: same input → same features
    val m1 = f1.map(f => f.doc_id -> f.features.toSeq).toMap
    f2.foreach(f => assert(m1(f.doc_id) == f.features.toSeq))
  }

  test("resizeImages: image rows get target shape, others untouched") {
    val media = Multimodal.attachMedia(docs)
    val out = Multimodal.resizeImages(media, 224, 224).collect()
    assert(out.length == 500)
    val images = out.filter(_.format == "image/png")
    assert(images.nonEmpty)
    assert(images.forall(r => r.width == 224 && r.height == 224))
    val rest = out.filter(_.format != "image/png")
    val orig = media.collect().map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Int]("width"), r.getAs[Int]("height"))).toMap
    assert(rest.forall(r => orig(r.doc_id) == ((r.width, r.height))))
    // deterministic stub payload
    val again = Multimodal.resizeImages(media, 224, 224).collect()
      .filter(_.format == "image/png").map(r => r.doc_id -> r.media.toSeq).toMap
    images.foreach(r => assert(again(r.doc_id) == r.media.toSeq))
  }

  test("image path is REAL: PNG bytes decode, features carry true dims/stats") {
    val media = Multimodal.attachMedia(docs)
    val img = media.filter("format = 'image/png'").limit(5).collect()
    assert(img.nonEmpty)
    img.foreach { r =>
      val bytes = r.getAs[Array[Byte]]("media")
      // PNG magic
      assert((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N')
      val d = ImageCodec.decode(bytes).get
      assert(d.width == r.getAs[Int]("width"))
      assert(d.height == r.getAs[Int]("height"))
      assert(d.channels == 3)
      // pseudo-random pixels: channel means land mid-range, nonzero spread
      assert(d.meanRgb.forall(m => m > 0.2f && m < 0.8f))
      assert(d.stdRgb.forall(_ > 0.05f))
    }
    val feats = Multimodal.extractFeatures(media)
      .filter(_.format == "image/png").collect()
    val meta = media.filter("format = 'image/png'").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("width"), r.getAs[Int]("height"))).toMap
    feats.foreach { f =>
      val (w, h) = meta(f.doc_id)
      assert(f.features(0) == w.toFloat && f.features(1) == h.toFloat)
      assert(f.features(2) == 3.0f)
    }
  }

  test("audio path is REAL: WAV bytes decode, features carry true amplitude stats") {
    val media = Multimodal.attachMedia(docs)
    val wavs = media.filter("format = 'audio/wav'").limit(5).collect()
    assert(wavs.nonEmpty)
    wavs.foreach { r =>
      val bytes = r.getAs[Array[Byte]]("media")
      // RIFF/WAVE magic
      assert(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' &&
        bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V')
      val id = r.getAs[Long]("doc_id")
      val d = AudioCodec.decode(bytes).get
      assert(d.sampleRateHz == 8000f)
      assert(d.channels == 1)
      assert(d.nFrames == (id % 8000 + 800))
      assert(d.durationMs == r.getAs[Long]("duration_ms"))
      // a 0.5-amplitude sine: RMS ≈ 0.5/√2, peak ≈ 0.5 — REAL decoded PCM,
      // not byte-hash pseudo-features
      assert(math.abs(d.rms(0) - 0.5 / math.sqrt(2.0)) < 0.02,
        s"doc $id rms ${d.rms(0)}")
      assert(d.peak(0) > 0.45f && d.peak(0) <= 0.5001f, s"doc $id peak ${d.peak(0)}")
    }
    val feats = Multimodal.extractFeatures(media)
      .filter(_.format == "audio/wav").collect()
    assert(feats.nonEmpty)
    feats.foreach { f =>
      assert(f.features(0) == 8000f, "sample rate rides in features")
      assert(f.features(1) == 1f)
      assert(math.abs(f.features(4) - 0.3536f) < 0.02f, s"rms ${f.features(4)}")
      assert(f.features(5) > 0.45f, s"peak ${f.features(5)}")
    }
  }

  test("AudioCodec decodes stereo and big-endian PCM16 (AIFF) correctly") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    // stereo little-endian WAV: left channel at amplitude 0.5, right silent
    val sr = 8000
    val n = 4000
    val stereoFmt = new AudioFormat(sr.toFloat, 16, 2, true, false)
    val data = new Array[Byte](n * 4)
    for (i <- 0 until n) {
      val v = (0.5 * math.sin(2 * math.Pi * 440 * i / sr) * 32767).toInt
      data(4 * i) = (v & 0xff).toByte
      data(4 * i + 1) = ((v >> 8) & 0xff).toByte
      // right channel bytes stay 0
    }
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(data), stereoFmt, n.toLong),
      AudioFileFormat.Type.WAVE, bos)
    val d = AudioCodec.decode(bos.toByteArray).get
    assert(d.channels == 2 && d.nFrames == n)
    assert(math.abs(d.rms(0) - 0.5 / math.sqrt(2.0)) < 0.02, s"left rms ${d.rms(0)}")
    assert(d.rms(1) == 0f && d.peak(1) == 0f, "right channel must be silent")

    // big-endian container (AIFF): same mono sine must decode identically
    val beFmt = new AudioFormat(sr.toFloat, 16, 1, true, true)
    val beData = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val v = (0.5 * math.sin(2 * math.Pi * 440 * i / sr) * 32767).toInt
      beData(2 * i) = ((v >> 8) & 0xff).toByte
      beData(2 * i + 1) = (v & 0xff).toByte
    }
    val bos2 = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(beData), beFmt, n.toLong),
      AudioFileFormat.Type.AIFF, bos2)
    val d2 = AudioCodec.decode(bos2.toByteArray).get
    assert(d2.channels == 1 && d2.nFrames == n)
    assert(math.abs(d2.rms(0) - 0.5 / math.sqrt(2.0)) < 0.02, s"aiff rms ${d2.rms(0)}")
  }

  test("resizeImages really rescales: output PNG decodes to target dims") {
    val media = Multimodal.attachMedia(docs).filter("format = 'image/png'").limit(3)
    val out = Multimodal.resizeImages(media, 17, 11).collect()
    out.foreach { r =>
      val d = ImageCodec.decode(r.media).get
      assert(d.width == 17 && d.height == 11)
    }
  }

  test("sampleFrames: n frames per video row only") {
    val media = Multimodal.attachMedia(docs)
    val nVideos = media.filter("format = 'video/avi'").count()
    val frames = Multimodal.sampleFrames(media, 4)
    assert(frames.count() == nVideos * 4)
    val perDoc = frames.collect().groupBy(_.doc_id)
    assert(perDoc.values.forall(_.map(_.frame_idx).sorted.toSeq == Seq(0, 1, 2, 3)))
  }

  test("video path is REAL: AVI bytes parse, features carry true dims/fps/motion") {
    val media = Multimodal.attachMedia(docs)
    val vids = media.filter("format = 'video/avi'").limit(5).collect()
    assert(vids.nonEmpty)
    vids.foreach { r =>
      val bytes = r.getAs[Array[Byte]]("media")
      // RIFF/AVI magic
      assert(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' &&
        bytes(8) == 'A' && bytes(9) == 'V' && bytes(10) == 'I')
      val id = r.getAs[Long]("doc_id")
      val info = VideoCodec.probe(bytes).get
      assert(info.width == r.getAs[Int]("width"))
      assert(info.height == r.getAs[Int]("height"))
      assert(info.nFrames == (id % 6 + 3))
      assert(info.fps == 10.0)
      assert(info.durationMs == r.getAs[Long]("duration_ms"))
    }
    val feats = Multimodal.extractFeatures(media)
      .filter(_.format == "video/avi").collect()
    assert(feats.nonEmpty)
    val meta = media.filter("format = 'video/avi'").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("width"), r.getAs[Int]("height"))).toMap
    feats.foreach { f =>
      val (w, h) = meta(f.doc_id)
      assert(f.features(0) == w.toFloat && f.features(1) == h.toFloat)
      assert(f.features(2) == 10.0f, "true fps from the stream header")
      // pseudo-random frames: mid-range luma, nonzero spread, real motion
      assert(f.features(5) > 0.3f && f.features(5) < 0.7f,
        s"doc ${f.doc_id} meanLuma ${f.features(5)}")
      assert(f.features(6) > 0.05f, s"doc ${f.doc_id} stdLuma ${f.features(6)}")
      assert(f.features(7) > 0.05f,
        s"doc ${f.doc_id} motion ${f.features(7)} — frames differ, so must motion")
    }
  }

  test("perceptual hashes: identity, discrimination, resize invariance, dedup key") {
    // identity: same bytes → same hash
    val png = ImageCodec.encodePng(32, 24, seed = 7L)
    assert(ImageCodec.aHash(png) == ImageCodec.aHash(png.clone()))
    assert(ImageCodec.dHash(png) == ImageCodec.dHash(png.clone()))
    // resize invariance on STRUCTURED content: a gradient image rescaled
    // 2x keeps region means, so the hash drifts at most a few bits
    val grad = {
      val img = new java.awt.image.BufferedImage(64, 48,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 48; x <- 0 until 64) {
        val v = x * 255 / 63
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val resized = ImageCodec.resizePng(grad, 128, 96).get
    val drift = java.lang.Long.bitCount(
      ImageCodec.aHash(grad).get ^ ImageCodec.aHash(resized).get)
    assert(drift <= 6, s"gradient aHash drifted $drift bits under 2x resize")
    // discrimination: different images → different hashes
    val other = ImageCodec.encodePng(32, 24, seed = 8L)
    assert(ImageCodec.aHash(png) != ImageCodec.aHash(other))
    // dataset op: total, deterministic, one row per image row
    val media = Multimodal.attachMedia(docs)
    val h1 = Multimodal.imageHashes(media).collect()
    val h2 = Multimodal.imageHashes(media).collect()
    assert(h1.length == media.filter("format = 'image/png'").count())
    assert(h1.map(r => r.doc_id -> (r.ahash, r.dhash)).toMap ==
      h2.map(r => r.doc_id -> (r.ahash, r.dhash)).toMap)
    assert(h1.forall(r => r.resized_hamming >= 0 && r.resized_hamming <= 64))
    // dedup key behavior: exact duplicates (same seed) bucket together
    val dup = ImageCodec.encodePng(32, 24, seed = 7L)
    assert(ImageCodec.aHash(dup) == ImageCodec.aHash(png))
  }

  test("sampleFrames hashes REAL decoded pixels: distinct across frames, stable across runs") {
    val media = Multimodal.attachMedia(docs).filter("format = 'video/avi'").limit(3)
    val f1 = Multimodal.sampleFrames(media, 3).collect()
    val f2 = Multimodal.sampleFrames(media, 3).collect()
    assert(f1.map(f => (f.doc_id, f.frame_idx) -> f.frame_hash).toMap ==
      f2.map(f => (f.doc_id, f.frame_idx) -> f.frame_hash).toMap)
    // different source frames → different pixel content → different hashes
    f1.groupBy(_.doc_id).values.foreach { fs =>
      assert(fs.map(_.frame_hash).distinct.length == fs.length,
        s"frame hashes must differ within doc ${fs.head.doc_id}")
    }
    // offsets follow the true 10 fps timebase
    f1.filter(_.frame_idx == 0).foreach(f => assert(f.offset_ms == 0L))
  }
}
