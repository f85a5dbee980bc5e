package graft.ext

import org.scalatest.funsuite.AnyFunSuite

class VideoCodecSpec extends AnyFunSuite {

  test("encode → probe round-trip: dims, fps, frame count, duration") {
    val bytes = VideoCodec.encodeAvi(24, 18, 7, 10, seed = 42L)
    val info = VideoCodec.probe(bytes).get
    assert(info.width == 24 && info.height == 18)
    assert(info.fps == 10.0)
    assert(info.nFrames == 7)
    assert(info.durationMs == 700L)
  }

  test("every frame decodes as a real JPEG with the declared dimensions") {
    val bytes = VideoCodec.encodeAvi(20, 14, 5, 25, seed = 7L)
    assert(VideoCodec.frameRanges(bytes).size == 5)
    (0 until 5).foreach { i =>
      val img = VideoCodec.decodeFrame(bytes, i).get
      assert(img.getWidth == 20 && img.getHeight == 14, s"frame $i dims")
    }
    // JPEG SOI marker at each frame range start
    VideoCodec.frameRanges(bytes).foreach { case (off, _) =>
      assert((bytes(off) & 0xff) == 0xff && (bytes(off + 1) & 0xff) == 0xd8,
        "frame chunks must hold raw JPEG (FFD8 SOI)")
    }
    assert(VideoCodec.decodeFrame(bytes, 5).isEmpty, "index past end → None")
    assert(VideoCodec.decodeFrame(bytes, -1).isEmpty)
  }

  test("encoding is deterministic; different seeds give different frames") {
    val a1 = VideoCodec.encodeAvi(16, 12, 3, 10, seed = 1L)
    val a2 = VideoCodec.encodeAvi(16, 12, 3, 10, seed = 1L)
    assert(a1.sameElements(a2), "same input → identical bytes")
    val b = VideoCodec.encodeAvi(16, 12, 3, 10, seed = 2L)
    assert(!a1.sameElements(b))
    val h1 = VideoCodec.pixelHash(VideoCodec.decodeFrame(a1, 0).get)
    val h2 = VideoCodec.pixelHash(VideoCodec.decodeFrame(a2, 0).get)
    assert(h1 == h2, "pixel hash stable across encodes of the same content")
  }

  test("stats: luma/motion over sampled frames are real and plausible") {
    val bytes = VideoCodec.encodeAvi(32, 24, 8, 10, seed = 99L)
    val s = VideoCodec.stats(bytes, sampleN = 4).get
    assert(s.sampledFrames == 4)
    assert(s.info.nFrames == 8)
    // uniform pseudo-random pixels: mean luma near 0.5, spread present
    assert(s.meanLuma > 0.35f && s.meanLuma < 0.65f, s"meanLuma ${s.meanLuma}")
    assert(s.stdLuma > 0.05f, s"stdLuma ${s.stdLuma}")
    // independent random frames: expected |Δ| of two uniform lumas > 0
    assert(s.motion > 0.05f, s"motion ${s.motion}")
    // sampleN above frame count clamps instead of failing
    assert(VideoCodec.stats(bytes, sampleN = 100).get.sampledFrames == 8)
  }

  test("malformed payloads are None/empty, never throw") {
    assert(VideoCodec.probe(Array[Byte]()).isEmpty)
    assert(VideoCodec.probe("not a video".getBytes).isEmpty)
    assert(VideoCodec.probe("RIFFxxxxWAVE".getBytes).isEmpty, "WAV is not AVI")
    val good = VideoCodec.encodeAvi(16, 12, 3, 10, seed = 5L)
    // truncate mid-movi: parser must degrade gracefully
    val cut = java.util.Arrays.copyOf(good, good.length / 2)
    assert(VideoCodec.stats(cut).isEmpty || VideoCodec.stats(cut).nonEmpty) // no throw
    // corrupt a frame body: that frame fails, container survives
    val corrupt = good.clone()
    val (off, len) = VideoCodec.frameRanges(good).head
    java.util.Arrays.fill(corrupt, off + 2, off + len, 0.toByte)
    assert(VideoCodec.probe(corrupt).nonEmpty)
    assert(VideoCodec.decodeFrame(corrupt, 0).isEmpty ||
      VideoCodec.decodeFrame(corrupt, 0).nonEmpty) // no throw either way
  }
}
