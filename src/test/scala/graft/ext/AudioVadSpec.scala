package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Energy-VAD semantics on planted amplitude envelopes: silence gaps
  * split segments exactly at the frame-grid boundaries, all-silence
  * yields nothing, and the Spark-side operator reproduces the per-clip
  * codec result. */
class AudioVadSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val rate = 8000 // 20 ms frame = 160 samples

  test("voice-silence-voice envelope splits into two on-grid segments") {
    val wav = AudioCodec.encodeWavEnvelope(
      Seq((1600, 0.5), (1600, 0.0), (1600, 0.5)), rate, 440.0)
    val segs = AudioCodec.vadSegments(wav, frameMs = 20, thresholdMilli = 50)
    assert(segs == Seq(
      AudioCodec.VadSegment(0L, 200L, 10),
      AudioCodec.VadSegment(400L, 600L, 10)))
  }

  test("all-silence yields no segments; all-voice yields one full segment") {
    val silent = AudioCodec.encodeWavEnvelope(Seq((3200, 0.0)), rate, 440.0)
    assert(AudioCodec.vadSegments(silent).isEmpty)
    val voiced = AudioCodec.encodeWavEnvelope(Seq((3200, 0.5)), rate, 440.0)
    assert(AudioCodec.vadSegments(voiced) ==
      Seq(AudioCodec.VadSegment(0L, 400L, 20)))
  }

  test("threshold separates quiet hum from speech-level energy") {
    // amplitude 0.05 -> rms ~35 milli: voiced at threshold 20, not at 50
    val quiet = AudioCodec.encodeWavEnvelope(Seq((1600, 0.05)), rate, 440.0)
    assert(AudioCodec.vadSegments(quiet, thresholdMilli = 50).isEmpty)
    assert(AudioCodec.vadSegments(quiet, thresholdMilli = 20).nonEmpty)
  }

  test("undecodable bytes contribute no segments") {
    assert(AudioCodec.vadSegments("not audio".getBytes).isEmpty)
  }

  test("Spark operator: segments per doc match the driver-side codec") {
    val spark0 = spark
    import spark0.implicits._
    val wav = AudioCodec.encodeWavEnvelope(
      Seq((1600, 0.5), (1600, 0.0), (1600, 0.5)), rate, 440.0)
    val media = Seq(
      (1L, wav, "audio/wav", 0, 0, 600L),
      (2L, Array[Byte](1, 2, 3), "image/png", 8, 8, 0L))
      .toDF("doc_id", "media", "format", "width", "height", "duration_ms")
    val got = Multimodal.audioVad(media).collect()
      .map(r => (r.doc_id, r.seg_idx, r.start_ms, r.end_ms)).toSet
    assert(got == Set((1L, 0, 0L, 200L), (1L, 1, 400L, 600L)))
    // r13: the clip duration rides on every segment row, so bound checks
    // need no second decode pass over the media frame
    assert(Multimodal.audioVad(media).collect().map(_.clip_ms).toSet
      == Set(600L))
  }
}
