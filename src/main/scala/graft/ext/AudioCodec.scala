package graft.ext

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** Real, JDK-native audio codec (javax.sound.sampled — zero extra
  * dependencies, the same route ImageCodec takes for PNG): WAV/PCM16
  * encode/decode plus per-channel amplitude statistics. Video decodes for
  * real too (VideoCodec) — the whole multimodal surface is genuine media.
  *
  * Executor-side and allocation-conscious: decode is called from
  * mapPartitions batches, one clip at a time.
  */
object AudioCodec {

  /** Decoded audio summary: format facts plus per-channel RMS and peak
    * amplitude in [0,1] — the cheap audio-quality features (silence /
    * clipping detection) a curation pipeline gates on. */
  final case class DecodedAudio(sampleRateHz: Float, channels: Int,
                                nFrames: Long, durationMs: Long,
                                rms: Array[Float], peak: Array[Float])

  /** Deterministic mono PCM16 WAV: a sine at `freqHz` scaled by
    * `amplitude`, containerized by AudioSystem (canonical RIFF header, no
    * timestamps → identical inputs give identical bytes). */
  def encodeWav(nSamples: Int, sampleRateHz: Int, freqHz: Double,
                amplitude: Double): Array[Byte] = {
    require(nSamples > 0 && sampleRateHz > 0, "positive samples/rate")
    val fmt = new AudioFormat(sampleRateHz.toFloat, 16, 1,
      /* signed = */ true, /* bigEndian = */ false)
    val data = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val v = (amplitude *
        math.sin(2.0 * math.Pi * freqHz * i / sampleRateHz) * 32767.0).toInt
      data(2 * i) = (v & 0xff).toByte
      data(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new AudioInputStream(
      new ByteArrayInputStream(data), fmt, nSamples.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Decode any AudioSystem-supported container holding signed PCM16
    * (WAV/AIFF/AU); None when the bytes aren't decodable audio. */
  def decode(bytes: Array[Byte]): Option[DecodedAudio] =
    try {
      val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      try {
        val fmt = ais.getFormat
        if (fmt.getSampleSizeInBits != 16 ||
            fmt.getEncoding != AudioFormat.Encoding.PCM_SIGNED) None
        else {
          val ch = fmt.getChannels
          val frameBytes = fmt.getFrameSize
          val buf = ais.readAllBytes()
          val nFrames = buf.length / frameBytes
          val sumSq = new Array[Double](ch)
          val pk = new Array[Double](ch)
          var f = 0
          while (f < nFrames) {
            var c = 0
            while (c < ch) {
              val off = f * frameBytes + c * 2
              val v = (if (fmt.isBigEndian)
                  ((buf(off) << 8) | (buf(off + 1) & 0xff)).toShort
                else ((buf(off + 1) << 8) | (buf(off) & 0xff)).toShort
                ).toDouble / 32768.0
              sumSq(c) += v * v
              if (math.abs(v) > pk(c)) pk(c) = math.abs(v)
              c += 1
            }
            f += 1
          }
          val rms = Array.tabulate(ch)(c =>
            if (nFrames == 0) 0f else math.sqrt(sumSq(c) / nFrames).toFloat)
          Some(DecodedAudio(fmt.getSampleRate, ch, nFrames.toLong,
            if (fmt.getSampleRate > 0)
              (nFrames * 1000L / fmt.getSampleRate.toLong) else 0L,
            rms, pk.map(_.toFloat)))
        }
      } finally ais.close()
    } catch { case _: Exception => None }

  /** One voice-activity segment on the frame grid: [startMs, endMs) with
    * `nFrames` consecutive voiced frames. */
  final case class VadSegment(startMs: Long, endMs: Long, nFrames: Int)

  /** Voice-activity detection over PCM16 audio — the speech-curation
    * primitive (silence stripping, speech-density gating) run BEFORE any
    * heavyweight ASR: fold channels to mono, window into `frameMs`
    * frames, mark a frame voiced when its milli-RMS (floor(1000·rms))
    * reaches `thresholdMilli`, and merge voiced runs into segments on
    * the frame grid. Energy VAD, deliberately: deterministic, exact
    * integers at the decision boundary, no model weights — the honest
    * baseline every production VAD degrades to when its model is absent.
    * Returns Nil for undecodable or non-PCM16 payloads (callers treat
    * that as "no speech evidence", the [[decode]] totality convention).
    * The tail frame may be shorter than `frameMs`; its RMS is over the
    * samples present. */
  def vadSegments(bytes: Array[Byte], frameMs: Int = 20,
                  thresholdMilli: Long = 50): Seq[VadSegment] =
    try {
      val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      try {
        val fmt = ais.getFormat
        if (fmt.getSampleSizeInBits != 16 ||
            fmt.getEncoding != AudioFormat.Encoding.PCM_SIGNED ||
            fmt.getSampleRate <= 0 || frameMs <= 0) Nil
        else {
          val ch = fmt.getChannels
          val frameBytes = fmt.getFrameSize
          val buf = ais.readAllBytes()
          val n = buf.length / frameBytes
          val perFrame = math.max(1,
            (fmt.getSampleRate.toDouble * frameMs / 1000.0).toInt)
          val nWin = (n + perFrame - 1) / perFrame
          val segs = scala.collection.mutable.ArrayBuffer.empty[VadSegment]
          var segStart = -1
          var w = 0
          while (w < nWin) {
            var sumSq = 0.0
            var cnt = 0
            var i = w * perFrame
            val end = math.min(n, (w + 1) * perFrame)
            while (i < end) {
              var acc = 0.0
              var c = 0
              while (c < ch) {
                val off = i * frameBytes + c * 2
                val v = (if (fmt.isBigEndian)
                    ((buf(off) << 8) | (buf(off + 1) & 0xff)).toShort
                  else ((buf(off + 1) << 8) | (buf(off) & 0xff)).toShort
                  ).toDouble / 32768.0
                acc += v
                c += 1
              }
              val m = acc / ch
              sumSq += m * m
              cnt += 1
              i += 1
            }
            val rmsMilli =
              if (cnt == 0) 0L
              else math.floor(math.sqrt(sumSq / cnt) * 1000.0).toLong
            val voiced = rmsMilli >= thresholdMilli
            if (voiced && segStart < 0) segStart = w
            if (!voiced && segStart >= 0) {
              segs += VadSegment(segStart.toLong * frameMs,
                w.toLong * frameMs, w - segStart)
              segStart = -1
            }
            w += 1
          }
          if (segStart >= 0)
            segs += VadSegment(segStart.toLong * frameMs,
              nWin.toLong * frameMs, nWin - segStart)
          segs.toSeq
        }
      } finally ais.close()
    } catch { case _: Exception => Nil }

  /** Deterministic mono PCM16 WAV from an amplitude envelope: consecutive
    * (nSamples, amplitude) spans of the same sine — the silence-gap
    * fixture generator [[vadSegments]]'s spec plants. */
  def encodeWavEnvelope(spans: Seq[(Int, Double)], sampleRateHz: Int,
                        freqHz: Double): Array[Byte] = {
    require(spans.nonEmpty && spans.forall(_._1 > 0), "positive span sizes")
    val total = spans.map(_._1).sum
    val fmt = new AudioFormat(sampleRateHz.toFloat, 16, 1, true, false)
    val data = new Array[Byte](total * 2)
    var i = 0
    var base = 0
    spans.foreach { case (nS, amp) =>
      var j = 0
      while (j < nS) {
        val t = base + j
        val v = (amp *
          math.sin(2.0 * math.Pi * freqHz * t / sampleRateHz) * 32767.0).toInt
        data(2 * i) = (v & 0xff).toByte
        data(2 * i + 1) = ((v >> 8) & 0xff).toByte
        i += 1
        j += 1
      }
      base += nS
    }
    val ais = new AudioInputStream(
      new ByteArrayInputStream(data), fmt, total.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }
}
