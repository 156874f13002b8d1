package graft

import graft.operators.{MediaRecord, Multimodal}

/** REAL audio decode/windowing through the JDK's bundled
  * javax.sound.sampled WAV parser (see Multimodal docs): PCM16 WAVs
  * with known sine/constant content are synthesized in-test, pushed
  * through the Dataset[MediaRecord] binary-column plumbing, and the
  * decoded metadata/windows are asserted analytically. This is the
  * gate that the multimodal decode tier is no longer a stub for
  * audio payloads.
  */
class AudioCodecSpec extends SparkSpec {
  import spark.implicits._

  /** PCM16LE WAV from the given [-1, 1] interleaved samples. */
  private def wav(samples: Array[Double], rate: Float,
      channels: Int = 1): Array[Byte] = {
    val pcm = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      val s = math.max(-32768,
        math.min(32767, math.round(samples(i) * 32767).toInt)).toShort
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, channels,
      true, false)
    val in = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt,
      (samples.length / channels).toLong)
    val buf = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(in,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, buf)
    buf.toByteArray
  }

  private def sine(n: Int, period: Int, amp: Double): Array[Double] =
    Array.tabulate(n)(i => amp * math.sin(2 * math.Pi * i / period))

  private def records: Seq[MediaRecord] = Seq(
    MediaRecord(1L, "audio/wav", wav(sine(8000, 100, 0.5), 8000f)),
    MediaRecord(2L, "audio/wav", wav(Array.fill(4000)(0.25), 16000f)),
    MediaRecord(3L, "application/octet-stream",
      Array[Byte](9, 9, 9, 9, 9, 9, 9, 9)), // corrupt
    // header-valid but truncated mid-data: the RIFF header parses
    // (getAudioInputStream succeeds) and the PCM read stops at the
    // real EOF — decode must survive (the read sits under the same
    // corrupt-record catch as the header parse, for decoder SPIs
    // that throw instead) and report the SAMPLES PRESENT, not the
    // header's declared length
    MediaRecord(4L, "audio/wav",
      wav(sine(8000, 100, 0.5), 8000f).take(60)))

  test("decodeWav: real format header + RMS; corrupt rows dropped") {
    val got = Multimodal.decodeWav(records.toDS())
      .collect().sortBy(_.doc_id)
    assert(got.map(_.doc_id).toSeq == Seq(1L, 2L, 4L),
      "corrupt payload must be dropped, decodables kept")
    // truncated record: 60 bytes − 44-byte header = 8 int16 samples
    assert(got(2).n_samples == 8L,
      s"truncated WAV should decode its present samples: ${got(2)}")
    val s1 = got(0)
    assert(s1.sample_rate == 8000 && s1.channels == 1 &&
      s1.n_samples == 8000)
    // sine RMS = amp/sqrt(2); int16 quantization costs < 1e-3
    assert(math.abs(s1.rms - 0.5 / math.sqrt(2)) < 1e-3,
      s"sine RMS off: ${s1.rms}")
    val s2 = got(1)
    assert(s2.sample_rate == 16000 && s2.n_samples == 4000)
    assert(math.abs(s2.rms - 0.25) < 1e-3, s"DC RMS off: ${s2.rms}")
  }

  test("windowAudio: frame arithmetic, per-window RMS, zero crossings") {
    val win = Multimodal
      .windowAudio(records.toDS(), windowSamples = 1000, hopSamples = 500)
      .collect().groupBy(_.doc_id)
    // doc 1: 8000 samples, window 1000 hop 500 → starts 0..7000 = 15
    val w1 = win(1L).sortBy(_.window_no)
    assert(w1.length == 15, s"expected 15 windows, got ${w1.length}")
    assert(w1.map(_.start_sample).toSeq == (0 to 7000 by 500).toSeq)
    // a full number of periods per window → every window has the
    // same RMS as the whole sine
    w1.foreach(w => assert(math.abs(w.rms - 0.5 / math.sqrt(2)) < 1e-3,
      s"window ${w.window_no} RMS off: ${w.rms}"))
    // period 100 → 2 sign flips per period → 20/window (±1 boundary)
    w1.foreach(w => assert(math.abs(w.zero_crossings - 20) <= 1,
      s"window ${w.window_no} zc off: ${w.zero_crossings}"))
    // doc 2: constant positive signal never crosses zero
    val w2 = win(2L)
    assert(w2.length == 7 && w2.forall(_.zero_crossings == 0))
    // corrupt doc emits nothing; truncated doc (8 samples) has no
    // full window and emits nothing — but kills no task
    assert(!win.contains(3L) && !win.contains(4L))
  }

  test("stereo WAV: decodeWav reports frames; windowAudio skips non-mono") {
    import graft.operators.MediaRecord
    // 2000 frames of stereo: loud left, quiet INVERTED right — the
    // interleaved stream alternates sign nearly every sample, so a
    // channel-blind zero-crossing count would read ~windowSamples
    // while neither channel crosses zero
    val frames = 2000
    val inter = new Array[Double](frames * 2)
    (0 until frames).foreach { i =>
      inter(2 * i) = 0.5; inter(2 * i + 1) = -0.1
    }
    val stereo = Seq(MediaRecord(9L, "audio/wav",
      wav(inter, 8000f, channels = 2))).toDS()
    val meta = Multimodal.decodeWav(stereo).collect()
    assert(meta.length == 1 && meta.head.channels == 2)
    assert(meta.head.n_samples == frames,
      s"n_samples must count FRAMES, got ${meta.head.n_samples}")
    // RMS over interleaved samples = total cross-channel energy
    val want = math.sqrt((0.5 * 0.5 + 0.1 * 0.1) / 2)
    assert(math.abs(meta.head.rms - want) < 1e-3, s"${meta.head.rms}")
    // single-signal features are undefined on interleaved stereo —
    // the record is skipped, not scored with meaningless numbers
    assert(Multimodal.windowAudio(stereo, 500, 250).collect().isEmpty)
  }
}
