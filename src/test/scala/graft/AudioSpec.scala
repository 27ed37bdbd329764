package graft

import graft.multimodal.Audio

/** WAV codec: RIFF chunk walk (incl. odd-size padding), 16-bit LE PCM
  * sample decode, and feature statistics against brute-force recomputation. */
class AudioSpec extends SparkSpec {
  import spark.implicits._

  test("header decode recovers fmt fields through the odd-sized note chunk") {
    val media = Audio.syntheticWavMedia(Seq(0L, 7L, 129L).toDF("id"), sampleRate = 8000)
    val got = Audio.decodeWavHeaders(media).collect().map(h => h.media_id -> h).toMap
    assert(got.keySet == Set(0L, 7L, 129L))
    got.values.foreach { h =>
      assert(h.format == "wav" && h.channels == 1 && h.sample_rate == 8000 &&
        h.bits_per_sample == 16)
      assert(h.n_samples == 200 + h.media_id % 128)
      assert(h.duration_ms == h.n_samples * 1000 / 8000)
    }
  }

  test("feature decode matches brute-force stats on the closed-form samples") {
    val media = Audio.syntheticWavMedia(Seq(3L).toDF("id"))
    val f = Audio.decodeWavFeatures(media).collect().head
    val n = 203
    val s = (0 until n).map(i => Audio.sampleAt(3L, i))
    assert(f.n_samples == n)
    assert(math.abs(f.mean - s.map(_.toLong).sum.toDouble / n) < 1e-9)
    assert(math.abs(f.rms - math.sqrt(s.map(x => x.toLong * x).sum.toDouble / n)) < 1e-9)
    assert(f.peak == s.map(math.abs).max)
    assert(f.zero_crossings == s.sliding(2).count(p => p(0).toLong * p(1) < 0))
  }

  test("sign extension and oscillation: full-range peaks, real zero crossings") {
    val media = Audio.syntheticWavMedia(Seq(1L).toDF("id"))
    val f = Audio.decodeWavFeatures(media).collect().head
    assert(f.peak > 16384, "closed-form fixture swings full-range; peak must see it")
    assert(f.zero_crossings > 10, "the 9973-step waveform wraps every ~6.5 samples")
  }

  test("non-WAV payloads are dropped, not failed") {
    val junk = Seq((1L, Array[Byte](1, 2, 3)), (2L, null.asInstanceOf[Array[Byte]]))
      .toDF("media_id", "payload")
    assert(Audio.decodeWavHeaders(junk).count() == 0)
    assert(Audio.decodeWavFeatures(junk).count() == 0)
  }
}
