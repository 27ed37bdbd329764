package graft

import graft.multimodal.Video

/** AVI codec: RIFF form walk (hdrl/avih + movi), frame sampling, and DIB
  * frame decode against the closed-form pixel function. */
class VideoSpec extends SparkSpec {
  import spark.implicits._

  test("header decode recovers avih fields") {
    val media = Video.syntheticAviMedia(Seq(0L, 5L, 23L).toDF("id"))
    val got = Video.decodeAviHeaders(media).collect().map(h => h.media_id -> h).toMap
    assert(got.keySet == Set(0L, 5L, 23L))
    got.values.foreach { h =>
      val (w, hh, n) = Video.dims(h.media_id)
      assert(h.format == "avi" && h.width == w && h.height == hh &&
        h.n_frames == n && h.fps == 25 && h.duration_ms == n.toLong * 1000 / 25)
    }
  }

  test("frame sampling decodes every k-th frame only, pixels match closed form") {
    val media = Video.syntheticAviMedia(Seq(9L).toDF("id"))
    val (w, h, n) = Video.dims(9L) // (25, 9, 8)
    val frames = Video.sampleFrames(media, 3).collect().sortBy(_.frame)
    assert(frames.map(_.frame).toSeq == (0 until n by 3).toSeq)
    frames.foreach { fr =>
      val exp = (0 until 3).map { ch =>
        (for (r <- 0 until h; c <- 0 until w) yield Video.channelAt(9L, fr.frame, r, c, ch))
          .sum.toDouble / (w * h)
      }
      assert(math.abs(fr.mean_b - exp(0)) < 1e-9)
      assert(math.abs(fr.mean_g - exp(1)) < 1e-9)
      assert(math.abs(fr.mean_r - exp(2)) < 1e-9)
      // top-left is image pixel (0,0) — order-sensitive through bottom-up rows
      assert(fr.tl_b == Video.channelAt(9L, fr.frame, 0, 0, 0))
      assert(fr.tl_g == Video.channelAt(9L, fr.frame, 0, 0, 1))
      assert(fr.tl_r == Video.channelAt(9L, fr.frame, 0, 0, 2))
    }
  }

  test("non-AVI payloads are dropped, not failed") {
    val junk = Seq((1L, Array[Byte]('R', 'I', 'F', 'F', 9, 0, 0, 0, 'W', 'A', 'V', 'E')),
      (2L, null.asInstanceOf[Array[Byte]])).toDF("media_id", "payload")
    assert(Video.decodeAviHeaders(junk).count() == 0)
    assert(Video.sampleFrames(junk, 2).count() == 0)
  }
}
