package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Video-column handling for training-data pipelines: AVI (RIFF) payloads as
  * opaque `binary` columns with frame sampling + per-frame decode running
  * partition-wise — the `mapPartitions` seam shared with [[Multimodal]] and
  * [[Audio]]. This replaces the earlier metadata-only frame-sample stub with
  * a REAL pure-JVM container parser.
  *
  * The fixture is a COMPLETE uncompressed AVI: `RIFF('AVI ')` form holding an
  * `hdrl` LIST (`avih` main header + `strl` stream LIST with `strh`/`strf`
  * BITMAPINFOHEADER) and a `movi` LIST of `00db` device-independent-bitmap
  * frames (bottom-up BGR rows, 4-byte stride — the same DIB layout the BMP
  * codec walks). Frame pixels follow a closed form of (id, frame, row, col,
  * channel), so header fields and every per-frame statistic are ORACLE-ABLE
  * from `generate_series`.
  *
  * Reference scope note: the reference stores media as opaque blobs (no video
  * decode); beyond-parity surface required by the LLM-pipeline brief.
  */
object Video {

  /** Closed-form channel value (BGR order, ch 0=B) of pixel (r, c) in frame
    * f of payload id: `(id·7 + f·13 + r·5 + c·3 + ch·11) mod 256`. */
  @inline private[graft] def channelAt(id: Long, f: Int, r: Int, c: Int, ch: Int): Int =
    ((id * 7 + f * 13 + r * 5 + c * 3 + ch * 11) % 256).toInt

  /** Fixture dimensions/length for payload id (kept tiny: the point is the
    * container walk, not pixel volume). */
  @inline private[graft] def dims(id: Long): (Int, Int, Int) =
    ((16 + ((id % 16) + 16) % 16).toInt, (8 + ((id % 8) + 8) % 8).toInt,
      (4 + ((id % 5) + 5) % 5).toInt) // (w, h, nFrames)

  /** A minimal REAL AVI container: RIFF form with hdrl (avih + strl) and a
    * movi LIST of `00db` DIB frames. `fps` drives dwMicroSecPerFrame. */
  private[graft] def syntheticAvi(id: Long, w: Int, h: Int, nFrames: Int,
                                  fps: Int = 25): Array[Byte] = {
    val stride = (w * 3 + 3) & ~3
    val frameSize = stride * h
    val perFrame = 8 + frameSize                 // '00db' + size + payload
    val moviSize = 4 + nFrames * perFrame        // 'movi' tag + frames
    val hdrlSize = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40)) // 'hdrl'+avih+strl
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
    val out = new Array[Byte](8 + riffSize)
    var p = 0
    def tag(s: String): Unit = { var i = 0; while (i < 4) { out(p + i) = s.charAt(i).toByte; i += 1 }; p += 4 }
    def le32(v: Int): Unit = {
      out(p) = (v & 0xFF).toByte; out(p + 1) = ((v >> 8) & 0xFF).toByte
      out(p + 2) = ((v >> 16) & 0xFF).toByte; out(p + 3) = ((v >> 24) & 0xFF).toByte; p += 4
    }
    tag("RIFF"); le32(riffSize); tag("AVI ")
    tag("LIST"); le32(hdrlSize); tag("hdrl")
    tag("avih"); le32(56)
    le32(1000000 / fps)   // dwMicroSecPerFrame
    le32(0); le32(0); le32(0)
    le32(nFrames)         // dwTotalFrames
    le32(0); le32(1)      // dwInitialFrames, dwStreams
    le32(frameSize)       // dwSuggestedBufferSize
    le32(w); le32(h)
    le32(0); le32(0); le32(0); le32(0) // dwReserved[4]
    tag("LIST"); le32(4 + (8 + 56) + (8 + 40)); tag("strl")
    tag("strh"); le32(56)
    tag("vids"); tag("DIB ")
    le32(0); le32(0); le32(0)
    le32(1); le32(fps)    // dwScale / dwRate → fps
    le32(0); le32(nFrames); le32(frameSize); le32(-1); le32(0)
    le32(0); le32(0)      // rcFrame as two words
    tag("strf"); le32(40) // BITMAPINFOHEADER
    le32(40); le32(w); le32(h)
    out(p) = 1; p += 2    // biPlanes (u16)
    out(p) = 24; p += 2   // biBitCount (u16)
    le32(0); le32(frameSize); le32(0); le32(0); le32(0); le32(0)
    tag("LIST"); le32(moviSize); tag("movi")
    var f = 0
    while (f < nFrames) {
      tag("00db"); le32(frameSize)
      var r = 0
      while (r < h) {
        val rowOff = p + (h - 1 - r) * stride // bottom-up storage
        var c = 0
        while (c < w) {
          var ch = 0
          while (ch < 3) {
            out(rowOff + c * 3 + ch) = channelAt(id, f, r, c, ch).toByte
            ch += 1
          }
          c += 1
        }
        r += 1
      }
      p += frameSize
      f += 1
    }
    require(p == out.length, s"AVI writer layout drift: $p != ${out.length}")
    out
  }

  /** Fixture media table keyed by an id column. */
  def syntheticAviMedia(ids: DataFrame, fps: Int = 25): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(ids.columns.head).cast("long")).as[Long]
      .map { id =>
        val (w, h, n) = dims(id)
        (id, syntheticAvi(id, w, h, n, fps), w, h, n.toLong * 1000 / fps)
      }
      .toDF("media_id", "payload", "_w", "_h", "_dur")
      .select(col("media_id"), col("payload"),
        struct(
          lit("video").as("kind"),
          lit("avi").as("format"),
          col("_w").as("width"),
          col("_h").as("height"),
          col("_dur").as("duration_ms")).as("meta"))
  }

  final case class AviHeader(media_id: Long, format: String, width: Int, height: Int,
                             n_frames: Int, fps: Int, duration_ms: Long)

  private def le32At(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8) | ((b(i + 2) & 0xFF) << 16) | ((b(i + 3) & 0xFF) << 24)
  private def tagAt(b: Array[Byte], i: Int): String = new String(b, i, 4, "US-ASCII")

  /** Walk the RIFF tree and return (avih offset, movi body offset+len), or
    * None when the payload is not an AVI. */
  private def locate(b: Array[Byte]): Option[(Int, Int, Int)] = {
    if (b.length < 24 || tagAt(b, 0) != "RIFF" || tagAt(b, 8) != "AVI ") None
    else {
      var avih = -1; var moviOff = -1; var moviLen = -1
      var i = 12
      while (i + 8 <= b.length && (avih < 0 || moviOff < 0)) {
        val id = tagAt(b, i); val sz = le32At(b, i + 4)
        if (sz < 0 || i + 8 + sz > b.length) i = b.length
        else {
          if (id == "LIST" && sz >= 4) {
            val kind = tagAt(b, i + 8)
            if (kind == "hdrl") {
              // avih is hdrl's first child chunk
              if (i + 20 <= b.length && tagAt(b, i + 12) == "avih") avih = i + 20
            } else if (kind == "movi") { moviOff = i + 12; moviLen = sz - 4 }
          }
          i += 8 + sz + (sz & 1)
        }
      }
      if (avih < 0 || moviOff < 0) None else Some((avih, moviOff, moviLen))
    }
  }

  /** REAL header-only AVI decode, partition-wise: RIFF walk to the `avih`
    * main header. Non-AVI payloads are dropped rather than failing the
    * batch. fps is derived from dwMicroSecPerFrame (rounded down). */
  def decodeAviHeaders(media: DataFrame): Dataset[AviHeader] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        val b = if (bytes == null) Array.empty[Byte] else bytes
        locate(b).map { case (avih, _, _) =>
          val usPerFrame = le32At(b, avih)
          val nFrames = le32At(b, avih + 16)
          val w = le32At(b, avih + 32); val h = le32At(b, avih + 36)
          val fps = if (usPerFrame > 0) 1000000 / usPerFrame else 0
          val dur = if (fps > 0) nFrames.toLong * 1000 / fps else -1L
          AviHeader(id, "avi", w, h, nFrames, fps, dur)
        }
      })
  }

  final case class VideoFrame(media_id: Long, frame: Int, width: Int, height: Int,
                              mean_b: Double, mean_g: Double, mean_r: Double,
                              tl_b: Int, tl_g: Int, tl_r: Int)

  /** REAL frame sampling + per-frame DIB decode, partition-wise: walks the
    * `movi` LIST, takes every `every`-th `00db` frame, decodes the bottom-up
    * BGR rows honoring the 4-byte stride, and emits channel means plus the
    * order-sensitive top-left pixel — the image codec's contract, per frame.
    * At 100 TB this is the shape you want: sampling happens INSIDE the
    * payload walk (skipped frames are never decoded), and each payload is
    * independent work on its executor. */
  def sampleFrames(media: DataFrame, every: Int): Dataset[VideoFrame] = {
    require(every >= 1, s"every must be >= 1, got $every")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        val b = if (bytes == null) Array.empty[Byte] else bytes
        locate(b).toSeq.flatMap { case (avih, moviOff, moviLen) =>
          val w = le32At(b, avih + 32); val h = le32At(b, avih + 36)
          val stride = (w * 3 + 3) & ~3
          val frames = Seq.newBuilder[VideoFrame]
          var i = moviOff; var f = 0
          val end = moviOff + moviLen
          while (i + 8 <= end) {
            val id4 = tagAt(b, i); val sz = le32At(b, i + 4)
            if (sz < 0 || i + 8 + sz > end) i = end
            else {
              if ((id4 == "00db" || id4 == "00dc") && sz >= stride * h) {
                if (f % every == 0) {
                  val off = i + 8
                  var sb = 0L; var sg = 0L; var sr = 0L
                  var r = 0
                  while (r < h) {
                    val rowOff = off + (h - 1 - r) * stride
                    var c = 0
                    while (c < w) {
                      sb += b(rowOff + c * 3) & 0xFF
                      sg += b(rowOff + c * 3 + 1) & 0xFF
                      sr += b(rowOff + c * 3 + 2) & 0xFF
                      c += 1
                    }
                    r += 1
                  }
                  val n = w.toLong * h
                  val tl = off + (h - 1) * stride
                  frames += VideoFrame(id, f, w, h,
                    sb.toDouble / n, sg.toDouble / n, sr.toDouble / n,
                    b(tl) & 0xFF, b(tl + 1) & 0xFF, b(tl + 2) & 0xFF)
                }
                f += 1
              }
              i += 8 + sz + (sz & 1)
            }
          }
          frames.result()
        }
      })
  }
}
