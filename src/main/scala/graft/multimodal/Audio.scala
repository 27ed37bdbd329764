package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Audio-column handling for training-data pipelines: WAV (RIFF) payloads as
  * opaque `binary` columns, decoded partition-wise on executors — the same
  * `mapPartitions` seam as the image codecs in [[Multimodal]], so a 100 TB
  * audio corpus streams through without driver involvement.
  *
  * The codec is REAL and pure-JVM: [[decodeWavHeaders]] walks RIFF chunks
  * (honoring the spec's word alignment — odd-sized chunks carry a pad byte),
  * and [[decodeWavFeatures]] reads the 16-bit little-endian PCM samples out
  * of the `data` chunk and emits model-ready statistics (mean / RMS energy /
  * peak / zero-crossing count). Fixture payloads follow a closed-form sample
  * function of (id, i), so every statistic is ORACLE-ABLE: an engine-
  * independent SQL query recomputes them from `generate_series`.
  *
  * Reference scope note: the reference stores media as opaque blobs and has
  * no audio decode (samyama-graph models binary properties only); this is
  * beyond-parity surface required by the LLM-pipeline brief.
  */
object Audio {

  /** Closed-form fixture sample i of payload id: a full-swing deterministic
    * signal, `((id·31 + i·9973 + 12345) mod 65536) − 32768` — the 9973 step
    * wraps the modulus every ~6.5 samples, so the waveform genuinely
    * oscillates (non-trivial zero-crossing counts at every id). */
  @inline private[graft] def sampleAt(id: Long, i: Int): Int =
    (((id * 31 + i.toLong * 9973 + 12345) % 65536) - 32768).toInt

  /** A minimal REAL WAV container: RIFF header, `fmt ` chunk (PCM, mono,
    * 16-bit), a 7-byte `note` chunk (odd size → pad byte, so a decoder that
    * ignores RIFF word alignment mis-walks to garbage), then the `data`
    * chunk with `n` closed-form samples. */
  private[graft] def syntheticWav(id: Long, sampleRate: Int, n: Int): Array[Byte] = {
    val dataSize = n * 2
    // 12 (RIFF) + 24 (fmt) + 8 + 7 + 1 (note + pad) + 8 + data
    val out = new Array[Byte](60 + dataSize)
    def putLE32(off: Int, v: Int): Unit = {
      out(off) = (v & 0xFF).toByte; out(off + 1) = ((v >> 8) & 0xFF).toByte
      out(off + 2) = ((v >> 16) & 0xFF).toByte; out(off + 3) = ((v >> 24) & 0xFF).toByte
    }
    def putLE16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xFF).toByte; out(off + 1) = ((v >> 8) & 0xFF).toByte
    }
    def putTag(off: Int, s: String): Unit = {
      var i = 0; while (i < 4) { out(off + i) = s.charAt(i).toByte; i += 1 }
    }
    putTag(0, "RIFF"); putLE32(4, out.length - 8); putTag(8, "WAVE")
    putTag(12, "fmt "); putLE32(16, 16)
    putLE16(20, 1)                    // PCM
    putLE16(22, 1)                    // mono
    putLE32(24, sampleRate)
    putLE32(28, sampleRate * 2)       // byte rate
    putLE16(32, 2)                    // block align
    putLE16(34, 16)                   // bits per sample
    putTag(36, "note"); putLE32(40, 7) // odd-sized chunk: exercises padding
    var i = 0
    while (i < 7) { out(44 + i) = ('a' + i).toByte; i += 1 }
    // out(51) is the pad byte (zero)
    putTag(52, "data"); putLE32(56, dataSize)
    i = 0
    while (i < n) { putLE16(60 + i * 2, sampleAt(id, i) & 0xFFFF); i += 1 }
    out
  }

  /** Fixture media table keyed by an id column: each payload is a complete
    * WAV with `200 + (id mod 128)` samples at `sampleRate` Hz. */
  def syntheticWavMedia(ids: DataFrame, sampleRate: Int = 8000): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(ids.columns.head).cast("long")).as[Long]
      .map { id =>
        val n = (200 + ((id % 128) + 128) % 128).toInt
        (id, syntheticWav(id, sampleRate, n))
      }
      .toDF("media_id", "payload")
      .select(col("media_id"), col("payload"),
        struct(
          lit("audio").as("kind"),
          lit("wav").as("format"),
          lit(null).cast("int").as("width"),
          lit(null).cast("int").as("height"),
          lit(null).cast("long").as("duration_ms")).as("meta"))
  }

  final case class WavHeader(media_id: Long, format: String, channels: Int,
                             sample_rate: Int, bits_per_sample: Int,
                             n_samples: Long, duration_ms: Long)

  /** Parsed `fmt ` + located `data` chunk, or None for non-WAV payloads. */
  private def parseWav(b: Array[Byte]): Option[(Int, Int, Int, Int, Int)] = {
    def u8(i: Int): Int = b(i) & 0xFF
    def le32(i: Int): Int = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def tag(i: Int): String = new String(b, i, 4, "US-ASCII")
    if (b.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") None
    else {
      var channels = -1; var rate = -1; var bits = -1
      var dataOff = -1; var dataLen = -1
      var i = 12
      while (i + 8 <= b.length && (dataOff < 0 || channels < 0)) {
        val id = tag(i); val sz = le32(i + 4)
        if (sz < 0 || i + 8 + sz > b.length) i = b.length
        else {
          if (id == "fmt " && sz >= 16) {
            channels = le16(i + 10); rate = le32(i + 12); bits = le16(i + 22)
          } else if (id == "data") { dataOff = i + 8; dataLen = sz }
          i += 8 + sz + (sz & 1) // RIFF chunks are word-aligned
        }
      }
      if (channels <= 0 || rate <= 0 || bits <= 0 || dataOff < 0) None
      else Some((channels, rate, bits, dataOff, dataLen))
    }
  }

  /** REAL header-only WAV decode, partition-wise: RIFF chunk walk to the
    * `fmt ` and `data` chunks. Non-WAV payloads are dropped rather than
    * failing the batch. */
  def decodeWavHeaders(media: DataFrame): Dataset[WavHeader] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        val b = if (bytes == null) Array.empty[Byte] else bytes
        parseWav(b).map { case (channels, rate, bits, _, dataLen) =>
          val blockAlign = channels * (bits / 8)
          val n = if (blockAlign > 0) dataLen.toLong / blockAlign else 0L
          WavHeader(id, "wav", channels, rate, bits, n, n * 1000L / rate)
        }
      })
  }

  final case class WavFeatures(media_id: Long, n_samples: Long, mean: Double,
                               rms: Double, peak: Int, zero_crossings: Long)

  /** REAL PCM decode + feature extraction, partition-wise: reads the 16-bit
    * LE mono samples from the `data` chunk and emits mean amplitude, RMS
    * energy, peak |s|, and the zero-crossing count (strict sign flips,
    * `s_i · s_{i−1} < 0`). Sums stay in Long (exact) before the double
    * division, so results are accumulation-order-independent. */
  def decodeWavFeatures(media: DataFrame): Dataset[WavFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        val b = if (bytes == null) Array.empty[Byte] else bytes
        parseWav(b).collect { case (1, _, 16, dataOff, dataLen) =>
          val n = dataLen / 2
          var sum = 0L; var sumSq = 0L; var peak = 0; var zc = 0L
          var prev = 0
          var i = 0
          while (i < n) {
            val off = dataOff + i * 2
            val s = ((b(off) & 0xFF) | (b(off + 1) << 8)).toShort.toInt
            sum += s; sumSq += s.toLong * s
            val a = math.abs(s); if (a > peak) peak = a
            if (i > 0 && s.toLong * prev < 0) zc += 1
            prev = s
            i += 1
          }
          WavFeatures(id, n.toLong, sum.toDouble / n,
            math.sqrt(sumSq.toDouble / n), peak, zc)
        }
      })
  }
}
