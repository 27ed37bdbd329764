package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling for training-data pipelines (beyond-parity
  * surface): media payloads are opaque `binary` columns travelling next to a
  * typed metadata struct; decode/feature-extraction runs partition-wise so a
  * 100 TB corpus streams through executors without driver involvement.
  *
  * Codec status: ALL image paths are REAL pure-JVM implementations — header
  * decode (BMP/PNG/GIF/JPEG dimension parse from bytes), full 24bpp BMP pixel
  * decode ([[decodeBmpPixels]], hand-rolled codec), and compressed-format
  * pixel decode ([[decodeImagePixels]], `javax.imageio` — the JDK's
  * `java.desktop` module ships PNG/JPEG/GIF/TIFF/BMP readers). Feature
  * extraction ([[decodeFeatures]]) decodes pixels and emits channel
  * statistics + a luminance histogram; payloads no reader accepts fall back
  * to a deterministic content-hash feature rather than failing the batch.
  * Audio/video decode (no JDK codec exists) would plug into the same
  * `mapPartitions` seam.
  */
object Multimodal {

  /** Canonical multimodal schema: id + opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("kind", StringType),      // image | audio | video
      StructField("format", StringType),    // e.g. jpeg, wav, mp4
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType))), nullable = true)))

  /** Build a media table from the documents fixture: each payload is a REAL
    * BMP file — a valid 54-byte BITMAPINFOHEADER (deterministic per-row
    * dimensions) followed by the document's UTF-8 bytes standing in for
    * pixel data. Downstream decode then parses an actual image container,
    * not a blessed column. */
  def mediaFromDocuments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("body"))
      .as[(Long, Array[Byte])]
      .map { case (id, body0) =>
        val body = if (body0 == null) Array.empty[Byte] else body0
        val w = (((id % 64) + 64) % 64 + 16).toInt
        val h = (((id % 48) + 48) % 48 + 16).toInt
        (id, bmpWrap(w, h, body), w, h)
      }
      .toDF("media_id", "payload", "_w", "_h")
      .select(col("media_id"), col("payload"),
        struct(
          lit("image").as("kind"),
          lit("bmp").as("format"),
          col("_w").as("width"),
          col("_h").as("height"),
          lit(null).cast("long").as("duration_ms")).as("meta"))
  }

  /** A minimal valid BMP container: 14-byte file header + 40-byte
    * BITMAPINFOHEADER (BI_RGB, 24bpp), then `body` as the pixel data. */
  private[graft] def bmpWrap(w: Int, h: Int, body: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](54 + body.length)
    def putLE32(off: Int, v: Int): Unit = {
      out(off) = (v & 0xFF).toByte; out(off + 1) = ((v >> 8) & 0xFF).toByte
      out(off + 2) = ((v >> 16) & 0xFF).toByte; out(off + 3) = ((v >> 24) & 0xFF).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    putLE32(2, 54 + body.length) // file size
    putLE32(10, 54)              // pixel-data offset
    putLE32(14, 40)              // DIB header size
    putLE32(18, w); putLE32(22, h)
    out(26) = 1                  // planes (u16 LE)
    out(28) = 24                 // bits per pixel (u16 LE)
    putLE32(34, body.length)     // image size
    System.arraycopy(body, 0, out, 54, body.length)
    out
  }

  /** A COMPLETE valid 24bpp BMP with deterministic pixels — image pixel
    * (r, c) channel ch (BGR order) = (id·7 + r·5 + c·3 + ch·11) mod 256,
    * stored bottom-up with the spec's 4-byte row stride. A closed-form
    * pixel function makes full pixel decode ORACLE-ABLE: an engine-
    * independent SQL query can recompute any pixel statistic. */
  def syntheticBmp(id: Long, w: Int, h: Int): Array[Byte] = {
    val stride = (w * 3 + 3) & ~3
    val px = new Array[Byte](stride * h)
    var r = 0
    while (r < h) {
      val rowOff = (h - 1 - r) * stride // image row r stored bottom-up
      var c = 0
      while (c < w) {
        var ch = 0
        while (ch < 3) {
          px(rowOff + c * 3 + ch) = ((id * 7 + r * 5 + c * 3 + ch * 11) % 256).toByte
          ch += 1
        }
        c += 1
      }
      r += 1
    }
    bmpWrap(w, h, px)
  }

  /** Media table of full synthetic BMPs keyed by an id column (same
    * deterministic dimensions as [[mediaFromDocuments]]). */
  def syntheticBmpMedia(ids: DataFrame): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(ids.columns.head).cast("long")).as[Long]
      .map { id =>
        val w = (((id % 64) + 64) % 64 + 16).toInt
        val h = (((id % 48) + 48) % 48 + 16).toInt
        (id, syntheticBmp(id, w, h))
      }
      .toDF("media_id", "payload")
  }

  final case class ImageHeader(media_id: Long, format: String, width: Int, height: Int)

  /** REAL header-only image decode, partition-wise: sniffs the container by
    * magic bytes and parses the dimensions out of the payload — BMP
    * (BITMAPINFOHEADER, LE), PNG (IHDR, BE), GIF (logical screen, LE),
    * JPEG (SOFn scan). Unknown/truncated payloads decode to
    * ("unknown", -1, -1) instead of failing the batch. (Full pixel decode:
    * [[decodeBmpPixels]] / [[decodeImagePixels]].) */
  def decodeImageHeaders(media: DataFrame): Dataset[ImageHeader] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val b = if (bytes == null) Array.empty[Byte] else bytes
        def u8(i: Int): Int = b(i) & 0xFF
        def le32(i: Int): Int = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
        def be32(i: Int): Int = (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
        def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
        def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
        val hdr =
          if (b.length >= 26 && b(0) == 'B' && b(1) == 'M')
            ImageHeader(id, "bmp", le32(18), le32(22))
          else if (b.length >= 24 && le32(0) == 0x474E5089) // \x89PNG little-endian view
            ImageHeader(id, "png", be32(16), be32(20))
          else if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F')
            ImageHeader(id, "gif", le16(6), le16(8))
          else if (b.length >= 4 && u8(0) == 0xFF && u8(1) == 0xD8) {
            // JPEG: walk markers to the first SOFn frame header
            var i = 2
            var out: ImageHeader = null
            while (out == null && i + 9 < b.length) {
              if (u8(i) != 0xFF) i += 1
              else {
                val m = u8(i + 1)
                if (m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC)
                  out = ImageHeader(id, "jpeg", be16(i + 7), be16(i + 5))
                else if (m == 0xD8 || (m >= 0xD0 && m <= 0xD9)) i += 2
                else i += 2 + (if (i + 3 < b.length) be16(i + 2) else b.length)
              }
            }
            if (out == null) ImageHeader(id, "unknown", -1, -1) else out
          } else ImageHeader(id, "unknown", -1, -1)
        hdr
      })
  }

  final case class BmpPixels(media_id: Long, width: Int, height: Int,
                             mean_b: Double, mean_g: Double, mean_r: Double,
                             tl_b: Int, tl_g: Int, tl_r: Int)

  /** REAL pixel decode for 24bpp BI_RGB BMPs — a pure-JVM codec, no external
    * libs: parses the pixel-array offset, dimensions, bpp and compression
    * from the header, walks the bottom-up (or top-down when height < 0) BGR
    * rows honoring the 4-byte row stride, and emits per-channel means plus
    * the top-left pixel (order-sensitive: a decoder that ignored bottom-up
    * storage would read the wrong row for it). Runs partition-wise
    * (`mapPartitions` — the typed-kernel decode seam); non-BMP, compressed,
    * or truncated payloads are dropped rather than failing the batch. */
  def decodeBmpPixels(media: DataFrame): Dataset[BmpPixels] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        val b = if (bytes == null) Array.empty[Byte] else bytes
        def u8(i: Int): Int = b(i) & 0xFF
        def le32(i: Int): Int = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
        def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
        if (b.length < 54 || b(0) != 'B' || b(1) != 'M') None
        else {
          val off = le32(10)
          val w = le32(18)
          val hRaw = le32(22)
          val bpp = le16(28)
          val compression = le32(30)
          val h = math.abs(hRaw)
          val topDown = hRaw < 0
          val stride = (w * 3 + 3) & ~3
          if (bpp != 24 || compression != 0 || w <= 0 || h == 0 ||
              off < 54 || off.toLong + stride.toLong * h > b.length) None
          else {
            val sums = Array(0L, 0L, 0L)
            var r = 0
            while (r < h) {
              val rowOff = off + (if (topDown) r else h - 1 - r) * stride
              var c = 0
              while (c < w) {
                sums(0) += u8(rowOff + c * 3)
                sums(1) += u8(rowOff + c * 3 + 1)
                sums(2) += u8(rowOff + c * 3 + 2)
                c += 1
              }
              r += 1
            }
            val n = w.toLong * h
            val tl = off + (if (topDown) 0 else (h - 1) * stride) // image (0,0)
            Some(BmpPixels(id, w, h,
              sums(0).toDouble / n, sums(1).toDouble / n, sums(2).toDouble / n,
              u8(tl), u8(tl + 1), u8(tl + 2)))
          }
        }
      })
  }

  /** A COMPLETE PNG with the SAME closed-form pixel function as
    * [[syntheticBmp]] — channel ch of image pixel (r, c) in BGR order =
    * (id·7 + r·5 + c·3 + ch·11) mod 256 — encoded through the JDK's real PNG
    * writer (`javax.imageio`). PNG is lossless, so the q_multimodal_pixels
    * arithmetic oracle carries over unchanged to the compressed format. */
  def syntheticPng(id: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var r = 0
    while (r < h) {
      var c = 0
      while (c < w) {
        val bl = ((id * 7 + r * 5 + c * 3) % 256).toInt
        val g = ((id * 7 + r * 5 + c * 3 + 11) % 256).toInt
        val rd = ((id * 7 + r * 5 + c * 3 + 22) % 256).toInt
        img.setRGB(c, r, (rd << 16) | (g << 8) | bl)
        c += 1
      }
      r += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Media table of full synthetic PNGs (dimensions as [[syntheticBmpMedia]]). */
  def syntheticPngMedia(ids: DataFrame): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(ids.columns.head).cast("long")).as[Long]
      .map { id =>
        val w = (((id % 64) + 64) % 64 + 16).toInt
        val h = (((id % 48) + 48) % 48 + 16).toInt
        (id, syntheticPng(id, w, h))
      }
      .toDF("media_id", "payload")
  }

  /** REAL compressed-format pixel decode, partition-wise: `javax.imageio`
    * (PNG/JPEG/GIF/TIFF/BMP readers ship in the JDK's `java.desktop` module)
    * reads the payload into a BufferedImage; per-channel means and the
    * top-left pixel come off the decoded raster — the same output contract
    * as [[decodeBmpPixels]], so the arithmetic oracle applies to lossless
    * formats. Undecodable payloads are dropped rather than failing the
    * batch. Disk-cache is off (`setUseCache(false)`) so decode is pure
    * in-memory work on the executor. */
  def decodeImagePixels(media: DataFrame): Dataset[BmpPixels] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.flatMap { case (id, bytes) =>
          val b = if (bytes == null) Array.empty[Byte] else bytes
          val img =
            try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b)))
            catch { case _: Exception => None }
          img.filter(im => im.getWidth > 0 && im.getHeight > 0).map { im =>
            val w = im.getWidth; val h = im.getHeight
            var sb = 0L; var sg = 0L; var sr = 0L
            var r = 0
            while (r < h) {
              var c = 0
              while (c < w) {
                val px = im.getRGB(c, r)
                sr += (px >> 16) & 0xFF; sg += (px >> 8) & 0xFF; sb += px & 0xFF
                c += 1
              }
              r += 1
            }
            val n = w.toLong * h
            val tl = im.getRGB(0, 0)
            BmpPixels(id, w, h, sb.toDouble / n, sg.toDouble / n, sr.toDouble / n,
              tl & 0xFF, (tl >> 8) & 0xFF, (tl >> 16) & 0xFF)
          }
        }
      }
  }

  final case class MediaFeatures(media_id: Long, byte_len: Long,
                                 checksum: Long, feature: Array[Float])

  /** REAL decode + feature-extract, partition-wise: `javax.imageio` decodes
    * the payload and the feature is a model-ready channel-statistics vector —
    * [w/4096, h/4096, meanR/255, meanG/255, meanB/255, then a luminance
    * histogram filling the remaining dims]. The checksum folds the decoded
    * pixel stream (decode-order-deterministic, partition-layout-independent).
    * Payloads no JDK reader accepts (e.g. truncated pixel arrays, audio/video
    * containers) fall back to the same fold over raw bytes with feature[0..]
    * derived from the hash — flagged by checksum sign, never failing the
    * batch. A production audio/video decoder plugs into this exact seam. */
  def decodeFeatures(media: DataFrame, featureDim: Int = 8): Dataset[MediaFeatures] = {
    require(featureDim >= 6, s"featureDim must be >= 6, got $featureDim")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, bytes) =>
          val b = if (bytes == null) Array.empty[Byte] else bytes
          val img =
            try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b)))
            catch { case _: Exception => None }
          img.filter(im => im.getWidth > 0 && im.getHeight > 0) match {
            case Some(im) =>
              val w = im.getWidth; val h = im.getHeight
              val histDim = featureDim - 5
              val hist = new Array[Long](histDim)
              var sb = 0L; var sg = 0L; var sr = 0L
              var cs = 1125899906842597L
              var r = 0
              while (r < h) {
                var c = 0
                while (c < w) {
                  val px = im.getRGB(c, r)
                  val rd = (px >> 16) & 0xFF; val g = (px >> 8) & 0xFF; val bl = px & 0xFF
                  sr += rd; sg += g; sb += bl
                  cs = cs * 31 + (px & 0xFFFFFF)
                  // integer luma (BT.601 weights scaled by 256)
                  hist(((rd * 77 + g * 150 + bl * 29) >> 8) * histDim / 256) += 1L
                  c += 1
                }
                r += 1
              }
              val n = (w.toLong * h).toFloat
              val feat = new Array[Float](featureDim)
              feat(0) = w / 4096f; feat(1) = h / 4096f
              feat(2) = sr / n / 255f; feat(3) = sg / n / 255f; feat(4) = sb / n / 255f
              var i = 0
              while (i < histDim) { feat(5 + i) = hist(i) / n; i += 1 }
              MediaFeatures(id, b.length.toLong, cs & Long.MaxValue, feat)
            case None =>
              var cs = 1125899906842597L
              b.foreach(x => cs = cs * 31 + x)
              val feat = Array.tabulate(featureDim)(i =>
                (((cs >>> (i * 8)) & 0xFF).toFloat / 255f))
              MediaFeatures(id, b.length.toLong, cs | Long.MinValue, feat)
          }
        }
      }
  }

  /** Frame-sampling plan for video payloads: pure metadata math (every
    * `everyMs` within duration) — the decode of each sampled frame is the
    * stub above. */
  def frameSamplePlan(media: DataFrame, everyMs: Long): DataFrame =
    media.filter(col("meta.kind") === "video" && col("meta.duration_ms").isNotNull)
      .select(col("media_id"),
        explode(sequence(lit(0L), col("meta.duration_ms"), lit(everyMs))).as("frame_ts_ms"))

  /** Resize plan: target dims preserving aspect ratio (metadata-only; the
    * pixel work happens in the decoder stub's slot). */
  def resizePlan(media: DataFrame, maxSide: Int): DataFrame = {
    val w = col("meta.width").cast("double"); val h = col("meta.height").cast("double")
    val scale = least(lit(1.0), lit(maxSide) / greatest(w, h))
    media.select(col("media_id"), col("meta.width").as("w"), col("meta.height").as("h"),
      round(w * scale).cast("int").as("out_w"), round(h * scale).cast("int").as("out_h"))
  }
}
