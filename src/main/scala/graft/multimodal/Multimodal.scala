package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling for training-data pipelines (beyond-parity
  * surface): media payloads are opaque `binary` columns travelling next to a
  * typed metadata struct; decode/feature-extraction runs partition-wise so a
  * 100 TB corpus streams through executors without driver involvement.
  *
  * The actual media codecs are NOT available in this environment, so the
  * decode step is a clearly-marked deterministic STUB — the Spark-side
  * plumbing (schema, batching, partitioning, null handling) is real and
  * tested, and a production build swaps `stubDecode*` for a JNI/FFmpeg/etc.
  * call with the same signature.
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

  /** Build a media table from the documents fixture: the UTF-8 bytes stand in
    * for an undecodable payload (deterministic, schema-faithful). */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit("image").as("kind"),
        lit("raw").as("format"),
        (pmod(col("doc_id"), lit(64)) + 16).cast("int").as("width"),
        (pmod(col("doc_id"), lit(48)) + 16).cast("int").as("height"),
        lit(null).cast("long").as("duration_ms")).as("meta"))

  final case class MediaFeatures(media_id: Long, byte_len: Long,
                                 checksum: Long, feature: Array[Float])

  /** STUB decode + feature-extract, partition-wise.
    *
    * Real implementation would decode `payload` (image/audio lib) and emit a
    * model-ready feature tensor; here the "feature" is a deterministic hash
    * fold of the bytes — same shape, same batching, zero codec deps. The
    * mapPartitions boundary is exactly where a vectorized/batched native
    * decoder plugs in. */
  def stubDecodeFeatures(media: DataFrame, featureDim: Int = 8): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val b = if (bytes == null) Array.empty[Byte] else bytes
          var cs = 1125899906842597L // deterministic FNV-ish fold — STUB, not a codec
          b.foreach(x => cs = cs * 31 + x)
          val feat = Array.tabulate(featureDim)(i =>
            (((cs >>> (i * 8)) & 0xFF).toFloat / 255f))
          MediaFeatures(id, b.length.toLong, cs, feat)
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
