package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed media row: opaque binary payload + typed metadata — the multimodal
  * column model (image/audio/video as `binary`, never parsed by Spark). */
final case class MediaRecord(
    media_id: Long,
    media_type: String,
    payload: Array[Byte],
    n_bytes: Int,
    format: String)

/** Decoded-media features. Width/height/duration come from the decoder;
  * in this environment the decode step is STUBBED (see [[Multimodal.decodeStub]]). */
final case class MediaFeatures(
    media_id: Long,
    media_type: String,
    n_bytes: Int,
    width: Int,
    height: Int,
    duration_ms: Long,
    content_hash: Long)

/**
 * Multimodal-column plumbing: binary payloads with typed metadata, decoded /
 * feature-extracted in partition-batches. The Spark-side contract — schema,
 * partition-preserving batch iteration, deterministic output — is real and
 * tested; the actual image/audio decode is a clearly-marked STUB because no
 * media libraries exist in this container (prompt contract). Swap
 * [[decodeStub]] for a JNI/javacpp decoder in production; nothing else
 * changes.
 *
 * Batch shape: `mapPartitions` over a typed Dataset is the Scala analog of
 * arrow-batched `mapInPandas` — one iterator per partition, no per-row
 * ser/deser boundary crossings, pipeline-friendly at 100 TB (decode cost
 * scales with splits, no shuffle).
 */
object Multimodal {

  /** Wrap a text table into fake media rows: payload = utf-8 bytes.
    * Deterministic — stands in for reading real blobs from object storage. */
  def syntheticMedia(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      // deterministic fake modality from the id
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col(idCol), lit(3)) + 1).cast("int")).as("media_type"),
      col(textCol).cast("binary").as("payload"),
      octet_length(col(textCol)).as("n_bytes"),
      element_at(array(lit("png"), lit("wav"), lit("mp4")),
        (pmod(col(idCol), lit(3)) + 1).cast("int")).as("format"))

  /**
   * STUB decoder: in production this calls the real image/audio/video
   * decoder on `payload`. Here it derives deterministic fake dimensions
   * from the payload bytes so the full pipeline (schema, batching,
   * downstream joins) is exercised end-to-end.
   */
  private[ops] def decodeStub(r: MediaRecord): MediaFeatures = {
    // ??? <- real decoder goes here; deterministic fake below
    var h = 1125899906842597L
    var i = 0
    val n = math.min(r.payload.length, 64)
    while (i < n) { h = 31 * h + r.payload(i); i += 1 }
    MediaFeatures(
      media_id = r.media_id,
      media_type = r.media_type,
      n_bytes = r.n_bytes,
      width = if (r.media_type == "audio") 0 else 64 + (math.abs(h) % 1024).toInt,
      height = if (r.media_type == "audio") 0 else 64 + (math.abs(h >> 10) % 1024).toInt,
      duration_ms = if (r.media_type == "image") 0L else math.abs(h >> 20) % 600000L,
      content_hash = h)
  }

  /** Partition-batched decode/feature-extract (mapInPandas analog). */
  def decodeFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(decodeStub))
  }

  /** Typed view of a media DataFrame. */
  def asMedia(df: DataFrame): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    df.as[MediaRecord]
  }

  /**
   * Deterministic frame sampling for video payloads: `k` evenly-spaced
   * frame indices from the (stub-decoded) duration at the given fps —
   * pure column math, no decode in the planning path.
   */
  def sampleFrameOffsets(features: DataFrame, k: Int, fps: Double = 30.0d): DataFrame =
    features.where(col("media_type") === "video")
      .withColumn("n_frames", greatest(lit(1L),
        (col("duration_ms").cast("double") / lit(1000.0d) * lit(fps)).cast("long")))
      .withColumn("frame_indices",
        transform(sequence(lit(0), lit(k - 1)),
          i => least(col("n_frames") - 1,
            ((i.cast("long") * col("n_frames")) / lit(k.toLong)).cast("long"))))
      .select(col("media_id"), col("n_frames"), col("frame_indices"))
}
