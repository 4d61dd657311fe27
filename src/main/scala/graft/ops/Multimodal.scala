package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
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

  /**
   * Media integrity audit — the multimodal twin of the embedding audit:
   * one scan over the decoded feature frame, stacked into
   * `(check, n_violations, n_total)` rows. Checks: empty payloads,
   * modality/container mismatches, image dimensions outside the
   * decodable range, still images carrying a duration, audio carrying
   * pixel dimensions. At 100 TB each violation class routes to a
   * quarantine partition before training ever sees the shard.
   */
  def integrityAudit(features: DataFrame, formatCol: Option[String] = None): DataFrame = {
    val fmtOk = formatCol.map { f =>
      (col("media_type") === "image" && col(f) === "png") ||
        (col("media_type") === "audio" && col(f) === "wav") ||
        (col("media_type") === "video" && col(f) === "mp4")
    }.getOrElse(lit(true))
    val checks: Seq[(String, Column)] = Seq(
      "empty_payload" -> (col("n_bytes") <= 0),
      "type_format_mismatch" -> !fmtOk,
      "image_bad_dims" -> (col("media_type") === "image" &&
        (col("width") < 64 || col("width") >= 1088 ||
          col("height") < 64 || col("height") >= 1088)),
      "image_with_duration" -> (col("media_type") === "image" &&
        col("duration_ms") =!= 0L),
      "audio_with_dims" -> (col("media_type") === "audio" &&
        (col("width") =!= 0 || col("height") =!= 0)))
    val agg = features.agg(count(lit(1)).as("n_total"),
      checks.map { case (name, cond) =>
        coalesce(sum(when(cond, 1L).otherwise(0L)), lit(0L)).as(s"__v_$name")
      }: _*)
    checks.map { case (name, _) =>
      agg.select(lit(name).as("check_name"), col(s"__v_$name").as("n_violations"),
        col("n_total"))
    }.reduce(_ union _)
  }

  /** The aspect-ratio ladder image-training pipelines bucket into —
    * SDXL-style fixed shapes; `ratio_milli = 1000·w div h`. */
  val AspectLadder: Seq[(String, Long)] = Seq(
    ("1:2", 500L), ("9:16", 562L), ("3:4", 750L), ("1:1", 1000L),
    ("4:3", 1333L), ("16:9", 1778L), ("2:1", 2000L))

  /**
   * Aspect-ratio bucketing — the batch-planning step of every image
   * training pipeline (resize distorts less within a bucket, and a batch
   * must share one shape): each image snaps to the NEAREST ladder ratio
   * (ties to the smaller target), buckets report their population, ratio
   * range, and batch count at `batchSize`. The ladder is a 7-row
   * broadcast; the nearest-bucket window partitions per image (bounded
   * by ladder size) — one aggregate shuffle total, exact integer math
   * throughout.
   */
  def aspectBuckets(features: DataFrame, batchSize: Int): DataFrame = {
    require(batchSize >= 1, s"batchSize must be >= 1: $batchSize")
    val spark = features.sparkSession
    import spark.implicits._
    val ladder = AspectLadder.toDF("bucket", "target_milli")
    val imgs = features.where(col("media_type") === "image")
      .select(col("media_id"), expr("(1000 * width) div height").as("ratio_milli"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("media_id"))
      .orderBy(abs(col("ratio_milli") - col("target_milli")), col("target_milli"))
    imgs.crossJoin(broadcast(ladder))
      .withColumn("__r", row_number().over(w))
      .where(col("__r") === 1)
      .groupBy(col("bucket"), col("target_milli"))
      .agg(count(lit(1)).as("n_images"),
        min(col("ratio_milli")).as("min_ratio_milli"),
        max(col("ratio_milli")).as("max_ratio_milli"))
      .withColumn("n_batches",
        expr(s"(n_images + ${batchSize - 1}) div $batchSize"))
  }

  /**
   * Near-duplicate media via banded Hamming join over the 64-bit
   * content hash (in production a true perceptual hash — pHash/aHash —
   * lands in `content_hash` via the decoder; the banding math is
   * identical). A pair within `maxHamming` bit flips must agree exactly
   * on at least one of the `bands` hash slices (pigeonhole — hence the
   * `maxHamming < bands` requirement, which keeps the equi-join
   * COMPLETE: no false negatives), so candidates come from `bands`
   * equi-joins on 16-bit slices, never an all-pairs XOR scan; one exact
   * popcount per candidate settles the pair. Crowded slices (a constant
   * hash region) would fan out — production adds the same `maxBucket`
   * cap [[Similarity.lshTopK]] uses.
   */
  def phashNearDups(features: DataFrame, maxHamming: Int = 3): DataFrame = {
    val bands = 4
    require(maxHamming >= 0 && maxHamming < bands,
      s"banding completeness needs 0 <= maxHamming < $bands: $maxHamming")
    val banded = features
      .select(col("media_id"), col("content_hash"),
        explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .withColumn("bv",
        expr("shiftrightunsigned(content_hash, band * 16) % 65536"))
    val pairs = banded.alias("x").join(banded.alias("y"),
        col("x.band") === col("y.band") && col("x.bv") === col("y.bv") &&
          col("x.media_id") < col("y.media_id"))
      .select(col("x.media_id").as("media_id_a"),
        col("y.media_id").as("media_id_b"),
        col("x.content_hash").as("__ha"), col("y.content_hash").as("__hb"))
      .distinct()
    pairs
      .withColumn("hamming", expr("cast(bit_count(__ha ^ __hb) as bigint)"))
      .where(col("hamming") <= maxHamming)
      .select(col("media_id_a"), col("media_id_b"), col("hamming"))
  }
}
