package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: image/audio/video
  * travel as opaque `binary` payload columns with typed metadata structs;
  * decode / feature-extraction runs batched per partition (the Scala
  * analogue of `mapInPandas` batching: one iterator per partition, no
  * per-row driver round-trips, arbitrary native calls allowed inside).
  *
  * The actual media DECODE step is STUBBED — this container ships no
  * image/audio codecs — with a deterministic fake (byte histogram over the
  * raw payload). The Spark-side contract is real and tested: schema
  * (binary + struct metadata), partition-batched execution, fixed-size
  * float feature output ready for the [[Similarity]] ANN operators.
  */
object Multimodal {

  final case class MediaMeta(mediaType: String, width: Int, height: Int,
      durationMs: Long)
  final case class MediaRow(media_id: Long, payload: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(media_id: Long, n_bytes: Int,
      feature: Array[Float])

  /** documents -> media frame: UTF-8 payload bytes + metadata struct.
    * Stands in for reading real image/audio blobs (same schema shape). */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(lit("text/plain").as("mediaType"), lit(0).as("width"),
        lit(0).as("height"), lit(0L).as("durationMs")).as("meta"))

  /** STUB decode: a real deployment decodes pixels/samples here via a native
    * codec; the deterministic fake is a normalized byte histogram — the
    * plumbing (batch iterator, fixed-dim float vector out) is the real
    * contract. */
  private def decodeAndFeaturize(payload: Array[Byte], dim: Int): Array[Float] = {
    val hist = new Array[Float](dim)
    var i = 0
    while (i < payload.length) {
      hist((payload(i) & 0xFF) % dim) += 1f
      i += 1
    }
    val n = math.max(1, payload.length).toFloat
    var j = 0
    while (j < dim) { hist(j) /= n; j += 1 }
    hist
  }

  /** Partition-batched feature extraction over media rows. */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 16)(
      implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { batch =>
      batch.map { m =>
        MediaFeatures(m.media_id, m.payload.length,
          decodeAndFeaturize(m.payload, dim))
      }
    }
  }

  /** STUB resize: metadata-only transform (a real pipeline re-encodes the
    * payload); keeps the declared target dims so downstream stages can plan. */
  def resize(media: DataFrame, width: Int, height: Int): DataFrame =
    media.withColumn("meta",
      struct(col("meta.mediaType"), lit(width).as("width"),
        lit(height).as("height"), col("meta.durationMs")))

  /** STUB frame sampling: emits (media_id, frame_ts_ms) rows every
    * `everyMs` over the declared duration — the explode shape a video
    * pipeline uses to fan frames out to per-frame feature extraction. */
  def sampleFrames(media: DataFrame, everyMs: Long = 1000L): DataFrame =
    media.select(col("media_id"),
      explode(sequence(lit(0L), greatest(col("meta.durationMs"), lit(0L)),
        lit(everyMs))).as("frame_ts_ms"))

  /** 56-bit perceptual difference hash per media row: ONE map-only pass
    * of the native [[graft.functions.DHash56]] expression (decode stub
    * + 8x8 gradient grid, see its scaladoc). Output: media_id, dhash. */
  def dHash(media: DataFrame): DataFrame =
    media.select(col("media_id"),
      graft.functions.DHashFunctions.dhash56(col("payload")).as("dhash"))

  /** Perceptual near-duplicate pairs over media payloads: [[dHash]]
    * fingerprints through the banded-hamming candidate/verify pipeline
    * shared with SimHash ([[Dedup.simhashPairsFromSigs]] — 4 bands of
    * 14 bits; pigeonhole makes recall COMPLETE for hamming <= 3 while
    * only same-band-bucket rows ever meet, never all pairs). The
    * re-encoded-image / appended-watermark / small-local-edit class of
    * duplicate that content digests miss and text dedup cannot see.
    * Scale shape: one map-only hash pass, then joins on narrow
    * (id, long) rows — payloads never ride a shuffle; `maxBucketSize`
    * is the hot-bucket (uniform-background) guard with the star-anchor
    * recall caveat documented on the shared pipeline. Output: id_a <
    * id_b, hamming. */
  def perceptualNearDupPairs(media: DataFrame, maxHamming: Int = 3,
      maxBucketSize: Int = 256): DataFrame =
    Dedup.simhashPairsFromSigs(
      dHash(media).select(col("media_id").as("id"),
        col("dhash").as("simhash")),
      chunkBits = 14, maxHamming = maxHamming,
      maxBucketSize = maxBucketSize)
}
