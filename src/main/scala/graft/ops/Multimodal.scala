package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
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

  /** Energy-threshold segmentation of a temporal payload (the
    * voice-activity-detection shape: split long audio into voiced
    * chunks before per-chunk transcription/feature work). One native
    * [[graft.functions.FrameEnergies]] pass frames the payload
    * map-only; active frames (energy >= threshold) resolve into
    * maximal contiguous runs by the gaps-and-islands rule (frame −
    * row_number is constant within a run). Scale shape: the payload is
    * read ONCE and never shuffles — only narrow (id, frame, energy)
    * rows ride the single media-keyed exchange feeding the window and
    * the segment aggregate (which share partitioning). Output:
    * media_id, seg_start, seg_end (inclusive frame indices), n_frames,
    * energy_sum. Media with no active frame emit nothing. */
  def energySegments(media: DataFrame, frameBytes: Int,
      threshold: Long): DataFrame = {
    val fr = media.select(col("media_id"),
      posexplode(graft.functions.FrameFunctions
        .frame_energies(col("payload"), frameBytes))
        .as(Seq("frame", "energy")))
    val w = Window.partitionBy(col("media_id")).orderBy(col("frame"))
    fr.filter(col("energy") >= threshold)
      .withColumn("__grp", col("frame") - row_number().over(w))
      .groupBy(col("media_id"), col("__grp"))
      .agg(min(col("frame")).as("seg_start"),
        max(col("frame")).as("seg_end"),
        count(lit(1)).cast("int").as("n_frames"),
        sum(col("energy")).as("energy_sum"))
      .select(col("media_id"), col("seg_start"), col("seg_end"),
        col("n_frames"), col("energy_sum"))
  }

  /** Shot-boundary segmentation of a temporal payload (the video
    * analogue of [[energySegments]]): per-frame
    * [[graft.functions.FrameDHashes]] perceptual hashes, a boundary
    * wherever consecutive frames sit more than `maxHamming` bits
    * apart, shots = running count of boundaries. Within-shot frames
    * hash close (dHash gradients survive small frame-to-frame drift);
    * a cut jumps. Same scale shape as [[energySegments]]: payload read
    * once map-only, narrow (id, frame, hash) rows through ONE
    * media-keyed exchange whose sort both windows and the final
    * aggregate share. Output: media_id, shot (0-based), start_frame,
    * end_frame, n_frames. */
  def shotSegments(media: DataFrame, frameBytes: Int,
      maxHamming: Int = 3): DataFrame = {
    val fr = media.select(col("media_id"),
      posexplode(graft.functions.FrameFunctions
        .frame_dhashes(col("payload"), frameBytes))
        .as(Seq("frame", "dh")))
    val w = Window.partitionBy(col("media_id")).orderBy(col("frame"))
    fr.withColumn("__b",
        when(lag(col("dh"), 1).over(w).isNull, 0)
          .when(bit_count(col("dh")
            .bitwiseXOR(lag(col("dh"), 1).over(w))) > maxHamming, 1)
          .otherwise(0))
      .withColumn("shot", sum(col("__b"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("int"))
      .groupBy(col("media_id"), col("shot"))
      .agg(min(col("frame")).as("start_frame"),
        max(col("frame")).as("end_frame"),
        count(lit(1)).cast("int").as("n_frames"))
      .select(col("media_id"), col("shot"), col("start_frame"),
        col("end_frame"), col("n_frames"))
  }
}
