package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, StructType}

import graft.ops.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq((1L, "abab"), (2L, ""), (3L, "zzzz"))
    .toDF("doc_id", "text")

  test("fromDocuments yields binary payload + metadata struct schema") {
    val media = Multimodal.fromDocuments(docs)
    assert(media.schema("payload").dataType == BinaryType)
    val meta = media.schema("meta").dataType.asInstanceOf[StructType]
    assert(meta.fieldNames.sameElements(
      Array("mediaType", "width", "height", "durationMs")))
    val row = media.filter($"media_id" === 1).head()
    assert(row.getAs[Array[Byte]]("payload").sameElements("abab".getBytes("UTF-8")))
  }

  test("extractFeatures is deterministic, batch-shaped, and size-correct") {
    implicit val s = spark
    val media = Multimodal.fromDocuments(docs).as[Multimodal.MediaRow]
    val feats = Multimodal.extractFeatures(media, dim = 8).collect()
      .map(f => f.media_id -> f).toMap
    assert(feats(1L).n_bytes == 4 && feats(1L).feature.length == 8)
    assert(feats(1L).feature.sum === 1.0f) // normalized histogram
    assert(feats(2L).n_bytes == 0 && feats(2L).feature.forall(_ == 0f))
    // identical payload bytes -> identical features (determinism)
    val again = Multimodal.extractFeatures(media, dim = 8).collect()
      .map(f => f.media_id -> f.feature.toSeq).toMap
    assert(again(3L) == feats(3L).feature.toSeq)
  }

  test("resize updates metadata dims; sampleFrames explodes frame timestamps") {
    val media = Multimodal.fromDocuments(docs)
    val resized = Multimodal.resize(media, 224, 224)
    assert(resized.select("meta.width").as[Int].head() == 224)
    val withDur = media.withColumn("meta",
      struct(col("meta.mediaType"), col("meta.width"), col("meta.height"),
        lit(3000L).as("durationMs")))
    val frames = Multimodal.sampleFrames(withDur, everyMs = 1000L)
      .filter($"media_id" === 1).select("frame_ts_ms").as[Long].collect().toSeq
    assert(frames == Seq(0L, 1000L, 2000L, 3000L))
  }
}
