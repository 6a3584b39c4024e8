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

  test("dHash56: hand-computed grid, empty payload, single-byte-edit locality") {
    // payload of 130 'a' bytes: cells 0,1 get 3 bytes (97*3), cells
    // 2..63 get 2 — the only gradient is cell 1 -> 2 DOWN (not set) and
    // any equal-comparison stays 0 (strict >); cell 0 -> 1 equal -> 0
    val df = Seq(
      (1L, "a" * 130), (2L, ""), (3L, "a" * 130 + "zz")
    ).toDF("media_id", "text")
      .select($"media_id", encode($"text", "UTF-8").as("payload"))
    val got = Multimodal.dHash(df).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(2L) === 0L) // empty -> all-zero grid -> no strict gradient
    // doc 3 appends two bytes at positions 130, 131 -> cells 2 and 3
    // move; every affected gradient sits in row 0 (bits 0..6), so the
    // rest of the hash is untouched
    val diff = got(1L) ^ got(3L)
    assert(diff != 0L && (diff & ~0x7fL) == 0L, diff.toString)
    // hand check doc 1: luma = [291,291,194,194,...]; gradients all
    // "not strictly greater" except none -> hash 0
    assert(got(1L) === 0L)
  }

  test("perceptualNearDupPairs: appended byte found at hamming <= 3, unrelated apart") {
    def fmix(v: Long): Long = {
      var x = v
      x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
      x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
      x ^ (x >>> 33)
    }
    val texts = (0L until 20L).map { i =>
      i -> (1 to 300).map(p =>
        ('a' + math.floorMod(fmix(i * 7919L + p), 26L).toInt).toChar).mkString
    }
    val rows = texts.map { case (i, t) => (i, t) } ++
      texts.take(6).map { case (i, t) => (i + 100L, t + "!") }
    val media = rows.toDF("media_id", "text")
      .select($"media_id", encode($"text", "UTF-8").as("payload"))
    val pairs = Multimodal.perceptualNearDupPairs(media, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((0L until 6L).map(i => (i, i + 100L)).toSet.subsetOf(pairs))
    // unrelated mixed-char docs sit ~28 bits apart — none pass
    assert(pairs.forall { case (a, b) => b - a == 100L })
  }

  test("frameEnergies: framing, truncated tail, empty payload") {
    val df = Seq((1L, "aaaabb"), (2L, "")).toDF("media_id", "text")
      .select($"media_id", encode($"text", "UTF-8").as("payload"))
    val got = df.select($"media_id", graft.functions.FrameFunctions
        .frame_energies($"payload", 4).as("e"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // frame 0 = 'aaaa' = 4*97; frame 1 (partial) = 'bb' = 2*98
    assert(got(1L) === Seq(388L, 196L))
    assert(got(2L) === Seq.empty)
  }

  test("energySegments: gaps-and-islands over active frames") {
    // frames of 2 bytes: 'aa'(194) ' .'(78) 'aa'(194) -> threshold 100
    // keeps frames 0 and 2 as two one-frame segments; doc 2 is all
    // quiet and emits nothing
    val df = Seq((1L, "aa .aa"), (2L, "      ")).toDF("media_id", "text")
      .select($"media_id", encode($"text", "UTF-8").as("payload"))
    val got = Multimodal.energySegments(df, frameBytes = 2, threshold = 100L)
      .orderBy("media_id", "seg_start").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getLong(4)))
    assert(got.toSeq === Seq((1L, 0, 0, 1, 194L), (1L, 2, 2, 1, 194L)))
  }

  test("shotSegments: identical frames fuse, scene cuts split") {
    val sceneA = "abcdefghijklmnopqrstuvwxyzabcdef" // rising bytes
    val sceneB = "zyxwvutsrqponmlkjihgfedcbazyxwvu" // falling bytes
    val df = Seq((1L, sceneA * 3 + sceneB * 2)).toDF("media_id", "text")
      .select($"media_id", encode($"text", "UTF-8").as("payload"))
    val got = Multimodal.shotSegments(df, frameBytes = 32, maxHamming = 3)
      .orderBy("shot").collect()
      .map(r => (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
    assert(got.toSeq === Seq((0, 0, 2, 3), (1, 3, 4, 2)))
  }
}
