package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-modal pairing QA — the alignment gate a paired text↔media
  * corpus (caption/image, transcript/audio, alt-text/frame) runs before
  * training: score how well each pair's two embeddings agree, gate on a
  * threshold, and for the failures mine WHICH media the caption actually
  * matches — the evidence a review queue wants. The scoring convention
  * is the CLIP-score family (Hessel et al. '21, "CLIPScore: A
  * Reference-free Evaluation Metric for Image Captioning"; the
  * LAION-400M/5B corpora were filtered exactly this way): both
  * modalities embedded into one shared space upstream (the embedding
  * model is NOT this engine's job — pairs arrive as two vector
  * columns), alignment = cosine. Extension surface (north star; beyond
  * the reference's scope).
  *
  * Determinism contract: cosine via the native
  * [[graft.functions.VectorFunctions.cosine_sim]] expression, rounded
  * 6dp BEFORE any comparison/selection (the x133 convention), candidate
  * ties broken by media id asc, margin = IEEE subtraction of round6
  * inputs, round6'd — bit-replayable in SQL. */
object CrossModal {

  /** Per-pair alignment score. Input: one frame whose rows ARE the
    * pairs (idCol, textVecCol, mediaVecCol — both `array<float>` in the
    * shared embedding space). Output: input columns + `align_score`
    * (6dp cosine).
    *
    * Scale shape: a pure map-only projection — the pairing already
    * happened upstream (the pairs frame is the corpus), so there is NO
    * join and NO exchange at any corpus size; the native cosine
    * expression keeps the whole thing in one WholeStageCodegen span.
    * 100 TB of pairs = one embarrassingly parallel scan. */
  def alignmentScores(pairs: DataFrame, idCol: String, textVecCol: String,
      mediaVecCol: String): DataFrame =
    pairs.withColumn("align_score",
      round(Similarity.cosine(col(textVecCol), col(mediaVecCol)), 6))

  /** The threshold gate: [[alignmentScores]] + boolean `aligned`
    * (score >= minScore — the keep decision; LAION used 0.28 on
    * CLIP ViT-B/32 cosines, the right value is corpus/model-specific
    * config like [[TextAnalysis.languageId]]'s profiles). Same map-only
    * scale shape; route on the boolean downstream (`filter`, or the
    * quarantine-write pattern of
    * [[graft.streaming.EventStreams.bloomScreenSink]]). */
  def alignmentGate(pairs: DataFrame, idCol: String, textVecCol: String,
      mediaVecCol: String, minScore: Double): DataFrame =
    alignmentScores(pairs, idCol, textVecCol, mediaVecCol)
      .withColumn("aligned", col("align_score") >= lit(minScore))

  /** Mismatched-pair mining: for every pair the gate REJECTED
    * (align_score < minScore), the top-k media from a candidate corpus
    * that align with the pair's TEXT strictly better than its own
    * media does — "this caption actually matches media X" is the
    * difference between diagnosing a swapped/corrupted pairing (a
    * strong better match exists; margin large) and a plain bad caption
    * (nothing matches; the pair emits no rows). Output: (idCol,
    * align_score, cand_media_id, cand_score, margin = cand_score −
    * align_score, 6dp), at most k rows per flagged pair, ordered
    * within a pair by (cand_score desc, cand_media_id asc).
    *
    * Scale shape: the flagged side is a REVIEW QUEUE — small by
    * contract (it is what a human/auditor reads), so it BROADCASTS and
    * the media corpus never shuffles for the scoring: one broadcast
    * nested-loop scan (the [[Similarity.bruteForceKnnBatch]] cost
    * model), then [[graft.plans.TopK]]'s bounded heap behind ONE hash
    * exchange on the flagged pair id (`maxGroups = MaxValue` — group
    * cardinality IS the flagged count, already known broadcast-small,
    * so no estimate job). The strictly-better filter runs BEFORE the
    * exchange, so only improving candidates ever shuffle. If the gate
    * flags a corpus-sized fraction, that is not a review queue — fix
    * the threshold or the embeddings; for corpus×corpus retrieval use
    * [[Similarity.lshKnnBatch]] / [[IVF.searchBatch]] instead. */
  def mismatchMining(pairs: DataFrame, idCol: String, textVecCol: String,
      mediaVecCol: String, media: DataFrame, mediaIdCol: String,
      mediaVecCorpusCol: String, k: Int, minScore: Double): DataFrame = {
    require(k >= 1, "need k >= 1")
    val flagged = alignmentScores(pairs, idCol, textVecCol, mediaVecCol)
      .filter(col("align_score") < lit(minScore))
      .select(col(idCol).as("__pid"), col(textVecCol).as("__tv"),
        col("align_score"))
    val cand = media
      .select(col(mediaIdCol).as("cand_media_id"),
        col(mediaVecCorpusCol).as("__mv"))
      .crossJoin(broadcast(flagged))
      .withColumn("cand_score",
        round(Similarity.cosine(col("__tv"), col("__mv")), 6))
      .filter(col("cand_score") > col("align_score"))
    graft.plans.TopK.perGroup(cand, Seq("__pid"),
        Seq(("cand_score", false), ("cand_media_id", true)), k,
        maxGroups = Long.MaxValue)
      .select(col("__pid").as(idCol), col("align_score"),
        col("cand_media_id"), col("cand_score"),
        round(col("cand_score") - col("align_score"), 6).as("margin"))
  }
}
