package graft

import org.apache.spark.sql.functions._

import graft.ops.CrossModal

class CrossModalSpec extends SparkSpec {
  import spark.implicits._

  // orthonormal hand vectors: pair 2 is the PLANTED mismatch (text e2,
  // media e1 -> cosine 0); pair 4 is flagged too but its text matches
  // nothing in the media corpus (the plain-bad-caption case)
  private val pairs = Seq(
    (1L, Seq(1f, 0f, 0f, 0f), Seq(1f, 0f, 0f, 0f)),
    (2L, Seq(0f, 1f, 0f, 0f), Seq(1f, 0f, 0f, 0f)),
    (3L, Seq(0.6f, 0.8f, 0f, 0f), Seq(0.6f, 0.8f, 0f, 0f)),
    (4L, Seq(0f, 0f, 1f, 0f), Seq(0f, 0f, 0f, 1f))
  ).toDF("pair_id", "text_vec", "media_vec")

  private val media = Seq(
    (10L, Seq(0f, 1f, 0f, 0f)),       // pair 2's true partner: cosine 1
    (11L, Seq(0.7071f, 0.7071f, 0f, 0f)), // partial match: cosine ~0.7071
    (12L, Seq(1f, 0f, 0f, 0f))        // cosine 0 vs pair 2: NOT strictly better
  ).toDF("media_id", "vec")

  test("alignmentGate: exact scores, flags exactly the planted mismatches") {
    val out = CrossModal.alignmentGate(pairs, "pair_id", "text_vec",
        "media_vec", minScore = 0.99)
      .orderBy("pair_id")
      .collect().map(r => (r.getAs[Long]("pair_id"),
        r.getAs[Double]("align_score"), r.getAs[Boolean]("aligned")))
    assert(out.toSeq === Seq((1L, 1.0, true), (2L, 0.0, false),
      (3L, 1.0, true), (4L, 0.0, false)))
  }

  test("alignmentScores plans map-only: zero exchanges at any corpus size") {
    val scored = CrossModal.alignmentScores(pairs, "pair_id", "text_vec",
      "media_vec")
    scored.collect()
    val plan = scored.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("mismatchMining recovers the swapped partner at rank 1 with exact margin") {
    val out = CrossModal.mismatchMining(pairs, "pair_id", "text_vec",
        "media_vec", media, "media_id", "vec", k = 3, minScore = 0.99)
      .orderBy(col("pair_id"), col("cand_score").desc, col("cand_media_id"))
      .collect().map(r => (r.getAs[Long]("pair_id"),
        r.getAs[Long]("cand_media_id"), r.getAs[Double]("cand_score"),
        r.getAs[Double]("margin")))
    // pair 2: true partner 10 first (margin = 1 - 0), then the partial
    // match 11; media 12 (cosine 0 = own score) fails strictly-better.
    // pair 4 matches NOTHING better -> zero rows (bad caption, not a
    // swap). aligned pairs 1/3 never mined.
    assert(out.toSeq === Seq(
      (2L, 10L, 1.0, 1.0),
      (2L, 11L, 0.707107, 0.707107)))
  }

  test("mismatchMining respects k and the aligned pairs never mine") {
    val out = CrossModal.mismatchMining(pairs, "pair_id", "text_vec",
        "media_vec", media, "media_id", "vec", k = 1, minScore = 0.99)
      .collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("pair_id") === 2L)
    assert(out.head.getAs[Long]("cand_media_id") === 10L)
  }
}
