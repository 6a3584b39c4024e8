package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** r12 additions: prototypicality pruning ([[Sampling
  * .prototypicalityPrune]]) and the prefix-filter exact Jaccard join
  * ([[Dedup.prefixFilterJaccardPairs]]). */
class SelectionOpsSpec extends SparkSpec {

  import spark.implicits._

  // ---- prototypicality pruning ----

  private val protoCents = Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0)))
    .toDF("cid", "cv")

  test("prototypicalityPrune: floor-cut per cluster, most prototypical first") {
    // cluster 0: sims descend 1 > 2 > 3 > 4; cluster 1: 11 > 12
    val emb = Seq(
      (1L, Seq(1.0, 0.0)), (2L, Seq(1.0, 0.1)), (3L, Seq(1.0, 0.2)),
      (4L, Seq(1.0, 0.4)),
      (11L, Seq(0.0, 1.0)), (12L, Seq(0.1, 1.0))
    ).toDF("vec_id", "v")
    val out = Sampling.prototypicalityPrune(emb, "vec_id", "v",
        protoCents, "cid", "cv", 0.5)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4),
        r.getBoolean(5)))
    // cluster 0 (n=4): prune floor(0.5*4)=2 -> ids 1,2 pruned, 3,4 kept
    // cluster 1 (n=2): prune floor(0.5*2)=1 -> id 11 pruned, 12 kept
    assert(out.toSeq === Seq(
      (1L, 0L, 1L, 4L, false), (2L, 0L, 2L, 4L, false),
      (3L, 0L, 3L, 4L, true), (4L, 0L, 4L, 4L, true),
      (11L, 1L, 1L, 2L, false), (12L, 1L, 2L, 2L, true)))
  }

  test("prototypicalityPrune: fraction 0 keeps all; ties rank smaller id first") {
    val emb = Seq((5L, Seq(1.0, 0.0)), (3L, Seq(1.0, 0.0)))
      .toDF("vec_id", "v") // identical vectors: tie on centroid_sim
    val all = Sampling.prototypicalityPrune(emb, "vec_id", "v",
        protoCents, "cid", "cv", 0.0)
      .orderBy("vec_id").collect()
    assert(all.forall(_.getBoolean(5)))
    val half = Sampling.prototypicalityPrune(emb, "vec_id", "v",
        protoCents, "cid", "cv", 0.5)
      .collect().map(r => (r.getLong(0), r.getBoolean(5))).toMap
    // tie broken by smallest id: 3 ranks 1 (pruned), 5 survives
    assert(half === Map(3L -> false, 5L -> true))
  }

  test("prototypicalityPrune: guards bad fractions") {
    val emb = Seq((1L, Seq(1.0, 0.0))).toDF("vec_id", "v")
    intercept[IllegalArgumentException](
      Sampling.prototypicalityPrune(emb, "vec_id", "v", protoCents,
        "cid", "cv", 1.0))
    intercept[IllegalArgumentException](
      Sampling.prototypicalityPrune(emb, "vec_id", "v", protoCents,
        "cid", "cv", -0.1))
  }

  // ---- prefix-filter Jaccard ----

  private def naivePairs(rows: Seq[(Long, String)], t: Double) =
    (for {
      (ia, ta) <- rows; (ib, tb) <- rows if ia < ib
      sa = ta.trim.split("\\s+").filter(_.nonEmpty).toSet
      sb = tb.trim.split("\\s+").filter(_.nonEmpty).toSet
      if sa.nonEmpty && sb.nonEmpty
      j = sa.intersect(sb).size.toDouble / sa.union(sb).size
      jr = BigDecimal(j).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if jr >= t
    } yield (ia, ib, jr)).sorted

  test("prefixFilterJaccardPairs: equals the naive all-pairs truth") {
    // shared boilerplate ("the a of") across every doc + distinctive
    // tails — the regime where rarest-first prefixes matter
    val rows = (0L until 40L).map { i =>
      val boiler = "the a of and common words here"
      val tail = (0 until 6).map(j => s"t${(i + j) % 23}").mkString(" ")
      (i, s"$boiler $tail")
    } ++ Seq((100L, ""), (101L, "   "))
    val df = rows.toDF("id", "text")
    for (t <- Seq(0.6, 0.8, 0.95)) {
      val got = Dedup.prefixFilterJaccardPairs(df, "id", "text", t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSeq.sorted
      assert(got === naivePairs(rows, t), s"threshold $t")
    }
  }

  test("prefixFilterJaccardPairs: threshold 1.0 finds exactly the set-equal pairs") {
    val rows = Seq((1L, "x y z"), (2L, "z y x"), (3L, "x y z w"),
      (4L, "x x y z")) // 4 has same SET as 1 and 2
    val got = Dedup.prefixFilterJaccardPairs(rows.toDF("id", "text"),
        "id", "text", 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(got === Seq((1L, 2L), (1L, 4L), (2L, 4L)))
  }

  test("prefixFilterJaccardPairs: maxPrefixBucket refuses a closed vocabulary") {
    // every doc built from the same 4 tokens — zero rarity signal, the
    // quadratic-candidate regime the r12 smoke measured; the guard must
    // refuse loudly instead of silently going quadratic
    val rows = (0L until 50L).map(i => (i, "a b c d"))
    val df = rows.toDF("id", "text")
    val e = intercept[IllegalArgumentException] {
      Dedup.prefixFilterJaccardPairs(df, "id", "text", 0.6,
        maxPrefixBucket = 10L)
    }
    assert(e.getMessage.contains("no rarity signal"), e.getMessage)
    // generous cap: same corpus passes and stays exact
    val got = Dedup.prefixFilterJaccardPairs(df, "id", "text", 0.6,
        maxPrefixBucket = 1000L)
      .count()
    assert(got === 50L * 49 / 2) // identical sets: every pair at J=1
  }

  test("prefixFilterJaccardPairs: maxCandidates refuses aggregate blowup") {
    // MANY lukewarm buckets, none individually hot — the r13 1M-smoke
    // regime (239M candidates, max bucket 50): per-bucket caps can't
    // see it, the aggregate Σ c·(c−1)/2 estimate must
    val rows = (0L until 60L).map(i => (i, s"t${i % 12} u${i % 12} v${i % 12} w${i % 12}"))
    val df = rows.toDF("id", "text")
    val e = intercept[IllegalArgumentException] {
      Dedup.prefixFilterJaccardPairs(df, "id", "text", 0.6,
        maxCandidates = 20L)
    }
    assert(e.getMessage.contains("candidate pairs") &&
      e.getMessage.contains("minhashLshPairs"), e.getMessage)
    // the per-bucket guard alone passes the same corpus (max bucket 5
    // with 12 variants x 5 docs) — the two guards see different axes
    val viaBucket = Dedup.prefixFilterJaccardPairs(df, "id", "text", 0.6,
      maxPrefixBucket = 10L).count()
    // generous aggregate cap: passes and stays exact
    val viaCand = Dedup.prefixFilterJaccardPairs(df, "id", "text", 0.6,
      maxCandidates = 100000L).count()
    assert(viaBucket == viaCand)
    assert(viaCand == 12L * (5 * 4 / 2)) // 12 identical-set groups of 5
  }

  test("prefixFilterJaccardPairs: guards bad thresholds") {
    val df = Seq((1L, "a b")).toDF("id", "text")
    intercept[IllegalArgumentException](
      Dedup.prefixFilterJaccardPairs(df, "id", "text", 0.0))
    intercept[IllegalArgumentException](
      Dedup.prefixFilterJaccardPairs(df, "id", "text", 1.5))
  }
}
