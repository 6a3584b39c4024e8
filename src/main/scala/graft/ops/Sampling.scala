package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines: reproducible
  * row selection with per-stratum rates (dataset mixture weighting,
  * decontamination holdouts, eval splits). No `rand()` anywhere — sampling
  * decisions are pure functions of row identity, so they are stable across
  * retries, partitions, engines, and re-runs (a non-negotiable for
  * training-data lineage).
  */
object Sampling {

  /** Production path: keep a row iff xxhash64(salt, id) lands under the
    * stratum's rate scaled into the full 64-bit space. Hash-based, so
    * correlated/sequential ids can't bias the sample. */
  def stratifiedSampleByHash(df: DataFrame, idCol: String,
      rateFor: Column, salt: Long = 42L): DataFrame = {
    // map hash to [0,1): shift into non-negative 63-bit range first
    val u = shiftrightunsigned(xxhash64(lit(salt), col(idCol)), 11)
      .cast("double") / lit((1L << 53).toDouble)
    df.filter(u < rateFor)
  }

  /** Oracle-friendly path: keep a row iff id % `den` lands among the
    * first round(rate * den) residues. The explicit round matters: a rate
    * whose product is not exactly representable (0.29 * 100 =
    * 28.999999999999996) would otherwise keep one residue more or fewer
    * than the rate says; rounding pins the kept-residue count to the
    * nearest integer in every IEEE engine. Exact same arithmetic is
    * expressible in any SQL engine; sampling is exact for ids that cycle
    * through residues. */
  def stratifiedSampleByMod(df: DataFrame, idCol: String,
      rateFor: Column, den: Int = 100): DataFrame =
    df.filter(pmod(col(idCol), lit(den)) < round(rateFor * den))

  /** Dataset-mixture sampling: derive a per-stratum keep rate that caps
    * each stratum's token contribution at `budget` tokens — rate =
    * min(1, budget / stratum_tokens) — then sample deterministically at
    * that rate. The classic mixture-weighting move when one source (e.g.
    * web crawl) dwarfs the others and the training recipe wants bounded
    * proportions. Scale shape: ONE aggregate produces the tiny per-stratum
    * totals frame (a handful of rows however large the corpus), broadcast
    * back for the rate; the sample itself is a map-side filter. `byHash =
    * true` (production) decides by xxhash64; `false` keeps the id-mod
    * arithmetic any SQL engine replays exactly (the oracle path — residue
    * granularity documented on [[stratifiedSampleByMod]]). Output keeps a
    * `mix_rate` column recording each row's applied rate.
    *
    * The input is deliberately scanned twice (once for the narrow totals
    * aggregate, once for the rated sample): persisting a corpus-sized
    * frame to save the second scan would cost more than the scan — the
    * opposite trade from the candidate-pair persists in [[Dedup]], where
    * the recomputed subtree is expensive and the cached frame tiny. */
  def mixtureByTokenBudget(df: DataFrame, stratumCol: String, idCol: String,
      tokenCol: String, budget: Long, byHash: Boolean = true,
      den: Int = 100): DataFrame = {
    require(budget > 0, "token budget must be positive")
    val totals = df.groupBy(col(stratumCol))
      .agg(sum(col(tokenCol)).as("__stratum_tokens"))
    val rated = df.join(broadcast(totals), Seq(stratumCol))
      .withColumn("mix_rate",
        least(lit(1.0), lit(budget.toDouble) / col("__stratum_tokens")))
      .drop("__stratum_tokens")
    if (byHash) stratifiedSampleByHash(rated, idCol, col("mix_rate"))
    else stratifiedSampleByMod(rated, idCol, col("mix_rate"), den)
  }

  /** Temperature-scaled (alpha) source-mixture weights — the multilingual/
    * multi-source pretraining move (Conneau & Lample 2019 §3.1; mT5 §3.2):
    * sampling weight p_i ∝ n_i^alpha over per-source token counts, so
    * alpha = 1 reproduces natural proportions, alpha → 0 flattens toward
    * uniform, and intermediate values boost the tail without letting the
    * head dominate. Emits per-source `n_tokens`, the normalized `weight`,
    * the `target_tokens` share of `budget`, and the per-source keep
    * `rate` = min(1, target/n) ready to feed [[mixtureByTokenBudget]]'s
    * samplers (a source cannot yield more tokens than it has; under-full
    * sources cap at rate 1 exactly as there). Scale shape: ONE grouped
    * aggregate over the corpus (source-keyed, map-side combined) collapses
    * everything to |sources| rows; the normalization is a broadcast of a
    * one-row total. Doubles are rounded to 6 places for engine-portable
    * comparison, the same policy as the TF-IDF/KL queries. */
  def temperatureMixture(df: DataFrame, sourceCol: String, textCol: String,
      alpha: Double, budget: Long): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, "alpha in (0, 1] by contract")
    require(budget > 0, "token budget must be positive")
    val counts = df.groupBy(col(sourceCol).as("source"))
      .agg(sum(size(TextAnalysis.tokens(col(textCol)))).as("n_tokens"))
      .withColumn("__pw", pow(col("n_tokens").cast("double"), lit(alpha)))
    val total = counts.agg(sum(col("__pw")).as("__tot"))
    counts.crossJoin(broadcast(total))
      .withColumn("weight", round(col("__pw") / col("__tot"), 6))
      .withColumn("target_tokens",
        round(col("__pw") / col("__tot") * budget).cast("long"))
      .withColumn("rate",
        round(least(lit(1.0),
          col("__pw") / col("__tot") * budget /
            col("n_tokens").cast("double")), 6))
      .select(col("source"), col("n_tokens"), col("weight"),
        col("target_tokens"), col("rate"))
  }

  /** UniMax epoch-capped mixture (Chung et al. '23, "UniMax: Fairer and
    * More Effective Language Sampling for Large-Scale Multilingual
    * Pretraining") — the budget allocator that replaced temperature
    * flattening in PaLM-2-class mixtures: instead of boosting the tail
    * by a power law (which still over-repeats tiny sources), distribute
    * the token budget as UNIFORMLY as possible subject to a per-source
    * repetition cap — no source is seen for more than `epochCap`
    * epochs. This is exactly water-filling with capacities
    * cᵢ = epochCap·nᵢ: sources too small to absorb a uniform share get
    * their full cap (epochs = epochCap); the surplus redistributes
    * uniformly over the rest, so every uncapped source receives the
    * SAME token count u (not the same epoch count — that is the
    * fairness inversion UniMax fixes).
    *
    * Determinism contract: capacities snap to the integer micro-unit
    * grid (round(n·cap·10⁶) — the mean6Exact playbook), prefix sums
    * and the capped/uncapped BOUNDARY are exact integer comparisons
    * (cᵢ·(m−i+1) ≤ B_µ − P_{i−1}, arbitrary precision — no FP
    * comparison can flip a boundary source between engines), and only
    * the final uniform level u is a double: ONE division of an exact
    * integer numerator, identical in any engine. Cappedness is
    * downward-closed in ascending (capacity, source) order — proved by
    * the prefix inequality folding one step left — so the boundary is
    * a single scan. Outputs round via Spark `round` (the established
    * DuckDB ROUND parity surface).
    *
    * Scale shape: ONE source-keyed aggregate (map-side combined)
    * collapses the corpus to |sources| rows — bounded model state, the
    * x170 globalTokenOffsets discipline — and the water-filling scan
    * is |sources|-sized driver work (an unpartitioned window over even
    * a small frame is banned by the repo's plan budgets). Output:
    * (source, n_tokens, target_tokens, epochs ≤ epochCap, capped),
    * ready to feed [[mixtureByTokenBudget]]'s samplers. */
  def unimaxMixture(df: DataFrame, sourceCol: String, textCol: String,
      budget: Long, epochCap: Double): DataFrame = {
    require(budget > 0 && budget <= 9000000000000L,
      "budget in (0, 9e12] (micro-unit long arithmetic)")
    require(epochCap > 0.0, "epoch cap must be positive")
    val spark = df.sparkSession
    val counts = df
      .groupBy(col(sourceCol).cast("string").as("source"))
      .agg(sum(size(TextAnalysis.tokens(col(textCol)))).as("n_tokens"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // ascending (capacity, source) — the water-filling scan order
    val sorted = counts.map { case (s, n) =>
      (s, n, math.floor(n.toDouble * epochCap * 1e6 + 0.5).toLong)
    }.sortBy { case (s, _, capM) => (capM, s) }
    val m = sorted.length
    val budgetM = BigInt(budget) * 1000000
    // exact boundary scan: source i (1-based) is capped iff
    // cap_i * (m - i + 1) <= budgetM - P_{i-1}
    var p = BigInt(0); var kStar = 0; var scanning = true
    sorted.zipWithIndex.foreach { case ((_, _, capM), i) =>
      if (scanning &&
          BigInt(capM) * (m - i) <= budgetM - p) {
        p += capM; kStar = i + 1
      } else scanning = false
    }
    val uFinal =
      if (kStar >= m) 0.0 else (budgetM - p).toDouble / (m - kStar)
    val rows = sorted.zipWithIndex.map { case ((s, n, capM), i) =>
      (s, n, if (i < kStar) capM.toDouble else uFinal, i < kStar)
    }
    import spark.implicits._
    spark.createDataset(rows.toSeq)
      .toDF("source", "n_tokens", "__alloc_micro", "capped")
      .select(col("source"), col("n_tokens"),
        round(col("__alloc_micro") / 1e6).cast("long").as("target_tokens"),
        // greatest(n_tokens, 1): a source whose texts tokenize to zero
        // tokens allocates 0 (its capacity is 0) — its epochs must read
        // 0.0, not the NULL a 0/0 division would emit (advisor r13)
        round(col("__alloc_micro") /
            (greatest(col("n_tokens"), lit(1L)) * lit(1e6)), 6)
          .as("epochs"),
        col("capped"))
  }

  /** Deterministic train/val/test assignment keyed on a CONTENT hash (md5
    * of the content column), not the row id: the same document re-ingested
    * under a different id lands in the same split, which is what
    * train/eval leakage control actually requires. Buckets are the last
    * hex nibble of the md5 (0-15); `trainBuckets` of them go to `train`,
    * the next `valBuckets` to `val`, the rest to `test`. md5 is
    * engine-portable bit-for-bit, so the split is reproducible off-Spark
    * (and oracle-checkable, unlike the xxhash64 paths). Map-only: adds a
    * `split` column, no shuffle. NULL content hashes to NULL and falls
    * through to `test` — route or drop null documents upstream if that
    * placement matters. */
  def contentHashSplit(df: DataFrame, contentCol: String,
      trainBuckets: Int = 14, valBuckets: Int = 1): DataFrame = {
    require(trainBuckets >= 1 && valBuckets >= 1 &&
      trainBuckets + valBuckets <= 15,
      "need at least one bucket per split out of 16")
    val b = conv(substring(md5(col(contentCol).cast("binary")), 32, 1), 16, 10)
      .cast("int")
    df.withColumn("split",
      when(b < trainBuckets, "train")
        .when(b < trainBuckets + valBuckets, "val")
        .otherwise("test"))
  }

  /** Leakage-safe train/val/test split — near-duplicate CLUSTERS are
    * the split unit, so two near-copies can never land on opposite
    * sides of the train/eval boundary. Splitting on raw doc identity
    * (or content hash) puts a document's near-duplicate in the training
    * set while the document itself sits in eval — the held-out metric
    * silently becomes a memorization probe (the split-leakage failure
    * mode the dedup literature warns about; the reason dedup runs
    * BEFORE splitting in every serious pipeline, and the safety net
    * when some near-dups survive it).
    *
    * `labels` is an (id, cluster_id) frame from
    * [[graft.ops.Dedup.resolveClusters]] — pair participants only;
    * docs without a label are singletons keyed by their own id. The
    * split decision is [[contentHashSplit]]'s md5 nibble over the
    * CLUSTER key — deterministic, engine-portable, and identical for
    * every member of a cluster by construction.
    *
    * Scale shape: one id-keyed left join of the (8+8)-byte label frame
    * (pair-participant-sized — orders of magnitude below corpus) plus
    * the map-only md5 bucket; no window, no second shuffle. */
  def leakageSafeSplit(df: DataFrame, idCol: String, labels: DataFrame,
      trainBuckets: Int = 14, valBuckets: Int = 1): DataFrame = {
    val lab = labels.select(col("id").as(idCol), col("cluster_id"))
    val keyed = df.join(lab, Seq(idCol), "left")
      .withColumn("cluster_key",
        coalesce(col("cluster_id"), col(idCol)).cast("string"))
      .drop("cluster_id")
    contentHashSplit(keyed.withColumn("__ck", col("cluster_key")),
      "__ck", trainBuckets, valBuckets).drop("__ck")
  }

  /** EXACT-count per-group sample — the mixture-recipe demand rate-based
    * sampling cannot meet: "exactly k documents per source",
    * reproducibly, engine-portably. Every row gets the deterministic
    * ranking key md5(salt|id) (the [[contentHashSplit]] portability
    * convention — NOT xxhash64, so the SELECTION itself replays in a SQL
    * oracle) and the k smallest keys per group win — a uniform
    * without-replacement sample because md5 order is independent of any
    * data attribute. Groups smaller than k keep every member.
    *
    * Scale shape: k-selection on the bounded-heap
    * [[graft.plans.TopK]] operator — ONE hash exchange on the group key,
    * no per-group sort, O(groups x k) memory, with the operator's
    * documented spillable-window fallback above its group-cardinality
    * guard. `rank_key` rides along in the output (drop it for the pure
    * sample; keep it to extend the sample later — the k+1..k+m smallest
    * keys are the deterministic next picks).
    *
    * `maxGroups` defaults to unlimited — the group column is a
    * source/shard key by this operator's contract (bounded cardinality),
    * and the default skips TopK.perGroup's eager approx_count_distinct
    * guard pass, which would otherwise cost a FULL extra input scan on
    * every call. Pass a finite `maxGroups` when the group key's
    * cardinality is NOT known-bounded: the guard pass re-enables and
    * high-cardinality inputs route to the spillable window formulation
    * instead of O(groups x k) heap memory. */
  def exactKPerGroup(df: DataFrame, groupCol: String, idCol: String,
      k: Int, salt: Long = 42L,
      maxGroups: Long = Long.MaxValue): DataFrame = {
    require(k > 0, "need k >= 1")
    val keyed = df.withColumn("rank_key",
      md5(concat_ws("|", lit(salt), col(idCol).cast("string"))))
    graft.plans.TopK.perGroup(keyed, Seq(groupCol),
      Seq(("rank_key", true), (idCol, true)), k, maxGroups)
  }

  /** Cluster-balanced embedding sample — the diversity-preserving
    * alternative to uniform subsampling when building eval sets or
    * seed corpora from an embedded collection: k-means clusters stand
    * in for semantic strata, and each cluster contributes AT MOST `k`
    * members (small clusters keep everything), so rare semantic regions
    * survive a downsample that uniform sampling would wash out
    * (DeepCore / cluster-coverage coreset recipe). Within a cluster the
    * pick is [[exactKPerGroup]]'s md5-ranked uniform — deterministic,
    * engine-replayable, independent of any data attribute.
    *
    * Composes the engine's own pieces end to end: centroids from
    * [[graft.ops.IVF.train]] (or [[graft.ops.IVF.trainPortable]] when
    * the selection itself must replay in a SQL oracle), assignment as
    * the native map-only loop expression, selection on the bounded-heap
    * TopK operator behind ONE centroid-keyed exchange (cluster count is
    * bounded by the model, so the heap path always applies).
    * `cluster_size` rides along from the same assignment pass — the
    * coverage audit (how much of each region the sample kept) comes
    * free.
    *
    * Output: (centroid_id, idCol, rank_key, cluster_size), ≤ k rows per
    * centroid. */
  def clusterBalancedSample(emb: DataFrame, idCol: String, vecCol: String,
      model: graft.ops.IVF.Model, k: Int, salt: Long = 42L): DataFrame = {
    require(k >= 1, "need k >= 1")
    val assigned = graft.ops.IVF.assign(emb, vecCol, model)
      .select(col(idCol), col("centroid_id").cast("long").as("centroid_id"))
    val sizes = assigned.groupBy(col("centroid_id"))
      .agg(count(lit(1)).as("cluster_size"))
    exactKPerGroup(assigned, "centroid_id", idCol, k, salt)
      .join(sizes, Seq("centroid_id"))
      .select(col("centroid_id"), col(idCol), col("rank_key"),
        col("cluster_size"))
  }

  /** EXACT token-budget prefix per group — [[mixtureByTokenBudget]]'s
    * exact sibling: where the rate formulation hits the budget only in
    * expectation, this walks each group's rows in md5(salt|id) order
    * (the [[exactKPerGroup]] ranking — uniform, deterministic,
    * SQL-replayable) and keeps every row whose running total STARTS
    * under the budget — the [[graft.ops.Packing.packByBudget]] bin
    * convention, so the first row crossing the budget is kept and each
    * group lands within one document of its target. Budgets NEST: the
    * budget-b sample is a prefix of every budget-b' ≥ b sample, so a
    * recipe can grow a mixture without resampling what it already took.
    * Adds `rank_key`, `cum_before` (tokens before this row in sample
    * order) and `kept`; rows are all emitted (corpus accounting), filter
    * on `kept` for the sample.
    *
    * Scale shape: one group-keyed window in rank order — the
    * [[perSourcePercentile]] shape, groups scan independently in
    * parallel, no global sort, no second pass (the rate formulation's
    * totals aggregate isn't needed: the prefix decides locally). */
  def budgetPrefixPerGroup(df: DataFrame, groupCol: String, idCol: String,
      tokenCol: String, budget: Long, salt: Long = 42L): DataFrame = {
    require(budget > 0, "need budget >= 1")
    val keyed = df.withColumn("rank_key",
      md5(concat_ws("|", lit(salt), col(idCol).cast("string"))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("rank_key"), col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        -1)
    keyed
      .withColumn("cum_before",
        coalesce(sum(col(tokenCol)).over(w), lit(0L)).cast("long"))
      .withColumn("kept", col("cum_before") < budget)
  }

  /** Per-source percentile normalization of a score column — the
    * threshold-calibration step before cross-source filtering: a raw
    * quality cutoff tuned on one source transfers wrongly to another
    * (news scores cluster high, forum scores low — one global 0.6 keeps
    * all of one and none of the other), so production filters threshold
    * the per-source PERCENTILE instead ("drop every source's bottom
    * 20%"). Adds `pct` = percent_rank within the source (0 = worst,
    * 1 = best, ties share a rank), rounded 6dp.
    *
    * Scale shape: ONE source-partitioned window — the exchange is the
    * source key, each source ranks independently in parallel (the
    * quality-curriculum shape, NOT a global sort); no corpus-wide
    * single partition anywhere. Sources with one row pin pct = 0.0
    * (percent_rank's degenerate case — documented, the spec covers
    * it). */
  def perSourcePercentile(df: DataFrame, srcCol: String,
      scoreCol: String): DataFrame =
    df.withColumn("pct", round(percent_rank().over(
      org.apache.spark.sql.expressions.Window.partitionBy(col(srcCol))
        .orderBy(col(scoreCol))), 6))

  /** Quality-curriculum sampling: bucket rows by EXACT score quantiles —
    * cut points at i/n for n = `rates.length` — and keep each bucket at
    * its own rate (the data-mixing move when the training recipe wants
    * e.g. the top quality quintile whole but only 10% of the bottom one).
    * Adds `bucket` (0 = lowest), `rate`, and the deterministic `kept`
    * flag; callers filter on `kept` or tally.
    *
    * Scale shape: ONE exact-percentile aggregate produces the tiny
    * (n-1)-value cut array, broadcast back; bucketing is a map-only array
    * filter; the keep decision is the same pure-function-of-id sample as
    * the other paths here. Deliberately NO `ntile()`: a corpus-wide rank
    * window has no partition key, so Spark would pull the whole corpus
    * into a single partition — the quantile-threshold formulation gets
    * the same buckets (up to tie placement at the cuts) without any
    * global sort. The exact percentile is itself a full-sort aggregate;
    * swap `percentile_approx` in at 100 TB exactly as the distribution
    * profile (x47) documents — kept exact here so DuckDB can replay
    * bucket assignment bit-for-bit.
    *
    * NULL-score rows take `bucket = NULL, rate = NULL, kept = false`
    * (they are excluded from the quantile cuts too — `percentile`
    * ignores nulls); an all-null or empty score column yields all-NULL
    * buckets rather than an error. */
  def quantileBucketSample(df: DataFrame, idCol: String, scoreCol: String,
      rates: Seq[Double], byHash: Boolean = false, den: Int = 100,
      salt: Long = 42L): DataFrame = {
    require(rates.nonEmpty, "need one keep-rate per bucket")
    val n = rates.length
    val cuts = (1 until n).map(i => lit(i.toDouble / n))
    val th = df.agg(
      percentile(col(scoreCol), array(cuts: _*)).as("__th"))
    val rateArr = array(rates.map(lit): _*)
    // NULL scores get the explicit sentinel (bucket NULL, rate NULL,
    // kept false), never a silent bucket-0 placement: the lambda filter
    // drops elements whose predicate is NULL, so an unguarded
    // size(filter(...)) would file every null-score row under bucket 0
    // at bucket 0's keep rate — and an ALL-null score column makes the
    // percentile aggregate itself NULL, where size(NULL) = -1 sends
    // element_at an out-of-range index. Score rows are still emitted
    // (dropped rows would silently change corpus accounting); callers
    // route or drop them explicitly.
    val keyed = df.crossJoin(broadcast(th))
      .withColumn("bucket",
        when(col(scoreCol).isNotNull,
          size(filter(col("__th"), x => col(scoreCol) > x))))
      // the when() guard is not redundant: element_at over a foldable
      // array of non-null literals declares itself NON-nullable, and the
      // null bucket index then degrades to a default 0.0 instead of NULL
      .withColumn("rate",
        when(col("bucket").isNotNull,
          element_at(rateArr, col("bucket") + 1)))
      .drop("__th")
    val kept =
      if (byHash)
        (shiftrightunsigned(xxhash64(lit(salt), col(idCol)), 11)
          .cast("double") / lit((1L << 53).toDouble)) < col("rate")
      // round() for the same representability reason as
      // [[stratifiedSampleByMod]]: the kept-residue count per bucket is
      // exactly round(rate * den)
      else pmod(col(idCol), lit(den)) < round(col("rate") * den)
    keyed.withColumn("kept",
      when(col(scoreCol).isNotNull, kept).otherwise(lit(false)))
  }

  /** Reproducible global corpus shuffle + training-shard assignment — the
    * step between corpus prep and sequence packing: training wants
    * documents in a mixed order that is a pure function of row identity,
    * so retries, re-runs, and other engines reproduce the SAME
    * permutation (the lineage requirement again — `orderBy(rand())` is
    * exactly what this op exists to replace). The shuffle key is
    * md5(salt || "_" || id), engine-portable bit-for-bit like
    * [[contentHashSplit]]'s buckets: `shard` is the key's first four hex
    * nibbles mod `numShards` (map-only; 65536 residues make the mod bias
    * negligible at sane shard counts), `pos` orders rows WITHIN a shard
    * by the key (hex strings compare consistently across engines).
    * Scale shape: one hash exchange on `shard`, then each shard sorts
    * independently — md5 spreads rows uniformly, so no skew. A
    * corpus-wide `row_number` is refused on purpose: a global rank needs
    * a single range exchange whose boundary sampling and tail stitching
    * serialize at 100 TB, while a training consumer reading shards in
    * (shard, pos) order gets an equivalent reproducible permutation. */
  /** Deterministic weighted sampling WITHOUT replacement
    * (Efraimidis–Spirakis A-ES): each row draws key = u^(1/w) with u a
    * uniform derived from md5(salt, id) — the top-k keys ARE a correct
    * weighted sample. The standard trick for "sample 10k docs
    * proportional to quality score" where rates-per-stratum
    * ([[mixtureByTokenBudget]]) are too coarse. Deterministic and
    * engine-replayable end-to-end: u comes from the first 13 md5 hex
    * digits (52 bits — exactly representable in a double), never a JVM
    * RNG, so the oracle reproduces the same sample.
    *
    * Scale shape: key computation is map-only (plus one scalar max
    * broadcast); selection is one TakeOrdered top-k (no global sort, no
    * window). Weights are NORMALIZED by their max before
    * exponentiation — u^(1/w) for large w collapses onto 1.0 within
    * double precision and selection would degenerate to id order, while
    * u^(max/w) spans (0,1) at ANY weight magnitude and x -> x^(1/c) is
    * monotone, so normalization provably never changes which rows are
    * selected. Selection orders on the RAW key; `sample_key` is rounded
    * 8dp for display/replay only. Null and non-positive weights are
    * EXCLUDED before keying (a negative exponent would silently sort
    * such rows first — the quiet-corruption trap
    * [[quantileBucketSample]]'s null-sentinel note documents); callers
    * sampling "everything weighted, invalid rows too" must fix their
    * score column first. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      k: Int, salt: Long = 42L): DataFrame = {
    require(k >= 1, "need a positive sample size")
    // (0,1]: 52-bit integer + 1 over 2^52 + 1
    val u = (conv(substring(md5(concat(lit(s"ws${salt}_"),
        col(idCol).cast("string")).cast("binary")), 1, 13), 16, 10)
      .cast("double") + 1.0d) / 4503599627370497.0d
    val valid = df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
    val maxW = valid.agg(max(col(weightCol)).cast("double").as("__wmax"))
    valid.crossJoin(broadcast(maxW))
      .withColumn("__key",
        pow(u, col("__wmax") / col(weightCol).cast("double")))
      .orderBy(col("__key").desc, col(idCol))
      .limit(k)
      .withColumn("sample_key", round(col("__key"), 8))
      .drop("__key", "__wmax")
  }

  def deterministicShuffle(df: DataFrame, idCol: String, numShards: Int,
      salt: Long = 42L): DataFrame = {
    require(numShards >= 1, "need at least one output shard")
    val key = md5(concat(lit(s"${salt}_"), col(idCol).cast("string"))
      .cast("binary"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("__skey"), col(idCol))
    df.withColumn("__skey", key)
      .withColumn("shard",
        pmod(conv(substring(col("__skey"), 1, 4), 16, 10).cast("long"),
          lit(numShards.toLong)).cast("int"))
      .withColumn("pos", (row_number().over(w) - 1).cast("long"))
      .drop("__skey")
  }

  /** Prototypicality pruning (Sorscher et al. 2022, "Beyond neural
    * scaling laws" — the SSL-prototypes metric; composed with SemDeDup
    * in Abbas et al.'s D4 pipeline): within each embedding cluster,
    * rank vectors by cosine similarity to their centroid and PRUNE the
    * most prototypical (easiest) fraction — with abundant data, the
    * paper's result is that keeping the HARD examples (far from their
    * prototype) beats random pruning, while tiny datasets prune the
    * opposite end. This operator is the abundant-data direction; for
    * the keep-easy direction filter on the emitted rank yourself.
    *
    * Per cluster of size n, exactly `floor(pruneFraction * n)` rows are
    * pruned — the `proto_rank <= cut` rows, rank 1 = highest
    * centroid_sim, ties broken by SMALLEST id (the deterministic
    * [[graft.ops.Dedup.semanticDedup]] tie discipline, SQL-replayable).
    * Emits every input row (corpus accounting): (id, cluster_id,
    * centroid_sim 6dp, proto_rank, cluster_size, kept) — filter on
    * `kept` for the survivors.
    *
    * Scale shape: assignment is [[graft.ops.Dedup.assignToCentroids]]
    * (map-only literal argmax ≤ 64 centroids, broadcast-join +
    * partial-agg max above); then ONE cluster-keyed exchange carrying
    * narrow (id, cluster_id, sim) rows feeds both windows (rank +
    * size share the partitioning, so Spark plans a single shuffle).
    * Unlike SemDeDup's quadratic within-cluster compare, the window is
    * LINEAR in cluster size — a skewed giant cluster costs one slow
    * sort partition, not n² cosines, so no size guard is needed. */
  def prototypicalityPrune(emb: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, cidCol: String, cvecCol: String,
      pruneFraction: Double): DataFrame = {
    require(pruneFraction >= 0.0 && pruneFraction < 1.0,
      s"pruneFraction in [0, 1): $pruneFraction")
    val cents = graft.ops.Dedup.collectCentroids(centroids, cidCol, cvecCol)
    val assigned = graft.ops.Dedup
      .assignToCentroids(emb, idCol, vecCol, cents)
      .select(col(idCol), col("cluster_id"), col("centroid_sim"))
    val byProto = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster_id"))
      .orderBy(col("centroid_sim").desc, col(idCol))
    val bySize = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster_id"))
    assigned
      .withColumn("proto_rank", row_number().over(byProto).cast("long"))
      .withColumn("cluster_size", count(lit(1)).over(bySize))
      .withColumn("kept", col("proto_rank") >
        floor(lit(pruneFraction) * col("cluster_size")))
  }
}
