package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy tooling for training-data and analytics releases — the
  * disclosure-side complement of [[TextAnalysis.scrubPii]]'s
  * content-side redaction: k-anonymity profiling of quasi-identifier
  * combinations, and seeded-Laplace differentially private counts.
  * Extension surface (north star; not in reference scope). */
object Privacy {

  /** k-anonymity report over a set of quasi-identifier columns (Sweeney
    * '02): every equivalence class (distinct quasi-identifier
    * combination) with its row count and a `risky` flag for classes
    * smaller than k — the rows a linkage attacker can single out by
    * joining the quasi-identifiers against an external table (exactly
    * the [[Dedup.linkRecords]] attack surface, run in reverse). The
    * release rule: suppress or generalize risky classes until none
    * remain; this is the readout that drives it.
    *
    * Scale shape: ONE hash aggregate keyed on the quasi-identifier
    * tuple (map-side partials) — the output is bounded by distinct
    * combinations, not rows. Generalization (bucketing a numeric
    * column, truncating a zip code) happens in caller expressions
    * BEFORE the call; the operator profiles whatever granularity it is
    * given. */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String], k: Int): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    require(k >= 2, "k-anonymity needs k >= 2")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("risky", col("n") < k)
  }

  /** Differentially private per-group counts via the Laplace mechanism
    * (Dwork et al. '06) with SEEDED noise: u = md5-uniform(seed, group)
    * in (0,1), noise = −(1/ε)·sign(u−½)·ln(1−2|u−½|) — the inverse-CDF
    * Laplace transform, scale 1/ε for the count query's sensitivity 1.
    * Seeding is deliberate and standard for reproducible releases: the
    * SAME release is re-derivable (audits, retries, multi-engine
    * pipelines) while fresh seeds give fresh draws; privacy holds as
    * long as the seed is not released alongside the data. The md5
    * transform is the [[Sampling.contentHashSplit]] portability
    * convention — 52 hash bits through the same libm ln on any engine.
    *
    * Scale shape: ONE group-keyed count aggregate; the noise is a
    * map-only expression over the (groups-sized) result. Output:
    * group, exact n (drop it before release!), noise (6dp),
    * noisy_n (6dp). */
  def dpCounts(df: DataFrame, groupCol: String, epsilon: Double,
      seed: String): DataFrame = {
    require(epsilon > 0, "epsilon must be positive")
    // (hash + 0.5) / 2^52 keeps u strictly inside (0, 1): a raw hash of
    // exactly 0 would give |u − ½| = ½ and ln(1 − 2·|·|) = ln 0 = −∞ —
    // a silently poisoned release cell at probability 2⁻⁵² per group.
    // The half-step offset bounds 1 − 2|u−½| ≥ 2⁻⁵² with zero bias.
    val u = (conv(substring(md5(concat(lit(seed), lit("|"),
        col(groupCol).cast("string")).cast("binary")), 1, 13), 16, 10)
      .cast("double") + lit(0.5)) / lit(4503599627370496.0) // 2^52
    val centered = u - 0.5
    val noise = (lit(-1.0) / epsilon) * signum(centered) *
      log(lit(1.0) - lit(2.0) * abs(centered))
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"))
      .withColumn("noise", round(noise, 6))
      .withColumn("noisy_n", round(col("n") + col("noise"), 6))
  }
}
