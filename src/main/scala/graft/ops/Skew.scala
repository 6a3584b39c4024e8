package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for joins whose key distribution is heavy-
  * tailed (one hot account/user dominating a partition).
  *
  * First line of defense is AQE's skew-join splitting
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default) — use these
  * helpers when the skew is known ahead of time or AQE can't apply (e.g.
  * the build side is already bucketed, or the join feeds a window that
  * re-partitions on the same key anyway).
  */
object Skew {

  /** Salted equi-join of a skewed fact side against a (replicable) dim side:
    * fact rows scatter across `salts` sub-keys via a deterministic hash of
    * the whole row; the dim side replicates once per salt. Result set is
    * identical to `fact.join(dim, Seq(key))` — only the partitioning of the
    * shuffle changes (hot key's rows spread over `salts` reducers).
    * Cost: dim side inflates x salts — use for genuinely small dim sides
    * (where broadcast is unavailable, e.g. dim just over the broadcast
    * threshold).
    *
    * Only inner/left(-outer) join types are allowed: with right/full outer
    * the replicated dim side would emit one unmatched copy PER SALT, i.e.
    * `salts` duplicates of every dim row that has no fact match. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      salts: Int = 8, joinType: String = "inner"): DataFrame = {
    require(salts > 0)
    // Spark accepts bare "semi"/"anti" as aliases of left_semi/left_anti —
    // normalize them too so valid aliases aren't rejected
    val jt = joinType.toLowerCase.replace("_", "").replace("outer", "") match {
      case "semi" => "leftsemi"
      case "anti" => "leftanti"
      case other => other
    }
    require(jt == "inner" || jt == "left" || jt == "leftsemi" || jt == "leftanti",
      s"saltedJoin supports inner/left/left_semi/left_anti only, got '$joinType': " +
        "right/full outer would replicate unmatched dim rows once per salt")
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(struct(fact.columns.map(col): _*)), lit(salts)).cast("int"))
    val expandedDim = dim
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
      .withColumn("__salt", col("__salt").cast("int"))
    saltedFact.join(expandedDim, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Pin the parallelism of a COMPUTE-bound pair stage (blocked self-
    * joins, candidate-verify legs: levenshtein, shingle intersection,
    * per-pair scoring) with an explicit-count hash repartition on the
    * block/candidate key.
    *
    * Why explicit: AQE's partition coalescing is BYTE-based. A candidate
    * frame is often a few hundred KB on the wire while the per-pair work
    * downstream is thousands of times the byte volume, so AQE folds a
    * bare `repartition(col)` (or the join's own exchange) back to ONE
    * task and the whole verify leg serializes — measured in r11 as a
    * 4.5s single-task probe on the sf0.1 record-linkage fixture. An
    * explicit partition count (`repartition(n, col)`) is exempt from
    * AQE coalescing, which is exactly the behavior a compute-bound
    * stage needs; the key keeps co-partitioning for the join so no
    * second exchange appears.
    *
    * `numParts <= 0` (default) uses the session's shuffle parallelism —
    * at cluster scale, set `spark.sql.shuffle.partitions` for the job
    * and every pair stage follows. */
  def repartitionForPairCompute(df: DataFrame,
      key: org.apache.spark.sql.Column, numParts: Int = 0): DataFrame = {
    val n = if (numParts > 0) numParts
      else df.sparkSession.sessionState.conf.numShufflePartitions
    df.repartition(n, key)
  }

  /** Two-phase (salted) distinct-count for a heavily skewed group key:
    * partial distinct per (key, salt) then merge — bounds the width of any
    * single reducer's hash set. For algebraic aggregates (sum/count/avg)
    * Spark's partial aggregation already handles skew; this matters for
    * holistic ones like countDistinct. */
  def skewedCountDistinct(df: DataFrame, groupKey: String, distinctCol: String,
      salts: Int = 8): DataFrame =
    df.withColumn("__salt",
        pmod(xxhash64(col(distinctCol)), lit(salts)).cast("int"))
      .groupBy(col(groupKey), col("__salt"))
      .agg(countDistinct(col(distinctCol)).as("__partial"))
      .groupBy(col(groupKey))
      .agg(sum("__partial").as(s"${distinctCol}_distinct"))
}
