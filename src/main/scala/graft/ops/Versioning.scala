package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset-version diffing for training-data lineage: given two corpus
  * versions keyed by id, classify every id as added / removed / changed /
  * unchanged — the QA table a data-versioning workflow renders before
  * promoting v2 (how much churned? did a refresh silently rewrite half the
  * corpus?). Extension surface (beyond reference scope).
  */
object Versioning {

  /** Per-id diff status between two versions of a corpus. Content equality
    * is decided on the 8-byte xxhash64 digest, computed BEFORE the join so
    * only (id, digest) pairs ride the full-outer exchange — document text
    * never shuffles (same collision argument as
    * [[Dedup.exactByDigest]], ~2^-64). Output: (id, status). */
  def datasetDiff(v1: DataFrame, v2: DataFrame, idCol: String,
      contentCol: String): DataFrame = {
    def digests(df: DataFrame, side: String): DataFrame =
      df.select(col(idCol).as("id"), xxhash64(col(contentCol)).as(s"__d_$side"))
    digests(v1, "a").join(digests(v2, "b"), Seq("id"), "full_outer")
      .select(col("id"),
        when(col("__d_a").isNull, "added")
          .when(col("__d_b").isNull, "removed")
          .when(col("__d_a") === col("__d_b"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** Token-distribution drift between two corpus versions — the
    * content-level companion to [[datasetDiff]]'s id-level churn: which
    * tokens gained or lost probability mass when v1 became v2? A refresh
    * that silently floods the corpus with boilerplate, drops a language,
    * or injects a crawler artifact shows up here as its tokens' mass
    * delta, before training ever runs on the new version. Output: the
    * `k` largest movers by |p_new − p_old| (tie: token asc) with both
    * counts and both probabilities (rounded 8dp for engine parity).
    *
    * Scale shape: two token-count aggregates (map-side combining
    * collapses each corpus to vocabulary size), a full-outer join on the
    * token key, scalar totals broadcast back, and a TakeOrdered top-k —
    * nothing corpus-sized ever shuffles except the (token, count)
    * pairs. */
  def versionTokenDrift(v1: DataFrame, v2: DataFrame, textCol: String,
      k: Int): DataFrame = {
    require(k >= 1)
    def counts(df: DataFrame, out: String): DataFrame = df
      .select(explode(TextAnalysis.tokens(lower(col(textCol)))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as(out))
    val joined = counts(v1, "cnt_old")
      .join(counts(v2, "cnt_new"), Seq("token"), "full_outer")
      .na.fill(0L, Seq("cnt_old", "cnt_new"))
    // totals via one narrow per-row scan each (sum of token counts) —
    // aggregating over `joined` would execute the full-outer join twice
    val totals = v1
      .agg(sum(size(TextAnalysis.tokens(lower(col(textCol)))))
        .cast("long").as("__to"))
      .crossJoin(v2.agg(sum(size(TextAnalysis.tokens(lower(col(textCol)))))
        .cast("long").as("__tn")))
    joined.crossJoin(broadcast(totals))
      .withColumn("p_old", round(col("cnt_old") / col("__to"), 8))
      .withColumn("p_new", round(col("cnt_new") / col("__tn"), 8))
      .withColumn("delta", round(col("p_new") - col("p_old"), 8))
      .select(col("token"), col("cnt_old"), col("cnt_new"),
        col("p_old"), col("p_new"), col("delta"))
      .orderBy(abs(col("delta")).desc, col("token"))
      .limit(k)
  }
}
