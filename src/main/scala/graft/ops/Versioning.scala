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
}
