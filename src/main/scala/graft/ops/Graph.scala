package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph scoring for crawl-corpus curation. Production crawl
  * pipelines weight documents by host-level link authority (Common
  * Crawl's host ranks feed quality filters); this is that computation
  * expressed as fixed-iteration dataframe rounds. Extension surface
  * (beyond reference scope — the reference has no graph ops).
  */
object Graph {

  /** Damped PageRank over an edge list, fixed iteration count.
    * r'(v) = (1-d)/N + d · Σ_{u→v} r(u)/outdeg(u). Nodes are the union
    * of sources and destinations; a node with no in-edges settles at
    * (1-d)/N. Dangling-node mass is NOT redistributed (the simplified
    * variant; with every node holding an out-edge the two variants
    * coincide — the x73 fixture guarantees that by construction).
    *
    * Scale shape: the canonical Pregel-lite loop — the (edge, outdeg)
    * frame is built once, persisted, and re-joined each round, so every
    * iteration costs one src-keyed join plus one dst-keyed aggregate of
    * (id, double) pairs; edges never re-shuffle their text/payload
    * because there is none (8-byte ids only). Each `checkpointEvery`
    * rounds the rank frame is localCheckpoint'd, truncating lineage —
    * without it a 50-iteration run chains 100 operators and analyzer
    * cost grows superlinearly with depth (same guidance as
    * [[Dedup.resolveClusters]]'s distributed path, now enforced in
    * code). The node count is ONE driver scalar (an aggregate, not a
    * collect). Ranks round 8dp at the END only — intermediate rounding
    * would compound; per-node contribution sums in the fixture are
    * 2-operand and therefore order-exact across engines. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, damping: Double = 0.85,
      checkpointEvery: Int = 10): DataFrame = {
    require(iters >= 1 && damping > 0 && damping < 1 && checkpointEvery >= 1)
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val nodes = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id"))).distinct().persist()
    val n = nodes.count()
    val prepped = e
      .join(e.groupBy(col("src")).agg(count(lit(1)).as("__outdeg")),
        Seq("src"))
      .persist()
    var ranks = nodes.withColumn("rank", lit(1.0 / n))
    var it = 0
    while (it < iters) {
      val contrib = prepped
        .join(ranks.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst").as("id"),
          (col("rank") / col("__outdeg")).as("__c"))
        .groupBy(col("id")).agg(sum(col("__c")).as("__contrib"))
      ranks = nodes.join(contrib, Seq("id"), "left")
        .select(col("id"),
          (lit((1 - damping) / n) +
            lit(damping) * coalesce(col("__contrib"), lit(0.0)))
            .as("rank"))
      it += 1
      if (it % checkpointEvery == 0 && it < iters)
        ranks = ranks.localCheckpoint()
    }
    // materialize the node-sized result, then release the iteration
    // caches — without this every call leaks the persisted edge frame
    // for the session's lifetime (the repo-wide persist/unpersist
    // convention: IVF.train, resolveClusters)
    val out = ranks.withColumn("rank", round(col("rank"), 8))
      .localCheckpoint()
    nodes.unpersist()
    prepped.unpersist()
    out
  }
}
