package graft.ops

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.DataFrame

/** The repo-wide contract for operators whose RETURNED LAZY FRAME is
  * built over an internally persisted subtree (the multi-consumer
  * materialization pattern: the persist keeps a shared stage — banded
  * signatures, candidate pairs, count tables — from recomputing once
  * per consumer, but the handle never crosses the public signature).
  *
  * Two patterns, one rule:
  *  - operators returning MODEL STATE with a natural lifetime expose an
  *    explicit release handle ([[TextAnalysis.KnModel.unpersist]], the
  *    release thunk of [[IncrementalDedup]]'s two-scan path) — eager
  *    release is part of that API;
  *  - operators returning ONE lazy result frame register the persisted
  *    subtree here via [[Caching.scoped]] instead of a bare
  *    `.persist()`. The cache then lives for the session by default
  *    (a release handle on every one-shot result signature is not
  *    worth the API noise), and a long-lived production session
  *    reclaims everything at a safe point with [[Caching.releaseAll]].
  *
  * "Safe point" means after the caller has materialized or written the
  * frames it still holds: unpersisting under a live lazy plan merely
  * recomputes on next use — it never corrupts results — so
  * [[releaseAll]] trades CPU for memory and nothing else. The registry
  * holds STRONG references deliberately: Spark's CacheManager already
  * pins every persisted plan until an explicit unpersist (GC never
  * frees SQL cache entries), so the registry adds no retention beyond
  * Spark's own — a weak reference here would just be collected with
  * the short-lived Dataset wrapper while the cached blocks lived on,
  * leaving nothing to release them with. */
object Caching {
  private val registry = new ConcurrentLinkedQueue[DataFrame]()

  /** Persist `df`, registered for [[releaseAll]]: the scoped spelling
    * of the multi-consumer persist. Callers still `.count()` where
    * single materialization must be FORCED before fan-out (the
    * bucketCandidates convention). */
  private[graft] def scoped(df: DataFrame): DataFrame = {
    df.persist()
    registry.add(df)
    df
  }

  /** Unpersist every scoped frame registered since the last drain;
    * returns how many were released. Safe at any point (consumers of a
    * released frame recompute instead of reading cache); intended
    * between pipeline phases of a long-lived session. */
  def releaseAll(): Int = {
    var n = 0
    var df = registry.poll()
    while (df != null) {
      df.unpersist()
      n += 1
      df = registry.poll()
    }
    n
  }
}
