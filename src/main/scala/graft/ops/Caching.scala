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
  // release thunks, not frames: the registered action is "unpersist
  // this frame", and a thunk generalizes to non-DataFrame state
  // (broadcast handles, model stores) without widening the queue type.
  // The closure pins the DataFrame strongly — see the retention note in
  // the object scaladoc for why strong is correct here.
  private val registry = new ConcurrentLinkedQueue[() => Unit]()

  /** Persist `df`, registered for [[releaseAll]]: the scoped spelling
    * of the multi-consumer persist. Callers still `.count()` where
    * single materialization must be FORCED before fan-out (the
    * bucketCandidates convention). */
  private[graft] def scoped(df: DataFrame): DataFrame = {
    df.persist()
    registry.add(() => { df.unpersist(); () })
    df
  }

  /** Register an arbitrary release action for the next [[releaseAll]]
    * drain — for scoped state that is not a single persisted frame. */
  private[graft] def scopedRelease(release: () => Unit): Unit =
    registry.add(release)

  /** Unpersist every scoped frame registered since the last drain;
    * returns how many were released. Safe at any point (consumers of a
    * released frame recompute instead of reading cache); intended
    * between pipeline phases of a long-lived session.
    *
    * The registry is JVM-global: with TWO pipelines sharing one driver,
    * either one's phase-boundary drain evicts the other's live scoped
    * caches mid-run — recompute-safe, but a silent multi-x perf cliff.
    * The convention assumes ONE pipeline per JVM (the harness and every
    * tool in `graft.tools` satisfy it); co-tenanted drivers should call
    * releaseAll only at a point that is a phase boundary for ALL
    * tenants.
    *
    * Each unpersist is individually guarded: one stale frame (e.g. from
    * an already-stopped SparkSession) throwing must not abort the drain
    * and strand the rest of the registry's cached blocks. */
  def releaseAll(): Int = {
    var n = 0
    var release = registry.poll()
    while (release != null) {
      scala.util.Try(release()) match {
        case scala.util.Success(_) => n += 1
        case scala.util.Failure(e) =>
          // surface it: a silently-failed unpersist strands cached
          // blocks with nothing to diagnose but a lower return count
          System.err.println(s"[caching] releaseAll: unpersist failed: $e")
      }
      release = registry.poll()
    }
    n
  }
}
