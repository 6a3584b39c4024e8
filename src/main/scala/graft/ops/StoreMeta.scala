package graft.ops

/** Driver-side memo of persisted-store LAYOUT STATE that is immutable
  * between (re)builds — the `meta/` parameter rows every store writes
  * once at build time, and SemDedupStore's frozen centroid array.
  *
  * Why: every addShard / probe / report call re-ran a full Spark
  * execution (parquet listing + head/collect job + driver round-trip)
  * to re-learn a handful of scalars that cannot have changed — one
  * pure-overhead execution per micro-batch across the whole streaming
  * store-sink family, and one per probe. The memo answers from the
  * driver after the first read.
  *
  * Coherence: build paths refresh the entry when they (re)write the
  * state (same-JVM rebuilds into the same root — the fixture and test
  * pattern — always observe their own params). A DIFFERENT process
  * mutating a store out from under a running one is already outside
  * every store's single-writer contract, so no cross-process
  * invalidation is needed. Values are tiny (params case classes, one
  * centroid array per live store root).
  */
private[ops] object StoreMeta {

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), Any]()

  /** Memoized load: `kind` namespaces the store family so two stores
    * rooted at the same path can never read each other's entry. */
  def cached[T](kind: String, root: String)(load: => T): T =
    cache.computeIfAbsent((kind, root), _ => load.asInstanceOf[Any])
      .asInstanceOf[T]

  /** Refresh after a (re)write of the underlying state. */
  def put[T](kind: String, root: String, v: T): Unit =
    cache.put((kind, root), v.asInstanceOf[Any])

  /** Drop an entry (state deleted or replaced by an out-of-band path). */
  def invalidate(kind: String, root: String): Unit =
    cache.remove((kind, root))
}
