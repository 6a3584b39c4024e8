package graft.bench

/** Wall-clock stage timers for composite queries (q38's seed-CSV write /
  * pipeline run), so the bench can attribute a multi-stage query's cost
  * instead of reporting one opaque number (a 4x cross-host swing on q38 was
  * undiagnosable from the total alone). Queries call [[time]] around each
  * stage; the bench [[drain]]s after every run. Thread-safe, zero cost when
  * nothing drains (Verify and tests just overwrite the tiny map). */
object StageTimers {
  private val timers = scala.collection.concurrent.TrieMap.empty[String, Double]

  def time[T](stage: String)(body: => T): T = {
    val t0 = System.nanoTime()
    try body
    finally timers.put(stage, (System.nanoTime() - t0) / 1e9)
  }

  /** Snapshot and clear — one call per bench run. */
  def drain(): Map[String, Double] = {
    val snap = timers.readOnlySnapshot().toMap
    timers.clear()
    snap
  }
}
