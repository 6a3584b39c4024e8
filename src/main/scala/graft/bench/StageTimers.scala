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
    finally {
      // ACCUMULATE per key within a run (not overwrite): a query that
      // invokes the same timed stage twice would otherwise report only the
      // last invocation's wall time and under-attribute the stage's cost
      val dt = (System.nanoTime() - t0) / 1e9
      var done = false
      while (!done) {
        timers.get(stage) match {
          case Some(prev) => done = timers.replace(stage, prev, prev + dt)
          case None       => done = timers.putIfAbsent(stage, dt).isEmpty
        }
      }
    }
  }

  /** Snapshot and clear — one call per bench run. */
  def drain(): Map[String, Double] = {
    val snap = timers.readOnlySnapshot().toMap
    timers.clear()
    snap
  }
}
