package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable quantile sketch as a typed [[Aggregator]] — the rank/
  * percentile member of the sketch family (Misra–Gries = heavy hitters,
  * CMS = frequencies, HLL = distinct counts, this = quantiles). An
  * exact per-group percentile is a full sort of the group; over an
  * open-ended 100 TB column the sketch replaces that with O(k log(n/k))
  * state per partition, and the shuffle carries only those buffers.
  *
  * Algorithm: the uniform-capacity compactor hierarchy (Manku–Rajagopalan
  * –Lindsay 1998, the structure KLL [Karnin–Lang–Liberty 2016] refines
  * with geometric capacities): level i holds up to `k` items of weight
  * 2^i; when a level EXCEEDS `k` items it sorts and keeps alternate
  * items, promoting them to level i+1 (strictly-greater trigger — the
  * n == k group must stay uncompacted for the exact-regime contract). The kept-parity alternates DETERMINISTICALLY with
  * a compaction counter instead of the paper's coin flip — reruns over
  * the same partitioning are bit-identical, and the alternation keeps the
  * systematic rank bias centered the same way the expected coin does.
  * `merge` concatenates level-wise and re-compacts, which makes the
  * sketch safely combinable across partitions in any order.
  *
  * Guarantees: rank error after C compactions at level i is at most
  * 2^i per compaction, totalling eps*n with eps = O(log(n/k)/k); the
  * spec pins a conservative envelope. When a group never fills level 0
  * (n <= k) NO compaction fires, every weight is 1, and quantiles are
  * EXACT and partition-order-invariant — the regime the oracle replays
  * (the Misra–Gries oracle discipline).
  *
  * Output: values ASCENDING with their weights, plus the exact n — the
  * caller walks cumulative weights for any rank/quantile (see
  * `graft.ops.Kll`); the buffer rides Kryo (opaque aggregation state,
  * never a join key). */
class KllQuantile(k: Int)
    extends Aggregator[Double, KllQuantile.State,
      (Array[Double], Array[Long], Long)]
    with Serializable {
  require(k >= 8, "need capacity k >= 8")

  import KllQuantile.State

  def zero: State = State(ArrayBuffer(ArrayBuffer.empty[Double]), 0L, 0L)

  def reduce(s: State, v: Double): State = {
    s.levels(0) += v
    s.n += 1
    // strictly greater: a level HOLDS k items and compacts on overflow,
    // which is what makes the documented "n <= k stays exact" contract
    // true at the n == k boundary (r11 advice: >= here compacted the
    // exactly-full group and silently broke exactness one row early)
    if (s.levels(0).length > k) compactFrom(s, 0)
    s
  }

  def merge(a: State, b: State): State = {
    val (big, small) = if (a.n >= b.n) (a, b) else (b, a)
    while (big.levels.length < small.levels.length)
      big.levels += ArrayBuffer.empty[Double]
    var i = 0
    while (i < small.levels.length) {
      big.levels(i) ++= small.levels(i)
      i += 1
    }
    big.n += small.n
    big.gen += small.gen
    i = 0
    while (i < big.levels.length) {
      if (big.levels(i).length > k) compactFrom(big, i)
      i += 1
    }
    big
  }

  def finish(s: State): (Array[Double], Array[Long], Long) = {
    val items = ArrayBuffer.empty[(Double, Long)]
    var i = 0
    while (i < s.levels.length) {
      val w = 1L << i
      s.levels(i).foreach(v => items += ((v, w)))
      i += 1
    }
    val sorted = items.sortBy(_._1)
    (sorted.map(_._1).toArray, sorted.map(_._2).toArray, s.n)
  }

  /** Compact level i (sort, keep alternate items, promote), cascading
    * upward while the promotion overfills the next level. */
  private def compactFrom(s: State, from: Int): Unit = {
    var i = from
    while (i < s.levels.length && s.levels(i).length > k) {
      val buf = s.levels(i)
      val arr = buf.toArray
      java.util.Arrays.sort(arr)
      val parity = (s.gen % 2).toInt
      s.gen += 1
      if (s.levels.length == i + 1) s.levels += ArrayBuffer.empty[Double]
      val next = s.levels(i + 1)
      var j = parity
      while (j < arr.length) {
        next += arr(j)
        j += 2
      }
      buf.clear()
      i += 1
    }
  }

  def bufferEncoder: Encoder[State] = Encoders.kryo[State]
  def outputEncoder: Encoder[(Array[Double], Array[Long], Long)] =
    ExpressionEncoder()
}

object KllQuantile {
  /** Mutable sketch state: per-level buffers (level i items carry weight
    * 2^i), the exact item count, and the compaction counter driving the
    * deterministic kept-parity alternation. */
  case class State(levels: ArrayBuffer[ArrayBuffer[Double]], var n: Long,
      var gen: Long)

  /** Rank query over a finished sketch: the smallest value whose
    * cumulative weight reaches ceil(p*n) (clamped to [1, n]) — the
    * lower-quantile convention, exact when every weight is 1. */
  def quantile(values: Array[Double], weights: Array[Long], n: Long,
      p: Double): Double = {
    require(values.nonEmpty, "empty sketch has no quantiles")
    require(p >= 0.0 && p <= 1.0, s"quantile prob out of [0,1]: $p")
    val target = math.max(1L, math.ceil(p * n).toLong)
    var cum = 0L
    var i = 0
    while (i < values.length) {
      cum += weights(i)
      if (cum >= target) return values(i)
      i += 1
    }
    values(values.length - 1)
  }
}
