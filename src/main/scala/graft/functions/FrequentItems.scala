package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries frequent-items sketch as a typed [[Aggregator]] — the
  * heavy-hitters summary whose state is O(capacity) REGARDLESS of input
  * size, the reason it exists here: exact token counting needs a
  * vocab-sized aggregate (fine when the vocab is bounded, ruinous for
  * open-ended keys — URLs, hosts, shingles), while this sketch gives
  * every partition a capacity-sized buffer and the shuffle carries only
  * those buffers. This is also the library's typed-Aggregator surface
  * (partial aggregation and merge expressed in Scala over arbitrary
  * state — the API tier between codegen'd Catalyst expressions and
  * mapPartitions).
  *
  * Algorithm (Misra–Gries 1982, merge rule per Agarwal et al.,
  * "Mergeable Summaries", PODS'12): counts accumulate freely up to
  * 2×capacity, then one compaction subtracts the (capacity+1)-th
  * largest count from every entry and drops the non-positive — an
  * amortized-O(1) batched variant of the classic decrement-all step.
  * `merge` sums two states and compacts the same way, which is what
  * makes the sketch safely combinable across partitions in any order.
  *
  * Guarantees: estimates NEVER overcount (est ≤ true); the state's
  * `dec` field carries the exact total subtracted by compactions, so
  * `true ≤ est + dec` for every key, tracked (not the loose N/(k+1)
  * bound). When `capacity` ≥ the number of distinct keys no compaction
  * ever fires, `dec` stays 0, and the result is EXACT and
  * deterministic regardless of partitioning — the property the oracle
  * checks. Over capacity, which tail keys survive depends on partition
  * merge order; only the bounds are stable, and the spec asserts those.
  *
  * The buffer rides Kryo (an opaque aggregation buffer, never a join
  * key); the output is a plain (counts, dec) pair a caller explodes
  * into rows — see `TextAnalysis.frequentTokens`. */
class MisraGries(capacity: Int)
    extends Aggregator[String, MisraGries.State, (Map[String, Long], Long)]
    with Serializable {
  require(capacity >= 1, "need capacity >= 1")

  import MisraGries.State

  def zero: State = State(mutable.HashMap.empty, 0L)

  def reduce(s: State, item: String): State = {
    s.counts.updateWith(item) {
      case Some(c) => Some(c + 1L)
      case None    => Some(1L)
    }
    if (s.counts.size >= 2 * capacity) compact(s) else s
  }

  def merge(a: State, b: State): State = {
    val (big, small) = if (a.counts.size >= b.counts.size) (a, b) else (b, a)
    small.counts.foreach { case (k, v) =>
      big.counts.updateWith(k) {
        case Some(c) => Some(c + v)
        case None    => Some(v)
      }
    }
    big.dec += small.dec
    if (big.counts.size > capacity) compact(big) else big
  }

  def finish(s: State): (Map[String, Long], Long) = {
    val trimmed = if (s.counts.size > capacity) compact(s) else s
    (trimmed.counts.toMap, trimmed.dec)
  }

  /** Subtract the (capacity+1)-th largest count from every entry and
    * drop the non-positive; record the subtraction in `dec`. Leaves at
    * most `capacity` entries. */
  private def compact(s: State): State = {
    if (s.counts.size <= capacity) return s
    val sorted = s.counts.values.toArray
    java.util.Arrays.sort(sorted)
    // (capacity+1)-th largest = index size-capacity-1 in ascending order
    val sub = sorted(sorted.length - capacity - 1)
    s.counts.filterInPlace((_, v) => v > sub)
    s.counts.mapValuesInPlace((_, v) => v - sub)
    s.dec += sub
    s
  }

  def bufferEncoder: Encoder[State] = Encoders.kryo[State]
  def outputEncoder: Encoder[(Map[String, Long], Long)] =
    ExpressionEncoder()
}

object MisraGries {
  /** Mutable sketch state: tracked counts + the exact cumulative amount
    * compactions have subtracted (the per-key undercount bound). */
  case class State(counts: mutable.HashMap[String, Long], var dec: Long)
}
