package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick dictionary automaton (Aho & Corasick 1975) over
  * token-boundary-padded patterns — the blocklist SCALE path.
  * [[graft.ops.TextAnalysis.blocklistFilter]]'s plan is a per-phrase
  * `contains` chain plus a per-token literal-array membership: O(P)
  * work per document (and per token). Production blocklists run to
  * tens of thousands of terms (URL lists, safety term lists), where
  * O(P) per document is the difference between a map-only projection
  * and an unrunnable stage. The automaton matches ALL patterns in ONE
  * left-to-right scan — O(len + matches), independent of P — with the
  * pattern set riding the plan as a reference object (model state, the
  * PQ-codebook convention).
  *
  * Match semantics are pinned EQUAL to blocklistFilter (spec-enforced):
  * the text is whitespace-tokenized, lowercased, space-joined and
  * space-padded; every pattern is space-padded, so matches respect
  * token boundaries. Single terms count every occurrence; multi-token
  * phrases count DISTINCT phrases present (blocklistFilter's
  * asymmetry, kept deliberately — it is the reference readout).
  * Overlapping occurrences share their boundary space (" a a " ends
  * " a " at two positions); the automaton's suffix/fail chain reports
  * both, exactly like the token-membership count. */
final class AhoCorasick(patterns: Seq[(String, Int, Int)])
    extends Serializable {
  // patterns: (padded pattern, kind 0=count occurrences / 1=distinct
  // presence, id within kind)

  /** Number of distinct-presence patterns (the phrase bitset size). */
  val nPresence: Int = patterns.count(_._2 == 1)

  // goto function as per-node char maps; built once on the driver
  private val trans = mutable.ArrayBuffer(mutable.HashMap.empty[Char, Int])
  private val ownCount = mutable.ArrayBuffer(0)
  private val ownIds = mutable.ArrayBuffer[List[Int]](Nil)
  patterns.foreach { case (p, kind, id) =>
    var node = 0
    p.foreach { c =>
      node = trans(node).getOrElseUpdate(c, {
        trans += mutable.HashMap.empty[Char, Int]
        ownCount += 0
        ownIds += Nil
        trans.length - 1
      })
    }
    if (kind == 0) ownCount(node) += 1 else ownIds(node) ::= id
  }
  private val fail = new Array[Int](trans.length)
  /** Aggregated outputs through the fail chain: occurrence count and
    * presence ids reachable as suffixes of this node. */
  private val aggCount = new Array[Int](trans.length)
  private val aggIds = new Array[Array[Int]](trans.length)
  locally {
    val queue = mutable.Queue.empty[Int]
    aggCount(0) = ownCount(0)
    aggIds(0) = ownIds(0).toArray
    trans(0).foreach { case (_, v) =>
      fail(v) = 0
      aggCount(v) = ownCount(v) + aggCount(0)
      aggIds(v) = (ownIds(v) ++ aggIds(0)).toArray
      queue += v
    }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      trans(u).foreach { case (c, v) =>
        var f = fail(u)
        while (f != 0 && !trans(f).contains(c)) f = fail(f)
        fail(v) = trans(f).get(c).filter(_ != v).getOrElse(0)
        aggCount(v) = ownCount(v) + aggCount(fail(v))
        aggIds(v) =
          if (ownIds(v).isEmpty) aggIds(fail(v))
          else (ownIds(v) ++ aggIds(fail(v))).toArray
        queue += v
      }
    }
  }

  /** One scan: adds occurrence matches to the returned count and marks
    * presence ids in `seen` (caller-allocated, length >= nPresence). */
  def scan(s: CharSequence, seen: Array[Boolean]): Long = {
    var count = 0L
    var node = 0
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      while (node != 0 && !trans(node).contains(c)) node = fail(node)
      node = trans(node).getOrElse(c, 0)
      if (aggCount(node) != 0) count += aggCount(node)
      val ids = aggIds(node)
      if (ids.nonEmpty) {
        var k = 0
        while (k < ids.length) { seen(ids(k)) = true; k += 1 }
      }
      i += 1
    }
    count
  }
}

/** `struct(n_blocked_tokens, n_blocked_phrases, blocked)` per document —
  * blocklistFilter's exact readout from one automaton scan. */
case class MultiPatternStats(child: Expression, terms: Seq[String])
    extends UnaryExpression {

  require(terms.nonEmpty, "need at least one blocklist term")

  @transient private lazy val automaton: AhoCorasick = {
    val norm = terms.map(_.trim.toLowerCase).filter(_.nonEmpty)
    require(norm.nonEmpty, "need at least one non-empty blocklist term")
    val singles = norm.filter(!_.contains(" ")).distinct
    val phrases = norm.filter(_.contains(" ")).distinct
    new AhoCorasick(
      singles.map(t => (s" $t ", 0, 0)) ++
        phrases.zipWithIndex.map { case (p, i) => (s" $p ", 1, i) })
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"requires string input, got $other")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_blocked_tokens", LongType, nullable = false),
    StructField("n_blocked_phrases", LongType, nullable = false),
    StructField("blocked", BooleanType, nullable = false)))

  override def nullSafeEval(input: Any): Any =
    MultiPatternStats.profile(input.asInstanceOf[UTF8String], automaton)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("automaton", automaton,
      classOf[AhoCorasick].getName)
    nullSafeCodeGen(ctx, ev, { x =>
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.InternalRow)
         |  graft.functions.MultiPatternStats.profile($x, $acRef);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MultiPatternStats {

  private val ws = java.util.regex.Pattern.compile("\\s+")

  /** Normalize exactly like blocklistFilter's joined form (lowercase,
    * whitespace-tokenize, single-space join, pad) and scan once. */
  def profile(text: UTF8String,
      ac: AhoCorasick): org.apache.spark.sql.catalyst.InternalRow = {
    val trimmed = text.toString.toLowerCase.trim
    val sb = new java.lang.StringBuilder(trimmed.length + 2)
    sb.append(' ')
    if (trimmed.nonEmpty) {
      val toks = ws.split(trimmed)
      var i = 0
      while (i < toks.length) {
        sb.append(toks(i)).append(' ')
        i += 1
      }
    }
    val seen = new Array[Boolean](ac.nPresence)
    val nTok = ac.scan(sb, seen)
    var nPhr = 0L
    var k = 0
    while (k < seen.length) {
      if (seen(k)) nPhr += 1
      k += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nTok, nPhr, nTok > 0 || nPhr > 0))
  }
}

object MultiPatternFunctions {
  import org.apache.spark.sql.graftbridge.Bridge

  /** One-scan blocklist statistics:
    * `struct(n_blocked_tokens, n_blocked_phrases, blocked)`. */
  def multi_pattern_stats(text: Column, terms: Seq[String]): Column =
    Bridge.column(MultiPatternStats(Bridge.expression(text), terms))
}
