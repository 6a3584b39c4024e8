package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import org.apache.spark.sql.graftbridge.Bridge

/** Content-defined chunking (CDC) — the rolling-hash boundary scheme of
  * LBFS (Muthitacharoen et al., SOSP '01) in its Gear/FastCDC spelling
  * (Xia et al., USENIX ATC '16): cut a document where a rolling hash of
  * the last few dozen characters hits a mask, subject to min/max chunk
  * bounds. Because a boundary depends only on LOCAL content, an edit
  * early in a document shifts at most the chunks that overlap it — the
  * boundary walk re-synchronizes at the next content-determined cut and
  * every later chunk is byte-identical to the unedited version's. That
  * is the property fixed-width windows ([[graft.ops.TextAnalysis]]'s
  * token chunking) fundamentally lack: one inserted character shifts
  * EVERY downstream fixed window, so chunk-hash dedup across corpus
  * versions (re-crawls, revision histories) sees 0% reuse where CDC
  * sees all-but-the-edited-chunk. Reference has no chunking surface;
  * extension op — see [[graft.ops.Cdc]] for the operator surface.
  *
  * Two hash families, the [[WinnowFingerprints]] convention:
  * [[GearCdcChunks]] is the production path (Gear hash: one shift+add
  * per char, h's top bit ages out after 64 shifts so the judgment is a
  * sliding 64-char function by construction) and the md5-h60 candidate
  * predicate in [[graft.ops.Cdc.chunksPortable]] is the
  * oracle-checkable surface, both sharing [[CdcBoundaryWalk]]'s
  * min/max acceptance semantics (portable) or inlining them (gear).
  * The two are pinned by spec to the same CONTRACT — bounds,
  * concatenation identity, post-edit resynchronization — not to
  * identical cut positions (the hash families differ, the
  * [[Md5Family]] precedent). */
case class GearCdcChunks(child: Expression, maskBits: Int, minLen: Int,
    maxLen: Int) extends UnaryExpression with CodegenFallback {

  require(maskBits > 0 && maskBits < 48, "maskBits must be in 1..47")
  require(minLen >= 1, "minLen must be >= 1")
  require(maxLen >= minLen, "maxLen must be >= minLen")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"requires string, got $other")
  }

  override def dataType: DataType = CdcFunctions.chunkArrayType

  private val mask = (1L << maskBits) - 1

  override def nullSafeEval(t: Any): Any = {
    val s = t.asInstanceOf[UTF8String].toString
    val len = s.length
    if (len == 0) return new GenericArrayData(Array.empty[Any])
    val out = new scala.collection.mutable.ArrayBuffer[Any]
    var b = 0
    var i = 0
    var h = 0L
    while (i < len) {
      h = (h << 1) + CdcFunctions.gear(s.charAt(i) & 0xFF)
      val p = i + 1
      if ((p - b == maxLen) ||
          (p - b >= minLen && (h & mask) == 0L)) {
        out += new GenericInternalRow(Array[Any](b, p - b))
        b = p
        h = 0L
      }
      i += 1
    }
    if (b < len) out += new GenericInternalRow(Array[Any](b, len - b))
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The boundary-acceptance walk shared by every CDC hash family: given
  * the sorted candidate cut positions (each the END of a window whose
  * hash hit the mask) and the document length, accept the earliest
  * candidate at least `minLen` past the previous boundary, force a cut
  * at `maxLen` when no candidate lands in (prev+minLen .. prev+maxLen],
  * and close the final (possibly short) tail chunk at the document end.
  * A candidate coinciding with the forced position is indistinguishable
  * from the forced cut, so the walk is total and deterministic.
  * `(array<int> candidates, int len) -> array<struct<start:int,len:int>>`.
  * The DuckDB oracle replays exactly this recurrence as a recursive CTE
  * (next = coalesce(min(candidate in window), least(prev+maxLen, len))).
  * CodegenFallback: one per-row primitive loop, the [[WinnowFingerprints]]
  * rationale. */
case class CdcBoundaryWalk(left: Expression, right: Expression,
    minLen: Int, maxLen: Int)
    extends BinaryExpression with CodegenFallback {

  require(minLen >= 1, "minLen must be >= 1")
  require(maxLen >= minLen, "maxLen must be >= minLen")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"requires (array<int>, int), got $other")
    }

  override def dataType: DataType = CdcFunctions.chunkArrayType

  override def nullSafeEval(candsAny: Any, lenAny: Any): Any = {
    val cands = candsAny.asInstanceOf[ArrayData].toIntArray()
    val len = lenAny.asInstanceOf[Int]
    if (len <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new scala.collection.mutable.ArrayBuffer[Any]
    var b = 0
    var ci = 0
    while (b < len) {
      val lo = b + minLen
      val hi = b + maxLen
      while (ci < cands.length && cands(ci) < lo) ci += 1
      val nb =
        if (ci < cands.length && cands(ci) <= hi) cands(ci)
        else math.min(hi, len)
      out += new GenericInternalRow(Array[Any](b, nb - b))
      b = nb
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object CdcFunctions {

  /** `array<struct<start:int, len:int>>` — chunk offsets into the text. */
  val chunkArrayType: DataType = ArrayType(StructType(Seq(
    StructField("start", IntegerType, nullable = false),
    StructField("len", IntegerType, nullable = false))), containsNull = false)

  /** The Gear table: 256 pseudo-random 64-bit constants, one per byte
    * value. Derived from xxhash64 so every JVM (and any re-derivation
    * from this source) agrees — persisted chunk digests must survive a
    * redeploy. */
  private[functions] val gear: Array[Long] =
    Array.tabulate(256)(i => XXH64.hashLong(i.toLong, 2654435761L))

  /** Production CDC: gear rolling hash, min/max-bounded cuts, one
    * per-row pass. `string -> array<struct<start:int,len:int>>`. */
  def gear_cdc_chunks(text: Column, maskBits: Int, minLen: Int,
      maxLen: Int): Column =
    Bridge.column(GearCdcChunks(Bridge.expression(text), maskBits, minLen,
      maxLen))

  /** Boundary walk over pre-computed candidate cut positions (any hash
    * family): `(array<int>, int) -> array<struct<start:int,len:int>>`. */
  def cdc_walk(cands: Column, len: Column, minLen: Int, maxLen: Int): Column =
    Bridge.column(CdcBoundaryWalk(Bridge.expression(cands),
      Bridge.expression(len), minLen, maxLen))
}
