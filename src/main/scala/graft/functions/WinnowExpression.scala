package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import org.apache.spark.sql.graftbridge.Bridge

/** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken '03 —
  * the MOSS scheme): hash every character k-gram, slide a window over w
  * consecutive gram hashes, and in each window select the RIGHTMOST
  * MINIMUM hash. The two winnowing guarantees hold by construction:
  * (a) any exact match of length >= k + w - 1 shares at least one
  * selected fingerprint (every window inside the match selects the same
  * gram in both copies — selection depends only on the local hash
  * sequence, which is why the scheme is POSITION-ROBUST where plain
  * "every i-th gram" sampling is not), and (b) selections are at most w
  * grams apart, so expected density is 2/(w+1) regardless of document
  * length. `string -> array<struct<pos:int, fp:bigint>>`, positions
  * strictly increasing (the rightmost-min selection index is monotone
  * non-decreasing as the window slides, so consecutive-duplicate
  * suppression is a complete dedup).
  *
  * Gram semantics mirror [[ShingleHashes]]: len > k -> len - k + 1
  * grams; len <= k (including empty) -> ONE whole-text gram, so every
  * document yields at least one fingerprint. Docs shorter than the
  * window produce one truncated window over all grams.
  *
  * This is the PRODUCTION path (xxhash64, one per-row primitive loop,
  * map-only — fingerprinting never shuffles); the oracle-checkable
  * surface is [[graft.ops.Dedup.winnowFingerprintsPortable]] (md5-h60
  * grams + a doc-keyed window), and the two are pinned by spec to
  * recover the same planted copied spans (hash families differ, so the
  * selected POSITIONS differ — the detection contract is what matches,
  * the [[Md5Family]] precedent). CodegenFallback for the usual reason:
  * interpreted overhead is once per row, the row's work is already a
  * tight loop. */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {

  require(k > 0, "gram size k must be positive")
  require(w > 0, "window size w must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"requires string, got $other")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("fp", LongType, nullable = false))), containsNull = false)

  private val seed = 42L

  override def nullSafeEval(t: Any): Any = {
    val s = t.asInstanceOf[UTF8String].toString
    val len = s.length
    val m = if (len > k) len - k + 1 else 1
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) {
      val end = math.min(i + k, len)
      hs(i) = XXH64.hashUTF8String(
        UTF8String.fromString(s.substring(i, end)), seed)
      i += 1
    }
    val lastStart = math.max(m - w, 0)
    val selPos = new scala.collection.mutable.ArrayBuffer[Int]
    var lastSel = -1
    var start = 0
    while (start <= lastStart) {
      val end = math.min(start + w, m)
      // rightmost minimum: <= keeps the later index on ties
      var best = start
      var j = start + 1
      while (j < end) {
        if (hs(j) <= hs(best)) best = j
        j += 1
      }
      if (best != lastSel) { selPos += best; lastSel = best }
      start += 1
    }
    val out = new Array[Any](selPos.length)
    var q = 0
    while (q < selPos.length) {
      val p = selPos(q)
      out(q) = new GenericInternalRow(Array[Any](p, hs(p)))
      q += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFunctions {
  /** Winnowing fingerprints of a text column: array of (pos, fp)
    * structs, rightmost-min selection over xxhash64 char-k-gram hashes. */
  def winnow_fingerprints(text: Column, k: Int, w: Int): Column =
    Bridge.column(WinnowFingerprints(Bridge.expression(text), k, w))
}
