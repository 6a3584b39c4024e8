package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SentencePiece-style unigram-LM Viterbi segmentation (Kudo '18,
  * "Subword Regularization"): given a vocabulary of (piece, log-prob)
  * pairs, split a word into the piece sequence maximizing total
  * log-prob. Ties break by fewer pieces, then by the earliest DP
  * predecessor (equivalently: the longest final piece) — pinned so the
  * result is a pure function of (word, vocab) that a SQL replay of the
  * same DP reproduces exactly.
  *
  * The 100 TB shape this enables: tokenizer INFERENCE as a map-only
  * codegen'd projection — the vocabulary rides to executors as a plan
  * reference object (model state, like the PQ codebooks), the DP is a
  * per-word primitive loop bounded by `word length x max piece length`,
  * and no shuffle or UDF boundary appears anywhere. Returns NULL when no
  * piece path covers the word (an out-of-vocabulary character): callers
  * route those to a byte-fallback or an OOV counter rather than
  * receiving a silent partial segmentation. */
case class UnigramViterbi(child: Expression, vocab: Seq[(String, Double)])
    extends UnaryExpression {

  require(vocab.nonEmpty, "unigram vocab must be non-empty")
  require(vocab.map(_._1).distinct.size == vocab.size,
    "unigram vocab pieces must be unique")
  require(vocab.forall(_._1.nonEmpty), "unigram vocab pieces must be non-empty")

  @transient private lazy val vocabMap: java.util.HashMap[String, java.lang.Double] = {
    val m = new java.util.HashMap[String, java.lang.Double](vocab.size * 2)
    vocab.foreach { case (p, s) => m.put(p, java.lang.Double.valueOf(s)) }
    m
  }
  @transient private lazy val maxPieceLen: Int = vocab.map(_._1.length).max

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"requires string input, got $other")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    UnigramViterbi.segment(input.asInstanceOf[UTF8String], vocabMap, maxPieceLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vocabRef = ctx.addReferenceObj("vocab", vocabMap, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, { x =>
      s"""
         |${ev.value} = graft.functions.UnigramViterbi.segment(
         |  $x, $vocabRef, $maxPieceLen);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Document-level unigram-LM segmentation profile: one codegen'd pass
  * tokenizes `text` (whitespace, matching [[graft.ops.TextAnalysis
  * .tokens]]; caller lowercases), Viterbi-segments every word against
  * the vocab, and emits `struct(n_tokens, n_oov, n_pieces, logp, segm)`
  * — `segm` joins pieces with `+` inside a word and ' ' between words,
  * OOV words (no piece path) count in `n_oov` and are excluded from the
  * other fields.
  *
  * This is the production shape: the same per-word DP as
  * [[UnigramViterbi]], but WITHOUT the `transform()` higher-order
  * wrapper a per-word mapping would need — HOF lambdas evaluate
  * interpreted and block whole-stage codegen, the exact cliff the
  * 10M-doc corpus smoke measured at 8x on the Gopher HOF tower
  * (BASELINE.md r11). One reference-object vocab, one primitive loop
  * per document, zero exchanges. */
case class UnigramSegmentProfile(child: Expression,
    vocab: Seq[(String, Double)]) extends UnaryExpression {

  require(vocab.nonEmpty, "unigram vocab must be non-empty")
  require(vocab.map(_._1).distinct.size == vocab.size,
    "unigram vocab pieces must be unique")
  require(vocab.forall(_._1.nonEmpty), "unigram vocab pieces must be non-empty")

  @transient private lazy val vocabMap: java.util.HashMap[String, java.lang.Double] = {
    val m = new java.util.HashMap[String, java.lang.Double](vocab.size * 2)
    vocab.foreach { case (p, s) => m.put(p, java.lang.Double.valueOf(s)) }
    m
  }
  @transient private lazy val maxPieceLen: Int = vocab.map(_._1.length).max

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"requires string input, got $other")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_oov", LongType, nullable = false),
    StructField("n_pieces", LongType, nullable = false),
    StructField("logp", DoubleType, nullable = false),
    StructField("segm", StringType, nullable = false)))

  override def nullSafeEval(input: Any): Any =
    UnigramViterbi.profile(input.asInstanceOf[UTF8String], vocabMap,
      maxPieceLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vocabRef = ctx.addReferenceObj("vocab", vocabMap, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, { x =>
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.InternalRow)
         |  graft.functions.UnigramViterbi.profile($x, $vocabRef, $maxPieceLen);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnigramViterbi {

  private val ws = java.util.regex.Pattern.compile("\\s+")

  /** The [[UnigramSegmentProfile]] kernel: tokenize + per-word DP +
    * accumulate, one pass, no per-token allocation beyond the DP
    * arrays. */
  def profile(text: UTF8String,
      vocab: java.util.HashMap[String, java.lang.Double],
      maxLen: Int): org.apache.spark.sql.catalyst.InternalRow = {
    val trimmed = text.toString.trim
    var nTokens = 0L
    var nOov = 0L
    var nPieces = 0L
    var logp = 0.0
    val segm = new java.lang.StringBuilder
    if (trimmed.nonEmpty) {
      val words = ws.split(trimmed)
      var wi = 0
      while (wi < words.length) {
        val w = words(wi)
        if (w.nonEmpty) {
          nTokens += 1
          val pieces = segment(UTF8String.fromString(w), vocab, maxLen)
          if (pieces == null) nOov += 1
          else {
            val np = pieces.numElements()
            nPieces += np
            var k = 0
            if (segm.length > 0 && np > 0) segm.append(' ')
            while (k < np) {
              val p = pieces.getUTF8String(k)
              logp += vocab.get(p.toString).doubleValue()
              if (k > 0) segm.append('+')
              segm.append(p.toString)
              k += 1
            }
          }
        }
        wi += 1
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nTokens, nOov, nPieces, logp,
        UTF8String.fromString(segm.toString)))
  }

  /** The DP the expression (both eval and generated code) runs: position
    * i holds the best (score, n_pieces, predecessor) over reachable j in
    * [i - maxLen, i) with word[j..i) in the vocab; selection order is
    * score DESC, n_pieces ASC, j ASC (first-best wins on full ties since
    * j ascends). Returns null when position `len` is unreachable. */
  def segment(word: UTF8String,
      vocab: java.util.HashMap[String, java.lang.Double],
      maxLen: Int): ArrayData = {
    val w = word.toString
    val n = w.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val score = new Array[Double](n + 1)
    val npieces = new Array[Int](n + 1)
    val back = new Array[Int](n + 1)
    val reach = new Array[Boolean](n + 1)
    reach(0) = true
    var i = 1
    while (i <= n) {
      var bestScore = Double.NegativeInfinity
      var bestNp = Int.MaxValue
      var bestJ = -1
      var j = if (i > maxLen) i - maxLen else 0
      while (j < i) {
        if (reach(j)) {
          val p = vocab.get(w.substring(j, i))
          if (p != null) {
            val s = score(j) + p.doubleValue()
            val np = npieces(j) + 1
            if (s > bestScore || (s == bestScore && np < bestNp)) {
              bestScore = s; bestNp = np; bestJ = j
            }
          }
        }
        j += 1
      }
      if (bestJ >= 0) {
        reach(i) = true; score(i) = bestScore
        npieces(i) = bestNp; back(i) = bestJ
      }
      i += 1
    }
    if (!reach(n)) return null
    val out = new Array[Any](npieces(n))
    var pos = n
    var k = npieces(n) - 1
    while (pos > 0) {
      val j = back(pos)
      out(k) = UTF8String.fromString(w.substring(j, pos))
      k -= 1
      pos = j
    }
    new GenericArrayData(out)
  }
}

object UnigramViterbiFunctions {
  import org.apache.spark.sql.graftbridge.Bridge

  /** Best unigram-LM segmentation of `word` as `array<string>` of pieces
    * (null when no path covers the word). */
  def unigram_viterbi(word: Column, vocab: Seq[(String, Double)]): Column =
    Bridge.column(UnigramViterbi(Bridge.expression(word), vocab))

  /** One-pass document segmentation profile:
    * `struct(n_tokens, n_oov, n_pieces, logp, segm)` (caller lowercases
    * the text; tokenization matches `TextAnalysis.tokens`). */
  def unigram_segment_profile(text: Column,
      vocab: Seq[(String, Double)]): Column =
    Bridge.column(UnigramSegmentProfile(Bridge.expression(text), vocab))
}
