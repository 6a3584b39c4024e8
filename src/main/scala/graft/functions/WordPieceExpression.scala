package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** WordPiece tokenization (Wu et al. 2016; BERT's tokenizer): greedy
  * longest-match-first against a vocabulary whose continuation pieces
  * carry the `##` prefix — the third member of the tokenizer-inference
  * family next to BPE merges and the unigram-LM Viterbi DP, here
  * because real corpora are scored under whichever tokenizer the target
  * model ships, and BERT-family models ship this one.
  *
  * Semantics (the reference BERT implementation's): per word, repeatedly
  * take the LONGEST vocab piece matching at the current position (the
  * raw substring at position 0, `##`+substring after); if some position
  * matches nothing the ENTIRE word becomes the single `[UNK]` piece.
  * Greedy is single-path deterministic — a pure function of (word,
  * vocab) that an unrolled SQL replay reproduces step for step.
  *
  * Scale shape: identical to [[UnigramSegmentProfile]] — one codegen'd
  * map-only projection, vocab as a plan reference object (model state,
  * the PQ-codebook convention), a per-word primitive loop bounded by
  * word length x max piece length, no HOF lambda (the interpreted-eval
  * cliff the 10M-doc smoke measured at 8x), no exchange anywhere. */
case class WordPieceProfile(child: Expression, vocab: Seq[String])
    extends UnaryExpression {

  require(vocab.nonEmpty, "wordpiece vocab must be non-empty")
  require(vocab.distinct.size == vocab.size,
    "wordpiece vocab pieces must be unique")
  require(vocab.forall(p => p.nonEmpty && p != "##"),
    "wordpiece vocab pieces must be non-empty")

  @transient private lazy val vocabSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocab.size * 2)
    vocab.foreach(s.add)
    s
  }
  /** Longest MATCHABLE span: continuation pieces match len-2 chars. */
  @transient private lazy val maxSpan: Int =
    vocab.map(p => if (p.startsWith("##")) p.length - 2 else p.length).max

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"requires string input, got $other")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_unk", LongType, nullable = false),
    StructField("n_pieces", LongType, nullable = false),
    StructField("segm", StringType, nullable = false)))

  override def nullSafeEval(input: Any): Any =
    WordPieceProfile.profile(input.asInstanceOf[UTF8String], vocabSet,
      maxSpan)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vocabRef = ctx.addReferenceObj("vocab", vocabSet, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, { x =>
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.InternalRow)
         |  graft.functions.WordPieceProfile.profile($x, $vocabRef, $maxSpan);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordPieceProfile {

  val Unk = "[UNK]"

  private val ws = java.util.regex.Pattern.compile("\\s+")

  /** Greedy longest-match pieces of one word, null when some position
    * matches nothing (the word is `[UNK]`). */
  def pieces(w: String, vocab: java.util.HashSet[String],
      maxSpan: Int): java.util.ArrayList[String] = {
    val n = w.length
    val out = new java.util.ArrayList[String](4)
    var pos = 0
    while (pos < n) {
      var end = math.min(n, pos + maxSpan)
      var matched: String = null
      while (matched == null && end > pos) {
        val cand =
          if (pos == 0) w.substring(pos, end)
          else "##" + w.substring(pos, end)
        if (vocab.contains(cand)) matched = cand else end -= 1
      }
      if (matched == null) return null
      out.add(matched)
      pos = end
    }
    out
  }

  /** Document-level profile: tokenize (whitespace, matching
    * `TextAnalysis.tokens`; caller lowercases), greedily piece every
    * word, and emit `struct(n_tokens, n_unk, n_pieces, segm)` — pieces
    * join with `+` inside a word, ' ' between words; an UNK word shows
    * as `[UNK]` and counts one piece (the token the model would see). */
  def profile(text: UTF8String, vocab: java.util.HashSet[String],
      maxSpan: Int): org.apache.spark.sql.catalyst.InternalRow = {
    val trimmed = text.toString.trim
    var nTokens = 0L
    var nUnk = 0L
    var nPieces = 0L
    val segm = new java.lang.StringBuilder
    if (trimmed.nonEmpty) {
      val words = ws.split(trimmed)
      var wi = 0
      while (wi < words.length) {
        val w = words(wi)
        if (w.nonEmpty) {
          nTokens += 1
          if (segm.length > 0) segm.append(' ')
          val ps = pieces(w, vocab, maxSpan)
          if (ps == null) {
            nUnk += 1
            nPieces += 1
            segm.append(Unk)
          } else {
            nPieces += ps.size()
            var k = 0
            while (k < ps.size()) {
              if (k > 0) segm.append('+')
              segm.append(ps.get(k))
              k += 1
            }
          }
        }
        wi += 1
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nTokens, nUnk, nPieces, UTF8String.fromString(segm.toString)))
  }
}

object WordPieceFunctions {
  import org.apache.spark.sql.graftbridge.Bridge

  /** One-pass WordPiece document profile:
    * `struct(n_tokens, n_unk, n_pieces, segm)` (caller lowercases;
    * tokenization matches `TextAnalysis.tokens`). */
  def wordpiece_profile(text: Column, vocab: Seq[String]): Column =
    Bridge.column(WordPieceProfile(Bridge.expression(text), vocab))
}
