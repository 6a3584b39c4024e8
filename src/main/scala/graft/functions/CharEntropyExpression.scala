package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shannon entropy of a string's character distribution, in bits per
  * character: H = -sum_c p_c * log2(p_c) over code points. The classic
  * cheap gibberish/boilerplate signal — near 0 for single-character
  * floods and padding runs, ~4.1 bits for normal English prose, > 5 for
  * base64/hex blobs — complementing the Gopher rule bundle (which counts
  * token shapes, not character spread).
  *
  * Determinism contract: code points are sorted and runs accumulated in
  * ascending code-point order with p * (ln p / ln 2) per run — a fixed
  * summation order, with log2 spelled as the ln ratio so the DuckDB
  * oracle states the same formula. Empty/null-length input scores 0.
  *
  * Native expression (not explode + two groupBys): entropy is a PER-ROW
  * metric; shuffling a corpus-characters-sized frame twice to compute it
  * would be the worst plan at any scale. One codegen'd loop, map-only. */
case class CharEntropy(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"requires string input, got $other")
  }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any): Any =
    CharEntropy.compute(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, { x =>
      s"${ev.value} = graft.functions.CharEntropy.compute($x);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharEntropy {
  /** Static entry point shared by eval and generated code (the generated
    * Java calls it directly — the loop body is identical either way). */
  def compute(u: UTF8String): Double = {
    val s = u.toString
    val len = s.length
    if (len == 0) return 0.0
    val cps = new Array[Int](len)
    var m = 0
    var k = 0
    while (k < len) {
      val cp = s.codePointAt(k)
      cps(m) = cp
      m += 1
      k += Character.charCount(cp)
    }
    java.util.Arrays.sort(cps, 0, m)
    var ent = 0.0
    var i = 0
    while (i < m) {
      var j = i
      while (j < m && cps(j) == cps(i)) j += 1
      val p = (j - i).toDouble / m
      ent -= p * (math.log(p) / math.log(2.0))
      i = j
    }
    ent
  }
}

object CharEntropyFunctions {
  import org.apache.spark.sql.graftbridge.Bridge

  def char_entropy(text: Column): Column =
    Bridge.column(CharEntropy(Bridge.expression(text)))
}
