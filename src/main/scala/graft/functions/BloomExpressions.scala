package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Native membership test of an `array<long>` column against a
  * driver-built [[org.apache.spark.util.sketch.BloomFilter]]: true when
  * ANY element might be in the filter.
  *
  * The 100 TB decontamination shape this enables: the benchmark shingle
  * set rides to executors as a few MB of Bloom bits (a reference object,
  * broadcast with the plan) instead of a distinct-shingle frame in a
  * join — the screen becomes MAP-ONLY with zero exchanges, at the price
  * of the filter's one-sided error (false POSITIVES over-flag documents
  * for the exact re-check or over-removal; false negatives cannot
  * happen, so nothing contaminated slips through). Codegen'd loop with
  * early exit on first hit; spec pins the no-false-negative side against
  * the exact join formulation. */
case class BloomAnyContainLong(child: Expression, bloom: BloomFilter)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"requires array<long> input, got $other")
  }

  override def dataType: DataType = BooleanType

  override def nullSafeEval(a: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    var i = 0
    val n = xs.numElements()
    while (i < n) {
      if (!xs.isNullAt(i) && bloom.mightContainLong(xs.getLong(i))) return true
      i += 1
    }
    false
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bloomRef = ctx.addReferenceObj("bloom", bloom,
      "org.apache.spark.util.sketch.BloomFilter")
    nullSafeCodeGen(ctx, ev, { x =>
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val hit = ctx.freshName("hit")
      s"""
         |boolean $hit = false;
         |int $n = $x.numElements();
         |for (int $i = 0; $i < $n && !$hit; $i++) {
         |  if (!$x.isNullAt($i) && $bloomRef.mightContainLong($x.getLong($i))) {
         |    $hit = true;
         |  }
         |}
         |${ev.value} = $hit;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomFunctions {
  import org.apache.spark.sql.graftbridge.Bridge

  def bloom_any_contain(arr: Column, bloom: BloomFilter): Column =
    Bridge.column(BloomAnyContainLong(Bridge.expression(arr), bloom))
}
