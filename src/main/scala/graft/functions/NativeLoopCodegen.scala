package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.types._

private[functions] object NativeLoopCodegen {
  /** Explicit unboxing suffix for primitive result types — generated
    * code must not rely on Janino autoboxing. */
  def unboxSuffix(dataType: DataType): String = dataType match {
    case LongType => ".longValue()"
    case IntegerType => ".intValue()"
    case DoubleType => ".doubleValue()"
    case FloatType => ".floatValue()"
    case BooleanType => ".booleanValue()"
    case ShortType => ".shortValue()"
    case ByteType => ".byteValue()"
    case _ => ""
  }
}

/** Whole-stage-codegen support for the native per-row-loop expressions
  * (the md5 oracle family): the generated Java calls `nullSafeEval` on
  * the expression instance via a reference object — ONE virtual call
  * per row, noise next to the row's digest loop — instead of the
  * `CodegenFallback` marker, which makes `CollapseCodegenStages` reject
  * the WHOLE hosting operator: every projection carrying one of these
  * expressions fell out of its whole-stage span, paying interpreted
  * dispatch for every OTHER expression in the projection and a
  * row-buffer boundary on both sides. (The r16 in-source rationale —
  * "per-row overhead once, tight native loop inside" — priced the
  * expression itself correctly but not the span break it caused; the
  * r17 A/B on the x169/x129 streaming paths measures the difference.)
  *
  * Null contract: `eval`'s UnaryExpression wrapper handles null INPUT;
  * expressions that can return null from non-null input (empty-array
  * cases) set `nullable = true` and the generated code mirrors
  * nullSafeEval's null return into `isNull`. */
private[functions] trait NativeLoopCodegen extends UnaryExpression {

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nativeExpr", this)
    val boxed = CodeGenerator.boxedType(dataType)
    val unbox = NativeLoopCodegen.unboxSuffix(dataType)
    if (nullable) {
      nullSafeCodeGen(ctx, ev, x => {
        val raw = ctx.freshName("nativeRaw")
        s"""
           |Object $raw = $ref.nullSafeEval($x);
           |if ($raw == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = (($boxed) $raw)$unbox; }
         """.stripMargin
      })
    } else {
      nullSafeCodeGen(ctx, ev, x =>
        s"${ev.value} = (($boxed) $ref.nullSafeEval($x))$unbox;")
    }
  }
}

/** [[NativeLoopCodegen]] for the binary native-loop expressions (LCS,
  * BLEU overlaps, splice) — same reference-object call, two operands. */
private[functions] trait NativeLoopCodegenBinary extends BinaryExpression {

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nativeExpr", this)
    val boxed = CodeGenerator.boxedType(dataType)
    val unbox = NativeLoopCodegen.unboxSuffix(dataType)
    if (nullable) {
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val raw = ctx.freshName("nativeRaw")
        s"""
           |Object $raw = $ref.nullSafeEval($a, $b);
           |if ($raw == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = (($boxed) $raw)$unbox; }
         """.stripMargin
      })
    } else {
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = (($boxed) $ref.nullSafeEval($a, $b))$unbox;")
    }
  }
}
