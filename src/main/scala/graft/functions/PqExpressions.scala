package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for product quantization (Jegou et al.,
  * "Product Quantization for Nearest Neighbor Search", TPAMI 2011) — the
  * memory-bound scale path of vector retrieval: a 64-dim float vector
  * (256 bytes) compresses to m code bytes (m=8 here), so a 100 TB
  * embedding table's scan side shrinks ~32x and the ADC scoring loop
  * reads only the per-query lookup table plus m small ints per row.
  *
  * Layout convention shared by all expressions: `codebooks` is the
  * flattened (m*ks) x subDim matrix, entry `sub*ks + j` = centroid j of
  * subspace `sub`; input subvector `sub` = elements
  * [sub*subDim, (sub+1)*subDim). Metric is SQUARED L2 per subspace (the
  * PQ paper's quantizer objective — NOT the cosine the IVF coarse
  * quantizer uses). Ragged/short vectors truncate the per-subspace loop
  * to the available elements, mirroring the CosineSimilarity contract.
  *
  * Why native expressions: the encode loop is m*ks distance evaluations
  * per row and the unrolled literal formulation hits Janino's 64 KB
  * method limit long before the paper's ks=256 (the r10 NearestCentroidId
  * finding); a constant-code-size runtime loop codegens at any (m, ks).
  *
  * The raw and residual forms share ONE loop kernel each
  * ([[PqMath.encode]] / [[PqMath.lut]], the CharEntropy static-compute
  * pattern): eval and generated code call the same static method, so the
  * determinism-sensitive summation order is defined in exactly one place
  * and eval can never drift from codegen. */
object PqLayout {
  /** Validate and flatten a (m x ks x subDim) codebook into the shared
    * `sub*ks + j` layout. */
  def flatten(codebooks: Array[Array[Array[Double]]]): (Array[Array[Double]], Int, Int) = {
    require(codebooks.nonEmpty && codebooks.head.nonEmpty, "need >= 1 subspace codebook")
    val m = codebooks.length
    val ks = codebooks.head.length
    require(codebooks.forall(_.length == ks), "every subspace needs the same ks")
    val subDim = codebooks.head.head.length
    require(codebooks.forall(_.forall(_.length == subDim)),
      "every codeword needs the same subDim")
    (codebooks.flatten, m, ks)
  }
}

/** The shared per-row loop kernels — static entry points called by BOTH
  * nullSafeEval and the generated Java (one definition of the
  * accumulation order for all four expressions). `coarse == null` is the
  * raw form; non-null subtracts `coarse(cid)` element-wise inside the
  * loop (the residual form — the residual vector never materializes). */
object PqMath {

  /** [[PqAdcDist]] shape guard, shared by eval and codegen: ks is a
    * constructor argument with no way to derive it from the lut child,
    * so a LUT built by a different model must fail loudly, not zero. */
  def checkAdcShape(nCodes: Int, ks: Int, nLut: Int): Unit =
    if (nCodes * ks != nLut) throw new IllegalArgumentException(
      s"pq_adc_dist: lut length $nLut != codes($nCodes) * ks($ks) — LUT and ks come from different models")

  def checkAdcCode(code: Int, ks: Int): Unit =
    if (code < 0 || code >= ks) throw new IllegalArgumentException(
      s"pq_adc_dist: code $code outside [0, $ks) — corrupt codes or wrong ks")

  def encode(x: ArrayData, xf: Boolean, codebooks: Array[Array[Double]],
      m: Int, ks: Int, subDim: Int, coarse: Array[Array[Double]],
      cid: Int): UnsafeArrayData = {
    val cv: Array[Double] = if (coarse == null) null else coarse(cid)
    val lim = if (cv == null) x.numElements()
      else math.min(x.numElements(), cv.length)
    val out = new Array[Int](m)
    var sub = 0
    while (sub < m) {
      val base = sub * subDim
      var best = 0; var bestDist = Double.MaxValue
      var j = 0
      while (j < ks) {
        val cw = codebooks(sub * ks + j)
        val n = math.min(lim - base, subDim)
        var dist = 0.0; var d = 0
        while (d < n) {
          var xv = if (xf) x.getFloat(base + d).toDouble else x.getDouble(base + d)
          if (cv != null) xv -= cv(base + d)
          val diff = xv - cw(d)
          dist += diff * diff
          d += 1
        }
        if (dist < bestDist) { best = j; bestDist = dist }
        j += 1
      }
      out(sub) = best
      sub += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  def lut(x: ArrayData, xf: Boolean, codebooks: Array[Array[Double]],
      m: Int, ks: Int, subDim: Int, coarse: Array[Array[Double]],
      cid: Int): UnsafeArrayData = {
    val cv: Array[Double] = if (coarse == null) null else coarse(cid)
    val lim = if (cv == null) x.numElements()
      else math.min(x.numElements(), cv.length)
    val out = new Array[Double](m * ks)
    var sub = 0
    while (sub < m) {
      val base = sub * subDim
      var j = 0
      while (j < ks) {
        val cw = codebooks(sub * ks + j)
        val n = math.min(lim - base, subDim)
        var dist = 0.0; var d = 0
        while (d < n) {
          var xv = if (xf) x.getFloat(base + d).toDouble else x.getDouble(base + d)
          if (cv != null) xv -= cv(base + d)
          val diff = xv - cw(d)
          dist += diff * diff
          d += 1
        }
        out(sub * ks + j) = dist
        j += 1
      }
      sub += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

private[functions] trait PqVecInput { self: Expression =>
  def vecChild: Expression

  final def checkVecType(other: DataType): TypeCheckResult = other match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case o => TypeCheckResult.TypeCheckFailure(
      s"requires array<float|double> input, got $o")
  }

  final def elemIsFloat: Boolean =
    vecChild.dataType.asInstanceOf[ArrayType].elementType == FloatType
}

/** PQ encode: vector -> array<int> of m code ids, code `sub` = argmin over
  * the subspace's ks codewords of squared L2 distance, ties to the LOWEST
  * code id (strict `<` improvement — the order a `ORDER BY dist, code
  * LIMIT 1` oracle replays). */
case class PqEncode(child: Expression, codebooks: Array[Array[Double]],
    m: Int, ks: Int)
    extends UnaryExpression with PqVecInput {

  require(m >= 1 && ks >= 1 && codebooks.length == m * ks,
    s"codebooks must be m*ks=${m * ks} rows, got ${codebooks.length}")

  override def vecChild: Expression = child
  override def checkInputDataTypes(): TypeCheckResult = checkVecType(child.dataType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  private def subDim: Int = codebooks.head.length

  override def nullSafeEval(a: Any): Any =
    PqMath.encode(a.asInstanceOf[ArrayData], elemIsFloat, codebooks, m, ks,
      subDim, null, 0)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("codebooks", codebooks, "double[][]")
    nullSafeCodeGen(ctx, ev, { x =>
      s"""${ev.value} = graft.functions.PqMath.encode($x, $elemIsFloat,
         |  $cbRef, $m, $ks, $subDim, null, 0);""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-query ADC lookup table: query vector -> array<double> of m*ks
  * squared L2 distances, entry `sub*ks + j` = dist(q_sub, codeword j of
  * subspace sub). Computed ONCE per query row; every corpus row then
  * scores with m array reads ([[PqAdcDist]]) instead of m*subDim
  * multiplies — the asymmetric-distance trick that makes PQ scan-bound,
  * not FLOP-bound. */
case class PqLut(child: Expression, codebooks: Array[Array[Double]],
    m: Int, ks: Int)
    extends UnaryExpression with PqVecInput {

  require(m >= 1 && ks >= 1 && codebooks.length == m * ks,
    s"codebooks must be m*ks=${m * ks} rows, got ${codebooks.length}")

  override def vecChild: Expression = child
  override def checkInputDataTypes(): TypeCheckResult = checkVecType(child.dataType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  private def subDim: Int = codebooks.head.length

  override def nullSafeEval(a: Any): Any =
    PqMath.lut(a.asInstanceOf[ArrayData], elemIsFloat, codebooks, m, ks,
      subDim, null, 0)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("codebooks", codebooks, "double[][]")
    nullSafeCodeGen(ctx, ev, { x =>
      s"""${ev.value} = graft.functions.PqMath.lut($x, $elemIsFloat,
         |  $cbRef, $m, $ks, $subDim, null, 0);""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** ADC distance: (codes array<int>, lut array<double>) -> double,
  * sum over subspaces of lut[sub*ks + codes[sub]] in subspace order
  * (left-to-right — the accumulation order the oracle's ordered SUM
  * replays). The LUT length MUST equal codes.length * ks: `ks` is a
  * constructor argument the expression cannot derive from the lut
  * child, so a caller pairing a LUT from one model with the ks of
  * another would otherwise silently index the wrong entries. Both the
  * interpreted and codegen paths raise on the mismatch (and on a code
  * outside [0, ks)) instead of contributing 0. */
case class PqAdcDist(left: Expression, right: Expression, ks: Int)
    extends BinaryExpression {

  require(ks >= 1, "need ks >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"requires (array<int>, array<double>), got ${left.dataType} / ${right.dataType}")
    }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val lut = b.asInstanceOf[ArrayData]
    PqMath.checkAdcShape(codes.numElements(), ks, lut.numElements())
    var sum = 0.0
    var sub = 0
    while (sub < codes.numElements()) {
      val code = codes.getInt(sub)
      PqMath.checkAdcCode(code, ks)
      sum += lut.getDouble(sub * ks + code)
      sub += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, { (codes, lut) =>
      val sum = ctx.freshName("sum"); val sub = ctx.freshName("sub")
      val code = ctx.freshName("code")
      s"""
         |graft.functions.PqMath.checkAdcShape($codes.numElements(), $ks, $lut.numElements());
         |double $sum = 0.0;
         |for (int $sub = 0; $sub < $codes.numElements(); $sub++) {
         |  int $code = $codes.getInt($sub);
         |  graft.functions.PqMath.checkAdcCode($code, $ks);
         |  $sum += $lut.getDouble($sub * $ks + $code);
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Residual PQ encode — the textbook IVFADC fine quantizer (Jegou 2011
  * §III): codes quantize the RESIDUAL v - coarse[cid] instead of the raw
  * vector, so each list's codebook only has to cover the spread AROUND
  * its centroid (markedly lower distortion at the same m*ks budget). The
  * subtraction fuses INTO [[PqMath.encode]]'s distance loop — the
  * residual vector is never materialized. Binary children: (vector,
  * coarse centroid id). */
case class PqEncodeResidual(left: Expression, right: Expression,
    coarse: Array[Array[Double]], codebooks: Array[Array[Double]],
    m: Int, ks: Int)
    extends BinaryExpression with PqVecInput {

  require(m >= 1 && ks >= 1 && codebooks.length == m * ks,
    s"codebooks must be m*ks=${m * ks} rows, got ${codebooks.length}")
  require(coarse.nonEmpty, "need coarse centroids")

  override def vecChild: Expression = left
  override def checkInputDataTypes(): TypeCheckResult =
    (checkVecType(left.dataType), right.dataType) match {
      case (TypeCheckResult.TypeCheckSuccess, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (TypeCheckResult.TypeCheckSuccess, o) =>
        TypeCheckResult.TypeCheckFailure(s"centroid id must be int, got $o")
      case (fail, _) => fail
    }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  private def subDim: Int = codebooks.head.length

  override def nullSafeEval(a: Any, b: Any): Any =
    PqMath.encode(a.asInstanceOf[ArrayData], elemIsFloat, codebooks, m, ks,
      subDim, coarse, b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("codebooks", codebooks, "double[][]")
    val coRef = ctx.addReferenceObj("coarse", coarse, "double[][]")
    nullSafeCodeGen(ctx, ev, { (x, cidv) =>
      s"""${ev.value} = graft.functions.PqMath.encode($x, $elemIsFloat,
         |  $cbRef, $m, $ks, $subDim, $coRef, $cidv);""".stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Residual ADC lookup table: distances from (q - coarse[cid])'s
  * subvectors to every codeword — one LUT per (query, probed list) pair,
  * the residual sibling of [[PqLut]]. */
case class PqLutResidual(left: Expression, right: Expression,
    coarse: Array[Array[Double]], codebooks: Array[Array[Double]],
    m: Int, ks: Int)
    extends BinaryExpression with PqVecInput {

  require(m >= 1 && ks >= 1 && codebooks.length == m * ks,
    s"codebooks must be m*ks=${m * ks} rows, got ${codebooks.length}")
  require(coarse.nonEmpty, "need coarse centroids")

  override def vecChild: Expression = left
  override def checkInputDataTypes(): TypeCheckResult =
    (checkVecType(left.dataType), right.dataType) match {
      case (TypeCheckResult.TypeCheckSuccess, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (TypeCheckResult.TypeCheckSuccess, o) =>
        TypeCheckResult.TypeCheckFailure(s"centroid id must be int, got $o")
      case (fail, _) => fail
    }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  private def subDim: Int = codebooks.head.length

  override def nullSafeEval(a: Any, b: Any): Any =
    PqMath.lut(a.asInstanceOf[ArrayData], elemIsFloat, codebooks, m, ks,
      subDim, coarse, b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("codebooks", codebooks, "double[][]")
    val coRef = ctx.addReferenceObj("coarse", coarse, "double[][]")
    nullSafeCodeGen(ctx, ev, { (x, cidv) =>
      s"""${ev.value} = graft.functions.PqMath.lut($x, $elemIsFloat,
         |  $cbRef, $m, $ks, $subDim, $coRef, $cidv);""".stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PqFunctions {
  import org.apache.spark.sql.graftbridge.Bridge

  def pq_encode(vec: Column, codebooks: Array[Array[Double]], m: Int, ks: Int): Column =
    Bridge.column(PqEncode(Bridge.expression(vec), codebooks, m, ks))

  def pq_lut(vec: Column, codebooks: Array[Array[Double]], m: Int, ks: Int): Column =
    Bridge.column(PqLut(Bridge.expression(vec), codebooks, m, ks))

  /** `ks` MUST match the model that built `lut` (pq_lut / pq_lut_residual
    * with the same codebooks); the expression raises at runtime when
    * `lut.length != codes.length * ks` or a code falls outside [0, ks). */
  def pq_adc_dist(codes: Column, lut: Column, ks: Int): Column =
    Bridge.column(PqAdcDist(Bridge.expression(codes), Bridge.expression(lut), ks))

  def pq_encode_residual(vec: Column, cid: Column, coarse: Array[Array[Double]],
      codebooks: Array[Array[Double]], m: Int, ks: Int): Column =
    Bridge.column(PqEncodeResidual(Bridge.expression(vec),
      Bridge.expression(cid), coarse, codebooks, m, ks))

  def pq_lut_residual(vec: Column, cid: Column, coarse: Array[Array[Double]],
      codebooks: Array[Array[Double]], m: Int, ks: Int): Column =
    Bridge.column(PqLutResidual(Bridge.expression(vec),
      Bridge.expression(cid), coarse, codebooks, m, ks))
}
