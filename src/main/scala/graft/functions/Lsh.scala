package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Single-pass banded random-hyperplane LSH signatures.
  *
  * Semantically identical to evaluating
  * [[graft.ops.SimilaritySearch.lshSignature]] once per band (same
  * [[graft.ops.SimilaritySearch.planeSign]] plane matrix, same sequential
  * left-fold projection, so sign decisions are bit-identical and the
  * driver's DuckDB oracles keep matching) — but one codegen'd expression
  * instead of bands x nPlanes zip_with/aggregate lambda chains: the
  * declarative form at 8 bands x 6 planes x 64 dims compiles ~3k
  * expression nodes and re-reads the vector 48 times; this reads it once.
  */
object LshFunctions {

  /** planes(band)(plane * dim + d) = +/-1 component. */
  def planeMatrix(dim: Int, nPlanes: Int, bands: Int,
      seedBase: Int): Array[Array[Double]] =
    Array.tabulate(bands) { b =>
      val flat = new Array[Double](nPlanes * dim)
      var p = 0
      while (p < nPlanes) {
        var d = 0
        while (d < dim) {
          flat(p * dim + d) =
            graft.ops.SimilaritySearch.planeSign(seedBase + b, p, d)
          d += 1
        }
        p += 1
      }
      flat
    }

  /** All band signatures of one vector. `isFloat` selects the element
    * accessor; accumulation is the same sequential fold as the
    * declarative `aggregate` (0.0 + x0*s0 + x1*s1 + ...).
    *
    * Precondition: `vec` has exactly `dim` elements. The declarative
    * [[graft.ops.SimilaritySearch.lshSignature]] null-pads shorter vectors
    * (projection becomes null -> all bits 0) while a silent truncation here
    * would compute real partial projections — the bit-identity contract
    * (and the DuckDB oracles built on it) only holds at equal lengths, so
    * a malformed embedding fails loudly instead of diverging quietly.
    */
  def signatures(vec: ArrayData, planes: Array[Array[Double]], dim: Int,
      nPlanes: Int, isFloat: Boolean): ArrayData = {
    val n = vec.numElements()
    if (n != dim)
      throw new IllegalArgumentException(
        s"graft_lsh_signatures: vector has $n elements, expected dim=$dim")
    val xs = new Array[Double](n)
    var d = 0
    while (d < n) {
      xs(d) = if (isFloat) vec.getFloat(d).toDouble else vec.getDouble(d)
      d += 1
    }
    val out = new Array[Any](planes.length)
    var b = 0
    while (b < planes.length) {
      val flat = planes(b)
      var sig = 0L
      var p = 0
      while (p < nPlanes) {
        var acc = 0.0
        val off = p * dim
        var i = 0
        while (i < n) {
          acc += xs(i) * flat(off + i)
          i += 1
        }
        if (acc > 0) sig |= (1L << p)
        p += 1
      }
      out(b) = sig
      b += 1
    }
    new GenericArrayData(out)
  }
}

object CosineFunctions {
  /** Cosine of two numeric arrays — the same three sequential folds (dot,
    * |a|^2, |b|^2 in index order, doubles) as the declarative
    * zip_with/aggregate formulation, so results are bit-identical; one
    * pass instead of three interpreted higher-order-function chains.
    */
  def cosine(a: ArrayData, b: ArrayData, aFloat: Boolean,
      bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na2 = 0.0
    var nb2 = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      na2 += x * x
      nb2 += y * y
      i += 1
    }
    // the declarative form squares the FULL arrays even when lengths
    // differ; equal-length inputs (the only supported case) are unaffected
    val na = math.sqrt(na2)
    val nb = math.sqrt(nb2)
    if (na == 0 || nb == 0) 0.0 else dot / (na * nb)
  }
}

/** cosine(array<float|double>, array<float|double>) -> double. */
case class CosineExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  private def floatiness(e: Expression): Option[Boolean] = e.dataType match {
    case ArrayType(FloatType, _) => Some(true)
    case ArrayType(DoubleType, _) => Some(false)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (floatiness(left).isDefined && floatiness(right).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> arguments, got " +
        s"(${left.dataType}, ${right.dataType})")

  override def dataType: DataType = DoubleType
  private def aF: Boolean = floatiness(left).get
  private def bF: Boolean = floatiness(right).get

  override protected def nullSafeEval(a: Any, b: Any): Any =
    CosineFunctions.cosine(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData], aF, bF)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.CosineFunctions.cosine($a, $b, $aF, $bF)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_cosine"
}

/** array<float|double> -> array<long> of per-band LSH signatures. */
case class LshSignaturesExpr(child: Expression, dim: Int, nPlanes: Int,
    bands: Int, seedBase: Int) extends UnaryExpression {

  private def elementType: Option[DataType] = child.dataType match {
    case ArrayType(et, _) => Some(et)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult = elementType match {
    case Some(FloatType) | Some(DoubleType) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double>, got ${child.dataType}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private lazy val planes =
    LshFunctions.planeMatrix(dim, nPlanes, bands, seedBase)
  private def isFloat: Boolean = elementType.contains(FloatType)

  override protected def nullSafeEval(input: Any): Any =
    LshFunctions.signatures(input.asInstanceOf[ArrayData], planes, dim,
      nPlanes, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("lshPlanes", planes,
      "double[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.LshFunctions.signatures($c, $planesRef, $dim, " +
        s"$nPlanes, $isFloat)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_lsh_signatures"
}
