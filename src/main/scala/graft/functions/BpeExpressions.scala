package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** A learned BPE merge table in evaluation form: rank lookup plus a
  * per-executor word memo (corpus words repeat heavily — Zipf — so most
  * rows hit the cache instead of re-running the merge loop). Shipped to
  * executors as a plan reference object by the expressions below.
  */
final class BpeModel(mergesStr: String) extends Serializable {
  val ranks: Map[(String, String), Int] = graft.ops.Bpe.parseMerges(mergesStr)

  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[UTF8String]]()

  def encodeWord(w: String): Array[UTF8String] = {
    val hit = cache.get(w)
    if (hit != null) return hit
    val arr = graft.ops.Bpe.encodeWord(w, ranks)
      .map(UTF8String.fromString).toArray
    // bounded memo: past 64k distinct words just compute (no eviction
    // churn, no unbounded executor memory)
    if (cache.size < 65536) cache.put(w, arr)
    arr
  }
}

/** Static eval targets for codegen (mirrors PhoneticFunctions). */
object BpeFunctions {
  def countTokens(text: UTF8String, model: BpeModel): Int = {
    var n = 0
    graft.ops.Bpe.words(text.toString)
      .foreach(w => n += model.encodeWord(w).length)
    n
  }

  def encode(text: UTF8String, model: BpeModel): GenericArrayData = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[Any]
    graft.ops.Bpe.words(text.toString)
      .foreach(w => buf ++= model.encodeWord(w))
    new GenericArrayData(buf.toArray)
  }
}

abstract class BpeExprBase extends UnaryExpression {
  def mergesStr: String
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType}")
  // built once per (de)serialized plan copy, shared across rows
  @transient protected lazy val model = new BpeModel(mergesStr)
}

/** Number of learned-BPE subword tokens in a text — the unit a
  * training-data pipeline budgets corpora in.
  */
case class BpeCountExpr(child: Expression, mergesStr: String)
    extends BpeExprBase {
  override def dataType: DataType = IntegerType
  override protected def nullSafeEval(input: Any): Any =
    BpeFunctions.countTokens(input.asInstanceOf[UTF8String], model)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("bpeModel", model)
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeFunctions.countTokens($c, $m)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_bpe_count"
}

/** The BPE token stream itself (array&lt;string&gt;). */
case class BpeEncodeExpr(child: Expression, mergesStr: String)
    extends BpeExprBase {
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    BpeFunctions.encode(input.asInstanceOf[UTF8String], model)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("bpeModel", model)
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeFunctions.encode($c, $m)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_bpe_encode"
}
