package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass MinHash signature computation.
  *
  * The declarative (`transform`/`array_min`) formulation re-evaluates the
  * tokenizing `split` inside interpreted lambda calls — O(numHashes x
  * shingles) regex runs per row. This expression does one tokenize pass,
  * one 64-bit hash per shingle, and numHashes rotate-xor minima — a plain
  * per-row loop that stays inside whole-stage codegen.
  */
object MinHashFunctions {

  /** 64-bit FNV-1a over a char range (shingle hashing). */
  @inline private def fnv1a(chars: Array[Char], from: Int, until: Int,
      prev: Long): Long = {
    var h = prev
    var i = from
    while (i < until) {
      h ^= chars(i)
      h *= 0x100000001B3L
      i += 1
    }
    h
  }

  private def avalanche(x: Long): Long = {
    var z = x
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** MinHash signature of lowercased word `k`-shingles. */
  def minhashSignature(u: UTF8String, numHashes: Int, k: Int): ArrayData = {
    val text = u.toString.toLowerCase(java.util.Locale.ROOT)
    val chars = text.toCharArray
    // word boundaries (runs of letters/digits)
    val starts = new java.util.ArrayList[Int]()
    val ends = new java.util.ArrayList[Int]()
    var i = 0
    while (i < chars.length) {
      if (Character.isLetterOrDigit(chars(i))) {
        starts.add(i)
        while (i < chars.length && Character.isLetterOrDigit(chars(i))) i += 1
        ends.add(i)
      } else i += 1
    }
    val nWords = starts.size()
    val nShingles = math.max(1, nWords - k + 1)

    val mins = Array.fill(numHashes)(Long.MaxValue)
    var s = 0
    while (s < nShingles) {
      // hash the k-word shingle (words separated by a virtual space)
      var h = 0xCBF29CE484222325L
      var w = s
      val wEnd = math.min(s + k, nWords)
      while (w < wEnd) {
        h = fnv1a(chars, starts.get(w), ends.get(w), h)
        h ^= ' '
        h *= 0x100000001B3L
        w += 1
      }
      h = avalanche(h)
      // rotate-xor family
      var j = 0
      while (j < numHashes) {
        val r = j % 63 + 1
        val v = (java.lang.Long.rotateLeft(h, r)) ^
          (0xD1B54A32D192ED03L * (2 * j + 1))
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      s += 1
    }
    new GenericArrayData(mins.map(l => l: Any))
  }
}

case class MinHashSignatureExpr(child: Expression, numHashes: Int, k: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    MinHashFunctions.minhashSignature(
      input.asInstanceOf[UTF8String], numHashes, k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinHashFunctions.minhashSignature($c, $numHashes, $k)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_minhash_signature"
}

object MinHash {
  /** Column API (uses the registered function; see GraftFunctions). */
  def signature(text: Column, numHashes: Int = 64, k: Int = 3): Column = {
    import org.apache.spark.sql.functions.lit
    call_function("graft_minhash_signature", text, lit(numHashes), lit(k))
  }
}
