package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native signature kernels for near-dup dedup (SURVEY §2B E35).
  *
  * Why expressions and not SQL higher-order functions: a HOF formulation
  * like `transform(sequence(0,k-1), i -> array_min(transform(shingles,
  * s -> xxhash64(i, s))))` re-evaluates the inner collection lambda per
  * outer element — tokenization and string hashing run k times per row
  * (measured 40× slower at sf0.1). These kernels hash each element string
  * ONCE and derive the k hash family members by re-mixing the 64-bit base
  * (`h_i = xxhash64(base, seed=i)`), the standard one-pass MinHash
  * construction.
  */
object TextHashExpressions {
  /** One string hash + k long mixes per element. */
  @inline def minhashOf(elems: ArrayData, k: Int): Array[Long] = {
    val sig = Array.fill(k)(Long.MaxValue)
    val n = elems.numElements()
    var j = 0
    while (j < n) {
      val base = XxHash64Function.hash(elems.getUTF8String(j), StringType, 42L)
      var i = 0
      while (i < k) {
        val h = XxHash64Function.hash(base, LongType, i.toLong)
        if (h < sig(i)) sig(i) = h
        i += 1
      }
      j += 1
    }
    sig
  }

  /** 64-bit SimHash: one string hash per element, bitwise majority vote. */
  @inline def simhashOf(elems: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = elems.numElements()
    var j = 0
    while (j < n) {
      val h = XxHash64Function.hash(elems.getUTF8String(j), StringType, 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      j += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }
}

/** minhash_sig(array<string>, k) -> array<long> */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "minhash_sig"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig expects array<string>, got ${t.catalogString}")
    }

  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(
      TextHashExpressions.minhashOf(v.asInstanceOf[ArrayData], numHashes))

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** simhash64(array<string>) -> long */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "simhash64"
  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 expects array<string>, got ${t.catalogString}")
    }

  override def nullSafeEval(v: Any): Any =
    TextHashExpressions.simhashOf(v.asInstanceOf[ArrayData])

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
