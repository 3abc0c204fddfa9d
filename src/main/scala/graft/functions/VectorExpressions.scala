package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native vector-similarity kernels over `array<float>` / `array<double>`
  * (SURVEY §2B E36, §4.3).
  *
  * These are full Catalyst expressions with `doGenCode`, so they inline into
  * whole-stage codegen as a primitive double loop — no boxing, no lambda
  * dispatch per element (the `aggregate`/`zip_with` HOF formulation used by
  * the oracle queries allocates an intermediate array and evaluates a
  * lambda per element; at 100 TB × 64–4096 dims that difference is the
  * scan-rate bottleneck). Accumulation is sequential in index order —
  * bit-identical to the HOF path and the DuckDB oracle.
  */
abstract class VectorBinaryExpression extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  protected def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _),
            ArrayType(FloatType | DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects two float/double arrays, got " +
            s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
    }
  }

  @inline protected final def get(a: ArrayData, i: Int, t: DataType): Double =
    t match {
      case FloatType => a.getFloat(i).toDouble
      case _ => a.getDouble(i)
    }

  /** Scala eval of the kernel given two equal-length arrays. */
  protected def kernel(a: ArrayData, b: ArrayData, ta: DataType,
      tb: DataType, n: Int): Double

  /** Java source of the loop; `n` is the length var, result must be
    * assigned to `ev` (a double); `getA`/`getB` render element reads. */
  protected def loopCode(n: String, ev: String,
      getA: String => String, getB: String => String): String

  override def nullSafeEval(av: Any, bv: Any): Any = {
    val a = av.asInstanceOf[ArrayData]
    val b = bv.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements())
      throw new IllegalArgumentException(
        s"$prettyName: dimension mismatch " +
          s"(${a.numElements()} vs ${b.numElements()})")
    kernel(a, b, elemType(left), elemType(right), a.numElements())
  }

  private def getter(v: String, t: DataType): String => String = t match {
    case FloatType => i => s"((double) $v.getFloat($i))"
    case _ => i => s"$v.getDouble($i)"
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (aVar, bVar) => {
      val n = ctx.freshName("n")
      s"""
      if ($aVar.numElements() != $bVar.numElements()) {
        throw new IllegalArgumentException("$prettyName: dimension mismatch ("
          + $aVar.numElements() + " vs " + $bVar.numElements() + ")");
      }
      int $n = $aVar.numElements();
      ${loopCode(n, ev.value.toString,
        getter(aVar, elemType(left)), getter(bVar, elemType(right)))}
      """
    })
}

/** vec_norm(a) = sqrt(sum(a_i^2)) — unary L2 norm, codegen'd. */
case class VecNorm(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def prettyName: String = "vec_norm"
  override def dataType: DataType = DoubleType

  private def elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_norm expects a float/double array, got ${t.catalogString}")
    }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = elemType match {
        case FloatType => a.getFloat(i).toDouble
        case _ => a.getDouble(i)
      }
      acc += x * x
      i += 1
    }
    math.sqrt(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val get = elemType match {
        case FloatType => s"(double) $a.getFloat(i)"
        case _ => s"$a.getDouble(i)"
      }
      s"""
      { double acc = 0.0;
        int n = $a.numElements();
        for (int i = 0; i < n; i++) { double x = $get; acc += x * x; }
        ${ev.value} = java.lang.Math.sqrt(acc); }
      """
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(c)
}

/** dot(a, b) */
case class DotProduct(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def prettyName: String = "vec_dot"
  override protected def kernel(a: ArrayData, b: ArrayData, ta: DataType,
      tb: DataType, n: Int): Double = {
    var acc = 0.0; var i = 0
    while (i < n) { acc += get(a, i, ta) * get(b, i, tb); i += 1 }
    acc
  }
  override protected def loopCode(n: String, ev: String,
      ga: String => String, gb: String => String): String =
    s"""
    { double acc = 0.0;
      for (int i = 0; i < $n; i++) { acc += ${ga("i")} * ${gb("i")}; }
      $ev = acc; }
    """
  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(l, r)
}

/** cosine(a, b) = dot / (|a| * |b|); NaN-free for zero vectors (returns 0). */
case class CosineSimilarity(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def prettyName: String = "cosine_sim"
  override protected def kernel(a: ArrayData, b: ArrayData, ta: DataType,
      tb: DataType, n: Int): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = get(a, i, ta); val y = get(b, i, tb)
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }
  override protected def loopCode(n: String, ev: String,
      ga: String => String, gb: String => String): String =
    s"""
    { double dot = 0.0, na = 0.0, nb = 0.0;
      for (int i = 0; i < $n; i++) {
        double x = ${ga("i")}; double y = ${gb("i")};
        dot += x * y; na += x * x; nb += y * y;
      }
      double denom = java.lang.Math.sqrt(na) * java.lang.Math.sqrt(nb);
      $ev = denom == 0.0 ? 0.0 : dot / denom; }
    """
  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(l, r)
}

/** l2(a, b) = sqrt(sum((a_i - b_i)^2)) */
case class L2Distance(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def prettyName: String = "vec_l2"
  override protected def kernel(a: ArrayData, b: ArrayData, ta: DataType,
      tb: DataType, n: Int): Double = {
    var acc = 0.0; var i = 0
    while (i < n) {
      val dv = get(a, i, ta) - get(b, i, tb); acc += dv * dv; i += 1
    }
    math.sqrt(acc)
  }
  override protected def loopCode(n: String, ev: String,
      ga: String => String, gb: String => String): String =
    s"""
    { double acc = 0.0;
      for (int i = 0; i < $n; i++) {
        double d = ${ga("i")} - ${gb("i")}; acc += d * d;
      }
      $ev = java.lang.Math.sqrt(acc); }
    """
  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(l, r)
}
