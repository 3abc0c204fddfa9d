package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native product-quantization kernels (SURVEY §2B E38 depth; same
  * rationale as [[VectorBinaryExpression]]): the per-row hot loops of PQ —
  * encode (m×k×d argmin), probe distance tables (m×k×d), ADC scoring
  * (m adds) — as full codegen expressions. The HOF formulation
  * (aggregate/zip_with folds over codebook structs) allocates arrays and
  * dispatches lambdas per entry: measured ~7 s for train+encode at
  * sf0.1 on local[32] vs sub-second here; at 100 TB the difference is the
  * scan rate.
  *
  * Codebook layout: ONE flat `array<double>` of length m·k·d, sub-major
  * then code then component — broadcastable, cache-friendly, and the
  * generated loops index it directly.
  */
abstract class PqKernelExpression extends BinaryExpression {

  protected def vecElemType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<float|double>, array<double>), got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
    }

  @inline protected final def getVec(a: ArrayData, i: Int): Double =
    vecElemType match {
      case FloatType => a.getFloat(i).toDouble
      case _ => a.getDouble(i)
    }

  protected def vecGetter(v: String): String => String = vecElemType match {
    case FloatType => i => s"((double) $v.getFloat($i))"
    case _ => i => s"$v.getDouble($i)"
  }
}

/** pq_encode(vec, codebook) → array<int> of `m` codes: per subspace, the
  * codebook entry with the smallest squared L2 (ties → smallest code). */
case class PqEncode(left: Expression, right: Expression, m: Int, k: Int)
    extends PqKernelExpression {
  override def prettyName: String = "pq_encode"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(av: Any, bv: Any): Any = {
    val vec = av.asInstanceOf[ArrayData]
    val cb = bv.asInstanceOf[ArrayData]
    val d = vec.numElements() / m
    require(cb.numElements() == m * k * d,
      s"pq_encode: codebook length ${cb.numElements()} != m*k*d ${m * k * d}")
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = Double.MaxValue; var bestC = 0; var c = 0
      while (c < k) {
        var acc = 0.0; var t = 0; val base = (j * k + c) * d
        while (t < d) {
          val diff = getVec(vec, j * d + t) - cb.getDouble(base + t)
          acc += diff * diff; t += 1
        }
        if (acc < best) { best = acc; bestC = c }
        c += 1
      }
      codes(j) = bestC; j += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (vecV, cbV) => {
      val g = vecGetter(vecV)
      val (d, codes, j, c, t, best, bestC, acc, base) =
        (ctx.freshName("d"), ctx.freshName("codes"), ctx.freshName("j"),
          ctx.freshName("c"), ctx.freshName("t"), ctx.freshName("best"),
          ctx.freshName("bestC"), ctx.freshName("acc"), ctx.freshName("base"))
      s"""
      int $d = $vecV.numElements() / $m;
      if ($cbV.numElements() != $m * $k * $d) {
        throw new IllegalArgumentException("pq_encode: codebook length "
          + $cbV.numElements() + " != m*k*d " + ($m * $k * $d));
      }
      int[] $codes = new int[$m];
      for (int $j = 0; $j < $m; $j++) {
        double $best = Double.MAX_VALUE; int $bestC = 0;
        for (int $c = 0; $c < $k; $c++) {
          double $acc = 0.0; int $base = ($j * $k + $c) * $d;
          for (int $t = 0; $t < $d; $t++) {
            double diff = ${g(s"$j * $d + $t")} - $cbV.getDouble($base + $t);
            $acc += diff * diff;
          }
          if ($acc < $best) { $best = $acc; $bestC = $c; }
        }
        $codes[$j] = $bestC;
      }
      ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
      """
    })

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
}

/** rand_project(vec, signs) → array<double> of `outDim` scaled signed
  * sums: `out[j] = (Σ_i vec[i] · signs[j·inDim + i]) / √outDim` with
  * `inDim = |signs| / outDim` — the Johnson–Lindenstrauss ±1 projection
  * ([[graft.operators.RandomProjection]]) as a full codegen kernel. The
  * HOF formulation dispatches a lambda per (j, i) pair; this is the
  * same in-order fold (bit-identical doubles, so the DuckDB hash gate
  * is unaffected) as two tight loops over flat arrays. */
case class SignedProject(left: Expression, right: Expression, outDim: Int)
    extends PqKernelExpression {
  require(outDim > 0, s"outDim must be positive, got $outDim")
  override def prettyName: String = "rand_project"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(av: Any, bv: Any): Any = {
    val vec = av.asInstanceOf[ArrayData]
    val signs = bv.asInstanceOf[ArrayData]
    val inDim = signs.numElements() / outDim
    require(signs.numElements() == outDim * inDim && inDim > 0,
      s"rand_project: |signs| ${signs.numElements()} not divisible by $outDim")
    require(vec.numElements() >= inDim,
      s"rand_project: vector has ${vec.numElements()} dims, needs $inDim")
    val scale = math.sqrt(outDim.toDouble)
    val out = new Array[Double](outDim)
    var j = 0
    while (j < outDim) {
      var acc = 0.0; var i = 0; val base = j * inDim
      while (i < inDim) {
        acc += getVec(vec, i) * signs.getDouble(base + i); i += 1
      }
      out(j) = acc / scale; j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (vecV, sgnV) => {
      val g = vecGetter(vecV)
      val (inDim, out, j, i, acc, base, scale) =
        (ctx.freshName("inDim"), ctx.freshName("out"), ctx.freshName("j"),
          ctx.freshName("i"), ctx.freshName("acc"), ctx.freshName("base"),
          ctx.freshName("scale"))
      s"""
      int $inDim = $sgnV.numElements() / $outDim;
      if ($sgnV.numElements() != $outDim * $inDim || $inDim == 0) {
        throw new IllegalArgumentException("rand_project: |signs| "
          + $sgnV.numElements() + " not divisible by " + $outDim);
      }
      if ($vecV.numElements() < $inDim) {
        throw new IllegalArgumentException("rand_project: vector has "
          + $vecV.numElements() + " dims, needs " + $inDim);
      }
      double $scale = java.lang.Math.sqrt((double) $outDim);
      double[] $out = new double[$outDim];
      for (int $j = 0; $j < $outDim; $j++) {
        double $acc = 0.0; int $base = $j * $inDim;
        for (int $i = 0; $i < $inDim; $i++) {
          $acc += ${g(s"$i")} * $sgnV.getDouble($base + $i);
        }
        $out[$j] = $acc / $scale;
      }
      ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """
    })

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
}

/** pq_dist_table(vec, codebook) → array<double> of m·k squared-L2
  * distances from each subvector to each codebook entry (sub-major). */
case class PqDistTable(left: Expression, right: Expression, m: Int, k: Int)
    extends PqKernelExpression {
  override def prettyName: String = "pq_dist_table"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(av: Any, bv: Any): Any = {
    val vec = av.asInstanceOf[ArrayData]
    val cb = bv.asInstanceOf[ArrayData]
    val d = vec.numElements() / m
    require(cb.numElements() == m * k * d,
      s"pq_dist_table: codebook length ${cb.numElements()} != ${m * k * d}")
    val out = new Array[Double](m * k)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < k) {
        var acc = 0.0; var t = 0; val base = (j * k + c) * d
        while (t < d) {
          val diff = getVec(vec, j * d + t) - cb.getDouble(base + t)
          acc += diff * diff; t += 1
        }
        out(j * k + c) = acc; c += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (vecV, cbV) => {
      val g = vecGetter(vecV)
      val (d, out, j, c, t, acc, base) =
        (ctx.freshName("d"), ctx.freshName("out"), ctx.freshName("j"),
          ctx.freshName("c"), ctx.freshName("t"), ctx.freshName("acc"),
          ctx.freshName("base"))
      s"""
      int $d = $vecV.numElements() / $m;
      if ($cbV.numElements() != $m * $k * $d) {
        throw new IllegalArgumentException("pq_dist_table: codebook length "
          + $cbV.numElements() + " != " + ($m * $k * $d));
      }
      double[] $out = new double[$m * $k];
      for (int $j = 0; $j < $m; $j++) {
        for (int $c = 0; $c < $k; $c++) {
          double $acc = 0.0; int $base = ($j * $k + $c) * $d;
          for (int $t = 0; $t < $d; $t++) {
            double diff = ${g(s"$j * $d + $t")} - $cbV.getDouble($base + $t);
            $acc += diff * diff;
          }
          $out[$j * $k + $c] = $acc;
        }
      }
      ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """
    })

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
}

/** pq_adc(dtable, codes) → Σ_j dtable[j·k + codes[j]] — the ADC score of
  * one candidate against one probe's distance table. */
case class PqAdc(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {
  override def prettyName: String = "pq_adc"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"pq_adc expects (array<double>, array<int>), got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
    }

  override def nullSafeEval(av: Any, bv: Any): Any = {
    val dtable = av.asInstanceOf[ArrayData]
    val codes = bv.asInstanceOf[ArrayData]
    val m = codes.numElements()
    // UnsafeArrayData reads are unchecked — a k/table mismatch (codes
    // from books trained with a different k) would otherwise return
    // silent garbage scores
    if (dtable.numElements() != m * k)
      throw new IllegalArgumentException(
        s"pq_adc: dtable length ${dtable.numElements()} != m*k ${m * k}")
    var acc = 0.0; var j = 0
    while (j < m) { acc += dtable.getDouble(j * k + codes.getInt(j)); j += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (dtV, cdV) => {
      val (j, mN) = (ctx.freshName("j"), ctx.freshName("mN"))
      s"""
      int $mN = $cdV.numElements();
      if ($dtV.numElements() != $mN * $k) {
        throw new IllegalArgumentException("pq_adc: dtable length "
          + $dtV.numElements() + " != m*k " + ($mN * $k));
      }
      ${ev.value} = 0.0;
      for (int $j = 0; $j < $mN; $j++) {
        ${ev.value} += $dtV.getDouble($j * $k + $cdV.getInt($j));
      }
      """
    })

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
}
