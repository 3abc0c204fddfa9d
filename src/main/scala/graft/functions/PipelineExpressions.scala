package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SQL-callable kernels for the round-4 pipeline operators (clustering,
  * chunking, line-dedup segmentation, int8 quantization) — the
  * `spark.sql(...)` parity surface. Each reproduces its DataFrame
  * operator's row-level semantics EXACTLY (SqlSurfaceSpec asserts
  * agreement against the operators on real rows); the multi-row parts
  * (k-means training, duplicate-frequency aggregation) compose from
  * plain SQL (`GROUP BY` + `purge_positions` + `vec_mean`), so a SQL
  * user can express the whole pipeline.
  *
  * Eval-based with CodegenFallback: these are the SQL-parity forms; the
  * DataFrame operators stay on their codegen'd HOF/native paths.
  */
object PipelineExpressions {

  /** Tokenization shared by chunk_windows/segment_tokens — MUST match
    * `filter(split(lower(text), " "), length(_) > 0)` used by
    * [[graft.operators.Chunking.slidingWindows]] and
    * [[graft.operators.LineDedup.segmentByTokens]]. */
  private[functions] def tokensOf(text: UTF8String): Array[UTF8String] =
    text.toLowerCase.split(UTF8String.fromString(" "), -1)
      .filter(_.numBytes() > 0)

  private[functions] def elemAt(a: ArrayData, i: Int, t: DataType): Double =
    t match {
      case FloatType => a.getFloat(i).toDouble
      case _ => a.getDouble(i)
    }

  private[functions] def vecArrayType(t: DataType, fn: String)
      : TypeCheckResult = t match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$fn expects array<float|double>, got ${other.catalogString}")
  }
}

/** vec_quant8(vec): symmetric int8 quantization —
  * struct(sq_scale double, sq_codes array<int>), the
  * [[graft.operators.VectorQuant.quantize]] contract: scale = max|x|/127,
  * code = ⌊x/scale + 0.5⌋; a zero vector gets scale 0, all-zero codes. */
case class VecQuant8(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "vec_quant8"
  override def dataType: DataType = StructType(Seq(
    StructField("sq_scale", DoubleType, nullable = false),
    StructField("sq_codes", ArrayType(IntegerType, containsNull = false))))

  override def checkInputDataTypes(): TypeCheckResult =
    PipelineExpressions.vecArrayType(child.dataType, prettyName)

  private lazy val elemType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      val x = math.abs(PipelineExpressions.elemAt(arr, i, elemType))
      if (x > maxAbs) maxAbs = x
      i += 1
    }
    val scale = maxAbs / 127d
    val codes = new Array[Int](n)
    if (scale != 0d) {
      i = 0
      while (i < n) {
        codes(i) = math.floor(
          PipelineExpressions.elemAt(arr, i, elemType) / scale + 0.5d).toInt
        i += 1
      }
    }
    val out = new GenericInternalRow(2)
    out.update(0, scale)
    out.update(1, new GenericArrayData(codes))
    out
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** vec_dequant8(codes, scale): reconstruction `code · scale` per
  * dimension ([[graft.operators.VectorQuant.dequantize]]). */
case class VecDequant8(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def prettyName: String = "vec_dequant8"
  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType | LongType, _), DoubleType | FloatType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"vec_dequant8 expects (array<int>, double), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  private lazy val codeIsLong =
    left.dataType.asInstanceOf[ArrayType].elementType == LongType
  private lazy val scaleIsFloat = right.dataType == FloatType

  override def nullSafeEval(cv: Any, sv: Any): Any = {
    val codes = cv.asInstanceOf[ArrayData]
    val scale =
      if (scaleIsFloat) sv.asInstanceOf[Float].toDouble
      else sv.asInstanceOf[Double]
    val n = codes.numElements()
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      val c = if (codeIsLong) codes.getLong(i).toDouble
              else codes.getInt(i).toDouble
      out(i) = c * scale
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(l, r)
}

/** segment_tokens(text, width): consecutive `width`-token windows of the
  * single-space tokenization, last one ragged; empty docs → empty array
  * ([[graft.operators.LineDedup.segmentByTokens]]). */
case class SegmentTokens(child: Expression, width: Int)
    extends UnaryExpression with CodegenFallback {
  require(width >= 1, s"segment_tokens width must be >= 1, got $width")
  override def prettyName: String = "segment_tokens"
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"segment_tokens expects string, got ${t.catalogString}")
    }

  override def nullSafeEval(v: Any): Any = {
    val toks = PipelineExpressions.tokensOf(v.asInstanceOf[UTF8String])
    val sepB = UTF8String.fromString(" ")
    val n = toks.length
    val nw = (n + width - 1) / width
    val out = new Array[UTF8String](nw)
    var k = 0
    while (k < nw) {
      val from = k * width
      val until = math.min(from + width, n)
      out(k) = UTF8String.concatWs(sepB, toks.slice(from, until): _*)
      k += 1
    }
    new GenericArrayData(out.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** chunk_windows(text, width, stride): the GENERATOR form of
  * [[graft.operators.Chunking.slidingWindows]] — one row per overlapping
  * token-window chunk: (chunk_id, start_pos, n_chunk_tokens, chunk_text).
  * Empty docs yield no rows. */
case class ChunkWindows(child: Expression, width: Int, stride: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.Generator
    with CodegenFallback {
  require(width >= 1, s"chunk width must be >= 1, got $width")
  require(stride >= 1 && stride <= width,
    s"stride must be in [1, width]: stride=$stride width=$width")
  override def prettyName: String = "chunk_windows"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"chunk_windows expects string, got ${t.catalogString}")
    }

  override def elementSchema: StructType = StructType(Seq(
    StructField("chunk_id", IntegerType, nullable = false),
    StructField("start_pos", IntegerType, nullable = false),
    StructField("n_chunk_tokens", IntegerType, nullable = false),
    StructField("chunk_text", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Iterator.empty
    val toks = PipelineExpressions.tokensOf(v.asInstanceOf[UTF8String])
    val n = toks.length
    if (n == 0) return Iterator.empty
    val sepB = UTF8String.fromString(" ")
    val nChunks = ((n + stride - 1) / stride)
    val row = new GenericInternalRow(4)
    (0 until nChunks).iterator.map { k =>
      val from = k * stride
      val until = math.min(from + width, n)
      row.update(0, k)
      row.update(1, from)
      row.update(2, until - from)
      row.update(3, UTF8String.concatWs(sepB, toks.slice(from, until): _*))
      row
    }
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** cluster_assign(vec, cents): argmax-cosine assignment against a
  * collected centroid array — struct(centroid_id long, sim double),
  * the [[graft.operators.AnnSearch.argmaxCentroid]] determinism
  * contract: highest cosine, ties to the LARGEST centroid_id;
  * order-independent over the array. `cents` is
  * array<struct(centroid_id bigint, centvec array<double>)> — the shape
  * `collect_list(struct(centroid_id, centvec))` produces from a
  * vec_mean/GROUP BY centroid table. */
case class ClusterAssign(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def prettyName: String = "cluster_assign"
  override def dataType: DataType = StructType(Seq(
    StructField("centroid_id", LongType, nullable = false),
    StructField("sim", DoubleType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = {
    val vecOk = PipelineExpressions.vecArrayType(left.dataType, prettyName)
    if (vecOk != TypeCheckResult.TypeCheckSuccess) return vecOk
    right.dataType match {
      case ArrayType(st: StructType, _)
          if st.fieldNames.contains("centroid_id")
            && st.fieldNames.contains("centvec") =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        "cluster_assign expects array<struct<centroid_id, centvec>>, got "
          + t.catalogString)
    }
  }

  private lazy val vecElemType =
    left.dataType.asInstanceOf[ArrayType].elementType
  private lazy val centStruct = right.dataType
    .asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
  private lazy val idIdx = centStruct.fieldIndex("centroid_id")
  private lazy val vecIdx = centStruct.fieldIndex("centvec")
  private lazy val centElemType = centStruct(vecIdx)
    .dataType.asInstanceOf[ArrayType].elementType

  /** dot/(|a||b|), 0 for zero vectors — the CosineSimilarity kernel,
    * including its loud dimension-mismatch contract. */
  private def cosine(a: ArrayData, b: ArrayData): Double = {
    if (a.numElements() != b.numElements())
      throw new IllegalArgumentException(
        s"$prettyName: dimension mismatch " +
          s"(${a.numElements()} vs ${b.numElements()})")
    val n = a.numElements()
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = PipelineExpressions.elemAt(a, i, vecElemType)
      val y = PipelineExpressions.elemAt(b, i, centElemType)
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  override def nullSafeEval(vv: Any, cv: Any): Any = {
    val vec = vv.asInstanceOf[ArrayData]
    val cents = cv.asInstanceOf[ArrayData]
    var bestSim = Double.NegativeInfinity
    var bestId = Long.MinValue
    var i = 0
    val nc = cents.numElements()
    while (i < nc) {
      val c = cents.getStruct(i, centStruct.length)
      val cid = c.getLong(idIdx)
      val cvec = c.getArray(vecIdx)
      val sim = cosine(vec, cvec)
      if (sim > bestSim || (sim == bestSim && cid > bestId)) {
        bestSim = sim; bestId = cid
      }
      i += 1
    }
    val out = new GenericInternalRow(2)
    out.update(0, bestId)
    out.update(1, bestSim)
    out
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(l, r)
}

/** sentence_split(text): sentences split on terminator runs (`[.!?]+`
  * followed by one space, which is consumed) — byte-identical to the
  * capture-and-reemit regexp form [[graft.operators.Chunking.sentences]]
  * documents, with empty fragments dropped. SQL-parity kernel. */
case class SentenceSplit(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "sentence_split"
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"sentence_split expects string, got ${t.catalogString}")
    }

  private def isTerm(b: Byte): Boolean =
    b == '.'.toByte || b == '!'.toByte || b == '?'.toByte

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].getBytes // UTF-8; terminators ASCII
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var start = 0
    var i = 0
    while (i < s.length) {
      if (isTerm(s(i))) {
        var j = i
        while (j + 1 < s.length && isTerm(s(j + 1))) j += 1
        if (j + 1 < s.length && s(j + 1) == ' '.toByte) {
          // sentence = [start, j]; the single following space is consumed
          if (j + 1 > start)
            out += UTF8String.fromBytes(s, start, j + 1 - start)
          start = j + 2
        }
        i = j + 1
      } else i += 1
    }
    if (s.length > start)
      out += UTF8String.fromBytes(s, start, s.length - start)
    new GenericArrayData(out.toArray[Any])
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** greedy_chunks(counts, max_tokens): per-element chunk ids of the
  * greedy no-straddle merge — element i joins the open chunk while the
  * running total stays <= max_tokens, else opens the next chunk (the
  * first element always joins chunk 1). The fold behind
  * [[graft.operators.Chunking.sentences]], exposed for SQL users. */
case class GreedyChunks(child: Expression, maxTokens: Int)
    extends UnaryExpression with CodegenFallback {
  require(maxTokens >= 1, s"greedy_chunks max must be >= 1, got $maxTokens")
  override def prettyName: String = "greedy_chunks"
  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"greedy_chunks expects array<int>, got ${t.catalogString}")
    }

  override def nullSafeEval(v: Any): Any = {
    val counts = v.asInstanceOf[ArrayData]
    val n = counts.numElements()
    val out = new Array[Int](n)
    var acc = 0; var cid = 1; var i = 0
    while (i < n) {
      val c = counts.getInt(i)
      if (acc > 0 && acc + c > maxTokens) { cid += 1; acc = c }
      else acc += c
      out(i) = cid
      i += 1
    }
    new GenericArrayData(out.map(Int.box).asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
