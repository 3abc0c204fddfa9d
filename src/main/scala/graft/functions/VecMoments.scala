package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Quantized second-moment (outer-product) accumulator for a vector
  * column — the [[VecMean]] family member behind
  * [[graft.operators.EmbedStats.covariance]] (r14, replacing its first
  * d²-explode formulation): per partition, ONE buffer of exact longs
  * `[n, Σxq_i (d), Σxq_i·xq_j (upper triangle)]` over components
  * snapped to the 1/grid lattice. The map side does d(d+1)/2 long
  * multiply-adds per row and the shuffle moves ONE buffer per map
  * partition — versus the explode form's d² rows per input row
  * (measured 101 s → the scan floor at 32×).
  *
  * Exactness: quantized components are exact longs, so every
  * accumulated sum is exact and merge is plain addition — associative,
  * commutative, retry-safe. Overflow bound: |xq| ≤ maxAbsQ keeps the
  * cross sums safe up to 2⁶³/maxAbsQ² rows (512 ⇒ ~3.5·10¹³ rows) —
  * ENFORCED in add(): a component that quantizes beyond the bound
  * (one corrupt 1e12 entry would silently wrap `q(i)*q(j)`) raises
  * loudly, as do NULL components (ArrayData.getFloat would silently
  * read them as 0.0 and bias every moment) and mixed dimensions.
  *
  * Output: `array<long>` of `2 + d + d(d+1)/2` —
  * `[n, d, sums…, upper-triangle cross sums (row-major)]`. */
case class VecMoments(child: Expression, grid: Int,
    maxAbsQ: Long = 512L,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[VecMoments.Buf] {

  override def prettyName: String = "vec_moments"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private lazy val elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"vec_moments expects array<float|double>, got $other")
  }

  override def createAggregationBuffer(): VecMoments.Buf =
    new VecMoments.Buf

  private def add(buf: VecMoments.Buf, arr: ArrayData): Unit = {
    val d = arr.numElements()
    if (buf.sums == null) {
      buf.sums = new Array[Long](d)
      buf.cross = new Array[Long](d * (d + 1) / 2)
    } else require(buf.sums.length == d,
      s"vec_moments: mixed vector dims ${buf.sums.length} vs $d")
    val q = new Array[Long](d)
    var i = 0
    while (i < d) {
      if (arr.isNullAt(i)) throw new IllegalArgumentException(
        s"vec_moments: NULL component at index $i — getFloat would " +
          "silently read it as 0.0 and bias the moments; drop or " +
          "impute first")
      val x = if (elemIsFloat) arr.getFloat(i).toDouble
        else arr.getDouble(i)
      val xq = math.floor(x * grid + 0.5)
      if (!(math.abs(xq) <= maxAbsQ.toDouble))
        throw new IllegalArgumentException(
          s"vec_moments: component $x quantizes to $xq beyond the " +
            s"exactness bound |xq| <= $maxAbsQ — the long cross sums " +
            "would silently wrap; clean the embedding or raise maxAbsQ")
      q(i) = xq.toLong
      i += 1
    }
    var k = 0
    i = 0
    while (i < d) {
      buf.sums(i) += q(i)
      var j = i
      while (j < d) { buf.cross(k) += q(i) * q(j); j += 1; k += 1 }
      i += 1
    }
    buf.n += 1L
  }

  override def update(buf: VecMoments.Buf, input: InternalRow)
      : VecMoments.Buf = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[ArrayData])
    buf
  }

  override def merge(a: VecMoments.Buf, b: VecMoments.Buf)
      : VecMoments.Buf = {
    if (b.sums != null) {
      if (a.sums == null) { a.sums = b.sums; a.cross = b.cross; a.n = b.n }
      else {
        require(a.sums.length == b.sums.length,
          s"vec_moments: mixed vector dims ${a.sums.length} vs " +
            s"${b.sums.length}")
        var i = 0
        while (i < a.sums.length) { a.sums(i) += b.sums(i); i += 1 }
        i = 0
        while (i < a.cross.length) { a.cross(i) += b.cross(i); i += 1 }
        a.n += b.n
      }
    }
    a
  }

  override def eval(buf: VecMoments.Buf): Any = {
    if (buf.sums == null || buf.n == 0L) null
    else {
      val d = buf.sums.length
      val out = new Array[Long](2 + d + buf.cross.length)
      out(0) = buf.n
      out(1) = d.toLong
      System.arraycopy(buf.sums, 0, out, 2, d)
      System.arraycopy(buf.cross, 0, out, 2 + d, buf.cross.length)
      new GenericArrayData(out)
    }
  }

  override def serialize(buf: VecMoments.Buf): Array[Byte] = {
    val d = if (buf.sums == null) 0 else buf.sums.length
    val c = if (buf.cross == null) 0 else buf.cross.length
    val bb = ByteBuffer.allocate(8 + 4 + 4 + (d + c) * 8)
    bb.putLong(buf.n)
    bb.putInt(d)
    bb.putInt(c)
    var i = 0
    while (i < d) { bb.putLong(buf.sums(i)); i += 1 }
    i = 0
    while (i < c) { bb.putLong(buf.cross(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VecMoments.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new VecMoments.Buf
    buf.n = bb.getLong
    val d = bb.getInt
    val c = bb.getInt
    if (d > 0) {
      buf.sums = new Array[Long](d)
      buf.cross = new Array[Long](c)
      var i = 0
      while (i < d) { buf.sums(i) = bb.getLong; i += 1 }
      i = 0
      while (i < c) { buf.cross(i) = bb.getLong; i += 1 }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): VecMoments =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VecMoments =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): Expression = copy(child = cs.head)
}

object VecMoments {
  /** Mutable (n, sums[d], upper-triangle cross[d(d+1)/2]) accumulator. */
  final class Buf {
    var n: Long = 0L
    var sums: Array[Long] = _
    var cross: Array[Long] = _
  }
}
