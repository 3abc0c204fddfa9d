package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Element-wise mean of a vector column as a `TypedImperativeAggregate`
  * (SURVEY §2C family, same tier as [[KmvDistinct]]).
  *
  * The centroid-update step of distributed k-means
  * ([[graft.operators.AnnSearch.kmeansCentroids]]) needs `mean(vector)`
  * per cluster. The HOF formulation (posexplode → groupBy(cluster, pos)
  * → re-assemble) costs TWO shuffle barriers per iteration and shuffles
  * `k × dim` rows; this aggregate does it in ONE partial-aggregating
  * shuffle moving `k` rows per map partition (each a (count, sums[dim])
  * buffer) — the map-side-combine shape that matters when an iteration
  * runs over 100 TB of vectors.
  *
  * Buffers merge by element-wise add — associative and commutative, so
  * AQE re-partitioning and retries behave like any built-in agg. Mean is
  * computed once at eval. Mixed dimensions fail loudly (a silent
  * truncation would corrupt every downstream centroid).
  */
case class VecMean(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[VecMean.Buf] {

  override def prettyName: String = "vec_mean"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  // lazy: child.dataType is unresolved while the SQL builder constructs us
  private lazy val elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"vec_mean expects array<float|double>, got $other")
  }

  override def createAggregationBuffer(): VecMean.Buf = new VecMean.Buf

  private def add(buf: VecMean.Buf, arr: ArrayData): Unit = {
    val n = arr.numElements()
    if (buf.sums == null) buf.sums = new Array[Double](n)
    else require(buf.sums.length == n,
      s"vec_mean: mixed vector dims ${buf.sums.length} vs $n")
    var i = 0
    if (elemIsFloat) while (i < n) { buf.sums(i) += arr.getFloat(i); i += 1 }
    else while (i < n) { buf.sums(i) += arr.getDouble(i); i += 1 }
    buf.count += 1L
  }

  override def update(buf: VecMean.Buf, input: InternalRow): VecMean.Buf = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[ArrayData])
    buf
  }

  override def merge(a: VecMean.Buf, b: VecMean.Buf): VecMean.Buf = {
    if (b.sums != null) {
      if (a.sums == null) { a.sums = b.sums; a.count = b.count }
      else {
        require(a.sums.length == b.sums.length,
          s"vec_mean: mixed vector dims ${a.sums.length} vs ${b.sums.length}")
        var i = 0
        while (i < a.sums.length) { a.sums(i) += b.sums(i); i += 1 }
        a.count += b.count
      }
    }
    a
  }

  override def eval(buf: VecMean.Buf): Any = {
    if (buf.sums == null || buf.count == 0L) null
    else {
      val out = new Array[Double](buf.sums.length)
      var i = 0
      while (i < out.length) { out(i) = buf.sums(i) / buf.count; i += 1 }
      new GenericArrayData(out)
    }
  }

  override def serialize(buf: VecMean.Buf): Array[Byte] = {
    val n = if (buf.sums == null) 0 else buf.sums.length
    val bb = ByteBuffer.allocate(8 + 4 + n * 8)
    bb.putLong(buf.count)
    bb.putInt(n)
    var i = 0
    while (i < n) { bb.putDouble(buf.sums(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VecMean.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new VecMean.Buf
    buf.count = bb.getLong
    val n = bb.getInt
    if (n > 0 || buf.count > 0) {
      buf.sums = new Array[Double](n)
      var i = 0
      while (i < n) { buf.sums(i) = bb.getDouble; i += 1 }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): VecMean =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VecMean =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): Expression = copy(child = cs.head)
}

object VecMean {
  /** Mutable (count, element-wise sums) accumulator. */
  final class Buf {
    var count: Long = 0L
    var sums: Array[Double] = _
  }
}
