package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mergeable quantile sketch over non-negative longs — the fourth member
  * of the sketch-aggregate tier (KMV = distinct, CMS = frequency, Bloom =
  * membership, LogHist = QUANTILE). HdrHistogram-style bucketing: values
  * below `2^subBits` are exact (one bucket per value); above, a bucket is
  * (power-of-2 exponent, top `subBits` mantissa bits), giving relative
  * error ≤ `2^-subBits` at every magnitude from one fixed, data-independent
  * layout — no per-batch rebalancing, unlike GK/t-digest, which is what
  * makes merges trivially associative+commutative (bucket-wise count adds).
  *
  * Everything is INTEGER BIT MATH (`numberOfLeadingZeros`, shifts) — no
  * libm, no doubles in the bucket key — so an external engine reproduces
  * the sketch cell-for-cell in SQL (the driver gate recomputes buckets via
  * binary-string length + shifts in DuckDB and hash-matches the estimates,
  * the [[CmsSketch]] gating recipe).
  *
  * The estimate for probe q is the LOWER BOUND of the bucket holding the
  * rank-⌈qN⌉ element: deterministic, integer, and ≤ the true quantile with
  * relative error ≤ `2^-subBits` (spec-asserted).
  *
  * At 100 TB: the buffer is ≤ `(64-subBits+1)·2^subBits` counters (~4k
  * longs at subBits=6) regardless of data volume; partial aggregation
  * runs map-side and the shuffle carries one small buffer per group.
  */
case class LogHistQuantiles(child: Expression, subBits: Int,
    probes: Seq[Double],
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashMap[Long, Long]] {
  require(subBits >= 1 && subBits <= 20,
    s"hist_quantiles needs subBits in [1,20], got $subBits")
  require(probes.nonEmpty && probes.forall(q => q >= 0.0 && q <= 1.0),
    s"hist_quantiles probes must lie in [0,1]: $probes")

  override def prettyName: String = "hist_quantiles"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private val mask = (1L << subBits) - 1L

  private[functions] def bucketId(v: Long): Long =
    if (v < (1L << subBits)) v
    else {
      val e = 63 - java.lang.Long.numberOfLeadingZeros(v)
      ((e - subBits + 1).toLong << subBits) + ((v >> (e - subBits)) & mask)
    }

  private[functions] def lowerBound(id: Long): Long =
    if (id < (1L << subBits)) id
    else {
      val block = id >>> subBits // = e - subBits + 1
      ((1L << subBits) + (id & mask)) << (block - 1)
    }

  override def createAggregationBuffer(): java.util.HashMap[Long, Long] =
    new java.util.HashMap[Long, Long]()

  override def update(buf: java.util.HashMap[Long, Long], input: InternalRow)
      : java.util.HashMap[Long, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v match {
        case l: Long => l
        case i: Int => i.toLong
        case s: Short => s.toLong
        case b: Byte => b.toLong
        case other => throw new IllegalArgumentException(
          s"hist_quantiles expects an integral column, got $other " +
            s"(${child.dataType}) — bucket boundaries are integer bit " +
            "math; scale fractional domains to fixed-point first " +
            "(e.g. cents)")
      }
      if (x < 0) throw new IllegalArgumentException(
        s"hist_quantiles is defined over non-negative values, got $x " +
          "(shift or split negative domains before sketching)")
      buf.merge(bucketId(x), 1L, (a, b) => a + b)
    }
    buf
  }

  override def merge(a: java.util.HashMap[Long, Long],
      b: java.util.HashMap[Long, Long]): java.util.HashMap[Long, Long] = {
    val it = b.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      a.merge(e.getKey, e.getValue, (x, y) => x + y)
    }
    a
  }

  override def eval(buf: java.util.HashMap[Long, Long]): Any = {
    var n = 0L
    val it0 = buf.values().iterator()
    while (it0.hasNext) n += it0.next()
    if (n == 0L) return new GenericArrayData(probes.map(_ => 0L).toArray)
    val ids = new Array[Long](buf.size)
    var i = 0
    val it1 = buf.keySet().iterator()
    while (it1.hasNext) { ids(i) = it1.next(); i += 1 }
    java.util.Arrays.sort(ids)
    val out = probes.map { q =>
      val rank = math.max(1L, math.ceil(q * n).toLong)
      var cum = 0L; var j = 0; var est = 0L; var found = false
      while (j < ids.length && !found) {
        cum += buf.get(ids(j))
        if (cum >= rank) { est = lowerBound(ids(j)); found = true }
        j += 1
      }
      est
    }.toArray
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.HashMap[Long, Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putLong(e.getKey); bb.putLong(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte])
      : java.util.HashMap[Long, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.put(bb.getLong, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): LogHistQuantiles =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): LogHistQuantiles =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): Expression = copy(child = cs.head)
}
