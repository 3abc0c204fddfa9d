package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Dense-bitmap distinct aggregate over a BOUNDED integer key domain —
  * the bitmap-index pattern (Druid/ClickHouse-style audience counting):
  * one bit per possible key, so a segment's "who was here" set is an
  * EXACT, mergeable, fixed-size value. Where [[KmvDistinct]] trades
  * exactness for unbounded domains and [[BloomAggLong]] answers only
  * membership, the bitmap answers distinct COUNT and set ALGEBRA
  * (overlap, union, difference between segments) exactly — the
  * audience-overlap matrix is a popcount over per-segment bitmaps
  * instead of a self-join of raw id rows.
  *
  * Scale posture: the buffer is `⌈domain/64⌉` longs PER GROUP, so the
  * operator is for surrogate-key domains (users, customers, items) that
  * fit a few MB — 10 M keys = 1.25 MB/group, merged bitwise by the
  * partial-agg tree, and the per-group result shipped ONCE. Keys
  * outside `[lo, hi]` fail LOUDLY in the update path, naming the
  * unbounded-domain alternative — silently dropping (or wrapping) a key
  * would corrupt every downstream popcount. The domain cap (2^27 bits =
  * 16 MB/group) is a loud guard too: past it, use kmv_distinct or a
  * compressed (roaring) container tier, which this file's fixed-width
  * word layout is the natural base for.
  *
  * Nulls are ignored, matching COUNT(DISTINCT) semantics.
  */
object BitmapIndex {
  val MaxDomainBits: Long = 1L << 27

  def nWords(lo: Long, hi: Long): Int = {
    require(hi >= lo, s"bitmap domain empty: [$lo, $hi]")
    val bits = hi - lo + 1
    require(bits <= MaxDomainBits,
      s"bitmap domain [$lo, $hi] is $bits bits > max $MaxDomainBits — " +
        "use kmv_distinct (approximate, unbounded) or shard the domain")
    ((bits + 63) / 64).toInt
  }

  def set(words: Array[Long], lo: Long, hi: Long, v: Long): Unit = {
    require(v >= lo && v <= hi,
      s"bitmap_agg: key $v outside the declared domain [$lo, $hi] — " +
        "widen the bounds or use kmv_distinct for unbounded keys")
    val bit = v - lo
    words((bit >>> 6).toInt) |= (1L << (bit & 63))
  }

  def popcount(words: Array[Byte]): Long = {
    // bytes are the raw little-endian words; popcount is per-byte, so
    // no long reassembly is needed
    var n = 0L
    var i = 0
    while (i < words.length) {
      n += java.lang.Integer.bitCount(words(i) & 0xff)
      i += 1
    }
    n
  }

  def toBytes(words: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(words.length * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.asLongBuffer().put(words)
    bb.array()
  }

  def fromBytes(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).asLongBuffer().get(out)
    out
  }

  def requireSameWidth(op: String, a: Array[Byte], b: Array[Byte]): Unit =
    require(a.length == b.length,
      s"$op: bitmaps of different domains (${a.length} vs ${b.length} " +
        "bytes) — both sides must be built with the same [lo, hi]")
}

/** bitmap_agg(key, lo, hi): aggregate → BINARY dense bitmap of the
  * distinct keys seen, one bit per value of `[lo, hi]`. Merge is
  * bitwise OR — associative/commutative, so map-side partials and AQE
  * behave like any built-in agg. */
case class BitmapAgg(child: Expression, lo: Long, hi: Long,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {
  private val words = BitmapIndex.nWords(lo, hi)

  override def prettyName: String = "bitmap_agg"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): Array[Long] = new Array[Long](words)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v match {
        case l: Long => l
        case i: Int => i.toLong
        case s: Short => s.toLong
        case b: Byte => b.toLong
        case other => throw new IllegalArgumentException(
          s"bitmap_agg expects an integer key, got $other")
      }
      BitmapIndex.set(buf, lo, hi, key)
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = BitmapIndex.toBytes(buf)
  override def serialize(buf: Array[Long]): Array[Byte] =
    BitmapIndex.toBytes(buf)
  override def deserialize(bytes: Array[Byte]): Array[Long] =
    BitmapIndex.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(o: Int): BitmapAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BitmapAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): Expression = copy(child = cs.head)
}

/** bitmap_count(bitmap): exact distinct count = popcount. Runs on
  * per-group AGGREGATED rows (one per segment), so interpreted eval is
  * off the hot path by construction. */
case class BitmapCount(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "bitmap_count"
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a binary bitmap, got " +
        child.dataType.catalogString)
  override protected def nullSafeEval(input: Any): Any =
    BitmapIndex.popcount(input.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(c: Expression): BitmapCount =
    copy(child = c)
}

/** bitmap_and_count(a, b): exact |A ∩ B| — the audience-overlap cell.
  * Width mismatch (bitmaps from different domains) fails loudly. */
case class BitmapAndCount(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def prettyName: String = "bitmap_and_count"
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (binary, binary), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    BitmapIndex.requireSameWidth(prettyName, x, y)
    var n = 0L
    var i = 0
    while (i < x.length) {
      n += java.lang.Integer.bitCount((x(i) & y(i)) & 0xff)
      i += 1
    }
    n
  }
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): BitmapAndCount = copy(left = l, right = r)
}

/** bitmap_or_count(a, b): exact |A ∪ B|. */
case class BitmapOrCount(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def prettyName: String = "bitmap_or_count"
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (binary, binary), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    BitmapIndex.requireSameWidth(prettyName, x, y)
    var n = 0L
    var i = 0
    while (i < x.length) {
      n += java.lang.Integer.bitCount((x(i) | y(i)) & 0xff)
      i += 1
    }
    n
  }
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): BitmapOrCount = copy(left = l, right = r)
}
