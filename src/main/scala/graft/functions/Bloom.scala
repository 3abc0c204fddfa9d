package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bloom filter over a string column — the set-MEMBERSHIP member of the
  * sketch-aggregate tier ([[KmvDistinct]] = distinct count, [[VecMean]] =
  * vector mean, [[CmsSketch]] = item frequency, this = membership). The
  * at-scale use is join-free decontamination: a benchmark's n-gram set
  * compresses to `m` bits that BROADCAST to every executor, so probing
  * 100 TB of corpus n-grams is a map-only scan — no shuffle of corpus
  * keys at all, where even the hashed-join tier moves 8 bytes per n-gram.
  * Membership is one-sided: `false` is certain, `true` is wrong only on
  * collisions (fp ≈ (1−e^{−k·n/m})^k).
  *
  * Bit positions use the repo's cross-engine md5 recipe
  * ([[graft.operators.Splits.bucketOfKey]]): first 8 hex chars of
  * `md5("bf<j>_<item>")` as a long, mod `mBits`, for hash rows
  * j = 0..k−1 — so a DuckDB oracle reproduces the EXACT bit set and the
  * driver gate hash-matches probe verdicts including false positives
  * (no tolerance, no planted twin).
  */
object Bloom {
  /** Bit index of `item` under hash row `j` — shared verbatim with the
    * SQL oracle: ('0x' || substr(md5('bf<j>_<item>'),1,8))::BIGINT % m. */
  def bitOf(j: Int, item: UTF8String, mBits: Int): Int = {
    val md = MessageDigest.getInstance("MD5")
    val d = md.digest(
      (s"bf${j}_" + item.toString).getBytes(StandardCharsets.UTF_8))
    val v = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    (v % mBits).toInt
  }
}

/** bloom_agg(item, mBits, k): aggregate → array<long> of ⌈mBits/64⌉
  * words (little-endian bit order within each word). */
case class BloomAgg(child: Expression, mBits: Int, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {
  require(mBits > 0, s"bloom_agg mBits must be positive, got $mBits")
  require(k > 0, s"bloom_agg k must be positive, got $k")

  override def prettyName: String = "bloom_agg"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long]((mBits + 63) / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      var j = 0
      while (j < k) {
        val bit = Bloom.bitOf(j, s, mBits)
        buf(bit >>> 6) |= (1L << (bit & 63))
        j += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < buf.length) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): BloomAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): Expression = copy(child = cs.head)
}

/** bloom_contains(filter, item, mBits, k): true iff all k bit positions
  * of `item` are set. One-sided: false is certain non-membership. */
case class BloomContains(left: Expression, right: Expression,
    mBits: Int, k: Int)
    extends BinaryExpression with CodegenFallback {
  require(mBits > 0 && k > 0, "bloom_contains needs positive mBits/k")
  override def prettyName: String = "bloom_contains"
  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), StringType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bloom_contains expects (array<bigint>, string), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(f: Any, item: Any): Any = {
    val words = f.asInstanceOf[ArrayData]
    require(words.numElements() == (mBits + 63) / 64,
      s"bloom_contains: filter has ${words.numElements()} words, " +
        s"expected ${(mBits + 63) / 64} — mBits must match the build")
    val s = item.asInstanceOf[UTF8String]
    var j = 0
    while (j < k) {
      val bit = Bloom.bitOf(j, s, mBits)
      if ((words.getLong(bit >>> 6) & (1L << (bit & 63))) == 0L)
        return false
      j += 1
    }
    true
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(left = l, right = r)
}
