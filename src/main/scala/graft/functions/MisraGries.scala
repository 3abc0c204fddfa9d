package graft.functions

import java.nio.charset.StandardCharsets
import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters summary as a `TypedImperativeAggregate` —
  * the deterministic-space frequent-items sketch (Misra & Gries 1982)
  * completing the sketch tier next to CMS (frequency estimates), KMV
  * (distinct counts), Bloom (membership), and LogHist (quantiles).
  *
  * Keeps at most `k` (key, counter) pairs. Guarantee: every key with true
  * frequency > n/(k+1) is present, and each reported counter
  * undercounts its true frequency by at most n/(k+1). CMS answers "how
  * often might x occur" for any x; MG answers "which items CAN be
  * frequent" with a candidate set bounded in SPACE, not hash-error — the
  * pre-pass a top-k term query wants at 100 TB (candidates from MG, exact
  * counts from one targeted re-scan).
  *
  * Buffers merge by counter addition followed by the (k+1)-th-largest
  * subtraction (Agarwal et al., Mergeable Summaries, PODS'12) — the merged
  * summary keeps the same error bound, so map-side partial aggregation
  * and AQE behave like any built-in agg.
  *
  * Determinism: counts below the eviction regime (≤ k distinct keys) are
  * EXACT and order-independent — the hash-gated regime. Under eviction
  * the candidate set depends on arrival order (inherent to MG); the
  * guarantee above is what's asserted (MisraGriesSpec), matching the
  * approx-family gate discipline (NOTES.md).
  *
  * Output: `array<struct<key string, count bigint>>` ordered by
  * (count desc, key asc) — a total order, so exact-regime output is
  * hashable cross-engine.
  */
case class MisraGries(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {
  require(k > 0, s"misra_gries needs k > 0, got $k")

  override def prettyName: String = "misra_gries"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("count", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.toString
      buf.get(key) match {
        case Some(c) => buf.update(key, c + 1)
        case None if buf.size < k => buf.update(key, 1L)
        case None =>
          // decrement-all step; k is a small constant (sketch parameter)
          val dead = mutable.ArrayBuffer.empty[String]
          buf.mapValuesInPlace((_, c) => c - 1)
          buf.foreach { case (kk, c) => if (c <= 0) dead += kk }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(a: mutable.HashMap[String, Long],
      b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (kk, c) => a.update(kk, a.getOrElse(kk, 0L) + c) }
    if (a.size > k) {
      // subtract the (k+1)-th largest counter, drop non-positives
      val counts = a.values.toArray.sortInPlace()(Ordering[Long].reverse)
      val sub = counts(k)
      val dead = mutable.ArrayBuffer.empty[String]
      a.mapValuesInPlace((_, c) => c - sub)
      a.foreach { case (kk, c) => if (c <= 0) dead += kk }
      dead.foreach(a.remove)
    }
    a
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val rows = buf.toArray.sortBy { case (kk, c) => (-c, kk) }
      .map { case (kk, c) =>
        InternalRow(UTF8String.fromString(kk), c) }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val keys = buf.toArray
    val bytes = keys.map(_._1.getBytes(StandardCharsets.UTF_8))
    val bb = ByteBuffer.allocate(
      4 + bytes.map(_.length + 12).sum)
    bb.putInt(keys.length)
    var i = 0
    while (i < keys.length) {
      bb.putInt(bytes(i).length)
      bb.put(bytes(i))
      bb.putLong(keys(i)._2)
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte])
      : mutable.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val kb = new Array[Byte](len)
      bb.get(kb)
      buf.update(new String(kb, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): MisraGries =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGries =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): Expression = copy(child = cs.head)
}
