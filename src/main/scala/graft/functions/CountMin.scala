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

/** Count-min sketch over a string column — the frequency-estimation
  * member of the sketch-aggregate tier ([[KmvDistinct]] = distinct
  * count, [[VecMean]] = vector mean, this = item frequency). At 100 TB
  * an exact token-frequency table costs a token-cardinality shuffle;
  * the sketch is `depth × width` longs per group with map-side partial
  * merge (element-wise add — associative and commutative), and the
  * point estimate `min_r(cells[r])` is one-sided: never below the true
  * count, above it only on hash collisions (ε ≈ e/width with
  * probability 1−(1/e)^depth).
  *
  * The cell hash is the repo's cross-engine md5 recipe
  * ([[graft.operators.Splits.bucketOfKey]]): first 8 hex chars of
  * `md5("cms<row>_<item>")` as a long, mod width — so a DuckDB oracle
  * rebuilds the ENTIRE sketch cell-for-cell and the driver gate
  * hash-matches estimates exactly (no tolerance, no planted twin).
  */
/** Shared md5-cell kernel for the sketch tier ([[CmsSketch]],
  * [[BloomAgg]]): first 4 md5 bytes of `"<salt><row>_<item>"` as an
  * unsigned int. One ThreadLocal digest instance — `MessageDigest
  * .getInstance` per call dominated the sketch update cost in the 32×
  * drill (millions of hashes per partition). */
private[functions] object Md5Cell {
  private val md = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  def of(salt: String, r: Int, item: UTF8String): Long = {
    val m = md.get()
    m.reset()
    val d = m.digest(
      (salt + r + "_" + item.toString).getBytes(StandardCharsets.UTF_8))
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }
}

object CountMin {
  /** Cell index of `item` in sketch row `r` — the md5 recipe shared
    * verbatim with the SQL oracle: ('0x' || substr(md5(…),1,8))::BIGINT. */
  def cellOf(r: Int, item: UTF8String, width: Int): Int =
    (Md5Cell.of("cms", r, item) % width).toInt
}

/** cms_sketch(item, width, depth): aggregate → array<long> of
  * depth×width counters (row-major). */
case class CmsSketch(child: Expression, width: Int, depth: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {
  require(width > 0, s"cms_sketch width must be positive, got $width")
  require(depth > 0, s"cms_sketch depth must be positive, got $depth")

  override def prettyName: String = "cms_sketch"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      var r = 0
      while (r < depth) {
        buf(r * width + CountMin.cellOf(r, s, width)) += 1L
        r += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
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

  override def withNewMutableAggBufferOffset(o: Int): CmsSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CmsSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): Expression = copy(child = cs.head)
}

/** cms_query(sketch, item, width, depth): point estimate — min over the
  * depth rows of the item's cell counts. One-sided: ≥ the true count. */
case class CmsQuery(left: Expression, right: Expression,
    width: Int, depth: Int)
    extends BinaryExpression with CodegenFallback {
  require(width > 0 && depth > 0, "cms_query needs positive width/depth")
  override def prettyName: String = "cms_query"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), StringType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cms_query expects (array<bigint>, string), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(sk: Any, item: Any): Any = {
    val cells = sk.asInstanceOf[ArrayData]
    require(cells.numElements() == width * depth,
      s"cms_query: sketch has ${cells.numElements()} cells, " +
        s"expected $width*$depth — width/depth must match the build")
    val s = item.asInstanceOf[UTF8String]
    var best = Long.MaxValue
    var r = 0
    while (r < depth) {
      val c = cells.getLong(r * width + CountMin.cellOf(r, s, width))
      if (c < best) best = c
      r += 1
    }
    best
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(left = l, right = r)
}

/** cms_inner(a, b, width, depth): JOIN-SIZE estimate from two sketches
  * over the join keys — `min_r Σ_c a[r,c]·b[r,c]`, the count-min
  * inner-product estimator (Cormode & Muthukrishnan '05 §4.2):
  * `|A ⋈ B| = Σ_k f_A(k)·f_B(k)` and each row's dot product
  * overestimates it only by collision mass, so the min over rows is
  * one-sided ≥ the true join cardinality. The pre-shuffle answer to
  * "can this 100 TB join possibly fit / should it be salted" — two
  * map-side sketch aggregations instead of running the join. Both
  * sketches must share (width, depth) and the md5 cell recipe, which
  * the DuckDB oracle rebuilds cell-for-cell — estimates (including
  * collision inflation) hash-match exactly. */
case class CmsInnerProduct(left: Expression, right: Expression,
    width: Int, depth: Int)
    extends BinaryExpression with CodegenFallback {
  require(width > 0 && depth > 0, "cms_inner needs positive width/depth")
  override def prettyName: String = "cms_inner"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cms_inner expects two array<bigint> sketches, got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val ca = a.asInstanceOf[ArrayData]
    val cb = b.asInstanceOf[ArrayData]
    require(ca.numElements() == width * depth &&
      cb.numElements() == width * depth,
      s"cms_inner: sketches have ${ca.numElements()}/${cb.numElements()}" +
        s" cells, expected $width*$depth — width/depth must match")
    var best = Long.MaxValue
    var r = 0
    while (r < depth) {
      var dot = 0L
      var c = 0
      while (c < width) {
        val i = r * width + c
        dot += ca.getLong(i) * cb.getLong(i)
        c += 1
      }
      if (dot < best) best = dot
      r += 1
    }
    best
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(left = l, right = r)
}
