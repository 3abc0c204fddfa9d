package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** The [[graft.operators.Hll]] sketch as a `TypedImperativeAggregate` —
  * `hll_distinct(key)` usable like any aggregate (`groupBy(lang)
  * .agg(...)`, windowed streaming state, rollups), completing the
  * sketch-aggregate tier next to KMV/CMS/LogHist/MisraGries.
  *
  * Contract: IDENTICAL integer parts to the DataFrame-level operator —
  * the hash is the md5 recipe (`md5("hll_" ++ key)` first 8 hex chars
  * as an unsigned 32-bit value), registers are max(rho), and `eval`
  * replays the exact estimator chain of `Hll.estimateFromRegisters`
  * (linear counting / raw α·m²/S / large-range collision correction /
  * loud saturation), so a DuckDB oracle that rebuilds the operator
  * form predicts THIS aggregate's output bit-for-bit (modulo the
  * documented ln-ulp class, absorbed by the shared 6dp rounding).
  *
  * Buffer = 256 register bytes; merge = pointwise max (associative,
  * commutative — map-side partials and AQE replans behave like any
  * built-in agg). The input must be STRING (cast at the call site —
  * the cast IS part of the cross-engine hash contract).
  */
case class HllDistinct(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

  import HllDistinct._

  override def prettyName: String = "hll_distinct"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(
        s"hll_distinct needs a STRING key (cast first — the cast is " +
          s"part of the hash contract), got ${child.dataType}")

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](M)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = hash32(v.toString)
      val bucket = (h >>> SuffixBits).toInt
      val suffix = h & SuffixMask
      val rho = if (suffix == 0L) MaxRho
        else MaxRho - (64 - java.lang.Long.numberOfLeadingZeros(suffix))
      if (rho > buf(bucket)) buf(bucket) = rho.toByte
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < M) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any = {
    var nonEmpty = 0
    var sScaled = 0L
    var i = 0
    while (i < M) {
      val r = buf(i).toInt
      if (r > 0) { nonEmpty += 1; sScaled += 1L << (MaxRho - r) }
      else sScaled += 1L << MaxRho
      i += 1
    }
    val vZero = M - nonEmpty
    val raw = Alpha * Mm2Scaled / sScaled.toDouble
    val est =
      if (raw <= 2.5 * M && vZero > 0)
        M.toDouble * math.log(M.toDouble / vZero.toDouble)
      else if (raw >= 4294967296.0)
        throw new IllegalStateException(
          "hll_distinct: raw estimate at the 32-bit hash ceiling — " +
            "the sketch is saturated; shard the keyspace or use a " +
            "wider-hash tier")
      else if (raw > 4294967296.0 / 30.0)
        -4294967296.0 * math.log(1.0 - raw / 4294967296.0)
      else raw
    java.math.BigDecimal.valueOf(est)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(o: Int): HllDistinct =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllDistinct =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): Expression = copy(child = cs.head)
}

object HllDistinct {
  /** Mirrors [[graft.operators.Hll]]: P = 8 (m = 256), 32-bit md5
    * hash, rho ∈ [1, 25]. */
  val M = 256
  private val SuffixBits = 24
  private val SuffixMask = (1L << SuffixBits) - 1
  private val MaxRho = SuffixBits + 1
  private val Alpha = 0.7213 / (1.0 + 1.079 / M)
  private val Mm2Scaled = M.toDouble * M * (1L << MaxRho).toDouble

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 8 hex chars of md5("hll_" ++ key) as an unsigned 32-bit
    * value — byte-identical to the SQL recipe
    * `conv(substring(md5(concat('hll_', key)), 1, 8), 16, 10)`. */
  def hash32(key: String): Long = {
    val d = md5.get()
    d.reset()
    val bytes = d.digest(("hll_" + key).getBytes("UTF-8"))
    ((bytes(0) & 0xffL) << 24) | ((bytes(1) & 0xffL) << 16) |
      ((bytes(2) & 0xffL) << 8) | (bytes(3) & 0xffL)
  }
}
