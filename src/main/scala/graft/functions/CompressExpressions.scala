package graft.functions

import java.util.zip.Deflater

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compressibility kernel — the quality signal behind the Gopher-class
  * "compression ratio" filter: near-duplicate boilerplate and template
  * spam deflate to almost nothing, while binary noise and hash dumps
  * barely deflate at all; natural prose sits in a stable mid band. The
  * RATIO (deflated/raw bytes) is the feature; both extremes get
  * filtered.
  *
  * One ThreadLocal `Deflater` (zlib level 6, reset per value) — no
  * allocation per row, native codegen call site, map-only. The exact
  * byte count is JVM-zlib-specific, so driver gates classify planted
  * extremes (closed-form flags) rather than hash raw lengths; the spec
  * pins the monotonic contract (repetition < prose < noise).
  */
object CompressExpressions {

  private val deflater = ThreadLocal.withInitial[Deflater](() =>
    new Deflater(6, false))

  def deflatedLen(bytes: Array[Byte]): Int = {
    val d = deflater.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0
    while (!d.finished()) total += d.deflate(buf)
    total
  }

  def deflatedLenUtf8(s: UTF8String): Int = deflatedLen(s.getBytes)
}

/** deflate_len(string|binary) -> int: zlib-deflated byte count. */
case class DeflateLen(child: Expression) extends UnaryExpression {
  override def prettyName: String = "deflate_len"
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"deflate_len expects string or binary, got ${t.catalogString}")
    }

  private lazy val fromString = child.dataType == StringType

  override def nullSafeEval(v: Any): Any =
    if (fromString)
      CompressExpressions.deflatedLenUtf8(v.asInstanceOf[UTF8String])
    else CompressExpressions.deflatedLen(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val fn = if (fromString) "deflatedLenUtf8" else "deflatedLen"
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CompressExpressions.$fn($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
