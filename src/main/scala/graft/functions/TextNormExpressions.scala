package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode canonicalization kernels — the missing normalization step in
  * front of every digest-keyed text operator: "Café" composed (U+00E9)
  * and decomposed (e + U+0301) are byte-different strings that
  * [[graft.operators.Dedup]]'s content hashing, [[graft.operators
  * .LineDedup]], and decontamination n-grams all treat as distinct
  * unless the corpus is normalized first. Spark ships NO normalizer
  * builtin; these are native codegen expressions (one static-call site,
  * whole-stage-codegen friendly, no UDF boxing).
  *
  * Cross-engine contract: `utf8_normalize(s, 'NFC')` ≡ DuckDB
  * `nfc_normalize(s)` and `strip_accents(s)` ≡ DuckDB `strip_accents`
  * on Latin text (both are NFD + drop combining marks) — so the driver
  * gate hash-matches digests of normalized text. NFKC/NFKD (compat
  * forms: ligatures, full-width, superscripts) have no DuckDB twin and
  * are spec-gated instead.
  */
object TextNormExpressions {

  def normalizeOf(s: UTF8String, form: Normalizer.Form): UTF8String =
    UTF8String.fromString(Normalizer.normalize(s.toString, form))

  private val marks = "\\p{Mn}+".r

  /** NFD-decompose, drop all combining marks, re-compose. */
  def stripAccentsOf(s: UTF8String): UTF8String = {
    val nfd = Normalizer.normalize(s.toString, Normalizer.Form.NFD)
    UTF8String.fromString(
      Normalizer.normalize(marks.replaceAllIn(nfd, ""), Normalizer.Form.NFC))
  }
}

/** utf8_normalize(string, 'NFC'|'NFD'|'NFKC'|'NFKD') -> string. */
case class Utf8Normalize(child: Expression, formName: String)
    extends UnaryExpression {
  private val form: Normalizer.Form =
    try Normalizer.Form.valueOf(formName.toUpperCase)
    catch { case _: IllegalArgumentException =>
      throw new IllegalArgumentException(
        s"utf8_normalize: unknown form '$formName' " +
          "(expected NFC, NFD, NFKC, or NFKD)") }

  override def prettyName: String = "utf8_normalize"
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"utf8_normalize expects string, got ${t.catalogString}")
    }

  override def nullSafeEval(v: Any): Any =
    TextNormExpressions.normalizeOf(v.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.TextNormExpressions.normalizeOf(
         |  $c, java.text.Normalizer.Form.${form.name()});""".stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** strip_accents(string) -> string: NFD + drop combining marks + NFC. */
case class StripAccents(child: Expression) extends UnaryExpression {
  override def prettyName: String = "strip_accents"
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"strip_accents expects string, got ${t.catalogString}")
    }

  override def nullSafeEval(v: Any): Any =
    TextNormExpressions.stripAccentsOf(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextNormExpressions.stripAccentsOf($c);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
