package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** String-similarity kernels for record linkage, semantics pinned to
  * DuckDB's `jaro_similarity` / `jaro_winkler_similarity` (probed
  * empirically, round-9 session) so the oracle can run the built-in:
  *
  *  - either side empty → 0 (DuckDB returns 0 for ''↔'', not 1);
  *  - match window `max(0, ⌊max(la,lb)/2⌋ − 1)`;
  *  - jaro = (m/la + m/lb + (m−t)/m) / 3, 0 when m = 0;
  *  - Winkler boost ONLY when jaro > 0.7: jw = jaro + min(4, ℓ)·0.1·
  *    (1 − jaro) with ℓ the common prefix length.
  *
  * Gates round the output at 6dp: the values are small-denominator
  * rationals (≤ 3·la·lb·m) scaled by the shared double 0.1 — they
  * cannot land on a 6dp half-grid point (the NOTES boundary
  * argument), so last-ulp division-order drift between engines never
  * flips the rounding.
  *
  * Complements the Levenshtein tier in [[graft.operators.Dedup]]:
  * JW is the name-matching metric (prefix-weighted, transposition-
  * tolerant, O(la·lb) worst case but O(la+lb) on dissimilar strings).
  *
  * Unicode contract: comparisons are per UTF-16 CHAR (JVM chars) —
  * identical to DuckDB on the BMP; strings containing astral
  * characters (surrogate pairs) may count positions differently than
  * a codepoint-based engine. Name-matching inputs are BMP in
  * practice; normalize first if not.
  */
object StringSimExpressions {

  def jaroWinklerOf(a: UTF8String, b: UTF8String): Double = {
    val sa = a.toString
    val sb = b.toString
    val j = jaro(sa, sb)
    if (j <= 0.7) j
    else {
      var l = 0
      val max = math.min(4, math.min(sa.length, sb.length))
      while (l < max && sa.charAt(l) == sb.charAt(l)) l += 1
      j + l * 0.1 * (1.0 - j)
    }
  }

  private def jaro(sa: String, sb: String): Double = {
    val la = sa.length
    val lb = sb.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val aMatched = new Array[Boolean](la)
    val bMatched = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var k = lo
      var found = false
      while (!found && k <= hi) {
        if (!bMatched(k) && sa.charAt(i) == sb.charAt(k)) {
          aMatched(i) = true; bMatched(k) = true; m += 1; found = true
        }
        k += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: matched chars of a vs matched chars of b in order
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (aMatched(i)) {
        while (!bMatched(k)) k += 1
        if (sa.charAt(i) != sb.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    (md / la + md / lb + (md - t / 2) / md) / 3.0
  }
}

/** Full (unrestricted) Damerau–Levenshtein distance, semantics pinned
  * to DuckDB's `damerau_levenshtein` builtin (probed empirically this
  * session):
  *
  *  - FULL DL, not OSA: 'CA'→'ABC' = 2 (delete-between-transposed is
  *    allowed; OSA would say 3) — requires the Lowrance–Wagner
  *    last-occurrence table, not the 3-term recurrence;
  *  - BYTE-based: 'résumé'→'resume' = 4 (two bytes per é), so the
  *    kernel runs on raw UTF-8 bytes — exact parity for ALL inputs,
  *    no BMP caveat.
  *
  * O(la·lb) time and space (the transposition lookback needs the full
  * matrix); inputs past `MaxLen` bytes fail LOUDLY — at corpus scale
  * use the banded Levenshtein tier ([[graft.operators.Dedup]]
  * editDistanceNearDup) or compare fingerprints first.
  */
object DamerauLevenshtein {
  val MaxLen = 1024

  def distance(sa: UTF8String, sb: UTF8String): Long = {
    val a = sa.getBytes
    val b = sb.getBytes
    val n = a.length
    val m = b.length
    require(n <= MaxLen && m <= MaxLen,
      s"damerau_levenshtein: input ${math.max(n, m)} bytes > $MaxLen — " +
        "use the banded Levenshtein tier for long strings")
    if (n == 0) return m.toLong
    if (m == 0) return n.toLong
    // Lowrance–Wagner: (n+2)×(m+2) matrix with an INF border and a
    // last-occurrence row per alphabet symbol (bytes ⇒ 256 slots)
    val inf = n + m
    val w = m + 2
    val d = new Array[Int]((n + 2) * w)
    d(0) = inf
    var i = 0
    while (i <= n) { d((i + 1) * w) = inf; d((i + 1) * w + 1) = i; i += 1 }
    var j = 0
    while (j <= m) { d(j + 1) = inf; d(w + j + 1) = j; j += 1 }
    val da = new Array[Int](256)
    i = 1
    while (i <= n) {
      var db = 0
      val ai = a(i - 1) & 0xff
      j = 1
      while (j <= m) {
        val k = da(b(j - 1) & 0xff)
        val l = db
        val cost = if (ai == (b(j - 1) & 0xff)) { db = j; 0 } else 1
        val subst = d(i * w + j) + cost
        val ins = d((i + 1) * w + j) + 1
        val del = d(i * w + j + 1) + 1
        val trans = d(k * w + l) + (i - k - 1) + 1 + (j - l - 1)
        var best = subst
        if (ins < best) best = ins
        if (del < best) best = del
        if (trans < best) best = trans
        d((i + 1) * w + j + 1) = best
        j += 1
      }
      da(ai) = i
      i += 1
    }
    d((n + 1) * w + m + 1).toLong
  }
}

/** damerau_levenshtein(string, string) -> bigint — see
  * [[DamerauLevenshtein.distance]]. Codegen static call like
  * [[JaroWinkler]]. */
case class DamerauLevenshteinExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "damerau_levenshtein"
  override def dataType: DataType =
    org.apache.spark.sql.types.LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"damerau_levenshtein expects (string, string), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    DamerauLevenshtein.distance(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.DamerauLevenshtein" +
        s".distance($a, $b);")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

/** jaro_winkler(string, string) -> double — see
  * [[StringSimExpressions.jaroWinklerOf]]. Codegen static call, so the
  * kernel runs inside whole-stage codegen on pair scans. */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "jaro_winkler"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler expects (string, string), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    StringSimExpressions.jaroWinklerOf(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.StringSimExpressions" +
        s".jaroWinklerOf($a, $b);")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}
