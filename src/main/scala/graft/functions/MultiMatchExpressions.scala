package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}

/** Aho–Corasick automaton over JVM chars — the multi-pattern substring
  * matcher behind `block_term_hits`. One text walk finds every
  * dictionary term in O(|text| + matches) REGARDLESS of dictionary
  * size, where the regex-alternation formulation
  * (`text RLIKE "t1|t2|…"`) costs O(|text| · terms) and a
  * per-term `contains` loop costs `terms` full scans per row — the
  * difference between a feasible and an infeasible blocklist screen at
  * 100 TB × 10⁴ terms.
  *
  * Built ONCE on the driver from the literal term list and shipped to
  * executors as a plan reference object (the [[BpeEncode]]
  * addReferenceObj recipe) — zero per-row, zero per-task build cost.
  * Matching is exact char-for-char substring (no word boundaries, no
  * case folding — callers `lower()` both sides; boundary-aware
  * screens tokenize first). The JVM-char granularity is the StringSim
  * BMP contract: supplementary code points match as surrogate pairs,
  * which is still exact for substring identity.
  *
  * Serializable: the goto maps, fail links and merged output lists are
  * plain JDK structures; deserialization restores a ready automaton.
  */
final class AcAutomaton(val terms: Array[String]) extends Serializable {
  require(terms.nonEmpty, "AcAutomaton: empty term list")
  require(terms.length <= 100000,
    s"AcAutomaton: ${terms.length} terms — cap is 100000")

  private val gotoM =
    new java.util.ArrayList[java.util.HashMap[Character, Integer]]()
  private val endTerm = new java.util.ArrayList[Integer]()
  gotoM.add(new java.util.HashMap[Character, Integer]())
  endTerm.add(-1)

  { // trie
    var ti = 0
    while (ti < terms.length) {
      val t = terms(ti)
      require(t.nonEmpty, "AcAutomaton: empty term")
      var s = 0
      var i = 0
      while (i < t.length) {
        val m = gotoM.get(s)
        val nx = m.get(Character.valueOf(t.charAt(i)))
        if (nx == null) {
          gotoM.add(new java.util.HashMap[Character, Integer]())
          endTerm.add(-1)
          val fresh = gotoM.size() - 1
          m.put(Character.valueOf(t.charAt(i)), Integer.valueOf(fresh))
          s = fresh
        } else s = nx.intValue()
        i += 1
      }
      require(endTerm.get(s).intValue() < 0,
        s"AcAutomaton: duplicate term '$t'")
      endTerm.set(s, Integer.valueOf(ti))
      ti += 1
    }
  }

  private val fail = new Array[Int](gotoM.size())
  // per-state merged match list (own end-term + the fail chain's) —
  // precomputed so the text walk never chases fail links for output
  private val outs = new Array[Array[Int]](gotoM.size())

  { // BFS fail links
    def ownOut(s: Int): Array[Int] =
      if (endTerm.get(s).intValue() >= 0) Array(endTerm.get(s).intValue())
      else Array.emptyIntArray
    outs(0) = ownOut(0)
    val queue = new java.util.ArrayDeque[Integer]()
    val rootIt = gotoM.get(0).values().iterator()
    while (rootIt.hasNext) {
      val v = rootIt.next().intValue()
      fail(v) = 0
      queue.add(Integer.valueOf(v))
    }
    while (!queue.isEmpty) {
      val u = queue.poll().intValue()
      outs(u) =
        if (outs(fail(u)).isEmpty) ownOut(u)
        else ownOut(u) ++ outs(fail(u))
      val it = gotoM.get(u).entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val c = e.getKey
        val v = e.getValue.intValue()
        var f = fail(u)
        var nx = gotoM.get(f).get(c)
        while (f != 0 && nx == null) { f = fail(f); nx = gotoM.get(f).get(c) }
        fail(v) = if (nx == null) 0 else nx.intValue()
        queue.add(Integer.valueOf(v))
      }
    }
  }

  /** Distinct matched terms in dictionary order (the order the caller
    * passed — mirrors a `list_filter(terms, contains)` oracle).
    * Early-exits once every term has matched. Called from generated
    * code. */
  def hitsOf(text: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    val s = text.toString
    val seen = new Array[Boolean](terms.length)
    var nSeen = 0
    var st = 0
    var i = 0
    val n = s.length
    while (i < n && nSeen < terms.length) {
      val c = Character.valueOf(s.charAt(i))
      var m = gotoM.get(st).get(c)
      while (st != 0 && m == null) { st = fail(st); m = gotoM.get(st).get(c) }
      st = if (m == null) 0 else m.intValue()
      val o = outs(st)
      var k = 0
      while (k < o.length) {
        if (!seen(o(k))) { seen(o(k)) = true; nSeen += 1 }
        k += 1
      }
      i += 1
    }
    val out = new Array[AnyRef](nSeen)
    var t = 0
    var w = 0
    while (t < terms.length) {
      if (seen(t)) {
        out(w) = org.apache.spark.unsafe.types.UTF8String
          .fromString(terms(t))
        w += 1
      }
      t += 1
    }
    new GenericArrayData(out)
  }
}

/** block_term_hits(text, termsSpec) -> array<string>
  *
  * Distinct dictionary terms occurring as substrings of `text`, in
  * dictionary order — one Aho–Corasick walk per row (see
  * [[AcAutomaton]]). `termsSpec` joins terms with U+0001 (a control
  * char no screened corpus carries — enforced at the Column API). */
case class MultiMatchTerms(child: Expression, termsSpec: String)
    extends UnaryExpression {
  override def prettyName: String = "block_term_hits"
  override def dataType: DataType = ArrayType(StringType,
    containsNull = false)

  @transient private lazy val auto =
    new AcAutomaton(termsSpec.split('\u0001'))

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"block_term_hits expects string, got ${t.catalogString}")
    }

  override def nullSafeEval(v: Any): Any =
    auto.hitsOf(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  // the built automaton rides the plan's reference array — stays
  // inside whole-stage codegen, zero per-row/per-task build cost
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val autoRef = ctx.addReferenceObj("acAutomaton", auto,
      "graft.functions.AcAutomaton")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $autoRef.hitsOf($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
