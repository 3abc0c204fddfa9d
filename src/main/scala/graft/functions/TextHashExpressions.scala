package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native signature kernels for near-dup dedup (SURVEY §2B E35).
  *
  * Why expressions and not SQL higher-order functions: a HOF formulation
  * like `transform(sequence(0,k-1), i -> array_min(transform(shingles,
  * s -> xxhash64(i, s))))` re-evaluates the inner collection lambda per
  * outer element — tokenization and string hashing run k times per row
  * (measured 40× slower at sf0.1). These kernels hash each element string
  * ONCE and derive the k hash family members by re-mixing the 64-bit base
  * (`h_i = xxhash64(base, seed=i)`), the standard one-pass MinHash
  * construction.
  */
object TextHashExpressions {

  /** Fused tokenize → n-gram → MinHash over a raw UTF8 string (the
    * [[MinHashText]] kernel; also called from generated code). */
  def minhashTextOf(v: org.apache.spark.unsafe.types.UTF8String,
      numHashes: Int, n: Int): ArrayData = {
    val toks = v.toString.toLowerCase(java.util.Locale.ROOT)
      .split("\\s+").filter(_.nonEmpty)
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val seen = new java.util.HashSet[java.lang.Long]()
    @inline def absorb(base: Long): Unit =
      if (seen.add(base)) {
        var i = 0
        while (i < numHashes) {
          val h = XxHash64Function.hash(base, LongType, i.toLong)
          if (h < sig(i)) sig(i) = h
          i += 1
        }
      }
    if (toks.length < n) {
      absorb(XxHash64Function.hash(
        org.apache.spark.unsafe.types.UTF8String.fromString(
          toks.mkString(" ")), StringType, 42L))
    } else {
      val th = toks.map(t => XxHash64Function.hash(
        org.apache.spark.unsafe.types.UTF8String.fromString(t), StringType, 42L))
      var j = 0
      while (j + n <= th.length) {
        var base = th(j)
        var m = 1
        while (m < n) {
          base = XxHash64Function.hash(base, LongType, th(j + m))
          m += 1
        }
        absorb(base)
        j += 1
      }
    }
    new GenericArrayData(sig)
  }

  /** [[NgramHashes]] kernel: xxhash64 of every single-space word n-gram,
    * distinct, zero allocation per n-gram. With single-space
    * tokenization an n-gram IS a contiguous byte range of the text
    * (0x20 never occurs inside a UTF-8 multi-byte sequence), so each
    * hash reads the original buffer directly — bit-identical to
    * `xxhash64(concat_ws(' ', slice(split(text,' '), i, n)))` without
    * materializing the token array or any n-gram string. */
  /** Shared core of [[ngramHashesOf]] (dedups) and [[ngramRepStatsOf]]
    * (walks runs): SORTED, possibly-duplicate xxhash64 of every n-gram
    * as byte ranges; empty when fewer than `n` tokens. One tokenizer and
    * one hashing loop, so the two kernels cannot silently diverge. */
  private def sortedNgramHashes(
      text: org.apache.spark.unsafe.types.UTF8String,
      n: Int): Array[Long] = {
    val nb = text.numBytes
    var numToks = 1
    var i = 0
    while (i < nb) { if (text.getByte(i) == 0x20) numToks += 1; i += 1 }
    if (numToks < n) return Array.empty[Long]
    val starts = new Array[Int](numToks)
    val ends = new Array[Int](numToks)
    var t = 0; starts(0) = 0; i = 0
    while (i < nb) {
      if (text.getByte(i) == 0x20) { ends(t) = i; t += 1; starts(t) = i + 1 }
      i += 1
    }
    ends(t) = nb
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val out = new Array[Long](numToks - n + 1)
    var g = 0
    while (g <= numToks - n) {
      val s = starts(g); val e = ends(g + n - 1)
      out(g) = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(base, off + s, e - s, 42L)
      g += 1
    }
    // sort: distinct and mode both become linear walks (order is
    // irrelevant to every consumer)
    java.util.Arrays.sort(out)
    out
  }

  def ngramHashesOf(text: org.apache.spark.unsafe.types.UTF8String,
      n: Int): ArrayData = {
    val out = sortedNgramHashes(text, n)
    var w = 0; var r = 0
    while (r < out.length) {
      if (w == 0 || out(r) != out(w - 1)) { out(w) = out(r); w += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, w))
  }

  /** [[NgramRepStats]] kernel: one pass over the same byte-range n-gram
    * hashes as [[ngramHashesOf]], returning `[total, distinct, maxRun]`
    * — total n-grams, distinct n-grams, and the highest single n-gram
    * count (the mode). Sorting the hash array makes both distinct and
    * the mode a run-length walk, so within-doc repetition statistics
    * cost one kernel call with zero string materialization. */
  def ngramRepStatsOf(text: org.apache.spark.unsafe.types.UTF8String,
      n: Int): ArrayData = {
    val out = sortedNgramHashes(text, n)
    var distinct = 0; var maxRun = 0; var run = 0; var r = 0
    while (r < out.length) {
      if (r == 0 || out(r) != out(r - 1)) { distinct += 1; run = 1 }
      else run += 1
      if (run > maxRun) maxRun = run
      r += 1
    }
    new GenericArrayData(Array(out.length.toLong, distinct.toLong,
      maxRun.toLong))
  }

  /** [[PurgePositions]] kernel: drop the tokens at the given SORTED
    * 0-based positions in one two-pointer merge — O(tokens + positions)
    * per doc, versus the O(tokens × positions) of filtering each token
    * with `array_contains`. Out-of-range and duplicate positions are
    * skipped (the operator feeds a `collect_set` so neither occurs, but
    * the kernel must not misbehave if callers hand it garbage). */
  def purgePositionsOf(toks: ArrayData, pos: ArrayData): ArrayData = {
    val n = toks.numElements()
    val m = pos.numElements()
    val out = new Array[AnyRef](n)
    var w = 0; var r = 0; var p = 0
    while (r < n) {
      while (p < m && pos.getInt(p) < r) p += 1
      if (p < m && pos.getInt(p) == r) p += 1
      else {
        out(w) = if (toks.isNullAt(r)) null else toks.getUTF8String(r)
        w += 1
      }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, w))
  }

  /** [[MinHashSig]] kernel as ArrayData (also called from generated code). */
  def minhashSigOf(elems: ArrayData, k: Int): ArrayData =
    new GenericArrayData(minhashOf(elems, k))

  /** One string hash + k long mixes per element. */
  @inline def minhashOf(elems: ArrayData, k: Int): Array[Long] = {
    val sig = Array.fill(k)(Long.MaxValue)
    val n = elems.numElements()
    var j = 0
    while (j < n) {
      val base = XxHash64Function.hash(elems.getUTF8String(j), StringType, 42L)
      var i = 0
      while (i < k) {
        val h = XxHash64Function.hash(base, LongType, i.toLong)
        if (h < sig(i)) sig(i) = h
        i += 1
      }
      j += 1
    }
    sig
  }

  /** Winnowing selection kernel ([[graft.operators.Winnow]], round 11):
    * code points → ROLLING k-gram polynomial hashes ((h·31+c) mod
    * 1e9+7, the repo's shared SQL-reproducible fingerprint polynomial)
    * → per-window (w) minima of the packed `hash·10⁶ + pos` via a
    * monotonic deque → sorted distinct packed selections. One O(n)
    * pass, zero per-position allocation — the HOF array formulation
    * (slice + aggregate per position) allocates a k-array per gram and
    * re-walks it; this kernel drops the 32× drill from 35.5 s to the
    * scan-bound class. Packed values are unique (pos rides the low
    * digits), so the deque needs no tie rule; the lexicographic
    * (hash, pos) leftmost-min contract is preserved by construction. */
  /** Fused tokenize → clipped n-gram overlap kernel behind
    * [[BleuStats]] (r13 verdict #7: the tagged-explode BLEU shape paid
    * an 8-stream gram explode + a (pair, n, gram)-keyed shuffle for a
    * statistic that is strictly PER-PAIR). One pass per row, zero
    * shuffle: per order n ≤ maxN, count reference n-grams into a hash
    * map (gram identity = xxhash64 fold of the token hashes — no gram
    * string is materialized; collisions ~len²/2⁶⁴, the minhash_text
    * tolerance class), then stream candidate n-grams clipping against
    * it. Tokenization matches the pairToks recipe byte-for-byte:
    * lowercase, split \\s+, drop empties.
    *
    * @return 2·maxN+1 longs: candN_1..candN_maxN, ov_1..ov_maxN,
    *         refN_1 (= reference length) */
  def bleuStatsOf(cand: org.apache.spark.unsafe.types.UTF8String,
      ref: org.apache.spark.unsafe.types.UTF8String,
      maxN: Int): ArrayData = {
    def toks(v: org.apache.spark.unsafe.types.UTF8String): Array[Long] =
      v.toString.toLowerCase(java.util.Locale.ROOT)
        .split("\\s+").filter(_.nonEmpty)
        .map(t => XxHash64Function.hash(
          org.apache.spark.unsafe.types.UTF8String.fromString(t),
          StringType, 42L))
    val ct = toks(cand); val rt = toks(ref)
    val out = new Array[Long](2 * maxN + 1)
    out(2 * maxN) = rt.length.toLong
    @inline def gram(a: Array[Long], i: Int, n: Int): Long = {
      var h = 0L; var j = 0
      while (j < n) { h = XxHash64Function.hash(a(i + j), LongType, h); j += 1 }
      h
    }
    var n = 1
    while (n <= maxN) {
      val cN = math.max(0, ct.length - n + 1)
      val rN = math.max(0, rt.length - n + 1)
      out(n - 1) = cN.toLong
      if (cN > 0 && rN > 0) {
        val refCounts = new java.util.HashMap[java.lang.Long, Integer](rN * 2)
        var i = 0
        while (i < rN) {
          val h = gram(rt, i, n)
          val c = refCounts.get(h)
          refCounts.put(h, if (c == null) 1 else c + 1)
          i += 1
        }
        var ov = 0L
        i = 0
        while (i < cN) {
          val h = gram(ct, i, n)
          val c = refCounts.get(h)
          if (c != null && c > 0) { ov += 1L; refCounts.put(h, c - 1) }
          i += 1
        }
        out(maxN + n - 1) = ov
      }
      n += 1
    }
    new GenericArrayData(out)
  }

  def winnowFpsOf(text: org.apache.spark.unsafe.types.UTF8String,
      k: Int, w: Int): ArrayData = {
    val M = 1000000007L
    val PosBase = 1000000L
    val cps = text.toString.codePoints().toArray
    val n = cps.length
    if (n < k + w - 1) return new GenericArrayData(Array.empty[Long])
    val ng = n - k + 1
    if (ng >= PosBase) throw new IllegalStateException(
      s"Winnow.fingerprints: doc exceeds $PosBase chars — raise " +
        "PosBase or chunk upstream")
    var pow = 1L
    var i = 1
    while (i < k) { pow = pow * 31 % M; i += 1 }
    val packed = new Array[Long](ng)
    var h = 0L
    i = 0
    while (i < k) { h = (h * 31 + cps(i)) % M; i += 1 }
    packed(0) = h * PosBase + 1
    var p = 1
    while (p < ng) {
      h = ((h - cps(p - 1) * pow % M + M) % M * 31 + cps(p + k - 1)) % M
      packed(p) = h * PosBase + (p + 1)
      p += 1
    }
    val nw = ng - w + 1
    val sel = new Array[Long](nw)
    val dq = new Array[Int](ng)
    var head = 0
    var tail = 0
    var j = 0
    while (j < ng) {
      while (tail > head && packed(dq(tail - 1)) >= packed(j)) tail -= 1
      dq(tail) = j; tail += 1
      if (dq(head) <= j - w) head += 1
      if (j >= w - 1) sel(j - w + 1) = packed(dq(head))
      j += 1
    }
    java.util.Arrays.sort(sel)
    var out = 0
    var q = 0
    while (q < nw) {
      if (out == 0 || sel(out - 1) != sel(q)) { sel(out) = sel(q); out += 1 }
      q += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(sel, out))
  }

  /** 64-bit SimHash: one string hash per element, bitwise majority vote. */
  @inline def simhashOf(elems: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = elems.numElements()
    var j = 0
    while (j < n) {
      val h = XxHash64Function.hash(elems.getUTF8String(j), StringType, 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      j += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  /** BPE encode kernel (round 12): single-space word walk, per word
    * chars + the end-of-word marker, then every rule applied in rank
    * order left-to-right non-overlapping — the imperative form of
    * BpeTrain.applyMerge's pending fold (differentially spec-proven).
    * `flat` is the rule list flattened [l0, r0, l1, r1, …]; the
    * expression passes it via addReferenceObj so parse cost is zero.
    * Char granularity is the JVM char (the StringSim BMP contract).
    * Called from generated code. */
  def bpeEncodeOf(t: org.apache.spark.unsafe.types.UTF8String,
      flat: Array[String]): ArrayData = {
    val str = t.toString
    val n = str.length
    val out = new scala.collection.mutable.ArrayBuffer[AnyRef](
      n / 2 + 4)
    var i = 0
    while (i <= n) {
      var j = str.indexOf(' ', i)
      if (j < 0) j = n
      if (j > i) {
        var syms = new java.util.ArrayList[String](j - i + 1)
        var k = i
        while (k < j) { syms.add(String.valueOf(str.charAt(k))); k += 1 }
        syms.add("</w>")
        var r = 0
        while (r < flat.length) {
          val l = flat(r)
          val rt = flat(r + 1)
          val merged = l + rt
          val sz = syms.size
          val next = new java.util.ArrayList[String](sz)
          var q = 0
          while (q < sz) {
            if (q + 1 < sz && syms.get(q) == l && syms.get(q + 1) == rt) {
              next.add(merged); q += 2
            } else { next.add(syms.get(q)); q += 1 }
          }
          syms = next
          r += 2
        }
        var e = 0
        while (e < syms.size) {
          out += org.apache.spark.unsafe.types.UTF8String
            .fromString(syms.get(e))
          e += 1
        }
      }
      i = j + 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** minhash_text(text, k, n) -> array<long>
  *
  * Fused tokenize → n-gram shingle → MinHash kernel. Shingle identity is a
  * combined hash of the n token hashes — no shingle string is ever
  * materialized (the `concat_ws(slice(...))` formulation allocates one
  * string + one array per shingle; this allocates nothing per shingle but
  * a long). Distinctness is enforced on the 64-bit shingle hash, which is
  * exact up to hash collisions (~n²/2⁶⁴ — irrelevant for dedup purposes).
  */
case class MinHashText(child: Expression, numHashes: Int, shingleSize: Int)
    extends UnaryExpression {
  override def prettyName: String = "minhash_text"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_text expects string, got ${t.catalogString}")
    }

  override def nullSafeEval(v: Any): Any =
    TextHashExpressions.minhashTextOf(
      v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      numHashes, shingleSize)

  // static call into the kernel keeps the whole stage in codegen (a
  // CodegenFallback here would de-fuse the scan stage around it)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHashExpressions" +
        s".minhashTextOf($c, $numHashes, $shingleSize);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** winnow_fps(text, k, w) -> array<long> of distinct packed
  * `gramhash·10⁶ + pos` winnowing selections (see
  * [[TextHashExpressions.winnowFpsOf]]); empty array for docs shorter
  * than k + w − 1. */
case class WinnowFps(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  override def prettyName: String = "winnow_fps"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"winnow_fps expects string, got ${t.catalogString}")
    }

  override def nullSafeEval(v: Any): Any =
    TextHashExpressions.winnowFpsOf(
      v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k, w)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHashExpressions" +
        s".winnowFpsOf($c, $k, $w);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** bleu_stats(cand, ref, maxN) -> array<long> of
  * candN_1..candN_maxN, ov_1..ov_maxN, refN_1 — see
  * [[TextHashExpressions.bleuStatsOf]]. */
case class BleuStats(left: Expression, right: Expression, maxN: Int)
    extends BinaryExpression {
  override def prettyName: String = "bleu_stats"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (a, b) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bleu_stats expects (string, string), got " +
            s"(${a.catalogString}, ${b.catalogString})")
    }

  override def nullSafeEval(l: Any, r: Any): Any =
    TextHashExpressions.bleuStatsOf(
      l.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      r.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], maxN)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.TextHashExpressions" +
        s".bleuStatsOf($a, $b, $maxN);")

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
}

/** minhash_sig(array<string>, k) -> array<long> */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {
  override def prettyName: String = "minhash_sig"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig expects array<string>, got ${t.catalogString}")
    }

  override def nullSafeEval(v: Any): Any =
    TextHashExpressions.minhashSigOf(v.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHashExpressions" +
        s".minhashSigOf($c, $numHashes);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** simhash64(array<string>) -> long */
case class SimHash64(child: Expression)
    extends UnaryExpression {
  override def prettyName: String = "simhash64"
  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 expects array<string>, got ${t.catalogString}")
    }

  override def nullSafeEval(v: Any): Any =
    TextHashExpressions.simhashOf(v.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHashExpressions.simhashOf($c);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** purge_positions(array<string>, array<int>) -> array<string> — the
  * input minus the tokens at the given SORTED 0-based positions, in one
  * linear two-pointer merge (see
  * [[TextHashExpressions.purgePositionsOf]]). The rewrite kernel of
  * [[graft.operators.Repetition.removeDupSpans]]: per-doc cost is
  * O(tokens + removed) regardless of how much boilerplate a doc loses. */
case class PurgePositions(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def prettyName: String = "purge_positions"
  override def dataType: DataType = left.dataType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(IntegerType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"purge_positions expects (array<string>, array<int>), got " +
            s"(${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(toks: Any, pos: Any): Any =
    TextHashExpressions.purgePositionsOf(
      toks.asInstanceOf[ArrayData], pos.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (t, p) =>
      s"${ev.value} = graft.functions.TextHashExpressions" +
        s".purgePositionsOf($t, $p);")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

/** ngram_hashes(text, n) -> array<long> — distinct xxhash64 of every
  * single-space word n-gram, hashed as byte ranges of the input (see
  * [[TextHashExpressions.ngramHashesOf]]). The scan-side kernel of
  * [[graft.operators.Decontam.overlapHashed]]. */
case class NgramHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "n must be positive")
  override def prettyName: String = "ngram_hashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"ngram_hashes expects string, got ${t.catalogString}")
    }

  override def nullSafeEval(v: Any): Any =
    TextHashExpressions.ngramHashesOf(
      v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHashExpressions" +
        s".ngramHashesOf($c, $n);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** ngram_rep_stats(text, n) -> array<long> [total, distinct, maxRun] —
  * within-doc n-gram repetition statistics in one kernel pass (see
  * [[TextHashExpressions.ngramRepStatsOf]]). The scan-side kernel of
  * [[graft.operators.Repetition.signals]]: duplicate-n-gram fraction and
  * mode share become pure projections, no explode/groupBy. */
case class NgramRepStats(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "n must be positive")
  override def prettyName: String = "ngram_rep_stats"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"ngram_rep_stats expects string, got ${t.catalogString}")
    }

  override def nullSafeEval(v: Any): Any =
    TextHashExpressions.ngramRepStatsOf(
      v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHashExpressions" +
        s".ngramRepStatsOf($c, $n);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** ngram_hashes_gen(text, n): the GENERATOR (UDTF) form of
  * [[NgramHashes]] — one output row per distinct n-gram hash (SURVEY §2C
  * custom-Generator tier). Versus `explode(ngram_hashes(...))` the hash
  * set is never serialized as a single array VALUE into the row buffer —
  * rows are yielded from the kernel's transient array directly. (The
  * kernel still builds that transient array to dedup; the saving is the
  * per-row UnsafeArrayData copy, not peak heap.) Usable from the Column
  * API and SQL — Catalyst's ExtractGenerator plans the Generate node. */
case class NgramHashGen(child: Expression, n: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.Generator
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(n >= 1, "n must be positive")
  override def prettyName: String = "ngram_hashes_gen"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"ngram_hashes_gen expects string, got ${t.catalogString}")
    }

  override def elementSchema: StructType =
    StructType(Seq(StructField("ngh", LongType, nullable = false)))

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow)
      : IterableOnce[org.apache.spark.sql.catalyst.InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Iterator.empty
    val hashes = TextHashExpressions.ngramHashesOf(
      v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)
    val row = new org.apache.spark.sql.catalyst.expressions
      .GenericInternalRow(1)
    (0 until hashes.numElements()).iterator.map { i =>
      row.update(0, hashes.getLong(i)); row
    }
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** bpe_encode(text, rulesSpec) -> array<string>
  *
  * Applies an ORDERED BPE merge table to every single-space word of
  * `text` (chars + "</w>" start state) in one imperative pass — the
  * native replacement for the HOF fold chain, whose expression tree
  * grew 3^rules nodes before the round-12 applyMerge fix and whose
  * interpreted array churn still cost ~50× this kernel after it.
  * `rulesSpec` joins rules with \u0002 and a rule's sides with
  * \u0001 (control chars no whitespace-split corpus symbol can
  * carry — enforced at the Column API). */
case class BpeEncode(child: Expression, rulesSpec: String)
    extends UnaryExpression {
  override def prettyName: String = "bpe_encode"
  override def dataType: DataType = ArrayType(StringType,
    containsNull = false)

  @transient private lazy val flat: Array[String] =
    if (rulesSpec.isEmpty) Array.empty
    else rulesSpec.split('\u0002').flatMap { rule =>
      val i = rule.indexOf('\u0001')
      require(i > 0 && i < rule.length - 1,
        s"bpe_encode: malformed rule spec segment '$rule'")
      Seq(rule.substring(0, i), rule.substring(i + 1))
    }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bpe_encode expects string, got ${t.catalogString}")
    }

  override def nullSafeEval(v: Any): Any =
    TextHashExpressions.bpeEncodeOf(
      v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], flat)

  // static call with the parsed rule array as a reference object —
  // stays inside whole-stage codegen, zero per-row parse cost
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val rulesRef = ctx.addReferenceObj("bpeRules", flat,
      "java.lang.String[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHashExpressions" +
        s".bpeEncodeOf($c, $rulesRef);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
