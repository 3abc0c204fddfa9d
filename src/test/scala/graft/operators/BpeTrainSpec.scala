package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Oracles for distributed BPE merge learning: an independent plain-
  * Scala reference implementation must produce the identical merge
  * table on the real corpus, and the classic Sennrich fixture has a
  * hand-checkable merge sequence. */
class BpeTrainSpec extends SparkSpec {

  import spark.implicits._

  /** Reference BPE (independent implementation: driver-side maps, no
    * Spark) — same tie rule: max freq, then (left, right) lexicographic. */
  private def refMerges(words: Map[String, Long], n: Int)
      : Seq[(Int, String, String, Long)] = {
    var vocab: Map[Vector[String], Long] = words.toSeq
      .map { case (w, f) =>
        (w.map(_.toString).toVector :+ BpeTrain.EndOfWord) -> f }
      .groupMapReduce(_._1)(_._2)(_ + _)
    val out = mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 1
    var go = true
    while (rank <= n && go) {
      val counts = mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      vocab.foreach { case (syms, f) =>
        syms.iterator.zip(syms.iterator.drop(1)).foreach { p =>
          counts(p) += f
        }
      }
      if (counts.isEmpty) go = false
      else {
        val ((l, r), f) = counts.toSeq
          .minBy { case ((a, b), c) => (-c, a, b) }
        out += ((rank, l, r, f))
        vocab = vocab.toSeq.map { case (syms, wf) =>
          val merged = mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
              merged += l + r; i += 2
            } else { merged += syms(i); i += 1 }
          }
          merged.toVector -> wf
        }.groupMapReduce(_._1)(_._2)(_ + _)
        rank += 1
      }
    }
    out.toSeq
  }

  private def asTuples(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq

  test("classic Sennrich fixture merges in the hand-computed order") {
    val words = Seq.fill(8)("low") ++ Seq.fill(6)("lower") ++
      Seq.fill(5)("newest") ++ Seq.fill(4)("widest")
    val got = asTuples(
      BpeTrain.learnMerges(words.toDF("text"), "text", 8))
    val expect = Seq(
      (1, "l", "o", 14L), (2, "lo", "w", 14L),
      (3, "e", "s", 9L), (4, "es", "t", 9L),
      (5, "est", "</w>", 9L), (6, "low", "</w>", 8L),
      (7, "e", "r", 6L), (8, "er", "</w>", 6L))
    assert(got == expect, s"got $got")
    assert(got == refMerges(
      Map("low" -> 8L, "lower" -> 6L, "newest" -> 5L, "widest" -> 4L), 8))
  }

  test("distributed merges equal the reference on the real corpus") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val got = asTuples(BpeTrain.learnMerges(docs, "text", 10))
    val words = docs
      .select(explode(filter(split(lower(col("text")), " "),
        w => length(w) > 0)).as("w"))
      .groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == refMerges(words, 10),
      "Spark and reference BPE must learn identical merge tables")
    assert(got.size == 10)
    // frequencies are nonincreasing only within equal-vocab rounds, but
    // every chosen pair's freq is positive and ranks are dense
    assert(got.map(_._1) == (1 to 10))
    assert(got.forall(_._4 > 0))
  }

  test("delta algebra: 32 merges equal the full-recount reference") {
    // the incremental pair table (round 10) must stay exactly equal to
    // a from-scratch recount at EVERY rank — 32 merges deep, any drift
    // in the ±delta algebra (a pair not cancelled, a zero-count row
    // surviving into the argmax) diverges the merge sequence
    val docs = graft.sources.Tables.documents(spark, sf)
    val got = asTuples(BpeTrain.learnMerges(docs, "text", 32))
    val words = docs
      .select(explode(filter(split(lower(col("text")), " "),
        w => length(w) > 0)).as("w"))
      .groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == refMerges(words, 32),
      "incremental pair counts diverged from the full recount")
  }

  test("encode applies the learned table (round-trip on fixture words)") {
    val words = Seq.fill(8)("low") ++ Seq.fill(6)("lower") ++
      Seq.fill(5)("newest") ++ Seq.fill(4)("widest")
    val table = asTuples(
      BpeTrain.learnMerges(words.toDF("text"), "text", 8))
      .map(m => (m._2, m._3))
    val enc = BpeTrain.encode(Seq("low lower newest").toDF("text"),
        "text", table)
      .select("syms").head().getSeq[String](0)
    // low -> low</w>; lower -> low er</w>; newest -> n e w est</w>
    assert(enc == Seq("low</w>", "low", "er</w>", "n", "e", "w", "est</w>"),
      s"got $enc")
  }

  test("merge application is non-overlapping left-to-right") {
    val got = Seq("aaa").toDF("text")
    val merged = BpeTrain.encode(got, "text", Seq(("a", "a")))
      .select("syms").head().getSeq[String](0)
    assert(merged == Seq("aa", "a", "</w>"), s"got $merged")
  }

  test("native encode kernel equals the HOF reference on random words") {
    import spark.implicits._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val genDoc = for {
      nw <- Gen.chooseNum(0, 6)
      ws <- Gen.listOfN(nw, Gen.listOfN(5, Gen.oneOf("abcde".toSeq))
        .map(_.mkString))
    } yield ws.mkString(" ")
    val rules = Seq(("a", "b"), ("ab", "c"), ("a", "a"), ("aa", "aa"),
      ("d", "</w>"), ("e", "e"))
    var seed = Seed(42L)
    val docs = (1 to 40).map { _ =>
      val d = genDoc.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      d
    }
    val df = docs.toDF("text")
    val native = BpeTrain.encode(df, "text", rules)
      .select("syms").collect().map(_.getSeq[String](0)).toSeq
    val ref = BpeTrain.encodeReference(df, "text", rules)
      .select("syms").collect().map(_.getSeq[String](0)).toSeq
    assert(native == ref,
      s"kernel diverges from the HOF reference:\n$native\nvs\n$ref")
  }

  test("NUL in corpus text raises loudly on every BPE entry point " +
      "(round-12 ADVICE: the fold flush sentinel would silently " +
      "swallow it while the native kernel kept it)") {
    import spark.implicits._
    val df = Seq("ok text", "bad\u0000word").toDF("text")
    for (run <- Seq(
        () => BpeTrain.vocabulary(df, "text").collect(),
        () => BpeTrain.encode(df, "text", Seq(("a", "b"))).collect(),
        () => BpeTrain.encodeReference(df, "text", Seq(("a", "b")))
          .select("syms").collect())) {
      val e = intercept[Exception] { run() }
      assert(e.getMessage.contains("U+0000"), e.getMessage)
    }
    // and a NUL-carrying RULE is rejected up front by the kernel seam
    val bad = intercept[IllegalArgumentException] {
      graft.functions.GraftFunctions.bpeEncode(col("text"),
        Seq(("a\u0000", "b")))
    }
    assert(bad.getMessage.contains("NUL"), bad.getMessage)
  }
}
