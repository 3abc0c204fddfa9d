package graft.operators

import graft.SparkSpec

/** Quota and determinism oracles for domain mixing. */
class MixingSpec extends SparkSpec {

  import spark.implicits._

  private def corpus = (0L until 300L)
    .map(i => (i, if (i < 200) "web" else if (i < 280) "books" else "code"))
    .toDF("doc_id", "source")
    .select(org.apache.spark.sql.functions.col("source"),
      org.apache.spark.sql.functions.col("doc_id"))

  test("each group lands on min(quota, group size); unmapped groups drop") {
    val out = Mixing.sampleToWeights(corpus, "source", "doc_id",
      weights = Map("web" -> 0.6, "books" -> 0.4, "news" -> 0.1),
      budget = 100)
    val counts = out.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("web" -> 60L, "books" -> 40L),
      s"got $counts") // code has no weight; news has no docs
  }

  test("quota larger than the group takes the whole group") {
    val out = Mixing.sampleToWeights(corpus, "source", "doc_id",
      weights = Map("code" -> 1.0), budget = 1000)
    assert(out.count() == 20) // only 20 code docs exist
  }

  test("mixture is deterministic across runs and repartitioning") {
    def ids(df: org.apache.spark.sql.DataFrame) =
      Mixing.sampleToWeights(df, "source", "doc_id",
        weights = Map("web" -> 0.5, "books" -> 0.5), budget = 80)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(ids(corpus) == ids(corpus.repartition(7)))
  }

  private def tokenCorpus = corpus
    .withColumn("n_tokens",
      (org.apache.spark.sql.functions.col("doc_id") % 7 + 1).cast("int"))

  test("token budget: each group's total stays within its token quota") {
    val out = Mixing.sampleToTokenBudget(tokenCorpus, "source", "doc_id",
      "n_tokens", weights = Map("web" -> 0.6, "books" -> 0.4),
      tokenBudget = 100)
    val totals = out.groupBy("source")
      .agg(org.apache.spark.sql.functions.sum("n_tokens").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(totals("web") <= 60 && totals("books") <= 40, s"got $totals")
    // greedy prefix fills to within one max-doc of the quota
    assert(totals("web") > 60 - 7 && totals("books") > 40 - 7,
      s"underfilled: $totals")
  }

  test("hitting maxDocsPerGroup with an unfilled quota fails loudly") {
    // 200 web docs of 1-7 tokens; a 5-doc bound can hold at most 35
    // tokens — far under the 500-token quota: must raise, not underfill
    val e = intercept[Exception] {
      Mixing.sampleToTokenBudget(tokenCorpus, "source", "doc_id",
        "n_tokens", weights = Map("web" -> 1.0), tokenBudget = 500,
        maxDocsPerGroup = 5).collect()
    }
    assert(e.getMessage.contains("maxDocsPerGroup"), e.getMessage)
    // same bound with a fillable quota passes untouched
    val ok = Mixing.sampleToTokenBudget(tokenCorpus, "source", "doc_id",
      "n_tokens", weights = Map("web" -> 1.0), tokenBudget = 10,
      maxDocsPerGroup = 5)
    assert(ok.count() > 0)
  }

  test("a group of EXACTLY maxDocsPerGroup docs is exhausted, not truncated") {
    // 200 web docs, bound exactly 200, quota far above the total: the
    // whole group legitimately delivers under quota — the guard must
    // distinguish this from a truncation and stay silent
    val out = Mixing.sampleToTokenBudget(tokenCorpus, "source", "doc_id",
      "n_tokens", weights = Map("web" -> 1.0), tokenBudget = 1000000,
      maxDocsPerGroup = 200)
    assert(out.count() == 200, "exhausted group delivers in full")
  }

  test("temperature alpha=1 reproduces natural proportions") {
    // counts 200/80/20 (Z=300): quotas ⌊w·150⌋ = 100/40/10
    val out = Mixing.sampleToTemperature(corpus, "source", "doc_id",
      alpha = 1.0, budget = 150)
    val counts = out.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("web" -> 100L, "books" -> 40L, "code" -> 10L),
      s"got $counts")
  }

  test("temperature alpha=0 is uniform over groups") {
    // n^0 = 1 each, Z=3: quotas ⌊30/3⌋ = 10 per group regardless of size
    val out = Mixing.sampleToTemperature(corpus, "source", "doc_id",
      alpha = 0.0, budget = 30)
    val counts = out.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("web" -> 10L, "books" -> 10L, "code" -> 10L),
      s"got $counts")
  }

  test("temperature raises loudly past maxGroups instead of an " +
      "unbounded driver collect") {
    val e = intercept[Exception] {
      Mixing.sampleToTemperature(corpus, "source", "doc_id",
        alpha = 1.0, budget = 30, maxGroups = 2)
    }
    assert(e.getMessage.contains("more than 2 groups"), e.getMessage)
  }

  test("temperature 0<alpha<1 up-samples the tail relative to the head") {
    def share(alpha: Double): Double = {
      val counts = Mixing.sampleToTemperature(corpus, "source", "doc_id",
          alpha, budget = 100)
        .groupBy("source").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      counts("code").toDouble / counts.values.sum
    }
    assert(share(0.5) > share(1.0),
      "sqrt temperature must raise the smallest group's share")
  }

  test("token budget keeps the hash-order PREFIX, nothing after a cross") {
    val out = Mixing.sampleToTokenBudget(tokenCorpus, "source", "doc_id",
        "n_tokens", weights = Map("web" -> 1.0), tokenBudget = 50)
      .collect().map(r => (r.getLong(1), r.getLong(3))).toMap
    // recompute the expected prefix from the same md5 order
    val order = tokenCorpus.filter("source = 'web'")
      .select("doc_id", "n_tokens")
      .collect().map(r => (r.getLong(0), r.getInt(1)))
      .sortBy { case (id, _) =>
        (java.security.MessageDigest.getInstance("MD5")
          .digest(id.toString.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString, id)
      }
    var cum = 0L
    val expected = order.takeWhile { case (_, n) =>
      cum += n; cum <= 50
    }.map(_._1).toSet
    assert(out.keySet == expected)
  }
}
