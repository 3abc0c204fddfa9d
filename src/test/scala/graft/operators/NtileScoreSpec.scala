package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Selection.ntileScore]] must be BIT-IDENTICAL to the ntile window
  * function it replaces (the q_rfm_segments / q_curriculum rewrite
  * contract: hash unchanged), across group sizes vs k, ties on the
  * leading key, DESC orders, and hot groups. */
class NtileScoreSpec extends SparkSpec {
  import spark.implicits._

  private def viaWindow(df: org.apache.spark.sql.DataFrame, k: Int,
      groupCols: Seq[String],
      orderCols: Seq[org.apache.spark.sql.Column]) = {
    val w =
      if (groupCols.isEmpty) Window.orderBy(orderCols: _*)
      else Window.partitionBy(groupCols.map(col): _*).orderBy(orderCols: _*)
    df.withColumn("score", ntile(k).over(w))
  }

  private def assertSame(got: org.apache.spark.sql.DataFrame,
      want: org.apache.spark.sql.DataFrame): Unit = {
    val g = got.collect().map(_.toSeq).sortBy(_.toString)
    val w = want.collect().map(_.toSeq).sortBy(_.toString)
    assert(g.length == w.length, s"${g.length} vs ${w.length} rows")
    g.zip(w).foreach { case (a, b) => assert(a == b) }
  }

  test("global ntile: random values with heavy ties, k=5, n % k != 0") {
    val rng = new scala.util.Random(42)
    val rows = (1L to 997L).map(i => (i, rng.nextInt(20)))
    val df = rows.toDF("id", "v")
    val got = Selection.ntileScore(df, 5, Nil, col("v"),
      Seq(col("v").asc, col("id").asc), "score")
    val want = viaWindow(df, 5, Nil, Seq(col("v").asc, col("id").asc))
    assertSame(got, want)
  }

  test("global ntile DESC with negated bucket and tie-key slice") {
    val rng = new scala.util.Random(7)
    val rows = (1L to 500L).map(i => (i, rng.nextInt(6).toLong))
    val df = rows.toDF("id", "freq")
    val got = Selection.ntileScore(df, 5, Nil,
      struct((-col("freq")).as("nf"), floor(col("id") / 64).as("ks")),
      Seq(col("freq").desc, col("id").asc), "score")
    val want = viaWindow(df, 5, Nil, Seq(col("freq").desc, col("id").asc))
    assertSame(got, want)
  }

  test("grouped ntile: hot group + groups smaller than k") {
    val rng = new scala.util.Random(3)
    // "en" holds 80% of rows (the hot-language shape); "tiny" has 2 < k
    val rows = (1L to 400L).map { i =>
      val g = if (i <= 320) "en" else if (i <= 398) "de" else "tiny"
      (i, g, rng.nextDouble())
    }
    val df = rows.toDF("id", "lang", "v")
    val got = Selection.ntileScore(df, 4, Seq("lang"),
      floor(col("v") * 10),
      Seq(col("v").asc, col("id").asc), "score")
    val want = viaWindow(df, 4, Seq("lang"),
      Seq(col("v").asc, col("id").asc))
    assertSame(got, want)
  }

  test("n < k degenerates to score = rank") {
    val df = Seq((1L, 10), (2L, 20), (3L, 15)).toDF("id", "v")
    val got = Selection.ntileScore(df, 5, Nil, col("v"),
      Seq(col("v").asc, col("id").asc), "score")
      .orderBy("score").select("id", "score")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(got == Seq((1L, 1), (3L, 2), (2L, 3)))
  }

  test("rfm rewrite is bit-identical to the three-window formulation") {
    val o = graft.sources.Tables.orders(spark, sf)
    val maxDate = o.agg(max(col("o_orderdate")).as("__maxd"))
    val base = o.groupBy(col("o_custkey"))
      .agg(max(col("o_orderdate")).as("__last"),
        count(lit(1)).as("frequency"),
        sum(col("o_totalprice").cast(graft.queries.Exact.Money))
          .as("__mon"))
      .crossJoin(broadcast(maxDate))
      .select(col("o_custkey"),
        datediff(col("__maxd"), col("__last")).as("recency_days"),
        col("frequency"), col("__mon").cast("double").as("monetary"))
    val want = base.select(col("o_custkey"), col("recency_days"),
      col("frequency"), col("monetary"),
      ntile(5).over(Window.orderBy(col("recency_days").asc,
        col("o_custkey").asc)).as("r_score"),
      ntile(5).over(Window.orderBy(col("frequency").desc,
        col("o_custkey").asc)).as("f_score"),
      ntile(5).over(Window.orderBy(col("monetary").desc,
        col("o_custkey").asc)).as("m_score"))
    val got = graft.queries.PipelineQueries.rfmSegments(spark, sf)
    assertSame(got, want)
  }

  test("ntileScores (fused grouping-sets counts) is bit-identical to " +
      "folding ntileScore over the specs") {
    val rng = new scala.util.Random(11)
    val df = (1L to 731L).map(i =>
      (i, rng.nextInt(15), rng.nextDouble() * 100)).toDF("id", "a", "b")
    val specs = Seq(
      (col("a").cast("long"), Seq(col("a").asc, col("id").asc), "sa"),
      (floor(-col("b") / 10), Seq(col("b").desc, col("id").asc), "sb"))
    val got = Selection.ntileScores(df, 7, specs)
    val want = specs.foldLeft(df) { case (acc, (bk, ord, out)) =>
      Selection.ntileScore(acc, 7, Nil, bk, ord, out)
    }
    assertSame(got, want)
  }

  test("curriculum rewrite matches the per-lang ntile formulation") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val scored = TextScore.unigramSurprisal(docs, "doc_id", "text")
      .join(docs.select("doc_id", "lang"), "doc_id")
    val want = scored.withColumn("bucket", ntile(4).over(
        Window.partitionBy("lang")
          .orderBy(col("avg_surprisal"), col("doc_id"))))
      .groupBy("lang", "bucket")
      .agg(count(lit(1)).as("n_docs"),
        round(avg("avg_surprisal"), 6).as("mean_score"),
        min("doc_id").as("first_doc"))
    val got = graft.queries.PipelineQueries.curriculumBuckets(spark, sf)
    assertSame(got, want)
  }
}
