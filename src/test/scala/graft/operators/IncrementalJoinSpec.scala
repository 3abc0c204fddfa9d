package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Join-view maintenance must equal the from-scratch join of the
  * post-delta states — including the cross term when both sides change
  * in one batch — and fail loudly on inconsistent deltas. */
class IncrementalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def a = Seq((1L, 10L, "a1"), (2L, 10L, "a2"), (3L, 20L, "a3"),
    (4L, 30L, "a4")).toDF("aid", "k", "av")
  private def b = Seq((10L, "b10"), (20L, "b20"), (40L, "b40"))
    .toDF("k", "bv")

  private def scratch(aNew: org.apache.spark.sql.DataFrame,
      bNew: org.apache.spark.sql.DataFrame) = aNew.join(bNew, "k")

  private def same(x: org.apache.spark.sql.DataFrame,
      y: org.apache.spark.sql.DataFrame): Boolean =
    x.exceptAll(y).isEmpty && y.exceptAll(x).isEmpty

  test("refresh ≡ from-scratch under mixed same-batch deltas, " +
      "including the cross term") {
    val view = scratch(a, b)
    // delete a2; insert a5 on key 20 and a6 on key 10; delete b10
    // (cascades a1/a2/a6 out — a6 is the insert-x-delete cross case);
    // insert b30 (catches a4)
    val dA = Seq((2L, 10L, "a2", -1), (5L, 20L, "a5", 1),
      (6L, 10L, "a6", 1)).toDF("aid", "k", "av", "op")
    val dB = Seq((10L, "b10", -1), (30L, "b30", 1)).toDF("k", "bv", "op")
    val aNew = a.filter($"aid" =!= 2L)
      .unionByName(Seq((5L, 20L, "a5"), (6L, 10L, "a6"))
        .toDF("aid", "k", "av"))
    val bNew = b.filter($"k" =!= 10L)
      .unionByName(Seq((30L, "b30")).toDF("k", "bv"))
    val got = IncrementalJoin.refresh(view, a, b, dA, dB, Seq("k"))
    assert(same(got, scratch(aNew, bNew)))
  }

  test("chained refreshes stay drift-free") {
    val d1A = Seq((5L, 20L, "a5", 1)).toDF("aid", "k", "av", "op")
    val d1B = Seq((40L, "b40", -1)).toDF("k", "bv", "op")
    val a1 = a.unionByName(Seq((5L, 20L, "a5")).toDF("aid", "k", "av"))
    val b1 = b.filter($"k" =!= 40L)
    val v1 = IncrementalJoin.refresh(scratch(a, b), a, b, d1A, d1B,
      Seq("k"))
    val d2A = Seq((1L, 10L, "a1", -1)).toDF("aid", "k", "av", "op")
    val d2B = Seq((50L, "b50", 1)).toDF("k", "bv", "op")
    val a2 = a1.filter($"aid" =!= 1L)
    val b2 = b1.unionByName(Seq((50L, "b50")).toDF("k", "bv"))
    val v2 = IncrementalJoin.refresh(v1, a1, b1, d2A, d2B, Seq("k"))
    assert(same(v2, scratch(a2, b2)))
  }

  test("null join keys never join; duplicate view rows keep counts") {
    val aN = Seq((Some(1L), Option.empty[Long], "x"),
      (Some(2L), Some(10L), "y"), (Some(3L), Some(10L), "y"))
      .toDF("aid", "k", "av").drop("aid") // (k, av): two identical rows
    val bN = Seq(10L -> "b").toDF("k", "bv")
    val view = aN.join(bN, "k") // (k=10, y, b) ×2
    val dA = Seq((Some(10L), "y", -1)).toDF("k", "av", "op")
    val dB = bN.limit(0).withColumn("op", lit(1)).limit(0)
    val got = IncrementalJoin.refresh(view, aN, bN, dA, dB, Seq("k"))
    // one of the two identical rows deleted → exactly one remains
    assert(got.count() === 1L)
  }

  test("view side reaches the merge with NO full-width exchange " +
      "(touched-rows discipline)") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val view = scratch(a, b)
    val dA = Seq((2L, 10L, "a2", -1), (5L, 20L, "a5", 1))
      .toDF("aid", "k", "av", "op")
    val dB = Seq((10L, "b10", -1)).toDF("k", "bv", "op")
    val refreshed = IncrementalJoin.refresh(view, a, b, dA, dB, Seq("k"))
    val plan = refreshed.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive
          .AdaptiveSparkPlanExec => a.inputPlan
      case p => p
    }
    // the untouched-majority branch: a broadcast ANTI join whose
    // streamed (view) child contains no shuffle — at 100 TB this is the
    // difference between a map-only pass and a full-table shuffle
    val antis = plan.collect {
      case j: BroadcastHashJoinExec
          if j.joinType == org.apache.spark.sql.catalyst.plans.LeftAnti => j
    }
    assert(antis.nonEmpty,
      s"expected broadcast anti split:\n${plan.toString.take(2000)}")
    def shuffles(p: SparkPlan): Seq[ShuffleExchangeExec] =
      p.collect { case e: ShuffleExchangeExec => e }
    // only the delta (build/broadcast) side may shuffle — the streamed
    // view side must be exchange-free
    antis.foreach { j =>
      val streamed = j.buildSide match {
        case org.apache.spark.sql.catalyst.optimizer.BuildRight => j.left
        case _ => j.right
      }
      assert(shuffles(streamed).isEmpty,
        s"view side must not shuffle:\n${streamed.toString.take(2000)}")
    }
    // and the result is still the from-scratch join
    val aNew = a.filter($"aid" =!= 2L)
      .unionByName(Seq((5L, 20L, "a5")).toDF("aid", "k", "av"))
    val bNew = b.filter($"k" =!= 10L)
    assert(same(refreshed, scratch(aNew, bNew)))
  }

  test("deleting a row the view does not hold fails loudly") {
    val view = scratch(a, b)
    val dA = Seq((99L, 10L, "ghost", -1)).toDF("aid", "k", "av", "op")
    // ghost deletion against bOld yields a -1 view row that the view
    // lacks → negative net must raise, not clamp
    val dB = b.limit(0).withColumn("op", lit(1)).limit(0)
    val ex = intercept[Exception] {
      IncrementalJoin.refresh(view, a, b, dA, dB, Seq("k")).collect()
    }
    assert(ex.getMessage.contains("delta deletes a row"))
  }
}
