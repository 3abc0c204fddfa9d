package graft.queries

import graft.SparkSpec

/** Plan-shape guards (the 100 TB posture, SURVEY §4.2/§7.4): these assert
  * the physical plan the engine relies on — pushdown reaching the scan,
  * dimension joins broadcasting, global top-k compiling to
  * TakeOrderedAndProject, and the range join never degenerating into a
  * cartesian product. A regression here is a scale bug even when results
  * stay correct. */
class PlanShapeSpec extends SparkSpec {

  private def plan(q: (org.apache.spark.sql.SparkSession, String) =>
      org.apache.spark.sql.DataFrame): String =
    q(spark, sf).queryExecution.executedPlan.toString

  test("filter predicates push into the parquet scan") {
    val p = plan(RelationalQueries.filterPred)
    assert(p.contains("PushedFilters: ["), p.take(2000))
    // the FileScan one-liner truncates the filter list; the shipdate
    // bound appearing inside PushedFilters proves pushdown reached parquet
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), "shipdate pushed")
  }

  test("column pruning: scan reads only projected columns") {
    val p = plan(RelationalQueries.projCompute)
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_orderkey") &&
      readSchema.contains("l_discount"))
    assert(!readSchema.contains("l_shipdate") &&
      !readSchema.contains("l_returnflag"),
      s"unneeded columns must be pruned: $readSchema")
  }

  test("dimension join broadcasts, no shuffle of the small side") {
    val p = plan(RelationalQueries.joinBroadcast)
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
  }

  test("global top-k compiles to TakeOrderedAndProject") {
    val p = plan(RelationalQueries.topkOrders)
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
  }

  test("range join keeps its equi component (no cartesian/BNLJ)") {
    val p = plan(RelationalQueries.joinRange)
    assert(!p.contains("CartesianProduct"), "cartesian at scale = death")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "range condition must ride the hash join as residual")
  }

  test("q1 aggregate does map-side partial aggregation") {
    val p = plan(RelationalQueries.q1Agg)
    val hashAggs = p.linesIterator.count(_.contains("HashAggregate"))
    assert(hashAggs >= 2, s"expected partial+final HashAggregate:\n${p.take(1200)}")
  }

  test("sortWithinPartitions sorts locally without an exchange (E21)") {
    val df = graft.sources.Tables.lineitem(spark, sf)
      .sortWithinPartitions("l_shipdate")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("Sort [l_shipdate"), p.take(800))
    assert(!p.contains("Exchange"), "local sort must not shuffle")
  }

  test("CDC compaction partial-aggregates before the shuffle, no window") {
    val p = plan(PipelineQueries.latestPerKey)
    // max_by's struct buffer forces SortAggregate (no mutable hash
    // buffer), but the scale property is the same as hash agg: the
    // partial phase reduces to one row per (task, key) BEFORE the
    // exchange, so the shuffle never carries key history
    val exchangeAt = p.indexOf("Exchange")
    val partialAt = p.indexOf("partial_max_by")
    assert(partialAt >= 0, s"no partial max_by:\n${p.take(1200)}")
    assert(exchangeAt >= 0 && exchangeAt < partialAt,
      "partial aggregation must run map-side, below the exchange")
    assert(!p.contains("Window"), "latest-per-key must not sort key history")
  }

  test("stratified sample plans the custom TopKPerGroup operator") {
    val p = plan(PipelineQueries.sampleStratified)
    assert(p.contains("TopKPerGroup"), p.take(1200))
  }

  test("BM25 explodes only query-term tokens (in-array filter first)") {
    val df = PipelineQueries.bm25Search(spark, sf)
    val analyzed = df.queryExecution.optimizedPlan.toString
    // the generator's input must be the filtered array (qtoks), never the
    // raw token array — at 100 TB exploding every token is the bottleneck
    val genLine = analyzed.linesIterator.find(_.contains("Generate explode"))
      .getOrElse(fail(s"no explode in plan:\n${analyzed.take(1500)}"))
    assert(genLine.contains("qtoks"), s"explode must consume qtoks: $genLine")
  }

  test("e2e pipeline: no exchange carries a text byte") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val textShuffles = PipelineQueries.pipelineE2e(spark, sf)
        .queryExecution.executedPlan.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
              if e.output.exists(_.name == "text") => e.output.map(_.name)
        }
      assert(textShuffles.isEmpty,
        s"text must be consumed at the scan: $textShuffles")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("PQ kernels stay inside whole-stage codegen") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val books = graft.operators.Pq.trainCodebooks(emb, "vec_id", "embedding")
    val df = graft.operators.Pq.encode(emb, "embedding", books)
    val qe = df.queryExecution
    qe.executedPlan.execute().count()
    val p = qe.executedPlan.toString
    val projLine = p.linesIterator
      .find(l => l.contains("Project") && l.contains("pq_encode"))
      .getOrElse(fail(s"no pq_encode projection:\n${p.take(1200)}"))
    assert(projLine.contains("*("), s"pq_encode fell out of codegen: $projLine")
  }

  test("LATERAL top-k decorrelates: ranked window, no per-row subquery") {
    val p = plan(RelationalQueries.lateralTopK)
    // DecorrelateInnerQuery rewrites the correlated ORDER BY+LIMIT into
    // a partitioned Window rank — per-row subquery execution would show
    // as a nested-loop over a subquery, cartesian death at scale
    assert(p.contains("Window"), p.take(1500))
    assert(!p.contains("CartesianProduct"), "lateral must not cartesian")
  }

  test("vector kernels run inside whole-stage codegen") {
    val df = VectorQueries.vectorCosine(spark, sf)
    val qe = df.queryExecution
    qe.executedPlan.execute().count() // finalize THIS execution's AQE plan
    val p = qe.executedPlan.toString
    // the `*(n)` prefix marks whole-stage-codegen membership in plan dumps
    val projLine = p.linesIterator
      .find(l => l.contains("Project") && l.contains("cosine_sim"))
      .getOrElse(fail(s"no cosine_sim projection in plan:\n${p.take(1200)}"))
    assert(projLine.contains("*("), s"kernel fell out of codegen: $projLine")
  }

  test("global sequence: no unpartitioned window over the data rows") {
    // the operator's whole point: the only ORDER-BY-everything window
    // runs over the per-bucket COUNT table; every window over event
    // rows must be partitioned (windowspecdefinition with a partition
    // list). An unpartitioned data window = one-task sort at 100 TB.
    val p = plan(PipelineQueries.globalSeq)
    val dataWindows = p.linesIterator.filter(l =>
      l.contains("windowspecdefinition(") && l.contains("row_number"))
    dataWindows.foreach { l =>
      val spec = l.substring(l.indexOf("windowspecdefinition(") + 21)
      assert(!spec.trim.startsWith("ts#") || spec.contains(","),
        s"row_number window must be bucket-partitioned: $l")
    }
    assert(p.contains("row_number"), "bucketed row_number present")
  }

  test("interval-overlap join: bucketed form plans no nested loop") {
    val p = plan(PipelineQueries.intervalOverlap)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "bucket decomposition must equi-join")
  }

  test("Q2 correlated scalar min decorrelates to aggregate + join") {
    val p = plan(RelationalQueries.q2MinCost)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "per-row subquery execution = nested loop death at scale")
    // the correlated (SELECT min(...) WHERE l_partkey = p_partkey)
    // must surface as a per-partkey min aggregate joined back
    assert(p.contains("min(l_extendedprice"), p.take(1500))
    assert(p.contains("TakeOrderedAndProject"), "top-100 must not sort globally")
  }

  test("Q4 EXISTS rewrites to a left semi join") {
    val p = plan(RelationalQueries.q4PriorityExists)
    assert(p.contains("LeftSemi"), p.take(1500))
    assert(p.contains("PushedFilters"), "date filter pushes to orders scan")
  }

  test("Q20 nested IN chain plans ids-only semi joins, no nested loop") {
    val p = plan(RelationalQueries.q20SemiChain)
    assert(p.contains("LeftSemi"), p.take(1500))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
  }

  test("Q6 pure scan aggregate: all predicates push to parquet, no join") {
    val p = plan(RelationalQueries.q6Forecast)
    assert(p.contains("PushedFilters: ["), p.take(1500))
    // the FileScan one-liner truncates the filter list mid-token —
    // match the prefix that survives truncation
    assert(p.contains("GreaterThanOrEqual(l_shipda"), "shipdate pushed")
    assert(!p.contains("Join"), "Q6 must not plan any join")
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 2,
      "partial+final aggregate")
  }

  test("Q16 NOT IN blacklist plans an anti join, never a nested loop " +
      "over the fact table") {
    val p = plan(RelationalQueries.q16SupplierCnt)
    assert(!p.contains("CartesianProduct"), p.take(1500))
    // NOT IN rewrites to a null-aware anti join; the blacklist side is
    // tiny and must broadcast (BroadcastNestedLoopJoin with buildSide
    // LeftAnti-NAAJ or BroadcastHashJoin LeftAnti are both
    // broadcast-shaped — what's forbidden is a shuffled NL or cartesian)
    assert(p.contains("LeftAnti"), s"NOT IN must plan anti join:\n${p.take(1500)}")
  }

  test("Q9 profit tree: dims broadcast, only the orders join shuffles") {
    val p = plan(RelationalQueries.q9Profit)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("BroadcastHashJoin"),
      "part/supplier/nation must broadcast")
  }

  test("sweep: no registered batch query plans an unpartitioned window " +
      "over data rows") {
    // `OVER (ORDER BY ...)` with an empty partition list moves EVERY row
    // to one task — the q_rfm_segments class (r9 verdict: three global
    // ntile windows = every customer through one task at 100 TB).
    // Deliberately bounded single-partition windows (bucket-count
    // offsets in Sequence/Selection/Drift, Tokenize's top-V vocab ids)
    // carry the Bounded.constPart marker — a NON-empty constant
    // partition spec that EliminateWindowPartitions cannot fold — so an
    // empty spec surviving to the optimized plan is a genuine scale
    // bug, with no allowlist needed. Streaming replays are excluded
    // (constructing them runs them); their stateful shapes are covered
    // by the streaming specs.
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filterNot(_.startsWith("q_stream"))
    val offenders = names.flatMap { name =>
      try {
        graft.SparkEntry.queries(name)(spark, sf)
          .queryExecution.optimizedPlan.collect {
            case w: org.apache.spark.sql.catalyst.plans.logical.Window
                if w.partitionSpec.isEmpty =>
              s"$name: unpartitioned Window[" +
                w.windowExpressions.map(_.name).mkString(",") + "]"
          }
      } catch {
        case e: Throwable => Seq(s"$name: PLAN FAILED ${e.getMessage}")
      }
    }
    assert(offenders.isEmpty,
      s"one-task window sort at scale:\n  ${offenders.mkString("\n  ")}")
  }

  test("set-sim join: candidate self-join reuses the prefix exchange") {
    // the GATE now serves the persisted pair artifact (a bare scan), so
    // assert the plan shape on the operator itself — the artifact build
    // runs this exact plan
    val df = graft.operators.SetSimJoin.joinByJaccard(
      DedupQueries.shingledDocs(spark, sf, outCol = "toks"),
      "doc_id", "toks", 0.6)
    val qe = df.queryExecution
    qe.executedPlan.execute().count()
    val p = qe.executedPlan.toString
    // both sides of the prefix self-join hang off identical subtrees;
    // after AQE at least one exchange must be reused, not recomputed
    assert(p.contains("ReusedExchange") || p.contains("ReusedQueryStage") ||
      p.contains("BroadcastQueryStage"),
      s"prefix self-join recomputes its subtree:\n${p.take(1500)}")
  }
}
