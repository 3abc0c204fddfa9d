package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Reference-simulation oracles for the link-graph tier: the distributed
  * PageRank must match a driver-side simulation of the same recurrence,
  * conserve rank mass, and hold its permutation-graph fixed point. */
class GraphSpec extends SparkSpec {

  import spark.implicits._

  /** Driver-side reference: same recurrence, same op order per node
    * (inflow summed over sorted source ids — summation order differences
    * are what round-trip tolerance absorbs below). */
  private def simulate(edges: Seq[(Long, Long)], iters: Int,
      d: Double = 0.85): Map[Long, Double] = {
    val es = edges.distinct
    val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val n = nodes.size.toDouble
    val out = es.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    val in = es.groupBy(_._2).view.mapValues(_.map(_._1).sorted).toMap
    var pr = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val dm = nodes.filterNot(out.contains).map(pr).sum
      pr = nodes.map { v =>
        val inflow = in.getOrElse(v, Nil).map(u => pr(u) / out(u)).sum
        v -> ((1.0 - d) / n + d * (inflow + dm / n))
      }.toMap
    }
    pr
  }

  test("triangle counts: K4, pendant, star, dirty edge input") {
    // K4 on {1,2,3,4}: C(4,3)=4 triangles, every node in exactly 3.
    val k4 = (for {
      a <- 1L to 4L; b <- 1L to 4L if a < b
    } yield (a, b))
    // dirty input: duplicates, reversed copies, self-loops — must
    // canonicalize away
    val dirty = k4 ++ k4.map(_.swap) ++ Seq((1L, 1L), (2L, 2L))
    val got = Graph.triangleCounts(dirty.toDF("src", "dst")
        .repartition(3), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))

    // triangle {1,2,3} + pendant 3—4: pendant never appears
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    val got2 = Graph.triangleCounts(tri.toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2 == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))

    // star (hub 0 to 8 leaves): zero triangles, empty output — and the
    // degree orientation points every edge AT the hub (out-deg ≤ 1
    // everywhere), the shape that keeps wedge cost sub-quadratic
    val star = (1L to 8L).map(l => (0L, l))
    assert(Graph.triangleCounts(star.toDF("src", "dst"), "src", "dst")
      .count() == 0L)
  }

  test("DOULION approximate triangles: p=1 is the exact path; " +
      "p<1 is exactly the sampled-subgraph count scaled by 1/p³") {
    val k10 = (for { a <- 1L to 10L; b <- 1L to 10L if a < b }
      yield (a, b)).toDF("src", "dst")
    // p = 1: identical to exact (every node in C(9,2) = 36 triangles)
    val full = Graph.triangleCountsApprox(k10, "src", "dst", p = 1.0)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(full === (1L to 10L).map(_ -> 36.0).toMap)
    // p < 1: replay the deterministic hash coin to derive the sampled
    // subgraph, and assert est = exact(sample) / p³ node-for-node —
    // the estimator contract, free of sampling-luck tolerances
    val p = 0.6
    val seed = 42L
    val kept = k10.select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(pmod(xxhash64(col("a"), col("b"), lit(seed)),
        lit(1000000L)) < lit((p * 1000000L).toLong))
    val exactOnSample = Graph.triangleCounts(kept, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val est = Graph.triangleCountsApprox(k10, "src", "dst", p, seed)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(est.keySet === exactOnSample.keySet)
    est.foreach { case (n, e) =>
      assert(math.abs(e - exactOnSample(n) / (p * p * p)) < 1e-9) }
    assert(exactOnSample.nonEmpty, "sample should retain some triangles")
    intercept[IllegalArgumentException] {
      Graph.triangleCountsApprox(k10, "src", "dst", 0.0)
    }
  }

  test("distributed PageRank matches the reference simulation") {
    // diamond + a dangling sink: a→b, a→c, b→d, c→d (d has no out-edges)
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L))
    val got = Graph.pageRank(edges.toDF("src", "dst").repartition(3),
        "src", "dst", iterations = 8)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = simulate(edges, 8)
    assert(got.keySet == want.keySet)
    got.foreach { case (v, p) =>
      assert(math.abs(p - want(v)) < 1e-12, s"node $v: $p vs ${want(v)}")
    }
    // structure: the sink collects the most mass, the source the least
    assert(got(4L) > got(2L) && got(2L) > got(1L))
    assert(math.abs(got(2L) - got(3L)) < 1e-15, "b and c are symmetric")
  }

  test("rank mass is conserved each run (dangling mass redistributed)") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L))
    val total = Graph.pageRank(edges.toDF("src", "dst"), "src", "dst",
        iterations = 6)
      .agg(sum("pr")).head().getDouble(0)
    assert(math.abs(total - 1.0) < 1e-9, s"mass leaked: $total")
  }

  test("permutation graph holds the uniform fixed point exactly at 9dp") {
    val edges = (0L to 7L).map(i => (i, (i + 1) % 8))
    val got = Graph.pageRankRounded(edges.toDF("src", "dst"),
        "src", "dst", iterations = 5)
      .collect().map(r => r.getDouble(1)).toSet
    assert(got == Set(0.125), s"got $got")
  }

  test("degree stats count distinct partners and raw multiplicities") {
    val edges = Seq((1L, 2L), (1L, 2L), (1L, 3L), (2L, 3L))
      .toDF("src", "dst")
    val got = Graph.degreeStats(edges, "src", "dst")
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got(1L) == ((2L, 0L, 3L, 0L)), "1: out {2,3}, 3 raw edges")
    assert(got(2L) == ((1L, 1L, 1L, 2L)), "2: out {3}, in {1} twice")
    assert(got(3L) == ((0L, 2L, 0L, 2L)), "3: pure sink")
  }

  test("LPA: bridge loses to clique majority; components would merge") {
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 2L),
      (10L, 11L), (10L, 12L), (11L, 12L),
      (2L, 10L), (20L, 21L)).toDF("src", "dst")
    val lpa = Graph.labelPropagation(edges, "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lpa === Map(0L -> 0L, 1L -> 0L, 2L -> 0L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
    // the contrast that makes LPA a different operator: components
    // reachability merges the bridged triangles into ONE label
    val cc = Graph.connectedComponents(edges, "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc(10L) == 0L && cc(12L) == 0L, s"components must merge: $cc")
  }

  test("LPA: self-vote kills the two-node oscillation; K2,2 converges") {
    val single = Seq((5L, 9L)).toDF("src", "dst")
    val got = Graph.labelPropagation(single, "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(5L -> 5L, 9L -> 5L))
    val k22 = Seq((0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L))
      .toDF("src", "dst")
    val got22 = Graph.labelPropagation(k22, "src", "dst")
      .collect().map(r => r.getLong(1)).toSet
    assert(got22 == Set(0L), s"K2,2 must flood to 0: $got22")
  }

  test("LPA fails loudly when the round cap is hit") {
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 10L),
      (10L, 11L), (10L, 12L), (11L, 12L)).toDF("src", "dst")
    val ex = intercept[IllegalArgumentException] {
      Graph.labelPropagation(edges, "src", "dst", maxRounds = 1)
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  test("weighted PageRank: weights shift rank vs the uniform split; " +
      "bad weights raise; mass conserved") {
    // star: 0 -> 1 (w 9), 0 -> 2 (w 1); 1 -> 0, 2 -> 0 close the loop
    val edges = Seq((0L, 1L, 9.0), (0L, 2L, 1.0),
      (1L, 0L, 1.0), (2L, 0L, 1.0)).toDF("src", "dst", "w")
    val wr = Graph.pageRankWeighted(edges, "src", "dst", "w",
        iterations = 8)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ur = Graph.pageRank(edges.select("src", "dst"), "src", "dst",
        iterations = 8)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(wr(1L) > ur(1L) + 0.1 && wr(2L) < ur(2L) - 0.1,
      s"weights must shift rank: weighted $wr vs uniform $ur")
    assert(math.abs(wr.values.sum - 1.0) < 1e-9, "mass conserved")
    val bad = Seq((0L, 1L, 0.0)).toDF("src", "dst", "w")
    val ex = intercept[Exception] {
      Graph.pageRankWeighted(bad, "src", "dst", "w", iterations = 1)
        .collect()
    }
    assert(ex.getMessage.contains("must be positive"))
  }

  test("weighted PageRank: parallel duplicate edges merge additively") {
    // 0 -> 1 twice at w 4.5 == 0 -> 1 once at w 9 (vs 0 -> 2 at w 1)
    val dup = Seq((0L, 1L, 4.5), (0L, 1L, 4.5), (0L, 2L, 1.0),
      (1L, 0L, 1.0), (2L, 0L, 1.0)).toDF("src", "dst", "w")
    val one = Seq((0L, 1L, 9.0), (0L, 2L, 1.0),
      (1L, 0L, 1.0), (2L, 0L, 1.0)).toDF("src", "dst", "w")
    val a = Graph.pageRankWeighted(dup, "src", "dst", "w", iterations = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = Graph.pageRankWeighted(one, "src", "dst", "w", iterations = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    a.foreach { case (k, v) => assert(math.abs(v - b(k)) < 1e-12) }
  }

  test("bfsHops: levels, early stop, unreachable absent, direction") {
    // path 1-2-3-4 plus isolated edge 9-10: BFS from 1
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (9L, 10L))
      .toDF("src", "dst").repartition(3)
    val got = Graph.bfsHops(e, "src", "dst", Seq(1L), maxHops = 8)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3))

    // hop cap truncates the level set instead of running past it
    val capped = Graph.bfsHops(e, "src", "dst", Seq(1L), maxHops = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(capped == Map(1L -> 0, 2L -> 1, 3L -> 2))

    // directed: 4 has no out-edges, so only the source comes back;
    // multi-source takes the nearest seed per node
    val dir = Graph.bfsHops(e, "src", "dst", Seq(4L), maxHops = 8,
      undirected = false).collect().map(r => r.getLong(0)).toSeq
    assert(dir == Seq(4L))
    val multi = Graph.bfsHops(e, "src", "dst", Seq(1L, 4L), maxHops = 8)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(multi == Map(1L -> 0, 2L -> 1, 3L -> 1, 4L -> 0))
  }

  test("shortestPathsWeighted: cheap long path beats expensive hop") {
    // 1->4 direct costs 10; 1->2->3->4 costs 1+1+1 = 3
    val e = Seq((1L, 4L, 10L), (1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L))
      .toDF("src", "dst", "w").repartition(3)
    val got = Graph.shortestPathsWeighted(e, "src", "dst", "w", Seq(1L),
      maxHops = 10).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))

    // parallel edges collapse to the cheapest; hop cap binds exactly
    val par = Seq((1L, 2L, 5L), (1L, 2L, 2L), (2L, 3L, 2L))
      .toDF("src", "dst", "w")
    val got2 = Graph.shortestPathsWeighted(par, "src", "dst", "w",
      Seq(1L), maxHops = 1, undirected = false)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2 == Map(1L -> 0L, 2L -> 2L))

    // negative weight fails loudly in-plan, never a silent wrong dist
    val neg = Seq((1L, 2L, -1L)).toDF("src", "dst", "w")
    val ex = intercept[Exception] {
      Graph.shortestPathsWeighted(neg, "src", "dst", "w", Seq(1L),
        maxHops = 2).collect()
    }
    assert(ex.getMessage.contains("negative weight") ||
      Option(ex.getCause).exists(_.getMessage.contains("negative weight")))
  }

  test("modularity: hand-computed Q on the planted triangle graph") {
    import spark.implicits._
    // triangles {0,1,2} and {10,11,12} bridged by 2-10, pair {20,21}:
    // m=8; L_c = 3,3,1; d_c = 7,7,2
    // Q = (3/8 - 49/256) + (3/8 - 49/256) + (1/8 - 4/256) = 122/256
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 2L), (10L, 11L),
      (10L, 12L), (11L, 12L), (2L, 10L), (20L, 21L)).toDF("src", "dst")
    val assign = Seq((0L, 0L), (1L, 0L), (2L, 0L), (10L, 10L),
      (11L, 10L), (12L, 10L), (20L, 20L), (21L, 20L))
      .toDF("node", "label")
    val r = Graph.modularity(edges, "src", "dst", assign,
      "node", "label").collect().head
    assert((r.getLong(0), r.getLong(1)) == ((8L, 3L)), r.toString)
    assert(r.getDouble(2) === 122.0 / 256.0, r.toString)
    // everything in one community: Q = 1 - 1 = 0 exactly
    val one = assign.select(col("node"), lit(0L).as("label"))
    assert(Graph.modularity(edges, "src", "dst", one, "node", "label")
      .collect().head.getDouble(2) === 0.0)
  }

  test("modularity raises on a missing endpoint, a duplicate " +
      "assignment, and an empty edge set") {
    import spark.implicits._
    val edges = Seq((0L, 1L), (1L, 2L)).toDF("src", "dst")
    val partial = Seq((0L, 0L), (1L, 0L)).toDF("node", "label")
    val e1 = intercept[Exception] {
      Graph.modularity(edges, "src", "dst", partial, "node", "label")
        .collect()
    }
    assert(e1.getMessage.contains("missing from the assignment"),
      e1.getMessage)
    val dup = Seq((0L, 0L), (0L, 1L), (1L, 0L), (2L, 0L))
      .toDF("node", "label")
    val e2 = intercept[Exception] {
      Graph.modularity(edges, "src", "dst", dup, "node", "label")
        .collect()
    }
    assert(e2.getMessage.contains("duplicate assignment"), e2.getMessage)
    val e3 = intercept[Exception] {
      Graph.modularity(edges.filter(col("src") > 99), "src", "dst",
        Seq((0L, 0L)).toDF("node", "label"), "node", "label").collect()
    }
    assert(e3.getMessage.contains("empty edge set"), e3.getMessage)
  }
  // moved from AgreementSpec (round 13: specs named for what they test)
  test("assortativity: star is maximally disassortative, chain-end reference") {
    // star K(1,4): every edge pairs degree 4 with degree 1 → after
    // symmetrization x and y are exact mirrors → r = -1
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L))
    val gs = Graph.assortativity(star.toDF("src", "dst"), "src", "dst")
      .collect().head
    assert(gs.getLong(0) == 4 && gs.getDouble(1) == -1.0)
    // path 1-2-3-4: driver-side Pearson over symmetrized degree pairs
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val deg = Map(1L -> 1.0, 2L -> 2.0, 3L -> 2.0, 4L -> 1.0)
    val xs = path.flatMap { case (u, v) =>
      Seq((deg(u), deg(v)), (deg(v), deg(u))) }
    val cnt = xs.length
    val sx = xs.map(_._1).sum; val sxy = xs.map(p => p._1 * p._2).sum
    val sxx = xs.map(p => p._1 * p._1).sum
    val refR = (cnt * sxy - sx * sx) / (cnt * sxx - sx * sx)
    val gp = Graph.assortativity(path.toDF("src", "dst"), "src", "dst")
      .collect().head
    assert(math.abs(gp.getDouble(1) - refR) < 1e-12)
  }

  test("assortativity: regular graph (zero variance) raises") {
    val ring = Seq((1L, 2L), (2L, 3L), (3L, 1L)) // all degree 2
    val e = intercept[Exception] {
      Graph.assortativity(ring.toDF("src", "dst"), "src", "dst")
        .collect()
    }
    assert(e.getMessage.contains("zero degree variance"))
  }

}
