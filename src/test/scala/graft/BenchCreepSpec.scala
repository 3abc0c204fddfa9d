package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the suite-level creep arithmetic (r14 verdict #2): sub-3×
  * per-query drift must still move the SUITE ratio, pending-ledgered
  * queries are excluded (their slowdown is adjudicated), and the
  * offender list is cur/best-descending. */
class BenchCreepSpec extends AnyFunSuite {

  test("ratio is sum(cur)/sum(best) over common positive unledgered " +
      "gates") {
    val best = Map("a" -> 1.0, "b" -> 2.0, "c" -> 1.0, "gone" -> 5.0)
    val cur = Map("a" -> 1.1, "b" -> 2.2, "c" -> -1.0, "new" -> 9.0)
    // common positive = {a, b}: (1.1+2.2)/(1.0+2.0) = 1.1; c failed
    // this run (-1), gone/new have no counterpart — all excluded
    val (ratio, offenders) = Bench.creepReport(cur, best, Set.empty)
    assert(math.abs(ratio - 1.1) < 1e-12, ratio.toString)
    assert(offenders.map(_._1) == Seq("a", "b"), offenders.toString)
  }

  test("a pending-ledgered query is excluded from ratio AND offenders; " +
      "compounding sub-3x drift still fires the suite bound") {
    val best = (1 to 20).map(i => s"q$i" -> 1.0).toMap
    // every query 1.2x — far below the 3x per-query trigger, but the
    // suite ratio must read 1.2 > CreepBound
    val cur = best.map { case (k, _) => k -> 1.2 }
    val (r0, _) = Bench.creepReport(cur, best, Set.empty)
    assert(math.abs(r0 - 1.2) < 1e-12 && r0 > Bench.CreepBound)
    // ledgering one big mover pulls it out of the arithmetic
    val cur2 = cur + ("q1" -> 100.0)
    val (r1, off1) = Bench.creepReport(cur2, best, Set("q1"))
    assert(math.abs(r1 - 1.2) < 1e-12, r1.toString)
    assert(!off1.exists(_._1 == "q1"), off1.toString)
  }

  test("offenders rank by cur/best descending, capped at 10, " +
      "name-stable on ties") {
    val best = (1 to 15).map(i => s"q$i" -> 1.0).toMap
    val cur = (1 to 15).map(i => s"q$i" -> (1.0 + i * 0.1)).toMap
    val (_, off) = Bench.creepReport(cur, best, Set.empty)
    assert(off.size == 10)
    assert(off.head._1 == "q15" && off.last._1 == "q6", off.toString)
    val flat = Map("b" -> 1.0, "a" -> 1.0)
    val (_, tied) = Bench.creepReport(flat, flat, Set.empty)
    assert(tied.map(_._1) == Seq("a", "b"), tied.toString)
  }

  test("gates with floors under MinCreepFloor don't vote in the ratio " +
      "(scheduler-latency measurements, r15 verdict #8)") {
    val best = Map("big" -> 2.0, "tiny" -> 0.1, "edge" -> 0.3)
    // tiny 10x over its floor would read as 1.5x suite creep — but a
    // 0.1 s floor doubling is dispatch jitter; only big+edge vote
    val cur = Map("big" -> 2.0, "tiny" -> 1.0, "edge" -> 0.3)
    val (r, off) = Bench.creepReport(cur, best, Set.empty)
    assert(math.abs(r - 1.0) < 1e-12, r.toString)
    assert(!off.exists(_._1 == "tiny") && off.exists(_._1 == "edge"),
      off.toString)
  }

  test("confirm-rep targets are the >=ConfirmRatio offenders, in " +
      "offender order (r16 verdict #1: an over-bound suite ratio is " +
      "only actionable with in-run adjudication attached)") {
    val off = Seq(
      ("q_hot", 3.0, 1.0, 3.0),
      ("q_warm", 1.4, 1.0, 1.4),
      ("q_jitter", 1.2, 1.0, 1.2))
    assert(Bench.confirmTargets(off) == Seq("q_hot", "q_warm"))
    assert(Bench.confirmTargets(Seq.empty).isEmpty)
    // exactly at the ratio is in (the boundary offender can still
    // explain part of an over-bound ratio)
    assert(Bench.confirmTargets(
      Seq(("q", 1.3, 1.0, Bench.ConfirmRatio))) == Seq("q"))
  }

  test("empty intersection yields the neutral ratio 1.0") {
    val (r, off) = Bench.creepReport(Map("a" -> 1.0),
      Map("b" -> 1.0), Set.empty)
    assert(r == 1.0 && off.isEmpty)
  }
}
