package graft

import org.scalatest.funsuite.AnyFunSuite

/** Audit gates for the BENCH_BEST ratchet-reset ledger (r13 verdict
  * "what's wrong" #1: the min-merge prior is right, but nothing
  * structurally distinguished a documented deliberate reset from a
  * quiet BENCH_BEST edit that hides a regression).
  *
  * The contract: BENCH_BEST.json is written ONLY by [[Bench]], which
  * only ratchets down ([[Bench.minMerge]]) — except for queries with a
  * pending RATCHET_RESETS.json row, whose priors are dropped so the
  * next full run re-baselines them and flips the row `applied`. These
  * tests pin the machinery and the committed-artifact invariants a
  * quiet manual edit would break. Runs from the repo root (sbt cwd),
  * like Bench itself. */
class RatchetLedgerSpec extends AnyFunSuite {

  test("ledger parses, rows are well-formed, queries are registered") {
    val rows = Bench.readLedger()
    assert(rows.nonEmpty, "RATCHET_RESETS.json missing or empty — the " +
      "r13 ANN resets must stay backfilled")
    rows.foreach { r =>
      if (r.query == Bench.SuiteResetQuery) {
        // suite-wide environment re-baseline: the old floors must be
        // preserved in a committed snapshot the reason names
        assert(r.reason.contains("BENCH_BEST_"),
          s"suite reset row must name its floors snapshot: '${r.reason}'")
        val snap = "BENCH_BEST_\\w+\\.json".r.findFirstIn(r.reason).get
        assert(new java.io.File(snap).isFile,
          s"suite reset names missing snapshot $snap")
        assert(Bench.readQueryMap(snap).nonEmpty,
          s"floors snapshot $snap is empty")
      } else {
        assert(r.query.startsWith("q_"), s"odd query name: ${r.query}")
        assert(SparkEntry.queries.contains(r.query),
          s"ledger row for unregistered query ${r.query}")
      }
      assert(r.oldBest > 0, s"${r.query}: old_best must be positive")
      assert(r.reason.length >= 20,
        s"${r.query}: reason too thin to audit: '${r.reason}'")
      assert(r.round >= 1, s"${r.query}: bad round ${r.round}")
    }
    assert(rows.groupBy(r => (r.query, r.round)).forall(_._2.size == 1),
      "duplicate (query, round) ledger rows")
  }

  test("BENCH_BEST never exceeds the last full run (the invariant a " +
      "quiet manual raise breaks)") {
    val best = Bench.readQueryMap("BENCH_BEST.json")
    val last = Bench.readQueryMap("BENCH.json")
    assert(best.nonEmpty && last.nonEmpty,
      "committed bench artifacts missing")
    val pending = Bench.readLedger().filterNot(_.applied).map(_.query).toSet
    val violations = best.collect {
      case (q, b) if last.get(q).exists(l => b > l + 1e-9) &&
        !pending.contains(q) => s"$q: best $b > last-run ${last(q)}"
    }
    assert(violations.isEmpty,
      "BENCH_BEST rose above the last full run without a pending " +
        s"ledger row:\n${violations.mkString("\n")}\nminMerge can " +
        "never produce this — add a RATCHET_RESETS.json row instead " +
        "of editing BENCH_BEST.json")
  }

  test("effectivePrior drops exactly the pending-reset queries") {
    val prior = Map("q_a" -> 1.0, "q_b" -> 2.0, "q_c" -> 3.0)
    val ledger = Seq(
      Bench.RatchetReset("q_a", 1.0, "applied long ago", 12, applied = true),
      Bench.RatchetReset("q_b", 2.0, "pending deliberate slowdown", 14,
        applied = false))
    assert(Bench.effectivePrior(prior, ledger) ==
      Map("q_a" -> 1.0, "q_c" -> 3.0))
    assert(Bench.effectivePrior(prior, Seq.empty) == prior)
  }

  test("ledger round-trips through write + read (escaping included)") {
    val tmp = java.nio.file.Files.createTempFile("ledger", ".json")
      .toString
    val rows = Seq(
      Bench.RatchetReset("q_x", 0.5, "reason with \"quotes\" and, commas",
        14, applied = false),
      Bench.RatchetReset("q_y", 2.25, "another sufficiently long reason",
        13, applied = true))
    Bench.writeLedger(rows, tmp)
    assert(Bench.readLedger(tmp) == rows)
    java.nio.file.Files.delete(java.nio.file.Paths.get(tmp))
  }
}
