package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the round-13 bench noise-reference ratchet: the 3x-suspect
  * prior is the elementwise MIN of best-known and latest run, so one
  * uniformly-slow-environment full run (r12: driver 1.11x the quiet
  * box on byte-identical code) can never relax the trigger. */
class BenchPriorSpec extends AnyFunSuite {

  test("a slow run cannot raise the prior (elementwise min)") {
    val best = Map("q_a" -> 1.0, "q_b" -> 2.0)
    val slowRun = Map("q_a" -> 4.0, "q_b" -> 2.5, "q_new" -> 7.0)
    val merged = Bench.minMerge(best, slowRun)
    assert(merged("q_a") == 1.0) // poisoning attempt rejected
    assert(merged("q_b") == 2.0)
    assert(merged("q_new") == 7.0) // new queries enter at first sight
  }

  test("a faster run ratchets the prior down") {
    val merged = Bench.minMerge(Map("q_a" -> 3.0), Map("q_a" -> 1.5))
    assert(merged("q_a") == 1.5)
  }

  test("failure markers (non-positive) never become anchors") {
    val merged = Bench.minMerge(Map("q_a" -> -1.0),
      Map("q_a" -> 2.0, "q_b" -> -1.0))
    assert(merged == Map("q_a" -> 2.0))
  }

  test("readQueryMap drops non-positive entries and tolerates an " +
      "absent file") {
    assert(Bench.readQueryMap("/nonexistent/BENCH.json").isEmpty)
    val f = java.io.File.createTempFile("bench", ".json")
    try {
      java.nio.file.Files.write(f.toPath,
        """{"metric":"total","queries":{"q_a":1.5,"q_b":-1.0}}"""
          .getBytes("UTF-8"))
      val m = Bench.readQueryMap(f.getAbsolutePath)
      assert(m == Map("q_a" -> 1.5))
    } finally f.delete()
  }
}
