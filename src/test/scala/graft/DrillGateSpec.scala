package graft

import org.scalatest.funsuite.AnyFunSuite

/** The 32×-drill registration gate (round 11, closing the r10 verdict
  * item): q_winnow_fingerprints shipped in round 10 with no PERF.md
  * scale-drill row while 15 sibling operators were drilled — and went
  * on to be the suite's slowest non-graph query. This gate makes that
  * structurally impossible: every query registered AFTER the round-10
  * set (frozen in `drill_grandfathered_r10.txt`) must be mentioned in
  * PERF.md — i.e. must carry a drill row (or an explicit note in a
  * drill table's prose) before the suite goes green. The grandfathered
  * set is a snapshot of CORRECTNESS_r10.json's 317 names; it only ever
  * shrinks (delete a line to put an old query under the gate too). */
class DrillGateSpec extends AnyFunSuite {

  test("every query registered after round 10 has a PERF.md mention " +
      "(32x drill row or explicit drill-table note)") {
    val in = getClass.getResourceAsStream("/drill_grandfathered_r10.txt")
    assert(in != null, "drill_grandfathered_r10.txt resource missing")
    val grandfathered = scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().map(_.trim).filter(_.nonEmpty).toSet
    assert(grandfathered.size >= 300, "grandfathered list truncated?")
    val perfFile = new java.io.File("PERF.md")
    assert(perfFile.exists(), s"PERF.md not found at ${perfFile.getAbsolutePath}")
    val perf = scala.io.Source.fromFile(perfFile, "UTF-8").mkString
    // whole-token match (round-12 ADVICE fix): plain substring
    // containment let a new name that is a prefix/substring of an
    // already-drilled one (q_kruskal vs q_kruskal_wallis) ride the
    // sibling's mention without its own row
    val missing = (SparkEntry.queries.keySet -- grandfathered)
      .filterNot { n =>
        ("(?<![\\w])" + java.util.regex.Pattern.quote(n) + "(?![\\w])")
          .r.findFirstIn(perf).isDefined
      }
    assert(missing.isEmpty,
      s"queries with no PERF.md drill coverage: ${missing.toSeq.sorted
        .mkString(", ")} — run `sbt \"runMain graft.ScaleBench 32\"` " +
        "(SPARK_GRAFT_DRILL_ONLY=<tag>) and record the row")
  }
}
