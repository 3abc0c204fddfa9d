package graft

import org.scalatest.funsuite.AnyFunSuite

/** File-level spec-ownership sweep (r13 verdict #8, closing the
  * OhlcSpec-class hygiene work): every main-source file under
  * operators/, functions/, streaming/ and plans/ must be exercised by
  * SOME test source — referenced by one of its object/class/trait
  * names, or (for codegen'd Expression kernels that specs drive
  * through spark.sql) by one of the snake_case SQL names registered
  * inside it. A file matching neither has ZERO test coverage of any
  * kind — the failure class this catches is a whole operator file
  * landing with its only exercise being the driver oracle, so a later
  * in-place regression needs a full driver round to surface instead of
  * `sbt test`.
  *
  * [[SurfaceGateSpec]] is the METHOD-level complement (every public
  * method called from main source); this is the FILE-to-spec edge.
  * Allowlist entries need a reason and only change in review. */
class SpecOwnershipSpec extends AnyFunSuite {

  /** Files whose coverage is intentionally indirect. */
  private val allowlisted: Map[String, String] = Map(
    "Compaction.scala" -> ("single max_by wrapper consumed by the " +
      "oracle-gated q_latest_per_key and by Cdc (CdcSpec covers the " +
      "consuming path); no independent behavior to spec"),
  )

  test("every operator/function/streaming/plan source file is " +
      "exercised from test sources (by type name or registered SQL " +
      "name), or allowlisted with a reason") {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val dirs = Seq("operators", "functions", "streaming", "plans")
      .map(d => Paths.get(s"src/main/scala/graft/$d"))
    val testTxt = Files.walk(Paths.get("src/test/scala")).iterator()
      .asScala.filter(_.toString.endsWith(".scala"))
      .map(p => new String(Files.readAllBytes(p), "UTF-8"))
      .mkString("\n")
    val typeName = """(?:object|class|trait)\s+(\w+)""".r
    val sqlName = "\"([a-z][a-z0-9]*(?:_[a-z0-9]+)+)\"".r
    val uncovered = dirs.flatMap { d =>
      assert(Files.isDirectory(d), d.toAbsolutePath.toString)
      Files.walk(d).iterator().asScala
        .filter(_.toString.endsWith(".scala")).flatMap { p =>
          val raw = new String(Files.readAllBytes(p), "UTF-8")
          // comments/scaladoc don't register SQL names — strip them so
          // a doc-mentioned name can't vouch for a file
          val code = raw.replaceAll("(?s)/\\*.*?\\*/", " ")
            .replaceAll("//[^\n]*", " ")
          val names = typeName.findAllMatchIn(code).map(_.group(1)).toSet ++
            sqlName.findAllMatchIn(code).map(_.group(1)).toSet
          val fileName = p.getFileName.toString
          if (names.exists(testTxt.contains) ||
            allowlisted.contains(fileName)) None
          else Some(s"$p (names tried: ${names.toSeq.sorted.take(8)
            .mkString(", ")})")
        }
    }
    assert(uncovered.isEmpty,
      s"main-source files with no test-source reference:\n" +
        uncovered.mkString("\n") + "\nwrite a spec (or allowlist " +
        "with a reason, in review)")
    val stale = allowlisted.keys.filterNot(f =>
      dirs.exists(d => Files.exists(d.resolve(f))))
    assert(stale.isEmpty, s"allowlist rows for deleted files: $stale")
  }
}
