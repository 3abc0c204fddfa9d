package graft

import org.scalatest.funsuite.AnyFunSuite

/** The ungated-operator registration gate (round 12, closing the r11
  * verdict's #2): `Drift.friedman` shipped in round 11 as a complete
  * ~90-line operator with NO registered query, NO spec, NO SURVEY row
  * and NO drill — invisible to every existing gate because they all
  * key off `SparkEntry.queries`. This spec closes the hole from the
  * other side: every PUBLIC top-level method of `graft.operators.*`
  * and `graft.functions.*` must be CALLED from main-source code
  * somewhere outside its own `def` line — by the query registry, a
  * sibling operator, a same-file wrapper that is itself wired, or
  * generated-code strings (codegen kernels) — or sit on the explicit
  * allowlist below, pinned like OutputSurfaceSpec's rows-only set.
  *
  * Approximation, stated: "mentioned in main code beyond its own
  * definition" is weaker than "reachable from a registered query" (a
  * dead pair of functions calling each other would evade), but it
  * exactly catches the observed failure class — an operator NOTHING
  * in main source mentions — with zero build machinery, and it
  * produces no false alarms on wrapper-internal layering. Scaladoc
  * and comments are stripped first, so a doc-only mention does not
  * count as a call. */
class SurfaceGateSpec extends AnyFunSuite {

  /** Methods intentionally exercised ONLY by specs. Every entry needs
    * a reason; the list only changes in review, never silently. */
  private val specOnly: Map[String, String] = Map(
    "windowed" -> ("AsOfJoin reference formulation (union+window): " +
      "kept as the independent cross-check AsOfJoinPropertySpec runs " +
      "against the shipped custom sort-merge plan node"),
    "windowedOnKeys" -> ("multi-key form of the AsOfJoin reference " +
      "formulation, same property-spec role"),
    "resizeStub" -> ("Dataset-level wrapper of the gated per-row " +
      "kernel (resizeRow rides q_multimodal_transform); " +
      "MultimodalSpec drives the typed Dataset path"),
    "frameSampleStub" -> ("Dataset-level wrapper of the gated " +
      "frameSampleRow, same MultimodalSpec role"),
    "readBinaryDir" -> ("binaryFile directory ingest needs a real " +
      "file tree; MultimodalSpec drives it over a temp-dir fixture — " +
      "the parquet-backed documentsAsMedia path is the gated one"),
    "semanticNearDupKmeans" -> ("k-means candidate generation kept " +
      "as the measured O(n^1.5) alternative (SURVEY semantic-dedup " +
      "row); SemanticDedupSpec drives both variants on planted copies"),
    // Column-API aliases of REGISTERED SQL functions: the kernel each
    // wraps is gated through the operator path, and SqlSurfaceSpec
    // drives every registered name end-to-end through spark.sql
    "minhashSig" -> ("alias of registered minhash_sig (the array→" +
      "signature form; the fused minhash_text kernel is the gated " +
      "operator path)"),
    "ngramHashesGen" -> "alias of registered ngram_hashes_gen",
    "vecQuant8" -> "alias of registered vec_quant8",
    "vecDequant8" -> "alias of registered vec_dequant8",
    "segmentTokens" -> "alias of registered segment_tokens",
    "chunkWindows" -> "alias of registered chunk_windows",
    "clusterAssign" -> "alias of registered cluster_assign",
    "sentenceSplit" -> "alias of registered sentence_split",
    "greedyChunks" -> "alias of registered greedy_chunks",
  )

  test("every public operator/function method is called from main " +
      "source beyond its own definition (or allowlisted)") {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val mainRoot = Paths.get("src/main/scala/graft")
    assert(Files.isDirectory(mainRoot), mainRoot.toAbsolutePath.toString)
    val mainFiles = Files.walk(mainRoot).iterator().asScala
      .filter(p => p.toString.endsWith(".scala")).toVector
    // a mention in scaladoc/comments is not a call — strip them
    // (string literals containing "//" lose their tails too, which
    // only makes the gate stricter)
    val code: Map[String, String] = mainFiles.map { p =>
      p.toString -> new String(Files.readAllBytes(p), "UTF-8")
        .replaceAll("(?s)/\\*.*?\\*/", " ")
        .replaceAll("//[^\n]*", " ")
    }.toMap
    // public top-level members: this repo's style puts object-level
    // members at exactly 2-space indent; `private`/`protected`/
    // `override` prefixes fail the pattern and drop out, local defs
    // are deeper-indented
    val defPat = """(?m)^  (?:final )?def ([A-Za-z]\w*)""".r
    val surface: Seq[String] = code.toSeq
      .filter { case (f, _) =>
        f.contains("/operators/") || f.contains("/functions/") }
      .flatMap { case (_, t) => defPat.findAllMatchIn(t).map(_.group(1)) }
      .distinct
    assert(surface.size > 200, s"surface scan truncated? ${surface.size}")
    val allCode = code.values.mkString("\n")
    val unreferenced = surface
      .filterNot(specOnly.contains)
      .filter { name =>
        val token = ("(?<![\\w])" + java.util.regex.Pattern.quote(name) +
          "(?![\\w])").r
        val mentions = token.findAllMatchIn(allCode).size
        val defs = ("(?m)^  (?:final )?def " +
          java.util.regex.Pattern.quote(name) + "(?![\\w])").r
          .findAllMatchIn(allCode).size
        mentions <= defs
      }
    assert(unreferenced.isEmpty,
      "public operator methods nothing in main source calls " +
        "(gate them with a registered query + oracle, allowlist with " +
        "a reason, or delete): " + unreferenced.sorted.mkString(", "))
    // the allowlist itself must stay live: every entry still exists
    val stale = specOnly.keys.filterNot { name =>
      ("(?m)^  (?:final )?def " + java.util.regex.Pattern.quote(name))
        .r.findFirstIn(allCode).isDefined
    }
    assert(stale.isEmpty, s"allowlist entries for deleted methods: " +
      stale.mkString(", "))
  }
}
