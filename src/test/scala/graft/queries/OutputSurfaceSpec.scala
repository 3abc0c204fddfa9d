package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

/** The correctness harness canonicalizes query output with a pandas
  * sort over every column — it can only sort SCALAR columns. A query
  * that ships an array/map/struct in its final projection doesn't fail
  * its own gate; it crashes the whole compare (the r6/r7 q_hashing_tf
  * and q_skew_report reds). This spec closes that class: every query
  * that carries a DuckDB oracle must emit atomic top-level columns
  * only. Serialize vectors with concat_ws/to_json before shipping. */
class OutputSurfaceSpec extends SparkSpec {

  test("every oracle-gated query emits scalar-only output columns") {
    val offenders = scala.collection.mutable.ListBuffer.empty[String]
    SparkEntry.oracleSql.keys.toSeq.sorted.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        fail(s"oracleSql entry '$name' has no queries entry"))
      val schema =
        try fn(spark, sf).schema
        catch { case e: Throwable =>
          fail(s"query '$name' failed to build at sf0.001: ${e.getMessage}")
        }
      val bad = schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType]
          || f.dataType.isInstanceOf[MapType]
          || f.dataType.isInstanceOf[StructType] =>
          s"${f.name}: ${f.dataType.simpleString}"
      }
      if (bad.nonEmpty) offenders += s"$name -> ${bad.mkString(", ")}"
    }
    assert(offenders.isEmpty,
      "non-scalar columns in oracle-gated final projections (the driver " +
        "canonicalizer crashes on these — stringify with concat_ws/" +
        s"to_json):\n  ${offenders.mkString("\n  ")}")
  }

  test("every queries entry without an oracle is a documented exception") {
    // rows-only queries (no oracle) are allowed non-scalar output, but
    // the set should only grow deliberately — pin it so a typo'd oracle
    // key (query present, oracle missing) fails here instead of
    // silently downgrading the gate to rows-only.
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val expected = Set(
      "q_agg_approx_distinct", "q_ann_ivf", "q_ann_lsh", "q_ivfpq_topk",
      "q_kmv_distinct", "q_minhash_dedup", "q_minhash_keep_best",
      "q_minhash_neardup", "q_minhash_transitive", "q_pq_topk",
      "q_semantic_dedup", "q_simhash_neardup",
      // r15 deliberate growth (the 13th member): real-distribution
      // ANN append — k-means/PQ not DuckDB-expressible; carries the
      // per-round RecallBench recall + centroid-drift artifact like
      // the other ANN rows
      "q_ann_append")
    assert(rowsOnly === expected,
      s"rows-only set changed; if deliberate, update this pin. " +
        s"added=${rowsOnly -- expected} removed=${expected -- rowsOnly}")
  }
}
