package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Order-independent dataset manifests — the reproducibility primitive a
  * recurring pipeline needs: "is this output EXACTLY the run-before's
  * output, and if not, WHICH slice changed?" answered without sorting or
  * shipping either dataset.
  *
  * A manifest is one row per id-bucket: row count + XOR of per-row
  * content hashes. XOR is commutative/associative, so the digest is
  * independent of row order and partitioning (any engine, any
  * parallelism), aggregates map-side, and two manifests compare with a
  * `buckets`-row join. Equal manifests ⟺ equal bucket contents up to md5
  * collisions; a differing bucket pinpoints the 1/buckets id-slice to
  * re-read — the dataset-level rsync step [[CorpusDiff]] then refines
  * row-by-row.
  *
  * Caveat (by construction): XOR cancels PAIRS of identical rows — a
  * bucket gaining two copies of the same row keeps its digest, which is
  * why the count rides next to it (count catches cardinality changes;
  * the digest catches content changes; colliding BOTH requires swapping
  * a row for a different one an even number of times).
  */
object ManifestDigest {

  /** One row per bucket: (bucket, n_rows, digest).
    *
    * @param idCol       numeric id; bucket = `pmod(id, buckets)`
    * @param contentCols columns folded into the per-row hash (joined
    *                    with a 0x01 separator, md5'd, first 60 bits)
    */
  def manifest(df: DataFrame, idCol: String, contentCols: Seq[String],
      buckets: Int = 64): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    require(contentCols.nonEmpty, "need at least one content column")
    // NULL discipline: concat_ws SKIPS null arguments, which would (a)
    // collide (x, NULL) with (NULL, x) by positional shift and (b)
    // diverge from ||-style oracles that null-propagate. Each column
    // encodes NULL as "\u0002" and a value as "\u0003" + value, so
    // every position is present and NULL, "", and absent all differ.
    val encoded = contentCols.map(c =>
      when(col(c).isNull, lit("\u0002"))
        .otherwise(concat(lit("\u0003"), col(c).cast("string"))))
    val rowHash = conv(substring(
      md5(concat_ws("\u0001",
        (col(idCol).cast("string") +: encoded): _*)),
      1, 15), 16, 10).cast("long")
    df.select(pmod(col(idCol), lit(buckets.toLong)).as("bucket"),
        rowHash.as("__h"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"), expr("bit_xor(__h)").as("digest"))
  }

  /** Buckets whose count or digest differ between two manifests —
    * missing buckets compare as (0 rows, digest 0), so additions and
    * deletions surface too. Returns (bucket, n_rows_a, n_rows_b,
    * digest_a, digest_b). */
  def diffBuckets(a: DataFrame, b: DataFrame): DataFrame = {
    val l = a.select(col("bucket"), col("n_rows").as("n_rows_a"),
      col("digest").as("digest_a"))
    val r = b.select(col("bucket"), col("n_rows").as("n_rows_b"),
      col("digest").as("digest_b"))
    l.join(r, Seq("bucket"), "full_outer")
      .na.fill(0L, Seq("n_rows_a", "n_rows_b", "digest_a", "digest_b"))
      .filter(col("n_rows_a") =!= col("n_rows_b") ||
        col("digest_a") =!= col("digest_b"))
  }
}
