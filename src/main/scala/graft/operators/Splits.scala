package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic train/validation/test split assignment — the
  * reproducible partitioning step of training-corpus assembly.
  *
  * Assignment is a pure function of (salt, id): the md5 of the salted id
  * picks one of `buckets` equal-width hash buckets, and each split owns a
  * contiguous bucket range sized ⌊fraction·buckets⌋ (exact decimal
  * arithmetic, same rationale as [[Mixing.sampleToWeights]]'s quotas). So
  * membership is stable under corpus re-partitioning, appends, engine
  * changes, and re-runs — a doc can never migrate between train and test
  * when the corpus grows, the property random-number splits lack and
  * leakage audits depend on.
  *
  * Scale shape: ONE map-only projection over the scan. No shuffle, no
  * driver state, no sampling pass — at 100 TB the split column costs what
  * reading the id column costs.
  */
object Splits {

  /** `md5(salt_id)` — THE audit-layout hash this module and
    * [[Shards]] both derive from: md5 rather than xxhash64 keeps every
    * assignment reproducible OUTSIDE the JVM (any engine with md5 can
    * recompute split membership and shard layout). One definition, so
    * the two operators' layouts cannot silently diverge. */
  private[operators] def saltedKey(idCol: Column, salt: String): Column =
    md5(concat(lit(salt), lit("_"), idCol.cast("string")))

  /** First 8 hex chars of a [[saltedKey]] as an integer, mod `buckets`. */
  private[operators] def bucketOfKey(key: Column, buckets: Int): Column =
    conv(substring(key, 1, 8), 16, 10).cast("long") % buckets

  private def bucketOf(idCol: Column, salt: String, buckets: Int): Column =
    bucketOfKey(saltedKey(idCol, salt), buckets)

  /** Append a `split` column assigning each row to the first fraction
    * whose bucket range contains its hash bucket.
    *
    * @param fractions ordered (name, fraction) pairs; fractions must sum
    *                  to 1 (±1e-9). Ranges are [⌊cum·buckets⌋ of the
    *                  previous boundary, ⌊cum·buckets⌋) — contiguous and
    *                  exhaustive, so every row lands in exactly one split.
    * @param salt      namespaces the hash: different salts give
    *                  independent assignments (re-splitting experiments
    *                  without correlation).
    * @param buckets   assignment granularity; fractions finer than
    *                  1/buckets truncate to zero buckets and get no rows.
    */
  def assign(df: DataFrame, idCol: String,
      fractions: Seq[(String, Double)], salt: String = "graft",
      buckets: Int = 10000): DataFrame = {
    require(fractions.nonEmpty, "need at least one split fraction")
    require(fractions.forall { case (_, f) => f >= 0.0 && f <= 1.0 },
      s"fractions must be in [0,1]: $fractions")
    val total = fractions.map { case (_, f) => BigDecimal(f.toString) }.sum
    require((total - 1).abs <= BigDecimal("1e-9"),
      s"fractions must sum to 1, got $total: $fractions")
    require(fractions.map(_._1).distinct.size == fractions.size,
      s"duplicate split names: ${fractions.map(_._1)}")
    // cumulative boundaries in exact decimal, floored to bucket indices —
    // double accumulation drifts the train/test border by a bucket at
    // unlucky fractions, silently moving docs across splits between runs
    // of engines that round differently
    val bounds = fractions.scanLeft(BigDecimal(0)) {
      case (acc, (_, f)) => acc + BigDecimal(f.toString)
    }.tail.map(c => (c * buckets).setScale(0,
      BigDecimal.RoundingMode.FLOOR).toLong)
    val b = bucketOf(col(idCol), salt, buckets)
    // last range is closed at `buckets` by the sum-to-1 contract; the
    // otherwise arm is unreachable but keeps the expression total
    val split = fractions.map(_._1).zip(bounds)
      .foldRight(lit(fractions.last._1): Column) {
        case ((name, hi), rest) => when(b < hi, lit(name)).otherwise(rest)
      }
    df.withColumn("split", split)
  }

  /** Split-leakage audit: per split, how many docs share their CONTENT
    * hash with a doc in a DIFFERENT split — the train/test contamination
    * an id-hash split does NOT prevent (membership is per id; two copies
    * of the same text carry different ids and can straddle the
    * boundary). Zero `n_leaked` everywhere is the postcondition of
    * dedup-before-split; this is the check that proves it held.
    *
    * Returns (split, n_docs, n_leaked). Scale shape: text is consumed at
    * the scan (hashed); the spread aggregate and the count join shuffle
    * (hash, split) pairs only.
    *
    * @param hasher content hash; default sha2-256 (the [[Dedup]]
    *               convention), `md5` when the audit must be
    *               reproducible outside the JVM. */
  def leakageAudit(df: DataFrame, idCol: String, textCol: String,
      fractions: Seq[(String, Double)], salt: String = "graft",
      hasher: Column => Column = sha2(_, 256)): DataFrame = {
    val hashed = assign(df, idCol, fractions, salt)
      .select(col(idCol), col("split"), hasher(col(textCol)).as("__h"))
    val spread = hashed.groupBy("__h")
      .agg(countDistinct("split").as("__n_splits"))
    hashed.join(spread, "__h")
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("__n_splits") > 1, 1).otherwise(0)).as("n_leaked"))
  }

  /** Time-based split with an EMBARGO gap (purged walk-forward CV, the
    * de-Prado discipline): rows at or after `testStartUs` are test,
    * rows strictly before `testStartUs − embargoUs` are train, and the
    * gap between them is labeled `embargo` and EXCLUDED from both — a
    * feature computed over a trailing window on a late train row would
    * otherwise see into the test period (look-ahead leakage that an
    * id-hash split cannot prevent, the temporal analogue of
    * [[leakageAudit]]). Map-only; integer-µs comparisons. */
  def timeSplit(df: DataFrame, tsCol: String, testStartUs: Long,
      embargoUs: Long): DataFrame = {
    require(embargoUs >= 0, s"negative embargo: $embargoUs")
    val t = unix_micros(col(tsCol))
    df.withColumn("split",
      when(t >= testStartUs, lit("test"))
        .when(t < testStartUs - embargoUs, lit("train"))
        .otherwise(lit("embargo")))
  }
}
