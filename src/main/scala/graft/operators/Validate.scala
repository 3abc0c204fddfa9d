package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality audit: evaluate a rule set against a table
  * and emit one row per rule with its violation count — the
  * expectation-suite contract every ingest runs before promoting a
  * snapshot (null checks, domains, ranges, key uniqueness, referential
  * integrity).
  *
  * Scale posture: all ROW-level rules (not-null / range / set / regex)
  * fold into ONE aggregation over a single scan — `sum(CASE WHEN
  * violated)` per rule, map-side partial, no shuffle of data rows.
  * Uniqueness costs one groupBy on its key (the unavoidable shuffle —
  * count>1 groups sum their excess). Referential integrity is one
  * left-anti join against the referenced keys (AQE broadcasts a small
  * dimension; a fact-sized reference falls back to a key-only shuffle
  * join — both sides reduce to their key columns at the scan). Results
  * are a handful of one-row frames unioned: nothing collects.
  */
object Validate {

  sealed trait Rule { def id: String }
  /** `col IS NOT NULL` */
  final case class NotNull(id: String, column: String) extends Rule
  /** `lo <= col <= hi` (null passes — compose with NotNull) */
  final case class InRange(id: String, column: String, lo: Double,
      hi: Double) extends Rule
  /** `col IN (values)` (null passes) */
  final case class InSet(id: String, column: String,
      values: Seq[String]) extends Rule
  /** `col RLIKE regex` (null passes) */
  final case class Matches(id: String, column: String, regex: String)
      extends Rule
  /** no two rows share the key tuple; each extra copy counts once */
  final case class Unique(id: String, columns: Seq[String]) extends Rule
  /** every non-null `column` value exists in `refKeys`' single column */
  final case class Referential(id: String, column: String,
      refKeys: DataFrame) extends Rule

  private def violation(df: DataFrame, r: Rule): Option[Column] = r match {
    case NotNull(_, c) => Some(col(c).isNull)
    case InRange(_, c, lo, hi) =>
      Some(col(c).isNotNull && (col(c) < lo || col(c) > hi))
    case InSet(_, c, vs) =>
      Some(col(c).isNotNull && !col(c).isin(vs: _*))
    case Matches(_, c, re) =>
      Some(col(c).isNotNull && !col(c).rlike(re))
    case _ => None
  }

  /** @return one row per rule, in rule order: (rule_id, violations, pass) */
  def report(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "empty rule set")
    require(rules.map(_.id).distinct.size == rules.size,
      "rule ids must be unique")
    val rowRules = rules.flatMap(r => violation(df, r).map(r.id -> _))
    val rowReport: Option[DataFrame] =
      if (rowRules.isEmpty) None
      else {
        val agg = df.agg(
          count(lit(1)).as("__n"),
          rowRules.map { case (id, v) =>
            sum(when(v, 1L).otherwise(0L)).as(s"__v_$id")
          }: _*)
        // one row in → explode to one row per rule, declaration order
        Some(agg.select(explode(array(rowRules.map { case (id, _) =>
            struct(lit(id).as("rule_id"),
              coalesce(col(s"__v_$id"), lit(0L)).as("violations"))
          }: _*)).as("__r"))
          .select(col("__r.rule_id"), col("__r.violations")))
      }
    val otherReports = rules.collect {
      case Unique(id, cols) =>
        df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("__c"))
          .filter(col("__c") > 1)
          .agg(coalesce(sum(col("__c") - 1), lit(0L)).as("violations"))
          .select(lit(id).as("rule_id"), col("violations"))
      case Referential(id, c, ref) =>
        val refCol = ref.columns.head
        df.select(col(c)).filter(col(c).isNotNull)
          .join(ref.select(col(refCol).as(c)).distinct(),
            Seq(c), "left_anti")
          .agg(count(lit(1)).as("violations"))
          .select(lit(id).as("rule_id"), col("violations"))
    }
    val all = (rowReport.toSeq ++ otherReports).reduce(_ unionByName _)
    // re-attach declaration order + pass flag
    val order = rules.map(_.id).zipWithIndex.toMap
    val orderCol = rules.foldLeft(lit(-1)) { (acc, r) =>
      when(col("rule_id") === r.id, lit(order(r.id))).otherwise(acc)
    }
    all.select(orderCol.as("rule_ord"), col("rule_id"),
      col("violations"), (col("violations") === 0L).as("pass"))
  }
}
