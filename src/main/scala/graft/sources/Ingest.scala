package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** Schema-on-read JSONL ingest with a quarantine lane — the
  * corrupt-tolerant front door of a crawl pipeline: a feed with a few
  * truncated/garbled lines must never fail the job (FAILFAST) OR
  * silently drop rows; bad lines route to a quarantine output carrying
  * the raw payload for later replay.
  *
  * Built on Spark's PERMISSIVE `from_json` + columnNameOfCorruptRecord:
  * one map-only projection, no UDF, no shuffle — the parse verdict and
  * both lanes ride the same scan. */
object Ingest {

  /** Adds `ok` (parse verdict), the parsed struct fields, and
    * `raw_line` (the original payload for quarantined rows, null for
    * clean ones). Callers split lanes with `.filter(col("ok"))`. */
  def parseJsonl(df: DataFrame, jsonCol: String, schema: StructType)
      : DataFrame = {
    require(!schema.fieldNames.contains("_corrupt"),
      "schema must not already contain a _corrupt field")
    val full = schema.add("_corrupt", StringType)
    val parsed = from_json(col(jsonCol), full,
      Map("mode" -> "PERMISSIVE",
        "columnNameOfCorruptRecord" -> "_corrupt"))
    val ok: Column = parsed.getField("_corrupt").isNull
    df.withColumn("__p", parsed)
      .withColumn("ok", ok)
      .withColumn("raw_line", when(!ok, col(jsonCol)))
      .select((df.columns.filterNot(_ == jsonCol).map(col).toSeq :+
        col("ok") :+ col("raw_line")) ++
        schema.fieldNames.toSeq.map(f => col(s"__p.$f").as(s"j_$f")): _*)
  }
}
