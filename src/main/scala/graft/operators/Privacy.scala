package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** PII handling (LLM-pipeline operator): training corpora must be
  * scrubbed before use. Everything here is native codegen'd string
  * expressions — no UDFs — so masking runs at scan speed and pushes
  * column pruning down to parquet.
  */
object Privacy {

  /** q61: PII masking pass over the customer table — stable
    * pseudonymous key (md5), numeric-identifier redaction with an
    * audit count, last-2 partial retention. The masked relation is
    * what a pipeline is allowed to keep; n_redacted feeds the scrub
    * audit. */
  def piiMask(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir).select(
      col("c_custkey"),
      md5(col("c_name").cast("binary")).as("name_hash"),
      regexp_replace(col("c_name"), "[0-9]+", "<ID>").as("name_redacted"),
      regexp_count(col("c_name"), lit("[0-9]+")).cast("long").as("n_redacted"),
      concat(lit("***"), expr("right(CAST(c_custkey AS STRING), 2)")).as("key_last2"))

  /** q130: k-anonymity audit over the quasi-identifier combination
    * (nation, market segment) — the re-identification risk check run
    * BEFORE a dataset release: a row in an equivalence class smaller
    * than k is linkable to an individual. Two aggregations: classes =
    * one groupBy on the quasi-identifiers (map-side combinable), then
    * a per-segment roll-up counting classes/rows below the k=5 floor.
    * The report says exactly what generalization (dropping a QI
    * column, coarsening nation → region) must fix; constant-size
    * output (|segments| rows) at any corpus size. */
  def kAnonymity(s: SparkSession, dir: String, k: Int = 5): DataFrame =
    Tables.customer(s, dir)
      .groupBy(col("c_mktsegment"), col("c_nationkey"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_classes"),
        sum(col("n")).as("n_rows"),
        sum(when(col("n") < k, 1L).otherwise(0L)).as("n_risk_classes"),
        sum(when(col("n") < k, col("n")).otherwise(0L)).as("n_risk_rows"),
        min(col("n")).as("min_class_size"))
      .select(col("c_mktsegment"), col("n_classes"), col("n_rows"),
        col("n_risk_classes"), col("n_risk_rows"), col("min_class_size"),
        round(col("n_risk_rows") / col("n_rows").cast("double"), 4)
          .as("risk_row_frac"))
}
