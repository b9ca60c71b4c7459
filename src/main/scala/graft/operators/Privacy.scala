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
}
