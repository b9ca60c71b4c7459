package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** SEP-style WAL source (SURVEY §2.G).
  *
  * The reference taps HBase replication and hands listeners a stream
  * of SepEvents. Spark-first equivalent: mutations land as parquet
  * batch files in a WAL directory; `stream` opens it as a Structured
  * Streaming file source (exactly-once, ordered per file, replayable
  * from any offset — the at-least-once + idempotent-reprocessing
  * contract of the reference). Swap the directory for Kafka in
  * production; the downstream operators are source-agnostic.
  */
object WalSource {

  val cellType: StructType = StructType(Seq(
    StructField("family", StringType),
    StructField("qualifier", StringType),
    StructField("value", StringType),
    StructField("ts", LongType),
    StructField("kind", StringType)))

  val walSchema: StructType = StructType(Seq(
    StructField("seq", LongType),
    StructField("ts", LongType),
    StructField("table", StringType),
    StructField("rowkey", StringType),
    StructField("cells", ArrayType(cellType))))

  /** Wrap the events table into WAL mutation format: one mutation per
    * event, rowkey = user_id, one cell per (event_type → value/props).
    * 'error' events become row tombstones (delete markers). */
  def eventsAsWal(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).select(
      col("event_id").as("seq"),
      col("ts"),
      lit("events").as("table"),
      col("user_id").cast("string").as("rowkey"),
      array(
        struct(
          lit("e").as("family"),
          col("event_type").as("qualifier"),
          col("value").cast("string").as("value"),
          col("ts"),
          when(col("event_type") === "error", "delete_row").otherwise("put").as("kind")),
        struct(
          lit("e").as("family"),
          lit("props").as("qualifier"),
          col("props").as("value"),
          col("ts"),
          when(col("event_type") === "error", "delete_row").otherwise("put").as("kind"))
      ).as("cells"))

  /** Write a mutation DataFrame as N WAL batch files (simulates N
    * replication shipments). */
  def writeWal(mutations: DataFrame, walDir: String, batches: Int = 8): Unit =
    mutations.repartitionByRange(batches, col("seq"))
      .write.mode("overwrite").parquet(walDir)

  /** Write a mutation DataFrame as JSONL WAL segments for the custom
    * DSv2 source ([[WalDataSource]], format "graft-wal"). */
  def writeWalJson(mutations: DataFrame, walDir: String, batches: Int = 8): Unit =
    mutations.repartitionByRange(batches, col("seq"))
      .toJSON.write.mode("overwrite").text(walDir)

  /** Open a JSONL WAL directory via the custom DSv2 streaming source. */
  def streamV2(s: SparkSession, walDir: String, maxFilesPerTrigger: Int = 1): DataFrame =
    s.readStream.format("graft-wal")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .load(walDir)

  /** Open a WAL directory as a streaming DataFrame of mutations. */
  def stream(s: SparkSession, walDir: String, maxFilesPerTrigger: Int = 1): DataFrame =
    s.readStream
      .schema(walSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(walDir)

  /** PayloadExtractor equivalent: pull the value of family:qualifier
    * out of a mutation's cells (null when absent). */
  def extractPayload(cells: org.apache.spark.sql.Column, family: String,
      qualifier: String): org.apache.spark.sql.Column =
    element_at(
      transform(
        filter(cells, c => c.getField("family") === family &&
          c.getField("qualifier") === qualifier),
        c => c.getField("value")),
      1)
}
