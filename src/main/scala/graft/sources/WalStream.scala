package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Transport seam for the SEP mutation stream (SURVEY §4).
  *
  * Every downstream consumer — Subscriptions fan-out, RowMaterializer,
  * ExactlyOnce dedup, the windowed aggregations — takes a streaming
  * DataFrame in [[WalSource.walSchema]]; `WalStream` is the small
  * interface a transport implements to supply one. Swapping the file
  * WAL for Kafka at deploy is a one-line change above the seam and a
  * no-op below it.
  */
trait WalStream {
  /** Open the WAL as an unbounded streaming DataFrame in
    * [[WalSource.walSchema]] order (`seq, ts, table, rowkey, cells`). */
  def open(s: SparkSession): DataFrame
}

/** Parquet-segment WAL via the built-in file source. */
final case class FileWalStream(dir: String, maxFilesPerTrigger: Int = 1)
    extends WalStream {
  override def open(s: SparkSession): DataFrame =
    WalSource.stream(s, dir, maxFilesPerTrigger)
}

/** JSONL-segment WAL via the custom "graft-wal" DSv2 source
  * (segment offsets, admission control, Trigger.AvailableNow). */
final case class GraftWalStream(dir: String, maxFilesPerTrigger: Int = 1)
    extends WalStream {
  override def open(s: SparkSession): DataFrame =
    WalSource.streamV2(s, dir, maxFilesPerTrigger)
}

/** Kafka transport: a topic of JSON-encoded mutations, decoded into
  * the same schema — the deploy-time swap. Requires the
  * spark-sql-kafka connector on the classpath (not shipped in this
  * container; the [[KafkaWalStream.decode]] path — everything after
  * the broker read — is proven end-to-end in WalStreamSpec by
  * feeding it kafka-shaped binary rows from a file source). */
final case class KafkaWalStream(bootstrapServers: String, topic: String,
    startingOffsets: String = "earliest") extends WalStream {
  override def open(s: SparkSession): DataFrame =
    KafkaWalStream.decode(
      s.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrapServers)
        .option("subscribe", topic)
        .option("startingOffsets", startingOffsets)
        .load())
}

object KafkaWalStream {
  /** Decode a kafka-shaped stream — any DataFrame carrying a binary
    * `value` column of JSON-encoded mutations (the Kafka source's
    * value column) — into [[WalSource.walSchema]]. Shared by the
    * production transport above and the broker-less seam spec, so
    * what the spec proves is the exact path deployed rows take. */
  def decode(kafkaShaped: DataFrame): DataFrame =
    kafkaShaped
      .select(from_json(col("value").cast("string"), WalSource.walSchema).as("m"))
      .select("m.*")
}

/** Broker-less kafka seam: serves a directory of JSONL segments
  * (each line exactly the message value a WAL producer publishes) as
  * a stream of kafka-shaped binary `value` records, then decodes them
  * through [[KafkaWalStream.decode]] — proving every mutation decoded
  * from kafka-shaped bytes reaches consumers identically to the file
  * transports. */
final case class KafkaShapedWalStream(dir: String, maxFilesPerTrigger: Int = 1)
    extends WalStream {
  override def open(s: SparkSession): DataFrame =
    KafkaWalStream.decode(
      s.readStream
        .option("maxFilesPerTrigger", maxFilesPerTrigger)
        .text(dir)
        .select(col("value").cast("binary").as("value")))
}
