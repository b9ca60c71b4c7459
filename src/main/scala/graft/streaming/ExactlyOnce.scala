package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Effectively-once consumption over an at-least-once WAL (SURVEY
  * §2.G): the reference SEP delivers events at-least-once and relies
  * on idempotent listeners; here replayed mutations are dropped by
  * WAL sequence number within the event-time watermark, so state
  * kept per seq is bounded by the watermark horizon.
  */
object ExactlyOnce {

  /** Drop replayed mutations (same `seq`) within the watermark. */
  def dedupe(mutations: DataFrame, watermark: String = "1 hour"): DataFrame =
    mutations
      .withColumn("event_time", timestamp_micros(col("ts")))
      .withWatermark("event_time", watermark)
      .dropDuplicatesWithinWatermark("seq")
      .drop("event_time")
}
