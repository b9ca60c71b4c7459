package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Incremental view maintenance (IVM) over the event changelog — the
  * CDC consumer pattern the reference's subscription model feeds: a
  * downstream aggregate (per-user, per-type counts and revenue) is
  * maintained by MERGING each WAL increment into a persisted partial-
  * aggregate snapshot, never by re-aggregating the corpus. At 100 TB
  * the full recompute is the thing you can't afford daily; the merge
  * touches |snapshot| + |delta| rows, and because count/sum are
  * distributive the merged result is EXACTLY the full recompute —
  * which is what the oracle gate proves.
  *
  * Determinism: revenue is summed as exact integer cents
  * (`round(value·100)` as BIGINT), so partial sums merge
  * order-independently and the snapshot+delta sum is bit-equal to the
  * one-pass sum on both engines (the Similarity micro-unit trick
  * applied to money).
  */
object Incremental {

  /** 2024-01-15T00:00:00Z in epoch micros — inside the events span at
    * every SF (generator runs Jan 1 → ~Jan 30), so base and delta are
    * both non-trivial. Mirrored as a TIMESTAMP literal in the spec
    * pin and nowhere else: the oracle recomputes the FULL aggregate
    * and never sees the cutoff. */
  val DefaultCutoffMicros: Long = 1705276800000000L

  /** The partial aggregate both sides share: per (user_id, event_type)
    * event count + exact integer-cent revenue. Map-side combinable;
    * one shuffle of one row per (user, type). */
  private[graft] def partialAgg(ev: DataFrame): DataFrame =
    ev.groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("sum_cents"))

  /** Materialize the base-side snapshot (events before `cutoff`) as a
    * partial-aggregate parquet — written once, merged by every
    * subsequent increment ([[mergeDelta]]). */
  def writeAggSnapshot(s: SparkSession, dir: String, snapPath: String,
      cutoffMicros: Long = DefaultCutoffMicros): Unit =
    partialAgg(Tables.eventsTsBounded(s, dir,
        maxMicros = Some(cutoffMicros - 1)))
      .write.mode("overwrite").parquet(snapPath)

  /** Merge a delta (same schema as the raw events table) into a
    * persisted snapshot: union of two partial aggregates + one
    * re-aggregation. Distributivity of count/sum makes this equal to
    * the full recompute; the plan reads the snapshot parquet and the
    * delta scan only (spec-pinned — the base events are never
    * rescanned). */
  def mergeDelta(s: SparkSession, snapPath: String, delta: DataFrame): DataFrame =
    s.read.parquet(snapPath)
      .unionByName(partialAgg(delta))
      .groupBy(col("user_id"), col("event_type"))
      .agg(sum(col("n_events")).as("n_events"),
        sum(col("sum_cents")).as("sum_cents"))

  /** q126: the IVM round-trip under the oracle gate — snapshot the
    * pre-cutoff aggregate once, merge the post-cutoff delta (its
    * events scan carries the pushed-down `ts >= cutoff` filter), and
    * the result must equal the full GROUP BY over all events (the
    * oracle recomputes from scratch; the gate proves merge ≡
    * recompute). */
  def incrementalAgg(s: SparkSession, dir: String,
      cutoffMicros: Long = DefaultCutoffMicros): DataFrame = {
    val snap = StreamingOps.stagingRoot("q126snap", dir) + "/agg"
    writeAggSnapshot(s, dir, snap, cutoffMicros)
    mergeDelta(s, snap,
      Tables.eventsTsBounded(s, dir, minMicros = Some(cutoffMicros)))
  }
}
