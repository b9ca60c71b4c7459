package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.ExplainMode
import graft.operators.{Events, Incremental}

/** q126 incremental view maintenance: merge ≡ recompute at ANY
  * cutoff (including the degenerate empty-snapshot / empty-delta
  * ends), and the merge plan must read the base from the snapshot
  * parquet with the delta bound pushed to the events scan — the
  * "never re-aggregate the corpus" contract. */
class IncrementalSpec extends SparkSpec {

  private def fullRecompute =
    Tables.events(spark, sfDir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("sum_cents"))

  test("snapshot + delta merge equals full recompute at any cutoff") {
    val ts = Tables.events(spark, sfDir).agg(min("ts"), max("ts")).head
    val (lo, hi) = (ts.getLong(0), ts.getLong(1))
    // mid-stream, the gated default, empty-snapshot, empty-delta
    for (cut <- Seq((lo + hi) / 2, Incremental.DefaultCutoffMicros, lo, hi + 1)) {
      val merged = Incremental.incrementalAgg(spark, sfDir, cut)
      assert(merged.except(fullRecompute).isEmpty &&
        fullRecompute.except(merged).isEmpty,
        s"merge at cutoff $cut diverges from full recompute")
    }
  }

  test("q126 merge plan reads the base from the snapshot, not the events table") {
    val p = Incremental.incrementalAgg(spark, sfDir)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    // exactly one scan of the raw events table (the delta side) ...
    assert("events\\.parquet".r.findAllMatchIn(p).size == 1,
      s"base events rescanned by the merge plan:\n$p")
    // ... and the snapshot parquet is the other input
    assert(p.contains("q126snap"), s"snapshot parquet not in plan:\n$p")
    // the delta bound reaches the parquet row-group statistics (in
    // raw nanos — a predicate on the derived µs column doesn't push)
    assert(p.contains("GreaterThanOrEqual(ts"),
      s"delta ts bound not pushed to the events scan:\n$p")
  }

  test("q71 as-of bound reaches the events scan") {
    val p = Events.timeTravel(spark, sfDir)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("LessThanOrEqual(ts"),
      s"as-of ts bound not pushed to the events scan:\n$p")
  }
}
