package graft

import graft.operators.{AsOf, RangeJoin}
import org.apache.spark.sql.functions._

class AsOfRangeSpec extends SparkSpec {

  test("general AsOf.join matches the correlated-subquery definition") {
    val ev = Tables.events(spark, sfDir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))

    val got = AsOf.join(purchases, clicks, "user_id", "ts", "click_ts",
      Seq("click_id", "click_ts"))

    // naive definition: max click_ts <= purchase ts per user
    val naive = purchases.as("p")
      .join(clicks.as("c"),
        col("p.user_id") === col("c.user_id") && col("click_ts") <= col("p.ts"),
        "left")
      .groupBy(col("p.user_id").as("user_id"), col("p.event_id").as("event_id"),
        col("p.ts").as("ts"))
      .agg(max(struct(col("click_ts"), col("click_id"))).as("m"))
      .select(col("user_id"), col("event_id"), col("ts"),
        col("m.click_id").as("asof_click_id"), col("m.click_ts").as("asof_click_ts"))

    assert(got.count() == purchases.count())
    assert(got.except(naive).count() == 0 && naive.except(got).count() == 0)
  }

  test("bucketized range join equals naive range join and avoids cartesian") {
    val ev = Tables.events(spark, sfDir)
    val points = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("p_id"), col("ts"))
    // sessions-as-intervals: purchase ± 30 min
    val intervals = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("i_id"),
        (col("ts") - 1800000000L).as("start"), (col("ts") + 1800000000L).as("end"))

    val got = RangeJoin.pointInInterval(points, intervals,
      "ts", "start", "end", bucketWidth = 3600000000L)
    val naive = points.join(intervals,
      col("ts") >= col("start") && col("ts") <= col("end"))
    assert(got.count() == naive.count())
    assert(got.select("p_id", "i_id").except(naive.select("p_id", "i_id")).count() == 0)

    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"bucketized range join must be an equi-join:\n$plan")
    val naivePlan = naive.queryExecution.executedPlan.toString
    assert(naivePlan.contains("CartesianProduct") || naivePlan.contains("BroadcastNestedLoopJoin"))
  }
}
