package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Bucketed-table co-located joins — the SURVEY §6 100 TB table
  * layout made executable: both fact tables written bucketed+sorted
  * by the join key, so the fact-fact join reads co-partitioned
  * buckets IN PLACE with no Exchange below the join. At 100 TB this
  * is the difference between re-shuffling both fact tables on every
  * query and a one-time layout cost amortized across the workload.
  */
object Bucketing {

  /** q82: order-status revenue over BUCKETED fact tables — stages
    * orders and lineitem bucketed (8 buckets, sorted) on the join
    * key, then joins and aggregates. With size-based broadcasts
    * disabled the join has NO Exchange below it (PlanSpec pin); at
    * this SF the optimizer may still choose to broadcast orders,
    * which is equally correct — bucketing is the plan that survives
    * when neither side fits. The oracle replays the plain join on
    * the raw parquet: layout must never change results. */
  def bucketedJoin(s: SparkSession, dir: String): DataFrame = {
    val stage = StreamingOps.stagingRoot("q82", dir)
    s.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
    Tables.orders(s, dir).write
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$stage/orders_b")
      .mode("overwrite").saveAsTable("graft_q82_orders")
    Tables.lineitem(s, dir).write
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$stage/lineitem_b")
      .mode("overwrite").saveAsTable("graft_q82_lineitem")
    s.table("graft_q82_lineitem")
      .join(s.table("graft_q82_orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"))
  }
}
