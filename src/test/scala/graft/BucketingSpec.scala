package graft

import org.apache.spark.sql.functions._

/** Proof of the co-located-join scale story (SURVEY §4): bucketing
  * both fact tables on the join key eliminates the shuffle entirely —
  * the join plan contains no Exchange. At 100 TB this is the
  * difference between re-shuffling both fact tables per query and
  * reading pre-partitioned data in place. */
class BucketingSpec extends SparkSpec {

  test("bucketed fact-fact join plans without any Exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
    try {
      Tables.orders(spark, sfDir).write
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("orders_b")
      Tables.lineitem(spark, sfDir).write
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("lineitem_b")

      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString

      // join itself must not shuffle either side (bucket co-location);
      // only the final tiny aggregation exchange remains
      val joinPart = plan.split("HashAggregate").last
      assert(joinPart.contains("SortMergeJoin") || joinPart.contains("ShuffledHashJoin"),
        s"expected a non-broadcast join:\n$plan")
      assert(!joinPart.contains("Exchange"),
        s"bucketed join should have no Exchange below the join:\n$plan")

      // and the result matches the unbucketed plan
      val unbucketed = Tables.lineitem(spark, sfDir)
        .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
      assert(joined.except(unbucketed).count() == 0 &&
        unbucketed.except(joined).count() == 0)
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }
}
