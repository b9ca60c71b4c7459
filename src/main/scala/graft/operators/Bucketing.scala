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

  /** q137: RUNTIME FILTER — bloom semi-join pushdown, the
    * selective-join optimization a 100 TB engine applies by hand (or
    * via Spark's runtime row-level filtering) when a fact-fact join
    * has a selective build side: the filtered orders keys fold into
    * a 3-hash bloom over 2^16 bits — a CONSTANT-SIZE broadcast
    * however large the build side (vs broadcasting the key set
    * itself, which grows with it) — and the probe scan drops
    * non-matching lineitems BEFORE the shuffle. Bloom false
    * positives pass the filter and are eliminated by the real join,
    * so the RESULT is exactly the plain join (what the oracle
    * replays); the audit columns quantify the filter's pruning power
    * and FP count — deterministic because the bloom is the md5 bit
    * family (q88's construction on join keys). */
  def bloomSemiJoin(s: SparkSession, dir: String, bits: Int = 65536): DataFrame = {
    def bit(i: Int, c: org.apache.spark.sql.Column) =
      Sampling.hashBucket(concat(lit(s"bj$i|"), c.cast("string"))) % bits
    val urgent = Tables.orders(s, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val bloomBits = urgent
      .select(explode(array((0 until 3).map(i => bit(i, col("o_orderkey"))): _*))
        .as("bit"))
      .distinct()
    val passed = Tables.lineitem(s, dir)
      .select(col("l_orderkey"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
      .withColumn("b0", bit(0, col("l_orderkey")))
      .withColumn("b1", bit(1, col("l_orderkey")))
      .withColumn("b2", bit(2, col("l_orderkey")))
      .join(broadcast(bloomBits.withColumnRenamed("bit", "b0")), Seq("b0"), "left_semi")
      .join(broadcast(bloomBits.withColumnRenamed("bit", "b1")), Seq("b1"), "left_semi")
      .join(broadcast(bloomBits.withColumnRenamed("bit", "b2")), Seq("b2"), "left_semi")
    val joined = passed
      .join(urgent.hint("shuffle_hash"), col("l_orderkey") === col("o_orderkey"))
      .agg(count(lit(1)).as("n_joined"), sum(col("cents")).as("revenue_cents"))
    val audit = passed.agg(count(lit(1)).as("n_bloom_pass"))
    joined.crossJoin(audit) // two single-row frames
      .select(col("n_bloom_pass"), col("n_joined"),
        (col("n_bloom_pass") - col("n_joined")).as("n_false_pos"),
        col("revenue_cents"))
  }
}
