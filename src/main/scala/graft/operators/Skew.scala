package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Skew-handling helpers (SURVEY §6).
  *
  * AQE's skew-join handles most cases at runtime; these are for the
  * aggregation-skew patterns AQE does not rewrite: a groupBy where a
  * handful of hot keys dominate (the "null key" / "power user"
  * problem at 100 TB).
  */
object Skew {

  /** Two-phase salted aggregation: groupBy (key, salt) with partial
    * aggregation, then re-aggregate by key. `merge` must be the
    * algebraic combiner of `agg` (sum→sum, count→sum, max→max …).
    *
    * {{{
    * Skew.saltedAgg(events, col("user_id"), 16,
    *   Seq(count(lit(1)).as("n"), sum(col("value")).as("s")),
    *   Seq(sum(col("n")).as("n"), sum(col("s")).as("s")))
    * }}}
    */
  def saltedAgg(df: DataFrame, key: Column, salts: Int,
      agg: Seq[Column], merge: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    salted
      .groupBy(key.as("__key"), col("__salt"))
      .agg(agg.head, agg.tail: _*)
      .groupBy(col("__key"))
      .agg(merge.head, merge.tail: _*)
      .withColumnRenamed("__key", key.toString)
  }

  /** q81: aggregation over a deliberately skewed synthetic key — half
    * the corpus collapses onto one hot key (-1), the worst groupBy
    * skew shape — routed through [[saltedAgg]]'s two-phase plan and
    * oracle-checked against the plain GROUP BY SQL. The salted plan
    * shuffles (key, salt) so no reduce task owns the whole hot key;
    * the algebraic merge (sum→sum, count→sum, max→max) re-assembles
    * exact results. (Note Spark's map-side partial aggregation
    * already spreads distributive aggs like these; saltedAgg is the
    * belt-and-suspenders path for aggregation states too big to
    * pre-combine — the bench carries a plain-vs-salted pair on the
    * same hot-key input to keep that trade measured, not assumed.) */
  def saltedHotKeyAgg(s: SparkSession, dir: String, salts: Int = 16): DataFrame = {
    val ev = Tables.events(s, dir)
      .withColumn("skew_key",
        when(col("event_id") % 2 === 0, lit(-1L)).otherwise(col("user_id")))
    saltedAgg(ev, col("skew_key"), salts,
      Seq(count(lit(1)).as("n"), sum(col("value")).as("sv"),
        max(col("value")).as("mv")),
      Seq(sum(col("n")).as("n"), sum(col("sv")).as("sv"),
        max(col("mv")).as("mv")))
      .select(col("skew_key"), col("n"),
        round(col("sv"), 2).as("sum_value"), round(col("mv"), 2).as("max_value"))
  }

  /** Salt one side of a join against a skewed key: replicate the
    * small side `salts`× and spread the big side's hot keys across
    * (key, salt) partitions. */
  def saltedJoinKeys(big: DataFrame, small: DataFrame, salts: Int)
      : (DataFrame, DataFrame) = {
    val bigSalted = big.withColumn("__salt",
      pmod(pmod(hash(monotonically_increasing_id()), lit(salts)) + lit(salts), lit(salts)))
    val smallReplicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    (bigSalted, smallReplicated)
  }

  /** q160: SKEW DIAGNOSIS report for a join/agg key — the
    * measurement that decides BETWEEN the mitigations this file and
    * q107/q148 provide: q107's F2 sketch says "this key distribution
    * is dangerous", this report says WHICH keys and what salt factor
    * fixes each. Per-key counts (one map-side-combinable agg — the
    * only corpus-sized shuffle), then a bounded [[graft.functions.TopKAgg]]
    * keeps the top `k` heavy hitters (never a sort: q25's argument),
    * each annotated with its corpus share (ppm) and `salt_shards` =
    * ceil(cnt·P / n_rows) — how many (key, salt) shards spread that
    * key across `parts` reduce slots so no task owns more than an
    * average partition's rows (salt_shards ≤ 1 ⇒ key needs no
    * salting; the q81 `saltedAgg` `salts` argument comes straight
    * from the max of this column). Run on the q81 synthetic hot key
    * (half the corpus on key −1) so the report has a real pathology
    * to diagnose. */
  def skewReport(s: SparkSession, dir: String, k: Int = 5,
      parts: Int = 32): DataFrame = {
    import graft.functions.TopK
    val counts = Tables.events(s, dir)
      .withColumn("skew_key",
        when(col("event_id") % 2 === 0, lit(-1L)).otherwise(col("user_id")))
      .groupBy(col("skew_key")).agg(count(lit(1)).as("cnt"))
    val totals = counts.agg(sum(col("cnt")).as("n_rows"),
      count(lit(1)).as("n_keys"))
    counts
      .agg(TopK.topk(k)(col("skew_key"), col("cnt").cast("double")).as("top"))
      .select(posexplode(col("top")).as(Seq("pos", "t")))
      .select((col("pos") + 1).cast("long").as("rank"),
        col("t.id").as("skew_key"), col("t.score").cast("long").as("cnt"))
      .crossJoin(broadcast(totals))
      .select(col("rank"), col("skew_key"), col("cnt"), col("n_rows"),
        col("n_keys"),
        expr("(cnt * 1000000L) div n_rows").as("share_ppm"),
        expr(s"ceil(cnt * CAST($parts AS DOUBLE) / n_rows)").cast("long")
          .as("salt_shards"))
  }
}
