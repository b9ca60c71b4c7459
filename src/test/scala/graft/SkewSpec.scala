package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  test("saltedAgg equals direct groupBy aggregation") {
    val ev = Tables.events(spark, sfDir)
    val direct = ev.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("s"))
    val salted = Skew.saltedAgg(ev, col("user_id"), 16,
      Seq(count(lit(1)).as("n"), sum(col("value")).as("s")),
      Seq(sum(col("n")).as("n"), round(sum(col("s")), 2).as("s")))
    assert(salted.count() == direct.count())
    // counts are exact; float sums identical after rounding
    val d = direct.select(col("user_id"), col("n"))
    val t = salted.select(col("user_id"), col("n"))
    assert(d.except(t).count() == 0 && t.except(d).count() == 0)
  }

  test("saltedJoinKeys preserves join results") {
    val ev = Tables.events(spark, sfDir)
    val users = ev.select(col("user_id")).distinct()
      .withColumn("tag", concat(lit("u"), col("user_id")))
    val direct = ev.join(users, "user_id").count()
    val (big, small) = Skew.saltedJoinKeys(ev, users, 8)
    val saltedCount = big.join(small, Seq("user_id", "__salt")).count()
    assert(saltedCount == direct)
  }
}
