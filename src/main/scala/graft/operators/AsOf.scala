package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** General as-of join for ANY two tables (SURVEY §2.B generalized;
  * q17 is the same-table special case).
  *
  * Implementation: tag + union + one ordered window pass per key —
  * a single shuffle on the key, no range scan, no per-key O(n·m)
  * join. This is the scalable formulation: a join-then-filter
  * formulation explodes to a cartesian per key; this stays linear in
  * (|left| + |right|) and sorts once.
  */
object AsOf {

  /** For each left row, attach the latest right row with
    * rightTime <= leftTime within the same key. Right payload columns
    * come back as `asof_<name>` (null when no prior right row).
    *
    * @param left      probe side (each row gets a match)
    * @param right     build side (`asof` lookup source)
    * @param key       join key column name (same name both sides)
    * @param leftTime  event-time column on left (any orderable type)
    * @param rightTime event-time column on right (same type)
    * @param rightPayload right columns to carry over
    */
  def join(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      rightPayload: Seq[String]): DataFrame = {
    val leftCols = left.columns
    // side 1 sorts after side 0 at equal time: right rows at time t
    // are visible to left rows at the same t (inclusive as-of)
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumns(rightPayload.map(c => s"__p_$c" -> lit(null)).toMap)
    val r = right
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .withColumns(
        leftCols.filterNot(c => c == key).map(c => c -> lit(null)).toMap)
      .withColumns(rightPayload.map(c => s"__p_$c" -> col(c)).toMap)
    val unioned = l.select(
      (leftCols.map(col) :+ col("__t") :+ col("__side")) ++
        rightPayload.map(c => col(s"__p_$c")): _*)
      .unionByName(r.select(
        (leftCols.map(col) :+ col("__t") :+ col("__side")) ++
          rightPayload.map(c => col(s"__p_$c")): _*))
    val w = Window.partitionBy(col(key))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rightPayload.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"asof_$c", last(col(s"__p_$c"), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1)
      .select(leftCols.map(col) ++ rightPayload.map(c => col(s"asof_$c")): _*)
  }
}
