package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketized range join (SURVEY §4).
  *
  * Spark plans `a JOIN b ON a.t BETWEEN b.start AND b.end` as a
  * nested-loop/cartesian with a filter — quadratic at scale. The
  * standard fix (a dedicated range-join optimization in some
  * commercial engines, absent in OSS Spark) is bucketization: chop
  * the value domain into fixed-width buckets, explode each interval
  * into the buckets it overlaps, equi-join on bucket id, then apply
  * the exact range predicate as a residual filter. The join becomes
  * a shuffled hash/sort-merge equi-join whose fan-out is bounded by
  * interval_width / bucket_width.
  */
object RangeJoin {

  /** Join `points` (with long column `t`) to `intervals` (with long
    * columns `start`, `end`, inclusive) on containment, co-keyed by
    * `bucketWidth` buckets. All original columns from both sides are
    * kept; exact containment is enforced after the equi-join. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      t: String, start: String, end: String, bucketWidth: Long): DataFrame = {
    val p = points.withColumn("__bucket", col(t).divide(bucketWidth).cast("long"))
    val i = intervals.withColumn("__bucket",
      explode(sequence(
        col(start).divide(bucketWidth).cast("long"),
        col(end).divide(bucketWidth).cast("long"))))
    p.join(i, "__bucket")
      .filter(col(t) >= col(start) && col(t) <= col(end))
      .drop("__bucket")
  }

  /** Interval × interval OVERLAP join — the second range-join shape
    * (pointInInterval covers containment): emit every (left, right)
    * pair whose HALF-OPEN intervals [lStart, lEnd) × [rStart, rEnd)
    * intersect. Same bucketization strategy: each interval explodes
    * to the `bucketWidth` units it covers, pairs meet on an EQUI
    * join over the unit, the exact overlap predicate runs as a
    * residual filter, and the final `distinct` collapses pairs that
    * met in several shared units (fan-out bounded by
    * interval_width / bucketWidth — pick a width near the typical
    * interval length; callers with row keys can dedupe on keys
    * instead of full rows). Never a nested-loop over interval
    * pairs. */
  def intervalOverlap(left: DataFrame, right: DataFrame,
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      bucketWidth: Long): DataFrame = {
    val l = left.withColumn("__bucket", explode(sequence(
      col(lStart).divide(bucketWidth).cast("long"),
      (col(lEnd) - 1).divide(bucketWidth).cast("long"))))
    val r = right.withColumn("__bucket", explode(sequence(
      col(rStart).divide(bucketWidth).cast("long"),
      (col(rEnd) - 1).divide(bucketWidth).cast("long"))))
    l.join(r, Seq("__bucket"))
      .filter(col(lStart) < col(rEnd) && col(rStart) < col(lEnd))
      .drop("__bucket")
      .distinct()
  }
}
