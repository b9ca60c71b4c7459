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

  private val P = "__graft_asof_" // temp-column prefix, collision-checked

  /** For each left row, attach the latest right row with
    * rightTime <= leftTime within the same key (or, with
    * `forward = true`, the EARLIEST right row with rightTime >=
    * leftTime — "next event after" lookups: time-to-convert,
    * next-error-after-deploy). Right payload columns come back as
    * `asof_<name>` (null when no prior/next right row).
    *
    * @param left      probe side (each row gets a match)
    * @param right     build side (`asof` lookup source)
    * @param key       join key column name (same name both sides)
    * @param leftTime  event-time column on left (any orderable type)
    * @param rightTime event-time column on right (same type)
    * @param rightPayload right columns to carry over
    * @param rightTiebreak right column that totally orders right rows
    *        within (key, rightTime) — e.g. a WAL sequence number.
    *        Without one, which payload wins among exact time ties is
    *        nondeterministic (last-write-wins needs a write order).
    * @param forward   false: latest right ≤ leftTime (default);
    *        true: earliest right ≥ leftTime. Both inclusive; both a
    *        single shuffle + one ordered window pass.
    */
  def join(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      rightPayload: Seq[String],
      rightTiebreak: Option[String] = None,
      forward: Boolean = false): DataFrame = {
    val leftCols = left.columns
    require(!(leftCols ++ right.columns).exists(_.startsWith(P)),
      s"column prefix '$P' is reserved by AsOf.join")
    val outClash = rightPayload.map(c => s"asof_$c").toSet intersect leftCols.toSet
    require(outClash.isEmpty,
      s"left columns ${outClash.mkString(", ")} collide with AsOf.join output names")
    // Side ordering makes equal-time right rows visible (inclusive):
    // backward scans left-to-right, so right (0) sorts BEFORE left
    // (1); forward scans the frame ahead, so right sorts AFTER left.
    val (leftSide, rightSide) = if (forward) (0, 1) else (1, 0)
    val l = left
      .withColumn(s"${P}t", col(leftTime))
      .withColumn(s"${P}side", lit(leftSide))
      .withColumn(s"${P}tie", lit(null))
      .withColumns(rightPayload.map(c => s"${P}p_$c" -> lit(null)).toMap)
    val r = right
      .withColumn(s"${P}t", col(rightTime))
      .withColumn(s"${P}side", lit(rightSide))
      .withColumn(s"${P}tie", rightTiebreak.map(col).getOrElse(lit(null)))
      // capture the payload BEFORE nulling out left-named columns — a
      // right payload column may share a name with a left column
      // (e.g. both sides carry `ts`), and the null overwrite below
      // would otherwise erase it
      .withColumns(rightPayload.map(c => s"${P}p_$c" -> col(c)).toMap)
      .withColumns(
        leftCols.filterNot(c => c == key).map(c => c -> lit(null)).toMap)
    val projected = Seq(s"${P}t", s"${P}side", s"${P}tie") ++
      rightPayload.map(c => s"${P}p_$c")
    val unioned = l.select((leftCols ++ projected).map(col): _*)
      .unionByName(r.select((leftCols ++ projected).map(col): _*))
    // ties at (__t, __side=right) resolved by the caller's tiebreak
    // column so "latest/next right row" is well-defined under
    // concurrent writes (backward takes the max tie via last();
    // forward takes the min tie via first())
    val ordered = Window.partitionBy(col(key))
      .orderBy(col(s"${P}t"), col(s"${P}side"), col(s"${P}tie"))
    val w =
      if (forward) ordered.rowsBetween(Window.currentRow, Window.unboundedFollowing)
      else ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rightPayload.foldLeft(unioned) { (df, c) =>
      val picked =
        if (forward) first(col(s"${P}p_$c"), ignoreNulls = true).over(w)
        else last(col(s"${P}p_$c"), ignoreNulls = true).over(w)
      df.withColumn(s"asof_$c", picked)
    }
    filled.filter(col(s"${P}side") === leftSide)
      .select(leftCols.map(col) ++ rightPayload.map(c => col(s"asof_$c")): _*)
  }
}
