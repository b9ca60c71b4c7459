package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable Misra–Gries / SpaceSaving-family heavy-hitters sketch
  * (Misra & Gries 1982; merge rule from Agarwal, Cormode, Huang,
  * Phillips, Wei & Yi, "Mergeable Summaries", PODS 2012) —
  * DETERMINISTIC frequency estimation in fixed space, the
  * frequency-domain sibling of [[KllAgg]]'s rank sketch.
  *
  * Why it exists here: q60's count-min answers point queries with an
  * OVERestimate (est ≥ truth, error from collisions); Misra–Gries is
  * the opposite contract — an UNDERestimate with a self-carried
  * deficit bound, and it additionally answers "which keys are hot"
  * without a candidate list, which count-min cannot. At 100 TB the
  * state is k (key, count) slots per group, merged across 1000
  * executors with one bounded shuffle — the standard top-talker /
  * hot-token / hot-rowkey monitor.
  *
  * Structure: at most k counters. An arriving item increments its
  * counter, opens a new one if a slot is free, and otherwise
  * decrements ALL k counters by 1 (the arriving item absorbs one
  * decrement too); zeroed counters free their slot. `d` accumulates
  * the per-counter decrement total. Merge: pointwise counter sum,
  * then if more than k keys survive, subtract the (k+1)-th largest
  * count from every counter and drop the non-positive — adding that
  * subtrahend to `d` (the PODS'12 rule).
  *
  * Self-carried guarantees, for EVERY reduce/merge order — which is
  * what makes the gate deterministic even though Spark's partition
  * merge order is not:
  *  - est(x) ≤ true(x)                       (counts only ever come
  *    from real arrivals; decrements/subtractions only reduce them)
  *  - true(x) ≤ est(x) + d                   (each unit of deficit is
  *    accounted exactly once in `d`)
  *  - d ≤ n/(k+1)                            (every decrement retires
  *    k+1 units of input weight)
  * Hence any x with true(x) > d is GUARANTEED a surviving counter —
  * the classic heavy-hitter completeness theorem.
  *
  * State is kept sorted by key (binary-search lookup, the KMinAgg
  * treatment) so reduce is O(log k) on the hit path and O(k) only
  * when a decrement fires.
  */
case class MgSketch(keys: Seq[Long], counts: Seq[Long],
    d: Long, n: Long) {

  /** Sketch frequency estimate for `x` (0 when untracked). */
  def estimate(x: Long): Long = {
    val i = MgSketch.search(keys, x)
    if (i >= 0) counts(i) else 0L
  }
}

object MgSketch {
  /** Binary search over a sorted Seq — index of `x`, or
    * -(insertionPoint+1) when absent (the KMinAgg treatment:
    * allocation-free on the per-row hit path, never a toArray
    * copy of the k-slot buffer). */
  private[functions] def search(b: Seq[Long], x: Long): Int = {
    var lo = 0; var hi = b.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      val v = b(mid)
      if (v == x) return mid
      else if (v < x) lo = mid + 1
      else hi = mid
    }
    -(lo + 1)
  }
}

class MisraGriesAgg(k: Int) extends Aggregator[Long, MgSketch, MgSketch] {
  require(k >= 1, "need at least one counter slot")

  override def zero: MgSketch = MgSketch(Vector.empty, Vector.empty, 0L, 0L)

  override def reduce(b: MgSketch, a: Long): MgSketch = {
    val i = MgSketch.search(b.keys, a)
    if (i >= 0)
      MgSketch(b.keys,
        b.counts.toVector.updated(i, b.counts(i) + 1), b.d, b.n + 1)
    else if (b.keys.length < k) {
      val at = -i - 1
      MgSketch((b.keys.take(at) :+ a) ++ b.keys.drop(at),
        (b.counts.take(at) :+ 1L) ++ b.counts.drop(at), b.d, b.n + 1)
    } else {
      // full and unseen: all counters (and the arrival) absorb one
      // decrement; zeroed slots free up
      val dec = b.counts.map(_ - 1L)
      val kept = b.keys.zip(dec).filter(_._2 > 0L)
      MgSketch(kept.map(_._1), kept.map(_._2), b.d + 1L, b.n + 1)
    }
  }

  override def merge(x: MgSketch, y: MgSketch): MgSketch = {
    val summed = (x.keys.zip(x.counts) ++ y.keys.zip(y.counts))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum)
      .toVector.sortBy(_._1)
    if (summed.length <= k)
      MgSketch(summed.map(_._1), summed.map(_._2), x.d + y.d, x.n + y.n)
    else {
      // PODS'12: subtract the (k+1)-th largest count everywhere
      val sub = summed.map(_._2).sorted(Ordering[Long].reverse)(k)
      val kept = summed.map { case (key, c) => (key, c - sub) }
        .filter(_._2 > 0L)
      MgSketch(kept.map(_._1), kept.map(_._2), x.d + y.d + sub,
        x.n + y.n)
    }
  }

  override def finish(b: MgSketch): MgSketch = b

  override def bufferEncoder: Encoder[MgSketch] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[MgSketch]()
  override def outputEncoder: Encoder[MgSketch] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[MgSketch]()
}
