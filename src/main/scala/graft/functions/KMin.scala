package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Distinct k-minimum-values buffer as a typed Aggregator — the KMV
  * sketch's state (SURVEY §4 tier (b), aggregate form), usable in
  * BATCH and in STREAMING aggregations alike.
  *
  * Unlike [[TopKAgg]] (a ranking buffer that keeps duplicates), this
  * is a SET lattice: the buffer is the k smallest DISTINCT values,
  * so merge is commutative, associative and IDEMPOTENT — duplicate
  * delivery of a whole micro-batch lands in the same state, which is
  * what makes it safe as streaming state with no dedup pass in
  * front. Map-side each partition ships ≤ k longs per group; the
  * distinct-count estimator (k−1)·2³² div h₍ₖ₎ reads the final
  * buffer (q250's arithmetic).
  */
class KMinAgg(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {

  override def zero: Seq[Long] = Seq.empty

  // The buffer is kept SORTED ASCENDING as its invariant, so
  // membership + insertion position are one binary search (O(log k)
  // per row, the AsOfStream round-9 treatment) instead of the
  // round-9 O(k) Seq.contains scan.

  /** Insertion index of `a` in sorted `b`, or -(idx+1) if present. */
  private def search(b: Seq[Long], a: Long): Int = {
    var lo = 0; var hi = b.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      val v = b(mid)
      if (v == a) return -(mid + 1)
      else if (v < a) lo = mid + 1
      else hi = mid
    }
    lo
  }

  override def reduce(b: Seq[Long], a: Long): Seq[Long] = {
    if (b.length == k && a >= b.last) return b
    val idx = search(b, a)
    if (idx < 0) b // already present: idempotent
    else {
      val (pre, post) = b.splitAt(idx)
      val grown = (pre :+ a) ++ post
      if (grown.length > k) grown.init else grown
    }
  }

  override def merge(x: Seq[Long], y: Seq[Long]): Seq[Long] = {
    // linear merge-union of two sorted-distinct buffers, truncated
    // at k — O(|x| + |y|), never a re-sort
    val out = Seq.newBuilder[Long]
    var i = 0; var j = 0; var n = 0
    while (n < k && (i < x.length || j < y.length)) {
      val v =
        if (j >= y.length || (i < x.length && x(i) <= y(j))) {
          val v0 = x(i); if (j < y.length && y(j) == v0) j += 1; i += 1; v0
        } else { val v0 = y(j); j += 1; v0 }
      out += v; n += 1
    }
    out.result()
  }

  override def finish(b: Seq[Long]): Seq[Long] = b

  override def bufferEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

object KMin {
  /** Untyped column form: `kmin(k)(hashCol)` → array<long>. */
  def kmin(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new KMinAgg(k), Encoders.scalaLong)
}
