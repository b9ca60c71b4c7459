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

  override def reduce(b: Seq[Long], a: Long): Seq[Long] =
    if (b.contains(a)) b
    else if (b.length < k) (b :+ a).sorted
    else if (a < b.last) (b.init :+ a).sorted
    else b

  override def merge(x: Seq[Long], y: Seq[Long]): Seq[Long] =
    (x ++ y).distinct.sorted.take(k)

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
