package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Exact top-k by (score desc, id asc) as a custom typed Aggregator
  * (SURVEY §4 tier (b), aggregate form).
  *
  * Scale rationale: ranking scored candidates with a window function
  * shuffles EVERY scored row to sort it; this aggregator keeps a
  * bounded k-buffer per group on the map side, so the shuffle carries
  * at most k rows per (partition × group) — the difference between
  * moving |corpus| rows and moving k·partitions rows per query at
  * 100 TB. Deterministic: total order (score desc, id asc).
  */
case class Scored(id: Long, score: Double)

class TopKAgg(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {

  private def lt(a: Scored, b: Scored): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  override def zero: Seq[Scored] = Seq.empty

  override def reduce(buf: Seq[Scored], a: Scored): Seq[Scored] =
    if (buf.length < k) (buf :+ a).sortWith(lt)
    else if (lt(a, buf.last)) (buf.init :+ a).sortWith(lt)
    else buf

  override def merge(x: Seq[Scored], y: Seq[Scored]): Seq[Scored] =
    (x ++ y).sortWith(lt).take(k)

  override def finish(b: Seq[Scored]): Seq[Scored] = b

  override def bufferEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  override def outputEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
}

object TopK {
  /** Untyped column form: `topk(k)(idCol, scoreCol)` → array<struct>. */
  def topk(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new TopKAgg(k), Encoders.product[Scored])
}
