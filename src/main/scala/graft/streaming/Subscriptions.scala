package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SepModel subscription equivalent (SURVEY §2.G): named, filtered
  * views over the mutation stream that independent consumers attach
  * to. In the reference a subscription is a replication peer with
  * table/column-family filters; here it is a declarative filter over
  * the WAL stream — each subscription can power its own streaming
  * query (fan-out), and Spark's source tracks offsets per query
  * exactly like the reference tracks per-subscription progress in ZK.
  */
final case class Subscription(
    name: String,
    table: Option[String] = None,
    family: Option[String] = None,
    qualifier: Option[String] = None) {

  /** Predicate over the WAL schema (seq, ts, table, rowkey, cells). */
  def predicate: Column = {
    val tableOk = table.map(col("table") === _).getOrElse(lit(true))
    val cellOk = (family, qualifier) match {
      case (None, None) => lit(true)
      case _ =>
        val f = (c: Column) =>
          family.map(c.getField("family") === _).getOrElse(lit(true)) &&
            qualifier.map(c.getField("qualifier") === _).getOrElse(lit(true))
        exists(col("cells"), f)
    }
    tableOk && cellOk
  }

  /** The subscription's view of the stream; cells are narrowed to the
    * subscribed family/qualifier (like SEP's per-subscription
    * KeyValue filtering). */
  def apply(wal: DataFrame): DataFrame = {
    val filtered = wal.filter(predicate)
    (family, qualifier) match {
      case (None, None) => filtered
      case _ =>
        val f = (c: Column) =>
          family.map(c.getField("family") === _).getOrElse(lit(true)) &&
            qualifier.map(c.getField("qualifier") === _).getOrElse(lit(true))
        filtered.withColumn("cells", filter(col("cells"), f))
    }
  }
}

object Subscriptions {
  /** Fan-out: attach each subscription to the shared stream. */
  def fanOut(wal: DataFrame, subs: Seq[Subscription]): Map[String, DataFrame] =
    subs.map(s => s.name -> s(wal)).toMap
}
