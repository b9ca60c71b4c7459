package graft.model

/** The CDC data model — the Spark-native re-expression of the
  * reference SEP event surface (SepEvent / KeyValue / payload).
  *
  * A `Mutation` is one WAL entry: an ordered set of cell edits to one
  * row of one table. `kind` is "put", "delete" (one qualifier) or
  * "delete_row". `seq` is the WAL sequence number: total order within
  * a (table, rowkey), used to break event-time ties exactly like the
  * reference preserves per-row WAL order.
  */
case class Cell(
    family: String,
    qualifier: String,
    value: String,
    ts: Long, // event-time, epoch micros
    kind: String)

case class Mutation(
    seq: Long,
    ts: Long,
    table: String,
    rowkey: String,
    cells: Seq[Cell])

/** Materialized latest-cell-wins row view (the HBase row snapshot a
  * SEP consumer reconstructs). `cells` maps "family:qualifier" →
  * value; `version` is the max (ts) applied; `deleted` marks a row
  * tombstone. */
case class RowState(
    table: String,
    rowkey: String,
    cells: Map[String, String],
    version: Long,
    deleted: Boolean)
