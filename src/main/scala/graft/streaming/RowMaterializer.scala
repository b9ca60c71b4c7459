package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.model.{Cell, Mutation, RowState}

/** Stateful latest-cell-wins row materialization — the SepConsumer +
  * EventListener equivalent (SURVEY §2.G).
  *
  * Keyed by (table, rowkey); state is the current cell map plus the
  * (ts, seq) high-water mark per qualifier. Out-of-order mutations
  * (older (ts, seq) than the applied cell) are ignored — same
  * semantics as HBase cell versions; row tombstones clear the row.
  *
  * Scale: state lives in the state store partitioned by key — one
  * shuffle per micro-batch, state size O(live rows), no global sort.
  */
object RowMaterializer {

  /** Per-qualifier applied version: value + (ts, seq) that wrote it. */
  case class CellV(value: String, ts: Long, seq: Long)
  case class RowCells(cells: Map[String, CellV], version: Long, deleted: Boolean)

  private def newer(ts: Long, seq: Long, c: CellV): Boolean =
    ts > c.ts || (ts == c.ts && seq > c.seq)

  /** Apply one mutation to the row state (pure — unit-testable).
    *
    * Simplification vs full HBase semantics: a qualifier delete
    * removes the applied cell but leaves no masking tombstone, so a
    * LATER-arriving put with an OLDER (ts, seq) than the delete can
    * resurrect the cell. Within-batch mutations are sorted by
    * (ts, seq) first, so this only matters for cross-batch
    * out-of-order deletes — acceptable for WAL replay, where
    * per-key order is preserved by the source. */
  def applyMutation(st: RowCells, m: Mutation): RowCells = {
    var cells = st.cells
    var deleted = st.deleted
    m.cells.foreach { c: Cell =>
      val key = s"${c.family}:${c.qualifier}"
      c.kind match {
        case "delete_row" =>
          cells = Map.empty; deleted = true
        case "delete" =>
          cells.get(key).foreach { old =>
            if (newer(c.ts, m.seq, old)) cells = cells - key
          }
        case _ => // put
          val ok = cells.get(key).forall(old => newer(c.ts, m.seq, old))
          if (ok) {
            cells = cells + (key -> CellV(c.value, c.ts, m.seq))
            deleted = false
          }
      }
    }
    RowCells(cells, math.max(st.version, m.ts), deleted)
  }

  /** Streaming materialization: emits the updated RowState for every
    * key touched in each micro-batch (OutputMode.Update). */
  def materialize(s: SparkSession, mutations: Dataset[Mutation]): Dataset[RowState] = {
    import s.implicits._
    mutations
      .groupByKey(m => (m.table, m.rowkey))
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (key: (String, String), muts: Iterator[Mutation], state: GroupState[RowCells]) => {
          val st0 = state.getOption.getOrElse(RowCells(Map.empty, 0L, deleted = false))
          // WAL order within the batch: (ts, seq)
          val st = muts.toSeq.sortBy(m => (m.ts, m.seq)).foldLeft(st0)(applyMutation)
          state.update(st)
          Iterator.single(RowState(key._1, key._2,
            st.cells.map { case (k, v) => k -> v.value },
            st.version, st.deleted))
        })
  }

  /** Streaming materialization with bounded state: rows idle past
    * `ttl` (event time, enforced via the input watermark) are evicted
    * and emitted once as deleted tombstone states. At 100 TB the
    * state store holds only rows touched within the watermark+ttl
    * horizon instead of every key ever seen.
    *
    * Input must carry a watermark on `eventTimeCol` (a TIMESTAMP
    * column derived from the mutation ts). */
  def materializeWithTTL(s: SparkSession, mutations: Dataset[Mutation],
      ttlMillis: Long): Dataset[RowState] = {
    import s.implicits._
    mutations
      .groupByKey(m => (m.table, m.rowkey))
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.EventTimeTimeout)(
        (key: (String, String), muts: Iterator[Mutation], state: GroupState[RowCells]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.single(RowState(key._1, key._2, Map.empty, 0L, deleted = true))
          } else {
            val st0 = state.getOption.getOrElse(RowCells(Map.empty, 0L, deleted = false))
            val st = muts.toSeq.sortBy(m => (m.ts, m.seq)).foldLeft(st0)(applyMutation)
            state.update(st)
            // version is epoch micros; timeout at version/1000 + ttl
            state.setTimeoutTimestamp(st.version / 1000L + ttlMillis)
            Iterator.single(RowState(key._1, key._2,
              st.cells.map { case (k, v) => k -> v.value },
              st.version, st.deleted))
          }
        })
  }

  /** Batch variant over a static mutation Dataset (same semantics;
    * used for reprocessing/backfill). */
  def materializeBatch(s: SparkSession, mutations: Dataset[Mutation]): Dataset[RowState] = {
    import s.implicits._
    mutations
      .groupByKey(m => (m.table, m.rowkey))
      .mapGroups { (key, muts) =>
        val st = muts.toSeq.sortBy(m => (m.ts, m.seq))
          .foldLeft(RowCells(Map.empty, 0L, deleted = false))(applyMutation)
        RowState(key._1, key._2,
          st.cells.map { case (k, v) => k -> v.value }, st.version, st.deleted)
      }
  }
}
