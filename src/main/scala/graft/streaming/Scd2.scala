package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** STREAMING SCD2 maintenance (q230): the q70 validity-interval
  * history kept live off the CDC stream — each key's new mutation
  * CLOSES the currently-open version (emitting the final
  * [valid_from, valid_to) row exactly once) and opens the next.
  * This is the dimension-table maintenance loop a warehouse runs on
  * every changefeed.
  *
  * Ordering contract, stated rather than wished away: version
  * intervals are a function of per-key ORDER, so the operator
  * requires per-key in-order delivery — the CDC-log contract the
  * WAL provides (segments are seq-ranged; within a batch the group
  * iterator is sorted by (ts, seq)). An arrival at or below the
  * key's (ts, seq) high-water mark CANNOT be spliced into already-
  * emitted closed intervals; it is routed to the sink as a `late`
  * row — counted and auditable (the q192/q198 lateness
  * surface), never silently dropped, never corrupting history.
  * State per key is O(1): the high-water mark + the one open
  * version; the HISTORY lives in the append sink, which is why this
  * scales to an unbounded stream where a sorted-list state would
  * not.
  *
  * Sink idempotence: `closed` rows are emitted exactly once (the
  * open version is closed by precisely one successor under the
  * high-water guard); the `open` row for a key is re-emitted each
  * time it changes, so the read side collapses (user, valid_from)
  * groups with max(valid_to) — a closed row supersedes the stale
  * open emission it replaces. Checkpoint replay of a batch
  * re-appends duplicate rows; the same collapse absorbs them. */
object Scd2 {

  case class Scd2Event(user: Long, seq: Long, ts: Long, etype: String,
      value: Double)
  case class Scd2St(hwTs: Long, hwSeq: Long, hasOpen: Boolean,
      openSeq: Long, openTs: Long, openType: String, openValue: Double)
  /** kind ∈ closed | open | late. */
  case class Scd2Row(user_id: Long, event_id: Long, event_type: String,
      value: Double, valid_from: Long, valid_to: Option[Long], kind: String)

  def track(events: Dataset[Scd2Event]): Dataset[Scd2Row] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (user: Long, it: Iterator[Scd2Event], state: GroupState[Scd2St]) => {
          var st = state.getOption
            .getOrElse(Scd2St(Long.MinValue, Long.MinValue, false, 0L, 0L, "", 0.0))
          val out = scala.collection.mutable.ArrayBuffer[Scd2Row]()
          for (e <- it.toSeq.sortBy(e => (e.ts, e.seq))) {
            if (e.ts < st.hwTs || (e.ts == st.hwTs && e.seq <= st.hwSeq))
              out += Scd2Row(user, e.seq, e.etype, e.value, e.ts, None, "late")
            else {
              if (st.hasOpen)
                out += Scd2Row(user, st.openSeq, st.openType, st.openValue,
                  st.openTs, Some(e.ts), "closed")
              st = Scd2St(e.ts, e.seq, true, e.seq, e.ts, e.etype, e.value)
            }
          }
          if (st.hasOpen)
            out += Scd2Row(user, st.openSeq, st.openType, st.openValue,
              st.openTs, None, "open")
          state.update(st)
          out.iterator
        })
  }
}
