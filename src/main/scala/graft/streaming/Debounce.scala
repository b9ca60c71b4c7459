package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming EVENT DEBOUNCE — q267's burst-collapse run live at the
  * SEP listener: an event within `gap` of its predecessor in the
  * (user, type) stream is a retry/double-fire and must not reach
  * downstream counters. State per key is O(1): the last event time
  * plus running (events, dropped) counters — the chain rule only
  * ever needs the predecessor, which is what makes debounce a
  * constant-state streaming operator while full dedup (q86) keys on
  * ids.
  *
  * ORDERING contract stated, not wished away (the q230 pattern):
  * the chain rule is a function of per-key (ts, id) order, so
  * within an invocation events process in that order, and an
  * arrival BELOW the key's high-water ts is late-ROUTED (counted in
  * `n_late`, never spliced into the chain) — the staged WAL honors
  * the CDC per-key ordering contract, so the gate's final counters
  * replay as q267's batch windows exactly.
  */
object Debounce {

  case class Ev(user: String, kind: String, ts: Long, id: Long)

  case class St(lastTs: Long, lastId: Long, nEvents: Long, nDropped: Long,
      nLate: Long)

  case class Out(user: String, kind: String, n_events: Long,
      n_dropped: Long, n_late: Long)

  val empty: St = St(Long.MinValue, Long.MinValue, 0L, 0L, 0L)

  /** Pure per-key transition over one invocation's events. */
  def advance(st: St, evs: Seq[Ev], gapMicros: Long): St =
    evs.sortBy(e => (e.ts, e.id)).foldLeft(st) { (s, e) =>
      if (e.ts < s.lastTs || (e.ts == s.lastTs && e.id <= s.lastId))
        s.copy(nLate = s.nLate + 1)
      else {
        val dropped = s.lastTs != Long.MinValue && e.ts - s.lastTs <= gapMicros
        St(e.ts, e.id, s.nEvents + 1,
          s.nDropped + (if (dropped) 1L else 0L), s.nLate)
      }
    }

  def track(s: SparkSession, events: Dataset[Ev],
      gapMicros: Long): Dataset[Out] = {
    import s.implicits._
    events.groupByKey(e => (e.user, e.kind))
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (key: (String, String), evs: Iterator[Ev], state: GroupState[St]) => {
          val st = advance(state.getOption.getOrElse(empty), evs.toSeq,
            gapMicros)
          state.update(st)
          Iterator.single(Out(key._1, key._2, st.nEvents, st.nDropped,
            st.nLate))
        })
  }
}
