package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Order-invariant streaming funnel (first view → first qualifying
  * purchase), the SEP-listener analytics pattern behind q16 run as
  * live state instead of a batch window.
  *
  * The per-user state is designed so that merging events in ANY
  * arrival order — across and within micro-batches — yields the same
  * final state (the idempotent-reprocessing contract, same bar as
  * RowMaterializer):
  *
  *  - `minView` only ever decreases (a min-lattice);
  *  - `pending` retains EVERY purchase ts `< minView` — a purchase
  *    can become the conversion later if an earlier view arrives;
  *  - `convTs` keeps only `min(purchase ts ≥ minView)` — discarding
  *    the non-minimal qualifying purchases is safe because `minView`
  *    only decreases, which only ever ENLARGES the qualifying set,
  *    and the discarded ones (≥ convTs) can never become its min.
  *
  * State is bounded by the number of purchases a user makes BEFORE
  * their first observed view (pending drains into convTs as views
  * arrive) — O(1) in real clickstreams; a user with purchases and no
  * views retains them all and emits nothing.
  */
object Funnel {

  /** Long.MaxValue = "none" for both optional timestamps. */
  case class FunnelSt(minView: Long, pending: List[Long], convTs: Long)

  /** conv_ts = -1 when the user has viewed but not converted. */
  case class FunnelOut(user_id: String, first_view: Long, conv_ts: Long)

  /** Named event row for the TTL variant — a case-class encoder maps
    * by name and tolerates the extra watermark column that
    * EventTimeTimeout requires in the plan (tuple encoders don't). */
  case class FunnelEvent(user: String, etype: String, ts: Long)

  private val None_ = Long.MaxValue

  /** Pure merge of a batch of (etype, ts) events into the state —
    * commutative across any partition of the event multiset
    * (unit-tested against permutations in StreamFunnelSpec). */
  def merge(st: FunnelSt, events: Seq[(String, Long)]): FunnelSt = {
    val views = events.collect { case ("view", ts) => ts }
    val purchases = events.collect { case ("purchase", ts) => ts }
    val v2 = (st.minView +: views).min
    val cands = st.pending ++ purchases ++
      (if (st.convTs != None_) List(st.convTs) else Nil)
    val below = cands.filter(_ < v2).distinct.sorted
    val ge = cands.filter(_ >= v2)
    val conv2 = if (v2 == None_ || ge.isEmpty) None_ else ge.min
    FunnelSt(v2, below, conv2)
  }

  /** Streaming tracker over (user, etype, ts) events; emits the
    * current funnel row for every viewed user touched in a batch
    * (OutputMode.Update — the last emission per user is final). */
  def track(s: SparkSession, events: Dataset[(String, String, Long)]): Dataset[FunnelOut] = {
    import s.implicits._
    events.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (user: String, evs: Iterator[(String, String, Long)],
         state: GroupState[FunnelSt]) => {
          val st0 = state.getOption.getOrElse(FunnelSt(None_, Nil, None_))
          val st1 = merge(st0, evs.map(e => (e._2, e._3)).toSeq)
          state.update(st1)
          if (st1.minView == None_) Iterator.empty
          else Iterator.single(FunnelOut(user, st1.minView,
            if (st1.convTs == None_) -1L else st1.convTs))
        })
  }

  /** Bounded-state tracker: users idle past `ttlMillis` of EVENT time
    * (enforced via the input's watermark, like
    * RowMaterializer.materializeWithTTL) are flushed — their final
    * funnel row is emitted once and the state evicted, so total
    * state is O(users active within the watermark+TTL horizon)
    * instead of every user ever seen. A user resuming after eviction
    * restarts cold (the documented bounded-memory trade; eviction
    * behavior is pinned in StreamFunnelSpec). Input must carry a
    * watermark on a timestamp column derived from `_3` (micros). */
  def trackWithTTL(s: SparkSession, events: Dataset[FunnelEvent],
      ttlMillis: Long): Dataset[FunnelOut] = {
    import s.implicits._
    events.groupByKey(_.user)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.EventTimeTimeout)(
        (user: String, evs: Iterator[FunnelEvent],
         state: GroupState[FunnelSt]) => {
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            if (st.minView == None_) Iterator.empty
            else Iterator.single(FunnelOut(user, st.minView,
              if (st.convTs == None_) -1L else st.convTs))
          } else {
            val batch = evs.map(e => (e.etype, e.ts)).toSeq
            val st1 = merge(state.getOption.getOrElse(FunnelSt(None_, Nil, None_)),
              batch)
            state.update(st1)
            // timeout strictly after the watermark (which may already
            // be past this key's own max event time)
            state.setTimeoutTimestamp(math.max(state.getCurrentWatermarkMs(),
              batch.map(_._2).max / 1000L) + ttlMillis)
            if (st1.minView == None_) Iterator.empty
            else Iterator.single(FunnelOut(user, st1.minView,
              if (st1.convTs == None_) -1L else st1.convTs))
          }
        })
  }
}
