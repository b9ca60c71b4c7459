package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming AS-OF join (last-click attribution live): every
  * purchase is attributed to the latest click at-or-before it for
  * the same user — AsOf.join's backward lookup (q62 semantics,
  * (ts, id)-max tiebreak) run as per-key state instead of a batch
  * window, the enrichment a SEP listener performs per mutation.
  *
  * Spark's built-in stream-stream joins cannot express "the LATEST
  * matching row" (that is an aggregation over the match set), so
  * this is a flatMapGroupsWithState operator. The state is designed
  * to the same bar as [[Funnel]]/[[RowMaterializer]]:
  *
  *  - ORDER-INVARIANT: state is a set union (distinct (ts, id)
  *    pairs per side) and every emission is a pure function of the
  *    accumulated state, so any arrival order — across and within
  *    micro-batches — yields the same final rows (permutation-fuzzed
  *    in StreamAsOfSpec);
  *  - BOUNDED by the watermark: once the event-time watermark
  *    passes `horizon`, nothing older can arrive, so (a) purchases
  *    below the horizon are FINALIZED — emitted once more and
  *    removed — and (b) clicks below the horizon collapse to their
  *    single (ts, id)-max survivor, which is exactly what any
  *    still-arriving purchase (ts ≥ horizon) could ever need.
  *    Steady-state memory is O(events within the watermark delay)
  *    per key, independent of stream lifetime.
  *
  * Compaction safety argument: a finalized purchase p had every
  * click ≤ p.ts already in state (they are all < horizon ≤ arrival
  * bound), so its last emission is exact; a future purchase has
  * ts ≥ horizon, and max{click ≤ ts} is either a click ≥ horizon
  * (retained in full) or the max click < horizon (the survivor) —
  * the compaction preserves both. Pinned by the
  * compaction-invariance property test.
  */
object AsOfStream {

  /** (user, kind ∈ {click, purchase}, event-time micros, event id) */
  case class Ev(user: String, kind: String, ts: Long, id: Long)

  /** Distinct (ts, id) pairs per side; purchases still pending.
    * INVARIANT (maintained by [[merge]]/[[compact]], assumed by the
    * track hot path's binary search): both lists ascending-sorted.
    * [[attribute]]/[[compact]] themselves stay order-agnostic — the
    * lattice proofs in StreamAsOfSpec exercise arbitrary orders. */
  case class St(clicks: List[(Long, Long)], purchases: List[(Long, Long)])

  /** click_id/click_ts = -1 when no click at-or-before the purchase. */
  case class Out(user_id: String, purchase_id: Long, purchase_ts: Long,
      click_id: Long, click_ts: Long)

  /** Linear merge-union of two ASCENDING-sorted distinct pair lists
    * — O(|a| + |b|), no rebuild, no hashing. */
  private def union(a: List[(Long, Long)],
      b: List[(Long, Long)]): List[(Long, Long)] = {
    val out = List.newBuilder[(Long, Long)]
    var (x, y) = (a, b)
    while (x.nonEmpty && y.nonEmpty) {
      val c = implicitly[Ordering[(Long, Long)]].compare(x.head, y.head)
      if (c < 0) { out += x.head; x = x.tail }
      else if (c > 0) { out += y.head; y = y.tail }
      else { out += x.head; x = x.tail; y = y.tail }
    }
    out ++= x; out ++= y
    out.result()
  }

  /** Set-union merge — commutative/associative/idempotent across any
    * partition of the event multiset. State lists hold the sorted
    * invariant (ascending (ts, id), distinct), so each merge is
    * O(|state| + |batch| log |batch|) — a linear splice, never a
    * per-merge distinct rebuild of the whole state (hot keys stay
    * linear in batch size). */
  def merge(st: St, evs: Seq[Ev]): St = St(
    union(st.clicks, evs.collect {
      case e if e.kind == "click" => (e.ts, e.id) }.distinct.sorted.toList),
    union(st.purchases, evs.collect {
      case e if e.kind == "purchase" => (e.ts, e.id) }.distinct.sorted.toList))

  /** Latest click at-or-before `pTs`: lexicographic (ts, id) max —
    * the AsOf.join tiebreak (equal-time clicks resolved by max id).
    * Order-agnostic (linear scan) — the spec-facing definition. */
  def attribute(clicks: Seq[(Long, Long)], pTs: Long): Option[(Long, Long)] = {
    val cand = clicks.filter(_._1 <= pTs)
    if (cand.isEmpty) None else Some(cand.max)
  }

  /** [[attribute]] against an ascending-sorted click array — binary
    * search, O(log n) per purchase instead of a full scan (the track
    * hot path: per batch, sort once, search per pending purchase). */
  private def attributeSorted(clicks: Array[(Long, Long)],
      pTs: Long): Option[(Long, Long)] = {
    var lo = 0; var hi = clicks.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (clicks(mid)._1 <= pTs) lo = mid + 1 else hi = mid
    }
    if (lo == 0) None else Some(clicks(lo - 1))
  }

  /** Watermark compaction (see the safety argument above). Returns
    * (compacted state, finalized purchases). */
  def compact(st: St, horizon: Long): (St, List[(Long, Long)]) = {
    val (done, pending) = st.purchases.partition(_._1 < horizon)
    val (old, live) = st.clicks.partition(_._1 < horizon)
    val survivor = if (old.isEmpty) Nil else List(old.max)
    (St(survivor ++ live, pending), done)
  }

  private def row(user: String, clicks: Array[(Long, Long)],
      p: (Long, Long)): Out = {
    val best = attributeSorted(clicks, p._1)
    Out(user, p._2, p._1, best.map(_._2).getOrElse(-1L),
      best.map(_._1).getOrElse(-1L))
  }

  /** Streaming tracker. Emits, per touched user per batch, the
    * current attribution of every pending purchase (OutputMode
    * .Update — the last emission per purchase_id is final) plus the
    * final row of every purchase the watermark just finalized.
    * Input must carry the query's watermark (a timestamp column
    * derived from `ts`); without one the horizon stays at -∞ and
    * the operator degrades to unbounded-but-correct. */
  def track(s: SparkSession, events: Dataset[Ev]): Dataset[Out] = {
    import s.implicits._
    events.groupByKey(_.user)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (user: String, evs: Iterator[Ev], state: GroupState[St]) => {
          val st1 = merge(state.getOption.getOrElse(St(Nil, Nil)), evs.toSeq)
          // watermark ms → micros; 0 when the query has no watermark
          val horizon = state.getCurrentWatermarkMs() * 1000L
          val (st2, done) =
            if (horizon > 0L) compact(st1, horizon) else (st1, Nil)
          // finalized purchases attribute against the PRE-compaction
          // clicks (their own ≤-ts clicks are all there); state lists
          // hold the sorted invariant, so toArray is search-ready
          val preClicks = st1.clicks.toArray
          val doneRows = done.map(p => row(user, preClicks, p))
          state.update(st2)
          val liveClicks = st2.clicks.toArray
          (doneRows ++ st2.purchases.map(p => row(user, liveClicks, p)))
            .iterator
        })
  }
}
