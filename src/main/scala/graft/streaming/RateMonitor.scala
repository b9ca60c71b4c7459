package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming RATE-SPIKE monitor — q163's hourly traffic alarm
  * (n·24 > 2·Σ of the previous 24 PRESENT hours, all-integer) run
  * LIVE off the WAL instead of as a batch rollup: the on-call alarm
  * fires when the hour closes, not when tomorrow's batch runs.
  *
  * Keyed by SERIES (here one series, "events" — production
  * parallelism is across monitored series, each O(1) state; a single
  * global series is the honest shape of one metric, stated not
  * hidden). Per-series state:
  *
  *  - `pending`: hour → count for hours the watermark has not closed
  *    (counts are a sum lattice — arrival order and batch slicing
  *    never matter);
  *  - `ring`: the last ≤24 FINALIZED present hours (the q163
  *    baseline is the previous 24 present hours, not calendar
  *    hours), plus `nFin`, the number of finalized hours so far
  *    (the "full history" gate: no alarm until 24 present hours of
  *    history exist — q163's c24 = 24 filter);
  *  - `emittedUpTo`: finalize-once high water. An hour is FINALIZED
  *    exactly once, at the first invocation where the event-time
  *    watermark passes its end — its count is then complete by the
  *    watermark contract — and emitted with its trailing sum and
  *    integer ratio. Late rows for an already-finalized hour (a
  *    watermark-contract violation) are counted, never re-opened.
  *
  * State is O(25 + pending hours within the watermark delay) per
  * series, independent of stream lifetime. The stream's LAST present
  * hour never finalizes (no later event ever pushes the watermark
  * past its end) — the gate's oracle mirrors exactly that honest
  * append-mode edge, the q121 precedent.
  */
object RateMonitor {

  case class Ev(series: String, ts: Long)

  case class RateSt(pending: Map[Long, Long], ring: List[(Long, Long)],
      nFin: Long, emittedUpTo: Long, nLate: Long)

  /** One finalized hour: spike ⟺ n·24e6 div s24 > 2e6 (emitted only
    * with full 24-hour history, like q163's c24 filter). */
  case class RateOut(series: String, h: Long, n: Long, s24: Long,
      ratio_ppm: Long, spike: Boolean)

  val empty: RateSt = RateSt(Map.empty, Nil, 0L, Long.MinValue, 0L)

  private val HourMicros = 3600000000L

  /** Pure transition: fold a batch of event timestamps in, then
    * finalize every pending hour the watermark (ms) has closed, in
    * ascending order. Returns (state', emitted rows). Unit-testable
    * and the single place the semantics live. */
  def advance(st: RateSt, series: String, tsBatch: Seq[Long],
      wmMs: Long): (RateSt, List[RateOut]) = {
    var pending = st.pending
    var nLate = st.nLate
    tsBatch.foreach { ts =>
      val h = Math.floorDiv(ts, HourMicros)
      if (h <= st.emittedUpTo) nLate += 1
      else pending = pending.updated(h, pending.getOrElse(h, 0L) + 1L)
    }
    var ring = st.ring
    var nFin = st.nFin
    var upTo = st.emittedUpTo
    val out = List.newBuilder[RateOut]
    val closable = pending.keys.filter(h => (h + 1) * 3600000L <= wmMs)
      .toList.sorted
    closable.foreach { h =>
      val n = pending(h)
      if (nFin >= 24) {
        val s24 = ring.map(_._2).sum
        val ratio = n * 24000000L / s24
        out += RateOut(series, h, n, s24, ratio, ratio > 2000000L)
      }
      ring = (ring :+ (h, n)).takeRight(24)
      nFin += 1
      upTo = h
      pending = pending - h
    }
    (RateSt(pending, ring, nFin, upTo, nLate), out.result())
  }

  /** Streaming tracker. Input must carry the query's watermark (a
    * timestamp column derived from `ts`). EventTimeTimeout arms a
    * wake-up just past the watermark so hours whose data arrived in
    * the FINAL data batch still finalize on the trailing no-data
    * batch. */
  def track(s: SparkSession, events: Dataset[Ev]): Dataset[RateOut] = {
    import s.implicits._
    events.groupByKey(_.series)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(
        (series: String, evs: Iterator[Ev], state: GroupState[RateSt]) => {
          val st0 = state.getOption.getOrElse(empty)
          val wm = state.getCurrentWatermarkMs()
          val (st1, out) = advance(st0, series,
            evs.map(_.ts).toSeq, wm)
          state.update(st1)
          // wake again once the watermark moves past its current
          // value (the no-data batch after the last data batch)
          state.setTimeoutTimestamp(wm + 1L)
          out.iterator
        })
  }
}
