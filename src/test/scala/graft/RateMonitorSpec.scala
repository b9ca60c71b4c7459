package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.RateMonitor
import graft.streaming.RateMonitor.{RateOut, RateSt}

/** q252 pure-transition semantics (no Spark session needed). */
class RateMonitorSpec extends AnyFunSuite {

  private val H = 3600000000L
  private def evts(hour: Long, n: Int): Seq[Long] =
    (0 until n).map(i => hour * H + i.toLong)
  private def wmAfter(hour: Long): Long = (hour + 1) * 3600000L

  private def run(batches: Seq[(Seq[Long], Long)]): (RateSt, List[RateOut]) =
    batches.foldLeft((RateMonitor.empty, List.empty[RateOut])) {
      case ((st, acc), (ts, wm)) =>
        val (st2, out) = RateMonitor.advance(st, "s", ts, wm)
        (st2, acc ++ out)
    }

  test("no emission until 24 present hours of history, then exact ratios") {
    // 24 hours of 10/h, then 30 (spike) and 20 (exactly 2x: NOT a spike)
    val ts = (0L until 24L).flatMap(evts(_, 10)) ++
      evts(24L, 30) ++ evts(25L, 20) ++ evts(26L, 10)
    val (_, out) = run(Seq((ts, wmAfter(25L))))
    assert(out.map(_.h) === List(24L, 25L))
    val r24 = out.find(_.h == 24L).get
    assert(r24.s24 === 240L && r24.ratio_ppm === 3000000L && r24.spike)
    val r25 = out.find(_.h == 25L).get
    // baseline slid: hours 1..24 = 23*10 + 30 = 260
    assert(r25.s24 === 260L && r25.ratio_ppm === 1846153L && !r25.spike)
    // hour 26 is not closed by this watermark
    assert(!out.exists(_.h == 26L))
  }

  test("batch slicing and within-batch order never change the output") {
    val rnd = new scala.util.Random(11)
    val all = (0L until 30L).flatMap(h => evts(h, 5 + (h % 7).toInt))
    val (_, ref) = run(Seq((all, wmAfter(29L))))
    for (trial <- 1 to 10) {
      val shuffledWithin = rnd.shuffle(all.toList)
      // split into ordered slices by hour boundary groups of random size,
      // watermark advancing monotonically to the max ts seen so far
      val sorted = shuffledWithin.sortBy(t => t / H) // keep hours ordered
      val cut1 = rnd.nextInt(sorted.length)
      val cut2 = cut1 + rnd.nextInt(sorted.length - cut1)
      val b1 = sorted.take(cut1); val b2 = sorted.slice(cut1, cut2)
      val b3 = sorted.drop(cut2)
      def wm(b: Seq[Long], prev: Long): Long =
        if (b.isEmpty) prev else math.max(prev, b.max / 1000L)
      val w1 = wm(b1, 0L); val w2 = wm(b2, w1); val w3 = wmAfter(29L)
      val (_, got) = run(Seq((b1, w1), (b2, w2), (b3, w3)))
      assert(got.toSet === ref.toSet, s"trial $trial")
      assert(got.map(_.h) === got.map(_.h).sorted, "emission in hour order")
    }
  }

  test("late rows for a finalized hour are counted, never re-opened") {
    val warm = (0L until 26L).flatMap(evts(_, 10))
    val (st1, out1) = run(Seq((warm, wmAfter(24L))))
    assert(out1.map(_.h) === List(24L))
    val (st2, out2) = RateMonitor.advance(st1, "s", evts(3L, 4), wmAfter(24L))
    assert(out2.isEmpty)
    assert(st2.nLate === st1.nLate + 4)
    assert(st2.ring === st1.ring && st2.nFin === st1.nFin)
  }

  test("ring is bounded at 24 and pending drains on finalize") {
    val ts = (0L until 100L).flatMap(evts(_, 3))
    val (st, out) = run(Seq((ts, wmAfter(98L))))
    assert(st.ring.length === 24)
    assert(st.pending.keySet === Set(100L - 1L), "only the open last hour")
    assert(st.nFin === 99L)
    assert(out.length === 75) // hours 24..98
  }
}
