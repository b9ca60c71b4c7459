package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{Debounce, MaxVersions}

/** q269/q270 state-lattice semantics (pure, no Spark session). */
class StreamCellOpsSpec extends AnyFunSuite {

  // ---- q270 max-versions k-max lattice ----------------------------

  test("max-versions merge is permutation/slicing invariant and idempotent") {
    val rnd = new scala.util.Random(5)
    val cells = (1 to 30).map(i =>
      MaxVersions.Cell("u", "q", rnd.nextInt(10).toLong, i.toLong, i * 10L))
    val ref = MaxVersions.merge(MaxVersions.St(Nil), cells, 3)
    for (trial <- 1 to 20) {
      val shuffled = rnd.shuffle(cells.toList)
      val cut = rnd.nextInt(cells.length)
      val st1 = MaxVersions.merge(MaxVersions.St(Nil), shuffled.take(cut), 3)
      val st2 = MaxVersions.merge(st1, shuffled.drop(cut), 3)
      assert(st2 === ref, s"trial $trial")
      // replaying a duplicate batch is a no-op
      assert(MaxVersions.merge(st2, shuffled.take(5), 3) === ref)
    }
    // newest-first (ts desc, seq desc) and bounded at k
    assert(ref.cells.length === 3)
    val keys = ref.cells.map(c => (c._1, c._2))
    assert(keys.sortBy(k => (-k._1, -k._2)) === keys)
  }

  test("max-versions rows number versions densely from 1") {
    val st = MaxVersions.St(List((30L, 3L, 1L), (20L, 2L, 2L), (10L, 1L, 3L)))
    val rows = MaxVersions.rows("u", "q", st)
    assert(rows.map(_.version) === Seq(1L, 2L, 3L))
    assert(rows.head.ts === 30L)
  }

  // ---- q269 debounce chain state ----------------------------------

  test("debounce: chain collapse keeps only burst heads") {
    // bursts at t=0..3 (gap 1), then t=100, then 101
    val evs = Seq(0L, 1L, 2L, 3L, 100L, 101L).zipWithIndex.map {
      case (ts, i) => Debounce.Ev("u", "click", ts, i.toLong)
    }
    val st = Debounce.advance(Debounce.empty, evs, gapMicros = 1L)
    assert(st.nEvents === 6L)
    assert(st.nDropped === 4L, "three burst tails + the 101 follower")
    assert(st.nLate === 0L)
  }

  test("debounce: below-high-water arrivals are late-routed, not spliced") {
    val st1 = Debounce.advance(Debounce.empty,
      Seq(Debounce.Ev("u", "click", 100L, 5L)), 10L)
    val st2 = Debounce.advance(st1,
      Seq(Debounce.Ev("u", "click", 50L, 4L)), 10L)
    assert(st2.nLate === 1L)
    assert(st2.nEvents === 1L && st2.lastTs === 100L,
      "chain state untouched by the late row")
  }

  test("debounce: batch slicing at ordered boundaries preserves the chain") {
    val evs = (0 until 40).map(i =>
      Debounce.Ev("u", "view", i.toLong * 7 % 50 + i / 10 * 100, i.toLong))
      .sortBy(e => (e.ts, e.id))
    val ref = Debounce.advance(Debounce.empty, evs, 5L)
    for (cut <- Seq(1, 10, 25, 39)) {
      val st1 = Debounce.advance(Debounce.empty, evs.take(cut), 5L)
      val st2 = Debounce.advance(st1, evs.drop(cut), 5L)
      assert(st2 === ref, s"cut $cut")
    }
  }
}
