package graft

import org.apache.spark.sql.functions._
import graft.streaming.AsOfStream
import graft.streaming.AsOfStream.{Ev, St}
import graft.operators.{AsOf, StreamingOps}

/** q247 streaming as-of join: state-lattice semantics. */
class StreamAsOfSpec extends SparkSpec {

  private def finalRows(st: St): Set[(Long, Long, Long)] =
    st.purchases.map { p =>
      val best = AsOfStream.attribute(st.clicks, p._1)
      (p._2, best.map(_._2).getOrElse(-1L), best.map(_._1).getOrElse(-1L))
    }.toSet

  test("merge is arrival-order and batch-partition invariant") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 20) {
      val evs = (1 to 40).map { i =>
        Ev("u", if (rnd.nextBoolean()) "click" else "purchase",
          rnd.nextInt(1000).toLong, i.toLong)
      }
      val base = AsOfStream.merge(St(Nil, Nil), evs)
      val shuffled = rnd.shuffle(evs.toList)
      // arbitrary partition into micro-batches
      val cuts = (0 +: List.fill(3)(rnd.nextInt(evs.length)).sorted
        :+ evs.length).distinct
      val batched = cuts.zip(cuts.tail).foldLeft(St(Nil, Nil)) {
        case (st, (a, b)) => AsOfStream.merge(st, shuffled.slice(a, b))
      }
      assert(finalRows(batched) === finalRows(base), s"trial $trial")
    }
  }

  test("attribute uses the (ts, id)-max tiebreak, at-or-before inclusive") {
    val clicks = Seq((10L, 1L), (10L, 7L), (5L, 9L), (20L, 2L))
    assert(AsOfStream.attribute(clicks, 10L) === Some((10L, 7L)))
    assert(AsOfStream.attribute(clicks, 9L) === Some((5L, 9L)))
    assert(AsOfStream.attribute(clicks, 4L) === None)
    assert(AsOfStream.attribute(clicks, 25L) === Some((20L, 2L)))
  }

  test("compaction preserves attribution for every surviving or future purchase") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 50) {
      val clicks = List.fill(30)((rnd.nextInt(1000).toLong,
        rnd.nextInt(100000).toLong)).distinct
      val purchases = List.fill(10)((rnd.nextInt(1000).toLong,
        rnd.nextInt(100000).toLong)).distinct
      val horizon = rnd.nextInt(1000).toLong
      val (st2, done) = AsOfStream.compact(St(clicks, purchases), horizon)
      // finalized = exactly the below-horizon purchases
      assert(done.toSet === purchases.filter(_._1 < horizon).toSet)
      assert(st2.purchases.toSet === purchases.filter(_._1 >= horizon).toSet)
      // any purchase at-or-past the horizon (pending or future)
      // attributes identically against the compacted click set
      for (pTs <- (horizon until math.min(horizon + 50, 1000L)) ++
          purchases.map(_._1).filter(_ >= horizon))
        assert(AsOfStream.attribute(st2.clicks, pTs) ===
          AsOfStream.attribute(clicks, pTs), s"trial $trial pTs $pTs")
      // state really shrank: at most one click below the horizon
      assert(st2.clicks.count(_._1 < horizon) <= 1)
    }
  }

  test("merge maintains the sorted-distinct state invariant") {
    val rnd = new scala.util.Random(11)
    var st = St(Nil, Nil)
    for (_ <- 1 to 10) {
      val evs = (1 to 20).map { i =>
        Ev("u", if (rnd.nextBoolean()) "click" else "purchase",
          rnd.nextInt(100).toLong, rnd.nextInt(50).toLong)
      }
      st = AsOfStream.merge(st, evs)
      for (l <- Seq(st.clicks, st.purchases)) {
        assert(l == l.distinct.sorted, "state list not sorted-distinct")
      }
      // compaction preserves the invariant too
      val (st2, _) = AsOfStream.compact(st, rnd.nextInt(100).toLong)
      for (l <- Seq(st2.clicks, st2.purchases))
        assert(l == l.distinct.sorted, "compacted state not sorted-distinct")
    }
  }

  test("stream gate replays as the batch AsOf.join API") {
    val ev = Tables.events(spark, sfDir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("ts"))
    val batch = AsOf.join(purchases, clicks, "user_id",
        "purchase_ts", "ts", Seq("event_id"),
        rightTiebreak = Some("event_id"))
      .select(col("purchase_id"), col("asof_event_id").as("click_id"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    val streamed = StreamingOps.streamAsofAttribution(spark, sfDir)
      .select(col("purchase_id"), col("click_id"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    assert(streamed === batch)
  }
}
