package graft

import graft.streaming.Funnel
import graft.streaming.Funnel.FunnelSt
import scala.util.Random

/** Order-invariance proof for the streaming funnel state: merging a
  * user's event multiset in ANY permutation, split into ANY sequence
  * of micro-batches, must produce the same final state — the property
  * that makes q95 SQL-replayable (same bar as q87's replay test for
  * the materializer). Pure-state tests: the streaming wiring is
  * covered by the q95 oracle row itself. */
class StreamFunnelSpec extends SparkSpec {

  private val none = Long.MaxValue

  private def reference(events: Seq[(String, Long)]): (Long, Long) = {
    val views = events.collect { case ("view", ts) => ts }
    val purchases = events.collect { case ("purchase", ts) => ts }
    if (views.isEmpty) (none, none)
    else {
      val fv = views.min
      val conv = purchases.filter(_ >= fv)
      (fv, if (conv.isEmpty) none else conv.min)
    }
  }

  private def foldBatches(batches: Seq[Seq[(String, Long)]]): FunnelSt =
    batches.foldLeft(FunnelSt(none, Nil, none))(Funnel.merge)

  test("funnel state is invariant under permutation and batching") {
    val rnd = new Random(7)
    for (trial <- 1 to 200) {
      val n = 1 + rnd.nextInt(12)
      val events = (0 until n).map { _ =>
        (if (rnd.nextBoolean()) "view" else "purchase",
          rnd.nextInt(20).toLong)
      }
      val (fv, conv) = reference(events)
      for (_ <- 1 to 5) {
        val shuffled = rnd.shuffle(events)
        // split into 1..4 random batches (some possibly empty)
        val cuts = Seq.fill(rnd.nextInt(3))(rnd.nextInt(n + 1)).sorted
        val batches = (0L +: cuts.map(_.toLong) :+ n.toLong)
          .sliding(2).map { case Seq(a, b) =>
            shuffled.slice(a.toInt, b.toInt)
          }.toSeq
        val st = foldBatches(batches)
        assert(st.minView == fv, s"trial $trial: first view drifted")
        assert(st.convTs == conv, s"trial $trial: conversion drifted")
      }
    }
  }

  test("purchase-before-view converts once the earlier view arrives") {
    // purchase at 5 arrives first; view at 3 arrives in a LATER batch
    val st1 = Funnel.merge(FunnelSt(none, Nil, none), Seq(("purchase", 5L)))
    assert(st1.minView == none && st1.pending == List(5L))
    val st2 = Funnel.merge(st1, Seq(("view", 3L)))
    assert(st2.minView == 3L && st2.convTs == 5L && st2.pending.isEmpty)
  }

  test("trackWithTTL evicts idle users; track keeps them") {
    // user A views at t=1s, then goes idle; user B's t=10s event
    // pushes the watermark past A's 1s TTL → A is flushed and
    // evicted; A's purchase at t=11s then lands on COLD state and
    // never converts. The unbounded tracker, fed the same stream,
    // converts A — proving the eviction actually fired (the
    // bounded-memory trade documented on trackWithTTL).
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.{col, timestamp_micros}
    implicit val sqlCtx = spark.sqlContext
    def run(ttl: Option[Long], name: String): Map[String, Seq[Long]] = {
      val input = MemoryStream[(String, String, Long)]
      val withTime = input.toDF().toDF("user", "etype", "ts")
        .withColumn("event_time", timestamp_micros(col("ts")))
        .withWatermark("event_time", "0 seconds")
      val out = ttl match {
        case Some(t) =>
          Funnel.trackWithTTL(spark, withTime.as[Funnel.FunnelEvent], t)
        case None =>
          Funnel.track(spark, withTime
            .select(col("user"), col("etype"), col("ts"))
            .as[(String, String, Long)])
      }
      val query = out.writeStream.format("memory").queryName(name)
        .outputMode("update").start()
      try {
        input.addData(("A", "view", 1000000L), ("B", "view", 1000000L))
        query.processAllAvailable()
        input.addData(("B", "click", 10000000L)) // watermark → 10s
        query.processAllAvailable()
        input.addData(("C", "view", 10500000L))  // A times out here
        query.processAllAvailable()
        input.addData(("A", "purchase", 11000000L))
        query.processAllAvailable()
        spark.table(name).as[Funnel.FunnelOut].collect().toSeq
          .groupBy(_.user_id).map { case (k, v) => k -> v.map(_.conv_ts) }
      } finally query.stop()
    }
    val ttl = run(Some(1000L), "funnel_ttl")
    val plain = run(None, "funnel_plain")
    // unbounded: A converts at 11s (purchase ≥ first view)
    assert(plain("A").contains(11000000L), s"plain: ${plain("A")}")
    // bounded: A was evicted at the 1s TTL — its purchase lands on
    // cold state (no view) and never emits a conversion
    assert(!ttl("A").exists(_ >= 0), s"ttl: ${ttl("A")}")
    // B is live in both
    assert(ttl.contains("B") && plain.contains("B"))
  }

  test("pending drains and non-minimal qualifying purchases are dropped") {
    val st = foldBatches(Seq(
      Seq(("purchase", 10L), ("purchase", 2L)),
      Seq(("view", 4L), ("purchase", 7L))))
    assert(st.minView == 4L)
    assert(st.convTs == 7L)
    assert(st.pending == List(2L)) // still eligible if a view < 2 arrives
    val st2 = Funnel.merge(st, Seq(("view", 1L)))
    assert(st2.minView == 1L && st2.convTs == 2L && st2.pending.isEmpty)
  }
}
