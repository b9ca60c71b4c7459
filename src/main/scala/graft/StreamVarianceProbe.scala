package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

/** Streaming-gate variance probe (dev main — not part of the driver
  * contract). Round-7 VERDICT #7: the end-to-end streaming gates
  * (q78/q80) swing 6→29 s between adjacent idle runs on unchanged
  * code, and that one class dominates cross-run bench totals. This
  * probe decomposes each repetition of a gate into its candidate
  * variance sources so the mechanism can be NAMED, not guessed:
  *
  *  - `stage_s`   — WAL staging (events scan → JSONL write): page
  *                  cache / file-IO dependent, re-done per bench run;
  *  - `stream_s`  — the checkpointed micro-batch run itself;
  *  - per-batch `triggerExecution` / `addBatch` / state-store commit
  *    times from StreamingQueryProgress — micro-batch scheduling vs
  *    state machinery;
  *  - JVM GC time delta across the repetition (GarbageCollectorMXBean)
  *    — Complete-mode session/join state is heap-resident with the
  *    default HDFS-backed provider, so a full GC lands in somebody's
  *    trigger.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.StreamVarianceProbe [reps]"
  * Prints one JSON line per repetition.
  *
  * FINDING (round 8, sf0.1, idle, 5 reps/gate, fresh JVM): the gates
  * are STABLE in isolation — q78 5.9–6.7 s (1.13× spread; cold rep 1
  * 13.8 s is JIT+codegen), q80 11.5–15.6 s (1.35×); addBatch is
  * 70–90% of total, state commit and GC are negligible, staging
  * ≈1.4 s. The >2× swings BENCH_IDLE_r07 saw (6→29 s) therefore live
  * in suite-accumulated JVM state, not in the gates' plans: after a
  * gate's query terminates, its HDFS-backed state-store providers
  * (and their in-memory version maps) stay loaded until the
  * maintenance pass unloads them — default interval 60 s — and the
  * same pass uploads snapshots for them; in a back-to-back 216-entry
  * sweep that retained state + background work from prior entries
  * lands full GCs inside whichever micro-batches come next.
  * Mitigation shipped: Bench sets
  * spark.sql.streaming.stateStore.maintenanceInterval=5s so
  * terminated gates' providers unload promptly.
  */
object StreamVarianceProbe {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(6)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // capture every micro-batch's progress for the query run inside
    // the current repetition (operators start/stop their own query;
    // the listener sees all of them on this session)
    val batches = ArrayBuffer[(Long, Long, Long, Long)]() // (batchId, trigger, addBatch, commit)
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val d = p.durationMs
        def dm(k: String): Long = Option(d.get(k)).map(_.longValue()).getOrElse(-1L)
        val commit = p.stateOperators.map(_.commitTimeMs).sum
        batches.synchronized {
          batches += ((p.batchId, dm("triggerExecution"), dm("addBatch"), commit))
        }
      }
    })

    def gcMillis(): Long =
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum

    val gates: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)] =
      Seq("q78_session_stream" -> (graft.operators.StreamingOps.sessionStream _),
        "q80_interval_join_stream" -> (graft.operators.StreamingOps.intervalJoinStream _))

    for ((name, fn) <- gates; rep <- 1 to reps) {
      batches.synchronized(batches.clear())
      System.gc()
      val gc0 = gcMillis()
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val total = (System.nanoTime() - t0) / 1e9
      val gcD = gcMillis() - gc0
      // listener events are delivered async — give the bus a moment
      Thread.sleep(500)
      val bs = batches.synchronized(batches.toVector).sortBy(_._1)
      val streamMs = bs.map(_._2).filter(_ >= 0).sum
      val addMs = bs.map(_._3).filter(_ >= 0).sum
      val commitMs = bs.map(_._4).sum
      val perBatch = bs.map { case (id, trig, add, com) =>
        s"""{"id":$id,"trigger_ms":$trig,"add_ms":$add,"commit_ms":$com}"""
      }.mkString("[", ",", "]")
      println(f"""{"gate":"$name","rep":$rep,"total_s":$total%.2f,""" +
        f""""trigger_sum_s":${streamMs / 1e3}%.2f,"addbatch_sum_s":${addMs / 1e3}%.2f,""" +
        f""""state_commit_s":${commitMs / 1e3}%.2f,"gc_s":${gcD / 1e3}%.2f,""" +
        s""""n_batches":${bs.size},"batches":$perBatch}""")
    }
    spark.stop()
  }
}
