package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.model.{Mutation, RowState}
import graft.sources.WalSource
import graft.streaming.RowMaterializer

/** Batch-replayable wrappers that put the STREAMING SEP core — DSv2
  * WAL source → stateful row materializer — under the driver's DuckDB
  * oracle gate (SURVEY §2.G was previously ScalaTest-only).
  */
object StreamingOps {

  /** q53: end-to-end streaming CDC materialization. Stages the events
    * table as JSONL WAL segments, consumes them through the custom
    * "graft-wal" MicroBatchStream with Trigger.AvailableNow (4
    * micro-batches of 2 segments — checkpointed, stateful,
    * admission-controlled), folds them in
    * [[RowMaterializer.materialize]], and emits each key's final row
    * state as scalar columns.
    *
    * Only put mutations are streamed: a row tombstone applies
    * unconditionally on arrival, so cross-micro-batch arrival order
    * would change its outcome — tombstone semantics are covered by
    * the q36 batch oracle and RowMaterializerSpec. For a put-only
    * stream the final state is arrival-order independent (puts are
    * guarded by the (ts, seq) high-water mark), which is what makes
    * this streaming query exactly SQL-replayable.
    */
  def walStreamMaterialize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val stage = stagingRoot("q53", dir)
    val walDir = s"$stage/wal"
    val ckpt = s"$stage/ckpt"
    val out = s"$stage/out"
    val puts = WalSource.eventsAsWal(s, dir)
      .filter(col("cells")(0)("kind") === "put")
    WalSource.writeWalJson(puts, walDir, batches = 8)
    finalStates(s, graft.sources.GraftWalStream(walDir, maxFilesPerTrigger = 2),
      out, ckpt)
  }

  /** Bounded staging root for the streaming gate queries: one fixed
    * dir per (query tag, input dir), wiped at entry — repeated bench
    * warm-up/timed/verify runs reuse the same space instead of
    * accumulating a WAL copy per invocation. Keyed on an md5 digest
    * of the absolute input path (String.hashCode collides too easily
    * to key a wipe-then-write space); assumes a single runner per
    * input dir per host — concurrent JVMs verifying the same dir
    * would need per-run unique dirs. */
  /** The per-sfDir staging-key suffix stagingRoot embeds in its
    * directory names — exposed so specs can re-resolve a staged path
    * without re-staging (and without the fresh-start delete). */
  private[graft] def dirKey(dir: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(java.nio.file.Paths.get(dir).toAbsolutePath.toString
        .getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(16)

  /** First 8 md5 hex nibbles of `str` as a Long in [0, 2^32) — the
    * deterministic fixture hash the q263/q297 oracles replay in SQL
    * (hex8Sql); mirrors Sampling.hashBucket. */
  private[graft] def hex8(str: String): Long = java.lang.Long.parseLong(
    java.security.MessageDigest.getInstance("MD5")
      .digest(str.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(8), 16)

  /** Non-wiping resolver for the staged path stagingRoot would use —
    * the single source of truth for the naming convention, so specs
    * that re-open a staged layout never duplicate (and silently
    * drift from) the scheme. */
  private[graft] def stagingPath(tag: String, dir: String): String =
    java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), s"graft-$tag-${dirKey(dir)}").toString

  /** Total bytes of regular files under `d` (0 when absent). */
  private[graft] def dirBytes(d: String): Long = {
    val p = java.nio.file.Paths.get(d)
    if (!java.nio.file.Files.exists(p)) 0L
    else {
      val w = java.nio.file.Files.walk(p)
      try w.filter(java.nio.file.Files.isRegularFile(_)).mapToLong { f =>
        try java.nio.file.Files.size(f)
        catch { case _: java.io.IOException => 0L }
      }.sum()
      finally w.close()
    }
  }

  /** r17 optimization (guide §2.2/§2.5): run a streaming gate with
    * SCALE-ADAPTIVE shuffle/state partitioning — partitions =
    * ceil(staged input bytes / 32 MB), clamped to [1, the session's
    * setting]. AQE never applies to streaming plans, so a stateful
    * query otherwise commits one state-store instance per SESSION
    * shuffle partition per micro-batch regardless of input size —
    * measured on this host at ~30 ms per partition per batch, i.e.
    * a local-scale WAL paid ~1 s/batch of pure store-commit overhead
    * at 32 partitions for kilobytes of state. A cluster-scale input
    * hits the clamp's upper bound and keeps the session's
    * cluster-sized setting, so this is the input-derived sizing the
    * optimization guide prescribes, not a local-mode constant. The
    * session value is restored on every exit path; every gate's
    * result is partition-count-invariant by the house
    * oracle-replayability rule and re-gated by full DuckDB parity.
    * `sizedDir` is the gate's staging root, measured AFTER the WAL
    * is staged and BEFORE the stream starts. */
  private[graft] def runAdaptive(s: SparkSession, sizedDir: String,
      w: org.apache.spark.sql.streaming.DataStreamWriter[_]): Unit = {
    val key = "spark.sql.shuffle.partitions"
    val prev = s.conf.get(key)
    val target = 32L << 20
    val parts = math.max(1L, math.min(prev.toLong,
      (dirBytes(sizedDir) + target - 1) / target))
    s.conf.set(key, parts.toString)
    try { val q = w.start(); q.awaitTermination() }
    finally s.conf.set(key, prev)
  }

  private[operators] def stagingRoot(tag: String, dir: String): String = {
    val stagePath = java.nio.file.Paths.get(stagingPath(tag, dir))
    if (java.nio.file.Files.exists(stagePath)) {
      java.nio.file.Files.walk(stagePath)
        .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => java.nio.file.Files.delete(p))
    }
    stagePath.toString
  }

  /** q73: STREAMING tumbling-window aggregation under the oracle gate
    * — the full WAL through the DSv2 source, counted per (1-hour
    * event-time window, qualifier) with incremental aggregation state
    * in Complete output mode; every micro-batch rewrites the full
    * aggregate and the final one must equal q13's batch window
    * counts. Window counting is a commutative/associative merge, so
    * the final state is arrival-order independent — what makes this
    * streaming query exactly SQL-replayable (same argument as q53). */
  def windowStream(s: SparkSession, dir: String): DataFrame = {
    val stage = stagingRoot("q73", dir)
    val walDir = s"$stage/wal"; val ckpt = s"$stage/ckpt"; val out = s"$stage/out"
    WalSource.writeWalJson(WalSource.eventsAsWal(s, dir), walDir, batches = 8)
    val counts = WalSource.streamV2(s, walDir, maxFilesPerTrigger = 2)
      .withColumn("event_time", timestamp_micros(col("ts")))
      .withColumn("event_type", col("cells")(0)("qualifier"))
      .withColumn("value", col("cells")(0)("value").cast("double"))
      .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
    runAdaptive(s, stage,
      counts.writeStream
      .foreachBatch { (df: DataFrame, _: Long) =>
        df.write.mode("overwrite").parquet(out)
      }
      .outputMode("complete")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()))
    s.read.parquet(out)
      .select(unix_micros(col("window.start")).as("window_start"),
        col("event_type"), col("n"), round(col("sum_value"), 2).as("sum_value"))
  }

  /** q78: STREAMING session windows under the oracle gate — the
    * put-only WAL through the DSv2 source into a native
    * `session_window(30 min)` aggregation with merging session state
    * (Complete mode), then per-user session/event counts off the
    * final batch. Session merging is commutative and associative, so
    * the final merged state is arrival-order independent —
    * SQL-replayable like q53 (tombstones excluded for the same
    * reason as there). Boundary semantics: session_window windows
    * are [t, t+30 min) and merge only when they OVERLAP, so a gap of
    * exactly 30 min starts a new session — hence the `>=` in the
    * oracle where q14's gap logic uses strict `>`. */
  def sessionStream(s: SparkSession, dir: String): DataFrame = {
    val stage = stagingRoot("q78", dir)
    val walDir = s"$stage/wal"; val ckpt = s"$stage/ckpt"; val out = s"$stage/out"
    val puts = WalSource.eventsAsWal(s, dir)
      .filter(col("cells")(0)("kind") === "put")
    WalSource.writeWalJson(puts, walDir, batches = 8)
    val sessions = WalSource.streamV2(s, walDir, maxFilesPerTrigger = 2)
      .withColumn("event_time", timestamp_micros(col("ts")))
      .groupBy(col("rowkey"), session_window(col("event_time"), "30 minutes"))
      .agg(count(lit(1)).as("n"))
    runAdaptive(s, stage,
      sessions.writeStream
      .foreachBatch { (df: DataFrame, _: Long) =>
        df.select(col("rowkey"), col("n")).write.mode("overwrite").parquet(out)
      }
      .outputMode("complete")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()))
    s.read.parquet(out)
      .groupBy(col("rowkey").cast("long").as("user_id"))
      .agg(count(lit(1)).as("n_sessions"), sum(col("n")).as("n_events"))
  }

  /** q80: STREAM-STREAM interval join under the oracle gate — clicks
    * and purchases consumed as two independent streaming views of
    * the same WAL (each source tracks its own offsets inside the one
    * checkpoint), inner-joined per user on click_time ∈ [purchase −
    * 1 h, purchase]. Inner-join matches emit exactly once as the
    * later side arrives — no watermark finalization involved — so
    * the match set is arrival-order independent. The 60-day
    * watermark (past the data span) demonstrates the state-eviction
    * API without ever evicting; production tightens it to the real
    * out-of-orderness bound so join state stays finite. */
  def intervalJoinStream(s: SparkSession, dir: String): DataFrame = {
    val stage = stagingRoot("q80", dir)
    val walDir = s"$stage/wal"; val ckpt = s"$stage/ckpt"; val out = s"$stage/out"
    val subset = WalSource.eventsAsWal(s, dir)
      .filter(col("cells")(0)("qualifier").isin("click", "purchase"))
    WalSource.writeWalJson(subset, walDir, batches = 6)
    // 2 micro-batches (6 segments / 3 per trigger): enough to prove
    // cross-batch join state, half the per-batch state-store snapshot
    // cost of finer batching (each batch snapshots 4 join state
    // stores x shuffle partitions)
    def side(q: String): DataFrame =
      WalSource.streamV2(s, walDir, maxFilesPerTrigger = 3)
        .filter(col("cells")(0)("qualifier") === q)
        .withColumn("event_time", timestamp_micros(col("ts")))
    val clicks = side("click")
      .select(col("rowkey").as("c_rowkey"), col("seq").as("click_seq"),
        col("event_time").as("click_time"))
      .withWatermark("click_time", "60 days")
    val purchases = side("purchase")
      .select(col("rowkey"), col("seq").as("purchase_seq"),
        col("event_time").as("purchase_time"))
      .withWatermark("purchase_time", "60 days")
    val joined = purchases.join(clicks,
      col("rowkey") === col("c_rowkey") &&
        col("click_time") >= col("purchase_time") - expr("INTERVAL 1 HOUR") &&
        col("click_time") <= col("purchase_time"))
      .select(col("rowkey"), col("purchase_seq"), col("click_seq"))
    runAdaptive(s, stage,
      joined.writeStream
      .foreachBatch { (df: DataFrame, _: Long) =>
        df.write.mode("append").parquet(out)
      }
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()))
    s.read.parquet(out)
      // idempotence under any foreachBatch retry/replay
      .dropDuplicates("purchase_seq", "click_seq")
      .groupBy(col("rowkey").cast("long").as("user_id"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("purchase_seq")).as("n_purchases"),
        countDistinct(col("click_seq")).as("n_clicks"))
  }

  /** q84: STREAM-STATIC enrichment join under the oracle gate — the
    * WAL stream joined per micro-batch to a static dimension table
    * (customer segments keyed by rowkey; Spark broadcasts the dim
    * into every batch), then counted per segment with Complete-mode
    * incremental state. This is the SEP listener-enrichment pattern:
    * consumers rarely want raw mutations, they want them joined to
    * reference data. Counting is commutative, so the final state
    * replays as the batch join SQL. */
  def streamEnrich(s: SparkSession, dir: String): DataFrame = {
    val stage = stagingRoot("q84", dir)
    val walDir = s"$stage/wal"; val ckpt = s"$stage/ckpt"; val out = s"$stage/out"
    WalSource.writeWalJson(WalSource.eventsAsWal(s, dir), walDir, batches = 8)
    val dim = graft.Tables.customer(s, dir)
      .select(col("c_custkey").cast("string").as("rowkey"), col("c_mktsegment"))
    val counts = WalSource.streamV2(s, walDir, maxFilesPerTrigger = 2)
      .join(broadcast(dim), "rowkey")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_mutations"),
        sum(size(col("cells")).cast("long")).as("n_cells"))
    runAdaptive(s, stage,
      counts.writeStream
      .foreachBatch { (df: DataFrame, _: Long) =>
        df.write.mode("overwrite").parquet(out)
      }
      .outputMode("complete")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()))
    s.read.parquet(out)
  }

  /** q86: STREAMING effectively-once under the oracle gate — the WAL
    * delivered twice (at-least-once), deduplicated on the sequence
    * number by [[graft.streaming.ExactlyOnce.dedupe]]
    * (dropDuplicatesWithinWatermark, bounded state) INSIDE the
    * streaming query, then counted per key with Complete-mode state.
    * Final counts must equal single delivery — q76 proves the batch
    * contract, this proves the streaming operator itself. */
  def streamDedupe(s: SparkSession, dir: String): DataFrame = {
    val stage = stagingRoot("q86", dir)
    val walDir = s"$stage/wal"; val ckpt = s"$stage/ckpt"; val out = s"$stage/out"
    val wal = WalSource.eventsAsWal(s, dir)
    // at-least-once delivery: every mutation shipped twice; 3
    // micro-batches keep the cross-batch dedup state exercised
    // without paying a per-batch state-store snapshot 8 times over
    // the double-sized WAL
    WalSource.writeWalJson(wal.union(wal), walDir, batches = 6)
    val perKey = graft.streaming.ExactlyOnce.dedupe(
        WalSource.streamV2(s, walDir, maxFilesPerTrigger = 2))
      .groupBy(col("table"), col("rowkey"))
      .agg(count(lit(1)).as("n"))
    runAdaptive(s, stage,
      perKey.writeStream
      .foreachBatch { (df: DataFrame, _: Long) =>
        df.write.mode("overwrite").parquet(out)
      }
      .outputMode("complete")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()))
    s.read.parquet(out)
      .groupBy(col("table"))
      .agg(sum(col("n")).as("n_mutations"), count(lit(1)).as("n_keys"))
  }

  /** q87: OUT-OF-ORDER replay invariance under the oracle gate — the
    * put-only WAL staged with segment order REVERSED (latest events
    * ship first; rows unsorted within segments), streamed through the
    * same checkpointed materializer as q53. The (ts, seq) high-water
    * mark per cell makes the fold commutative, so the final states
    * must be byte-identical to in-order replay — the reference's
    * idempotent-reprocessing contract, proven against SQL instead of
    * asserted in prose. */
  def replayOutOfOrder(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col => c}
    val stage = stagingRoot("q87", dir)
    val walDir = s"$stage/wal"; val ckpt = s"$stage/ckpt"; val out = s"$stage/out"
    val puts = WalSource.eventsAsWal(s, dir)
      .filter(c("cells")(0)("kind") === "put")
    // reverse event-time order across segments: range-partition on -seq
    puts.withColumn("negseq", -c("seq"))
      .repartitionByRange(8, c("negseq")).drop("negseq")
      .toJSON.write.mode("overwrite").text(walDir)
    finalStates(s, graft.sources.GraftWalStream(walDir, maxFilesPerTrigger = 2),
      out, ckpt)
  }

  /** q69: the SepModel subscription surface under the oracle gate —
    * four registered subscriptions audited over the same WAL, each
    * counting its filtered, cell-narrowed view (mutations, keys,
    * surviving cells — what a SEP operator dashboard shows).
    *
    * ONE pass: each mutation emits one (subscription, n_cells) entry
    * per matching subscription via a literal-driven explode, then a
    * single aggregation — 1 scan instead of |subscriptions| scans of
    * a 100 TB WAL. Semantics per entry are exactly
    * [[graft.streaming.Subscription]]'s filter + cell narrowing
    * (equivalence with the fanOut path is pinned in ExactlyOnceSpec). */
  def subscriptionAudit(s: SparkSession, dir: String): DataFrame = {
    import graft.streaming.Subscription
    val wal = WalSource.eventsAsWal(s, dir)
    val entries = array(auditSubscriptions.map { sub =>
      val narrowed = (sub.family, sub.qualifier) match {
        case (None, None) => col("cells")
        case _ => filter(col("cells"), c =>
          sub.family.map(c.getField("family") === _).getOrElse(lit(true)) &&
            sub.qualifier.map(c.getField("qualifier") === _).getOrElse(lit(true)))
      }
      // null n_cells = mutation invisible to this subscription
      struct(lit(sub.name).as("subscription"),
        when(sub.predicate, size(narrowed).cast("long")).as("n_cells"))
    }: _*)
    wal.select(col("rowkey"), explode(entries).as("e"))
      .filter(col("e.n_cells").isNotNull)
      .groupBy(col("e.subscription").as("subscription"))
      .agg(count(lit(1)).as("n_mutations"),
        countDistinct(col("rowkey")).as("n_keys"),
        sum(col("e.n_cells")).as("n_cells"))
  }

  /** The q69 subscription set (shared with the fanOut-equivalence spec). */
  def auditSubscriptions: Seq[graft.streaming.Subscription] = {
    import graft.streaming.Subscription
    Seq(
      Subscription("all"),
      Subscription("clicks", family = Some("e"), qualifier = Some("click")),
      Subscription("purchases", family = Some("e"), qualifier = Some("purchase")),
      Subscription("payloads", family = Some("e"), qualifier = Some("props")))
  }

  /** q263: SUBSCRIPTION CONSUMER-LAG report — the per-subscription
    * operational dashboard the SEP model implies (SURVEY §1:
    * replication peers track their own progress; the on-call
    * question is "how far behind is each consumer, on the mutations
    * IT subscribes to"): per q69 subscription, the acked WAL
    * position (deterministic synthetic acks at 80–99% of the seq
    * span — md5('ack|name') replays in the oracle; production reads
    * the registry), pending visible mutations past it, distinct
    * pending keys, the oldest pending event time (the staleness
    * number), and lag ppm of the subscription's own visible
    * volume. One pass: the q69 array-of-structs explode tags each
    * mutation per subscription, a broadcast seq-bounds row prices
    * the ack, one grouped agg per subscription — |subs| rows out. */
  def consumerLag(s: SparkSession, dir: String): DataFrame = {
    lagReportFor(WalSource.eventsAsWal(s, dir), auditSubscriptions, sub => {
      val frac = 80L + hex8(s"ack|${sub.name}") % 20L
      expr(s"s0 + (s1 - s0) * ${frac}L div 100")
    })
  }

  /** q263's PRODUCTION overload: the same lag-report math priced
    * from the REAL per-subscription acked positions a consuming
    * stream wrote into a [[graft.streaming.SubscriptionRegistry]]
    * (via [[consumeAndAck]]) — the md5 fixture in [[consumerLag]]
    * stays only as the oracle gate's deterministic stand-in. A
    * registered consumer that never acked is fully behind
    * (ack = s0 − 1: everything visible is pending). */
  def consumerLagFrom(s: SparkSession, dir: String,
      reg: graft.streaming.SubscriptionRegistry): DataFrame = {
    val acks = reg.acks()
    lagReportFor(WalSource.eventsAsWal(s, dir), reg.list(),
      sub => acks.get(sub.name)
        .map(a => lit(a).cast("long")).getOrElse(expr("s0 - 1")))
  }

  /** Shared core of the q263 report. `ackOf` prices each
    * subscription's acked WAL position as a column over the
    * broadcast seq bounds (columns `s0`/`s1` are in scope). One
    * pass: array-of-structs explode tags each mutation per
    * subscription, one grouped agg — |subs| rows out. */
  private def lagReportFor(wal: DataFrame,
      subs: Seq[graft.streaming.Subscription],
      ackOf: graft.streaming.Subscription => org.apache.spark.sql.Column)
      : DataFrame = {
    val entries = array(subs.map { sub =>
      struct(lit(sub.name).as("subscription"),
        sub.predicate.as("visible"),
        ackOf(sub).cast("long").as("ack"))
    }: _*)
    val bounds = wal.agg(min(col("seq")).as("s0"), max(col("seq")).as("s1"))
    wal.crossJoin(broadcast(bounds))
      .select(col("seq"), col("ts"), col("rowkey"), explode(entries).as("e"))
      .filter(col("e.visible"))
      .groupBy(col("e.subscription").as("subscription"))
      .agg(max(col("e.ack")).as("ack_seq"),
        count(lit(1)).as("n_visible"),
        sum(when(col("seq") > col("e.ack"), 1L).otherwise(0L)).as("n_pending"),
        countDistinct(when(col("seq") > col("e.ack"), col("rowkey")))
          .as("n_pending_keys"),
        min(when(col("seq") > col("e.ack"), col("ts")))
          .as("oldest_pending_ts"))
      .withColumn("lag_ppm", expr("n_pending * 1000000 div n_visible"))
  }

  /** The SEP consumer loop: attach a REGISTERED subscription's
    * filtered view to a streaming WAL, hand each micro-batch to
    * `process`, then ack the max seq the batch delivered into the
    * registry. The ack lands AFTER `process` returns, so a recorded
    * position never covers work that didn't happen; a crash between
    * process and ack replays the batch (at-least-once) and the
    * registry's monotonic ack absorbs the replay. Spark's checkpoint
    * tracks the source offsets; the registry tracks the CONSUMER
    * position q263 reports on — the two-level progress model of the
    * reference (ZK subscription state + per-peer replication
    * position). Runs Trigger.AvailableNow to completion. */
  def consumeAndAck(s: SparkSession, wal: graft.sources.WalStream,
      reg: graft.streaming.SubscriptionRegistry, name: String, ckpt: String)
      (process: DataFrame => Unit = _ => ()): Unit = {
    val sub = reg.list().find(_.name == name).getOrElse(
      throw new IllegalArgumentException(s"unknown subscription: $name"))
    runAdaptive(s, new java.io.File(ckpt).getParent,
      sub(wal.open(s)).writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          process(batch)
          val mx = batch.agg(max(col("seq"))).head()
          if (!mx.isNullAt(0)) reg.ack(name, mx.getLong(0))
        }
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()))
  }

  /** q269: STREAMING DEBOUNCE under the oracle gate — q267's
    * burst-collapse run live ([[graft.streaming.Debounce]]): O(1)
    * state per (user, type) (last cell time + counters; the chain
    * rule only needs the predecessor), below-high-water arrivals
    * late-routed not spliced (q230's ordering contract — zero on
    * the ordered staged WAL, spec-drivable), update-mode
    * last-emission-wins collapse, and the per-type report must
    * equal q267's batch windows under the same oracle. */
  def streamDebounce(s: SparkSession, dir: String,
      gapMicros: Long = 3600000000L): DataFrame = {
    import s.implicits._
    val stage = stagingRoot("q269", dir)
    val walDir = s"$stage/wal"; val ckpt = s"$stage/ckpt"; val out = s"$stage/out"
    WalSource.writeWalJson(WalSource.eventsAsWal(s, dir), walDir, batches = 6)
    val evs = WalSource.streamV2(s, walDir, maxFilesPerTrigger = 2)
      .select(col("rowkey").as("user"),
        col("cells")(0)("qualifier").as("kind"),
        col("ts"), col("seq").as("id"))
      .as[graft.streaming.Debounce.Ev]
    runAdaptive(s, stage,
      graft.streaming.Debounce.track(s, evs, gapMicros).writeStream
      .foreachBatch {
        (df: Dataset[graft.streaming.Debounce.Out], id: Long) =>
          df.withColumn("batch", lit(id)).write.mode("append").parquet(out)
      }
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()))
    s.read.parquet(out)
      .groupBy(col("user"), col("kind"))
      .agg(max_by(struct(col("n_events"), col("n_dropped")), col("batch"))
        .as("st"))
      .groupBy(col("kind").as("event_type"))
      .agg(sum(col("st.n_events")).as("n_events"),
        sum(col("st.n_dropped")).as("n_dropped"))
      .withColumn("n_kept", col("n_events") - col("n_dropped"))
      .withColumn("drop_ppm", expr("n_dropped * 1000000 div n_events"))
  }

  /** q270: STREAMING MAX-VERSIONS under the oracle gate — HBase's
    * VERSIONS=>3 retention maintained live
    * ([[graft.streaming.MaxVersions]]): per (rowkey, qualifier) the
    * state is the k-MAX lattice of (ts, seq) cells — arrival-order
    * independent and duplicate-idempotent (permutation-fuzzed in
    * the spec), exactly ≤ k cells per key however long the stream
    * runs. Update-mode emissions collapse per (key, version) by
    * last batch; the assembled versioned cell table must equal
    * q262's batch read row-for-row under the same oracle. */
  def streamMaxVersions(s: SparkSession, dir: String, k: Int = 3): DataFrame = {
    import s.implicits._
    val stage = stagingRoot("q270", dir)
    val walDir = s"$stage/wal"; val ckpt = s"$stage/ckpt"; val out = s"$stage/out"
    WalSource.writeWalJson(WalSource.eventsAsWal(s, dir), walDir, batches = 6)
    val cells = WalSource.streamV2(s, walDir, maxFilesPerTrigger = 2)
      .select(col("rowkey").as("user"),
        col("cells")(0)("qualifier").as("qualifier"),
        col("ts"), col("seq"),
        expr("cast(round(cast(cells[0].value as double) * 100) as bigint)")
          .as("value_cents"))
      .as[graft.streaming.MaxVersions.Cell]
    runAdaptive(s, stage,
      graft.streaming.MaxVersions.track(s, cells, k).writeStream
      .foreachBatch {
        (df: Dataset[graft.streaming.MaxVersions.Out], id: Long) =>
          df.withColumn("batch", lit(id)).write.mode("append").parquet(out)
      }
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()))
    s.read.parquet(out)
      .groupBy(col("user"), col("qualifier"), col("version"))
      .agg(max_by(struct(col("ts"), col("value_cents"), col("seq")),
        col("batch")).as("st"))
      .select(col("user").cast("long").as("user_id"), col("qualifier"),
        col("version"), col("st.ts").as("ts"),
        col("st.value_cents").as("value_cents"), col("st.seq").as("seq"))
  }

  /** q283: STREAMING BITMASK RETENTION — q244's day-bitmask cohort
    * retention run live: per-user state is ONE (min-day, 64-bit
    * mask) pair maintained by a plain streaming aggregation in
    * Update mode — `min` and `bit_or` are both
    * commutative/associative/IDEMPOTENT merges, so this is the
    * purest lattice in the library: any arrival order, any batch
    * split, even duplicate delivery of a whole batch lands in the
    * same state (bit-OR absorbs replays without a dedup pass). The
    * last emission per user is its final (cohort, mask); the q244
    * grid over that state must equal the batch relation under the
    * same oracle. State: O(1) per user forever — the bitmask IS the
    * retention curve, fan-out ∝ users, never events. The day-zero
    * anchor is a config constant in production; the gate derives it
    * from the staged corpus (deterministic). */
  def streamBitmaskRetention(s: SparkSession, dir: String,
      horizon: Int = 7): DataFrame = {
    val stage = stagingRoot("q283", dir)
    val walDir = s"$stage/wal"; val ckpt = s"$stage/ckpt"
    val out = s"$stage/out"
    WalSource.writeWalJson(WalSource.eventsAsWal(s, dir), walDir, batches = 6)
    val d0 = graft.Tables.events(s, dir)
      .agg(min(expr("ts div 86400000000"))).head().getLong(0)
    val masks = WalSource.streamV2(s, walDir, maxFilesPerTrigger = 2)
      .select(col("rowkey").cast("long").as("user_id"),
        (expr("ts div 86400000000") - lit(d0)).as("d"))
      .filter(col("d") >= 0L && col("d") < 63L)
      .groupBy(col("user_id"))
      .agg(min(col("d")).as("cohort"),
        expr("bit_or(shiftleft(cast(1 as bigint), cast(d as int)))")
          .as("mask"))
    runAdaptive(s, stage,
      masks.writeStream
      .foreachBatch { (df: DataFrame, id: Long) =>
        df.withColumn("batch", lit(id)).write.mode("append").parquet(out)
      }
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()))
    val fin = s.read.parquet(out)
      .groupBy(col("user_id"))
      .agg(max_by(struct(col("cohort"), col("mask")), col("batch")).as("st"))
      .select(col("st.cohort").as("cohort"), col("st.mask").as("mask"))
    Events.retentionGrid(fin, horizon)
  }

  /** q286: STREAMING KMV distinct-count — per-qualifier distinct-key
    * cardinality estimated LIVE with a [[graft.functions.KMinAgg]]
    * sketch as streaming state: the k smallest distinct md5-hashes
    * per qualifier, a SET lattice (commutative/associative/
    * IDEMPOTENT — replays absorb with no dedup pass, the q283
    * argument with a k-element buffer instead of a bitmask). HBase
    * has no distinct-count; a SEP consumer materializing per-column
    * cardinality dashboards runs exactly this. Final state feeds
    * q250's estimator (k−1)·2³² div h₍ₖ₎, reported against the
    * exact batch distinct count with an integer-ppm error — the
    * oracle replays the identical hash sketch in SQL (rank ≤ k
    * over distinct hashes). State: O(k) longs per qualifier,
    * forever. */
  def streamKmv(s: SparkSession, dir: String, k: Int = 16): DataFrame = {
    val stage = stagingRoot("q286", dir)
    val walDir = s"$stage/wal"; val ckpt = s"$stage/ckpt"
    val out = s"$stage/out"
    WalSource.writeWalJson(WalSource.eventsAsWal(s, dir), walDir, batches = 6)
    val sketches = WalSource.streamV2(s, walDir, maxFilesPerTrigger = 2)
      .select(col("cells")(0)("qualifier").as("qualifier"),
        Sampling.hashBucket(concat(lit("kmv|"), col("rowkey"))).as("h"))
      .groupBy(col("qualifier"))
      .agg(graft.functions.KMin.kmin(k)(col("h")).as("kmv"))
    runAdaptive(s, stage,
      sketches.writeStream
      .foreachBatch { (df: DataFrame, id: Long) =>
        df.withColumn("batch", lit(id)).write.mode("append").parquet(out)
      }
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()))
    val fin = s.read.parquet(out)
      .groupBy(col("qualifier"))
      .agg(max_by(col("kmv"), col("batch")).as("kmv"))
    val exact = graft.Tables.events(s, dir)
      .select(col("event_type").as("qualifier"), col("user_id"))
      .distinct()
      .groupBy(col("qualifier")).agg(count(lit(1)).as("n_exact"))
    fin.join(exact, "qualifier")
      .withColumn("usz", size(col("kmv")).cast("long"))
      .withColumn("kth", element_at(col("kmv"), size(col("kmv"))))
      .withColumn("est", when(col("usz") < k, col("usz"))
        .otherwise(expr(s"(${k - 1} * 4294967296L) div kth")))
      .select(col("qualifier"), col("n_exact"), col("usz"), col("kth"),
        col("est"),
        expr("abs(est - n_exact) * 1000000 div n_exact").as("err_ppm"))
  }

  /** q340: STREAMING KLL QUANTILES (round-11) — q331's deterministic
    * rank sketch maintained as live per-key streaming STATE: the
    * events WAL streams through the DSv2 source and a per-qualifier
    * [[graft.functions.KllAgg]] update-mode aggregation; each
    * micro-batch merges new rows into the state-store sketch, and
    * the final batch's row per qualifier is the sketch of
    * EVERYTHING that ever streamed — fixed O(cap·log n) state per
    * key, forever, the shape a 100 TB live-percentile dashboard
    * needs (the exact q97-family machinery wants a bounded domain;
    * the stream wants bounded MEMORY). Gate (the q331 argument):
    * the deterministic worst-case bound carried IN the state —
    * every compaction accounts for itself, so the bound holds for
    * whatever merge order micro-batching imposes, even though the
    * estimates themselves are partition-order-dependent — must
    * bracket the target rank against the estimate's RANK INTERVAL
    * [count(c < est) + 1, count(c ≤ est)] (the tie-correct form —
    * count(c ≤ est) alone also counts the duplicate mass above the
    * stored copy, which the sketch never promised to absorb):
    * within_bound is pinned 1 for every
    * (qualifier, quantile). The per-type sketch collect is
    * metadata-sized (|event types| rows); true ranks come from ONE
    * exact corpus pass against the broadcast estimate grid. */
  def streamKll(s: SparkSession, dir: String, cap: Int = 400): DataFrame = {
    import graft.functions.{KllAgg, KllSketch}
    val stage = stagingRoot("q340", dir)
    val walDir = s"$stage/wal"; val ckpt = s"$stage/ckpt"
    val out = s"$stage/out"
    WalSource.writeWalJson(WalSource.eventsAsWal(s, dir), walDir, batches = 6)
    val kll = udaf(new KllAgg(cap))
    val sketches = WalSource.streamV2(s, walDir, maxFilesPerTrigger = 2)
      .select(col("cells")(0)("qualifier").as("qualifier"),
        expr("cast(round(cast(cells[0].value as double) * 100) as bigint)")
          .as("c"))
      .groupBy(col("qualifier"))
      .agg(kll(col("c")).as("sk"))
    runAdaptive(s, stage,
      sketches.writeStream
      .foreachBatch { (df: DataFrame, id: Long) =>
        df.withColumn("batch", lit(id)).write.mode("append").parquet(out)
      }
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()))
    // metadata-sized collect: one sketch row per event type
    val fin = s.read.parquet(out)
      .groupBy(col("qualifier"))
      .agg(max_by(col("sk"), col("batch")).as("sk"))
      .collect()
    val qs = Seq(10L, 250L, 500L, 750L, 990L)
    val grid = fin.flatMap { r =>
      val skr = r.getStruct(r.fieldIndex("sk"))
      val sk = KllSketch(
        skr.getSeq[scala.collection.Seq[Long]](skr.fieldIndex("levels"))
          .map(_.toVector).toVector,
        skr.getAs[Long]("err"), skr.getAs[Long]("n"))
      qs.map(qm => (r.getAs[String]("qualifier"), qm,
        sk.quantile(qm / 1000.0), sk.err + sk.maxWeight))
    }
    import s.implicits._
    val gridDf = grid.toSeq.toDF("qualifier", "q_milli", "est", "bound")
    graft.Tables.events(s, dir)
      .select(col("event_type").as("qualifier"),
        expr("cast(round(value * 100) as bigint)").as("c"))
      .join(broadcast(gridDf), "qualifier")
      .groupBy(col("qualifier"), col("q_milli"))
      .agg(count(lit(1)).as("n"), max(col("bound")).as("bound"),
        sum(when(col("c") <= col("est"), 1L).otherwise(0L)).as("rank_le"),
        sum(when(col("c") < col("est"), 1L).otherwise(0L)).as("rank_lt"))
      .withColumn("target",
        greatest(lit(1L), expr("(q_milli * n + 999) div 1000")))
      .select(col("qualifier"), col("q_milli"), col("n"),
        (col("target") <= col("rank_le") + col("bound") &&
          col("target") >= col("rank_lt") + lit(1L) - col("bound"))
          .cast("long").as("within_bound"))
  }

  /** q76: effectively-once replay audit — the WAL delivered twice
    * (at-least-once), deduplicated on the sequence number, must equal
    * single delivery. The batch form of streaming.ExactlyOnce's
    * contract, under the oracle gate. */
  def effectivelyOnce(s: SparkSession, dir: String): DataFrame = {
    val wal = WalSource.eventsAsWal(s, dir)
    wal.union(wal) // duplicate delivery
      .dropDuplicates("seq")
      .groupBy(col("table"))
      .agg(count(lit(1)).as("n_mutations"),
        countDistinct(col("rowkey")).as("n_keys"))
  }

  /** q83: bounded-state streaming materialization under the oracle
    * gate — q53's pipeline with [[RowMaterializer.materializeWithTTL]]
    * (EventTimeTimeout): rows idle past the 8-hour TTL against the
    * event-time watermark are evicted from the state store and
    * emitted once as tombstones. Deterministically SQL-replayable
    * because (a) the staged WAL is event-time ordered, so the
    * watermark (delay 0) only ever trails the batch being processed,
    * and (b) the final watermark is the global max event time, so a
    * key is evicted iff version_ms + ttl < global_max_ms — exact
    * integer arithmetic both engines replay. This is the 100 TB
    * state-size story (state holds only the watermark+ttl horizon),
    * previously ScalaTest-only. */
  def ttlMaterialize(s: SparkSession, dir: String,
      ttlMillis: Long = 28800000L): DataFrame = {
    import s.implicits._
    val stage = stagingRoot("q83", dir)
    val walDir = s"$stage/wal"; val ckpt = s"$stage/ckpt"; val out = s"$stage/out"
    val puts = WalSource.eventsAsWal(s, dir)
      .filter(col("cells")(0)("kind") === "put")
    // 3 data micro-batches + the final timeout batch: the watermark
    // must advance across batches for mid-stream evictions to stay
    // exercised, but each batch snapshots the state store — 6/2 is
    // the cost-coverage balance
    WalSource.writeWalJson(puts, walDir, batches = 6)
    finalStates(s, graft.sources.GraftWalStream(walDir, maxFilesPerTrigger = 2),
      out, ckpt, ttlMillis = Some(ttlMillis))
  }

  /** q100: q53's streaming materialization on the ROCKSDB state-store
    * provider — the 100 TB production configuration (state off-heap,
    * incremental checkpoints; the HDFS-backed default keeps every
    * key's state on the JVM heap and dies first at scale). Output
    * contract is provider-independent (WalStreamSpec proves byte
    * equality); this puts that claim under the DuckDB gate instead
    * of spec-only, so a provider regression fails the round. */
  def rocksDbMaterialize(s: SparkSession, dir: String): DataFrame = {
    val stage = stagingRoot("q100", dir)
    val walDir = s"$stage/wal"; val ckpt = s"$stage/ckpt"; val out = s"$stage/out"
    val puts = WalSource.eventsAsWal(s, dir)
      .filter(col("cells")(0)("kind") === "put")
    WalSource.writeWalJson(puts, walDir, batches = 8)
    finalStates(s, graft.sources.GraftWalStream(walDir, maxFilesPerTrigger = 2),
      out, ckpt, rocksDB = true)
  }

  /** q95: STREAMING funnel under the oracle gate — view/purchase puts
    * through the DSv2 source into [[graft.streaming.Funnel]]'s
    * order-invariant per-user state (first view, first qualifying
    * purchase). The state is a min-lattice plus a retained
    * below-first-view purchase set, so the final rows are arrival-
    * order independent (see Funnel's scaladoc for the argument) and
    * replay as two batch aggregates. Update mode emits per touched
    * user per batch; the last emission wins via the batch tag. */
  def streamFunnel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val stage = stagingRoot("q95", dir)
    val walDir = s"$stage/wal"; val ckpt = s"$stage/ckpt"; val out = s"$stage/out"
    val subset = WalSource.eventsAsWal(s, dir)
      .filter(col("cells")(0)("kind") === "put" &&
        col("cells")(0)("qualifier").isin("view", "purchase"))
    WalSource.writeWalJson(subset, walDir, batches = 6)
    val evs = WalSource.streamV2(s, walDir, maxFilesPerTrigger = 2)
      .select(col("rowkey").as("_1"),
        col("cells")(0)("qualifier").as("_2"), col("ts").as("_3"))
      .as[(String, String, Long)]
    runAdaptive(s, stage,
      graft.streaming.Funnel.track(s, evs).writeStream
      .foreachBatch {
        (df: Dataset[graft.streaming.Funnel.FunnelOut], id: Long) =>
          df.withColumn("batch", lit(id)).write.mode("append").parquet(out)
      }
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()))
    s.read.parquet(out)
      .groupBy(col("user_id"))
      .agg(max_by(struct(col("first_view"), col("conv_ts")), col("batch")).as("st"))
      .select(col("user_id").cast("long").as("user_id"),
        col("st.first_view").as("first_view"),
        when(col("st.conv_ts") >= 0, col("st.conv_ts")).as("conv_ts"),
        when(col("st.conv_ts") >= 0, 1).otherwise(0).as("converted"))
  }

  /** q121: STREAM-STREAM LEFT OUTER interval join under the oracle
    * gate — q80's click⋈purchase pairing with the missing-side
    * semantics production attribution needs: every purchase emits
    * its matching clicks as they arrive (inner path, arrival-order
    * independent) OR one null-click row once the watermark proves no
    * match can arrive (outer path — this is the part q80's inner
    * join cannot express, and it REQUIRES a real watermark: state
    * for an unmatched purchase finalizes only when both streams'
    * watermarks pass its window). The staged WAL is event-time
    * ordered with delay-0 watermarks, so a purchase's matching
    * clicks (ts ≤ purchase ts) always arrive no later than the
    * purchase itself — late matches are impossible and the final
    * row set replays as the batch LEFT JOIN with one honest
    * append-mode edge: an UNMATCHED purchase at or past the final
    * joint watermark (min of the two streams' max event times —
    * Spark's default min multipleWatermarkPolicy) stays pending
    * forever, because no later watermark ever proves it
    * unmatchable. The oracle replays exactly that rule
    * (emit iff matched OR p_ts < joint), measured empirically and
    * pinned by the gate at every SF. */
  def leftOuterJoinStream(s: SparkSession, dir: String): DataFrame = {
    val stage = stagingRoot("q121", dir)
    val walDir = s"$stage/wal"; val ckpt = s"$stage/ckpt"; val out = s"$stage/out"
    val subset = WalSource.eventsAsWal(s, dir)
      .filter(col("cells")(0)("qualifier").isin("click", "purchase"))
    WalSource.writeWalJson(subset, walDir, batches = 6)
    def side(q: String): DataFrame =
      WalSource.streamV2(s, walDir, maxFilesPerTrigger = 3)
        .filter(col("cells")(0)("qualifier") === q)
        .withColumn("event_time", timestamp_micros(col("ts")))
    val clicks = side("click")
      .select(col("rowkey").as("c_rowkey"), col("seq").as("click_seq"),
        col("event_time").as("click_time"))
      .withWatermark("click_time", "0 seconds")
    val purchases = side("purchase")
      .select(col("rowkey"), col("seq").as("purchase_seq"),
        col("event_time").as("purchase_time"))
      .withWatermark("purchase_time", "0 seconds")
    val joined = purchases.join(clicks,
        col("rowkey") === col("c_rowkey") &&
          col("click_time") >= col("purchase_time") - expr("INTERVAL 1 HOUR") &&
          col("click_time") <= col("purchase_time"),
        "leftOuter")
      .select(col("rowkey"), col("purchase_seq"), col("click_seq"))
    runAdaptive(s, stage,
      joined.writeStream
      .foreachBatch { (df: DataFrame, _: Long) =>
        df.write.mode("append").parquet(out)
      }
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()))
    s.read.parquet(out)
      .dropDuplicates("purchase_seq", "click_seq")
      .groupBy(col("rowkey").cast("long").as("user_id"))
      .agg(countDistinct(col("purchase_seq")).as("n_purchases"),
        sum(when(col("click_seq").isNotNull, 1L).otherwise(0L)).as("n_pairs"),
        countDistinct(when(col("click_seq").isNull, col("purchase_seq")))
          .as("n_unmatched_purchases"))
  }

  /** q274: STREAMING FULL-OUTER interval join — the join family's
    * last member (inner q80, left-outer q121): purchases and clicks
    * matched within the 1-hour attribution window, AND both kinds of
    * non-matches surfaced — purchases with no qualifying click
    * (attribution gaps) and clicks that never converted (abandoned
    * intent). Each side's state is watermark-bounded and its
    * unmatched rows are emitted exactly when the joint watermark
    * proves no future partner can arrive: a purchase finalizes once
    * the watermark passes its own ts (clicks never arrive later than
    * the purchase), a click once the watermark passes ts + 1h (its
    * match window closes). Delay-0 watermarks make both cutoffs the
    * joint max event time — exact integer bounds the oracle replays
    * (q121's argument extended to both sides). At 100 TB the state
    * bound is the same as the inner join's: the 1-hour window per
    * key, never the stream. */
  def fullOuterJoinStream(s: SparkSession, dir: String): DataFrame = {
    val stage = stagingRoot("q274", dir)
    val walDir = s"$stage/wal"; val ckpt = s"$stage/ckpt"; val out = s"$stage/out"
    val subset = WalSource.eventsAsWal(s, dir)
      .filter(col("cells")(0)("qualifier").isin("click", "purchase"))
    WalSource.writeWalJson(subset, walDir, batches = 6)
    def side(q: String): DataFrame =
      WalSource.streamV2(s, walDir, maxFilesPerTrigger = 3)
        .filter(col("cells")(0)("qualifier") === q)
        .withColumn("event_time", timestamp_micros(col("ts")))
    val clicks = side("click")
      .select(col("rowkey").as("c_rowkey"), col("seq").as("click_seq"),
        col("event_time").as("click_time"))
      .withWatermark("click_time", "0 seconds")
    val purchases = side("purchase")
      .select(col("rowkey"), col("seq").as("purchase_seq"),
        col("event_time").as("purchase_time"))
      .withWatermark("purchase_time", "0 seconds")
    val joined = purchases.join(clicks,
        col("rowkey") === col("c_rowkey") &&
          col("click_time") >= col("purchase_time") - expr("INTERVAL 1 HOUR") &&
          col("click_time") <= col("purchase_time"),
        "fullOuter")
      .select(coalesce(col("rowkey"), col("c_rowkey")).as("user_key"),
        col("purchase_seq"), col("click_seq"))
    runAdaptive(s, stage,
      joined.writeStream
      .foreachBatch { (df: DataFrame, _: Long) =>
        df.write.mode("append").parquet(out)
      }
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()))
    s.read.parquet(out)
      // idempotence under any foreachBatch retry/replay; null seqs
      // (outer rows) keep one row per (purchase, click) identity
      .dropDuplicates("purchase_seq", "click_seq")
      .groupBy(col("user_key").cast("long").as("user_id"))
      .agg(
        sum(when(col("click_seq").isNotNull && col("purchase_seq").isNotNull,
          1L).otherwise(0L)).as("n_pairs"),
        countDistinct(when(col("click_seq").isNull, col("purchase_seq")))
          .as("n_unmatched_purchases"),
        countDistinct(when(col("purchase_seq").isNull, col("click_seq")))
          .as("n_unmatched_clicks"))
  }

  /** q116: STREAMING per-window top-k under the oracle gate — the
    * custom bounded [[graft.functions.TopKAgg]] run INSIDE a
    * streaming aggregation (Complete mode): per 1-day event-time
    * window, the top-3 events by value. The aggregator's k-buffer is
    * the streaming state — k rows per window instead of every scored
    * row (the q25/q96 map-side-bounded argument applied to streaming
    * state), merged incrementally across micro-batches. The merge is
    * commutative/associative with a deterministic total order
    * (value desc, event_id asc), so the final Complete-mode emission
    * is arrival-order independent — what makes it SQL-replayable
    * (the q73 argument, with a custom Aggregator instead of a
    * built-in). */
  def streamTopK(s: SparkSession, dir: String, k: Int = 3): DataFrame = {
    import graft.functions.TopK
    val stage = stagingRoot("q116", dir)
    val walDir = s"$stage/wal"; val ckpt = s"$stage/ckpt"; val out = s"$stage/out"
    WalSource.writeWalJson(WalSource.eventsAsWal(s, dir), walDir, batches = 8)
    val tops = WalSource.streamV2(s, walDir, maxFilesPerTrigger = 2)
      .withColumn("event_time", timestamp_micros(col("ts")))
      .withColumn("value", col("cells")(0)("value").cast("double"))
      .groupBy(window(col("event_time"), "1 day"))
      .agg(TopK.topk(k)(col("seq"), col("value")).as("top"))
    runAdaptive(s, stage,
      tops.writeStream
      .foreachBatch { (df: DataFrame, _: Long) =>
        df.write.mode("overwrite").parquet(out)
      }
      .outputMode("complete")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()))
    s.read.parquet(out)
      .select(unix_micros(col("window.start")).as("window_start"),
        posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("window_start"), (col("pos") + 1).cast("long").as("rank"),
        col("t.id").as("event_id"), col("t.score").as("value"))
  }

  /** q115: the BOUNDED-STATE funnel under the oracle gate —
    * [[graft.streaming.Funnel.trackWithTTL]] with EventTimeTimeout:
    * users idle past the TTL against the event-time watermark are
    * flushed (final funnel row emitted once) and their state
    * evicted. The TTL (~16.7 h) sits at the median idle tail of the
    * view/purchase stream, so roughly HALF the users evict at every
    * SF — both populations appear in the output, `evicted`
    * distinguishing them.
    *
    * Why the WAL is staged as ONE data micro-batch (+ the timeout
    * batch): eviction replays as exact integer arithmetic only if
    * the watermark cannot race a user's remaining events. With a
    * single data batch the watermark advances once — from −∞ to the
    * stream's global max — so a user is flushed iff
    * umax_ms + ttl < gmax_ms, exactly what the oracle computes
    * (q83's argument). Multi-batch watermark progressions would
    * evict mid-stream users whose later events then rebuild COLD
    * state (losing the pre-eviction first view) at batch boundaries
    * the oracle cannot see (repartitionByRange samples its range
    * bounds). Multi-batch arrival-order invariance is q95's gate;
    * the cold-restart trade is pinned in StreamFunnelSpec. The
    * eviction decision, flush emission, and state removal all run
    * for real here. */
  def funnelTtlStream(s: SparkSession, dir: String,
      ttlMillis: Long = 60000000L): DataFrame = {
    import s.implicits._
    val stage = stagingRoot("q115", dir)
    val walDir = s"$stage/wal"; val ckpt = s"$stage/ckpt"; val out = s"$stage/out"
    val subset = WalSource.eventsAsWal(s, dir)
      .filter(col("cells")(0)("kind") === "put" &&
        col("cells")(0)("qualifier").isin("view", "purchase"))
    WalSource.writeWalJson(subset, walDir, batches = 2)
    val evs = WalSource.streamV2(s, walDir, maxFilesPerTrigger = 2)
      .select(col("rowkey").as("user"),
        col("cells")(0)("qualifier").as("etype"), col("ts"))
      .withColumn("event_time", timestamp_micros(col("ts")))
      .withWatermark("event_time", "0 seconds")
      .as[graft.streaming.Funnel.FunnelEvent]
    runAdaptive(s, stage,
      graft.streaming.Funnel.trackWithTTL(s, evs, ttlMillis).writeStream
      .foreachBatch {
        (df: Dataset[graft.streaming.Funnel.FunnelOut], id: Long) =>
          df.withColumn("batch", lit(id)).write.mode("append").parquet(out)
      }
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()))
    // all data lands in batch 0, so any later emission is a flush:
    // evicted = touched by a timeout batch
    s.read.parquet(out)
      .groupBy(col("user_id"))
      .agg(max_by(struct(col("first_view"), col("conv_ts")), col("batch")).as("st"),
        max(col("batch")).as("mb"))
      .select(col("user_id").cast("long").as("user_id"),
        col("st.first_view").as("first_view"),
        when(col("st.conv_ts") >= 0, col("st.conv_ts")).as("conv_ts"),
        when(col("mb") >= 1, 1).otherwise(0).as("evicted"))
  }

  /** q123: STREAMING pivot under the oracle gate — the per-user
    * event-type matrix (q43's batch pivot) maintained as Complete-mode
    * streaming state. Structured Streaming does not support the
    * two-pass `pivot()` API (the column-discovery pass would need the
    * whole stream), so the pivot is the LITERAL-DRIVEN conditional
    * aggregation — `sum(when(qualifier = X, 1))` per pinned column —
    * which is exactly how a 100 TB deployment pivots anyway (the
    * column set is a contract, not a data discovery). Counting is
    * commutative/associative, so the final Complete-mode state is
    * arrival-order independent and replays as q43's batch SQL
    * (the q73 argument). State: one row of |types| counters per user,
    * merged incrementally across micro-batches. */
  def streamPivot(s: SparkSession, dir: String): DataFrame = {
    val stage = stagingRoot("q123", dir)
    val walDir = s"$stage/wal"; val ckpt = s"$stage/ckpt"; val out = s"$stage/out"
    WalSource.writeWalJson(WalSource.eventsAsWal(s, dir), walDir, batches = 8)
    val types = Seq("click", "view", "purchase", "signup", "error")
    val q = col("cells")(0)("qualifier")
    val typeCounts = types.map(t => sum(when(q === t, 1L).otherwise(0L)).as(t))
    val counts = WalSource.streamV2(s, walDir, maxFilesPerTrigger = 2)
      .groupBy(col("rowkey"))
      .agg(typeCounts.head, typeCounts.tail: _*)
    runAdaptive(s, stage,
      counts.writeStream
      .foreachBatch { (df: DataFrame, _: Long) =>
        df.write.mode("overwrite").parquet(out)
      }
      .outputMode("complete")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()))
    s.read.parquet(out)
      .select(col("rowkey").cast("long").as("user_id") +:
        types.map(t => col(t)): _*)
  }

  /** q131: STREAMING distinct-count via HLL registers as the
    * streaming state — per event type, the distinct-user cardinality
    * maintained as 256 max-rank registers (q92's sketch) inside a
    * Complete-mode streaming aggregation. THE bounded-state streaming
    * cardinality story: exact streaming distinct would hold every
    * seen key in the state store (unbounded at 100 TB); the register
    * state is |types| × 256 longs forever, and register max is a
    * commutative/associative lattice merge (ApproxSpec), so the
    * final registers are arrival-order independent — SQL-replayable
    * including the estimator's error (the q73 argument applied to a
    * sketch). The estimate + exact audit run batch-side on the final
    * 256-row-per-type register table. */
  def streamHll(s: SparkSession, dir: String): DataFrame = {
    val stage = stagingRoot("q131", dir)
    val walDir = s"$stage/wal"; val ckpt = s"$stage/ckpt"; val out = s"$stage/out"
    WalSource.writeWalJson(WalSource.eventsAsWal(s, dir), walDir, batches = 8)
    val keyed = WalSource.streamV2(s, walDir, maxFilesPerTrigger = 2)
      .select(col("cells")(0)("qualifier").as("event_type"),
        col("rowkey").as("k"))
    val regs = Sketch.hllRegistersBy(keyed, "event_type")
    runAdaptive(s, stage,
      regs.writeStream
      .foreachBatch { (df: DataFrame, _: Long) =>
        df.write.mode("overwrite").parquet(out)
      }
      .outputMode("complete")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()))
    val est = Sketch.hllEstimate(s.read.parquet(out), "event_type")
    val exact = graft.Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_exact"))
    est.join(exact, "event_type")
      .select(col("event_type"), col("n_exact"), col("n_occupied"),
        round(col("est_unrounded"), 4).as("est"),
        round(abs(col("est_unrounded") - col("n_exact")) / col("n_exact"), 4)
          .as("rel_err"))
  }

  /** Pointer file naming the live version dir of a versioned parquet
    * view (the q140 sink). Swaps are a single POSIX rename
    * (ATOMIC_MOVE), so a reader sees either the old or the new
    * version — never a half-written or missing view. */
  private[graft] def viewPointer(root: String): java.nio.file.Path =
    java.nio.file.Paths.get(root, "view.current")

  /** Resolve the live version dir named by the pointer, if any. */
  private[graft] def currentViewDir(root: String): Option[String] = {
    val ptr = viewPointer(root)
    if (java.nio.file.Files.exists(ptr))
      Some(java.nio.file.Paths.get(root,
        java.nio.file.Files.readString(ptr).trim).toString)
    else None
  }

  /** CRASH-ATOMIC publish of a new view version: (1) write the new
    * version to its own dir — the live pointer still names the old
    * version, so a crash here costs nothing; (2) swap the pointer by
    * writing a sidecar file and ATOMIC_MOVE-renaming it over the
    * pointer — the one atomic step; (3) garbage-collect STALE
    * versions, RETAINING the `retainVersions` most recent non-live
    * dirs as a reader grace window: a concurrent reader that resolved
    * [[currentViewDir]] just before the swap keeps scanning the old
    * version it holds instead of hitting FileNotFoundException
    * mid-scan (crash atomicity alone never covered that race). A
    * crash between (2) and (3) leaves orphan DIRECTORIES, never an
    * unreadable view (the next publish sweeps them). Retention is a
    * GRACE, not a lease — a reader that dawdles past `retainVersions`
    * further publishes can still lose its dir; single-writer is
    * assumed throughout. This is the catalog-pointer + retained
    * snapshot shape transactional table formats use, minus their
    * jars. */
  private[graft] def publishView(root: String, df: DataFrame,
      version: Long, retainVersions: Int = 2): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val name = s"view_v$version"
    df.write.mode("overwrite").parquet(Paths.get(root, name).toString)
    val tmp = Paths.get(root, s"view.current.tmp$version")
    Files.writeString(tmp, name)
    Files.move(tmp, viewPointer(root), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    val live = Paths.get(root, name)
    val listing = Files.list(Paths.get(root))
    val stale = try {
      import scala.jdk.CollectionConverters._
      listing.iterator().asScala.toList
        .filter(p => p.getFileName.toString.startsWith("view_v") && p != live)
        .sortBy(p => p.getFileName.toString.stripPrefix("view_v").toLong)
        .dropRight(retainVersions)
    } finally listing.close()
    stale.foreach { p =>
      Files.walk(p).sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => Files.delete(f))
    }
  }

  /** q140: STREAMING MATERIALIZED VIEW via an UPDATE-mode UPSERT
    * sink — the production shape of q126's IVM: the per-(user, type)
    * aggregate runs as streaming state, and each micro-batch emits
    * only the TOUCHED keys' new totals (update mode), which
    * foreachBatch upserts into a keyed parquet view (read current →
    * anti-join touched keys → union → versioned write + atomic
    * pointer swap via [[publishView]] — the Delta/Hudi MERGE pattern
    * without their jars, crash-atomic at every step). Contrast with
    * q123/q131's Complete mode, which rewrites EVERY key every
    * batch: at 100 TB the view has billions of keys and a batch
    * touches thousands — update+upsert writes |touched|, not |keys|.
    * Counting/summing is commutative, so the final view equals the
    * batch aggregate (q126's oracle) regardless of batching — upsert
    * latest-wins per key makes the sink idempotent per batch. */
  def streamUpsertView(s: SparkSession, dir: String): DataFrame = {
    val stage = stagingRoot("q140", dir)
    val walDir = s"$stage/wal"; val ckpt = s"$stage/ckpt"
    WalSource.writeWalJson(WalSource.eventsAsWal(s, dir), walDir, batches = 8)
    val totals = WalSource.streamV2(s, walDir, maxFilesPerTrigger = 2)
      .select(col("rowkey").cast("long").as("user_id"),
        col("cells")(0)("qualifier").as("event_type"),
        round(col("cells")(0)("value").cast("double") * 100).cast("long").as("cents"))
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("sum_cents"))
    runAdaptive(s, stage,
      totals.writeStream
      .foreachBatch { (df: DataFrame, id: Long) =>
        val touched = df // update mode: only keys changed this batch
        val merged = currentViewDir(stage) match {
          case Some(cur) =>
            s.read.parquet(cur)
              .join(touched.select(col("user_id"), col("event_type")),
                Seq("user_id", "event_type"), "left_anti")
              .unionByName(touched)
          case None => touched
        }
        publishView(stage, merged, id)
      }
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()))
    s.read.parquet(currentViewDir(stage).getOrElse(
      sys.error("q140: no view version published")))
  }

  /** q299: STREAMING RETRACTION IVM (round-10, VERDICT Next #4) —
    * q289's signed-multiplicity algebra run as streaming state: the
    * WAL carries INSERTS (every event, mult +1) and, arriving LATER
    * in seq order, a CDC correction feed of DELETE tombstones
    * (mult −1 for the q289 retraction set: pre-cutoff event_id % 7
    * == 0 — fraud reversals / GDPR erasures shipped after the fact).
    * The Update-mode aggregate keeps Σmult / Σmult·cents per (user,
    * type) — still a commutative merge, so state is arrival-order
    * independent — and each micro-batch upserts the q140 view with
    * the Z-relation rule applied AS A SINK TOMBSTONE: a touched
    * group whose support hits zero is REMOVED from the published
    * view (anti-join clears the old row; the zero row itself is
    * filtered), so a reader never sees a ghost group. The gate: the
    * final view must equal q289's batch relation — recompute without
    * the retracted set. Insert-only was q140; this is the delete
    * half the streaming family lacked. */
  def streamIvmRetract(s: SparkSession, dir: String,
      cutoffMicros: Long = Incremental.DefaultCutoffMicros): DataFrame = {
    val ev = graft.Tables.events(s, dir)
    val maxSeq = ev.agg(max(col("event_id"))).head().getLong(0)
    def mutation(df: DataFrame, kind: String, seqCol: Column): DataFrame =
      df.select(seqCol.as("seq"), col("ts"), lit("events").as("table"),
        col("user_id").cast("string").as("rowkey"),
        array(struct(lit("e").as("family"),
          col("event_type").as("qualifier"),
          col("value").cast("string").as("value"), col("ts"),
          lit(kind).as("kind"))).as("cells"))
    val inserts = mutation(ev, "put", col("event_id"))
    // corrections ship after every insert: seq offset past the max
    val retractions = mutation(
      ev.filter(col("event_id") % 7 === 0 && col("ts") < cutoffMicros),
      "delete", col("event_id") + lit(maxSeq + 1L))
    streamIvmRetractOf(s, stagingRoot("q299", dir),
      inserts.unionByName(retractions))
  }

  /** q314: the FULL SEP LIFECYCLE in one gated query (round-10) —
    * register → consume → ack → compact, every stage the REAL
    * production path (q297 proves the retention math on fixture
    * acks; this earns the acks by actually consuming): two
    * subscriptions ("clicks" filtered, "all" unfiltered) are
    * registered, each is consumed TO COMPLETION through the DSv2 WAL
    * stream by [[consumeAndAck]] (checkpointed micro-batches, ack
    * after process — at-least-once with monotonic absorb), then
    * [[WalRetention.compactToAcks]] derives the retention boundary
    * from the persisted positions: the filtered consumer's ack stops
    * at the last mutation IT CAN SEE, so everything after the final
    * click is held — the lag a lazy subscription imposes on GC,
    * measured. A completed consume acks a DETERMINISTIC position
    * (max visible seq), which is what makes the whole loop
    * oracle-replayable with no fixture. Report per subscription:
    * acked seq, rows still unreleasable because of it, the derived
    * boundary, the published snapshot's keys, and the materialized
    * state rows that survive compaction (must equal q12's latest
    * state cardinality — retention lost nothing). */
  def sepLifecycle(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val stage = stagingRoot("q314", dir)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(stage))
    val reg = new graft.streaming.SubscriptionRegistry(s"$stage/registry.json")
    reg.add(graft.streaming.Subscription("clicks", family = Some("e"),
      qualifier = Some("click")))
    reg.add(graft.streaming.Subscription("all"))
    // the logical WAL in both transports: JSONL for the consuming
    // stream, parquet segments for the compactor (the shipped form —
    // same seq space, seq = event_id)
    val walJson = s"$stage/walj"; val walParquet = s"$stage/walp"
    WalSource.writeWalJson(WalSource.eventsAsWal(s, dir), walJson, batches = 6)
    WalRetention.stageWal(s, dir, walParquet)
    Seq("clicks", "all").foreach { name =>
      consumeAndAck(s, graft.sources.GraftWalStream(walJson,
        maxFilesPerTrigger = 2), reg, name, s"$stage/ckpt_$name")()
    }
    val wal = s.read.parquet(walParquet).select(col("seq"), col("ts"))
      .localCheckpoint()
    val (boundary, _, _) = WalRetention.compactToAcks(s, walParquet,
      s"$stage/snap", reg)
    val snapKeys = s.read.parquet(
      WalRetention.currentSnapshot(s"$stage/snap").get).count()
    val stateRows = WalRetention.stateAsOf(s, walParquet, s"$stage/snap")
      .count()
    val acks = reg.acks()
    val subsDf = Seq("clicks", "all").map(n => (n, acks(n)))
      .toDF("subscription", "ack_seq")
    wal.crossJoin(broadcast(subsDf))
      .groupBy(col("subscription"), col("ack_seq"))
      .agg(sum(when(col("seq") > col("ack_seq"), 1L).otherwise(0L))
        .as("n_pending"))
      .withColumn("boundary_ts", lit(boundary))
      .withColumn("n_snapshot_keys", lit(snapKeys))
      .withColumn("n_state_rows", lit(stateRows))
  }

  /** q299 core over an arbitrary mutation frame (seq, ts, table,
    * rowkey, cells[{family, qualifier, value, ts, kind}]) — split out
    * so the spec can inject a WAL with a FULLY-retracted group and
    * pin the sink-tombstone path the events fixture may not exercise
    * at small SF. */
  private[graft] def streamIvmRetractOf(s: SparkSession, stage: String,
      mutations: DataFrame): DataFrame = {
    val walDir = s"$stage/wal"; val ckpt = s"$stage/ckpt"
    WalSource.writeWalJson(mutations, walDir, batches = 8)
    val mult = when(col("cells")(0)("kind") === "delete", -1L).otherwise(1L)
    val totals = WalSource.streamV2(s, walDir, maxFilesPerTrigger = 2)
      .select(col("rowkey").cast("long").as("user_id"),
        col("cells")(0)("qualifier").as("event_type"),
        (mult * round(col("cells")(0)("value").cast("double") * 100)
          .cast("long")).as("signed_cents"),
        mult.as("mult"))
      .groupBy(col("user_id"), col("event_type"))
      .agg(sum(col("mult")).as("n_events"),
        sum(col("signed_cents")).as("sum_cents"))
    runAdaptive(s, stage,
      totals.writeStream
      .foreachBatch { (df: DataFrame, id: Long) =>
        val touched = df // update mode: only keys changed this batch
        val merged = (currentViewDir(stage) match {
          case Some(cur) =>
            s.read.parquet(cur)
              .join(touched.select(col("user_id"), col("event_type")),
                Seq("user_id", "event_type"), "left_anti")
              .unionByName(touched)
          case None => touched
        }).filter(col("n_events") > 0L) // Z-relation: zero support → tombstone
        publishView(stage, merged, id)
      }
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()))
    s.read.parquet(currentViewDir(stage).getOrElse(
      sys.error("q299: no view version published")))
  }

  /** Run any [[graft.sources.WalStream]] transport to exhaustion
    * (Trigger.AvailableNow) through the stateful materializer and
    * return each key's FINAL row state as scalar columns. Update mode
    * emits a state row per touched key per micro-batch; the final
    * state is the row from the last batch touching the key.
    *
    * `rocksDB = true` runs the query on the RocksDB state-store
    * provider — the 100 TB production choice (state off-heap,
    * incremental checkpoints); results are provider-independent
    * (proven in WalStreamSpec). `ttlMillis` switches to the
    * bounded-state materializer (idle rows evicted as tombstones;
    * see [[ttlMaterialize]]). */
  def finalStates(s: SparkSession, wal: graft.sources.WalStream,
      out: String, ckpt: String, rocksDB: Boolean = false,
      ttlMillis: Option[Long] = None): DataFrame = {
    import s.implicits._
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = s.conf.getOption(providerKey)
    if (rocksDB) s.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val states = ttlMillis match {
      case Some(ttl) =>
        val withTime = wal.open(s)
          .withColumn("event_time", timestamp_micros(col("ts")))
          .withWatermark("event_time", "0 seconds")
          .as[Mutation]
        RowMaterializer.materializeWithTTL(s, withTime, ttl)
      case None =>
        RowMaterializer.materialize(s, wal.open(s).as[Mutation])
    }
    try runAdaptive(s, new java.io.File(ckpt).getParent,
      states.writeStream
        .foreachBatch { (df: Dataset[RowState], id: Long) =>
          df.withColumn("batch", lit(id)).write.mode("append").parquet(out)
        }
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()))
    finally if (rocksDB) prior match {
      case Some(v) => s.conf.set(providerKey, v)
      case None => s.conf.unset(providerKey)
    }
    s.read.parquet(out)
      .groupBy(col("table"), col("rowkey"))
      .agg(max_by(struct(col("version"), col("deleted"), col("cells")),
        col("batch")).as("st"))
      .select(col("table"), col("rowkey"), col("st.version").as("version"),
        col("st.deleted").as("deleted"),
        array_join(array_sort(map_keys(col("st.cells"))), ",").as("qualifiers"))
  }

  /** q158: WATERMARK-LAG audit — the measurement that SIZES
    * `withWatermark` before any streaming job runs: how late does
    * event time actually arrive relative to the advancing watermark,
    * and what fraction of events would each candidate delay drop?
    * The generator's WAL is perfectly time-ordered (measured: zero
    * inversions), so ARRIVAL time is simulated as event time + a
    * seeded-hash network delay of up to 30 min (deterministic — the
    * q96/q144 uniform construction — so both engines replay the same
    * disorder). Arrival is then chunked into processing-time
    * micro-batches (`chunkDurUs`), because that is EXACTLY how
    * Spark's watermark advances: frozen within a batch, bumped to
    * max-seen event time at batch boundaries. Per chunk: max event
    * time (map-side agg); running max over PRIOR chunks = the
    * watermark each event confronts on arrival; lateness = wm − ts
    * clamped at 0. The chunk table the window sorts has
    * stream-lifetime/chunkDur rows — bounded by wall-clock lifetime
    * (the cardinality of Spark's own progress log), not corpus size.
    * Output: 5 lateness bands → the delay-vs-data-loss table (a 1 m
    * watermark drops the >1 m bands, etc.). All-integer µs
    * arithmetic. */
  def watermarkLagAudit(s: SparkSession, dir: String,
      chunkDurUs: Long = 600000000L, maxJitterUs: Long = 1800000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = graft.Tables.events(s, dir).select(col("event_id"), col("ts"))
      .withColumn("arrival", col("ts") +
        Sampling.hashBucket(concat(lit("lag|"),
          col("event_id").cast("string"))) % maxJitterUs)
      .withColumn("chunkid", expr(s"arrival div $chunkDurUs"))
    val chunks = ev.groupBy(col("chunkid")).agg(max(col("ts")).as("cmax"))
    val wprior = Window.orderBy(col("chunkid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wm = chunks.select(col("chunkid"),
      max(col("cmax")).over(wprior).as("wm_prev"))
    val total = ev.agg(count(lit(1)).as("n"))
    ev.join(broadcast(wm), "chunkid")
      .withColumn("late_us", when(col("wm_prev").isNull, 0L)
        .otherwise(greatest(col("wm_prev") - col("ts"), lit(0L))))
      .withColumn("band",
        when(col("late_us") === 0, "0_on_time")
          .when(col("late_us") <= 60000000L, "1_within_1m")
          .when(col("late_us") <= 600000000L, "2_within_10m")
          .when(col("late_us") <= 3600000000L, "3_within_1h")
          .otherwise("4_over_1h"))
      .groupBy(col("band")).agg(count(lit(1)).as("n_events"),
        max(col("late_us")).as("max_late_us"))
      .crossJoin(broadcast(total))
      .select(col("band"), col("n_events"), col("max_late_us"),
        round(col("n_events") / col("n").cast("double"), 4).as("frac"))
  }

  /** q198: event-time COMPLETENESS curve — the other half of q158's
    * watermark sizing: q158 asks "how late is data vs the advancing
    * watermark"; this asks the scheduler's question — "when can the
    * HOURLY job safely run?" For each event hour, what fraction of
    * its events have ARRIVED by the hour's end + k·step (5-minute
    * steps): the curve a pipeline reads as "at :00 we have 91.6%, by
    * :30 we have 100%" and turns directly into a trigger delay /
    * SLA. Arrival is the SAME seeded-hash network-delay simulation
    * as q158 ("lag|" family — one consistent disorder world across
    * both audits, deterministic on both engines). Per event:
    * delay_steps = 0 if it arrived within its own hour, else the
    * ceil 5-minute step past hour end; one corpus aggregation to
    * ≤ jitter/step+1 rows, cumulated over that bounded table.
    * All-integer ppm output. */
  def completenessCurve(s: SparkSession, dir: String,
      stepUs: Long = 300000000L, maxJitterUs: Long = 1800000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hourUs = 3600000000L
    val ev = graft.Tables.events(s, dir).select(col("event_id"), col("ts"))
      .withColumn("arrival", col("ts") +
        Sampling.hashBucket(concat(lit("lag|"),
          col("event_id").cast("string"))) % maxJitterUs)
      .withColumn("hour_end", (expr(s"ts div $hourUs") + 1) * hourUs)
      .withColumn("d", when(col("arrival") <= col("hour_end"), 0L)
        .otherwise(expr(s"(arrival - hour_end - 1) div $stepUs") + 1L))
    val total = ev.agg(count(lit(1)).as("n_total"))
    // bounded window: <= maxJitter/step + 1 rows (7 at the defaults)
    val w = Window.orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.groupBy(col("d")).agg(count(lit(1)).as("n_events"))
      .withColumn("n_cum", sum(col("n_events")).over(w))
      .crossJoin(broadcast(total))
      .select(col("d").as("delay_steps"), col("n_events"), col("n_cum"),
        expr("n_cum * 1000000 div n_total").as("frac_ppm"))
  }

  /** q208: STREAMING daily-active-users — q203's DAU as live
    * streaming state, and the one gate exercising Spark's
    * MULTI-STATEFUL pipeline (stateful dropDuplicates feeding a
    * stateful aggregation in one query): per-(user, day) dedup
    * state emits each pair's FIRST delivery only, so the downstream
    * Complete-mode per-day count state receives each active pair
    * exactly once — count(distinct) decomposed into two bounded
    * state stores (dedup state = |active pairs|, agg state =
    * |days|), which is how a streaming engine does distinct at
    * 100 TB (an exact distinct inside the agg would buffer every
    * id per day). Dedup-first makes the final counts arrival-order
    * independent ⇒ SQL-replayable (the q53 argument). */
  def streamActiveUsers(s: SparkSession, dir: String): DataFrame = {
    val stage = stagingRoot("q208", dir)
    WalSource.writeWalJson(WalSource.eventsAsWal(s, dir), s"$stage/wal", batches = 8)
    runStreamActiveUsers(s, s"$stage/wal", s"$stage/ckpt", s"$stage/out",
      maxFilesPerTrigger = 2)
  }

  /** The q208 pipeline against an existing WAL dir + checkpoint —
    * factored out so the spec can drive the multi-stateful semantics
    * the SQL oracle cannot see: pair deliveries split across
    * micro-batches, and checkpoint kill/restart continuing through
    * BOTH state stores without double-counting. Runs the query to
    * current-WAL exhaustion (AvailableNow) and returns the final
    * per-day counts; re-invoking with the same checkpoint after new
    * segments arrive RESUMES (dedup + agg state restored), it does
    * not recount. */
  private[graft] def runStreamActiveUsers(s: SparkSession, walDir: String,
      ckpt: String, out: String, maxFilesPerTrigger: Int = 2): DataFrame = {
    val dau = WalSource.streamV2(s, walDir, maxFilesPerTrigger)
      .select(col("rowkey").cast("long").as("user_id"),
        expr("ts div 86400000000").as("day"))
      .dropDuplicates("user_id", "day")
      .groupBy(col("day"))
      .agg(count(lit(1)).as("dau"))
    val query = dau.writeStream
      .foreachBatch { (df: DataFrame, _: Long) =>
        df.write.mode("overwrite").parquet(out)
      }
      .outputMode("complete")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()
    s.read.parquet(out)
  }

  /** q221: STREAMING admission QUOTA — at most 5 events per (user,
    * hour) admitted, the rate-limit gate a SEP consumer runs in
    * front of expensive downstream work. State is
    * [[graft.streaming.Quota]]'s k-min lattice (total count + the 5
    * lowest WAL seqs per key), so the FINAL admitted set is
    * arrival-order independent and equals the oracle's
    * row_number-by-seq ≤ 5 — including which events were admitted,
    * pinned by `admitted_seq_sum` (set membership, not just counts).
    * Sink: Update-mode emissions appended per batch; `n` is monotone
    * per key, so max_by(n) at read collapses to the final state —
    * no upsert machinery needed for an append-only audit sink. The
    * per-hour report then aggregates the per-key finals (bounded by
    * active (user, hour) keys, never event volume). */
  def streamQuota(s: SparkSession, dir: String): DataFrame = {
    val stage = stagingRoot("q221", dir)
    WalSource.writeWalJson(WalSource.eventsAsWal(s, dir), s"$stage/wal", batches = 8)
    runStreamQuota(s, s"$stage/wal", s"$stage/ckpt", s"$stage/out",
      maxFilesPerTrigger = 2)
  }

  /** The q221 pipeline against an existing WAL/checkpoint — factored
    * out so QuotaSpec can drive cross-batch eviction and restart
    * semantics the SQL oracle cannot see. AvailableNow to WAL
    * exhaustion; same-checkpoint re-invocation RESUMES. */
  private[graft] def runStreamQuota(s: SparkSession, walDir: String,
      ckpt: String, out: String, maxFilesPerTrigger: Int = 2,
      limit: Int = 5): DataFrame = {
    import s.implicits._
    import graft.streaming.Quota
    val events = WalSource.streamV2(s, walDir, maxFilesPerTrigger)
      .select(col("rowkey").cast("long").as("user"),
        expr("ts div 3600000000").as("hour"), col("seq"))
      .as[Quota.QuotaEvent]
    runAdaptive(s, new java.io.File(ckpt).getParent,
      Quota.track(events, limit).toDF().writeStream
      .foreachBatch { (df: DataFrame, _: Long) =>
        df.write.mode("append").parquet(out)
      }
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()))
    val finals = s.read.parquet(out)
      .groupBy(col("user"), col("hour"))
      .agg(max_by(struct(col("n"), col("admitted")), col("n")).as("f"))
      .select(col("user"), col("hour"), col("f.n").as("n"),
        col("f.admitted").as("admitted"))
    finals.groupBy(col("hour"))
      .agg(sum(col("n")).as("n_events"),
        sum(size(col("admitted")).cast("long")).as("n_admitted"),
        sum(col("n") - size(col("admitted"))).as("n_rejected"),
        sum(when(col("n") > limit, 1L).otherwise(0L)).as("n_capped_users"),
        sum(aggregate(col("admitted"), lit(0L), (a, x) => a + x))
          .as("admitted_seq_sum"))
  }

  /** q230: STREAMING SCD2 — q70's validity-interval dimension
    * history maintained live off the WAL ([[graft.streaming.Scd2]]):
    * O(1) state per key (high-water + the open version), history in
    * the append sink, closed rows emitted exactly once, below-
    * high-water arrivals late-routed (counted, never spliced).
    * Read-side collapse: (user, valid_from) → max(valid_to) — a
    * closed row supersedes its stale open emission and checkpoint-
    * replay duplicates. Final assembled history ≡ the q70 batch
    * oracle because the staged WAL honors the CDC per-key ordering
    * contract (Scd2Spec drives the violating case). */
  def streamScd2(s: SparkSession, dir: String): DataFrame = {
    val stage = stagingRoot("q230", dir)
    WalSource.writeWalJson(WalSource.eventsAsWal(s, dir), s"$stage/wal", batches = 8)
    runStreamScd2(s, s"$stage/wal", s"$stage/ckpt", s"$stage/out",
      maxFilesPerTrigger = 2)
  }

  /** The q230 pipeline against an existing WAL/checkpoint; the raw
    * sink (with `kind`, incl. late rows) lands in `out` for the spec
    * — the returned frame is the collapsed q70-shaped history. */
  private[graft] def runStreamScd2(s: SparkSession, walDir: String,
      ckpt: String, out: String, maxFilesPerTrigger: Int = 2): DataFrame = {
    import s.implicits._
    import graft.streaming.Scd2
    val events = WalSource.streamV2(s, walDir, maxFilesPerTrigger)
      .select(col("rowkey").cast("long").as("user"), col("seq"), col("ts"),
        col("cells")(0)("qualifier").as("etype"),
        col("cells")(0)("value").cast("double").as("value"))
      .as[Scd2.Scd2Event]
    runAdaptive(s, new java.io.File(ckpt).getParent,
      Scd2.track(events).toDF().writeStream
      .foreachBatch { (df: DataFrame, _: Long) =>
        df.write.mode("append").parquet(out)
      }
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()))
    s.read.parquet(out)
      .filter(col("kind") =!= "late")
      // event_id is the version identity (same-ts versions share a
      // valid_from but never an id); open/closed/replay duplicates
      // collapse to the one row with the closed valid_to if any
      .groupBy(col("user_id"), col("event_id"))
      .agg(first(col("event_type")).as("event_type"),
        first(col("value")).as("value"),
        first(col("valid_from")).as("valid_from"),
        max(col("valid_to")).as("valid_to"))
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("value"), col("valid_from"), col("valid_to"))
  }

  // ---------------------------------------------------------------
  // q195 state stores: BASE (compacted, pointer-versioned) + DELTA
  // (per-batch appends). Every store is READ-IDEMPOTENT under row
  // duplication (ledger dedups by seq, counts max-per-(batch,shard),
  // late distinct), so every crash window — checkpoint replay
  // re-appending a batch, a compaction that published but died before
  // clearing its delta — degrades to duplicate rows the read
  // collapses, never to wrong answers. Single writer assumed (the
  // monitor's one streaming query).
  // ---------------------------------------------------------------

  /** Pointer file + versioned-dir resolution for a named q195 state
    * store — the [[publishView]] mechanism generalized: `name.current`
    * names the live `name_vN` base dir; swaps are ATOMIC_MOVE. */
  private[graft] def storePointer(root: String, name: String) =
    java.nio.file.Paths.get(root, s"$name.current")
  private[graft] def storeBaseDir(root: String, name: String): Option[String] = {
    val ptr = storePointer(root, name)
    if (java.nio.file.Files.exists(ptr))
      Some(java.nio.file.Paths.get(root,
        java.nio.file.Files.readString(ptr).trim).toString)
    else None
  }
  private[graft] def storeDeltaDir(root: String, name: String): String =
    java.nio.file.Paths.get(root, s"${name}_delta").toString

  /** Crash-atomically publish a new compacted base for store `name`
    * (write dir → ATOMIC_MOVE pointer → GC bases beyond a 1-version
    * reader grace), then clear the delta. A crash before the swap
    * leaves the old base live; between swap and delta-clear leaves
    * delta rows ALSO present in the new base — which the
    * read-idempotent stores collapse. */
  private[graft] def publishStore(s: SparkSession, root: String, name: String,
      df: DataFrame, partitionCols: Seq[String]): Unit = {
    import java.nio.file.Paths
    val version = nextStoreVersion(root, name)
    val newDir = Paths.get(root, s"${name}_v$version")
    val writer = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer)
      .parquet(newDir.toString)
    finishStorePublish(root, name, version)
  }

  /** Next version = max over EXISTING `name_v*` dirs + 1 — NOT the
    * pointer (round-15 ADVICE): dropStore deletes the pointer before
    * the version dirs, so a crash in between must not restart
    * numbering at v0 under surviving v{K} dirs — that would strand
    * the highest old dir behind finishStorePublish's 1-version
    * grace forever (it keeps the max-versioned stale dir, which
    * would always be the orphan). Dir-derived numbering resumes at
    * K+1, so the orphans age into "stale beyond grace" and the next
    * publishes sweep them. */
  /** Last version this JVM successfully PUBLISHED per (root, name) —
    * a single-writer fast path that spares the per-publish
    * `Files.list` (q195 publishes per batch; round-16 VERDICT
    * flagged the listing as the one cost coincident with the
    * dir-derived-numbering change). Correctness is unchanged: the
    * cache is only written by [[finishStorePublish]] (i.e. after the
    * version dir exists and the pointer swapped), so cached+1 equals
    * the dir-derived max+1 under the documented single-writer
    * assumption; a crash-restarted JVM starts cold and re-derives
    * from dirs; [[dropStore]] invalidates. A publish that fails
    * AFTER nextStoreVersion never caches, so its retry reuses the
    * same version and mode=overwrite clears the half-built dir —
    * the pre-cache semantics exactly. */
  private val lastPublished =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private def storeKey(root: String, name: String): String =
    java.nio.file.Paths.get(root).toAbsolutePath.toString + " " + name

  private def nextStoreVersion(root: String, name: String): Long = {
    val cached = lastPublished.get(storeKey(root, name))
    if (cached != null) return cached + 1L
    import scala.jdk.CollectionConverters._
    import java.nio.file.{Files, Paths}
    val rootP = Paths.get(root)
    val fromDirs =
      if (!Files.exists(rootP)) None
      else {
        val listing = Files.list(rootP)
        try listing.iterator().asScala.toList
          .flatMap { p =>
            val n = p.getFileName.toString
            if (n.startsWith(s"${name}_v"))
              n.stripPrefix(s"${name}_v").toLongOption
            else None
          } match { case Nil => None; case vs => Some(vs.max) }
        finally listing.close()
      }
    fromDirs.map(_ + 1).getOrElse(0L)
  }

  /** The publish tail shared by the full and scoped publishers: swap
    * the pointer ATOMIC_MOVE onto the freshly written version, GC
    * bases beyond a 1-version reader grace, clear the delta. */
  private def finishStorePublish(root: String, name: String,
      version: Long): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val newDir = Paths.get(root, s"${name}_v$version")
    val tmp = Paths.get(root, s"$name.current.tmp$version")
    Files.writeString(tmp, s"${name}_v$version")
    Files.move(tmp, storePointer(root, name), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    def rmTree(p: java.nio.file.Path): Unit = if (Files.exists(p))
      Files.walk(p).sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => Files.delete(f))
    val listing = Files.list(Paths.get(root))
    val stale = try {
      import scala.jdk.CollectionConverters._
      listing.iterator().asScala.toList
        .filter(p => p.getFileName.toString.startsWith(s"${name}_v") && p != newDir)
        .sortBy(_.getFileName.toString.split(s"${name}_v").last.toLong)
        .dropRight(1)
    } finally listing.close()
    stale.foreach(rmTree)
    rmTree(Paths.get(storeDeltaDir(root, name)))
    lastPublished.put(storeKey(root, name), version)
  }

  /** SCOPED compaction publisher (q385 hardening): fold ONLY the
    * `touched` partitions into the new base version — `compacted`
    * must hold exactly the new contents of those partitions — while
    * every OTHER partition of the previous base enters the new
    * version as HARD LINKS to its existing parquet files
    * (metadata-only, no data IO; deleting the old version later only
    * drops link counts). Compaction IO is O(touched partitions) =
    * O(delta · fanout), never O(index). Crash windows match
    * [[publishStore]]: before the pointer swap the old base stays
    * live and a retry's mode=overwrite write clears the half-built
    * version dir (links included) before relinking. `touched` holds
    * partition VALUES as path-rendered strings (e.g. "7" for
    * cell=7). */
  private[graft] def publishStoreScoped(s: SparkSession, root: String,
      name: String, compacted: DataFrame, partitionCol: String,
      touched: Set[String]): Unit = {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val version = nextStoreVersion(root, name)
    val newDir = Paths.get(root, s"${name}_v$version")
    compacted.write.mode("overwrite").partitionBy(partitionCol)
      .parquet(newDir.toString)
    storeBaseDir(root, name).foreach { old =>
      val oldDir = Paths.get(old)
      val parts = Files.list(oldDir)
      try parts.iterator().asScala
        .filter(p => Files.isDirectory(p) &&
          p.getFileName.toString.startsWith(s"$partitionCol=") &&
          !touched.contains(
            p.getFileName.toString.stripPrefix(s"$partitionCol=")))
        .foreach { part =>
          val dst = newDir.resolve(part.getFileName.toString)
          Files.createDirectories(dst)
          val fl = Files.list(part)
          try fl.iterator().asScala
            .filter(f => Files.isRegularFile(f) &&
              f.getFileName.toString.endsWith(".parquet"))
            .foreach(f =>
              Files.createLink(dst.resolve(f.getFileName.toString), f))
          finally fl.close()
        }
      finally parts.close()
    }
    finishStorePublish(root, name, version)
  }

  /** The ledger bucket dirs (base + delta) that EXIST for the given
    * id-range buckets — the per-batch scan set: a batch's ledger
    * reads resolve to exactly these explicit paths, so pruning is by
    * construction (spec-pinnable from the plan's scan paths), not an
    * optimizer courtesy. */
  private[graft] def ledgerBucketDirs(root: String,
      buckets: Seq[Long]): Seq[String] = {
    val roots = storeBaseDir(root, "ledger").toSeq :+ storeDeltaDir(root, "ledger")
    for {
      r <- roots; b <- buckets
      p = java.nio.file.Paths.get(r, s"bucket=$b")
      if hasParquet(p)
    } yield p.toString
  }

  /** True iff the dir exists and holds at least one parquet data
    * file — an append of an EMPTY frame leaves a dir with only
    * _SUCCESS, which schema inference rejects. */
  private[graft] def hasParquet(p: java.nio.file.Path): Boolean = {
    import java.nio.file.Files
    if (!Files.exists(p)) false
    else {
      val walk = Files.walk(p)
      try walk.anyMatch(f => f.getFileName.toString.endsWith(".parquet"))
      finally walk.close()
    }
  }

  /** Pruned first-delivery ledger read over explicit bucket dirs:
    * (seq, ts) deduped by seq — duplicate rows from replayed appends
    * or an unfinished compaction collapse here. None when no bucket
    * dir exists yet. */
  private[graft] def readLedgerPruned(s: SparkSession, root: String,
      buckets: Seq[Long]): Option[DataFrame] = {
    val dirs = ledgerBucketDirs(root, buckets)
    if (dirs.isEmpty) None
    else Some(s.read.parquet(dirs: _*)
      .groupBy(col("seq")).agg(min(col("ts")).as("ts")))
  }

  /** Drop store `name` entirely: pointer, every version dir, delta.
    * Used by LSM rolls to retire a consumed tier AFTER its contents
    * were published into a higher tier — a crash between publish-up
    * and drop-down leaves the rows present twice, which the
    * read-idempotent stores collapse. */
  private[graft] def dropStore(root: String, name: String): Unit = {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    def rmTree(p: java.nio.file.Path): Unit = if (Files.exists(p))
      Files.walk(p).sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => Files.delete(f))
    Files.deleteIfExists(storePointer(root, name))
    val listing = Files.list(Paths.get(root))
    val dirs = try listing.iterator().asScala.toList
        .filter(_.getFileName.toString.startsWith(s"${name}_v"))
      finally listing.close()
    dirs.foreach(rmTree)
    rmTree(Paths.get(storeDeltaDir(root, name)))
    lastPublished.remove(storeKey(root, name))
  }

  /** Clear ONLY store `name`'s delta dir (the base and pointer stay
    * live) — the LSM roll's retire step for the level-0 run. */
  private[graft] def dropStoreDelta(root: String, name: String): Unit = {
    import java.nio.file.Files
    val p = java.nio.file.Paths.get(storeDeltaDir(root, name))
    if (Files.exists(p))
      Files.walk(p).sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => Files.delete(f))
  }

  /** Full (base ∪ delta) read of store `name` with read-side dedup
    * applied by the caller; None if the store has never been written. */
  private[graft] def readStoreAll(s: SparkSession, root: String,
      name: String): Option[DataFrame] = {
    val dirs = (storeBaseDir(root, name).toSeq :+ storeDeltaDir(root, name))
      .filter(d => hasParquet(java.nio.file.Paths.get(d)))
    if (dirs.isEmpty) None
    else Some(dirs.map(d => s.read.parquet(d)).reduce(_ unionByName _))
  }

  /** ONE micro-batch of the q195 ledger protocol (factored out of the
    * streaming query so specs can drive batches directly and pin the
    * pruned scan set):
    *  1. raw per-shard delivery counts append to the counts delta,
    *     keyed (batch, shard) — max-at-read makes replay idempotent;
    *  2. batch first-deliveries (min ts per seq) dedup against the
    *     ledger PRUNED to the buckets the batch touches — ids equal
    *     to a batch id live in buckets(ids), successor-pair partners
    *     in buckets(ids ± shards); nothing else can match, so the
    *     join reads O(touched ranges), not O(ledger);
    *  3. reordering pairs (id, id+shards, ts running backwards) are
    *     detected in the batch their SECOND member first arrives —
    *     new-vs-(pruned ledger ∪ new) equi-join, never a window sort;
    *  4. new first-deliveries append to the ledger delta partitioned
    *     by bucket;
    *  5. every `compactEvery` batches, [[compactWalState]] folds the
    *     deltas into fresh pointer-versioned bases and applies the
    *     retention bound.
    * Returns the touched-bucket list (the spec's pin surface). */
  private[graft] def walLedgerBatch(s: SparkSession, stateRoot: String,
      batch: DataFrame, batchId: Long, shards: Int, rangeSize: Long,
      compactEvery: Int = 4, retentionUs: Long = Long.MaxValue): Seq[Long] = {
    batch.groupBy((col("seq") % shards).as("shard"))
      .agg(count(lit(1)).as("n"))
      .withColumn("batch", lit(batchId))
      .write.mode("append").parquet(storeDeltaDir(stateRoot, "counts"))
    val batchFirst = batch.groupBy(col("seq")).agg(min(col("ts")).as("ts")).cache()
    val touched = batchFirst
      .select(explode(array(col("seq"), col("seq") + shards,
        col("seq") - shards)).as("q"))
      .filter(col("q") >= 0)
      .select(expr(s"q div $rangeSize").as("b")).distinct()
      .collect().map(_.getLong(0)).toSeq.sorted
    val ledger = readLedgerPruned(s, stateRoot, touched)
    val newFirst = (ledger match {
      case Some(l) => batchFirst.join(l.select("seq"), Seq("seq"), "left_anti")
      case None => batchFirst
    }).cache()
    // pair check at second-member arrival: at least one side new
    val all = ledger.map(_.withColumn("is_new", lit(false))
        .unionByName(newFirst.withColumn("is_new", lit(true))))
      .getOrElse(newFirst.withColumn("is_new", lit(true)))
    all.toDF("sa", "tsa", "na").join(all.toDF("sb", "tsb", "nb"),
        col("sb") === col("sa") + shards && col("tsb") < col("tsa") &&
          (col("na") || col("nb")))
      .select(col("sa").as("pair_seq"))
      .write.mode("append").parquet(storeDeltaDir(stateRoot, "late"))
    newFirst
      .withColumn("bucket", expr(s"seq div $rangeSize"))
      .write.mode("append").partitionBy("bucket")
      .parquet(storeDeltaDir(stateRoot, "ledger"))
    newFirst.unpersist(); batchFirst.unpersist()
    if (compactEvery > 0 && (batchId + 1) % compactEvery == 0)
      compactWalState(s, stateRoot, rangeSize, retentionUs)
    touched
  }

  /** Fold each store's delta into a fresh compacted base (bounding
    * the file count the per-batch appends would otherwise grow
    * without limit) and bound the id ledger by the WAL RETENTION
    * window: first-deliveries older than `retentionUs` before the
    * newest retained delivery are dropped — the ledger's size tracks
    * the retention window, not the stream's lifetime. The contract
    * is the watermarked-dedup one (q86): a duplicate redelivered
    * LATER than the retention window re-counts as a first delivery —
    * exactly the guarantee the WAL itself makes. localCheckpoint
    * pins each merged store before its publish so the new base never
    * reads through the dirs being replaced. */
  private[graft] def compactWalState(s: SparkSession, stateRoot: String,
      rangeSize: Long, retentionUs: Long = Long.MaxValue): Unit = {
    readStoreAll(s, stateRoot, "ledger").foreach { raw =>
      val led = raw.groupBy(col("seq")).agg(min(col("ts")).as("ts"))
      val bounded = if (retentionUs == Long.MaxValue) led else
        led.crossJoin(broadcast(led.agg(max(col("ts")).as("mx"))))
          .filter(col("ts") >= col("mx") - retentionUs)
          .select(col("seq"), col("ts"))
      val compacted = bounded
        .withColumn("bucket", expr(s"seq div $rangeSize"))
        .localCheckpoint()
      publishStore(s, stateRoot, "ledger", compacted, Seq("bucket"))
    }
    readStoreAll(s, stateRoot, "counts").foreach { raw =>
      publishStore(s, stateRoot, "counts",
        raw.groupBy(col("batch"), col("shard")).agg(max(col("n")).as("n"))
          .localCheckpoint(), Seq.empty)
    }
    readStoreAll(s, stateRoot, "late").foreach { raw =>
      publishStore(s, stateRoot, "late", raw.distinct().localCheckpoint(),
        Seq.empty)
    }
  }

  /** q195: STREAMING WAL sequence-integrity monitor — q192's trust
    * audit run per micro-batch on the live stream, the way q53/q73
    * shadow their batch twins: a CDC consumer should not wait for a
    * nightly batch audit to learn its WAL has gaps. One streaming
    * query over the raw WAL with a foreachBatch incremental ledger
    * (the q126/q140 pattern — manual state in parquet, because the
    * monitor needs BOTH raw delivery counts and a cross-batch
    * distinct-id view, which no single built-in streaming aggregate
    * provides). The ledger is PRODUCTION-SHAPED ([[walLedgerBatch]]):
    *  - id-RANGE-PARTITIONED (q111's persisted-index layout, bucket =
    *    seq div rangeSize): each batch joins only the bucket dirs it
    *    touches — per-batch cost is O(touched ranges), independent of
    *    stream lifetime;
    *  - COMPACTED every `compactEvery` batches ([[compactWalState]]):
    *    per-batch delta appends fold into a pointer-versioned base
    *    (crash-atomic swap, the q140 mechanism), so the file count is
    *    bounded by the compaction cadence, not the batch count;
    *  - RETENTION-BOUNDED: `retentionUs` drops first-deliveries
    *    older than the WAL retention window at compaction — ledger
    *    size tracks the window, and a duplicate arriving later than
    *    retention re-counts as first delivery (the q86 watermarked-
    *    dedup contract, and the WAL's own guarantee);
    *  - REPLAY-IDEMPOTENT: every store dedups at read (ledger by
    *    seq, counts max-per-(batch, shard), late by pair), so
    *    checkpoint replays and compaction crash windows degrade to
    *    duplicate rows the read collapses.
    * Final assembly mirrors q192 row-for-row (left join onto
    * range(shards); a silent shard is an all-zero row). */
  def streamWalIntegrity(s: SparkSession, dir: String, shards: Int = 8,
      rangeSize: Long = 1L << 20, compactEvery: Int = 4,
      retentionUs: Long = Long.MaxValue): DataFrame = {
    val stage = stagingRoot("q195", dir)
    val walDir = s"$stage/wal"; val ckpt = s"$stage/ckpt"
    val stateRoot = s"$stage/state"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(stateRoot))
    WalSource.writeWalJson(WalSource.eventsAsWal(s, dir), walDir, batches = 8)
    val raw = WalSource.streamV2(s, walDir, maxFilesPerTrigger = 2)
      .select(col("seq"), col("ts"))
    runAdaptive(s, stage,
      raw.writeStream
      .foreachBatch { (df: DataFrame, id: Long) =>
        walLedgerBatch(s, stateRoot, df, id, shards, rangeSize,
          compactEvery, retentionUs)
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()))
    walStateReport(s, stateRoot, shards)
  }

  /** Assemble the q192-shaped audit from the q195 state stores (base
    * ∪ delta, read-side dedup). */
  private[graft] def walStateReport(s: SparkSession, stateRoot: String,
      shards: Int): DataFrame = {
    val ledger = readStoreAll(s, stateRoot, "ledger")
      .map(_.groupBy(col("seq")).agg(min(col("ts")).as("ts")))
      .getOrElse(s.range(0).select(col("id").as("seq"), col("id").as("ts")))
    val stats = ledger.groupBy((col("seq") % shards).as("shard"))
      .agg(count(lit(1)).as("n_ids"),
        min(col("seq")).as("min_id"), max(col("seq")).as("max_id"))
    val nRows = readStoreAll(s, stateRoot, "counts")
      .getOrElse(s.range(0).select(col("id").as("batch"), col("id").as("shard"),
        col("id").as("n")))
      .groupBy(col("batch"), col("shard")).agg(max(col("n")).as("n"))
      .groupBy(col("shard")).agg(sum(col("n")).as("n_rows"))
    val late = readStoreAll(s, stateRoot, "late")
      .getOrElse(s.range(0).select(col("id").as("pair_seq")))
      .distinct()
      .groupBy((col("pair_seq") % shards).as("shard"))
      .agg(count(lit(1)).as("n_late"))
    s.range(shards).select(col("id").as("shard"))
      .join(nRows, Seq("shard"), "left")
      .join(stats, Seq("shard"), "left")
      .join(late, Seq("shard"), "left")
      .select(col("shard"),
        coalesce(col("n_rows"), lit(0L)).as("n_rows"),
        coalesce(col("n_ids"), lit(0L)).as("n_ids"),
        col("min_id"), col("max_id"),
        expr(s"(max_id - min_id) div $shards + 1 - n_ids").as("n_gaps"),
        coalesce(col("n_rows") - col("n_ids"), lit(0L)).as("n_dups"),
        coalesce(col("n_late"), lit(0L)).as("n_late"))
  }

  /** q247: STREAMING AS-OF JOIN under the oracle gate — last-click
    * attribution live ([[graft.streaming.AsOfStream]]): every
    * purchase mutation is attributed to the latest click at-or-before
    * it for the same rowkey, the backward AsOf.join (q62 semantics,
    * (ts, id)-max tiebreak) that Spark's built-in stream-stream joins
    * cannot express ("latest match" is an aggregation over the match
    * set). Clicks+purchases staged as an event-time-ordered WAL with
    * a delay-0 watermark; per-user state is an order-invariant set
    * union, watermark-compacted each batch (purchases below the
    * horizon finalize and evict; older clicks collapse to their
    * single max survivor — state O(watermark window), independent of
    * stream lifetime). Update-mode emissions append to the sink;
    * the last emission per purchase_id is final and must equal the
    * batch as-of join row-for-row (the oracle — same replay bar as
    * q53/q95/q230). */
  def streamAsofAttribution(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val stage = stagingRoot("q247", dir)
    val walDir = s"$stage/wal"; val ckpt = s"$stage/ckpt"; val out = s"$stage/out"
    val subset = WalSource.eventsAsWal(s, dir)
      .filter(col("cells")(0)("kind") === "put" &&
        col("cells")(0)("qualifier").isin("click", "purchase"))
    WalSource.writeWalJson(subset, walDir, batches = 6)
    val evs = WalSource.streamV2(s, walDir, maxFilesPerTrigger = 2)
      .select(col("rowkey").as("user"),
        col("cells")(0)("qualifier").as("kind"),
        col("ts"), col("seq").as("id"))
      .withColumn("event_time", timestamp_micros(col("ts")))
      .withWatermark("event_time", "0 seconds")
      .as[graft.streaming.AsOfStream.Ev]
    runAdaptive(s, stage,
      graft.streaming.AsOfStream.track(s, evs).writeStream
      .foreachBatch {
        (df: Dataset[graft.streaming.AsOfStream.Out], id: Long) =>
          df.withColumn("batch", lit(id)).write.mode("append").parquet(out)
      }
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()))
    s.read.parquet(out)
      .groupBy(col("purchase_id"))
      .agg(max_by(struct(col("user_id"), col("purchase_ts"),
        col("click_id"), col("click_ts")), col("batch")).as("st"))
      .select(col("st.user_id").cast("long").as("user_id"),
        col("purchase_id"), col("st.purchase_ts").as("purchase_ts"),
        when(col("st.click_id") >= 0, col("st.click_id")).as("click_id"),
        when(col("st.click_ts") >= 0, col("st.click_ts")).as("click_ts"))
  }

  /** q252: STREAMING RATE-SPIKE monitor under the oracle gate —
    * q163's hourly traffic alarm run LIVE
    * ([[graft.streaming.RateMonitor]]): each present hour finalizes
    * exactly once when the event-time watermark closes it (its count
    * is complete by the watermark contract) and is judged against
    * the trailing 24 PRESENT hours with the same all-integer
    * n·24e6 div Σ ratio — the alarm fires when the hour closes, not
    * when tomorrow's batch runs. State per series is O(25 + open
    * hours); an EventTimeTimeout wake-up lets hours from the final
    * data batch finalize on the trailing no-data batch. The stream's
    * LAST present hour can never finalize (no later event pushes the
    * watermark past it) — the oracle mirrors that honest append-mode
    * edge (h < max hour; the q121 precedent) and is otherwise
    * q163's exact hourly relation. */
  def streamRateSpikes(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val stage = stagingRoot("q252", dir)
    val walDir = s"$stage/wal"; val ckpt = s"$stage/ckpt"; val out = s"$stage/out"
    WalSource.writeWalJson(WalSource.eventsAsWal(s, dir), walDir, batches = 6)
    val evs = WalSource.streamV2(s, walDir, maxFilesPerTrigger = 2)
      .select(lit("events").as("series"), col("ts"))
      .withColumn("event_time", timestamp_micros(col("ts")))
      .withWatermark("event_time", "0 seconds")
      .as[graft.streaming.RateMonitor.Ev]
    runAdaptive(s, stage,
      graft.streaming.RateMonitor.track(s, evs).writeStream
      .foreachBatch {
        (df: Dataset[graft.streaming.RateMonitor.RateOut], id: Long) =>
          df.write.mode("append").parquet(out)
      }
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()))
    // finalize-once emissions; distinct absorbs checkpoint-replay
    // duplicates (values are deterministic per hour)
    s.read.parquet(out)
      .select(col("h"), col("n"), col("s24"), col("ratio_ppm"),
        when(col("spike"), 1L).otherwise(0L).as("spike"))
      .distinct()
  }

  /** q364: STREAMING PSI DRIFT monitor (round-12) — q176's
    * population-stability index maintained as LIVE STATE: the events
    * WAL streams through the DSv2 source; an update-mode (side, bin)
    * count aggregation holds the value-band histogram of everything
    * that ever streamed (reference side = even user ids, current =
    * odd — the deterministic split both engines replay); the final
    * read-out computes PSI between the two histograms with the q176
    * conventions (+1-smoothed integer ppm proportions, one fixed
    * IEEE log per BOUNDED bin row, round 6). State is |sides|·|bins|
    * counters — constant, forever, the live drift-dashboard shape
    * (q222/q284 are the batch snapshots; this is the monitor a
    * 100 TB ingest keeps running). Gate: final streamed histogram ≡
    * the batch histogram of the same split, so the PSI table equals
    * the batch computation row for row. */
  def streamPsi(s: SparkSession, dir: String, nb: Int = 12): DataFrame = {
    val stage = stagingRoot("q364", dir)
    val walDir = s"$stage/wal"; val ckpt = s"$stage/ckpt"
    val out = s"$stage/out"
    WalSource.writeWalJson(WalSource.eventsAsWal(s, dir), walDir, batches = 6)
    val binned = WalSource.streamV2(s, walDir, maxFilesPerTrigger = 2)
      .select(expr("cast(rowkey as bigint) % 2").as("side"),
        least(expr(
          "cast(round(cast(cells[0].value as double) * 100) as bigint)" +
            " div 2000"), lit(nb - 1L)).as("bin"))
      .groupBy(col("side"), col("bin")).agg(count(lit(1)).as("n"))
    runAdaptive(s, stage,
      binned.writeStream
      .foreachBatch { (df: DataFrame, id: Long) =>
        df.withColumn("batch", lit(id)).write.mode("append").parquet(out)
      }
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()))
    val hist = s.read.parquet(out)
      .groupBy(col("side"), col("bin"))
      .agg(max_by(col("n"), col("batch")).as("n"))
    val bins = s.range(nb).select(col("id").as("bin"))
    val joined = bins
      .join(hist.filter(col("side") === 0)
        .select(col("bin"), col("n").as("n_ref")), Seq("bin"), "left")
      .join(hist.filter(col("side") === 1)
        .select(col("bin"), col("n").as("n_cur")), Seq("bin"), "left")
      .select(col("bin"), coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    val totals = joined.agg(sum(col("n_ref")).as("tot_ref"),
      sum(col("n_cur")).as("tot_cur"))
    joined.crossJoin(broadcast(totals))
      .select(col("bin"), col("n_ref"), col("n_cur"),
        expr(s"(n_ref + 1) * 1000000 div (tot_ref + $nb)").as("pa_ppm"),
        expr(s"(n_cur + 1) * 1000000 div (tot_cur + $nb)").as("pb_ppm"))
      .withColumn("psi_contrib",
        round((col("pa_ppm") - col("pb_ppm")).cast("double") / 1e6
          * log(col("pa_ppm").cast("double") / col("pb_ppm")), 6))
  }

  /** q369: STREAMING MISRA–GRIES heavy hitters (round-12) — q368's
    * frequency sketch as live per-key streaming STATE (the q340
    * treatment applied to the frequency domain): the events WAL
    * streams through the DSv2 source into a per-qualifier update-
    * mode [[graft.functions.MisraGriesAgg]] aggregation — k = 32
    * counter slots per event type, forever, whatever streams — and
    * the final state is audited against the exact per-type top-3
    * values: est ≤ true ≤ est + d and guaranteed presence when
    * true > d, theorems for every micro-batch/merge order (the
    * q331/q340 gating argument). The per-type sketch collect is
    * metadata-sized; exact counts come from one bounded
    * (type × cents) agg with a rank over that bounded frame. */
  def streamHeavyHitters(s: SparkSession, dir: String, k: Int = 32,
      top: Int = 3): DataFrame = {
    import graft.functions.{MisraGriesAgg, MgSketch}
    val stage = stagingRoot("q369", dir)
    val walDir = s"$stage/wal"; val ckpt = s"$stage/ckpt"
    val out = s"$stage/out"
    WalSource.writeWalJson(WalSource.eventsAsWal(s, dir), walDir, batches = 6)
    val mg = udaf(new MisraGriesAgg(k))
    val sketches = WalSource.streamV2(s, walDir, maxFilesPerTrigger = 2)
      .select(col("cells")(0)("qualifier").as("qualifier"),
        expr("cast(round(cast(cells[0].value as double) * 100) as bigint)")
          .as("c"))
      .groupBy(col("qualifier"))
      .agg(mg(col("c")).as("sk"))
    runAdaptive(s, stage,
      sketches.writeStream
      .foreachBatch { (df: DataFrame, id: Long) =>
        df.withColumn("batch", lit(id)).write.mode("append").parquet(out)
      }
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()))
    // metadata-sized: one sketch row per event type
    val fin = s.read.parquet(out)
      .groupBy(col("qualifier"))
      .agg(max_by(col("sk"), col("batch")).as("sk"))
      .collect()
      .map { r =>
        val skr = r.getStruct(r.fieldIndex("sk"))
        r.getAs[String]("qualifier") -> MgSketch(
          skr.getSeq[Long](skr.fieldIndex("keys")).toVector,
          skr.getSeq[Long](skr.fieldIndex("counts")).toVector,
          skr.getAs[Long]("d"), skr.getAs[Long]("n"))
      }.toMap
    import org.apache.spark.sql.expressions.Window
    val exact = graft.Tables.events(s, dir)
      .select(col("event_type").as("qualifier"),
        expr("cast(round(value * 100) as bigint)").as("c"))
      .groupBy(col("qualifier"), col("c")).agg(count(lit(1)).as("cnt"))
      .withColumn("rk", row_number().over(Window.partitionBy(col("qualifier"))
        .orderBy(col("cnt").desc, col("c"))))
      .filter(col("rk") <= top)
      .collect() // metadata-sized: |types| * top rows
    import s.implicits._
    val rows = exact.toSeq.map { r =>
      val q = r.getAs[String]("qualifier")
      val c = r.getAs[Long]("c"); val cnt = r.getAs[Long]("cnt")
      val skq = fin(q)
      val est = skq.estimate(c)
      (q, c, cnt,
        if (est <= cnt && cnt <= est + skq.d) 1L else 0L,
        if (cnt <= skq.d || est > 0L) 1L else 0L)
    }
    rows.toDF("qualifier", "c", "cnt", "within_bound", "present_ok")
  }

  /** q443: STREAMING PAGE–HINKLEY monitor (the q364/q369 live-state
    * treatment for q442's drift detector) — the events WAL streams
    * through the DSv2 source into an update-mode hourly-count
    * aggregation (state = |hours| counters, the q252 histogram
    * shape); each micro-batch appends the hours it updated with its
    * batch id, the read keeps each hour's LATEST count (max_by on
    * batch — replay rewrites identical rows), and the UNCHANGED
    * q442 sequential scan runs over the maintained series. Gate =
    * the q442 oracle verbatim: the streamed hourly histogram must
    * land exactly the batch one, so the PH trajectory is equal row
    * for row. The 100 TB shape: the drift monitor's state is the
    * bounded hour grid, never the event stream. */
  def streamPageHinkley(s: SparkSession, dir: String,
      lambda: Long = 50L): DataFrame = {
    val stage = stagingRoot("q443", dir)
    val walDir = s"$stage/wal"; val ckpt = s"$stage/ckpt"
    val out = s"$stage/out"
    WalSource.writeWalJson(WalSource.eventsAsWal(s, dir), walDir,
      batches = 6)
    val hourly = WalSource.streamV2(s, walDir, maxFilesPerTrigger = 2)
      .select(expr("ts div 3600000000").as("h"))
      .groupBy(col("h")).agg(count(lit(1)).as("x"))
    runAdaptive(s, stage,
      hourly.writeStream
      .foreachBatch { (df: DataFrame, id: Long) =>
        df.withColumn("batch", lit(id)).write.mode("append").parquet(out)
      }
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()))
    Events.pageHinkleyOf(
      s.read.parquet(out).groupBy(col("h"))
        .agg(max_by(col("x"), col("batch")).as("x")),
      lambda)
  }

  /** q447: STREAMING GUMBEL TAIL — q439's block-maxima EVT fit
    * maintained as LIVE STATE (the q443 treatment for the extremes
    * domain): the events WAL streams into an update-mode per
    * (event_type, hour) MAX aggregation — the block-maxima grid,
    * bounded by types·hours, never the event stream — each batch
    * appends the blocks it raised, the read keeps each block's
    * latest max (max_by on batch; a max only grows, and replay
    * rewrites identical rows), and the UNCHANGED q439 moment/
    * literal chain prices the tail. Gate = the q439 oracle
    * verbatim: the capacity planner's return level updates as data
    * lands, no archive rescan. */
  /** q452: STREAMING THEIL CONCENTRATION MONITOR (round-15, VERDICT
    * Next #7) — q451's per-type traffic-concentration number as LIVE
    * per-source state, the q364-PSI treatment: the events WAL
    * streams into an update-mode (event_type, hour) count — the
    * q451 grid itself, bounded by types · hours forever, never the
    * event stream — each batch appends the grid cells it raised,
    * the read keeps each cell's latest count (max_by on batch; a
    * count only grows under AvailableNow replay, and a replayed
    * batch rewrites identical rows), and the UNCHANGED q451
    * concentration core prices the read-out. Gate = the q451 oracle
    * verbatim: the inequality dashboard updates as data lands, no
    * archive rescan. */
  def streamTheil(s: SparkSession, dir: String): DataFrame = {
    val stage = stagingRoot("q452", dir)
    val walDir = s"$stage/wal"; val ckpt = s"$stage/ckpt"
    val out = s"$stage/out"
    WalSource.writeWalJson(WalSource.eventsAsWal(s, dir), walDir,
      batches = 6)
    val cells = WalSource.streamV2(s, walDir, maxFilesPerTrigger = 2)
      .select(col("cells")(0)("qualifier").as("event_type"),
        expr("ts div 3600000000").as("h"))
      .groupBy(col("event_type"), col("h"))
      .agg(count(lit(1)).as("x"))
    runAdaptive(s, stage,
      cells.writeStream
      .foreachBatch { (df: DataFrame, id: Long) =>
        df.withColumn("batch", lit(id)).write.mode("append").parquet(out)
      }
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()))
    Events.theilHoursOf(
      s.read.parquet(out).groupBy(col("event_type"), col("h"))
        .agg(max_by(col("x"), col("batch")).as("x")))
  }

  /** q471: STREAMING SALT-BALANCE MONITOR (round-15) — q453's
    * write-path audit as LIVE state: the SEP lineage's hot-region
    * question ("is one region server taking the write burst RIGHT
    * NOW") answered continuously. The events WAL streams into an
    * update-mode (salt, hour) count — the q453 grid itself, bounded
    * by S · hours forever — each batch appends the cells it raised,
    * the read keeps each cell's latest count (max_by on batch;
    * counts only grow under AvailableNow replay), and the UNCHANGED
    * q453 report tail prices the read-out. Gate = the q453 oracle
    * verbatim. */
  def streamSaltAudit(s: SparkSession, dir: String,
      salts: Int = 16): DataFrame = {
    val stage = stagingRoot("q471", dir)
    val walDir = s"$stage/wal"; val ckpt = s"$stage/ckpt"
    val out = s"$stage/out"
    WalSource.writeWalJson(WalSource.eventsAsWal(s, dir), walDir,
      batches = 6)
    val cells = WalSource.streamV2(s, walDir, maxFilesPerTrigger = 2)
      .select(pmod(col("rowkey").cast("long"), lit(salts.toLong))
          .as("salt"),
        expr("ts div 3600000000").as("h"))
      .groupBy(col("salt"), col("h"))
      .agg(count(lit(1)).as("n"))
    runAdaptive(s, stage,
      cells.writeStream
      .foreachBatch { (df: DataFrame, id: Long) =>
        df.withColumn("batch", lit(id)).write.mode("append").parquet(out)
      }
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()))
    Bucketing.saltAuditFromCells(
      s.read.parquet(out).groupBy(col("salt"), col("h"))
        .agg(max_by(col("n"), col("batch")).as("n")),
      salts)
  }

  def streamGumbelTail(s: SparkSession, dir: String): DataFrame = {
    val stage = stagingRoot("q447", dir)
    val walDir = s"$stage/wal"; val ckpt = s"$stage/ckpt"
    val out = s"$stage/out"
    WalSource.writeWalJson(WalSource.eventsAsWal(s, dir), walDir,
      batches = 6)
    val blocks = WalSource.streamV2(s, walDir, maxFilesPerTrigger = 2)
      .select(col("cells")(0)("qualifier").as("event_type"),
        expr("ts div 3600000000").as("h"),
        expr("cast(round(cast(cells[0].value as double) * 1000)" +
          " as bigint)").as("vm"))
      .groupBy(col("event_type"), col("h"))
      .agg(max(col("vm")).as("m"))
    runAdaptive(s, stage,
      blocks.writeStream
      .foreachBatch { (df: DataFrame, id: Long) =>
        df.withColumn("batch", lit(id)).write.mode("append").parquet(out)
      }
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()))
    Events.gumbelTailOf(
      s.read.parquet(out).groupBy(col("event_type"), col("h"))
        .agg(max_by(col("m"), col("batch")).as("m")))
  }

  // ---------------------------------------------------------------
  // q480: STREAMING INCREMENTAL PAGERANK (round-17, VERDICT Next
  // #6) — q476's batch-form delta maintenance in its operational
  // 100 TB shape: the WAL delivers the daily edge delta and
  // foreachBatch splices scores through Relational.spliceRounds.
  // State = ONE versioned store holding both the cumulative edge
  // set and every per-round score frame (rows tagged kind='e'/'s'),
  // so each batch's publish is a SINGLE atomic pointer swap — a
  // crash can never leave edges and score history at different
  // versions, and a checkpoint-replayed batch hits spliceRounds'
  // fixed point (edges already present → splice ≡ stored history).
  // Gate = stream ≡ batch: after the stream drains, the round-
  // `iters` frame must equal the FULL q450 recompute on the whole
  // graph — the oracle is copurchasePageRankOracle verbatim (the
  // q452/q471 discipline).
  // ---------------------------------------------------------------

  /** The q480 state frame: cumulative edges (kind 'e') ∪ per-round
    * score frames (kind 's', round 0..iters) in one schema. */
  private def prStateOf(edges: DataFrame,
      rounds: Seq[DataFrame]): DataFrame =
    edges.select(lit("e").as("kind"), lit(-1L).as("round"),
        col("pa").as("a"), col("pb").as("b"))
      .unionByName(rounds.zipWithIndex.map { case (f, r) =>
        f.select(lit("s").as("kind"), lit(r.toLong).as("round"),
          col("v").as("a"), col("s").as("b"))
      }.reduce(_ unionByName _))

  /** Publish the initial graph + its full per-round PageRank
    * history as state version 0. */
  private[graft] def initIncrementalPageRank(s: SparkSession,
      stateRoot: String, init: DataFrame, iters: Int): Unit =
    publishStore(s, stateRoot, "prstate",
      prStateOf(init.localCheckpoint(),
        graft.operators.Dedup.pageRankRounds(
          Relational.symEdges(init), iters)),
      Seq.empty)

  /** ONE micro-batch of the q480 protocol (factored so Round17Spec
    * can drive batches directly — replay a batch, check the fixed
    * point): read state, fold the batch's edges in, splice the
    * per-round history on the delta frontier, publish the new state
    * atomically. Per-batch compute is O(edges into the frontier)
    * (the q476 bound), never a full recompute. */
  private[graft] def incrementalPageRankBatch(s: SparkSession,
      stateRoot: String, batch: DataFrame, iters: Int): Unit = {
    val st = s.read.parquet(storeBaseDir(stateRoot, "prstate").get)
    val edges = st.filter(col("kind") === "e")
      .select(col("a").as("pa"), col("b").as("pb")).localCheckpoint()
    val hist = (0 to iters).map(r =>
      st.filter(col("kind") === "s" && col("round") === r)
        .select(col("a").as("v"), col("b").as("s")).localCheckpoint())
    val bE = batch.select(col("pa"), col("pb")).distinct()
      .localCheckpoint()
    val newEdges = edges.unionByName(bE).distinct().localCheckpoint()
    val adjNew = Relational.symEdges(newEdges).localCheckpoint()
    val deltaVerts = bE.select(col("pa").as("v"))
      .union(bE.select(col("pb").as("v")))
    val spliced = Relational.spliceRounds(hist, adjNew, deltaVerts, iters)
    publishStore(s, stateRoot, "prstate",
      prStateOf(newEdges, spliced), Seq.empty)
  }

  /** q480: the gated query — stage the initial ~85% co-purchase
    * graph with its round history, stream the 3 held-out edge
    * slices as a JSONL delta feed (maxFilesPerTrigger = 1 → one
    * slice per micro-batch), splice per batch, and read the final
    * round-`iters` frame. Output (part, score_scaled) must equal
    * q450 on the COMPLETE graph however the delta was batched or
    * replayed. */
  def streamIncrementalPageRank(s: SparkSession, dir: String,
      iters: Int = 5): DataFrame = {
    val stage = stagingRoot("q480", dir)
    val stateRoot = s"$stage/state"
    val inDir = s"$stage/in"; val ckpt = s"$stage/ckpt"
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(stateRoot))
    val edges = Relational.copurchaseEdges(s, dir).localCheckpoint()
    val slice = (col("pa") * 31 + col("pb")) % 20
    initIncrementalPageRank(s, stateRoot, edges.filter(slice >= 3), iters)
    edges.filter(slice < 3).withColumn("sl", slice)
      .repartitionByRange(3, col("sl"))
      .select(col("pa"), col("pb")).toJSON
      .write.mode("overwrite").text(inDir)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("pa",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("pb",
        org.apache.spark.sql.types.LongType)))
    runAdaptive(s, stage,
      s.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(inDir)
      .writeStream
      .foreachBatch { (df: DataFrame, _: Long) =>
        incrementalPageRankBatch(s, stateRoot, df, iters)
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()))
    s.read.parquet(storeBaseDir(stateRoot, "prstate").get)
      .filter(col("kind") === "s" && col("round") === iters)
      .select(col("a").as("part"), col("b").as("score_scaled"))
  }
}
