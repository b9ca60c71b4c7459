package graft
import org.apache.spark.sql.SparkSession
object Bench {

  /** Remove stale graft-owned artifacts from java.io.tmpdir BEFORE
    * timing anything. Round-12 root cause: ~2,500 accumulated
    * spec/stage/checkpoint tmpdirs from prior verify/test runs
    * degraded the streaming gates 2x+ (state-store directory scans
    * and file-listing slow down with a polluted tmp); runs 1-3 of
    * that round's idle sweep were contaminated. Only names with
    * graft-owned prefixes are touched — the staged layouts the
    * warm-up pass needs are rebuilt by the queries themselves. */
  private[graft] def cleanStaleTmp(): Unit = {
    val tmp = java.nio.file.Paths.get(sys.props("java.io.tmpdir"))
    val owned = Seq("graft-", "graft_", "spec_q")
    // Age guard: only entries last modified BEFORE this JVM started
    // are stale by construction. A concurrently running test/verify
    // JVM keeps touching its live staging dirs, so its entries are
    // younger than our start time and survive the sweep.
    val jvmStartMs =
      java.lang.management.ManagementFactory.getRuntimeMXBean.getStartTime
    def staleOwned(p: java.nio.file.Path): Boolean =
      owned.exists(p.getFileName.toString.startsWith) && {
        try java.nio.file.Files.getLastModifiedTime(p).toMillis < jvmStartMs
        catch { case _: java.io.IOException => false }
      }
    val entries = java.nio.file.Files.list(tmp)
    try entries.iterator().forEachRemaining { p =>
      if (staleOwned(p)) {
        val walk =
          try java.nio.file.Files.walk(p)
          catch { case _: java.io.IOException => null }
        if (walk != null)
          try walk
            .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
            .forEach { f =>
              try java.nio.file.Files.delete(f)
              catch { case _: java.io.IOException => () }
            }
          finally walk.close()
      }
    } finally entries.close()
  }

  /** (1m, 5m, 15m) load averages from /proc/loadavg — recorded into
    * the bench JSON so drift analyses can cite measured host
    * contention instead of narrating it (round-15 lesson: the driver
    * sweep timed out under contention the artifacts couldn't prove). */
  private[graft] def loadAvg(): Seq[Double] = try {
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/proc/loadavg")), "UTF-8")
      .split("\\s+").take(3).toSeq.map(_.toDouble)
  } catch { case _: Throwable => Seq(-1.0, -1.0, -1.0) }

  def main(args: Array[String]): Unit = {
    cleanStaleTmp()
    val loadBefore = loadAvg()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // Streaming-gate variance mechanism (StreamVarianceProbe r8,
      // root-caused fully in r14): after a gate's query terminates,
      // its HDFS-backed state-store providers stay loaded in-JVM
      // until the maintenance pass notices — retained state from
      // PRIOR entries stacks heap/GC pressure into whichever entries
      // follow. The r8 fix (maintenanceInterval = 5s) traded that
      // for a NEW drift: any gate whose own runtime exceeds 5 s
      // takes maintenance snapshot passes MID-QUERY (q299 measured
      // 13.5-21.7 s at 5s vs 8.8-9.7 s at 60s, 4 isolated reps
      // each — see StateStoreHooks). Keep the default interval and
      // instead unload retained providers DETERMINISTICALLY between
      // entries (StateStoreHooks.unloadAll() after each run below).
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Timed action = noop-sink write: every output column is fully
    // evaluated and serialized (a count() lets Catalyst prune the
    // projections/aggregates it doesn't need, under-timing
    // expression-heavy queries).
    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    // Drop state-store providers the finished query retained so they
    // can't bleed maintenance/GC work into the NEXT entry (the r8
    // pollution mechanism, now handled without the 5s
    // mid-query-maintenance side effect — see StateStoreHooks).
    // Called OUTSIDE the timed region: the unload is inter-entry
    // housekeeping, not part of any query's cost.
    def unloadState(): Unit =
      org.apache.spark.sql.graft.StateStoreHooks.unloadAll()
    // Dev-only subset filter (regex on query name), mirroring
    // Verify's: the driver never sets it, so the published bench
    // always covers the full inventory. A subset run also skips the
    // x_* contrast blocks.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.r)
    def selected(name: String): Boolean =
      only.forall(_.findFirstIn(name).isDefined)
    val gated = SparkEntry.queries.filter(kv => selected(kv._1))
    // Warm-up policy (round-16 change, prompted by the driver's r15
    // rc=124 timeout): the old per-entry untimed warm-up pass doubled
    // the sweep's wall-clock by construction (~1800s clean, 2700s+
    // under host contention) for a benefit that is only JIT/codegen/
    // page-cache — every gate restages its own inputs per call
    // (stagingRoot wipes), so the warm-up never skipped real work.
    //   small (default): the same per-entry untimed warm-up pass,
    //     but run against the sf0.001 dataset (SPARK_GRAFT_WARM_DIR).
    //     Codegen sources, JIT paths, per-operator first-use init
    //     (state-store providers, micro-batch planner, codec seams)
    //     are all exercised identically — plan structure does not
    //     depend on data volume — while the warm-up's data cost
    //     collapses ~100x. Page cache for the TIMED dataset is warmed
    //     separately by a full pre-read of every input table. A/B
    //     measured r16 (16-entry subset, idle host): small-warm timed
    //     totals within ~3% of full-warm, at ~15% of the warm-up
    //     wall-clock — the fix for the driver's r15 rc=124 timeout.
    //   session: one untimed pass over 4 representative entries +
    //     the table pre-read (A/B r16: 2x WORSE timed totals — each
    //     stateful-operator flavor pays first-use init inside its
    //     timed run; kept for forensics).
    //   full: the pre-r16 behavior (per-entry warm-up at the timed
    //     SF — ~2x total wall-clock), kept for A/B forensics.
    //   none: no warm-up at all (dev-only, coldest numbers).
    val warmMode = sys.env.getOrElse("SPARK_GRAFT_WARMUP", "small")
    def preReadTables(): Unit = Tables.all.foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet")
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    if (warmMode == "full") {
      gated.foreach { case (_, fn) =>
        try run(fn) catch { case _: Throwable => () }
        unloadState()
      }
    } else if (warmMode == "small") {
      val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR",
        "/root/testdata/sf0.001")
      gated.foreach { case (_, fn) =>
        try fn(spark, warmDir).write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () }
        unloadState()
      }
      preReadTables()
      // burn-in at the TIMED SF: tiered-JIT (C2) compilation of the
      // shared per-row hot loops (json WAL parse, unsafe-row state
      // ops, parquet scan) only triggers at real row counts — the
      // sf0.001 warm-up never reaches the backedge thresholds. Two
      // streaming gates (HDFS + RocksDB state providers) push those
      // loops to steady state before anything is timed.
      Seq("q53_wal_stream_materialize", "q100_rocksdb_materialize")
        .flatMap(SparkEntry.queries.get).foreach { fn =>
          try run(fn) catch { case _: Throwable => () }
          unloadState()
        }
    } else if (warmMode == "session") {
      preReadTables()
      // representative machinery warm-up (cheap entries only):
      // q01 agg pipeline, q82 shuffle/bucketed join, q42 WAL source +
      // sliding window state, q459 binary codec seam.
      Seq("q01_pricing_summary", "q82_bucketed_join",
          "q42_sliding_counts", "q459_bmp_decode")
        .flatMap(SparkEntry.queries.get).foreach { fn =>
          try run(fn) catch { case _: Throwable => () }
          unloadState()
        }
    }
    // Incremental partial artifact: after each timed entry the
    // results-so-far are flushed to bench_partial.json (tmp+rename)
    // so a driver-side timeout still leaves a parseable artifact of
    // everything that DID complete (r15's rc=124 left nothing).
    // Path is overridable (SPARK_GRAFT_PARTIAL) so two concurrent
    // sweeps — builder + judge — can't clobber each other's partials
    // in a shared cwd (round-16 ADVICE hygiene item).
    val partialName =
      sys.env.getOrElse("SPARK_GRAFT_PARTIAL", "bench_partial.json")
    val partialPath = java.nio.file.Paths.get(partialName)
    def flushPartial(done: Map[String, Double]): Unit = try {
      val qs = done.map { case (k, v) => s"\"" + k + "\":" + v }
        .mkString("{", ",", "}")
      val tmp = java.nio.file.Paths.get(partialName + ".tmp")
      java.nio.file.Files.write(tmp,
        s"""{"metric":"partial","value":${done.values.filter(_ >= 0).sum},"unit":"sec","queries":$qs,"sf":"$sfDir","n":${done.size}}"""
          .getBytes("UTF-8"))
      java.nio.file.Files.move(tmp, partialPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    } catch { case _: Throwable => () }
    // a failed query records -1.0 (sentinel) — its time-to-failure
    // must not read as a fast success in the BENCH json
    var acc = Map.empty[String, Double]
    val results = gated.map { case (name, fn) =>
      System.gc() // drain cross-query garbage so timings don't bleed
      val t0 = System.nanoTime()
      val ok = try { run(fn); true } catch { case _: Throwable => false }
      val t = (System.nanoTime() - t0) / 1e9
      unloadState()
      acc += name -> (if (ok) t else -1.0)
      flushPartial(acc)
      name -> (if (ok) t else -1.0)
    } ++ (if (only.isDefined) Map.empty[String, Double] else {
      // skew stress: every doc shares a hot boilerplate header, the
      // classic posting-list skew that kills a naive inverted index;
      // q21's prefix filter must stay near its unskewed time
      import org.apache.spark.sql.functions._
      val boiler = "breaking news update for subscribers of the premium daily channel " +
        "feed please share and subscribe for more updates from the editorial team"
      val skewed = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), concat(lit(boiler + " "), col("text")).as("text"))
      val t0 = System.nanoTime()
      val ok = try {
        graft.operators.Dedup.ngramJaccardOf(skewed, 0.5)
          .write.format("noop").mode("overwrite").save(); true
      } catch { case _: Throwable => false }
      Map("x_skew_boilerplate_jaccard" ->
        (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0))
    } ++ {
      // aggregation-skew pair: 10x-expanded events with half the rows
      // on one hot key; plain groupBy vs the salted two-phase plan on
      // the IDENTICAL input. Keeps the saltedAgg trade measured, not
      // assumed (Spark's map-side partial agg already absorbs
      // distributive-agg skew — see Skew.saltedHotKeyAgg notes).
      import org.apache.spark.sql.functions._
      val skewed = Tables.events(spark, sfDir)
        .select(col("event_id"), col("user_id"), col("value"),
          explode(sequence(lit(0), lit(9))).as("r"))
        .withColumn("skew_key",
          when(col("event_id") % 2 === 0, lit(-1L)).otherwise(col("user_id")))
      def time(df: => org.apache.spark.sql.DataFrame): Double = {
        System.gc()
        val t0 = System.nanoTime()
        try { df.write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        } catch { case _: Throwable => -1.0 }
      }
      val plain = time(skewed.groupBy(col("skew_key"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("sv"),
          max(col("value")).as("mv")))
      val salted = time(graft.operators.Skew.saltedAgg(skewed, col("skew_key"), 16,
        Seq(count(lit(1)).as("n"), sum(col("value")).as("sv"),
          max(col("value")).as("mv")),
        Seq(sum(col("n")).as("n"), sum(col("sv")).as("sv"),
          max(col("mv")).as("mv"))))
      Map("x_skew_agg_plain" -> plain, "x_skew_agg_salted" -> salted)
    } ++ {
      // runtime-filter pair: q137's selective join WITH the bloom
      // pre-filter vs the plain shuffle join on the IDENTICAL input —
      // the measured value of pruning probe rows before the shuffle
      import org.apache.spark.sql.functions._
      def time(df: => org.apache.spark.sql.DataFrame): Double = {
        System.gc()
        val t0 = System.nanoTime()
        try { df.write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        } catch { case _: Throwable => -1.0 }
      }
      val urgent = Tables.orders(spark, sfDir)
        .filter(col("o_orderpriority") === "1-URGENT").select(col("o_orderkey"))
      val plain = time(Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey"),
          round(col("l_extendedprice") * 100).cast("long").as("cents"))
        .join(urgent.hint("shuffle_hash"), col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("n_joined"), sum(col("cents")).as("revenue_cents")))
      val filtered = time(graft.operators.Bucketing.bloomSemiJoin(spark, sfDir))
      Map("x_bloom_join_plain" -> plain, "x_bloom_join_filtered" -> filtered)
    })
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val loadAfter = loadAvg()
    def arr(xs: Seq[Double]) = xs.mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","warmup":"$warmMode","loadavg_before":${arr(loadBefore)},"loadavg_after":${arr(loadAfter)}}""")
    // Compact summary LAST: the round driver keeps only a 2000-char
    // stdout tail, and the full result line above is ~25 KB for 477
    // entries — structurally unparseable from the tail (16 rounds of
    // `parsed: null`). This second line is < 200 chars, so the tail
    // always ends with a parseable record (VERDICT r16 Next #3).
    val failedN = results.values.count(_ < 0)
    println(s"""{"metric":"total","value":$total,"unit":"sec","n":${results.size},"failed":$failedN,"sf":"$sfDir","warmup":"$warmMode"}""")
    spark.stop()
  }
}
