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

  def main(args: Array[String]): Unit = {
    cleanStaleTmp()
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
    // untimed warm-up pass: session/codegen/JIT + page-cache warm-up
    gated.foreach { case (_, fn) =>
      try run(fn) catch { case _: Throwable => () }
      unloadState()
    }
    // a failed query records -1.0 (sentinel) — its time-to-failure
    // must not read as a fast success in the BENCH json
    val results = gated.map { case (name, fn) =>
      System.gc() // drain cross-query garbage so timings don't bleed
      val t0 = System.nanoTime()
      val ok = try { run(fn); true } catch { case _: Throwable => false }
      val t = (System.nanoTime() - t0) / 1e9
      unloadState()
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
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
