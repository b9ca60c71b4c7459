package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Event-stream / CDC operators (SURVEY §2.B) — the batch form of the
  * reference SEP semantics: changelog compaction (latest-cell-wins),
  * tombstones, payload extraction, windows, sessions, as-of lookups.
  *
  * Scale notes: compaction uses `max_by` under hash aggregation
  * (map-side partial agg, one shuffle of one row per key) rather than
  * a window sort — on 100 TB of events the window formulation would
  * full-sort every partition; max_by moves |keys| rows.
  */
object Events {

  /** Changelog compaction: latest row per key by (ordCols) — the
    * HBase latest-cell-wins row view of an event stream. */
  def latestByKey(df: DataFrame, key: String, ordCols: Seq[String],
      payloadCols: Seq[String]): DataFrame =
    df.groupBy(col(key))
      .agg(max_by(struct(payloadCols.map(col): _*),
        struct(ordCols.map(col): _*)).as("__latest"))
      .select(col(key) +: payloadCols.map(c => col(s"__latest.$c")): _*)

  /** q12: latest event per user (compaction of the event changelog). */
  def latestState(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(max_by(
        struct(col("event_id"), col("event_type"), col("value"), col("ts")),
        struct(col("ts"), col("event_id"))).as("e"))
      .select(col("user_id"), col("e.event_id"), col("e.event_type"),
        col("e.value"), col("e.ts"))
  }

  /** q13: tumbling 1-hour event-time windows per event type. */
  def tumblingCounts(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir)
      .groupBy((col("ts") - col("ts") % 3600000000L).as("window_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
  }

  /** q14: session windows — 30-min inactivity gap, exact integer
    * microsecond arithmetic for oracle parity. */
  def sessionize(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("prev_us", lag(col("ts"), 1).over(w))
      .withColumn("new_s",
        when(col("prev_us").isNull ||
          col("ts") - col("prev_us") > 1800000000L, 1L).otherwise(0L))
      .groupBy(col("user_id"))
      .agg(sum(col("new_s")).as("n_sessions"), count(lit(1)).as("n_events"))
  }

  /** q15: SEP PayloadExtractor equivalent — pull the numeric payload
    * out of the props blob and aggregate it. */
  def payloadExtract(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir)
      .withColumn("k", regexp_extract(col("props"), "[0-9]+", 0).cast("long"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"),
        max(col("k")).as("max_k"),
        count(lit(1)).as("n"))
  }

  /** q16: ordered funnel — purchases after each user's first view. */
  def eventFunnel(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    Tables.events(s, dir)
      .withColumn("first_view",
        min(when(col("event_type") === "view", col("ts"))).over(w))
      .filter(col("first_view").isNotNull)
      .groupBy(col("user_id"), col("first_view"))
      .agg(count(when(col("event_type") === "purchase" &&
        col("ts") > col("first_view"), lit(1))).as("purchases_after_view"))
  }

  /** q17: as-of join — for each purchase, the latest click at or
    * before it by the same user. Implemented as a single ordered
    * window pass (no join, no range scan): on a cluster this is one
    * shuffle on user_id; a join formulation would be O(clicks ×
    * purchases) per key. */
  def asofJoin(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .withColumn("last_click_id",
        last(when(col("event_type") === "click", col("event_id")), ignoreNulls = true).over(w))
      .withColumn("last_click_ts",
        last(when(col("event_type") === "click", col("ts")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"), col("last_click_id"), col("last_click_ts"))
  }

  /** q18: upsert/merge — a delta batch of events merged over a base
    * snapshot (delta wins). Full-outer + coalesce is the merge plan;
    * at scale both sides are pre-compacted so the join moves one row
    * per key per side. */
  def upsertMerge(s: SparkSession, dir: String): DataFrame = {
    val cutoff = lit(1705708800000000L) // 2024-01-20T00:00:00Z in epoch-micros
    val ev = Tables.events(s, dir)
    def compact(df: DataFrame): DataFrame =
      df.groupBy(col("user_id"))
        .agg(max_by(
          struct(col("event_id"), col("event_type"), col("value"), col("ts")),
          struct(col("ts"), col("event_id"))).as("e"))
    val base = compact(ev.filter(col("ts") < cutoff))
      .select(col("user_id").as("b_user"), col("e").as("b"))
    val delta = compact(ev.filter(col("ts") >= cutoff))
      .select(col("user_id").as("d_user"), col("e").as("d"))
    base.join(delta, col("b_user") === col("d_user"), "full_outer")
      .select(
        coalesce(col("d_user"), col("b_user")).as("user_id"),
        coalesce(col("d.event_id"), col("b.event_id")).as("event_id"),
        coalesce(col("d.event_type"), col("b.event_type")).as("event_type"),
        coalesce(col("d.value"), col("b.value")).as("value"),
        coalesce(col("d.ts"), col("b.ts")).as("ts"))
  }

  /** q34: moment statistics per event type — mean/variance assembled
    * from distributive sums (one partial-agg pass; the textbook
    * two-pass formula would need two shuffles). */
  def valueStats(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value")).as("s"),
        sum(col("value") * col("value")).as("ss"))
      .select(col("event_type"), col("n"),
        round(col("s") / col("n"), 4).as("mean_value"),
        round((col("ss") - col("s") * col("s") / col("n")) / (col("n") - 1), 4)
          .as("var_value"))
  }

  /** q36: end-to-end CDC row materialization — events wrapped as WAL
    * mutations, compacted to latest-cell-wins row states by the batch
    * materializer (semantics == streaming path, proven equal in
    * RowMaterializerSpec). Output is all-scalar columns (qualifiers
    * joined to one string) so the driver's canonicalizer can sort it;
    * the oracle replays the same fold declaratively in SQL. */
  def rowMaterialize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wal = graft.sources.WalSource.eventsAsWal(s, dir)
    val muts = wal.as[graft.model.Mutation]
    graft.streaming.RowMaterializer.materializeBatch(s, muts)
      .toDF()
      .select(col("table"), col("rowkey"), col("version"), col("deleted"),
        array_join(array_sort(map_keys(col("cells"))), ",").as("qualifiers"))
  }

  /** q42: sliding event-time windows (1 h width, 15 min slide) —
    * each event expands to its 4 containing windows (explode is
    * codegen'd; the shuffle carries (window, partial agg) rows). */
  def slidingCounts(s: SparkSession, dir: String): DataFrame = {
    val slide = 900000000L // 15 min in micros
    Tables.events(s, dir)
      .select(col("ts"), col("value"), explode(sequence(lit(0L), lit(3L))).as("j"))
      .groupBy((col("ts") - col("ts") % slide - col("j") * slide).as("window_start"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
  }

  /** q43: pivot — per-user event-type count matrix (explicit pivot
    * values keep the schema static and the plan a single pass). */
  def pivotCounts(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"))
      .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
      .agg(count(lit(1)))
      .na.fill(0L)

  /** q44: first/last event per user via min_by/max_by under hash agg
    * (ties broken by event_id — same total order as the oracle). */
  def firstLast(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(
        min_by(col("event_type"), struct(col("ts"), col("event_id"))).as("first_type"),
        max_by(col("event_type"), struct(col("ts"), col("event_id"))).as("last_type"),
        count(lit(1)).as("n"))

  /** q51: weekly cohort retention — users bucketed by first-seen
    * week, counted per active week (exact integer week arithmetic).
    * Two aggs + one join; the cohort table is tiny and broadcast. */
  def cohortRetention(s: SparkSession, dir: String): DataFrame = {
    val week = 604800000000L // 7d in micros
    val ev = Tables.events(s, dir)
    val firstWeek = ev.groupBy(col("user_id"))
      .agg(expr(s"min(ts) div $week").as("cohort_week"))
    val activeWeeks = ev
      .select(col("user_id"), expr(s"ts div $week").as("week"))
      .distinct()
    activeWeeks.join(firstWeek, "user_id")
      .groupBy(col("cohort_week"), col("week"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  /** q19: tombstone handling — compact, then drop keys whose latest
    * event is a delete marker ('error' stands in for Delete cells). */
  def deleteTombstones(s: SparkSession, dir: String): DataFrame =
    latestState(s, dir).filter(col("event_type") =!= "error")

  /** q63: session ASSIGNMENT — q14 counts sessions; this labels every
    * event with its session ordinal (the sessionized event table a
    * downstream feature pipeline actually consumes). One shuffle on
    * user_id; the lag + running sum share the same window sort. */
  def sessionAssign(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("prev_us", lag(col("ts"), 1).over(w))
      .withColumn("new_s",
        when(col("prev_us").isNull ||
          col("ts") - col("prev_us") > 1800000000L, 1L).otherwise(0L))
      .withColumn("session_id",
        sum(col("new_s")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("user_id"), col("event_id"), col("ts"), col("session_id"))
  }

  /** q226: session BOUNCE-RATE report — the engagement headline over
    * q63's sessionization: per day, how many sessions, how many were
    * single-event bounces, and the mean session depth — the triple a
    * product dashboard pairs with q203's DAU (users can be active
    * daily AND bouncing — this is the report that tells them apart).
    * One per-user window pass (q63's sort, the only corpus shuffle)
    * folds to per-session rows (count + start ts), then ONE bounded
    * per-day agg; integer ppm/milli. A session belongs to the day
    * its FIRST event lands on (midnight-straddling sessions count
    * once — spec-pinned, not double-reported). */
  def bounceRate(s: SparkSession, dir: String): DataFrame =
    sessionAssign(s, dir)
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_ev"), min(col("ts")).as("start_ts"))
      .withColumn("day", expr("start_ts div 86400000000"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("n_ev") === 1L, 1L).otherwise(0L)).as("n_bounce"),
        sum(col("n_ev")).as("n_events"))
      .select(col("day"), col("n_sessions"), col("n_bounce"), col("n_events"),
        expr("n_bounce * 1000000 div n_sessions").as("bounce_ppm"),
        expr("n_events * 1000 div n_sessions").as("depth_milli"))

  /** q228: COHORT LTV curve — q51's retention matrix with revenue on
    * it: per (signup-week cohort, weeks-since-signup age), active
    * users, revenue, and the CUMULATIVE revenue per cohort member in
    * integer milli-cents — the "how much is a week-N user worth so
    * far" curve that prices acquisition against q206's survival.
    * Shape: one per-user agg pins each user's cohort week; one
    * shuffle-hash join tags events; ONE bounded (cohort, age) agg;
    * the cumulative window runs over the ≤|weeks|² cell table
    * partitioned by cohort — never over events. All-integer cents. */
  def cohortLtv(s: SparkSession, dir: String): DataFrame = {
    val perUser = Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(expr("min(ts div 604800000000)").as("cohort_week"))
    val cohortSize = perUser.groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("n_cohort_users"))
    val cells = Tables.events(s, dir)
      .join(perUser.hint("shuffle_hash"), "user_id")
      .withColumn("age_week",
        expr("ts div 604800000000") - col("cohort_week"))
      .groupBy(col("cohort_week"), col("age_week"))
      .agg(countDistinct(col("user_id")).as("n_active"),
        sum(when(col("event_type") === "purchase",
          round(col("value") * 100).cast("long")).otherwise(0L))
          .as("rev_cents"))
    val w = Window.partitionBy(col("cohort_week")).orderBy(col("age_week"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells.withColumn("cum_rev_cents", sum(col("rev_cents")).over(w))
      .join(broadcast(cohortSize), "cohort_week")
      .select(col("cohort_week"), col("age_week"), col("n_active"),
        col("n_cohort_users"), col("rev_cents"), col("cum_rev_cents"),
        expr("cum_rev_cents * 1000 div n_cohort_users")
          .as("ltv_millicents"))
  }

  /** q229: SEASONAL traffic PROFILE — the hour-of-day × day-of-week
    * event-rate heatmap (168 cells) capacity planning and the q191
    * seasonal-baseline monitors both read; DESCRIPTIVE where q191
    * is an alarm. dow is days-since-epoch mod 7 shifted so 0 =
    * Sunday (1970-01-01 was a Thursday); cells with no events are
    * REPORTED as zeros (a dead overnight window is the finding, not
    * a missing row) via a literal 168-row grid left-joined to the
    * one bounded agg. peak flags cells above 2× the mean cell rate
    * in exact integer arithmetic (n·168 > 2·total). */
  def seasonalProfile(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables.events(s, dir)
      .groupBy(expr("(ts div 86400000000 + 4) % 7").as("dow"),
        expr("(ts div 3600000000) % 24").as("hod"))
      .agg(count(lit(1)).as("n"))
    val grid = s.range(1)
      .select(explode(sequence(lit(0L), lit(6L))).as("dow"))
      .select(col("dow"), explode(sequence(lit(0L), lit(23L))).as("hod"))
    val total = counts.agg(sum(col("n")).as("n_total"))
    grid.join(counts, Seq("dow", "hod"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .crossJoin(broadcast(total))
      .select(col("dow"), col("hod"), col("n"),
        expr("n * 1000000 div n_total").as("share_ppm"),
        (col("n") * 168L > col("n_total") * 2L).as("peak"))
  }

  /** q142: TOP USER JOURNEYS — ordered event-type trigram counts
    * WITHIN sessions (the "top paths" report product analytics runs
    * on every funnel): q63's session assignment labels each event,
    * two lead()s on the (user, session) window extract each
    * length-3 path, one hash agg counts them. Output is bounded by
    * |types|³ (≤125 rows) at any corpus size; the only shuffles are
    * the per-user window sort (q63's — shared by the session and
    * lead windows, same key prefix) and the bounded count agg. */
  def sessionPaths(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val labelled = Tables.events(s, dir)
      .withColumn("prev_us", lag(col("ts"), 1).over(w))
      .withColumn("new_s",
        when(col("prev_us").isNull ||
          col("ts") - col("prev_us") > 1800000000L, 1L).otherwise(0L))
      .withColumn("session_id",
        sum(col("new_s")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val ws = Window.partitionBy(col("user_id"), col("session_id"))
      .orderBy(col("ts"), col("event_id"))
    labelled
      .withColumn("step2", lead(col("event_type"), 1).over(ws))
      .withColumn("step3", lead(col("event_type"), 2).over(ws))
      .filter(col("step2").isNotNull && col("step3").isNotNull)
      .groupBy(col("event_type").as("step1"), col("step2"), col("step3"))
      .agg(count(lit(1)).as("n"))
  }

  /** q79: inter-event gap statistics per user — the arrival-cadence
    * profile (mean/min/max gap) an ops dashboard and the sessionizer
    * threshold tuning both consume. Gaps from lag() on the per-key
    * window sort; exact integer microsecond math. */
  def eventGaps(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("gap", col("ts") - lag(col("ts"), 1).over(w))
      .filter(col("gap").isNotNull)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_gaps"),
        min(col("gap")).as("min_gap"),
        max(col("gap")).as("max_gap"),
        // exact integer sum then ONE division, UNROUNDED — the
        // quotient is bit-identical across engines, while round(x,4)
        // at 1e10 magnitude sits past double precision and the two
        // engines' rounding implementations disagree on ties
        (sum(col("gap")).cast("double") / count(lit(1))).as("avg_gap"))
  }

  /** q70: SCD2 / temporal-table view of the changelog — each event
    * becomes a validity interval [valid_from, valid_to) closed by the
    * key's next event (null = current). This is the full-history
    * complement of q12's latest-state compaction: the dimension table
    * a warehouse keeps for point-in-time joins. One shuffle per key,
    * lead() on the same window sort. */
  def scd2(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("value"), col("ts").as("valid_from"), col("valid_to"))
  }

  /** q71: time-travel snapshot — the latest-cell-wins row states as
    * of a fixed point in time (the as-of bound is applied to the
    * STORED nanos via [[Tables.eventsTsBounded]] so it reaches the
    * parquet row-group statistics — a predicate on the derived µs
    * column would scan the whole corpus; PlanSpec pins the pushed
    * filter), then q12's compaction runs on the survivors; this is
    * the CDC "snapshot read at T" every consumer replays. */
  def timeTravel(s: SparkSession, dir: String,
      asOfMicros: Long = 1705276800000000L): DataFrame = {
    Tables.eventsTsBounded(s, dir, maxMicros = Some(asOfMicros))
      .groupBy(col("user_id"))
      .agg(max_by(
        struct(col("event_id"), col("event_type"), col("value"), col("ts")),
        struct(col("ts"), col("event_id"))).as("e"))
      .select(col("user_id"), col("e.event_id"), col("e.event_type"),
        col("e.value"), col("e.ts"))
  }

  /** q134: time-series RESAMPLE + forward-fill — each user's
    * irregular event stream regularized onto an hourly grid with the
    * last observation carried forward (the feature-generation /
    * gap-fill step every downstream ML join wants a regular series
    * for). Grid = one row per (user, hour) across the user's own
    * [min, max] span (two-agg + sequence explode — never a window),
    * CLAMPED at `maxGridRows` points per user: `sequence` allocates
    * the whole grid as one in-memory array, so one user whose span
    * is years at a fine step would otherwise be a single-row memory
    * bomb no partitioning can split. A clamped user keeps the most
    * RECENT maxGridRows points (the feature-useful end of the
    * series) and every emitted row carries `truncated = true` — the
    * overflow is reported, never silent. The fill is the public
    * [[AsOf.join]] composition (union + one ordered window pass per
    * key, single shuffle) — NOT a per-grid-point lookup join, which
    * would be |grid| point queries. Hours before the user's first
    * event fill null (no fabricated data). Output size is
    * |users|·min(span/step, maxGridRows) — bounded by the grid knob,
    * not the event volume. */
  def resampleFfill(s: SparkSession, dir: String,
      stepMicros: Long = 3600000000L,
      maxGridRows: Long = 100000L): DataFrame = {
    val ev = Tables.events(s, dir)
    val grid = ev.groupBy(col("user_id"))
      .agg(min(col("ts")).as("mn"), max(col("ts")).as("mx"))
      .select(col("user_id"),
        expr(s"greatest(mn div $stepMicros, mx div $stepMicros - ${maxGridRows - 1}L)")
          .as("lo"),
        expr(s"mx div $stepMicros").as("hi"),
        expr(s"mn div $stepMicros < mx div $stepMicros - ${maxGridRows - 1}L")
          .as("truncated"))
      .select(col("user_id"),
        explode(sequence(col("lo"), col("hi"))).as("hb"),
        col("truncated"))
      .select(col("user_id"), (col("hb") * stepMicros).as("grid_ts"),
        col("truncated"))
    AsOf.join(grid,
      ev.select(col("user_id"), col("ts"), col("event_id"), col("value")),
      key = "user_id", leftTime = "grid_ts", rightTime = "ts",
      rightPayload = Seq("value", "event_id"),
      rightTiebreak = Some("event_id"))
  }

  /** q135: rolling event-time features — per (user, day): the
    * trailing-7-day event count and integer-cent revenue (the
    * RFM-style training features a behavioral model joins on). The
    * scale trick is PRE-AGGREGATION: events collapse to per-(user,
    * day) partials first (map-side combinable, one shuffle), and the
    * RANGE-framed window (rangeBetween −6..0 on the integer day)
    * slides over ≤ |days| rows per user — never over raw events, so
    * a 10⁹-event user costs the same window work as a 30-row one.
    * All-integer sums ⇒ exact parity. */
  def rollingFeatures(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(col("user_id"), expr("ts div 86400000000").as("day"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("cents"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rangeBetween(-6, 0)
    daily.select(col("user_id"), col("day"), col("n_events"), col("cents"),
      sum(col("n_events")).over(w).as("n_events_7d"),
      sum(col("cents")).over(w).as("cents_7d"))
  }

  /** q68: per-user activity anomaly — z-score of each user's event
    * count against the population, assembled from distributive sums
    * (one pass over users, stats broadcast back; the streaming-ops
    * monitoring primitive). */
  def userAnomaly(s: SparkSession, dir: String): DataFrame = {
    val u = Tables.events(s, dir).groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"))
    val stats = u.agg(count(lit(1)).as("c"), sum(col("n")).as("s"),
      sum(col("n") * col("n")).as("ss"))
    u.crossJoin(broadcast(stats))
      .withColumn("mean", col("s").cast("double") / col("c"))
      .withColumn("sd",
        sqrt((col("ss") - col("s") * col("s") / col("c")) / (col("c") - 1)))
      .withColumn("zr", (col("n") - col("mean")) / col("sd"))
      .select(col("user_id"), col("n"), round(col("zr"), 4).as("z"),
        (abs(col("zr")) >= 2.0).as("is_anomaly"))
  }

  /** q91: per-user event-type entropy — Shannon entropy (log2) of
    * each user's event-type distribution, the standard behavioral-
    * diversity feature (a bot hammering one endpoint scores ~0, an
    * organic user near log2(5)). Two hash aggregations, one shuffle
    * each, no window: H = log2(n) − Σ c·log2(c) / n folds the
    * per-type counts distributively. */
  def userEntropy(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("user_id"))
      .agg(sum(col("c")).as("n_events"),
        sum(col("c") * log2(col("c"))).as("slc"))
      .select(col("user_id"), col("n_events"),
        round(log2(col("n_events")) - col("slc") / col("n_events"), 4)
          .as("entropy"))

  /** q64: the bucketized range join under the oracle gate — events
    * classified into value bands via [[RangeJoin.pointInInterval]].
    * Spark would plan the raw BETWEEN join as a nested loop; the
    * bucketization turns it into a broadcast equi-join on bucket id
    * (PlanSpec asserts no cartesian/NLJ survives). */
  def valueBands(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val points = Tables.events(s, dir)
      .withColumn("vc", floor(col("value") * 100).cast("long"))
    val bands = (0L until 10L).map(b => (b, b * 5000L, b * 5000L + 4999L))
      .toDF("band", "lo", "hi")
    RangeJoin.pointInInterval(points, bands, "vc", "lo", "hi", bucketWidth = 2500L)
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n"), round(avg(col("value")), 4).as("avg_value"))
  }

  /** q62: the generic [[AsOf.join]] API under the oracle gate — same
    * semantics as q17 but via the two-table API (purchases probe side,
    * clicks build side, event_id as the write-order tiebreak), proving
    * the union+window formulation end-to-end against SQL. */
  def asofApi(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("ts"))
    AsOf.join(purchases, clicks, "user_id", "ts", "ts",
        rightPayload = Seq("event_id", "ts"), rightTiebreak = Some("event_id"))
      .select(col("user_id"), col("purchase_id"), col("purchase_ts"),
        col("asof_event_id").as("last_click_id"),
        col("asof_ts").as("last_click_ts"))
  }

  /** q122: LAST-CLICK revenue attribution — the ad-tech standard
    * composed from the public [[AsOf.join]] API: every purchase is
    * attributed to its latest preceding click (q62's backward as-of,
    * one shuffle + one ordered window pass, never a per-key
    * join-then-filter explosion), then revenue rolls up per CLICK
    * day — the report a marketing pipeline publishes. Purchases with
    * no prior click land in the `-1` unattributed bucket (they are
    * real revenue the report must not drop). */
  def lastClickAttribution(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("value"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("ts"))
    AsOf.join(purchases, clicks, "user_id", "ts", "ts",
        rightPayload = Seq("ts"), rightTiebreak = Some("event_id"))
      .withColumn("click_day", when(col("asof_ts").isNotNull,
        col("asof_ts") - pmod(col("asof_ts"), lit(86400000000L)))
        .otherwise(lit(-1L)))
      .groupBy(col("click_day"))
      .agg(count(lit(1)).as("n_purchases"),
        round(sum(col("value")), 2).as("attributed_value"))
  }

  /** q168: MARKOV HELD-OUT accuracy — the model-eval loop for q104's
    * transition matrix, done the way an ML pipeline must: TRAIN the
    * matrix on one user population (seeded-hash split — q157's
    * sticky assignment), predict next_type = argmax row, score on
    * the HELD-OUT users. In-sample accuracy (what q104 alone could
    * report) overstates a sequence model; the held-out gap is the
    * real generalization number. Per-from_type row: the predicted
    * next event, eval transitions, hits, accuracy (integer ppm).
    * Shapes: the per-user lead() windows are user-bounded (q104's
    * argument); the matrix and its argmax live on constant-size
    * frames (rank window over |types|² rows); the eval join
    * broadcasts |types| predictions. Argmax ties break to the
    * lexicographically smallest to_type (rank orders n desc,
    * to_type asc — pinned on both engines). */
  def markovHoldout(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val seq0 = Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .withColumn("arm", Sampling.hashBucket(concat(lit("mk|"),
        col("user_id").cast("string"))) % 2)
    val trainCounts = seq0.filter(col("arm") === 0)
      .groupBy(col("event_type").as("from_type"),
        col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    // constant-size |types|^2 window: rank 1 = the row argmax
    val wm = Window.partitionBy(col("from_type"))
      .orderBy(col("n").desc, col("to_type"))
    val pred = trainCounts
      .withColumn("rk", row_number().over(wm))
      .filter(col("rk") === 1)
      .select(col("from_type"), col("to_type").as("predicted_to"),
        col("n").as("n_train"))
    seq0.filter(col("arm") === 1)
      .join(broadcast(pred), col("event_type") === col("from_type"))
      .groupBy(col("from_type"))
      .agg(first(col("predicted_to")).as("predicted_to"),
        first(col("n_train")).as("n_train"),
        count(lit(1)).as("n_eval"),
        sum(when(col("next_type") === col("predicted_to"), 1L)
          .otherwise(0L)).as("n_correct"))
      .select(col("from_type"), col("predicted_to"), col("n_train"),
        col("n_eval"), col("n_correct"),
        expr("(n_correct * 1000000L) div n_eval").as("acc_ppm"))
  }

  /** q164: CONVERSION-LATENCY percentiles — p50/p90/p99 of
    * view→purchase delay, the product-funnel SLA metric, composed
    * from two library pieces: the forward [[AsOf.join]] (q103's
    * single-shuffle plan — per view, the earliest purchase at or
    * after it) and q97's histogram-quantile pattern (minute-grain
    * bins → cum window over the BOUNDED bin table — bins ≤ corpus
    * time-span minutes, never corpus rows — all-integer rank
    * crossing, estimate = bin upper edge). No task ever sorts the
    * delay corpus; rank arithmetic is integer ceil((q·n)/100).
    * Views that never convert are excluded (they have no latency;
    * their count is q16's funnel drop-off, not this metric). */
  def conversionLatency(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"))
    val delays = AsOf.join(views, purchases, "user_id", "ts", "ts",
        rightPayload = Seq("ts"), rightTiebreak = Some("event_id"),
        forward = true)
      .filter(col("asof_ts").isNotNull)
      .select((col("asof_ts") - col("ts")).as("d"))
    val hist = delays.groupBy(expr("d div 60000000").as("bin"))
      .agg(count(lit(1)).as("cnt"))
    val wcum = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("cum", sum(col("cnt")).over(wcum))
    val total = hist.agg(sum(col("cnt")).as("n"))
    Seq(("p50", 50L), ("p90", 90L), ("p99", 99L)).toDF("q_label", "q")
      .crossJoin(broadcast(total))
      .withColumn("rnk", expr("(q * n + 99) div 100"))
      .join(cum, col("cum") >= col("rnk") &&
        (col("cum") - col("cnt")) < col("rnk"))
      .select(col("q_label"), col("n"), col("rnk"),
        col("bin").as("delay_min_lower"),
        (col("bin") * 60000000L + 59999999L).as("est_upper_us"))
  }

  /** q163: traffic RATE-SPIKE monitor — the ops-side anomaly check
    * (q68 flags anomalous USERS; this flags anomalous HOURS): hourly
    * event counts vs the trailing-24 h mean, a spike = count > 2×
    * the baseline. Shapes: one map-side-combinable hourly rollup
    * (the only corpus-sized pass), then ALL windowing happens on the
    * bounded hour table (stream-lifetime rows — q158's argument);
    * per-day report ≤ |days| rows. The spike test is exact integer
    * cross-multiplication (n·24 > 2·Σ₂₄ — no division), ratios are
    * truncated ppm; hours without a full 24 h history are excluded
    * from evaluation rather than compared against a short window
    * (which would false-positive the first day). */
  def rateSpikes(s: SparkSession, dir: String): DataFrame =
    rateSpikesFrom(hourlyCounts(s, dir))

  /** The ONE corpus-sized pass the whole rate-alarm family shares:
    * events rolled up to the bounded hourly table (h = hour index,
    * n = events that hour; map-side combinable, stream-lifetime
    * rows). Every monitor below accepts this frame via its `*From`
    * overload so a composed report (q200) scans the corpus ONCE —
    * the shared-CTE shape the monitors' own oracles use — while the
    * standalone gates keep building it themselves. */
  def hourlyCounts(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(expr("ts div 3600000000").as("h"))
      .agg(count(lit(1)).as("n"))

  /** q163 over a pre-built [[hourlyCounts]] frame. */
  def rateSpikesFrom(hourly: DataFrame): DataFrame = {
    val w24 = Window.orderBy(col("h")).rowsBetween(-24, -1)
    hourly
      .withColumn("s24", sum(col("n")).over(w24))
      .withColumn("c24", count(col("n")).over(w24))
      .filter(col("c24") === 24)
      .withColumn("ratio_ppm", expr("(n * 24000000L) div s24"))
      .groupBy(expr("h div 24").as("day"))
      .agg(count(lit(1)).as("n_hours"),
        sum(when(col("ratio_ppm") > 2000000L, 1L).otherwise(0L))
          .as("n_spikes"),
        max(col("ratio_ppm")).as("max_ratio_ppm"),
        min(col("ratio_ppm")).as("min_ratio_ppm"))
  }

  /** q157: A/B EXPERIMENT LIFT report — the experimentation primitive
    * every product pipeline runs on the event stream: users split
    * into two arms by a SEEDED HASH of the user id (the industry
    * assignment mechanism: sticky, uniform, no coordination, replays
    * identically on both engines — q54's construction), then per-arm
    * conversion (any purchase) and revenue roll up into one report
    * row with lift and the two-proportion z statistic. Shapes: one
    * per-user agg (map-side combinable on user_id), one 2-row arm
    * agg, one conditional-agg pivot to a single row — a 100 TB
    * experiment report is three bounded aggregations, nothing else.
    * Rates are integer ppm (truncated); only the z stat is double
    * (rounded; both engines IEEE-identical). */
  def abLift(s: SparkSession, dir: String): DataFrame = {
    // conversion = a HIGH-VALUE purchase (value ≥ 100): "any purchase"
    // is degenerate on this corpus (every user buys ⇒ pooled variance
    // 0 ⇒ z undefined); ~80% convert under this definition at all SFs
    val perUser = Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase" &&
            col("value") >= 100, 1L).otherwise(0L))
          .as("converted"),
        sum(when(col("event_type") === "purchase",
          round(col("value") * 100).cast("long")).otherwise(0L))
          .as("rev_cents"))
      .withColumn("arm",
        when(Sampling.hashBucket(concat(lit("ab|"),
          col("user_id").cast("string"))) % 2 === 0, "A").otherwise("B"))
    val arms = perUser.groupBy(col("arm"))
      .agg(count(lit(1)).as("n"), sum(col("converted")).as("conv"),
        sum(col("rev_cents")).as("rev"))
    val one = arms.agg(
      sum(when(col("arm") === "A", col("n"))).as("n_a"),
      sum(when(col("arm") === "A", col("conv"))).as("conv_a"),
      sum(when(col("arm") === "A", col("rev"))).as("rev_a_cents"),
      sum(when(col("arm") === "B", col("n"))).as("n_b"),
      sum(when(col("arm") === "B", col("conv"))).as("conv_b"),
      sum(when(col("arm") === "B", col("rev"))).as("rev_b_cents"))
    val pa = col("conv_a").cast("double") / col("n_a")
    val pb = col("conv_b").cast("double") / col("n_b")
    val pp = (col("conv_a") + col("conv_b")).cast("double") /
      (col("n_a") + col("n_b"))
    one.select(col("n_a"), col("conv_a"), col("rev_a_cents"),
      col("n_b"), col("conv_b"), col("rev_b_cents"),
      expr("(conv_a * 1000000L) div n_a").as("conv_a_ppm"),
      expr("(conv_b * 1000000L) div n_b").as("conv_b_ppm"),
      expr("(conv_b * n_a * 1000000L) div (conv_a * n_b) - 1000000L")
        .as("lift_ppm"),
      round((pb - pa) / sqrt(pp * (lit(1.0) - pp) *
        (lit(1.0) / col("n_a") + lit(1.0) / col("n_b"))), 4).as("z_stat"))
  }

  /** q156: POSITION-BASED (U-shaped) multi-touch attribution — the
    * model marketers run when last-click (q122) over-credits the
    * final touch: each purchase's value splits 40% to the FIRST
    * touch, 40% to the LAST touch before it, 20% evenly across the
    * middles (100% / 50-50 for 1- and 2-touch paths; purchases with
    * no prior touch roll up as `(unattributed)` so value is
    * CONSERVED, not dropped). Credits are integer parts-per-million
    * and payouts integer-cents-truncated — division order is pinned,
    * so both engines replay the same cent. Shapes: one user-keyed
    * equi-join (ts < purchase_ts as a residual filter; fan-out
    * bounded by per-user activity — q16/q104's argument), per-
    * PURCHASE rank/count windows (bounded partitions), then a
    * |types|-row roll-up. */
  def positionAttribution(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        round(col("value") * 100).cast("long").as("cents"),
        col("ts").as("pts"))
    val touches = ev.filter(col("event_type") =!= "purchase")
      .select(col("user_id"), col("event_id"), col("ts"),
        col("event_type").as("touch_type"))
    val wp = Window.partitionBy(col("purchase_id"))
    // ts < pts lives in the JOIN condition, not a post-filter: a
    // purchase whose user has only LATER touches must keep its null
    // row (→ unattributed), or its value silently vanishes
    val credited = purchases
      .join(touches.withColumnRenamed("user_id", "t_user"),
        col("user_id") === col("t_user") && col("ts") < col("pts"), "left")
      .withColumn("n", count(col("event_id")).over(wp))
      .withColumn("r", row_number().over(wp.orderBy(col("ts"), col("event_id"))))
      .withColumn("credit_ppm",
        when(col("event_id").isNull, 1000000L)
          .when(col("n") === 1, 1000000L)
          .when(col("n") === 2, 500000L)
          .when(col("r") === 1 || col("r") === col("n"), 400000L)
          .otherwise(expr("200000L div (n - 2)")))
    credited
      .select(coalesce(col("touch_type"), lit("(unattributed)"))
          .as("touch_type"),
        col("credit_ppm"),
        expr("(cents * credit_ppm) div 1000000L").as("attr_cents"))
      .groupBy(col("touch_type"))
      .agg(count(lit(1)).as("n_credited"),
        sum(col("credit_ppm")).as("credit_ppm_sum"),
        sum(col("attr_cents")).as("attributed_cents"))
  }

  /** q104: behavioral Markov transition matrix — corpus-wide
    * (from_type → to_type) counts and row-normalized probabilities
    * over each user's time-ordered event sequence (the first-order
    * sequence model behind next-action prediction and bot detection:
    * bots have degenerate rows, organic users don't).
    *
    * The per-user lead() window sorts only one user's events per
    * partition (bounded, like q63/q79 — user sequences are the
    * natural partition); the transition aggregation collapses to a
    * |types|² matrix, and the row normalization runs on that
    * constant-size result. */
  def markovTransitions(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val counts = Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    // bounded |types|² window for the row sums
    val wrow = Window.partitionBy(col("from_type"))
    counts
      .withColumn("p", round(col("n").cast("double")
        / sum(col("n")).over(wrow), 4))
  }

  /** q103: FORWARD as-of — for every view, the next purchase at or
    * after it per user (per-impression time-to-convert, the mirror of
    * q62's backward lookup). Same single-shuffle union+window plan as
    * AsOf.join backward — a join-then-filter formulation would build
    * a per-key cartesian before ranking; this sorts once. */
  def asofForward(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"),
        col("ts").as("view_ts"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"))
    AsOf.join(views, purchases, "user_id", "ts", "ts",
        rightPayload = Seq("event_id", "ts"),
        rightTiebreak = Some("event_id"), forward = true)
      .select(col("user_id"), col("view_id"), col("view_ts"),
        col("asof_event_id").as("next_purchase_id"),
        col("asof_ts").as("next_purchase_ts"))
  }

  /** q173: POINT-IN-TIME-CORRECT feature/label extraction — the
    * feature-store primitive behind every churn/propensity model
    * trained off an event stream: a cutoff at the 80% point of the
    * corpus time range (integer µs arithmetic, engine-exact) splits
    * each user's history into a FEATURE window (strictly pre-cutoff:
    * event count, error count, integer-cents value sum, distinct
    * active days) and a LABEL window (churned = no post-cutoff
    * activity). Leakage is impossible by construction: both windows
    * come from ONE conditional-aggregation pass, so no feature
    * expression can read a post-cutoff row — the property a
    * hand-rolled features-then-labels join gets wrong under late
    * data. Scale: the cutoff is a broadcast 1-row scalar; the whole
    * extraction is a single map-side-combinable hash agg keyed by
    * user_id (no window, no self-join); an incremental rebuild would
    * read the pre-window through the raw-nanos pushdown seam
    * (Tables.eventsTsBounded) instead of rescanning the corpus. */
  def pitFeatures(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val bounds = ev.agg(min(col("ts")).as("t0"), max(col("ts")).as("t1"))
    val pre = col("ts") < col("cutoff")
    ev.crossJoin(broadcast(bounds))
      .withColumn("cutoff", expr("t0 + ((t1 - t0) * 4) div 5"))
      .groupBy(col("user_id"))
      .agg(
        sum(when(pre, 1L).otherwise(0L)).as("n_pre"),
        sum(when(pre && col("event_type") === "error", 1L)
          .otherwise(0L)).as("n_err_pre"),
        sum(when(pre, expr("CAST(round(value * 100) AS BIGINT)"))
          .otherwise(0L)).as("value_cents_pre"),
        countDistinct(when(pre, expr("ts div 86400000000")))
          .as("active_days_pre"),
        max(when(col("ts") >= col("cutoff"), 1L).otherwise(0L))
          .as("any_post"))
      .select(col("user_id"), col("n_pre"), col("n_err_pre"),
        col("value_cents_pre"), col("active_days_pre"),
        (lit(1L) - col("any_post")).as("churned"))
  }

  /** q185: top common 3-step behavior PATHS — order-sensitive
    * sequence mining, the grain between q104 (1-step transition
    * probabilities) and q167 (order-blind itemsets): every
    * consecutive (type → type → type) window in each user's
    * timeline, counted corpus-wide, top-10. The UX/funnel-design
    * report ("what do users actually do in threes") and the
    * Markov-order-2 evidence check in one. Scale: per-user-bounded
    * lead() windows (the q104 shape — a user's events fit a task),
    * one map-side-combinable count on the ≤|types|³ bounded path
    * domain, TakeOrderedAndProject top-k. Ties broken by path text. */
  def pathTopK(s: SparkSession, dir: String, k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("t2", lead(col("event_type"), 1).over(w))
      .withColumn("t3", lead(col("event_type"), 2).over(w))
      .filter(col("t3").isNotNull)
      .select(concat_ws(" > ", col("event_type"), col("t2"), col("t3")).as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(k)
  }

  /** q189: EWMA rate-spike monitor — q163's flat trailing-24h mean
    * replaced by an EXPONENTIALLY-weighted baseline (α = ½,
    * truncated at 8 lags), the smoothing every production rate
    * alarm actually uses (a flat window lets one old burst suppress
    * alerts for a day; EWMA forgets geometrically). Exact integers
    * throughout: weights are the truncated power ladder
    * 128,64,…,1 (sum 255) over lags 1–8, the baseline is
    * Σwᵢ·n_{t−i} and the spike test is the cross-multiplied
    * n_t·255 > 2·Σwᵢ·n_{t−i} — no division anywhere, so the oracle
    * replays the alarm bit-exactly. Same bounded-hourly-table shape
    * as q163 (stream-lifetime rows, never corpus-sized); a
    * CONTIGUITY guard (lag(h,8) = h−8) excludes hours whose history
    * has gaps instead of silently comparing against a shifted
    * window — the q163 first-day exclusion, hardened. */
  def ewmaSpikes(s: SparkSession, dir: String): DataFrame =
    ewmaSpikesFrom(hourlyCounts(s, dir))

  /** q189 over a pre-built [[hourlyCounts]] frame. */
  def ewmaSpikesFrom(hourly: DataFrame): DataFrame = {
    val w = Window.orderBy(col("h"))
    val weights = Seq(128L, 64L, 32L, 16L, 8L, 4L, 2L, 1L)
    val ewmaNum = weights.zipWithIndex.map { case (wt, i) =>
      lag(col("n"), i + 1).over(w) * wt }.reduce(_ + _)
    hourly
      .withColumn("h8", lag(col("h"), 8).over(w))
      .withColumn("ewma_num", ewmaNum)
      .filter(col("h8") === col("h") - 8)
      .select(col("h"), col("n"),
        expr("ewma_num * 1000 div 255").as("ewma_milli"),
        when(col("n") * 255 > lit(2) * col("ewma_num"), 1L).otherwise(0L)
          .as("spike"))
  }

  /** q191: SEASONAL-baseline anomaly report — the third member of
    * the rate-alarm family (q163 flat trailing window, q189 EWMA):
    * real traffic is PERIODIC, and both trailing baselines flag the
    * daily peak as a spike while a genuine 2× burst at 4 am hides
    * under the trailing mean. The seasonal fix compares each hour
    * against the mean of the SAME hour-of-day across all other days
    * (leave-one-out — including the candidate hour in its own
    * baseline dilutes exactly the burst being tested): spike ⟺
    * n·(d−1) > 2·(total_hod − n), exact integer cross-multiply, no
    * division (d = days observed for that hour-of-day; d ≥ 2
    * guard — one observation has no peers to compare against).
    * Shapes: corpus → bounded hourly table (ONE map-side-combinable
    * rollup, stream-lifetime rows); the 24-row hour-of-day profile
    * broadcasts back onto it; report = ≤24 rows (per hour-of-day:
    * days, mean, spike count, peak). At 100 TB this is one rollup +
    * a 24-row broadcast join — the cheapest possible seasonal
    * monitor. */
  def seasonalSpikes(s: SparkSession, dir: String): DataFrame =
    seasonalSpikesFrom(hourlyCounts(s, dir))

  /** q191 over a pre-built [[hourlyCounts]] frame. */
  def seasonalSpikesFrom(hourlyIn: DataFrame): DataFrame = {
    val hourly = hourlyIn.withColumn("hod", expr("h % 24"))
    val prof = hourly.groupBy(col("hod"))
      .agg(sum(col("n")).as("total"), count(lit(1)).as("d"))
    hourly.join(broadcast(prof), "hod")
      .filter(col("d") >= 2)
      .groupBy(col("hod"))
      .agg(max(col("d")).as("n_days"),
        expr("max(total * 1000 div d)").as("mean_milli"),
        sum(when(col("n") * (col("d") - 1) > lit(2) * (col("total") - col("n")),
          1L).otherwise(0L)).as("n_spikes"),
        max(col("n")).as("max_n"))
  }

  /** q192: WAL sequence-INTEGRITY audit — the trust check a CDC
    * consumer runs before believing any downstream materialization
    * (SURVEY §1: at-least-once delivery means duplicates are
    * EXPECTED; sequence gaps are not). Events are sharded by
    * `event_id % shards` (the WAL partition layout, so each shard's
    * ids form an arithmetic progression with step = shards); per
    * shard the audit reports duplicates (rows − distinct ids), gaps
    * (expected progression length − distinct ids), and REORDERINGS:
    * adjacent-in-sequence pairs (id, id+shards) whose event times
    * run backwards — found with an EQUI-join on the successor id,
    * never a per-shard window sort (at 100 TB a shard is far bigger
    * than an executor; the join shuffles on id and each pair is
    * checked locally). Because duplicates are expected, the
    * reordering check runs on ONE row per event_id (min ts — the
    * first delivery is the authoritative event time); joining raw
    * copies would cross-product duplicates and count one logical
    * reordering many times. Output = exactly `shards` rows via a
    * left join onto the 0..shards-1 range — a fully-gapped shard
    * surfaces as an all-zero row (null min/max/gaps: nothing to
    * infer a progression from) instead of silently vanishing.
    * `shards` tracks the real WAL partition count (Kafka
    * partitions / region count). */
  def walIntegrity(s: SparkSession, dir: String, shards: Int = 8): DataFrame = {
    val e = Tables.events(s, dir).select(col("event_id"), col("ts"))
    val u = e.groupBy(col("event_id")).agg(min(col("ts")).as("ts"))
    val stats = e.groupBy((col("event_id") % shards).as("shard"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("event_id")).as("n_ids"),
        min(col("event_id")).as("min_id"),
        max(col("event_id")).as("max_id"))
    val late = u.as("a")
      .join(u.as("b"), col("b.event_id") === col("a.event_id") + shards)
      .filter(col("b.ts") < col("a.ts"))
      .groupBy((col("a.event_id") % shards).as("shard"))
      .agg(count(lit(1)).as("n_late"))
    s.range(shards).select(col("id").as("shard"))
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

  /** q193: AUTOCORRELATION of the hourly event-rate series at lags
    * 1..maxLag — the periodicity detector that DECIDES between the
    * rate-alarm baselines (q163 flat trailing / q189 EWMA vs q191
    * seasonal): a spike in r at lag 24 is the data saying "use the
    * seasonal baseline", so the gated default covers a full day
    * (maxLag = 24) and the report carries that DECISION as a
    * `recommended` column — 'seasonal' if the lag-24 r is both the
    * series maximum and ≥ 0.5, else 'ewma' if the lag-1 r ≥ 0.3
    * (short memory but no daily period), else 'flat'. Exact integer
    * moments per lag (n, Σx, Σy, Σx², Σy², Σxy — the q108 policy:
    * sums of longs are order-insensitive, so cross-engine parity is
    * exact; Σx² for T hourly buckets stays in Long while
    * x_max ≤ sqrt(2^63/T)) — but the DERIVED products n·Σx² and
    * (Σx)² need up to double that magnitude, so the variance and
    * covariance arithmetic is widened to Decimal(38,0) (DuckDB
    * mirror: HUGEINT) before the final double cast: no silent Long
    * wraparound at WAL-scale rates, and both engines agree bit-for-
    * bit because the exact integers are identical. A degenerate
    * (constant) series has zero variance on one side — r is then an
    * EXPLICIT null (guard on the exact widened variance, never a
    * double), not engine-dependent NaN/∞. Shapes: corpus → bounded
    * hourly rollup (map-side combinable), then hourly ⋈ hourly on
    * h+lag (stream-lifetime-sized equi-join, NEVER corpus-sized) →
    * maxLag report rows + a single-row broadcast for the
    * recommendation. */
  def acfLags(s: SparkSession, dir: String, maxLag: Int = 24): DataFrame =
    acfLagsFrom(hourlyCounts(s, dir), maxLag)

  /** q193 over a pre-built [[hourlyCounts]] frame. */
  def acfLagsFrom(hourlyIn: DataFrame, maxLag: Int = 24): DataFrame = {
    val hourly = hourlyIn.withColumnRenamed("n", "x")
    val pairs = hourly
      .withColumn("lag", explode(array((1 to maxLag).map(i => lit(i.toLong)): _*)))
      .join(hourly.toDF("h2", "y"), col("h2") === col("h") + col("lag"))
    def d(c: Column): Column = c.cast("double")
    def w(c: Column): Column = c.cast("decimal(38,0)")
    val perLag = pairs.groupBy(col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      .withColumn("vx", w(col("n_pairs")) * w(col("sxx")) - w(col("sx")) * w(col("sx")))
      .withColumn("vy", w(col("n_pairs")) * w(col("syy")) - w(col("sy")) * w(col("sy")))
      .select(col("lag"), col("n_pairs"),
        col("sx"), col("sy"), col("sxx"), col("syy"), col("sxy"),
        when(col("vx") <= 0 || col("vy") <= 0, lit(null).cast("double"))
          .otherwise(round(
            d(w(col("n_pairs")) * w(col("sxy")) - w(col("sx")) * w(col("sy")))
              / (sqrt(d(col("vx"))) * sqrt(d(col("vy")))), 4))
          .as("r"))
    perLag.crossJoin(broadcast(recommendBaseline(perLag)))
  }

  /** The q193 baseline DECISION as a single-row AGGREGATE over the
    * per-lag ACF report: 'seasonal' if lag-24 r is the series max and
    * ≥ 0.5, else 'ewma' if lag-1 r ≥ 0.3, else 'flat'. Being a global
    * aggregate (not a distinct over report rows), it emits its one
    * row even when the report is EMPTY — a degenerate/empty corpus
    * recommends 'flat', matching the oracle's aggregate CTE. */
  private[graft] def recommendBaseline(perLag: DataFrame): DataFrame =
    perLag.agg(
        max(when(col("lag") === 24, col("r"))).as("r24"),
        max(col("r")).as("rmax"),
        max(when(col("lag") === 1, col("r"))).as("r1"))
      .select(
        when(col("r24").isNotNull && col("r24") >= 0.5 && col("r24") >= col("rmax"),
          lit("seasonal"))
          .when(col("r1") >= 0.3, lit("ewma"))
          .otherwise(lit("flat")).as("recommended"))

  /** q203: ACTIVE-USERS report — DAU / trailing-7 WAU / trailing-30
    * MAU + the DAU/WAU stickiness ratio per day, the product-ops
    * metric family between q51's weekly cohorts and the rate
    * monitors. The scale shape: events collapse ONCE to distinct
    * (user, day) pairs (the only corpus-sized pass, map-side
    * combinable); each pair then fans out to the ≤7 / ≤30 report
    * days its activity supports (explode over a constant offset
    * array — pairs·30 rows, orders of magnitude below event volume)
    * and ONE aggregation with three CONDITIONAL countDistincts
    * (off = 0 → DAU, off < 7 → WAU, any → MAU) finishes all three
    * horizons in a single pass — never three scans of the pair
    * frame, and NEVER a distinct-over-sliding-window (Spark has no
    * distinct range frame; a collect_set window would hold every
    * user id per day in one buffer). The rolled report is bounded
    * (|days|+29 rows) and localCheckpoint-ed so the min/max bounds
    * derive from it without re-running the corpus lineage: the
    * events table is scanned exactly once. Report days = days with
    * observed activity (DAU ≥ 1, the oracle's inner-join set); days
    * past the observed range are dropped; `full_window` flags days
    * whose trailing 30 days are fully observed — partial-window rows
    * are reported, not silently misleading. Integer ppm
    * stickiness. */
  /** q315: BOT-REGULARITY audit (round-10) — the "too regular to be
    * human" filter a training pipeline runs before user events feed
    * models: per user, the squared coefficient of variation of
    * inter-event gaps (scripted clients fire on timers → CV² ≈ 0;
    * humans are bursty → CV² ≥ 1). Exact integer identity — CV² =
    * (n·Σg² − (Σg)²)/(Σg)², milli-scaled with Decimal(38,0) products
    * (Σg² reaches 10²⁴ at month-long micros; Long wraps) — and the
    * bot flag by cross-multiply 10·(n·Σg² − (Σg)²) < (Σg)² (CV² <
    * 0.1), no float variance to diverge. One user-partitioned lag
    * window (user-keyed shuffle; partitions are per-user event
    * counts, never the corpus) + one grouped agg; users with < 5
    * gaps carry too little evidence and are excluded. */
  def botRegularity(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("gap", col("ts") - lag(col("ts"), 1).over(w))
      .filter(col("gap").isNotNull)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("gap")).as("sg"),
        sum(expr("cast(gap as decimal(38,0)) * gap")).as("sg2"))
      .filter(col("n_gaps") >= 5L && col("sg") > 0L)
      .select(col("user_id"), col("n_gaps"),
        expr("sg div n_gaps").as("mean_gap_us"),
        expr("cast((n_gaps * sg2 - cast(sg as decimal(38,0)) * sg) * 1000" +
          " div (cast(sg as decimal(38,0)) * sg) as bigint)").as("cv2_milli"),
        expr("cast(10 * (n_gaps * sg2 - cast(sg as decimal(38,0)) * sg)" +
          " < cast(sg as decimal(38,0)) * sg as boolean)").as("is_bot"))
  }

  /** q316: GROWTH ACCOUNTING (round-10) — the new / retained /
    * resurrected / churned daily decomposition (the Social-Capital
    * accounting identity: DAU(d) = new + retained + resurrected;
    * churn balances MAU movement) — the canonical product-health
    * report over the event stream. One distinct (user, day)
    * projection; per-user lag/lead windows classify each active day
    * (first-ever → new, yesterday-active → retained, gap → ⁠
    * resurrected) and locate the day AFTER an activity gap starts
    * (→ churned, counted at d+1 while d+1 ≤ corpus max — the
    * broadcast anchor); one grouped rollup onto the bounded day
    * grid. Active and churned meet in a FULL OUTER join so a day
    * with churn but zero active users (a gap day in the corpus)
    * still emits its row — churn is counted at EVERY d+1 ≤ corpus
    * max, not only at days that happen to have activity. The
    * identity n_new+n_retained+n_resurrected = DAU is spec-pinned. */
  def growthAccounting(s: SparkSession, dir: String): DataFrame = {
    val days = Tables.events(s, dir)
      .select(col("user_id"), expr("ts div 86400000000").as("day"))
      .distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    val anchor = days.agg(max(col("day")).as("mxd"))
    val classified = days
      .withColumn("prev_day", lag(col("day"), 1).over(w))
      .withColumn("next_day", lead(col("day"), 1).over(w))
      .crossJoin(broadcast(anchor))
    val active = classified.groupBy(col("day"))
      .agg(
        sum(when(col("prev_day").isNull, 1L).otherwise(0L)).as("n_new"),
        sum(when(col("prev_day") === col("day") - 1L, 1L).otherwise(0L))
          .as("n_retained"),
        sum(when(col("prev_day").isNotNull &&
          col("prev_day") < col("day") - 1L, 1L).otherwise(0L))
          .as("n_resurrected"))
    val churned = classified
      .filter((col("next_day").isNull || col("next_day") > col("day") + 1L) &&
        col("day") + 1L <= col("mxd"))
      .groupBy((col("day") + 1L).as("day"))
      .agg(count(lit(1)).as("n_churned"))
    active.join(churned, Seq("day"), "full_outer")
      .select(col("day"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        coalesce(col("n_retained"), lit(0L)).as("n_retained"),
        coalesce(col("n_resurrected"), lit(0L)).as("n_resurrected"),
        coalesce(col("n_churned"), lit(0L)).as("n_churned"))
  }

  /** q308: L28 POWER-USER CURVE (round-10) — the engagement-depth
    * histogram growth teams read next to q203's DAU/MAU surface: in
    * the trailing 28-day window (anchored at the corpus max day — a
    * 1-row broadcast scalar), how many users were active exactly d
    * of the 28 days, for d = 1..28. The curve's SHAPE is the health
    * metric (right-heavy = habit, left-heavy = drive-by), and its
    * mass-weighted mean is the single engagement number. Cost: one
    * distinct (user, day) projection pruned to the window, one
    * per-user count (user-keyed shuffle), one 28-bin histogram —
    * never a window function, output 28 rows at any scale. */
  def powerCurve(s: SparkSession, dir: String): DataFrame = {
    val days = Tables.events(s, dir)
      .select(col("user_id"), expr("ts div 86400000000").as("day"))
    val anchor = days.agg(max(col("day")).as("mxd"))
    val perUser = days
      .crossJoin(broadcast(anchor))
      .filter(col("day") > col("mxd") - 28L)
      .select(col("user_id"), col("day")).distinct()
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("active_days"))
    val hist = perUser.groupBy(col("active_days"))
      .agg(count(lit(1)).as("n_users"))
    val tot = hist.agg(sum(col("n_users")).as("n_total"))
    hist.crossJoin(broadcast(tot))
      .select(col("active_days"), col("n_users"),
        expr("n_users * 1000000 div n_total").as("share_ppm"))
  }

  def activeUsers(s: SparkSession, dir: String): DataFrame = {
    val pairs = Tables.events(s, dir)
      .select(col("user_id"), expr("ts div 86400000000").as("day"))
      .distinct()
    val rolled = pairs
      .withColumn("off", explode(array((0 until 30).map(i => lit(i.toLong)): _*)))
      .groupBy((col("day") + col("off")).as("day"))
      .agg(countDistinct(when(col("off") === 0, col("user_id"))).as("dau"),
        countDistinct(when(col("off") < 7, col("user_id"))).as("wau"),
        countDistinct(col("user_id")).as("mau"))
      .filter(col("dau") > 0)
      .localCheckpoint()
    val bounds = rolled.agg(min(col("day")).as("mnd"), max(col("day")).as("mxd"))
    rolled
      .crossJoin(broadcast(bounds))
      .filter(col("day") <= col("mxd"))
      .select(col("day"), col("dau"), col("wau"), col("mau"),
        expr("dau * 1000000 div wau").as("stickiness_ppm"),
        (col("day") >= col("mnd") + 29).as("full_window"))
  }

  /** q209: COHORT-funnel conversion — q51's cohort axis crossed with
    * q16's funnel semantics in ONE conditional-aggregation pass: per
    * signup-week cohort (a user's first activity week), how many
    * users ever viewed, and how many converted (a purchase at or
    * after their FIRST view — the event-order constraint that makes
    * it a funnel, not two independent counts). The per-user stage
    * times fold into min/max conditional aggregates (map-side
    * combinable, one shuffle on user), the cohort report is a second
    * bounded agg — no window, no join, |weeks| rows out. The
    * product question it answers: "is conversion drifting across
    * acquisition cohorts?" — the cohort-quality signal a growth team
    * reads weekly. Integer ppm rates (conversion over viewers). */
  def cohortFunnel(s: SparkSession, dir: String): DataFrame = {
    val per = Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(expr("min(ts div 604800000000)").as("cohort_week"),
        min(when(col("event_type") === "view", col("ts"))).as("fv"),
        max(when(col("event_type") === "purchase", col("ts"))).as("lp"))
    per.groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("n_users"),
        sum(when(col("fv").isNotNull, 1L).otherwise(0L)).as("n_viewed"),
        sum(when(col("fv").isNotNull && col("lp").isNotNull &&
          col("lp") >= col("fv"), 1L).otherwise(0L)).as("n_converted"))
      .select(col("cohort_week"), col("n_users"), col("n_viewed"),
        col("n_converted"),
        expr("n_viewed * 1000000 div n_users").as("viewed_ppm"),
        expr("n_converted * 1000000 div greatest(n_viewed, 1)")
          .as("conv_ppm"))
  }

  /** q206: user SURVIVAL curve — "what fraction of users are still
    * around k days after they arrive?", the Kaplan-Meier-style
    * retention summary that collapses q51's cohort×week matrix to
    * one curve, CENSORING-AWARE: a user first seen f days before
    * the corpus end can only testify about k ≤ (end − f), so they
    * enter the at-risk denominator only for those k (counting them
    * as churned at horizons the data cannot observe is the classic
    * retention-curve bug this avoids). Survival here = lifespan
    * (last − first activity day) ≥ k. Shapes: one corpus pass to
    * per-user (first, last) day; the k fan-out explodes each user
    * over their OBSERVABLE horizon — Σ ≤ |users|·|days| rows,
    * bounded by the stream-lifetime day count, never event volume;
    * one bounded agg → ≤ |days| report rows, exact integer ppm. */
  def survivalCurve(s: SparkSession, dir: String): DataFrame = {
    val spans = Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(expr("min(ts div 86400000000)").as("f"),
        expr("max(ts div 86400000000)").as("l"))
    val mx = spans.agg(max(col("l")).as("mxd"))
    spans.crossJoin(broadcast(mx))
      .withColumn("life", col("l") - col("f"))
      .withColumn("k", explode(sequence(lit(0L), col("mxd") - col("f"))))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_at_risk"),
        sum(when(col("life") >= col("k"), 1L).otherwise(0L)).as("n_survived"))
      .select(col("k"), col("n_at_risk"), col("n_survived"),
        expr("n_survived * 1000000 div n_at_risk").as("survival_ppm"))
  }

  /** q200: AUTO-BASELINE anomaly report — the rate-alarm family
    * CLOSED as one decision: q193's ACF chooser picks the baseline
    * the data supports, and this report runs ALL THREE monitors
    * (q163 flat trailing / q189 EWMA / q191 seasonal) over the same
    * corpus and emits one row — the recommendation, each monitor's
    * total spike count, and the count under the CHOSEN baseline (the
    * number the on-call alert actually fires on). Composed from the
    * monitors' `*From` overloads over ONE shared [[hourlyCounts]]
    * rollup — the corpus is scanned exactly once (the hourly table is
    * localCheckpoint-ed: bounded stream-lifetime rows, so pinning it
    * costs nothing and severs the four chains from the scan), the
    * same shared-CTE shape the oracle uses. The recommendation is
    * [[recommendBaseline]] — an AGGREGATE, so an empty corpus still
    * emits its one ('flat', 0, 0, 0, 0) report row instead of
    * vanishing (row-count parity with the oracle's aggregate CTE).
    * Every branch is the already-gated integer arithmetic of its
    * operator; single-row broadcast crossJoins assemble the
    * report. */
  def autoAnomaly(s: SparkSession, dir: String): DataFrame = {
    val hourly = hourlyCounts(s, dir).localCheckpoint()
    val flat = rateSpikesFrom(hourly)
      .agg(coalesce(sum(col("n_spikes")), lit(0L)).as("n_spikes_flat"))
    val ew = ewmaSpikesFrom(hourly)
      .agg(coalesce(sum(col("spike")), lit(0L)).as("n_spikes_ewma"))
    val seas = seasonalSpikesFrom(hourly)
      .agg(coalesce(sum(col("n_spikes")), lit(0L)).as("n_spikes_seasonal"))
    val rec = recommendBaseline(acfLagsFrom(hourly))
    rec.crossJoin(broadcast(flat)).crossJoin(broadcast(ew))
      .crossJoin(broadcast(seas))
      .select(col("recommended"), col("n_spikes_flat"), col("n_spikes_ewma"),
        col("n_spikes_seasonal"),
        when(col("recommended") === "flat", col("n_spikes_flat"))
          .when(col("recommended") === "ewma", col("n_spikes_ewma"))
          .otherwise(col("n_spikes_seasonal")).as("n_spikes_chosen"))
  }

  /** q242: CUSUM CHANGEPOINT detection over the hourly rate series —
    * the sequential level-shift detector that completes the
    * rate-monitoring family: q163/q189/q191 flag single anomalous
    * HOURS against a baseline; CUSUM flags a SUSTAINED mean shift
    * (a deploy that doubled traffic, a feed that silently halved)
    * and estimates WHEN it began. The textbook recursion
    * S⁺_t = max(0, S⁺_{t−1} + x_t − (μ+k)) looks inherently
    * sequential — the trap would be a driver loop — but it has a
    * closed prefix form: S⁺_t = P_t − min_{j≤t} P_j where P is the
    * prefix sum of x_t − (μ+k); the mirrored S⁻ uses the running
    * max. So the whole detector is one corpus-sized hourly rollup
    * (map-side combinable) and then windowed passes over the
    * BOUNDED gap-filled hour grid (stream-lifetime rows — the q97
    * class; missing hours count as x=0, which correctly drives the
    * DOWN side: an outage IS a level shift). All comparisons are
    * integer cross-multiplied by 4H (drift k = μ/4, alarm threshold
    * 2μ): y⁺ = 4H·x − 5·total, alarm ⟺ S⁺ > 8·total — H cancels,
    * no division anywhere in the decision. Prefix terms are widened
    * to Decimal(38,0) (HUGEINT in the oracle — the q193 policy:
    * 4H·x sums over a WAL-scale rate series wrap Long). Output: one
    * row per alarm ONSET (alarm ∧ ¬alarm_{t−1}) with the triggering
    * hour, its count, the CUSUM statistic in count units, the
    * changepoint estimate (the LAST hour where the running
    * min/max of P was attained — the standard CUSUM changepoint),
    * and the corpus mean in milli-counts. */
  def cusumChangepoints(s: SparkSession, dir: String): DataFrame =
    cusumFrom(hourlyCounts(s, dir))

  /** Gap-filled hourly grid (h, x) shared by q242/q253 — missing
    * hours count as zero. */
  private[graft] def filledHourly(hourlyIn: DataFrame): DataFrame = {
    val hourly = hourlyIn.toDF("h", "n")
    val grid = hourly.agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      .select(explode(sequence(col("h0"), col("h1"))).as("h"))
    grid.join(hourly, Seq("h"), "left")
      .select(col("h"), coalesce(col("n"), lit(0L)).as("x"))
  }

  /** q242 over a pre-built [[hourlyCounts]] frame (testable on
    * synthetic shift series). */
  private[graft] def cusumFrom(hourlyIn: DataFrame): DataFrame = {
    val filled = filledHourly(hourlyIn)
    val tot = filled.agg(sum(col("x")).as("total"), count(lit(1)).as("hn"))
    def wq(c: Column): Column = c.cast("decimal(38,0)")
    val w = Window.orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wl = Window.orderBy(col("h"))
    val scored = filled.crossJoin(broadcast(tot))
      .withColumn("pu",
        sum(wq(col("x")) * (lit(4L) * col("hn")) - wq(col("total")) * lit(5L))
          .over(w))
      .withColumn("pd",
        sum(wq(col("x")) * (lit(4L) * col("hn")) - wq(col("total")) * lit(3L))
          .over(w))
      .withColumn("mu", min(col("pu")).over(w))
      .withColumn("md", max(col("pd")).over(w))
      .withColumn("su", col("pu") - col("mu"))
      .withColumn("sd", col("md") - col("pd"))
      .withColumn("cpu", max(when(col("pu") === col("mu"), col("h"))).over(w))
      .withColumn("cpd", max(when(col("pd") === col("md"), col("h"))).over(w))
      .withColumn("ua", col("su") > wq(col("total")) * lit(8L))
      .withColumn("da", col("sd") > wq(col("total")) * lit(8L))
      .withColumn("pua", lag(col("ua"), 1, false).over(wl))
      .withColumn("pda", lag(col("da"), 1, false).over(wl))
    def side(name: String, a: Column, pa: Column, st: Column,
        cp: Column): DataFrame =
      scored.filter(a && !pa).select(lit(name).as("side"), col("h"),
        col("x"),
        floor(st / (lit(4L) * col("hn"))).cast("long").as("stat"),
        cp.as("cp_h"),
        expr("total * 1000 div hn").as("mean_milli"))
    side("up", col("ua"), col("pua"), col("su"), col("cpu"))
      .unionByName(
        side("down", col("da"), col("pda"), col("sd"), col("cpd")))
  }

  /** q244: COHORT RETENTION VIA DAY-BITMASKS — the classic retention
    * triangle (q51) recomputed with the bitmap trick a 100 TB engine
    * actually uses: instead of self-joining the event table against
    * itself per (cohort, offset) — |offsets| shuffles of corpus rows
    * — each user's activity collapses to ONE 64-bit integer (bit d
    * set ⟺ active on day d, via the `bit_or` aggregate, map-side
    * combinable like any agg), and every retention cell is then pure
    * bit arithmetic on the BOUNDED user-grain table: active at
    * offset k ⟺ (mask >> (cohort+k)) & 1. One corpus scan, one
    * user-keyed shuffle, and the ×(horizon+1) fan-out touches rows
    * proportional to USERS, never events. The 63-day window is the
    * explicit capacity of one Long mask (days ≥ 63 are excluded up
    * front; a longer program keys masks by 63-day epoch — noted, not
    * built). k=0 rows are the trivial 1e6-ppm sanity diagonal. */
  def bitmaskRetention(s: SparkSession, dir: String,
      horizon: Int = 7): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), expr("ts div 86400000000").as("day"))
    val d0 = ev.agg(min(col("day")).as("d0"))
    val users = ev.crossJoin(broadcast(d0))
      .select(col("user_id"), (col("day") - col("d0")).as("d"))
      .filter(col("d") < 63)
      .groupBy(col("user_id"))
      .agg(min(col("d")).as("cohort"),
        expr("bit_or(shiftleft(cast(1 as bigint), cast(d as int)))")
          .as("mask"))
    retentionGrid(users, horizon)
  }

  /** The q244 report tail over a (cohort, mask) per-user frame —
    * shared with the streaming twin (q283), whose final state must
    * land in the identical grid. */
  private[graft] def retentionGrid(users: DataFrame,
      horizon: Int): DataFrame =
    users
      .select(col("cohort"), col("mask"),
        explode(sequence(lit(0), lit(horizon))).as("k"))
      .withColumn("k", col("k").cast("long"))
      .filter(col("cohort") + col("k") < 63)
      .withColumn("active",
        expr("shiftright(mask, cast(cohort + k as int)) & 1"))
      .groupBy(col("cohort"), col("k"))
      .agg(count(lit(1)).as("n_cohort"), sum(col("active")).as("n_active"))
      .withColumn("ret_ppm", expr("n_active * 1000000 div n_cohort"))

  /** q262: MAX-VERSIONS read — HBase's other retention knob made a
    * query (SURVEY §1: a column family declares VERSIONS => k and a
    * read returns the latest k cells per (row, qualifier); q12 is
    * the k=1 special case, q71 the time-travel cousin): per
    * (rowkey, qualifier) keep the newest `k` cells in HBase's exact
    * order — timestamp desc, then WRITE order desc (WAL seq — the
    * tiebreak HBase resolves by memstore order). One partitioned
    * rank window per (row, qualifier) — never a global sort; the
    * heavy-history alternative is the bounded TopK aggregator, the
    * trade documented rather than silently taken. Output: the
    * versioned cell table (row, qualifier, version 1..k, ts, value
    * cents, seq). */
  def maxVersionsRead(s: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(s, dir)
      .withColumn("version", row_number().over(w).cast("long"))
      .filter(col("version") <= k)
      .select(col("user_id"), col("event_type").as("qualifier"),
        col("version"), col("ts"),
        expr("cast(round(value * 100) as bigint)").as("value_cents"),
        col("event_id").as("seq"))
  }

  /** q265: SPIKE ATTRIBUTION — the drill-down that answers the page
    * q163 opens ("hour H spiked — WHY?"): for every spike hour, each
    * event type's observed count vs what its own trailing-24h share
    * of traffic predicts (expected = share_type · hour_total), and
    * the signed contribution — the root-cause table an on-call reads
    * before blaming a deploy. Alignment subtlety handled, not
    * wished away: the per-type trailing windows run over the SAME
    * present-hour axis as the total's (types gridded to the hour
    * set with zero fills), so "trailing 24" means the same 24 hours
    * in numerator and denominator. All integer milli; the spike
    * predicate is exactly q163's cross-multiply. */
  def spikeAttribution(s: SparkSession, dir: String): DataFrame = {
    val byType = Tables.events(s, dir)
      .groupBy(expr("ts div 3600000000").as("h"), col("event_type"))
      .agg(count(lit(1)).as("nt"))
    val totals = byType.groupBy(col("h")).agg(sum(col("nt")).as("n"))
    val wTot = Window.orderBy(col("h")).rowsBetween(-24, -1)
    val tot = totals
      .withColumn("s24", sum(col("n")).over(wTot))
      .withColumn("c24", count(col("n")).over(wTot))
    val grid = totals.select(col("h"))
      .crossJoin(broadcast(byType.select(col("event_type")).distinct()))
      .join(byType, Seq("h", "event_type"), "left")
      .select(col("h"), col("event_type"),
        coalesce(col("nt"), lit(0L)).as("nt"))
    val wType = Window.partitionBy(col("event_type")).orderBy(col("h"))
      .rowsBetween(-24, -1)
    grid.withColumn("st24", sum(col("nt")).over(wType))
      .join(tot, Seq("h"))
      .filter(col("c24") === 24 &&
        expr("(n * 24000000L) div s24") > 2000000L)
      .select(col("h"), col("event_type"), col("nt"),
        expr("st24 * n * 1000 div s24").as("expected_milli"),
        expr("nt * 1000 - st24 * n * 1000 div s24")
          .as("contribution_milli"))
  }

  /** q267: EVENT DEBOUNCE — near-duplicate event collapse, the CDC
    * hygiene between exact dedup (q86: same id) and sessionization
    * (q14: 30-min behavioral gaps): an at-least-once client retry or
    * a double-fired tracker emits the SAME (user, type) again within
    * a short window, and counting it twice corrupts every downstream
    * rate. Burst-collapse semantics (the standard debounce): an
    * event within `gap` of its PREDECESSOR in the (user, type)
    * stream is dropped, so a chain of rapid repeats keeps only its
    * first — the q14 lag/cumsum shape per (user, type), never a
    * self-join. Report per type: events, dropped, kept, drop ppm. */
  def eventDebounce(s: SparkSession, dir: String,
      gapMicros: Long = 3600000000L): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("prev", lag(col("ts"), 1).over(w))
      .withColumn("dup",
        when(col("prev").isNotNull &&
          col("ts") - col("prev") <= gapMicros, 1L).otherwise(0L))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("dup")).as("n_dropped"))
      .withColumn("n_kept", col("n_events") - col("n_dropped"))
      .withColumn("drop_ppm", expr("n_dropped * 1000000 div n_events"))
  }

  /** q271: THEIL–SEN ROBUST FORECAST — next-hour traffic from the
    * MEDIAN of pairwise slopes over the trailing window (the robust
    * alternative to least-squares drift: one outage hour in the
    * window drags an OLS slope arbitrarily; the slope median
    * shrugs). Exact-by-construction where float medians wobble:
    * slopes stay RATIONALS (num = Δx, den = Δh > 0), ordered by
    * integer cross-multiplication num_a·den_b < num_b·den_a with a
    * deterministic (h1, h2) tiebreak, and the lower median is
    * selected by exact rank over the BOUNDED pair set (≤ C(25,2) =
    * 300 pairs — the window is the knob; both the pair build and
    * the rank compare are broadcast joins over that constant-size
    * frame, never anything corpus-sized). One report row: window
    * size, last hour/count, median slope as num/den and milli, and
    * the forecast last + slope in milli-counts. */
  def theilSenForecast(s: SparkSession, dir: String,
      window: Int = 25): DataFrame =
    theilSenFrom(hourlyCounts(s, dir), window)

  /** q271 over a pre-built [[hourlyCounts]] frame. */
  private[graft] def theilSenFrom(hourlyIn: DataFrame,
      window: Int = 25): DataFrame = {
    val hourly = hourlyIn.toDF("h", "n")
    val hmax = hourly.agg(max(col("h")).as("hm"))
    val recent = hourly.crossJoin(broadcast(hmax))
      .filter(col("h") > col("hm") - window)
      .select(col("h"), col("n"))
      .localCheckpoint()
    val pairs = recent.toDF("h1", "x1")
      .join(broadcast(recent.toDF("h2", "x2")), col("h1") < col("h2"))
      .select(col("h1"), col("h2"), (col("x2") - col("x1")).as("num"),
        (col("h2") - col("h1")).as("den"))
      .localCheckpoint()
    val ranked = pairs.toDF("h1", "h2", "num", "den")
      .join(broadcast(pairs.toDF("b1", "b2", "bnum", "bden")), lit(true))
      .groupBy(col("h1"), col("h2"), col("num"), col("den"))
      .agg((sum(when(
        col("bnum") * col("den") < col("num") * col("bden") ||
          (col("bnum") * col("den") === col("num") * col("bden") &&
            (col("b1") < col("h1") ||
              (col("b1") === col("h1") && col("b2") < col("h2")))),
        1L).otherwise(0L)) + 1L).as("rank"))
    val np = pairs.agg(count(lit(1)).as("np"))
    val last = recent.crossJoin(broadcast(hmax))
      .filter(col("h") === col("hm"))
      .select(col("h").as("last_h"), col("n").as("last_x"))
    ranked.crossJoin(broadcast(np))
      .filter(col("rank") === expr("(np + 1) div 2"))
      .crossJoin(broadcast(last))
      .select(col("np").as("n_pairs"), col("last_h"), col("last_x"),
        col("num").as("slope_num"), col("den").as("slope_den"),
        expr("num * 1000 div den").as("slope_milli"),
        expr("last_x * 1000 + num * 1000 div den").as("forecast_milli"))
  }

  /** q253: STL-style SEASONAL DECOMPOSITION of the hourly rate
    * series — trend / seasonal / residual additively separated, the
    * capacity-planning and anomaly-baseline input the rate-alarm
    * family consumes (q191 ASSUMES a daily season; this MEASURES
    * what the season is and how much signal is left after removing
    * it):
    *  - trend = centered 25-hour moving average (integer milli; only
    *    hours with the full ±12 window — edge hours have no honest
    *    trend);
    *  - seasonal(hod) = mean of the detrended series per hour-of-day
    *    (the classic cycle-subseries mean);
    *  - residual = detrended − seasonal(hod): what an alarm should
    *    actually fire on.
    * All windows run over the BOUNDED gap-filled hour grid (q97's
    * argument; gaps count as zero rows of real traffic). Integer
    * milli arithmetic throughout — negative divisions are safe
    * because both engines truncate integer division toward zero.
    * Report: 24 hour-of-day rows with the seasonal offset and the
    * residual magnitude (mean/max abs) — a flat seasonal column ⇒
    * no daily cycle (use q163/q189); a large seasonal column with
    * small residuals ⇒ q191's baseline is the right alarm. */
  def stlDecompose(s: SparkSession, dir: String): DataFrame =
    stlFrom(hourlyCounts(s, dir))

  /** q253 over a pre-built [[hourlyCounts]] frame. */
  private[graft] def stlFrom(hourlyIn: DataFrame): DataFrame =
    stlResiduals(hourlyIn)
      .groupBy(col("hod"))
      .agg(count(lit(1)).as("n_hours"),
        max(col("seasonal_milli")).as("seasonal_milli"),
        expr("sum(abs(resid_milli)) div count(1)").as("mean_abs_resid_milli"),
        max(abs(col("resid_milli"))).as("max_abs_resid_milli"))

  /** The shared q253/q445 decomposition core: full-window hours with
    * integer-milli trend, detrended value, cycle-subseries seasonal
    * offset and residual. */
  private[graft] def stlResiduals(hourlyIn: DataFrame): DataFrame = {
    val filled = filledHourly(hourlyIn)
    val w25 = Window.orderBy(col("h")).rowsBetween(-12, 12)
    val tr = filled
      .withColumn("s25", sum(col("x")).over(w25))
      .withColumn("c25", count(col("x")).over(w25))
      .filter(col("c25") === 25)
      .withColumn("trend_milli", expr("(s25 * 1000) div 25"))
      .withColumn("detr_milli", col("x") * 1000 - col("trend_milli"))
      .withColumn("hod", pmod(col("h"), lit(24L)))
    val seas = tr.groupBy(col("hod"))
      .agg(sum(col("detr_milli")).as("sd"), count(lit(1)).as("cnt"))
      .select(col("hod"), expr("sd div cnt").as("seasonal_milli"))
    tr.join(broadcast(seas), "hod")
      .withColumn("resid_milli", col("detr_milli") - col("seasonal_milli"))
  }

  /** q254: TIME-BOXED FUNNEL — conversion only counts inside an
    * attribution window (24 h after the user's FIRST view), the
    * convention product analytics actually reports (q16's funnel is
    * unbounded — a purchase a month later still "converts"; a
    * windowed CVR is comparable across cohorts). Per user: first
    * view (one map-side-combinable agg), earliest at-or-after
    * purchase via one user-keyed join + conditional min (never a
    * per-user sort), then a per-cohort-day report: users, in-window
    * conversions, CVR ppm, and the mean in-window delay in
    * milli-seconds (exact integer micros summed, divided once;
    * NULL for cohorts with no conversions rather than a fake 0). */
  def windowFunnel(s: SparkSession, dir: String,
      windowMicros: Long = 86400000000L): DataFrame = {
    val ev = Tables.events(s, dir)
    val fv = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("fv"))
    val per = fv
      .join(ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("pts")), Seq("user_id"), "left")
      .groupBy(col("user_id"), col("fv"))
      .agg(min(when(col("pts") >= col("fv"), col("pts"))).as("conv"))
    per
      .withColumn("day", expr("fv div 86400000000"))
      .withColumn("delay",
        when(col("conv").isNotNull &&
          col("conv") - col("fv") <= windowMicros,
          col("conv") - col("fv")))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_users"),
        count(col("delay")).as("n_conv"),
        expr("count(delay) * 1000000 div count(1)").as("cvr_ppm"),
        expr("sum(delay) div (1000 * nullif(count(delay), 0))")
          .as("mean_delay_ms"))
  }

  /** q245: SESSION × MAINTENANCE-WINDOW overlap — the
    * interval-interval range join ([[RangeJoin.intervalOverlap]])
    * gated end-to-end: which user sessions intersected the daily
    * 02:00–04:00 UTC maintenance window, and for how long — the
    * "who did the deploy actually hit" impact report. Left
    * intervals: q14's 30-min-gap sessions as half-open
    * [first_ts, last_ts + 1μs) (built with the SAME lag/cumsum
    * arithmetic, partitioned per user — never a global sort);
    * right: one deterministic 2-hour window per day of the corpus
    * span. The join explodes both sides to shared HOUR units and
    * meets on an equi-join (fan-out = interval hours, bounded by
    * the 30-min session gap) — Spark would otherwise plan the raw
    * inequality join as a nested loop. Overlap micros are exact
    * integer least/greatest arithmetic; report per day: sessions
    * hit, distinct users hit, total overlap seconds. */
  def sessionMaintenanceOverlap(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val sessions = Tables.events(s, dir)
      .withColumn("prev_us", lag(col("ts"), 1).over(w))
      .withColumn("new_s",
        when(col("prev_us").isNull ||
          col("ts") - col("prev_us") > 1800000000L, 1L).otherwise(0L))
      .withColumn("sid", sum(col("new_s")).over(w))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("ts")).as("s_start"), (max(col("ts")) + 1L).as("s_end"))
    val windows = Tables.events(s, dir)
      .agg(expr("min(ts div 86400000000)").as("d0"),
        expr("max(ts div 86400000000)").as("d1"))
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
      .select(col("day"),
        (col("day") * 86400000000L + 2L * 3600000000L).as("w_start"),
        (col("day") * 86400000000L + 4L * 3600000000L).as("w_end"))
    RangeJoin.intervalOverlap(sessions, windows,
        "s_start", "s_end", "w_start", "w_end", 3600000000L)
      .withColumn("ov",
        least(col("s_end"), col("w_end")) -
          greatest(col("s_start"), col("w_start")))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_sessions"),
        countDistinct(col("user_id")).as("n_users"),
        expr("sum(ov) div 1000000").as("overlap_seconds"))
  }
  /** q296: CROSSTAB INDEPENDENCE audit — is event mix independent of
    * day-of-week? The generic two-factor chi² every ops dashboard
    * wants (q162 runs the same test on lang × length bands; this is
    * the behavioral axis): one map-side-combinable count over the
    * bounded |types| × 7 grid, marginals re-aggregated FROM the grid
    * (never a second corpus pass), expected counts compared by exact
    * integer CROSS-MULTIPLICATION — obs·N vs rowΣ·colΣ, Decimal(38,0)
    * products (n² wraps Long past ~3·10⁹ events) — and the χ²
    * contribution emitted in integer micro:
    * (obs·N − rowΣ·colΣ)² · 10⁶ div (N · rowΣ · colΣ). Divisions
    * happen ONCE per grid cell at the end; nothing float. */
  def crosstabIndependence(s: SparkSession, dir: String): DataFrame = {
    val grid = Tables.events(s, dir)
      .groupBy(col("event_type"),
        expr("(ts div 86400000000 + 4) % 7").as("dow"))
      .agg(count(lit(1)).as("obs")).localCheckpoint()
    val rowTot = grid.groupBy(col("event_type")).agg(sum(col("obs")).as("rt"))
    val colTot = grid.groupBy(col("dow")).agg(sum(col("obs")).as("ct"))
    val n = grid.agg(sum(col("obs")).as("n"))
    grid.join(broadcast(rowTot), "event_type")
      .join(broadcast(colTot), "dow")
      .crossJoin(broadcast(n))
      .select(col("event_type"), col("dow"), col("obs"), col("rt"),
        col("ct"),
        expr("cast((cast(obs as decimal(38,0)) * n - cast(rt as decimal(38,0)) * ct)" +
          " * (cast(obs as decimal(38,0)) * n - cast(rt as decimal(38,0)) * ct)" +
          " * 1000000 div (cast(n as decimal(38,0)) * rt * ct) as bigint)")
          .as("chi2_contrib_micro"))
  }

  /** q292: MAX CONCURRENCY per day — peak simultaneous sessions, the
    * capacity-planning number behind every serving-fleet size
    * (q245 measures overlap SECONDS against fixed windows; this is
    * the sup of the concurrency step function itself). Classic
    * interval sweep: each session contributes (+1 at start, −1 at
    * end) deltas, concurrency = running sum in time order, ends
    * processed BEFORE starts at the same instant (delta asc — the
    * touching-sessions-don't-overlap rule, and what makes the
    * per-instant cum SET order-independent within ties: all −1s
    * land, then +1s climb monotonically, so the daily MAX is
    * well-defined on both engines). The running sum is TWO-PHASE
    * (the q246/q291 machinery): per-hour-bin net deltas → exclusive
    * prefix bases over the bounded hour grid → within-hour running
    * sums in parallel windows — no task ever prefix-sums the
    * corpus. Output: day, peak concurrency, session starts. */
  def maxConcurrency(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val sessions = Tables.events(s, dir)
      .withColumn("prev_us", lag(col("ts"), 1).over(w))
      .withColumn("new_s",
        when(col("prev_us").isNull ||
          col("ts") - col("prev_us") > 1800000000L, 1L).otherwise(0L))
      .withColumn("sid", sum(col("new_s")).over(w))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("ts")).as("s_start"), (max(col("ts")) + 1L).as("s_end"))
    val deltas = sessions
      .select(col("s_start").as("t"), lit(1L).as("delta"))
      .unionAll(sessions.select(col("s_end").as("t"), lit(-1L).as("delta")))
      .withColumn("bin", expr("t div 3600000000"))
    val bases = deltas.groupBy(col("bin")).agg(sum(col("delta")).as("net"))
      .withColumn("base", coalesce(sum(col("net")).over(
        Window.orderBy(col("bin"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("bin"), col("base"))
    deltas.join(broadcast(bases), "bin")
      .withColumn("conc", col("base") + sum(col("delta")).over(
        Window.partitionBy(col("bin")).orderBy(col("t"), col("delta"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(expr("t div 86400000000").as("day"))
      .agg(max(col("conc")).as("max_concurrent"),
        sum(when(col("delta") === 1L, 1L).otherwise(0L)).as("n_starts"))
  }

  /** q285: MARKOV REMOVAL-EFFECT attribution — the channel-value
    * question last-click (q122) and position (q156) models answer by
    * fiat, answered from the journey graph itself: how much does
    * bounded-horizon conversion probability DROP if a channel is
    * removed (its visits convert nothing)? The q104 transition
    * matrix plus an explicit '__end' terminal (each user's last
    * event — without it every chain would look immortal), iterated
    * `horizon` times: p_{i+1}(s) = 1e6 if s = purchase, 0 if s is
    * the removed channel, else Σ_t n(s→t)·p_i(t) div n(s·) — FIXED
    * horizon and TRUNCATING integer-ppm arithmetic, so both engines
    * replay the identical fixed point (a float fixpoint iteration
    * would drift). One removal variant per non-terminal channel plus
    * the '__none__' baseline; removal is monotone (it only zeroes
    * terms), so effects are provably ≥ 0. Scale: two corpus passes
    * (transitions + first-touches — per-user windows, the q104
    * shape); everything after lives on the (|types|+1)·|types|
    * grid — iteration cost is independent of the corpus. */
  def markovRemoval(s: SparkSession, dir: String,
      horizon: Int = 6): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val seq0 = Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("next_type",
        coalesce(lead(col("event_type"), 1).over(w), lit("__end")))
    val trans = seq0
      .groupBy(col("event_type").as("from_type"),
        col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n")).localCheckpoint()
    val outTot = trans.groupBy(col("from_type")).agg(sum(col("n")).as("n_out"))
    val firsts = seq0.groupBy(col("user_id"))
      .agg(min(struct(col("ts"), col("event_id"), col("event_type"))).as("f"))
      .groupBy(col("f.event_type").as("st"))
      .agg(count(lit(1)).as("n_first")).localCheckpoint()
    val states = trans.select(col("from_type").as("st"))
      .unionAll(trans.select(col("to_type"))).distinct().localCheckpoint()
    val variants = states
      .filter(col("st") =!= "purchase" && col("st") =!= "__end")
      .select(col("st").as("removed"))
      .unionAll(Seq("__none__").toDF("removed")).localCheckpoint()
    val grid = variants.crossJoin(states)
    var p = grid.withColumn("p",
      when(col("st") === "purchase", lit(1000000L)).otherwise(lit(0L)))
      .localCheckpoint()
    for (_ <- 1 to horizon) {
      val stepped = trans
        .join(p.withColumnRenamed("st", "to_type"), "to_type")
        .groupBy(col("removed"), col("from_type").as("st"))
        .agg(expr("sum(cast(n as decimal(38,0)) * p)").as("np"))
        .join(outTot.withColumnRenamed("from_type", "st"), "st")
        .select(col("removed"), col("st"),
          expr("cast(np div n_out as bigint)").as("pn"))
      p = grid.join(stepped, Seq("removed", "st"), "left")
        .withColumn("p",
          when(col("st") === "purchase", lit(1000000L))
            .when(col("st") === col("removed"), lit(0L))
            .otherwise(coalesce(col("pn"), lit(0L))))
        .select(col("removed"), col("st"), col("p"))
        .localCheckpoint()
    }
    val conv = p.join(firsts, "st")
      .groupBy(col("removed"))
      .agg(expr("cast(sum(cast(n_first as decimal(38,0)) * p)" +
        " div sum(n_first) as bigint)").as("conv_ppm"))
    val base = conv.filter(col("removed") === "__none__")
      .select(col("conv_ppm").as("base_ppm"))
    conv.filter(col("removed") =!= "__none__")
      .crossJoin(broadcast(base))
      .select(col("removed").as("removed_channel"), col("base_ppm"),
        col("conv_ppm").as("removed_ppm"),
        // zero-guard: if NO first-touch state converts within the
        // horizon, base_ppm = 0 and removal effect is undefined —
        // emit NULL explicitly (Spark `div` would yield NULL anyway,
        // but the DuckDB oracle's `//` raises; q295's total_delta
        // guard is the house pattern)
        when(col("base_ppm") === 0L, lit(null).cast("long"))
          .otherwise(expr("(base_ppm - conv_ppm) * 1000000 div base_ppm"))
          .as("effect_ppm"))
  }

  /** q322: TIME-TO-CONVERT percentiles (round-10) — the duration
    * distribution behind q95's funnel counts: how LONG between a
    * user's first view and their first at-or-after purchase, as
    * exact p50/p90/p99 (a mean hides the long tail that decides
    * retargeting windows and attribution horizons). Durations are
    * exact integer micros on q95's converter relation; percentiles
    * by rank selection over [[Relational.twoPhaseRank]] with
    * hour-aligned duration bins — no task ever sorts the whole
    * converter set (the q40/q67 machinery, q246 discipline). Rank
    * ceil(q·cnt) with the (duration, user_id) total order makes
    * every cut deterministic on both engines. One report row. */
  def timeToConvert(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .filter(col("event_type").isin("view", "purchase"))
      .select(col("user_id"), col("ts"), col("event_type"))
    val firstView = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("first_view"))
    val durs = e.filter(col("event_type") === "purchase")
      .join(firstView.hint("shuffle_hash"), "user_id")
      .filter(col("ts") >= col("first_view"))
      .groupBy(col("user_id"), col("first_view"))
      .agg(min(col("ts")).as("conv_ts"))
      .select(col("user_id"),
        (col("conv_ts") - col("first_view")).as("dur"))
    Relational.twoPhaseRank(durs, lit(1), expr("dur div 3600000000"),
      Seq(col("dur"), col("user_id")), "rn", "cnt")
      .agg(max(col("cnt")).as("n_converters"),
        min(when(col("rn") === ceil(col("cnt") * 0.50), col("dur")))
          .as("p50_us"),
        min(when(col("rn") === ceil(col("cnt") * 0.90), col("dur")))
          .as("p90_us"),
        min(when(col("rn") === ceil(col("cnt") * 0.99), col("dur")))
          .as("p99_us"))
  }

  /** q323: AUDIENCE-OVERLAP matrix (round-10) — for every event-type
    * pair, how many users do BOTH and the Jaccard overlap in ppm:
    * the audience-segmentation number ("do purchasers also share?")
    * that decides whether two surfaces are one audience or two.
    * Scale shape is the q244 bitmask collapse, generalized from days
    * to TYPES: one distinct (user, type) projection, each user folds
    * to ONE Long bitmask via the map-side-combinable bit_or (bit
    * positions = alphabetical rank over the bounded type list), the
    * corpus then collapses to the ≤2^|types| mask HISTOGRAM — and
    * every pair cell is conditional arithmetic over (pair grid ×
    * histogram), two bounded broadcast frames. No per-pair corpus
    * pass, no user-level self-join: |types|² searches for the price
    * of one scan. 63 types is the explicit Long capacity (the q244
    * note). Zero-overlap pairs are REPORTED (disjoint audiences are
    * the finding); Jaccard's union denominator is never zero for
    * listed types. */
  def audienceOverlap(s: SparkSession, dir: String): DataFrame = {
    val ut = Tables.events(s, dir)
      .select(col("user_id"), col("event_type")).distinct()
    val typeBits = ut.select(col("event_type")).distinct()
      .withColumn("pos", row_number().over(Window.orderBy(col("event_type")))
        .cast("long"))
      .withColumn("bit", expr("cast(1 as bigint) << cast(pos - 1 as int)"))
      .select(col("event_type"), col("bit"))
    val hist = ut
      .join(broadcast(typeBits), "event_type")
      .groupBy(col("user_id")).agg(expr("bit_or(bit)").as("mask"))
      .groupBy(col("mask")).agg(count(lit(1)).as("n"))
    val pairGrid = broadcast(typeBits.toDF("type_a", "bit_a"))
      .crossJoin(broadcast(typeBits.toDF("type_b", "bit_b")))
      .filter(col("type_a") < col("type_b"))
    broadcast(pairGrid).crossJoin(hist)
      .groupBy(col("type_a"), col("type_b"))
      .agg(
        sum(when(col("mask").bitwiseAND(col("bit_a")) === col("bit_a"),
          col("n")).otherwise(0L)).as("n_a"),
        sum(when(col("mask").bitwiseAND(col("bit_b")) === col("bit_b"),
          col("n")).otherwise(0L)).as("n_b"),
        sum(when(col("mask").bitwiseAND(col("bit_a").bitwiseOR(col("bit_b")))
            === col("bit_a").bitwiseOR(col("bit_b")),
          col("n")).otherwise(0L)).as("n_both"))
      .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
        col("n_both"),
        expr("cast(n_both * 1000000 div nullif(n_a + n_b - n_both, 0)" +
          " as bigint)").as("jaccard_ppm"))
  }

  /** q341: HITS HUBS & AUTHORITIES (round-11, Kleinberg JACM'99) on
    * the weighted user→event-type bipartite graph — the centrality
    * PAIR next to q94's PageRank: authority(type) = how much
    * engagement flows INTO an event type from well-spread users;
    * hub(user) = how much a user's activity concentrates on
    * authoritative types. On a bipartite graph the hub/authority
    * split is exactly the two-sided importance a funnel owner reads
    * (valuable types vs power users weighted by WHAT they do, not
    * just q308's raw volume).
    *
    * Same engine-exactness treatment as q94: ALL-INTEGER mutual
    * recursion — scores are ppm longs, each round is (Σ score·w) per
    * side then renormalization to ppm of the side's max via integer
    * div, so the result is bit-identical under any partitioning and
    * the oracle unrolls the identical 3 rounds as CTEs. Per round:
    * two weighted-edge equi-joins (the ≤|types|-row authority side
    * broadcasts; the user side is shuffle-hash) + two map-side-
    * combinable sums + two single-row max scalars (broadcast
    * crossJoin). Σ-bound: s ≤ 10⁶ and Σw per node ≤ its event
    * count, so sums stay < 10⁶·n — longs to n ≈ 10¹² edges. */
  def hits(s: SparkSession, dir: String, rounds: Int = 3): DataFrame = {
    val e = Tables.events(s, dir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("w")).localCheckpoint()
    var hub = e.select(col("user_id")).distinct()
      .withColumn("s", lit(1000000L))
    var auth: DataFrame = null
    for (_ <- 1 to rounds) {
      val ar = e.join(hub.hint("shuffle_hash"), "user_id")
        .groupBy(col("event_type")).agg(sum(expr("s * w")).as("s"))
      auth = ar.crossJoin(broadcast(ar.agg(max(col("s")).as("mx"))))
        .select(col("event_type"), expr("s * 1000000 div mx").as("s"))
      val hr = e.join(broadcast(auth), "event_type")
        .groupBy(col("user_id")).agg(sum(expr("s * w")).as("s"))
      hub = hr.crossJoin(broadcast(hr.agg(max(col("s")).as("mx"))))
        .select(col("user_id"), expr("s * 1000000 div mx").as("s"))
        .localCheckpoint()
    }
    auth.select(lit("authority").as("kind"), col("event_type").as("id"),
        col("s").as("score_scaled"))
      .unionByName(hub.select(lit("hub").as("kind"),
        col("user_id").cast("string").as("id"), col("s").as("score_scaled")))
  }

  /** q402: MASE — Mean Absolute Scaled Error of the SEASONAL-naive
    * hourly forecast per event type (Hyndman & Koehler 2006, the
    * scale-free forecast-accuracy standard) — the missing judgment
    * layer on the forecasting family (q271 fits a trend, q229
    * profiles seasonality, q189/q191 flag anomalies; none says
    * whether seasonality actually PREDICTS): seasonal-naive (count
    * 24 h ago) scored against the one-step naive (count 1 h ago) on
    * the DENSE hourly series — mase_ppm < 1e6 means daily
    * seasonality beats persistence and q191's seasonal baseline is
    * the right anomaly reference; > 1e6 means it doesn't and q189's
    * EWMA is. Zero-count hours materialize via the bounded hour grid
    * (fixed time span × |types|); everything integer (counts, |Δ|
    * sums, final ppm ratio); windows partition per type over the
    * bounded series — never a corpus sort. */
  def mase(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, dir)
      .select(col("event_type"), expr("ts div 3600000000").as("h"))
    val counts = ev.groupBy(col("event_type"), col("h"))
      .agg(count(lit(1)).as("n"))
    val bounds = ev.agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
    val grid = counts.select(col("event_type")).distinct()
      .crossJoin(broadcast(bounds))
      .select(col("event_type"),
        explode(sequence(col("h0"), col("h1"))).as("h"))
    val series = grid.join(counts, Seq("event_type", "h"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
    val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
    series
      .withColumn("lag1", lag(col("n"), 1).over(w))
      .withColumn("lag24", lag(col("n"), 24).over(w))
      .filter(col("lag24").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_hours"),
        sum(abs(col("n") - col("lag1"))).as("sae_naive"),
        sum(abs(col("n") - col("lag24"))).as("sae_seasonal"))
      .withColumn("mase_ppm",
        expr("sae_seasonal * 1000000 div nullif(sae_naive, 0)"))
  }

  /** q424: HOLT LINEAR-TREND FORECAST (Holt 1957) — the level+trend
    * exponential smoother between q189's EWMA (level only) and
    * q253's STL (level+trend+season): the short-horizon load
    * forecast a capacity planner reads. Smoothing weights are the
    * EXACT BINARY fractions α = 1/2, β = 1/4, so the whole
    * recursion runs in INTEGER milli units (l_t = (y_t·1000 +
    * l_{t−1} + b_{t−1}) div 2; b_t = Δl div 4 + 3b div 4) — no
    * float ever enters, and the DuckDB oracle replays the recursion
    * as a recursive CTE (one deterministic path). The series is the
    * BOUNDED hourly frame (the q253/q271 argument: the corpus grows
    * in rows, the hour domain doesn't), folded in one codegen
    * aggregate. Output: the fitted level/trend and the next
    * `horizon` hourly forecasts. */
  def holtForecast(s: SparkSession, dir: String, horizon: Int = 3)
      : DataFrame = holtFrom(hourlyCounts(s, dir), horizon)

  /** q424 over any (h, n) series frame — the spec seam (a constant
    * series must fit trend 0 and forecast the constant). */
  private[graft] def holtFrom(hourly: DataFrame, horizon: Int)
      : DataFrame = {
    val series = hourly.toDF("h", "n").agg(
      expr("transform(array_sort(collect_list(" +
        "named_struct('h', h, 'n', n))), e -> e.n)").as("ys"),
      max(col("h")).as("h_last"), count(lit(1)).as("n_hours"))
    series.filter(size(col("ys")) >= 2)
      .withColumn("lb", expr(
        """aggregate(slice(ys, 2, size(ys) - 1),
          |named_struct('l', element_at(ys, 1) * 1000L,
          |  'b', (element_at(ys, 2) - element_at(ys, 1)) * 1000L),
          |(acc, y) -> named_struct(
          |  'l', (y * 1000L + acc.l + acc.b) div 2,
          |  'b', ((y * 1000L + acc.l + acc.b) div 2 - acc.l) div 4
          |    + (3 * acc.b) div 4))""".stripMargin))
      .select(col("n_hours"), col("h_last"),
        col("lb.l").as("level_milli"), col("lb.b").as("trend_milli"),
        explode(expr(s"sequence(1L, ${horizon}L)")).as("k"))
      .select(col("k"), (col("h_last") + col("k")).as("h_pred"),
        col("n_hours"), col("level_milli"), col("trend_milli"),
        (col("level_milli") + col("k") * col("trend_milli"))
          .as("forecast_milli"))
  }

  /** q439: GUMBEL TAIL FIT of hourly block maxima per event type
    * (Gumbel 1958; method-of-moments estimators per Coles 2001, An
    * Introduction to Statistical Modeling of Extreme Values) — the
    * extreme-value layer the forecast family lacked: q189/q424
    * predict the CENTER of the traffic distribution, capacity
    * planning provisions for its MAXIMA, and averages say nothing
    * about those. Block maxima (hourly max event value) are the
    * classic EVT reduction; the Gumbel is their limiting law for
    * light-tailed parents. MoM: β̂ = s·√6/π, μ̂ = x̄ − γ·β̂ (Euler γ),
    * plus the 100-block return level μ̂ + β̂·ln 100 — the "biggest
    * hour in the next 100" number a buffer is sized by. Exact
    * integer moments (Σm, Σm² on DECIMAL(38,0)); ONE IEEE sqrt for
    * s (the q202 argument), then pure integer chains on micro
    * literals (√6/π = 2449490/3141593, γ = 577216, ln 100 =
    * 4605170) — every division on non-negative operands. One
    * map-side agg to |types|·|hours| blocks, one to |types| rows. */
  def gumbelTail(s: SparkSession, dir: String): DataFrame =
    gumbelTailOf(Tables.events(s, dir)
      .select(col("event_type"),
        expr("ts div 3600000000").as("h"), // Tables.events: ts = micros
        expr("CAST(round(value * 1000) AS BIGINT)").as("vm"))
      .groupBy(col("event_type"), col("h"))
      .agg(max(col("vm")).as("m")))

  /** The q439 moment/literal chain over a pre-built block-maxima
    * frame (event_type, h, m) — shared by batch q439 and the
    * streamed store read of q447. */
  private[graft] def gumbelTailOf(blocks: DataFrame): DataFrame = {
    blocks.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_blocks"), sum(col("m")).as("s1"),
        sum(expr("CAST(m AS DECIMAL(38,0)) * m")).as("s2"))
      .filter(col("n_blocks") >= 2)
      .withColumn("mean_milli",
        expr("CAST(CAST(s1 AS DECIMAL(38,0)) div n_blocks AS BIGINT)"))
      .withColumn("s_milli", expr(
        """CAST(round(sqrt(CAST(CAST(n_blocks AS DECIMAL(38,0)) * s2
          |  - CAST(s1 AS DECIMAL(38,0)) * s1 AS DOUBLE)
          | / (CAST(n_blocks AS DOUBLE) * (n_blocks - 1))))
          | AS BIGINT)""".stripMargin))
      .withColumn("beta_milli",
        expr("s_milli * 2449490 div 3141593"))
      .withColumn("mu_milli",
        expr("mean_milli - 577216 * beta_milli div 1000000"))
      .withColumn("ret100_milli",
        expr("mu_milli + beta_milli * 4605170 div 1000000"))
      .select(col("event_type"), col("n_blocks"), col("mean_milli"),
        col("s_milli"), col("beta_milli"), col("mu_milli"),
        col("ret100_milli"))
  }

  /** q440: MANN–KENDALL TREND TEST over the hourly traffic series
    * (Mann 1945, Kendall 1975) — the nonparametric "is traffic
    * actually growing?" answer the forecast family assumes: q271's
    * Theil–Sen gives the robust slope, this gives the
    * SIGNIFICANCE of the monotone trend, distribution-free (spikes
    * and heavy tails that wreck a regression t-test leave S alone).
    * S = Σ_{i<j} sign(x_j − x_i) over the BOUNDED hour grid (the
    * pair join is hours², never events²; the corpus collapses to
    * |hours| rows in one map-side agg), tie-corrected variance
    * 18·Var(S) = n(n−1)(2n+5) − Σt(t−1)(2t+5) exact on
    * DECIMAL(38,0), continuity-corrected z with ONE IEEE sqrt
    * (the q202 argument). Constant series honestly yield NULL z
    * (nullif, never div-0). */
  def mannKendall(s: SparkSession, dir: String): DataFrame =
    mannKendallOf(Tables.events(s, dir)
      .groupBy(expr("ts div 3600000000").as("h"))
      .agg(count(lit(1)).as("x")))

  /** Test core over a pre-aggregated (h, x) series — factored so
    * specs can pin constructed monotone/constant series. */
  private[graft] def mannKendallOf(series: DataFrame): DataFrame = {
    val hourly = series.localCheckpoint() // bounded: the hour grid
    val sStat = hourly.toDF("h1", "x1")
      .crossJoin(broadcast(hourly.toDF("h2", "x2")))
      .filter(col("h2") > col("h1"))
      .agg(coalesce(sum(expr("CAST(sign(x2 - x1) AS BIGINT)")),
        lit(0L)).as("s_stat"))
    val ties = hourly.groupBy(col("x")).agg(count(lit(1)).as("t"))
      .agg(coalesce(sum(expr(
          "CAST(t AS DECIMAL(38,0)) * (t - 1) * (2 * t + 5)")),
        lit(0).cast("decimal(38,0)")).as("tie18"))
    hourly.agg(count(lit(1)).as("n_hours"))
      .crossJoin(broadcast(sStat)).crossJoin(broadcast(ties))
      .withColumn("var18", expr(
        """CAST(CAST(n_hours AS DECIMAL(38,0)) * (n_hours - 1)
          | * (2 * n_hours + 5) - tie18 AS DECIMAL(38,0))"""
          .stripMargin))
      .withColumn("z_micro", expr(
        """CAST(round((s_stat - sign(s_stat)) * 1e6
          | / sqrt(CAST(nullif(var18, 0) AS DOUBLE) / 18.0))
          | AS BIGINT)""".stripMargin))
      // var18 decimal internally, BIGINT on the report row (the
      // round-14 decimal-output lesson); the hour grid is bounded so
      // n³ fits BIGINT to ~2e6 hours (~230 years)
      .select(col("n_hours"), col("s_stat"),
        col("var18").cast("long").as("var18"),
        col("z_micro"),
        expr("CAST(sign(s_stat) AS BIGINT)").as("trend_sign"))
  }

  /** q442: PAGE–HINKLEY CHANGE DETECTION over the hourly series
    * (Page 1954; Hinkley 1971) — the sequential drift alarm next to
    * q242's CUSUM changepoint: CUSUM locates ONE retrospective break
    * against a fixed pre-period mean, Page–Hinkley tracks the
    * RUNNING mean and flags every hour the cumulative positive
    * deviation exceeds λ — the online monitor a traffic guard
    * actually runs. Entirely integer: prefix mean ⌊cum/i⌋ per hour,
    * deviation sum m_t, running minimum M_t, alarm when
    * m_t − M_t > λ. All windows ride the BOUNDED hour grid (the
    * corpus collapses map-side to |hours| rows); one deterministic
    * path both engines replay — no float anywhere. */
  def pageHinkley(s: SparkSession, dir: String, lambda: Long = 50L)
      : DataFrame =
    pageHinkleyOf(Tables.events(s, dir)
      .groupBy(expr("ts div 3600000000").as("h"))
      .agg(count(lit(1)).as("x")), lambda)

  /** Test core over a pre-aggregated (h, x) series. */
  private[graft] def pageHinkleyOf(series: DataFrame, lambda: Long)
      : DataFrame = {
    val w = Window.orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, 0)
    series
      .withColumn("i", count(lit(1)).over(w))
      .withColumn("cum", sum(col("x")).over(w))
      .withColumn("dev", col("x") - expr("cum div i"))
      .withColumn("m_t", sum(col("dev")).over(w))
      .withColumn("m_min", min(col("m_t")).over(w))
      .withColumn("ph", col("m_t") - col("m_min"))
      .withColumn("alarm", col("ph") > lit(lambda))
      .select(col("h"), col("x"), col("m_t"), col("ph"), col("alarm"))
  }

  /** q444: LJUNG–BOX WHITENESS TEST over the hourly series (Ljung &
    * Box 1978) — the "is anything left to model?" number the whole
    * forecast ladder (q189 EWMA → q424 Holt → q253 STL) terminates
    * on: Q = n(n+2)·Σ_{k≤10} r_k²/(n−k) against the χ²₁₀ 95% cut.
    * q193 reports the per-lag correlogram; this collapses it to the
    * one portmanteau decision. Exactness discipline: deviations are
    * kept N-SCALED (dev = n·x − Σx — integer, no mean division),
    * per-lag autocovariance numerators and the common denominator
    * are exact DECIMAL(38,0) sums, |r_k| is micro-rounded ONCE per
    * BOUNDED lag row (abs before the division — truncation on
    * non-negative operands only), and Q is an integer chain against
    * the 18.307 milli literal. Lag pairing skips grid gaps exactly
    * like q193 (the documented semantics both engines replay). */
  def ljungBox(s: SparkSession, dir: String, maxLag: Int = 10)
      : DataFrame =
    ljungBoxOf(Tables.events(s, dir)
      .groupBy(expr("ts div 3600000000").as("h"))
      .agg(count(lit(1)).as("x")), maxLag)

  /** Test core over a pre-aggregated (h, x) series. */
  private[graft] def ljungBoxOf(series: DataFrame, maxLag: Int)
      : DataFrame = {
    val hourly = series.localCheckpoint() // bounded: the hour grid
    val stats = hourly.agg(count(lit(1)).as("n"), sum(col("x")).as("s1"))
    val dev = hourly.crossJoin(broadcast(stats))
      .select(col("h"), col("n"),
        (col("n") * col("x") - col("s1")).as("dev"))
    val den = dev.agg(
      sum(expr("CAST(dev AS DECIMAL(38,0)) * dev")).as("den"))
    val pairs = dev
      .withColumn("lag",
        explode(array((1 to maxLag).map(i => lit(i.toLong)): _*)))
      .join(dev.select(col("h").as("h2"), col("dev").as("dev2")),
        col("h2") === col("h") + col("lag"))
      .groupBy(col("lag"))
      .agg(max(col("n")).as("n"),
        sum(expr("CAST(dev AS DECIMAL(38,0)) * dev2")).as("num"))
    pairs.crossJoin(broadcast(den))
      .withColumn("r_abs_micro", expr(
        "CAST(abs(num) * 1000000 div nullif(den, 0) AS BIGINT)"))
      .withColumn("term_micro", expr(
        """CAST(CAST(n AS DECIMAL(38,0)) * (n + 2) * r_abs_micro
          | * r_abs_micro div ((n - lag) * 1000000) AS BIGINT)"""
          .stripMargin))
      .agg(max(col("n")).as("n_hours"),
        count(lit(1)).as("k_lags"),
        // den decimal internally, BIGINT on the report row (the
        // round-14 decimal-output lesson)
        max(col("den")).cast("long").as("den"),
        sum(col("term_micro")).as("q_micro"))
      .withColumn("reject_white",
        col("q_micro") > lit(18307000L)) // χ²₁₀ at 95%
  }

  /** q445: SEASONAL STRENGTH of the hourly series (the Fs statistic
    * of Wang, Smith & Hyndman 2006, as used by the feasts/tsfeatures
    * packages) — q253 decomposes; this grades the decomposition
    * with the single number a seasonality-aware scheduler keys on:
    * Fs = max(0, 1 − Var(resid)/Var(detrended)), 0 = no daily
    * cycle, →1 = the cycle explains everything. Rides q253's exact
    * integer decomposition verbatim (shared [[stlResiduals]] core);
    * both variances enter as N-scaled DECIMAL(38,0) NUMERATORS over
    * the same full-window hours, so the ratio needs no mean
    * subtraction float and the one division runs on non-negative
    * operands. A flat series (zero detrended variance) reads as
    * strength 0: the NULL ratio falls out of greatest(·, 0)
    * identically on both engines. */
  def seasonalStrength(s: SparkSession, dir: String): DataFrame =
    seasonalStrengthOf(hourlyCounts(s, dir))

  /** q451: THEIL-T TRAFFIC CONCENTRATION per event type (round-15,
    * VERDICT Next #7's batch half) — q449's decomposable inequality
    * number pointed at the OPERATIONAL question a capacity planner
    * asks of each stream: is this event type's traffic spread across
    * hours or concentrated in a few (T = 0 uniform, ln n maximal)?
    * The corpus collapses map-side to the BOUNDED (event_type, hour)
    * grid; per type the q449/q361 log discipline: ONE micro-rounded
    * ln per grid row (ln(x·n/X) — the share-vs-uniform log), exact
    * DECIMAL(38,0) count-weighted sums INTERNAL, one integer
    * division per reported number (BIGINT out — the round-14
    * representation rule). The same grid is exactly the state the
    * q452 stream maintains, which is what makes stream ≡ batch
    * checkable. */
  def theilHours(s: SparkSession, dir: String): DataFrame =
    theilHoursOf(Tables.events(s, dir)
      .groupBy(col("event_type"), expr("ts div 3600000000").as("h"))
      .agg(count(lit(1)).as("x")))

  /** Concentration core over a pre-aggregated (event_type, h, x)
    * grid — shared verbatim by batch q451 and the q452 stream
    * read-out (the gate-reuse discipline). */
  private[graft] def theilHoursOf(cells: DataFrame): DataFrame = {
    val grid = cells.localCheckpoint() // bounded: types × hours
    val tot = grid.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_hours"), sum(col("x")).as("total"))
    grid.join(broadcast(tot), "event_type")
      .select(col("event_type"), col("n_hours"), col("total"),
        expr("""CAST(x AS DECIMAL(38,0)) * CAST(round(ln(
          |  CAST(x AS DOUBLE) * n_hours / total) * 1e6) AS BIGINT)"""
          .stripMargin).as("c"))
      .groupBy(col("event_type"))
      .agg(max(col("n_hours")).as("n_hours"),
        max(col("total")).as("total"),
        expr("CAST(sum(c) div max(total) AS BIGINT)").as("t_micro"))
  }

  /** q456: CROSS-CORRELATION LEAD–LAG between the view and purchase
    * hourly series (the CCF — Box & Jenkins) — the inter-series
    * question the single-series family (q193 ACF, q444 Ljung–Box)
    * cannot ask: does view traffic LEAD purchase traffic, and by how
    * many hours? r(L) = corr(view_h, purchase_{h+L}) for L ∈ [−6, 6]
    * — the argmax lag is the funnel latency read at population grain
    * (q164 measures it per user; this is the aggregate echo). Pair
    * frames come from the BOUNDED hour grids (an equi-join on h+L,
    * gaps skip exactly like q193/q444), per-lag moments are exact
    * DECIMAL(38,0) sums INTERNAL, and each r is ONE fixed IEEE
    * expression micro-rounded on the ≤ 13-row lag frame. Degenerate
    * lags (either side constant) honestly yield NULL via nullif. */
  def ccfLeadLag(s: SparkSession, dir: String, maxLag: Int = 6)
      : DataFrame = {
    val ev = Tables.events(s, dir)
    def hourly(t: String) = ev.filter(col("event_type") === t)
      .groupBy(expr("ts div 3600000000").as("h"))
      .agg(count(lit(1)).as("x"))
    val vx = hourly("view").localCheckpoint()   // bounded: hour grid
    val py = hourly("purchase").toDF("h2", "y").localCheckpoint()
    val lags = (-maxLag to maxLag).map(_.toLong)
    vx.withColumn("lag",
        explode(array(lags.map(l => lit(l)): _*)))
      .join(py, col("h2") === col("h") + col("lag"))
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
        sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("syy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"))
      .withColumn("vxn", expr(
        """CAST(n_pairs AS DECIMAL(38,0)) * sxx
          | - CAST(sx AS DECIMAL(38,0)) * sx""".stripMargin))
      .withColumn("vyn", expr(
        """CAST(n_pairs AS DECIMAL(38,0)) * syy
          | - CAST(sy AS DECIMAL(38,0)) * sy""".stripMargin))
      // a degenerate lag (either side constant — e.g. one pair at an
      // extreme lag) honestly yields NULL via the variance guard
      .select(col("lag"), col("n_pairs"),
        when(col("vxn") > 0 && col("vyn") > 0,
          round(expr(
            """CAST(CAST(n_pairs AS DECIMAL(38,0)) * sxy
              | - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE)"""
              .stripMargin)
            / sqrt(col("vxn").cast("double") * col("vyn").cast("double"))
            * 1e6).cast("long")).as("r_micro"))
  }

  /** q462: HURST EXPONENT via rescaled range (Hurst 1951; R/S
    * analysis per Mandelbrot & Wallis) — the long-memory diagnostic
    * the forecast ladder reads before trusting any of its models:
    * H ≈ 0.5 means increments are memoryless (EWMA-class models
    * suffice), H > 0.5 means persistent trends (q271/q424 underreact),
    * H < 0.5 anti-persistent. R/S per segment (full window + the two
    * halves — the honest small-sample slope surface, not one point):
    * deviations kept N-SCALED (dev = n·x − Σx, integer), the
    * cumulative walk and its range ride a window over the BOUNDED
    * hour grid, Σdev² exact DECIMAL(38,0) INTERNAL, and the two
    * reported floats (R/S and H = ln(R/S)/ln(n/2)) are each ONE
    * fixed IEEE expression micro/milli-rounded on the 3-row segment
    * frame. */
  def hurstRs(s: SparkSession, dir: String): DataFrame =
    hurstRsOf(hourlyCounts(s, dir).toDF("h", "x"))

  /** R/S core over a pre-aggregated (h, x) series — factored so
    * specs can pin constructed constant/varied series. */
  private[graft] def hurstRsOf(hourlyIn: DataFrame): DataFrame = {
    val hourly = hourlyIn.localCheckpoint() // bounded: the hour grid
    val mid = hourly.agg(expr("CAST(min(h) + (max(h) - min(h) + 1) div 2"
      + " AS BIGINT)").as("mid"))
    val seg = hourly.crossJoin(broadcast(mid))
      .select(col("h"), col("x"),
        explode(array(lit(0L),
          when(col("h") < col("mid"), 1L).otherwise(2L))).as("seg"))
    val stats = seg.groupBy(col("seg"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("s1"))
    val dev = seg.join(broadcast(stats), "seg")
      .select(col("seg"), col("h"), col("n"),
        (col("n") * col("x") - col("s1")).as("dev"))
    val walk = dev.withColumn("cum",
      sum(col("dev")).over(Window.partitionBy(col("seg"))
        .orderBy(col("h"))
        .rowsBetween(Window.unboundedPreceding, 0)))
    walk.groupBy(col("seg"))
      .agg(max(col("n")).as("n_hours"),
        (greatest(max(col("cum")), lit(0L))
          - least(min(col("cum")), lit(0L))).as("r_scaled"),
        sum(expr("CAST(dev AS DECIMAL(38,0)) * dev")).as("sdd"))
      // a constant segment (sdd = 0, so R = 0 too) honestly yields
      // NULL — 0/0 has no rescaled range; nullif on both engines
      .select(col("seg"), col("n_hours"), col("r_scaled"),
        when(col("sdd") > 0,
          round(col("r_scaled").cast("double")
            / sqrt(col("sdd").cast("double")
              / col("n_hours").cast("double"))
            * 1e6).cast("long")).as("rs_micro"))
      .withColumn("h_milli",
        when(col("rs_micro") > 0,
          round(log(col("rs_micro").cast("double") / 1e6)
            / log(col("n_hours").cast("double") / 2.0) * 1e3)
            .cast("long")))
  }

  /** Test core over a pre-aggregated (h, n) series. */
  private[graft] def seasonalStrengthOf(hourlyIn: DataFrame)
      : DataFrame = {
    stlResiduals(hourlyIn)
      .agg(count(lit(1)).as("n_hours"),
        sum(col("resid_milli")).as("sr"),
        sum(expr("CAST(resid_milli AS DECIMAL(38,0)) * resid_milli"))
          .as("srr"),
        sum(col("detr_milli")).as("sd"),
        sum(expr("CAST(detr_milli AS DECIMAL(38,0)) * detr_milli"))
          .as("sdd"))
      .withColumn("vr_num", expr(
        """CAST(CAST(n_hours AS DECIMAL(38,0)) * srr
          | - CAST(sr AS DECIMAL(38,0)) * sr AS DECIMAL(38,0))"""
          .stripMargin))
      .withColumn("vd_num", expr(
        """CAST(CAST(n_hours AS DECIMAL(38,0)) * sdd
          | - CAST(sd AS DECIMAL(38,0)) * sd AS DECIMAL(38,0))"""
          .stripMargin))
      // variance numerators decimal internally, BIGINT on the
      // report row (the round-14 decimal-output lesson)
      .select(col("n_hours"),
        col("vr_num").cast("long").as("vr_num"),
        col("vd_num").cast("long").as("vd_num"),
        expr("""CAST(greatest(1000000 - vr_num * 1000000
          | div nullif(vd_num, 0), 0) AS BIGINT)""".stripMargin)
          .as("fs_ppm"))
  }
}
