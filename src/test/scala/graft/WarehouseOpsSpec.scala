package graft

import org.apache.spark.sql.functions._
import graft.operators.{Bucketing, Dedup, Events, Incremental, RangeJoin,
  Relational, Sketch, StreamingOps, TextAnalysis}

/** Semantics pins for the round-8 warehouse/analytics closers:
  * q241 RFM segmentation, q242 CUSUM changepoints, q243 soft-dedup
  * weights, q244 bitmask retention. */
class WarehouseOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- q242 CUSUM -------------------------------------------------

  private def hourly(rows: Seq[(Long, Long)]) =
    rows.toDF("h", "n")

  test("cusum: flat series raises no alarms") {
    val flat = hourly((0L until 96L).map(h => (h, 10L)))
    assert(Events.cusumFrom(flat).count() === 0)
  }

  test("cusum: sustained upward shift alarms once, changepoint at the shift") {
    // 10/hour for 48h, then 40/hour for 48h: global mean 25, the
    // up-side drift target is 5/4·25 = 31.25 < 40, so S+ grows from
    // h=48 on and must cross 2μ=50 within a few hours; the prefix
    // min is pinned at h=47 (P decreases while x < target).
    val shifted = hourly((0L until 96L).map(h => (h, if (h < 48) 10L else 40L)))
    val out = Events.cusumFrom(shifted).collect()
    val ups = out.filter(_.getString(0) == "up")
    assert(ups.length === 1, s"expected one up onset, got ${out.mkString(";")}")
    val up = ups.head
    val h = up.getLong(1)
    assert(h >= 48 && h <= 56, s"onset at $h")
    assert(up.getLong(4) === 47L, "changepoint = last prefix-min hour")
    // mean_milli = 25.000
    assert(up.getLong(5) === 25000L)
  }

  test("cusum: sustained drop alarms on the down side") {
    val dropped = hourly((0L until 96L).map(h => (h, if (h < 48) 40L else 10L)))
    val downs = Events.cusumFrom(dropped).collect()
      .filter(_.getString(0) == "down")
    assert(downs.length === 1)
    assert(downs.head.getLong(4) === 47L)
  }

  test("cusum: missing hours fill as zero and drive the down side") {
    // present hours 0..47 at 40/hour, then nothing until a final
    // marker hour 95 — the gap reads as x=0, a level DROP.
    val gappy = hourly((0L until 48L).map(h => (h, 40L)) :+ (95L, 40L))
    val downs = Events.cusumFrom(gappy).collect()
      .filter(_.getString(0) == "down")
    assert(downs.nonEmpty, "gap hours must alarm the down side")
  }

  // ---- q241 RFM ---------------------------------------------------

  test("rfm: scores bounded 1..5, customers conserved, grid non-trivial") {
    val seg = Relational.rfmSegments(spark, sfDir).collect()
    for (r <- seg; i <- 0 to 2)
      assert(r.getLong(i) >= 1L && r.getLong(i) <= 5L)
    val nCustWithOrders = Tables.orders(spark, sfDir)
      .select(countDistinct(col("o_custkey"))).as[Long].head()
    assert(seg.map(_.getLong(3)).sum === nCustWithOrders)
    // quintiles over a non-degenerate metric must spread scores
    assert(seg.map(_.getLong(2)).distinct.length >= 3, "m_score spread")
  }

  test("rfm: total_cents conserved against the raw fact table") {
    val seg = Relational.rfmSegments(spark, sfDir)
      .agg(sum(col("total_cents"))).as[Long].head()
    val raw = Tables.orders(spark, sfDir)
      .select(expr("cast(round(o_totalprice * 100) as bigint)").as("c"))
      .agg(sum(col("c"))).as[Long].head()
    assert(seg === raw)
  }

  // ---- q244 bitmask retention ------------------------------------

  test("bitmask retention: k=0 diagonal is exactly 1e6 ppm") {
    val rows = Events.bitmaskRetention(spark, sfDir).collect()
    val k0 = rows.filter(_.getLong(1) == 0L)
    assert(k0.nonEmpty)
    for (r <- k0) {
      assert(r.getLong(3) === r.getLong(2), "cohort day itself is active")
      assert(r.getLong(4) === 1000000L)
    }
    for (r <- rows) assert(r.getLong(3) <= r.getLong(2))
  }

  test("bitmask retention: matches the direct distinct-join formulation") {
    // independent computation: per-user active-day set via distinct
    // rows, cohort = min day, offset membership by join — the shape
    // the bitmask replaces
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), expr("ts div 86400000000").as("day"))
    val d0 = ev.agg(min(col("day"))).as[Long].head()
    val days = ev.select(col("user_id"), (col("day") - d0).as("d"))
      .filter(col("d") < 63).distinct()
    val cohorts = days.groupBy("user_id").agg(min(col("d")).as("cohort"))
    val expected = cohorts
      .select(col("user_id"), col("cohort"),
        explode(sequence(lit(0), lit(7))).as("k"))
      .withColumn("k", col("k").cast("long"))
      .filter(col("cohort") + col("k") < 63)
      .join(days.withColumnRenamed("d", "dk"),
        Seq("user_id"), "left")
      .groupBy(col("cohort"), col("k"))
      .agg(countDistinct(col("user_id")).as("n_cohort"),
        countDistinct(when(col("dk") === col("cohort") + col("k"),
          col("user_id"))).as("n_active"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val got = Events.bitmaskRetention(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(got === expected)
  }

  // ---- q243 soft-dedup weights -----------------------------------

  test("softdedup: retention bounded, consistent with the component sizes") {
    val rep = Dedup.softdedupWeights(spark, sfDir).collect()
    assert(rep.nonEmpty)
    for (r <- rep) {
      assert(r.getLong(4) <= 1000000L, "retention cannot exceed 1e6 ppm")
      assert(r.getLong(2) <= r.getLong(1), "clustered docs <= docs")
      if (r.getLong(2) == 0L)
        assert(r.getLong(4) === 1000000L,
          "a source with no clustered docs keeps full weight")
    }
    // global effective mass equals the independent per-cluster sum
    val comp = Dedup.dedupComponents(spark, sfDir)
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"))
    val sizes = docs.join(comp, Seq("doc_id"), "left")
      .withColumn("cluster", coalesce(col("component"), col("doc_id")))
      .groupBy("cluster").agg(count(lit(1)).as("csize"))
    val expectedEff = sizes
      .select(expr("csize * (1000000L div csize)").as("mass"))
      .agg(sum(col("mass"))).as[Long].head()
    assert(rep.map(_.getLong(3)).sum === expectedEff)
  }

  // ---- q245 interval overlap join ---------------------------------

  test("intervalOverlap: matches the naive inequality join, half-open") {
    val left = Seq((1L, 0L, 100L), (2L, 100L, 200L), (3L, 250L, 260L))
      .toDF("lid", "ls", "le")
    val right = Seq((10L, 50L, 150L), (20L, 200L, 300L), (30L, 400L, 500L))
      .toDF("rid", "rs", "re")
    val got = RangeJoin.intervalOverlap(left, right,
        "ls", "le", "rs", "re", 64L)
      .select(col("lid"), col("rid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // [0,100)∩[50,150)≠∅; [100,200)∩[50,150)≠∅; [250,260)∩[200,300)≠∅;
    // [100,200) does NOT meet [200,300) (half-open endpoints touch)
    assert(got === Set((1L, 10L), (2L, 10L), (3L, 20L)))
  }

  test("intervalOverlap: a pair spanning many shared buckets emits once") {
    val left = Seq((1L, 0L, 1000L)).toDF("lid", "ls", "le")
    val right = Seq((10L, 1L, 999L)).toDF("rid", "rs", "re")
    assert(RangeJoin.intervalOverlap(left, right,
      "ls", "le", "rs", "re", 16L).count() === 1L)
  }

  test("q245: overlap seconds bounded by the 2h window") {
    for (r <- Events.sessionMaintenanceOverlap(spark, sfDir).collect()) {
      assert(r.getLong(3) <= 7200L * r.getLong(1),
        "per-session overlap cannot exceed the window length")
      assert(r.getLong(2) <= r.getLong(1), "users <= sessions")
    }
  }

  // ---- q246 revenue gini -----------------------------------------

  test("gini: bounded [0,1000), top20 share >= 200000 ppm by definition") {
    val rows = Relational.revenueGini(spark, sfDir).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val g = r.getLong(3)
      assert(g >= 0L && g < 1000L, s"gini $g out of range")
      // the top 20% of an ascending ranking always carries at least
      // its proportional share
      assert(r.getLong(4) >= 200000L - 1000000L / r.getLong(1))
    }
  }

  test("gini: equal values give gini 0, one-owner gives ~1") {
    // identity check on the formula via a synthetic segment table is
    // implicit in the oracle; here pin the two analytic extremes by
    // direct computation of the same expression
    def gini(xs: Seq[Long]): Long = {
      val n = xs.length.toLong
      val sorted = xs.sorted
      val ixc = sorted.zipWithIndex.map { case (x, i) =>
        BigInt(i + 1) * BigInt(x) }.sum
      val tot = BigInt(sorted.sum)
      ((BigInt(2) * ixc - BigInt(n + 1) * tot) * 1000 / (BigInt(n) * tot))
        .toLong
    }
    assert(gini(Seq(5L, 5L, 5L, 5L)) === 0L)
    assert(gini(Seq(0L, 0L, 0L, 100L)) === 750L) // (n-1)/n scaled
  }

  // ---- q248 vocab coverage ---------------------------------------

  test("vocab coverage: monotone in pct, exact vs the full-sort walk") {
    val rows = TextAnalysis.vocabCoverage(spark, sfDir).collect()
      .sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq === Seq(50L, 90L, 99L))
    val needed = rows.map(_.getLong(2))
    assert(needed.sorted.toSeq === needed.toSeq, "coverage is monotone")
    // independent full-sort reference
    val counts = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy("tok").agg(count(lit(1)).as("n"))
      .collect().map(_.getLong(1)).sortBy(-_)
    val total = counts.sum
    for (r <- rows) {
      val target = (total * r.getLong(0) + 99) / 100
      var acc = 0L; var k = 0
      while (acc < target) { acc += counts(k); k += 1 }
      assert(r.getLong(2) === k.toLong, s"pct ${r.getLong(0)}")
      assert(r.getLong(3) === counts.length.toLong)
    }
  }

  // ---- q253 STL decomposition ------------------------------------

  test("stl: constant series decomposes to zero seasonal and residual") {
    val flat = (0L until 96L).map(h => (h, 42L)).toDF("h", "n")
    val rows = Events.stlFrom(flat).collect()
    assert(rows.length === 24)
    for (r <- rows) {
      assert(r.getLong(2) === 0L, "seasonal")
      assert(r.getLong(3) === 0L, "mean abs resid")
      assert(r.getLong(4) === 0L, "max abs resid")
    }
  }

  test("stl: a daily cycle lands in the seasonal column, not residual") {
    // hod 5 carries +24 traffic every day; 10 days of data
    val cyc = (0L until 240L).map(h =>
      (h, 100L + (if (h % 24 == 5) 24L else 0L))).toDF("h", "n")
    val rows = Events.stlFrom(cyc).collect()
    val best = rows.maxBy(_.getLong(2))
    assert(best.getLong(0) === 5L, "seasonal peak at the boosted hour")
    assert(best.getLong(2) > 20000L, "most of the +24 is seasonal")
    assert(rows.map(_.getLong(3)).max < 3000L,
      "residual magnitude well below the cycle amplitude")
  }

  // ---- q254 window funnel ----------------------------------------

  test("window funnel: bounded by the unbounded funnel, sane delays") {
    val rows = Events.windowFunnel(spark, sfDir).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getLong(2) <= r.getLong(1), "conversions <= users")
      assert(r.getLong(3) <= 1000000L)
      if (!r.isNullAt(4))
        assert(r.getLong(4) <= 86400000L, "delay within the 24h box")
    }
    // the 24h box can only lose conversions vs q16's unbounded funnel
    val unbounded = Events.windowFunnel(spark, sfDir,
      windowMicros = Long.MaxValue / 2).collect().map(_.getLong(2)).sum
    assert(rows.map(_.getLong(2)).sum <= unbounded)
  }

  // ---- q255 alignment filter -------------------------------------

  test("alignment filter: distances bounded by 64 bits, counts consistent") {
    val rows = graft.operators.Multimodal.alignmentFilter(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val nDocs65 = Tables.documents(spark, sfDir)
      .filter(length(col("text")) >= 65).count()
    assert(rows.map(_.getLong(1)).sum === nDocs65,
      "every >=65-byte doc scored exactly once")
    for (r <- rows) {
      assert(r.getLong(3) <= 64L, "hamming over 64-bit codes")
      assert(r.getLong(4) <= r.getLong(1))
      assert(r.getLong(5) === r.getLong(4) * 1000000L / r.getLong(1))
    }
  }

  // ---- q256 co-purchase top-k ------------------------------------

  test("copurchase topk: dense ranks 1..k, symmetric edge consistency") {
    val rows = Relational.copurchaseTopK(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byPart = rows.groupBy(_.getLong(0))
    for ((_, rs) <- byPart) {
      assert(rs.map(_.getLong(1)).sorted.toSeq ===
        (1L to rs.length.toLong), "dense ranks")
      val lifts = rs.sortBy(_.getLong(1)).map(_.getLong(3))
      assert(lifts.sorted.reverse.toSeq === lifts.toSeq, "lift descending")
      assert(rs.length <= 3)
    }
    // symmetry: if (a, b) is in the pair set, b appears under a and
    // a under b with the SAME lift whenever both make their top-3
    val asMap = rows.map(r =>
      (r.getLong(0), r.getLong(2)) -> r.getLong(3)).toMap
    for (((a, b), lift) <- asMap; l2 <- asMap.get((b, a)))
      assert(l2 === lift, s"asymmetric lift for ($a,$b)")
  }

  // ---- q257 CSV ingest -------------------------------------------

  test("csv ingest: quarantine counts exactly the injected corruption") {
    val rows = graft.operators.Pipeline.csvIngest(spark, sfDir).collect()
    val docs = Tables.documents(spark, sfDir)
    val nDocs = docs.count()
    val nBad = docs.filter(col("doc_id") % 50 === 0).count()
    assert(rows.map(_.getLong(1)).sum === nDocs, "no row lost in transit")
    assert(rows.map(_.getLong(2)).sum === nBad, "quarantine = injected set")
    val cleanChars = docs.filter(col("doc_id") % 50 =!= 0)
      .agg(sum(col("n_chars"))).as[Long].head()
    assert(rows.map(_.getLong(3)).sum === cleanChars)
  }

  // ---- q259 temporal split ---------------------------------------

  test("temporal split: users and events conserved across classes") {
    val rows = graft.operators.Pipeline.temporalSplit(spark, sfDir).collect()
    val ev = Tables.events(spark, sfDir)
    assert(rows.map(_.getLong(1)).sum ===
      ev.select(countDistinct(col("user_id"))).as[Long].head())
    assert(rows.map(r => r.getLong(2) + r.getLong(3)).sum === ev.count())
    for (r <- rows) r.getString(0) match {
      case "train_only" => assert(r.getLong(3) === 0L)
      case "test_only"  => assert(r.getLong(2) === 0L)
      case "both"       => assert(r.getLong(2) > 0L && r.getLong(3) > 0L)
    }
  }

  // ---- q260 JL projection ----------------------------------------

  test("jl projection: distance ratios centered near 1e6 within JL bounds") {
    val r = graft.operators.Similarity.jlProjection(spark, sfDir).head()
    assert(r.getLong(0) > 10L, "enough audited pairs")
    val mean = r.getLong(1)
    assert(mean > 700000L && mean < 1400000L,
      s"mean squared-distance ratio $mean far from 1e6")
    assert(r.getLong(2) > 0L, "no degenerate zero projection")
    assert(r.getLong(2) <= mean && mean <= r.getLong(3))
  }

  // ---- q261 two-hop reach ----------------------------------------

  test("two-hop reach: dominates degree, bounded by the component") {
    val rows = Dedup.twoHopReach(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val compSizes = Dedup.dedupComponents(spark, sfDir)
      .groupBy(col("component")).agg(count(lit(1)).as("sz"))
      .join(Dedup.dedupComponents(spark, sfDir), Seq("component"))
      .select(col("doc_id"), col("sz")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (r <- rows) {
      assert(r.getLong(2) >= r.getLong(1), "reach2 includes the 1-hop shell")
      assert(r.getLong(3) >= 1000000L)
      assert(r.getLong(2) <= compSizes(r.getLong(0)) - 1,
        "2-hop shell cannot exceed the component")
    }
  }

  // ---- q262 max versions -----------------------------------------

  test("max versions: at most 3 per (row, qualifier), newest first") {
    val rows = Events.maxVersionsRead(spark, sfDir).collect()
    val byKey = rows.groupBy(r => (r.getLong(0), r.getString(1)))
    for ((_, vs) <- byKey) {
      assert(vs.length <= 3)
      val sorted = vs.sortBy(_.getLong(2))
      assert(sorted.map(_.getLong(2)).toSeq === (1L to vs.length.toLong))
      // version order is (ts desc, seq desc)
      val keys = sorted.map(r => (r.getLong(3), r.getLong(5)))
      assert(keys.sortBy(k => (-k._1, -k._2)).toSeq === keys.toSeq)
    }
    val nGroups = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type")).distinct().count()
    assert(byKey.size.toLong === nGroups, "every (row, qualifier) represented")
  }

  // ---- q263 consumer lag -----------------------------------------

  test("consumer lag: visibility and lag bounds per subscription") {
    val rows = StreamingOps.consumerLag(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet === Set("all", "clicks", "purchases", "payloads"))
    val nEvents = Tables.events(spark, sfDir).count()
    assert(rows("all").getLong(2) === nEvents)
    assert(rows("payloads").getLong(2) === nEvents,
      "every mutation carries a props cell")
    for ((_, r) <- rows) {
      assert(r.getLong(3) <= r.getLong(2), "pending <= visible")
      assert(r.getLong(6) <= 220000L,
        "acks at 80-99% of the span keep lag near-bounded")
      if (r.getLong(3) > 0) assert(!r.isNullAt(5), "staleness present")
    }
  }

  // ---- q264 ABC classes ------------------------------------------

  test("abc: shares partition, A covers >= 80%, parts conserved") {
    val rows = Relational.abcClasses(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet === Set("A", "B", "C"))
    assert(rows("A").getLong(3) >= 800000L, "A reaches the 80% mass")
    assert(rows("A").getLong(3) + rows("B").getLong(3) >= 950000L)
    val sharesSum = rows.values.map(_.getLong(3)).sum
    assert(sharesSum >= 999998L && sharesSum <= 1000000L, "ppm partition")
    val nParts = Tables.lineitem(spark, sfDir)
      .select(countDistinct(col("l_partkey"))).as[Long].head()
    assert(rows.values.map(_.getLong(1)).sum === nParts)
  }

  // ---- q265 spike attribution ------------------------------------

  test("spike attribution: per-hour type counts rebuild the spiked total") {
    val rows = Events.spikeAttribution(spark, "/root/testdata/sf0.01")
      .collect()
    assert(rows.nonEmpty, "sf0.01 has q163 spikes to attribute")
    val byHour = rows.groupBy(_.getLong(0))
    val hourly = Tables.events(spark, "/root/testdata/sf0.01")
      .groupBy(expr("ts div 3600000000").as("h"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for ((h, rs) <- byHour) {
      assert(rs.map(_.getLong(2)).sum === hourly(h),
        "type counts partition the hour total")
      // a spike hour must have at least one positive contributor
      assert(rs.map(_.getLong(4)).max > 0L)
    }
  }

  // ---- q267 event debounce ---------------------------------------

  test("event debounce: accounting closes, burst actually collapses") {
    val rows = Events.eventDebounce(spark, sfDir).collect()
    val perType = Tables.events(spark, sfDir)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for (r <- rows) {
      assert(r.getLong(1) === perType(r.getString(0)))
      assert(r.getLong(3) === r.getLong(1) - r.getLong(2))
    }
    // tightening the gap can only drop fewer events
    val tight = Events.eventDebounce(spark, sfDir, gapMicros = 60000000L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    for (r <- rows) assert(tight(r.getString(0)) <= r.getLong(2))
  }

  // ---- q268 SQL API ----------------------------------------------

  test("sql api: literal SQL equals the DataFrame formulation row-for-row") {
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.map(String.valueOf)).map(_.mkString("|"))
        .sorted.toSeq
    assert(canon(Relational.sqlApi(spark, sfDir)) ===
      canon(Relational.pricingSummary(spark, sfDir)))
  }

  // ---- q266 degree assortativity ---------------------------------

  test("assortativity: bounded in [-1,1] on the real graph, exact on stars") {
    val r = Dedup.degreeAssortativity(spark, sfDir).head()
    if (!r.isNullAt(3)) {
      val a = r.getDouble(3)
      assert(a >= -1.0 && a <= 1.0)
    }
    // analytic pin: a perfect star is maximally disassortative; the
    // same moment formula on a K3 clique degenerates (zero variance)
    def moments(edges: Seq[(Long, Long)]): Option[Double] = {
      val adj = edges ++ edges.map(e => (e._2, e._1))
      val deg = adj.groupBy(_._1).map { case (v, es) => v -> es.length.toLong }
      val pairs = adj.map { case (v, u) => (deg(v), deg(u)) }
      val n = BigInt(pairs.length)
      val sx = BigInt(pairs.map(_._1).sum); val sy = BigInt(pairs.map(_._2).sum)
      val sxx = BigInt(pairs.map(p => p._1 * p._1).sum)
      val syy = BigInt(pairs.map(p => p._2 * p._2).sum)
      val sxy = BigInt(pairs.map(p => p._1 * p._2).sum)
      val vx = n * sxx - sx * sx; val vy = n * syy - sy * sy
      if (vx <= 0 || vy <= 0) None
      else Some((n * sxy - sx * sy).toDouble /
        (math.sqrt(vx.toDouble) * math.sqrt(vy.toDouble)))
    }
    val star = moments(Seq((0L, 1L), (0L, 2L), (0L, 3L))).get
    assert(math.abs(star - (-1.0)) < 1e-9, "star graph r = -1")
    assert(moments(Seq((0L, 1L), (1L, 2L), (2L, 0L))).isEmpty,
      "regular clique has zero degree variance")
  }

  // ---- q271 Theil-Sen forecast -----------------------------------

  test("theil-sen: exact on a linear series, robust to one outlier") {
    val linear = (0L until 30L).map(h => (h, 100L + 3L * h)).toDF("h", "n")
    val r = Events.theilSenFrom(linear).head()
    assert(r.getLong(4) === 1L || r.getLong(3) / r.getLong(4) === 3L)
    assert(r.getLong(5) === 3000L, "slope 3 exactly")
    assert(r.getLong(6) === (100L + 3L * 29L) * 1000L + 3000L,
      "forecast = next point on the line")
    // corrupt one interior point 10x: the slope MEDIAN must not move
    val spiked = (0L until 30L).map(h =>
      (h, if (h == 15L) 3000L else 100L + 3L * h)).toDF("h", "n")
    val r2 = Events.theilSenFrom(spiked).head()
    assert(math.abs(r2.getLong(5) - 3000L) <= 1000L,
      s"median slope ${r2.getLong(5)} dragged by a single outlier")
  }

  // ---- q272 CBO skew audit ---------------------------------------

  test("cbo skew: actual dominates the uniform estimate (Cauchy-Schwarz)") {
    val rows = Relational.cboSkewAudit(spark, sfDir).collect()
    assert(rows.map(_.getString(0)).toSet ===
      Set("user_id", "event_type", "day"))
    val nEvents = Tables.events(spark, sfDir).count()
    for (r <- rows) {
      assert(r.getLong(1) === nEvents)
      assert(r.getLong(4) >= r.getLong(3), "actual >= uniform estimate")
      assert(r.getLong(5) >= 999999L, "ratio >= ~1e6 ppm")
    }
  }

  // ---- q249 IVM join ---------------------------------------------

  test("ivm join: quadrants partition the full join exactly") {
    val quads = Incremental.ivmJoin(spark, sfDir).collect()
    assert(quads.map(_.getString(1)).distinct.length === 4,
      "all four delta quadrants materialize")
    val full = Tables.orders(spark, sfDir)
      .join(Tables.lineitem(spark, sfDir),
        col("o_orderkey") === col("l_orderkey"))
      .agg(count(lit(1)),
        sum(expr("cast(round(l_extendedprice * (1 - l_discount) * 100) as bigint)")))
      .head()
    assert(quads.map(_.getLong(2)).sum === full.getLong(0))
    assert(quads.map(_.getLong(3)).sum === full.getLong(1))
  }

  // ---- q250 KMV sketches -----------------------------------------

  test("kmv: complete sketches degrade to exact set algebra") {
    // with k=64 > the ~25 distinct contents per source, every sketch
    // is complete and the estimators must be EXACT
    for (r <- Sketch.kmvOverlap(spark, sfDir, k = 64).collect()) {
      val (na, nb, estU, jacc, estI, exactI) = (r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))
      val exactUnion = na + nb - exactI
      if (na < 64 && nb < 64) {
        assert(estU === exactUnion, s"${r.getString(0)}x${r.getString(1)}")
        assert(estI === exactI)
        assert(jacc === exactI * 1000000L / exactUnion)
      }
    }
  }

  test("kmv: truncated sketches estimate within the error budget") {
    // the gate default k=16 truncates on the 25-distinct sources; a
    // single deterministic draw per pair, so bound loosely per pair
    // and tightly in aggregate (k=16 stderr ~ 26%)
    val rows = Sketch.kmvOverlap(spark, sfDir).collect()
    assert(rows.forall(_.getLong(2) > 16L), "sketches actually truncated")
    var relErrPpmSum = 0L
    for (r <- rows) {
      val exactUnion = r.getLong(2) + r.getLong(3) - r.getLong(7)
      val est = r.getLong(4)
      assert(est > exactUnion / 4 && est < exactUnion * 4,
        s"union estimate $est vs $exactUnion")
      relErrPpmSum += math.abs(est - exactUnion) * 1000000L / exactUnion
    }
    assert(relErrPpmSum / rows.length < 400000L,
      "mean relative union error under 40%")
  }

  // ---- q251 partition bloom --------------------------------------

  test("partition bloom: never a false negative, skip rate consistent") {
    val rows = Bucketing.partitionBloomAudit(spark, "/root/testdata/sf0.01")
      .collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getLong(3) >= r.getLong(2), "bloom hit every true partition")
      assert(r.getLong(4) === r.getLong(3) - r.getLong(2))
      assert(r.getLong(5) ===
        (r.getLong(1) - r.getLong(3)) * 1000000L / r.getLong(1))
    }
  }
}
