package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._

/** Approximate-counting sketches (LLM-pipeline operators).
  *
  * A count-min sketch answers "how often does token X appear in the
  * 100 TB corpus" from d·w counters instead of a |vocab|-sized exact
  * table: each occurrence increments one counter per hash row, the
  * estimate is the min over rows (always ≥ truth). The hash family is
  * the md5 bucket family, so the sketch — and its error — is
  * bit-reproducible across engines and replayable by the oracle.
  */
object Sketch {

  /** q60: build a d=4 × w=256 count-min sketch over corpus tokens,
    * then audit it against the exact top-20 counts (est ≥ n always;
    * est−n is the collision error). The sketch build is one groupBy of
    * (row, bucket) — 1024 counters regardless of corpus size; the
    * exact side exists only as the audit. */
  def countMinAudit(s: SparkSession, dir: String, rows: Int = 4,
      buckets: Int = 256): DataFrame = {
    val tok = Tables.documents(s, dir)
      .select(explode(tokens(col("text"))).as("tok"))
    def bucket(r: Int) =
      Sampling.hashBucket(concat(lit(s"cm$r|"), col("tok"))) % buckets
    val hashed = tok.select(col("tok"),
      explode(array((0 until rows).map(r =>
        struct(lit(r).as("r"), bucket(r).as("b"))): _*)).as("rb"))
      .select(col("tok"), col("rb.r").as("r"), col("rb.b").as("b"))
    val sketch = hashed.groupBy(col("r"), col("b")).agg(count(lit(1)).as("cnt"))
    val top = tok.groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok")).limit(20)
    val topBuckets = top.select(col("tok"), col("n"),
      explode(array((0 until rows).map(r =>
        struct(lit(r).as("r"), bucket(r).as("b"))): _*)).as("rb"))
      .select(col("tok"), col("n"), col("rb.r").as("r"), col("rb.b").as("b"))
    topBuckets.join(sketch, Seq("r", "b"))
      .groupBy(col("tok"), col("n"))
      .agg(min(col("cnt")).as("est"))
      .select(col("tok").as("token"), col("n"), col("est"))
  }

  /** HLL max-rank registers over a (group, k) keyed frame →
    * (group..., reg, mreg). Registers are a max-lattice: sketches
    * built on ANY split of the data merge losslessly with a plain
    * `max` per register (proven in ApproxSpec), which is what lets
    * 1000 executors sketch independently and combine 256 longs each. */
  private[graft] def hllRegistersBy(keyed: DataFrame, groups: String*): DataFrame = {
    val gs = groups.map(col)
    val h = keyed.select(gs :+ md5(col("k").cast("binary")).as("h"): _*)
      .select(gs ++ Seq(
        conv(substring(col("h"), 1, 2), 16, 10).cast("long").as("reg"),
        conv(substring(col("h"), 3, 8), 16, 10).cast("long").as("v")): _*)
    h.withColumn("rank",
        // v = 0 (all 32 window bits zero) has rank 33 per the HLL spec
        // (leading zeros + 1); probability ~2^-32, but the estimator
        // should not deviate from the spec even there
        when(col("v") === 0, lit(33L))
          .otherwise(lit(33L) - length(conv(col("v"), 10, 2)).cast("long")))
      .groupBy(gs :+ col("reg"): _*)
      .agg(max(col("rank")).as("mreg"))
  }

  private[graft] def hllRegisters(keyed: DataFrame): DataFrame =
    hllRegistersBy(keyed, "event_type")

  /** The q92 estimator over a (group..., reg, mreg) register frame:
    * integer harmonic sum Σ 2^(41−M) (every term an exact long —
    * order-independent), one IEEE division, linear-counting fallback
    * for the small range. `est_unrounded` is the estimate; the same
    * literals appear in the oracle SQL. */
  private[graft] def hllEstimate(regs: DataFrame, groups: String*): DataFrame = {
    val m = 256
    val alpha = 0.7213 / (1 + 1.079 / m) // same IEEE literals as the oracle
    regs.groupBy(groups.map(col): _*)
      .agg(count(lit(1)).as("n_occupied"),
        sum(expr("shiftleft(1L, cast(41 - mreg as int))")).as("s_occ"))
      .withColumn("zeros", lit(m.toLong) - col("n_occupied"))
      .withColumn("s_all", col("s_occ") + col("zeros") * lit(2199023255552L))
      .withColumn("raw_est",
        lit(alpha * m * m * 2199023255552.0) / col("s_all").cast("double"))
      .withColumn("est_unrounded",
        when(col("zeros") > 0 && col("raw_est") <= lit(2.5 * m),
          lit(m.toDouble) * log(lit(m.toDouble) / col("zeros").cast("double")))
          .otherwise(col("raw_est")))
  }

  /** (event_type, k=user|day) keyed view of the events table. */
  private[graft] def dauKeyed(s: SparkSession, dir: String): DataFrame = {
    val key = concat(col("user_id").cast("string"), lit("|"),
      expr("ts div 86400000000").cast("string"))
    Tables.events(s, dir).select(col("event_type"), key.as("k"))
  }

  /** q92: HyperLogLog distinct sketch + audit — estimate per-type
    * daily-active-user cardinality (distinct (user, day) pairs) from
    * m=256 max-rank registers instead of a distinct-key shuffle, then
    * audit vs the exact count.
    *
    * Why it scales: exact count-distinct shuffles every key; the HLL
    * build is one map-side-combinable `max` agg over (group, register)
    * — 256 longs per group regardless of corpus size, and registers
    * merge across partitions/days with plain `max` (the mergeability
    * that makes HLL the standard 100 TB cardinality tool). The md5
    * register/rank split (nibbles 1-2 → register, 3-10 → 32-bit rank
    * window) is engine-reproducible, so the oracle replays the sketch
    * bit-for-bit, including its error. Determinism note: the harmonic
    * sum Z = Σ 2^-Mj is computed as the INTEGER Σ 2^(41-Mj) (ranks are
    * ≤ 32, so every term is an exact long and the sum is
    * order-independent), divided out as one IEEE double division at
    * the end; the small-range linear-counting correction uses the
    * same CASE on both engines.
    */
  def hllAudit(s: SparkSession, dir: String, m: Int = 256): DataFrame = {
    require(m == 256, "register split below is hardwired to 2 hex nibbles")
    val ev = dauKeyed(s, dir)
    val sums = hllEstimate(hllRegisters(ev), "event_type")
    val exact = ev
      .groupBy(col("event_type"))
      .agg(countDistinct(col("k")).as("n_exact"))
    sums.join(exact, "event_type")
      .select(col("event_type"), col("n_exact"), col("n_occupied"),
        round(col("est_unrounded"), 4).as("est"),
        round(abs(col("est_unrounded") - col("n_exact")) / col("n_exact"), 4)
          .as("rel_err"))
  }

  /** q125: cross-source vocabulary overlap via HLL SET ALGEBRA — the
    * pairwise |A∩B| audit a 100 TB corpus run wants for every source
    * pair without ever joining token sets: per-source HLL registers
    * (256 longs each, one map-side-combinable `max` agg over the
    * token stream), pairwise UNION by register-wise max (exact under
    * max-merge — the lattice property ApproxSpec proves), and
    * intersection by inclusion–exclusion est(A)+est(B)−est(A∪B).
    * Sketch state is |sources|·256 longs; the pair matrix costs
    * |pairs|·256 rows of register arithmetic — independent of corpus
    * size, vs the token-keyed self-join the exact audit side runs
    * (bounded fanout: a token expands to its ≤|sources|² pairs, never
    * doc × doc). I–E is the known high-variance intersection
    * estimator — the audit column IS the point: the md5 sketch is
    * deterministic, so the oracle replays the estimate and its error
    * bit-for-bit.
    *
    * The pair enumeration joins the tiny distinct-source frame to the
    * register frame twice on source equality (broadcast equi-joins) —
    * never an OR-condition join (which would plan as a nested loop).
    */
  def hllOverlap(s: SparkSession, dir: String): DataFrame = {
    val st = Tables.documents(s, dir)
      .select(col("source"), explode(tokens(col("text"))).as("k"))
    val regs = hllRegistersBy(st, "source")
    val single = hllEstimate(regs, "source")
      .select(col("source"), col("est_unrounded"))
    val pairs = single.toDF("source_a", "est_a").as("a")
      .join(single.toDF("source_b", "est_b").as("b"),
        col("source_a") < col("source_b"))
    val regsA = broadcast(pairs.select(col("source_a"), col("source_b")))
      .join(regs, col("source_a") === col("source"))
    val regsB = broadcast(pairs.select(col("source_a"), col("source_b")))
      .join(regs, col("source_b") === col("source"))
    val unionRegs = regsA.unionByName(regsB)
      .groupBy(col("source_a"), col("source_b"), col("reg"))
      .agg(max(col("mreg")).as("mreg"))
    val estU = hllEstimate(unionRegs, "source_a", "source_b")
      .select(col("source_a"), col("source_b"),
        col("est_unrounded").as("est_u"))
    val distinctTok = st.distinct()
    val exact = distinctTok.toDF("source_a", "k")
      .join(distinctTok.toDF("source_b", "k"), "k")
      .filter(col("source_a") < col("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_exact"))
    pairs.join(estU, Seq("source_a", "source_b"))
      .join(exact, Seq("source_a", "source_b"))
      .select(col("source_a"), col("source_b"), col("n_exact"),
        round(col("est_a"), 4).as("est_a"),
        round(col("est_b"), 4).as("est_b"),
        round(col("est_u"), 4).as("est_union"),
        round(col("est_a") + col("est_b") - col("est_u"), 4).as("est_intersect"))
  }

  /** q107: self-join-size (F2) estimation from the count-min sketch —
    * the AMS/CMS inner-product estimator a 100 TB planner consults
    * BEFORE running a join: |R ⋈_k R| = Σ_k c(k)² is what explodes on
    * skewed keys, and est = min_r Σ_b cms[r][b]² upper-bounds it from
    * d·w counters instead of a full per-key aggregate. Run on the
    * events user_id key and audited against the exact Σ c(u)² — the
    * overestimate (collision mass) is part of the output because the
    * md5 sketch is deterministic, so even its error is
    * oracle-replayable. All-integer arithmetic end to end. */
  def selfJoinSizeSketch(s: SparkSession, dir: String, rows: Int = 4,
      buckets: Int = 256): DataFrame = {
    val keys = Tables.events(s, dir)
      .select(col("user_id").cast("string").as("k"))
    def bucket(r: Int) =
      Sampling.hashBucket(concat(lit(s"js$r|"), col("k"))) % buckets
    val cms = keys.select(col("k"),
        explode(array((0 until rows).map(r =>
          struct(lit(r).as("r"), bucket(r).as("b"))): _*)).as("rb"))
      .select(col("rb.r").as("r"), col("rb.b").as("b"))
      .groupBy(col("r"), col("b")).agg(count(lit(1)).as("cnt"))
    val est = cms.groupBy(col("r"))
      .agg(sum(col("cnt") * col("cnt")).as("f2_r"))
      .agg(min(col("f2_r")).as("est_f2"), count(lit(1)).as("n_sketch_rows"))
    val exact = keys.groupBy(col("k")).agg(count(lit(1)).as("c"))
      .agg(sum(col("c") * col("c")).as("exact_f2"), sum(col("c")).as("n_rows"))
    est.crossJoin(exact)
      .select(col("n_rows"), col("exact_f2"), col("est_f2"),
        (col("est_f2") - col("exact_f2")).as("overestimate"))
  }

  /** q148: CROSS-table join-size estimation from two count-min
    * sketches — q107's estimator generalized to the planner's actual
    * pre-join question: |A ⋈_k B| = Σ_k cA(k)·cB(k), estimated as
    * est = min_r Σ_b cmsA[r][b]·cmsB[r][b] (the AMS inner product)
    * from 2·d·w counters. The two sides here are differently
    * FILTERED views of lineitem keyed on l_partkey — the self-join-
    * with-different-predicates shape (parts both returned and
    * open-status) whose output size a planner must bound before
    * picking a strategy. Each sketch is one narrow scan + one
    * bounded agg; the inner product is a d·w-row equi-join — cost
    * independent of table size. Deterministic md5 buckets ⇒ the
    * estimate AND its collision overestimate replay on the oracle.
    * The single-row side frames combine via broadcast crossJoin
    * (scalar frames, the q107 pattern).
    *
    * Accuracy: the AMS bound is overestimate ≤ ~nA·nB/w, and the
    * default w=256 is sized for the GATE, not for production — at
    * sf0.1 (200k×300k rows) collisions dominate (observed 233.7M ≈
    * nA·nB/256 = 234.3M, oracle-replayed exactly). At 100 TB you
    * size w ≈ nA·nB/(target absolute error): still constant-size
    * state, just a bigger constant — the knob is this parameter. */
  def crossJoinSizeSketch(s: SparkSession, dir: String, rows: Int = 4,
      buckets: Int = 256): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val a = li.filter(col("l_returnflag") === "R")
      .select(col("l_partkey").cast("string").as("k"))
    val b = li.filter(col("l_linestatus") === "O")
      .select(col("l_partkey").cast("string").as("k"))
    def cms(keys: DataFrame, cnt: String) = keys
      .select(explode(array((0 until rows).map { r =>
        struct(lit(r).as("r"),
          (Sampling.hashBucket(concat(lit(s"xj$r|"), col("k"))) % buckets)
            .as("b"))
      }: _*)).as("rb"))
      .select(col("rb.r").as("r"), col("rb.b").as("b"))
      .groupBy(col("r"), col("b")).agg(count(lit(1)).as(cnt))
    val est = cms(a, "ca").join(cms(b, "cb"), Seq("r", "b"))
      .groupBy(col("r")).agg(sum(col("ca") * col("cb")).as("ip_r"))
      .agg(min(col("ip_r")).as("est_join_size"))
    val exact = a.groupBy(col("k")).agg(count(lit(1)).as("ca"))
      .join(b.groupBy(col("k")).agg(count(lit(1)).as("cb")), "k")
      .agg(coalesce(sum(col("ca") * col("cb")), lit(0L))
        .as("exact_join_size"))
    val na = a.agg(count(lit(1)).as("n_rows_a"))
    val nb = b.agg(count(lit(1)).as("n_rows_b"))
    na.crossJoin(nb).crossJoin(exact).crossJoin(est)
      .select(col("n_rows_a"), col("n_rows_b"), col("exact_join_size"),
        col("est_join_size"),
        (col("est_join_size") - col("exact_join_size")).as("overestimate"))
  }

  /** q97: histogram quantile sketch + exact refine — p50/p90/p99 of
    * lineitem prices from a fixed-width bin histogram, then the exact
    * value by rank-selecting WITHIN the one bin that holds each rank.
    *
    * Why it scales: the classic exact-quantile plan sorts the whole
    * column (q67's window). Here pass 1 is a map-side-combinable
    * count per bin — constant-size state (~10³ bins) like any sketch,
    * and mergeable across partitions; the cumulative walk runs on the
    * bounded histogram only. Pass 2 sorts just the rows of the ≤3
    * bins that contain the requested ranks (~n/bins rows), so no task
    * ever sees an unbounded sort. All arithmetic is integer cents;
    * the only double op is ceil(q·n), identical IEEE on both engines.
    */
  /** q231: exact PER-GROUP quantiles at scale — q97's two-pass
    * bin-then-rank-select technique applied per event_type (p50 /
    * p95 / p99 of the value column), the form a per-type SLO or
    * pricing report needs. The contrast is q67, which ranks every
    * group with a full per-group window sort — the documented scale
    * trap this operator exists to avoid: pass 1 is one map-side-
    * combinable (group, bin) count (bins bounded by value-range /
    * binCents per group), the cumulative walk runs per group over
    * the BOUNDED bin table, and pass 2 rank-selects inside only the
    * boundary bins (≤ |quantiles| bins' rows per group ever sorted,
    * ~n/bins rows each). Duplicate values inside a boundary bin make
    * row identity arbitrary but the selected VALUE deterministic —
    * the offset-th smallest is the same cents either way. */
  def groupQuantileBands(s: SparkSession, dir: String,
      binCents: Long = 100L): DataFrame = {
    import s.implicits._
    val base = Tables.events(s, dir)
      .select(col("event_type"),
        round(col("value") * 100).cast("long").as("vc"))
      .withColumn("bin", expr(s"vc div $binCents"))
    val hist = base.groupBy(col("event_type"), col("bin"))
      .agg(count(lit(1)).as("cnt"))
    val wcum = Window.partitionBy(col("event_type")).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("cum", sum(col("cnt")).over(wcum))
    val total = hist.groupBy(col("event_type")).agg(sum(col("cnt")).as("n"))
    val qdf = Seq(("p50", 0.5), ("p95", 0.95), ("p99", 0.99))
      .toDF("q_label", "q")
    val targets = total.crossJoin(broadcast(qdf))
      .withColumn("rnk", ceil(col("q") * col("n")).cast("long"))
    val picked = targets.join(cum, "event_type")
      .filter(col("cum") >= col("rnk") && col("cum") - col("cnt") < col("rnk"))
      .select(col("event_type"), col("q_label"), col("n"), col("rnk"),
        col("bin"), (col("rnk") - (col("cum") - col("cnt"))).as("off"),
        (col("bin") * binCents + (binCents - 1)).as("est_cents"))
    val wbin = Window.partitionBy(col("event_type"), col("q_label"))
      .orderBy(col("vc"))
    base.join(broadcast(picked), Seq("event_type", "bin"))
      .withColumn("rn", row_number().over(wbin))
      .filter(col("rn") === col("off"))
      .select(col("event_type"), col("q_label"), col("n"),
        col("est_cents"), col("vc").as("exact_cents"))
  }

  def histQuantiles(s: SparkSession, dir: String,
      binCents: Long = 10000L): DataFrame = {
    import s.implicits._
    val base = Tables.lineitem(s, dir)
      .select(floor(col("l_extendedprice") * 100).cast("long").as("vc"))
      .withColumn("bin", expr(s"vc div $binCents"))
    val hist = base.groupBy(col("bin")).agg(count(lit(1)).as("cnt"))
    // Bounded single-partition window: ~10^3 bin rows regardless of SF.
    val wcum = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("cum", sum(col("cnt")).over(wcum))
    val total = hist.agg(sum(col("cnt")).as("n"))
    val qdf = Seq(("p50", 0.5), ("p90", 0.9), ("p99", 0.99))
      .toDF("q_label", "q")
    val targets = qdf.crossJoin(total)
      .withColumn("rnk", ceil(col("q") * col("n")))
    val picked = targets.join(cum,
        col("cum") >= col("rnk") && (col("cum") - col("cnt")) < col("rnk"))
      .select(col("q_label"), col("n"), col("rnk"), col("bin"),
        (col("rnk") - (col("cum") - col("cnt"))).as("offset"),
        (col("bin") * binCents + (binCents - 1)).as("est_cents"))
    val wbin = Window.partitionBy(col("q_label"))
      .orderBy(col("vc"))
    base.join(broadcast(picked), "bin")
      .withColumn("rn", row_number().over(wbin))
      .filter(col("rn") === col("offset"))
      .select(col("q_label"), col("n"), col("rnk"), col("est_cents"),
        col("vc").as("exact_cents"),
        (col("est_cents") - col("vc")).as("err_cents"))
  }

  /** Histogram-grain median per group: value binned at width `w`,
    * per-(group, bin) counts (map-side combinable), cumulative window
    * over the BOUNDED per-group bin table, estimate = upper edge of
    * the bin where cum first reaches ceil(n/2) (all-integer crossing
    * test 2·cum ≥ n). Resolution is `w` — the explicit knob — and no
    * task ever sorts a group. */
  private def histMedian(vals: DataFrame, w: Long): DataFrame = {
    val hist = vals.groupBy(col("g"), expr(s"v div $w").as("bin"))
      .agg(count(lit(1)).as("cnt"))
    val wcum = Window.partitionBy(col("g")).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist.withColumn("cum", sum(col("cnt")).over(wcum))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy(col("g"))))
      .filter(col("cum") * 2 >= col("n") &&
        (col("cum") - col("cnt")) * 2 < col("n"))
      .select(col("g"), (col("bin") * w + (w - 1)).as("med"), col("n"))
  }

  /** q154: ROBUST per-source outlier report — median/MAD instead of
    * mean/stddev (q68's z-score breaks on the heavy tails it is
    * supposed to flag: one giant document inflates σ until nothing
    * is an outlier). Three narrow column-pruned scans, each ending
    * in a map-side-combinable histogram agg — never a per-group
    * sort, which is what naive percentile_exact costs at 100 TB:
    *  1. per-source length histogram → histogram-grain median;
    *  2. per-source |x − med| histogram → histogram-grain MAD;
    *  3. exact count of rows with |x − med| > 3·MAD (integer
    *     compare per row against the tiny broadcast thresholds).
    * Thresholds are histogram-grain (resolution `binWidth`, the
    * knob); the outlier TEST is exact per row. MAD = 0 (over half
    * the mass in one bin) flags every off-bin row — the honest
    * degenerate case, reported not hidden. */
  def robustOutliers(s: SparkSession, dir: String,
      binWidth: Long = 16L): DataFrame =
    robustOutliersOf(Tables.documents(s, dir)
      .select(col("source").as("g"), col("n_chars").as("v")), binWidth)

  /** [[robustOutliers]] over any (g, v) frame — shared with
    * ScaleProbe so the probe measures exactly the gated plan. */
  private[graft] def robustOutliersOf(docs: DataFrame,
      binWidth: Long = 16L): DataFrame = {
    val med = histMedian(docs, binWidth)
    val dev = docs.join(broadcast(med), "g") // |sources|-row frame
      .select(col("g"), abs(col("v") - col("med")).as("v"))
    val mad = histMedian(dev, binWidth)
      .select(col("g"), col("med").as("mad"))
    val thresholds = med.join(mad, "g")
    docs.join(broadcast(thresholds), "g")
      .groupBy(col("g").as("source"))
      .agg(count(lit(1)).as("n_docs"),
        first(col("med")).as("med_chars"),
        first(col("mad")).as("mad_chars"),
        sum(when(abs(col("v") - col("med")) > col("mad") * 3, 1L)
          .otherwise(0L)).as("n_outliers"))
      .select(col("source"), col("n_docs"), col("med_chars"),
        col("mad_chars"), col("n_outliers"),
        round(col("n_outliers") / col("n_docs").cast("double"), 4)
          .as("outlier_frac"))
  }

  /** q250: KMV (k-minimum-values) SET-OPERATION sketches — the third
    * distinct-counting family next to HLL (q92: cardinality, q125:
    * inclusion-exclusion overlap): a KMV sketch keeps the k SMALLEST
    * hash values of a set, and unlike HLL supports a DIRECT
    * Jaccard/intersection estimator — the union sketch is the k
    * smallest of the two sketches' union, and the fraction of its
    * entries present in BOTH input sketches estimates J(A,B)
    * (Beyer et al.'s distinct-value synopses). Pairwise source
    * content overlap estimated from 20 constant-size sketches
    * instead of q120's full hash-join matrix:
    *  - per source, the k-min of md5-derived 32-bit content hashes
    *    via the bounded TopK aggregator (score = −h: map-side k-min
    *    lattice, shuffle carries ≤ k rows per partition — never a
    *    per-source window sort);
    *  - estimators all-integer: |S| ≈ (k−1)·2³² div h₍ₖ₎ (exact
    *    count when the sketch is complete), Ĵ ppm = matches·10⁶
    *    div |union sketch|, intersection ≈ Ĵ·|A∪B|;
    *  - the EXACT hash-join numbers ride along per pair (the
    *    q92/q136 audit pattern — at 100 TB you keep the sketch
    *    column and drop the exact one).
    * Hash collisions fold identical 32-bit values on both engines
    * (the sketch's own semantics, replayed exactly by the oracle). */
  def kmvOverlap(s: SparkSession, dir: String, k: Int = 16): DataFrame = {
    import graft.functions.TopK
    val m = 4294967296L
    val vals = Tables.documents(s, dir)
      .select(col("source"),
        Sampling.hashBucket(concat(lit("kmv|"),
          md5(col("text").cast("binary")))).as("h"))
      .distinct()
    val sketches = vals.groupBy(col("source"))
      .agg(TopK.topk(k)(col("h"), -col("h").cast("double")).as("top"),
        count(lit(1)).as("n_exact"))
      .select(col("source"), expr("transform(top, t -> t.id)").as("kmv"),
        col("n_exact"))
    val pairs = sketches.toDF("source_a", "kmv_a", "n_a")
      .crossJoin(broadcast(sketches.toDF("source_b", "kmv_b", "n_b")))
      .filter(col("source_a") < col("source_b"))
    val exact = vals.toDF("source_a", "h")
      .join(vals.toDF("source_b", "h"), Seq("h"))
      .filter(col("source_a") < col("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("exact_intersection"))
    pairs
      .withColumn("u", expr(s"slice(array_sort(array_union(kmv_a, kmv_b)), 1, $k)"))
      .withColumn("usz", size(col("u")).cast("long"))
      .withColumn("kth", element_at(col("u"), size(col("u"))))
      .withColumn("est_union",
        when(col("usz") < k, col("usz"))
          .otherwise(expr(s"(${k - 1} * ${m}L) div kth")))
      .withColumn("matches",
        size(expr("array_intersect(u, array_intersect(kmv_a, kmv_b))"))
          .cast("long"))
      .withColumn("jaccard_ppm", expr("matches * 1000000 div usz"))
      .withColumn("est_intersection", expr("(matches * est_union) div usz"))
      .join(exact, Seq("source_a", "source_b"), "left")
      .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"),
        col("est_union"), col("jaccard_ppm"), col("est_intersection"),
        coalesce(col("exact_intersection"), lit(0L)).as("exact_intersection"))
  }

  /** q331: KLL-family rank sketch over line price cents (round-11,
    * VERDICT Next #5) — the UNBOUNDED-domain quantile path next to
    * the bounded-domain histogram family (q97/q151/q164): one
    * [[graft.functions.KllAgg]] pass builds a fixed-size mergeable
    * sketch (map-side partial sketches, one tiny merge shuffle — the
    * only state a 100 TB percentile needs), then ONE exact
    * rank-counting pass audits every estimate against its RANK
    * INTERVAL: a returned value v satisfies the sketch guarantee iff
    * the target rank ⌈q·n⌉ lies within [count(c < v) + 1, count(c ≤
    * v)] widened by the SELF-CARRIED worst-case bound (err from the
    * compaction ledger + one maxWeight estimator overshoot). The
    * interval form — not |count(c ≤ v) − target| ≤ bound — is the
    * actual theorem when values tie: quantile() returns the smallest
    * stored value crossing the target, while count(c ≤ v) also
    * swallows the full duplicate mass ABOVE the stored copy, which
    * is not the sketch's overshoot to answer for. The bound holds
    * for every partition-merge order — which is exactly what makes
    * this gateable: Spark's merge order is arbitrary, the estimates
    * can differ run to run, but the bound assertion cannot.
    * Gated columns: (q_milli, n, within_bound=1);
    * the spec pins exactness below cap, weight conservation, the
    * bound's validity under adversarial merge splits, and empirical
    * tightness. */
  def kllQuantiles(s: SparkSession, dir: String, cap: Int = 400): DataFrame = {
    import s.implicits._
    import graft.functions.{KllAgg, KllSketch}
    val vals = Tables.lineitem(s, dir)
      .select(expr("cast(round(l_extendedprice * 100) as bigint)").as("c"))
    val sk: KllSketch = vals.as[Long]
      .select(new KllAgg(cap).toColumn).head()
    val qs = Seq(10L, 250L, 500L, 750L, 990L)
    val ests = qs.map(qm => qm -> sk.quantile(qm / 1000.0))
    // one exact pass: BOTH rank edges of every estimate at once —
    // count(c < v) and count(c ≤ v) bracket the duplicate mass of v
    val rankCols = count(lit(1)).as("n") +:
      ests.flatMap { case (qm, v) =>
        Seq(sum(when(col("c") <= v, 1L).otherwise(0L)).as(s"le$qm"),
          sum(when(col("c") < v, 1L).otherwise(0L)).as(s"lt$qm"))
      }
    val r = vals.agg(rankCols.head, rankCols.tail: _*).head()
    val n = r.getAs[Long]("n")
    val bound = sk.err + sk.maxWeight
    val rows = qs.map { qm =>
      val target = math.max(1L, math.ceil(qm / 1000.0 * n).toLong)
      val rankLe = r.getAs[Long](s"le$qm")
      val rankLt = r.getAs[Long](s"lt$qm")
      val ok = target <= rankLe + bound && target >= rankLt + 1L - bound
      (qm, n, if (ok) 1L else 0L)
    }
    rows.toDF("q_milli", "n", "within_bound")
  }

  /** q372: WINSORIZED GROUP MEANS (round-12) — the robust-mean
    * companion to q154's MAD outlier report: per return-flag group,
    * the mean of line prices after CLIPPING to the exact [P10, P90]
    * order statistics (winsorizing caps the tails instead of
    * dropping them, so n stays the same and the estimate stays a
    * mean — the standard treatment when a metric feeds dashboards
    * that must not jump when one whale order lands). Percentile
    * VALUES come from [[Relational.twoPhaseRank]] on (cents, key) —
    * the bounded-histogram rank, never a per-group corpus sort —
    * rank ⌈n/10⌉ and ⌈9n/10⌉; clipping and the milli-unit means are
    * pure integer arithmetic, so the gate is exact. Shapes: the
    * two-phase rank's histogram agg + ONE broadcast of the
    * |groups|-row clip bounds + one final agg. */
  def winsorized(s: SparkSession, dir: String): DataFrame = {
    val rows = Tables.lineitem(s, dir)
      .select(col("l_returnflag").as("grp"),
        expr("cast(round(l_extendedprice * 100) as bigint)").as("cents"),
        col("l_orderkey"), col("l_linenumber"))
    val ranked = Relational.twoPhaseRank(rows, col("grp"),
      col("cents"),
      Seq(col("cents"), col("l_orderkey"), col("l_linenumber")),
      "rk", "n")
    val bounds = ranked
      .filter(col("rk") === expr("(n + 9) div 10") ||
        col("rk") === expr("(9 * n + 9) div 10"))
      .groupBy(col("grp"))
      .agg(min(when(col("rk") === expr("(n + 9) div 10"), col("cents")))
          .as("p10_cents"),
        min(when(col("rk") === expr("(9 * n + 9) div 10"), col("cents")))
          .as("p90_cents"))
    rows.join(broadcast(bounds), "grp")
      .withColumn("clipped",
        greatest(col("p10_cents"), least(col("p90_cents"), col("cents"))))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"),
        max(col("p10_cents")).as("p10_cents"),
        max(col("p90_cents")).as("p90_cents"),
        expr("sum(cents) div count(1)").as("raw_mean_cents"),
        expr("sum(clipped) div count(1)").as("wins_mean_cents"))
  }

  /** q368: MISRA–GRIES HEAVY HITTERS over corpus tokens (round-12) —
    * the frequency-sketch sibling of q331's KLL rank sketch, closing
    * the sketch family's other half: q60's count-min OVERestimates
    * point queries and cannot name the hot keys; [[graft.functions
    * .MisraGriesAgg]] UNDERestimates with a self-carried deficit
    * bound d and guarantees every key with true count > d a
    * surviving counter (d ≤ n/(k+1) — the classic completeness
    * theorem). One aggregator pass (k = 64 slots of state per
    * partition, one bounded merge shuffle — the 100 TB hot-token
    * monitor shape), then the exact top-10 audits it: est ≤ true ≤
    * est + d and guaranteed presence, both theorems for EVERY
    * partition-merge order (the q331 gating argument — estimates
    * vary run to run, the bound assertions cannot). Tokens ride a
    * 60-bit md5 hash (8-byte items in the sketch, never strings) —
    * the oracle replays the same nibble arithmetic. */
  def heavyHitters(s: SparkSession, dir: String, k: Int = 64,
      top: Int = 10): DataFrame = {
    import s.implicits._
    import graft.functions.{MisraGriesAgg, MgSketch}
    val tok = Tables.documents(s, dir)
      .select(explode(tokens(col("text"))).as("tok"))
    def h60(c: org.apache.spark.sql.Column) =
      conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")
    val sk: MgSketch = tok.select(h60(col("tok")).as("h")).as[Long]
      .select(new MisraGriesAgg(k).toColumn).head()
    // metadata-sized collect: the exact top rows being audited
    val exact = tok.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok")).limit(top)
      .withColumn("h", h60(col("tok")))
      .collect()
    val rows = exact.toSeq.map { r =>
      val est = sk.estimate(r.getAs[Long]("h"))
      val cnt = r.getAs[Long]("cnt")
      (r.getAs[String]("tok"), cnt,
        if (est <= cnt && cnt <= est + sk.d) 1L else 0L,
        if (cnt <= sk.d || est > 0L) 1L else 0L)
    }
    rows.toDF("token", "cnt", "within_bound", "present_ok")
  }

  /** q377: PER-GROUP KLL QUANTILES (round-12) — q331's rank sketch
    * composed with groupBy, the shape a 100 TB per-key percentile
    * dashboard actually runs (one fixed-size sketch per key, map-
    * side partials, one bounded merge shuffle — never a per-group
    * sort, never a per-group histogram when the domain is
    * unbounded): a [[graft.functions.KllAgg]] UDAF per return-flag
    * group, then ONE exact corpus pass against the broadcast
    * (group × quantile) estimate grid audits every estimate with
    * the tie-correct RANK-INTERVAL gate — target within [count(<est)
    * +1, count(≤est)] widened by the group sketch's self-carried
    * err + maxWeight, a theorem for every merge order. The
    * per-group sketch collect is metadata-sized (|groups| rows). */
  def groupKll(s: SparkSession, dir: String, cap: Int = 400): DataFrame = {
    import graft.functions.{KllAgg, KllSketch}
    val vals = Tables.lineitem(s, dir)
      .select(col("l_returnflag").as("grp"),
        expr("cast(round(l_extendedprice * 100) as bigint)").as("c"))
    val kll = udaf(new KllAgg(cap))
    val fin = vals.groupBy(col("grp")).agg(kll(col("c")).as("sk"))
      .collect() // metadata-sized: one sketch row per group
    val qs = Seq(250L, 500L, 750L)
    val grid = fin.flatMap { r =>
      val skr = r.getStruct(r.fieldIndex("sk"))
      val sk = KllSketch(
        skr.getSeq[scala.collection.Seq[Long]](skr.fieldIndex("levels"))
          .map(_.toVector).toVector,
        skr.getAs[Long]("err"), skr.getAs[Long]("n"))
      qs.map(qm => (r.getAs[String]("grp"), qm,
        sk.quantile(qm / 1000.0), sk.err + sk.maxWeight))
    }
    import s.implicits._
    val gridDf = grid.toSeq.toDF("grp", "q_milli", "est", "bound")
    vals.join(broadcast(gridDf), "grp")
      .groupBy(col("grp"), col("q_milli"))
      .agg(count(lit(1)).as("n"), max(col("bound")).as("bound"),
        sum(when(col("c") <= col("est"), 1L).otherwise(0L)).as("rank_le"),
        sum(when(col("c") < col("est"), 1L).otherwise(0L)).as("rank_lt"))
      .withColumn("target",
        greatest(lit(1L), expr("(q_milli * n + 999) div 1000")))
      .select(col("grp"), col("q_milli"), col("n"),
        (col("target") <= col("rank_le") + col("bound") &&
          col("target") >= col("rank_lt") + lit(1L) - col("bound"))
          .cast("long").as("within_bound"))
  }

  /** q382: PER-SOURCE MISRA–GRIES heavy hitters (round-12) — q368
    * composed with groupBy, completing the per-key composition
    * symmetry (the rank sketch got it in q377): one
    * [[graft.functions.MisraGriesAgg]] UDAF per source — k counter
    * slots per key, map-side partials, one bounded merge shuffle —
    * is the per-domain hot-token monitor (which boilerplate token
    * floods WHICH feed), where q368's global sketch only names the
    * corpus-wide flood. Audit per source: the exact top-2 tokens
    * must satisfy est ≤ true ≤ est + d and guaranteed presence when
    * true > d — theorems for every merge order. Exact side: one
    * (source × token) agg ranked by twoPhaseRank (never a per-source
    * vocab sort); the per-source sketch collect is metadata-sized. */
  def sourceHeavyHitters(s: SparkSession, dir: String, k: Int = 32,
      top: Int = 2): DataFrame = {
    import graft.functions.{MisraGriesAgg, MgSketch}
    def h60(c: org.apache.spark.sql.Column) =
      conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")
    val tok = Tables.documents(s, dir)
      .select(col("source"), explode(tokens(col("text"))).as("tok"))
    val mg = udaf(new MisraGriesAgg(k))
    val fin = tok.select(col("source"), h60(col("tok")).as("h"))
      .groupBy(col("source")).agg(mg(col("h")).as("sk"))
      .collect() // metadata-sized: one sketch row per source
      .map { r =>
        val skr = r.getStruct(r.fieldIndex("sk"))
        r.getAs[String]("source") -> MgSketch(
          skr.getSeq[Long](skr.fieldIndex("keys")).toVector,
          skr.getSeq[Long](skr.fieldIndex("counts")).toVector,
          skr.getAs[Long]("d"), skr.getAs[Long]("n"))
      }.toMap
    val counts = tok.groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("cnt"))
    val exact = Relational.twoPhaseRank(counts, col("source"),
        negate(col("cnt")), Seq(negate(col("cnt")), col("tok")),
        "rk", "n_vocab")
      .filter(col("rk") <= top)
      .withColumn("h", h60(col("tok")))
      .collect() // metadata-sized: |sources| * top rows
    import s.implicits._
    val rows = exact.toSeq.map { r =>
      val src = r.getAs[String]("source")
      val cnt = r.getAs[Long]("cnt")
      val sk = fin(src)
      val est = sk.estimate(r.getAs[Long]("h"))
      (src, r.getAs[String]("tok"), cnt, r.getAs[Long]("rk"),
        if (est <= cnt && cnt <= est + sk.d) 1L else 0L,
        if (cnt <= sk.d || est > 0L) 1L else 0L)
    }
    rows.toDF("source", "token", "cnt", "rank", "within_bound",
      "present_ok")
  }

  /** q427: COUNT-MIN CAPACITY PLANNER — the q422 treatment for the
    * OTHER sketch this engine provisions (q60's count-min): for the
    * real total token mass n and a (width, depth) grid, the
    * Cormode–Muthukrishnan guarantee priced in corpus units — the
    * overcount bound e·n/w (exact integer: n·e_micro div w div 10⁶,
    * the product on DECIMAL(38,0) since n·e_micro wraps BIGINT past
    * ~3e12 tokens) and the failure probability e^{−d} (one libm exp
    * per depth, micro-rounded), plus the memory each point buys.
    * "How wide must the sketch be for ±1000-token error at 100 TB"
    * answered before any counter is allocated. */
  def cmsPlanner(s: SparkSession, dir: String): DataFrame = {
    val n = Tables.documents(s, dir)
      .select(explode(tokens(col("text"))).as("tok"))
      .agg(count(lit(1)).as("n_tokens"))
    val grid = s.createDataFrame(
        for (w <- Seq(256L, 1024L, 4096L, 16384L); d <- 1L to 6L)
          yield (w, d))
      .toDF("w", "d")
    grid.crossJoin(broadcast(n))
      .select(col("w"), col("d"), col("n_tokens"),
        (col("w") * col("d") * 8L).as("mem_bytes"),
        expr("CAST(CAST(n_tokens AS DECIMAL(38,0)) * 2718282 div w" +
          " div 1000000 AS BIGINT)").as("err_bound_tokens"),
        round(exp(negate(col("d").cast("double"))) * 1e6).cast("long")
          .as("fail_micro"))
  }

  /** q422: BLOOM-FILTER CAPACITY PLANNER — q342 prices the LSH
    * banding grid; this prices the OTHER index every decontamination
    * / membership pass provisions (q88's filter): for the REAL
    * distinct-shingle count n of this corpus and a (bits-per-item,
    * hash-count) grid, the expected false-positive rate
    * (1 − e^{−k·n/m})^k and the textbook optimum k* = (m/n)·ln 2 —
    * the "how many bits do I buy for a 10⁻⁴ FP budget at 100 TB"
    * table, computed before any filter is built. Determinism: ONE
    * libm call per grid row (exp, micro-rounded — the q176 ln
    * convention); the k-th power then rides an exact integer fold
    * (acc·term div 10⁶ — identical truncation chain on both
    * engines); k* is pure integer arithmetic on the ln2 literal. */
  def bloomPlanner(s: SparkSession, dir: String): DataFrame = {
    val n = Tables.documents(s, dir)
      .select(explode(shingles3(col("text"))).as("sh"))
      .agg(countDistinct(col("sh")).as("n_items"))
    val grid = s.createDataFrame(
        for (m <- Seq(4L, 8L, 12L, 16L); k <- 1L to 12L) yield (m, k))
      .toDF("m_over_n", "k")
    grid.crossJoin(broadcast(n))
      .withColumn("m_bits", col("n_items") * col("m_over_n"))
      .withColumn("term_micro",
        round((lit(1.0) -
          exp(negate(col("k").cast("double") / col("m_over_n"))))
          * 1e6).cast("long"))
      .withColumn("fp_micro", expr(
        "aggregate(sequence(1, CAST(k AS INT)), 1000000L, " +
          "(acc, i) -> acc * term_micro div 1000000)"))
      .withColumn("k_opt",
        expr("(m_over_n * 693147 + 500000) div 1000000"))
      .withColumn("is_k_opt", col("k") === col("k_opt"))
  }

  /** q441: A/B SAMPLE-SIZE (POWER) PLANNER (two-sample z
    * approximation; Cohen 1988) — the fourth capacity planner
    * (q342 LSH bands, q422 bloom bits, q427 count-min cells, and
    * now experiment traffic): before q157 reads a lift, someone
    * must decide HOW LONG to run the experiment, and that number
    * comes from the corpus's own variance, not folklore. Per event
    * type and a relative-MDE grid (1/2/5/10/20%), the per-arm n for
    * 80% power at two-sided α = 5%:
    * n = 2σ²(z_{0.975}+z_{0.80})²/δ². Exact integer moments
    * (σ² in milli² from n·Σx²−(Σx)² on DECIMAL(38,0)), the z-sum
    * square as the exact micro² literal 2801585² = 7848878512225
    * (1959964 + 841621 micro), δ = mean·mde exact, and the final n
    * a ceiling division — one deterministic integer chain both
    * engines replay. */
  def powerPlanner(s: SparkSession, dir: String): DataFrame = {
    val mom = Tables.events(s, dir)
      .select(col("event_type"),
        expr("CAST(round(value * 1000) AS BIGINT)").as("vm"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_obs"), sum(col("vm")).as("s1"),
        sum(expr("CAST(vm AS DECIMAL(38,0)) * vm")).as("s2"))
      .filter(col("n_obs") >= 2)
      .withColumn("var_milli2", expr(
        """CAST((CAST(n_obs AS DECIMAL(38,0)) * s2
          | - CAST(s1 AS DECIMAL(38,0)) * s1)
          | div (CAST(n_obs AS DECIMAL(38,0)) * (n_obs - 1))
          | AS DECIMAL(38,0))""".stripMargin))
      .withColumn("mean_milli",
        expr("CAST(CAST(s1 AS DECIMAL(38,0)) div n_obs AS BIGINT)"))
    val grid = s.createDataFrame(
        Seq(10000L, 20000L, 50000L, 100000L, 200000L).map(Tuple1(_)))
      .toDF("mde_ppm")
    mom.crossJoin(broadcast(grid))
      .withColumn("delta_milli",
        expr("CAST(CAST(mean_milli AS DECIMAL(38,0)) * mde_ppm" +
          " div 1000000 AS BIGINT)"))
      // n = ceil( 2·σ²·(z_a+z_b)² / δ² ), z-sum² in micro² —
      // divide by 10¹² to leave a dimensionless count
      .withColumn("n_per_arm", expr(
        """CAST((CAST(2 AS DECIMAL(38,0)) * var_milli2 * 7848878512225
          |  + CAST(nullif(delta_milli, 0) AS DECIMAL(38,0))
          |    * delta_milli * 1000000000000 - 1)
          | div (CAST(nullif(delta_milli, 0) AS DECIMAL(38,0))
          |    * delta_milli * 1000000000000) AS BIGINT)"""
          .stripMargin))
      // var_milli2 decimal internally, BIGINT on the report row
      // (the round-14 decimal-output lesson)
      .select(col("event_type"), col("n_obs"), col("mean_milli"),
        col("var_milli2").cast("long").as("var_milli2"),
        col("mde_ppm"), col("delta_milli"),
        col("n_per_arm"))
  }
}
