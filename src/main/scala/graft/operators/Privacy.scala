package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** PII handling (LLM-pipeline operator): training corpora must be
  * scrubbed before use. Everything here is native codegen'd string
  * expressions — no UDFs — so masking runs at scan speed and pushes
  * column pruning down to parquet.
  */
object Privacy {

  /** q61: PII masking pass over the customer table — stable
    * pseudonymous key (md5), numeric-identifier redaction with an
    * audit count, last-2 partial retention. The masked relation is
    * what a pipeline is allowed to keep; n_redacted feeds the scrub
    * audit. */
  def piiMask(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir).select(
      col("c_custkey"),
      md5(col("c_name").cast("binary")).as("name_hash"),
      regexp_replace(col("c_name"), "[0-9]+", "<ID>").as("name_redacted"),
      regexp_count(col("c_name"), lit("[0-9]+")).cast("long").as("n_redacted"),
      concat(lit("***"), expr("right(CAST(c_custkey AS STRING), 2)")).as("key_last2"))

  /** q130: k-anonymity audit over the quasi-identifier combination
    * (nation, market segment) — the re-identification risk check run
    * BEFORE a dataset release: a row in an equivalence class smaller
    * than k is linkable to an individual. Two aggregations: classes =
    * one groupBy on the quasi-identifiers (map-side combinable), then
    * a per-segment roll-up counting classes/rows below the k=5 floor.
    * The report says exactly what generalization (dropping a QI
    * column, coarsening nation → region) must fix; constant-size
    * output (|segments| rows) at any corpus size. */
  def kAnonymity(s: SparkSession, dir: String, k: Int = 5): DataFrame =
    Tables.customer(s, dir)
      .groupBy(col("c_mktsegment"), col("c_nationkey"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_classes"),
        sum(col("n")).as("n_rows"),
        sum(when(col("n") < k, 1L).otherwise(0L)).as("n_risk_classes"),
        sum(when(col("n") < k, col("n")).otherwise(0L)).as("n_risk_rows"),
        min(col("n")).as("min_class_size"))
      .select(col("c_mktsegment"), col("n_classes"), col("n_rows"),
        col("n_risk_classes"), col("n_risk_rows"), col("min_class_size"),
        round(col("n_risk_rows") / col("n_rows").cast("double"), 4)
          .as("risk_row_frac"))

  /** q145: l-DIVERSITY audit over the same (segment, nation)
    * quasi-identifier classes as q130 — the ATTRIBUTE-disclosure
    * check k-anonymity misses: a class can hold ≥k rows yet leak the
    * sensitive attribute if every member shares one value (homogeneity
    * attack). Sensitive attribute = account-balance band
    * (floor(acctbal/1000) — exact-multiple boundaries are
    * double-exact at 2 decimals, so the band is cross-engine stable).
    * Shape: one distinct-agg keyed on (QI, band) — Spark's two-phase
    * partial distinct, state bounded by |classes|·|bands| — then a
    * per-segment roll-up of classes/rows below the l floor. Output is
    * |segments| rows at any corpus size; the report names the classes
    * generalization must widen. */
  def lDiversity(s: SparkSession, dir: String, l: Int = 3): DataFrame =
    Tables.customer(s, dir)
      .select(col("c_mktsegment"), col("c_nationkey"),
        floor(col("c_acctbal").cast("double") / lit(1000.0)).cast("long")
          .as("bal_band"))
      .groupBy(col("c_mktsegment"), col("c_nationkey"))
      .agg(countDistinct(col("bal_band")).as("div"), count(lit(1)).as("n"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_classes"),
        sum(col("n")).as("n_rows"),
        sum(when(col("div") < l, 1L).otherwise(0L)).as("n_low_div_classes"),
        sum(when(col("div") < l, col("n")).otherwise(0L)).as("n_low_div_rows"),
        min(col("div")).as("min_diversity"))
      .select(col("c_mktsegment"), col("n_classes"), col("n_rows"),
        col("n_low_div_classes"), col("n_low_div_rows"),
        col("min_diversity"),
        round(col("n_low_div_rows") / col("n_rows").cast("double"), 4)
          .as("low_div_row_frac"))

  /** q210: corpus PII SCAN — the training-data audit q61's
    * structured masking presumes: BEFORE a text corpus ships, count
    * email addresses, phone-shaped numbers, and long digit runs
    * (account/SSN-shaped identifiers) per source, so the release
    * decision sees exactly which ingest streams leak PII and at
    * what density. Patterns are deliberately restricted to syntax
    * both regex engines (Java here, RE2-style in the oracle)
    * interpret identically — character classes and counted
    * repetition only, no \\d shorthand, no lookaround. One
    * conditional-aggregation scan (regexp_count is codegen'd;
    * adding a pattern costs a counter, not a pass); |sources| report
    * rows. A clean corpus PROVING itself clean is the product (the
    * q152 argument); the spec's seeded dirty docs prove detection. */
  /** Shared PII detector regexes (q210 scan / q348 propagation). */
  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PhoneRe = "[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}"
  private val LongIdRe = "[0-9]{9,}"

  def piiScan(s: SparkSession, dir: String): DataFrame = {
    val (email, phone, longId) = (EmailRe, PhoneRe, LongIdRe)
    def hits(p: String) = regexp_count(col("text"), lit(p))
    Tables.documents(s, dir)
      .select(col("source"), hits(email).as("e"), hits(phone).as("p"),
        hits(longId).as("i"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("e")).as("n_email_hits"),
        sum(col("p")).as("n_phone_hits"),
        sum(col("i")).as("n_longid_hits"),
        sum(when(col("e") + col("p") + col("i") > 0, 1L).otherwise(0L))
          .as("n_docs_flagged"))
      .withColumn("flagged_ppm",
        expr("n_docs_flagged * 1000000 div n_docs"))
  }

  /** q199: t-CLOSENESS audit — the third rung of the release-risk
    * ladder (q130 k-anonymity: classes too small; q145 l-diversity:
    * classes too uniform; this: classes whose sensitive-attribute
    * DISTRIBUTION differs too much from the corpus — the skewness
    * attack l-diversity misses: a class can hold l distinct values
    * yet be 95% "over 9000" when the corpus is 5%). Distance is the
    * ordered-attribute Earth Mover's Distance over the same
    * account-balance bands as q145: EMD = Σᵢ|Cᵢ/n − Gᵢ/N| / (m−1)
    * computed as exact integers — Σᵢ|N·Cᵢ − n·Gᵢ| in Decimal(38,0)
    * (the q193 widening policy: at 10⁹-row classes the cross
    * products exceed Long; DuckDB mirror HUGEINT), ONE division at
    * the end, rounded to 6 — so the t gate compares the same number
    * on both engines. Shapes: class/global/cell aggs are map-side
    * combinable; the cumulative runs over the |classes|·|bands|
    * GRID (bounded by the QI and band domains, never corpus rows);
    * |segments| report rows. */
  def tCloseness(s: SparkSession, dir: String, t: Double = 0.2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.Column
    val c = Tables.customer(s, dir).select(
      col("c_mktsegment").as("seg"), col("c_nationkey").as("nat"),
      floor(col("c_acctbal").cast("double") / lit(1000.0)).cast("long")
        .as("band"))
    val cls = c.groupBy(col("seg"), col("nat")).agg(count(lit(1)).as("n"))
    val gb = c.groupBy(col("band")).agg(count(lit(1)).as("g"))
    val tot = c.agg(count(lit(1)).as("nn"), countDistinct(col("band")).as("m"))
    val cb = c.groupBy(col("seg"), col("nat"), col("band"))
      .agg(count(lit(1)).as("cnt"))
    val grid = cls.crossJoin(broadcast(gb))
      .join(cb, Seq("seg", "nat", "band"), "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
    val wcum = Window.partitionBy(col("seg"), col("nat")).orderBy(col("band"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def dec(x: Column): Column = x.cast("decimal(38,0)")
    val perClass = grid
      .withColumn("ci", sum(col("cnt")).over(wcum))
      .withColumn("gi", sum(col("g")).over(wcum))
      .crossJoin(broadcast(tot))
      .withColumn("dev",
        abs(dec(col("nn")) * dec(col("ci")) - dec(col("n")) * dec(col("gi"))))
      .groupBy(col("seg"), col("nat"))
      .agg(max(col("n")).as("n"), sum(col("dev")).as("sdev"),
        max(col("nn")).as("nn"), max(col("m")).as("m"))
      .withColumn("emd", round(col("sdev").cast("double") /
        (col("n").cast("double") * col("nn").cast("double") *
          (col("m") - 1).cast("double")), 6))
    perClass.groupBy(col("seg").as("c_mktsegment"))
      .agg(count(lit(1)).as("n_classes"), sum(col("n")).as("n_rows"),
        max(col("emd")).as("max_emd"),
        sum(when(col("emd") > t, 1L).otherwise(0L)).as("n_risk_classes"),
        sum(when(col("emd") > t, col("n")).otherwise(0L)).as("n_risk_rows"))
      .withColumn("risk_row_frac",
        round(col("n_risk_rows") / col("n_rows").cast("double"), 4))
  }

  /** q144: DP-STYLE noisy-count release MECHANISM — per-segment
    * counts with Laplace(Δ/ε) noise (sensitivity Δ=1 for counts) via
    * inverse-CDF sampling: u ∈ (0,1) → noise = −(1/ε)·sign(u−½)·
    * ln(1−2|u−½|). The uniform here is SEEDED (md5 of the group
    * key — q96's proven cross-engine construction), which makes the
    * mechanism testable and oracle-replayable but NOT differentially
    * private: DP requires secret randomness, and a real release
    * swaps in SecureRandom and drops the true-count audit column
    * (which exists here exactly BECAUSE this gates the mechanism,
    * not a release). Everything else — sensitivity-1 aggregation,
    * the Laplace transform, post-processing rounding — is the real
    * pipeline, one scan + one bounded agg. Residual parity risk:
    * ln() libm ulp divergence absorbed by the 4-decimal rounding
    * (the q96 note). */
  def dpNoisyCounts(s: SparkSession, dir: String, epsilon: Double = 0.5,
      salt: String = "dp"): DataFrame = {
    val u = (Sampling.hashBucket(concat(lit(s"$salt|"), col("c_mktsegment")))
      .cast("double") + lit(0.5)) / lit(4294967296.0)
    val noise = lit(-1.0 / epsilon) * signum(col("cu")) *
      log(lit(1.0) - lit(2.0) * abs(col("cu")))
    Tables.customer(s, dir)
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      .withColumn("cu", u - lit(0.5))
      .select(col("c_mktsegment"), col("n"),
        round(col("n") + noise, 4).as("n_noisy"),
        round(noise, 4).as("noise"),
        lit(epsilon).as("epsilon"))
  }

  /** q159: RIGHT-TO-BE-FORGOTTEN cascade audit — the deletion-impact
    * report a pipeline produces BEFORE executing a GDPR/CCPA erasure
    * batch: given a forget-set of principals (~2% of customers here,
    * hash-selected so the oracle replays the same set; production
    * receives an explicit id list), count every row that must go,
    * FOLLOWING THE FK GRAPH — the customer rows, their orders, those
    * orders' lineitems (two hops deep: lineitem has no custkey, so a
    * naive single-hop delete strands order lines = a compliance
    * failure this audit exists to prevent), and the event-store rows
    * of the same principals. Per-table row: total / to-delete /
    * remaining. Shapes: deletion joins are left-SEMI on the FK keys
    * (shuffle-hash, never the row payload — 100 TB deletes move ids,
    * not rows); the count pairs combine via single-row crossJoins.
    * When the forget-set is hash-defined (as here) the predicate
    * also pushes straight into each scan with NO join — the gated
    * plan keeps the id-list join shape because real erasure lists
    * are explicit. */
  def forgetCascade(s: SparkSession, dir: String,
      buckets: Int = 50): DataFrame = {
    def forgot(c: org.apache.spark.sql.Column) =
      (Sampling.hashBucket(concat(lit("forget|"), c.cast("string")))
        % buckets) === 0
    val cust = Tables.customer(s, dir)
    val delCust = cust.filter(forgot(col("c_custkey")))
      .select(col("c_custkey"))
    val ord = Tables.orders(s, dir)
    val delOrd = ord.join(delCust.hint("shuffle_hash"),
      col("o_custkey") === col("c_custkey"), "left_semi")
    val li = Tables.lineitem(s, dir)
    val delLi = li.join(delOrd.select(col("o_orderkey")).hint("shuffle_hash"),
      col("l_orderkey") === col("o_orderkey"), "left_semi")
    val ev = Tables.events(s, dir)
    val delEv = ev.filter(forgot(col("user_id")))
    def row(name: String, total: DataFrame, deleted: DataFrame): DataFrame =
      total.agg(count(lit(1)).as("n_total"))
        .crossJoin(deleted.agg(count(lit(1)).as("n_deleted")))
        .select(lit(name).as("table_name"), col("n_total"), col("n_deleted"),
          (col("n_total") - col("n_deleted")).as("n_remaining"))
    row("customer", cust, delCust)
      .unionByName(row("orders", ord, delOrd))
      .unionByName(row("lineitem", li, delLi))
      .unionByName(row("events", ev, delEv))
  }

  /** q348: PII PROPAGATION THROUGH DUP CLUSTERS (round-11) — the
    * privacy × dedup composition a real scrub needs: a leaked email
    * in ONE document is also in every near-copy of it, including
    * copies where OCR noise, truncation, or reformatting broke the
    * regex — so per-doc scanning (q210) systematically undercounts
    * and the correct unit of risk is the q59 CLUSTER: if any member
    * of a near-dup component is PII-flagged, every member is
    * suspect. Per component: size, directly-flagged members, the
    * propagated verdict, and `n_inherited` — the members ONLY the
    * cluster rule catches (the pool a per-doc scrub silently
    * ships). Shapes: the q59 components iteration + one narrow
    * regex scan + one component-keyed agg; covers graph vertices
    * (docs with ≥1 near-dup edge — a singleton's risk IS its q210
    * row). */
  def clusterPiiPropagation(s: SparkSession, dir: String): DataFrame = {
    val comp = Dedup.dedupComponents(s, dir)
    val flags = Tables.documents(s, dir).select(col("doc_id"),
      (regexp_count(col("text"), lit(EmailRe)) +
        regexp_count(col("text"), lit(PhoneRe)) +
        regexp_count(col("text"), lit(LongIdRe)) > 0).as("direct"))
    comp.join(flags, "doc_id")
      .groupBy(col("component"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("direct"), 1L).otherwise(0L)).as("n_flagged"))
      .select(col("component"), col("n_docs"), col("n_flagged"),
        (col("n_flagged") > 0L).as("cluster_flagged"),
        when(col("n_flagged") > 0L, col("n_docs") - col("n_flagged"))
          .otherwise(0L).as("n_inherited"))
  }

  /** q381: GENERALIZATION LADDER for k-anonymity (round-12) — the
    * decision table behind q130's check: a release that fails k at
    * the raw quasi-identifier grain climbs a FIXED generalization
    * schedule (Sweeney 2002; Samarati's full-domain generalization)
    * until the equivalence classes are large enough — and this
    * report shows the whole ladder at once, so the releasing
    * pipeline picks the LOWEST level whose suppression cost is
    * acceptable instead of generalizing blindly: level 0 =
    * (nation, 100-currency-unit balance band), level 1 =
    * (region, 1000-unit band), level 2 = (region). Per level:
    * class count, smallest class, rows that would need suppression
    * (classes < k) and the suppression ppm. One small dim join
    * (broadcast) + three bounded aggs over the SAME keyed frame. */
  def generalizationLadder(s: SparkSession, dir: String,
      k: Int = 5): DataFrame = {
    val dims = Tables.nation(s, dir)
      .select(col("n_nationkey"), col("n_regionkey"))
    val base = Tables.customer(s, dir)
      .join(broadcast(dims), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_nationkey").as("nat"), col("n_regionkey").as("reg"),
        expr("cast(round(c_acctbal * 100) as bigint)").as("cents"))
    def level(lv: Int, key: org.apache.spark.sql.Column): DataFrame =
      base.groupBy(key.as("qi_class"))
        .agg(count(lit(1)).as("m"))
        .agg(lit(lv.toLong).as("level"),
          count(lit(1)).as("n_classes"),
          min(col("m")).as("min_class"),
          sum(when(col("m") < k, col("m")).otherwise(0L)).as("n_suppressed"),
          sum(col("m")).as("n_rows"))
        .withColumn("suppression_ppm",
          expr("n_suppressed * 1000000 div n_rows"))
    level(0, concat_ws("|", col("nat"), expr("cents div 10000")))
      .unionByName(level(1, concat_ws("|", col("reg"), expr("cents div 100000"))))
      .unionByName(level(2, col("reg").cast("string")))
      .select(col("level"), col("n_classes"), col("min_class"),
        col("n_suppressed"), col("suppression_ppm"))
  }

  /** q467: DP COMPOSITION PLANNER (basic composition vs the
    * advanced/strong theorem — Dwork & Roth 2014, Thm 3.20) — the
    * fifth capacity planner (q342 LSH, q422 bloom, q427 CMS, q441
    * power, now privacy budget): before q144 releases its k-th
    * noisy aggregate someone must price the CUMULATIVE ε, and the
    * answer flips between k·ε (basic) and ε√(2k·ln(1/δ)) + k·ε(eᵉ−1)
    * (advanced) depending on k and ε — the planner says WHICH bound
    * is tighter for each cell of the (k, ε) grid. δ is
    * corpus-anchored at 1/n_docs (the standard "cryptographically
    * small against the dataset" choice), so ln(1/δ) = ln n comes
    * from the real corpus. Determinism: one micro-rounded ln for
    * the corpus row, one micro-rounded sqrt and one micro-rounded
    * expm1 per bounded grid row, every product on DECIMAL(38,0)
    * INTERNAL with BIGINT report columns. */
  def dpCompositionPlanner(s: SparkSession, dir: String): DataFrame = {
    val n = Tables.documents(s, dir)
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("ln_n_micro",
        expr("CAST(round(ln(CAST(n_docs AS DOUBLE)) * 1e6) AS BIGINT)"))
    val grid = s.createDataFrame(
        for (k <- Seq(1L, 4L, 16L, 64L, 256L);
             e <- Seq(10000L, 50000L, 100000L, 500000L)) yield (k, e))
      .toDF("k_releases", "eps_micro")
    grid.crossJoin(broadcast(n))
      .withColumn("basic_micro", expr(
        "CAST(CAST(k_releases AS DECIMAL(38,0)) * eps_micro AS BIGINT)"))
      // √(2k·ln(1/δ)) in milli: one IEEE sqrt per grid row
      .withColumn("rt_milli", expr(
        """CAST(round(sqrt(2.0 * k_releases
          | * CAST(ln_n_micro AS DOUBLE) / 1e6) * 1e3) AS BIGINT)"""
          .stripMargin))
      // eᵉ − 1 in micro: one IEEE expm1 per grid row (ε ≤ 0.5 here)
      .withColumn("em1_micro", expr(
        """CAST(round((exp(CAST(eps_micro AS DOUBLE) / 1e6) - 1.0)
          | * 1e6) AS BIGINT)""".stripMargin))
      .withColumn("advanced_micro", expr(
        """CAST(CAST(eps_micro AS DECIMAL(38,0)) * rt_milli div 1000
          | + CAST(k_releases AS DECIMAL(38,0)) * eps_micro
          |   * em1_micro div 1000000 AS BIGINT)""".stripMargin))
      .select(col("k_releases"), col("eps_micro"), col("n_docs"),
        col("basic_micro"), col("advanced_micro"),
        (col("advanced_micro") < col("basic_micro"))
          .as("advanced_wins"))
  }
}
