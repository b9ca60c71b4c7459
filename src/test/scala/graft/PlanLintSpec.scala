package graft

import graft.plans.PlanLint
import graft.operators.{Dedup, Events}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** PlanLint: the packaged form of this repo's plan-shape pins. */
class PlanLintSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sfDir)

  test("detects a corpus cross join") {
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val bad = docs.as("a").crossJoin(docs.as("b"))
      val rules = PlanLint.audit(bad).map(_.rule).toSet
      assert(rules.contains("cartesian-product") ||
        rules.contains("nested-loop-join"), s"cross join not flagged: $rules")
      intercept[IllegalStateException] { PlanLint.assertClean(bad) }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }

  test("detects an unpartitioned window over the corpus") {
    val w = Window.orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bad = docs.select(col("doc_id"), sum(col("doc_id")).over(w).as("c"))
    assert(PlanLint.audit(bad).exists(_.rule == "unpartitioned-window"))
  }

  test("gated operators lint clean (modulo their documented exceptions)") {
    // q12: pure hash-agg compaction — fully clean
    assert(PlanLint.assertClean(Events.latestState(spark, sfDir)).isEmpty)
    // q22: banding equi-joins — fully clean
    assert(PlanLint.assertClean(Dedup.minhashLsh(spark, sfDir)).isEmpty)
    // q192: range left-join assembly — single-row broadcasts allowed,
    // nothing else
    PlanLint.assertClean(Events.walIntegrity(spark, sfDir),
      allow = Set("nested-loop-join"))
    // q201: the documented bounded 7-row threshold nested-loop join
    // plus q21's bounded-bin windows; a cartesian stays forbidden
    PlanLint.assertClean(Dedup.dedupThresholdSweep(spark, sfDir),
      allow = Set("nested-loop-join", "unpartitioned-window"))
  }

  test("every round-7/8 operator is cartesian-free") {
    import graft.operators._
    // nested-loop joins (single-row / bounded-grid broadcasts) and
    // bounded-table windows are the two documented exception
    // classes; an actual cartesian product is never acceptable
    for ((name, df) <- Seq(
        "q193" -> Events.acfLags(spark, sfDir),
        "q194" -> Dedup.editVerify(spark, sfDir),
        "q196" -> TextAnalysis.heapsVocab(spark, sfDir),
        "q197" -> Similarity.ivfDeltaProbe(spark, sfDir),
        "q198" -> StreamingOps.completenessCurve(spark, sfDir),
        "q199" -> Privacy.tCloseness(spark, sfDir),
        "q200" -> Events.autoAnomaly(spark, sfDir),
        "q201" -> Dedup.dedupThresholdSweep(spark, sfDir),
        "q202" -> Pipeline.mixtureTemperature(spark, sfDir),
        "q203" -> Events.activeUsers(spark, sfDir),
        "q204" -> Pipeline.sourceQualityCalibration(spark, sfDir),
        "q205" -> Relational.constraintChecks(spark, sfDir),
        "q206" -> Events.survivalCurve(spark, sfDir),
        "q209" -> Events.cohortFunnel(spark, sfDir),
        "q210" -> Privacy.piiScan(spark, sfDir),
        "q211" -> TextAnalysis.langConfusion(spark, sfDir),
        "q213" -> Relational.benfordAudit(spark, sfDir),
        "q214" -> TextAnalysis.raterAgreement(spark, sfDir),
        "q215" -> TextAnalysis.readability(spark, sfDir),
        "q216" -> TextAnalysis.tokenizerFertility(spark, sfDir),
        "q217" -> Pipeline.chunkManifest(spark, sfDir),
        "q218" -> Similarity.pqRecall(spark, sfDir),
        "q219" -> Dedup.dupDrift(spark, sfDir),
        "q220" -> TextAnalysis.ngramNovelty(spark, sfDir),
        "q222" -> Incremental.categoryDrift(spark, sfDir),
        "q223" -> Dedup.edgeCohesion(spark, sfDir),
        "q224" -> Similarity.mmrDiversify(spark, sfDir),
        "q225" -> Multimodal.sceneCuts(spark, sfDir),
        "q226" -> Events.bounceRate(spark, sfDir),
        "q227" -> TextAnalysis.charEntropy(spark, sfDir),
        "q228" -> Events.cohortLtv(spark, sfDir),
        "q229" -> Events.seasonalProfile(spark, sfDir),
        "q231" -> Sketch.groupQuantileBands(spark, sfDir),
        "q232" -> TextAnalysis.codeSwitch(spark, sfDir),
        "q233" -> Similarity.embedOutliers(spark, sfDir),
        "q234" -> Relational.reconciliation(spark, sfDir),
        "q235" -> Relational.shipLatency(spark, sfDir),
        "q236" -> Relational.priceConsistency(spark, sfDir),
        "q237" -> Pipeline.contrastivePairs(spark, sfDir),
        "q238" -> Similarity.sq8Calibration(spark, sfDir),
        "q239" -> Sampling.epochShuffle(spark, sfDir),
        "q240" -> Pipeline.packingEfficiency(spark, sfDir),
        "q241" -> Relational.rfmSegments(spark, sfDir),
        "q242" -> Events.cusumChangepoints(spark, sfDir),
        "q244" -> Events.bitmaskRetention(spark, sfDir),
        "q245" -> Events.sessionMaintenanceOverlap(spark, sfDir),
        "q246" -> Relational.revenueGini(spark, sfDir),
        "q248" -> TextAnalysis.vocabCoverage(spark, sfDir),
        "q249" -> Incremental.ivmJoin(spark, sfDir),
        "q250" -> Sketch.kmvOverlap(spark, sfDir),
        "q251" -> Bucketing.partitionBloomAudit(spark, sfDir),
        "q253" -> Events.stlDecompose(spark, sfDir),
        "q254" -> Events.windowFunnel(spark, sfDir),
        "q255" -> Multimodal.alignmentFilter(spark, sfDir),
        "q256" -> Relational.copurchaseTopK(spark, sfDir),
        "q257" -> Pipeline.csvIngest(spark, sfDir),
        "q258" -> Bucketing.dynamicPartitionPruning(spark, sfDir),
        "q259" -> Pipeline.temporalSplit(spark, sfDir),
        "q260" -> Similarity.jlProjection(spark, sfDir),
        "q262" -> Events.maxVersionsRead(spark, sfDir),
        "q263" -> StreamingOps.consumerLag(spark, sfDir),
        "q264" -> Relational.abcClasses(spark, sfDir),
        "q265" -> Events.spikeAttribution(spark, sfDir),
        "q266" -> Dedup.degreeAssortativity(spark, sfDir),
        "q267" -> Events.eventDebounce(spark, sfDir),
        "q268" -> Relational.sqlApi(spark, sfDir),
        "q271" -> Events.theilSenForecast(spark, sfDir),
        "q272" -> Relational.cboSkewAudit(spark, sfDir))) {
      val rules = graft.plans.PlanLint.audit(df).map(_.rule).toSet
      assert(!rules.contains("cartesian-product"),
        s"$name has a cartesian product")
    }
  }

  test("low-cardinality-partition window: fires on the pre-fix q246 shape") {
    // reconstruct round-8 q246: a rank window partitioned ONLY by the
    // 5-value segment over customer-grain rows — each task sorts
    // |customers|/5 rows; the unpartitioned-window check misses it
    // because the window IS partitioned
    val perCust = Tables.orders(spark, sfDir).groupBy(col("o_custkey"))
      .agg(sum(expr("cast(round(o_totalprice * 100) as bigint)")).as("cents"))
    val seg = perCust.join(Tables.customer(spark, sfDir)
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment")), "o_custkey")
    val bad = seg.withColumn("i", row_number().over(
      Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("cents"), col("o_custkey"))))
    assert(PlanLint.audit(bad).exists(
      _.rule == "low-cardinality-partition-window"),
      "pre-fix q246 shape must fire the low-cardinality window rule")
  }

  test("low-cardinality-partition window: two-phase ranks sweep clean") {
    import graft.operators.{Relational, Sketch}
    for ((name, df) <- Seq(
        "q246" -> Relational.revenueGini(spark, sfDir),
        "q40" -> Relational.medianOrder(spark, sfDir),
        "q67" -> Relational.groupQuartiles(spark, sfDir),
        "q35" -> Relational.supplierBalance(spark, sfDir),
        "q11" -> Relational.partTypeTopK(spark, sfDir),
        // documented bounded-input classes the heuristic must clear:
        // boundary-bin refinement joins + bin-table windows
        "q97" -> Sketch.histQuantiles(spark, sfDir),
        "q231" -> Sketch.groupQuantileBands(spark, sfDir),
        "q154" -> Sketch.robustOutliers(spark, sfDir)))
      assert(!PlanLint.audit(df).exists(
        _.rule == "low-cardinality-partition-window"),
        s"$name fires the low-cardinality window rule")
  }

  test("allowlist admits only the named rule") {
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val bad = docs.as("a").crossJoin(docs.as("b"))
      intercept[IllegalStateException] {
        PlanLint.assertClean(bad, allow = Set("unpartitioned-window"))
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }
}
