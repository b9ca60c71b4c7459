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
