package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Static scale-hazard audit of a DataFrame's PHYSICAL plan — the
  * checks this library pins per-operator in PlanSpec, packaged as a
  * reusable guard a pipeline can run on any composed query before
  * launching it at 100 TB:
  *
  *  - `cartesian-product`: a CartesianProductExec multiplies its
  *    inputs — corpus × corpus never finishes;
  *  - `nested-loop-join`: a BroadcastNestedLoopJoinExec re-scans the
  *    broadcast side per row. Legitimate ONLY for the single-row /
  *    bounded-literal broadcasts this codebase documents (scalar
  *    totals, threshold grids) — the caller allowlists those;
  *  - `unpartitioned-window`: a WindowExec with an empty
  *    partitionSpec sorts the ENTIRE input on one task. Legitimate
  *    only over bounded tables (hour/bin/bucket rollups — the q97
  *    class), never over corpus rows.
  *
  * The lint is advisory by name ([[audit]]) and enforcing by
  * [[assertClean]]; rules the caller has judged safe are passed in
  * `allow` — an EXPLICIT allowlist at the call site, mirroring how
  * the scaladocs justify each documented exception. AQE plans are
  * descended through their current physical plan. */
object PlanLint {

  final case class Finding(rule: String, node: String)

  private def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    // Children alone miss two containers: materialized AQE stages hold
    // their subtree in `plan` with no children, and subquery expressions
    // (scalar / IN) hang whole plans off `subqueries` — a cartesian
    // hidden in either must not pass the lint silently.
    val below = p match {
      case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
      case s: QueryStageExec => allNodes(s.plan)
      case _ => p.children.flatMap(allNodes)
    }
    (p +: below) ++ p.subqueries.flatMap(allNodes)
  }

  def audit(df: DataFrame): Seq[Finding] =
    allNodes(df.queryExecution.executedPlan).flatMap {
      case n: CartesianProductExec =>
        Some(Finding("cartesian-product", n.nodeName))
      case n: BroadcastNestedLoopJoinExec =>
        Some(Finding("nested-loop-join", n.nodeName))
      case n: WindowExec if n.partitionSpec.isEmpty =>
        Some(Finding("unpartitioned-window", n.nodeName))
      case _ => None
    }

  /** Throws IllegalStateException naming every finding whose rule is
    * not in `allow`; returns the (allowed) findings otherwise. */
  def assertClean(df: DataFrame,
      allow: Set[String] = Set.empty): Seq[Finding] = {
    val fs = audit(df)
    val bad = fs.filterNot(f => allow.contains(f.rule))
    if (bad.nonEmpty) throw new IllegalStateException(
      s"plan lint: ${bad.map(f => s"${f.rule} at ${f.node}").mkString("; ")}")
    fs
  }
}
