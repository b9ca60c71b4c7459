package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.{Inner, LeftSemi}
import org.apache.spark.sql.execution.{LocalTableScanExec, RangeExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.joins.{BaseJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec}
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
  *  - `low-cardinality-partition-window`: a WindowExec partitioned
  *    ONLY by tiny-domain enum keys (segment/status/type — a handful
  *    of values) over an input that is not provably bounded: each of
  *    the few partitions sorts |input|/|domain| rows on ONE task —
  *    the q246-class killer an `unpartitioned-window` check misses
  *    because the window IS partitioned, just by a 5-value key. The
  *    input counts as bounded when every path below the window passes
  *    through an aggregate whose grouping keys are all tiny-domain or
  *    bounded-axis names (bin/hour/bucket tables — the q97 class);
  *    an aggregate grouped by an unbounded key (custkey, user_id)
  *    does NOT bound its output. Domain knowledge comes in via
  *    [[TinyDomains]] / [[BoundedAxes]] (this deployment's schema
  *    enums), overridable per call.
  *
  * The lint is advisory by name ([[audit]]) and enforcing by
  * [[assertClean]]; rules the caller has judged safe are passed in
  * `allow` — an EXPLICIT allowlist at the call site, mirroring how
  * the scaladocs justify each documented exception. AQE plans are
  * descended through their current physical plan. */
object PlanLint {

  final case class Finding(rule: String, node: String)

  /** Enum-like columns of this deployment's schema: a handful of
    * distinct values each, so a window partitioned ONLY by these
    * has almost no parallelism. */
  val TinyDomains: Set[String] = Set(
    "c_mktsegment", "o_orderstatus", "o_orderpriority", "l_returnflag",
    "l_linestatus", "l_shipmode", "n_name", "r_name", "p_type", "p_brand",
    "event_type", "qualifier", "from_type", "to_type", "next_type", "lang",
    "source", "label", "q_label", "seg", "nat", "split", "digit", "tag", "g")

  /** Derived bounded axes: grouping by any mix of these (plus tiny
    * domains) yields a bounded table — bins, buckets, grids — whose
    * size is set by a knob, not by the corpus. */
  val BoundedAxes: Set[String] = Set(
    "bin", "bucket", "band", "h", "hour", "day", "week", "month", "epoch",
    "k", "window", "win", "shard", "cohort_week", "cohort_day", "qual",
    "grp", "bg", "nh", "cell", "slot")

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

  /** True iff every leaf-ward path below `p` passes through a
    * size-bounding node — i.e. the subtree's output size is set by
    * domain knobs, not by the corpus. Bounding nodes:
    *  - an aggregate whose grouping keys are all tiny/bounded NAMES
    *    (alias names, so `expr("v div 16").as("bin")` counts as the
    *    bin axis it is) — an aggregate grouped by an unbounded key
    *    (custkey, user_id) does NOT bound its output;
    *  - a literal local relation / range (threshold grids, quantile
    *    label frames);
    *  - an inner/semi equi-join whose keys include a bounded-axis
    *    name and whose OTHER side is bounded: the boundary-bin
    *    refinement pattern (q97/q117/q231) — joining corpus rows to
    *    a bounded set ON a bin key restricts the output to those
    *    bins' occupancy. (Heuristic: a bounded build side that
    *    covers EVERY bin restricts nothing — that case is on the
    *    author, as the scaladocs document per site.)
    * A leaf reached without one means corpus rows flow through. */
  private def boundedBelow(p: SparkPlan, bounded: Set[String],
      axes: Set[String]): Boolean = {
    import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Expression, Floor, IntegralDivide, Pmod, TruncDate, TruncTimestamp}
    import org.apache.spark.sql.execution.ProjectExec
    // Catalyst extracts complex grouping expressions into
    // `_groupingexpression#N` attributes defined by a Project below —
    // resolve those back to their defining expression.
    def definingExpr(p: SparkPlan, attr: Attribute): Option[Expression] =
      (p match {
        case pr: ProjectExec => pr.projectList.collectFirst {
          case al: Alias if al.exprId == attr.exprId => al.child
        }
        case _ => None
      }).orElse(p.children.view.flatMap(c => definingExpr(c, attr)).headOption)
    // A binning derivation (integral div, floor, pmod, date trunc)
    // collapses its input domain by the divisor — the bin/hour/bucket
    // axes this codebase builds everywhere; treat as bounded.
    def isBinDerivation(e: Expression): Boolean =
      e.exists {
        case _: IntegralDivide | _: Floor | _: Pmod | _: TruncDate |
             _: TruncTimestamp => true
        case _ => false
      }
    def walk(n: SparkPlan): Boolean = n match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case s: QueryStageExec => walk(s.plan)
      case a: BaseAggregateExec
          if a.groupingExpressions.forall(ne => bounded.contains(ne.name) ||
            definingExpr(a, ne.toAttribute).exists(isBinDerivation)) =>
        true
      case _: LocalTableScanExec => true
      case _: RangeExec => true
      case j: BaseJoinExec
          if (j.joinType == Inner || j.joinType == LeftSemi) &&
            (j.leftKeys ++ j.rightKeys).flatMap(_.references)
              .exists(r => axes.contains(r.name)) &&
            (walk(j.left) || walk(j.right)) => true
      case n if n.children.isEmpty => false
      case n => n.children.forall(walk)
    }
    p.children.forall(walk)
  }

  def audit(df: DataFrame,
      tinyDomains: Set[String] = TinyDomains,
      boundedAxes: Set[String] = BoundedAxes): Seq[Finding] = {
    val boundedNames = tinyDomains ++ boundedAxes
    allNodes(df.queryExecution.executedPlan).flatMap {
      case n: CartesianProductExec =>
        Some(Finding("cartesian-product", n.nodeName))
      case n: BroadcastNestedLoopJoinExec =>
        Some(Finding("nested-loop-join", n.nodeName))
      case n: WindowExec if n.partitionSpec.isEmpty =>
        Some(Finding("unpartitioned-window", n.nodeName))
      case n: WindowExec
          if n.partitionSpec.flatMap(_.references).forall(
            r => tinyDomains.contains(r.name)) &&
            !boundedBelow(n, boundedNames, boundedAxes) =>
        Some(Finding("low-cardinality-partition-window", n.nodeName))
      case _ => None
    }
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
