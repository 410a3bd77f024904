package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{ENSURE_REQUIREMENTS, ShuffleExchangeExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Library-surface plan auditing: the SURVEY §4.3 "no unpartitioned
  * window / no single-partition repartition" discipline as a callable
  * check, so pipelines built ON this engine can gate their own queries
  * the way GlobalRankSpec gates q75/q92/q124/q126.
  *
  * Two shapes serialize an arbitrarily large frame through ONE task and
  * therefore die at scale no matter how fast the rest of the plan is:
  *  - `WindowExec` with an empty partitionSpec (`Window.orderBy` with
  *    no `partitionBy`) — one task sorts every row;
  *  - an explicit single-partition shuffle (`repartition(1)` /
  *    `coalesce(1)` planned as an exchange) — distinguished from the
  *    benign ENSURE_REQUIREMENTS single-partition exchange under a
  *    scalar aggregate, whose input is one partial-agg row per task.
  *
  * [[graft.operators.GlobalRank]] is the drop-in replacement for the
  * first; a keyed repartition or no repartition at all for the second.
  */
object PlanAudit {

  final case class Finding(kind: String, node: String)

  /** Full physical traversal: AQE wraps every stage (including, since
    * Spark 4, the RESULT stage) in leaf QueryStageExec nodes that
    * `collect` does not descend into — step through adaptive roots,
    * stage boundaries, and subquery plans explicitly. Public: plan
    * posture specs (GlobalRankSpec, BloomSpec) reuse it. */
  def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val through: Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    p +: (through ++ p.subqueries).flatMap(flatten)
  }

  /** True when every row-path into `p` provably flows through a LIMIT
    * with no row-expanding node in between: an unpartitioned window
    * over such an input holds ≤ k rows in its single task and is NOT a
    * scale hazard (e.g. a rank over a top-k frame). Conservative: any
    * node outside the non-expanding unary set (project/filter/sort/
    * exchange/codegen wrappers) stops the descent. */
  private def boundedByLimit(p: SparkPlan): Boolean = {
    import org.apache.spark.sql.execution._
    p match {
      // NOT LocalLimitExec: LocalLimit(k) caps rows PER PARTITION, so
      // k·numPartitions rows can still reach a window above a shuffle
      // of its output — only a global bound is a real bound. Real limit
      // plans always carry one of these global nodes.
      case _: GlobalLimitExec |
          _: TakeOrderedAndProjectExec | _: CollectLimitExec => true
      case a: AdaptiveSparkPlanExec => boundedByLimit(a.executedPlan)
      case q: QueryStageExec => boundedByLimit(q.plan)
      case _: ProjectExec | _: FilterExec | _: SortExec |
          _: CoalesceExec | _: WholeStageCodegenExec |
          _: InputAdapter | _: ShuffleExchangeExec =>
        p.children.forall(boundedByLimit)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        boundedByLimit(r.child)
      case _ => false
    }
  }

  /** All single-task scale hazards in the query's physical plan.
    * Call AFTER an action if AQE is on (the final adaptive plan is
    * what executes); with AQE off the static plan is complete. */
  def singleTaskHazards(df: DataFrame): Seq[Finding] =
    flatten(df.queryExecution.executedPlan).collect {
      case w: WindowExec
          if w.partitionSpec.isEmpty && !boundedByLimit(w.child) =>
        Finding("unpartitioned-window", w.nodeName)
      case s: ShuffleExchangeExec
          if s.outputPartitioning.numPartitions == 1
            && s.shuffleOrigin != ENSURE_REQUIREMENTS =>
        Finding("single-partition-shuffle", s.nodeName)
    }

  /** Throws IllegalStateException listing every hazard; returns the
    * DataFrame unchanged otherwise (chainable). */
  def assertScalable(df: DataFrame): DataFrame = {
    val hazards = singleTaskHazards(df)
    if (hazards.nonEmpty)
      throw new IllegalStateException(
        "plan contains single-task scale hazards:\n" +
          hazards.map(f => s"  [${f.kind}] ${f.node}").mkString("\n"))
    df
  }
}
