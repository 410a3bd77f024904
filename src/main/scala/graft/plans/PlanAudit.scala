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

  // ---- broadcast boundedness (the third scale-killer class) --------

  /** Input names that GROW WITH THE CORPUS: broadcasting a frame
    * whose row count tracks any of these is the third scale-killer —
    * fine at sf0.01, an executor-OOM broadcast at 100 TB. The set
    * names the fact tables plus the ledgers' per-document state dirs
    * (fingerprints/signatures: ≪ corpus BYTES but still |docs| ROWS —
    * never broadcastable). Dimension tables (region/nation/supplier/
    * part/customer) are deliberately absent: they scale far below the
    * fact tables and broadcasting them is the intended plan. */
  val DefaultCorpusGrowing: Set[String] =
    Set("documents", "events", "lineitem", "orders", "embeddings",
      "sigs", "keys")

  /** Every `broadcast()`-hinted join side that is NOT bounded by
    * construction. A side is bounded when every row path into it
    * passes through a grouped aggregate (|strata|/|centroids|/
    * threshold frames — includes `distinct()`), a global limit
    * (top-k), or reads only non-corpus-growing leaves (dimension
    * scans, literal local relations, `Range`). Conservative on
    * unknown leaves (e.g. `LogicalRDD` from a checkpoint, whose
    * lineage is cut): they count as growing and need a named
    * exemption at the call site — the same discipline as the q41
    * window allowlist.
    *
    * Audits the OPTIMIZED LOGICAL plan, where `broadcast()` hints
    * live as `JoinHint`s — no execution needed, and auto-broadcasts
    * chosen by size estimation (which AQE revisits at runtime) are
    * deliberately out of scope: the audit targets the author's
    * PROMISE that a frame stays small, which is exactly what a hint
    * is. */
  def unboundedBroadcastHints(
      df: DataFrame,
      corpusGrowing: Set[String] = DefaultCorpusGrowing): Seq[Finding] = {
    import org.apache.spark.sql.catalyst.plans.logical._
    def leafGrowing(p: LogicalPlan): Boolean = p match {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation match {
          case fs: org.apache.spark.sql.execution.datasources
              .HadoopFsRelation =>
            fs.location.rootPaths.exists { rp =>
              val segs =
                rp.toString.toLowerCase.split("[/\\\\]").toSeq
              segs.exists(s => corpusGrowing.exists(g =>
                s == g || s.startsWith(g + ".")))
            }
          case _ => true // unknown V1 source: assume it can grow
        }
      case r: org.apache.spark.sql.execution.datasources.v2
          .DataSourceV2Relation =>
        corpusGrowing.exists(g => r.table.name().toLowerCase.contains(g))
      case _: LocalRelation | _: OneRowRelation => false
      case _: Range => false // literal-bounded by its arguments
      case _ => true // unknown leaf (LogicalRDD, ...): assume growing
    }
    def bounded(p: LogicalPlan): Boolean = p match {
      case _: Aggregate => true // |groups| rows — the strata shape
      case _: GlobalLimit => true
      case l: LeafNode => !leafGrowing(l)
      case other =>
        other.children.nonEmpty && other.children.forall(bounded)
    }
    df.queryExecution.optimizedPlan.collect {
      case j: Join =>
        Seq(("left", j.hint.leftHint, j.left),
          ("right", j.hint.rightHint, j.right)).collect {
          case (tag, Some(h), side)
              if h.strategy.contains(BROADCAST) && !bounded(side) =>
            Finding(s"unbounded-broadcast-$tag",
              side.nodeName + ": " + side.simpleString(60))
        }
    }.flatten
  }

  /** Throws IllegalStateException listing every unbounded broadcast
    * hint; chainable like [[assertScalable]]. */
  def assertBoundedBroadcasts(df: DataFrame): DataFrame = {
    val bad = unboundedBroadcastHints(df)
    if (bad.nonEmpty)
      throw new IllegalStateException(
        "plan broadcasts corpus-growing frames:\n" +
          bad.map(f => s"  [${f.kind}] ${f.node}").mkString("\n"))
    df
  }
}
