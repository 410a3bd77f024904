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
      // a SHUFFLED cartesian product multiplies two unbounded sides
      // with no key at all — never acceptable in a declared plan (a
      // broadcast nested loop with a bounded side is the audited-
      // separately broadcast class; a true CartesianProductExec means
      // the planner found neither keys nor a broadcastable side)
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec
          if !boundedByLimit(c.left) && !boundedByLimit(c.right) =>
        Finding("cartesian-product", c.nodeName)
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

  /** Column names that KEY a corpus-growing table: an aggregate
    * grouped by one of these has |corpus| groups, so it does not
    * bound a frame (and must never be broadcast by promise).
    * Name-based, like [[DefaultCorpusGrowing]] — an alias can evade
    * it, which is why unknown leaves stay conservative. */
  val DefaultCorpusKeyCols: Set[String] =
    Set("doc_id", "vec_id", "user_id", "o_orderkey", "l_orderkey",
      "orderkey")

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
      // |groups| rows — the strata shape. But ONLY when the grouping
      // keys exclude known corpus keys: groupBy(doc_id) has |corpus|
      // rows and is exactly the OOM class this audit targets (round-9
      // advisor). A corpus-keyed aggregate can still be bounded by
      // what it aggregates OVER (children all bounded).
      case a: Aggregate =>
        !a.groupingExpressions.exists(_.references.exists(r =>
          DefaultCorpusKeyCols.contains(r.name.toLowerCase))) ||
          a.children.forall(bounded)
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

  // ---- low-cardinality-partition windows (the fourth class) --------

  /** Columns that are low-cardinality BY CONSTRUCTION — enum-like
    * dimension attributes whose distinct count does not grow with the
    * corpus (the events fixture's event_type has ~5 values; period is
    * a 2-way split; split/relation are declared label sets). A window
    * partitioned ONLY by these keys runs each partition's whole frame
    * through one task — fine when the frame itself is bounded, a
    * scale-up death when it grows with the corpus (q178's original
    * plan: ~n/5 distinct values sorted in one task at 100×).
    *
    * Deliberately ABSENT: range-bucket columns (`__gr_b` and friends)
    * — a bucketing key in the partition spec is exactly the remedy,
    * multiplying parallelism by the bucket count
    * ([[graft.operators.GlobalRank.cumSumBy]]). */
  val DefaultLowCardCols: Set[String] =
    Set("event_type", "period", "split", "relation", "e1", "e2", "e3",
      "type_a", "type_b")

  /** Columns whose distinct count is structurally bounded (calendar
    * grain, histogram bins, deciles): an aggregate grouped by
    * low-card ∪ these keys yields a bounded frame, so a per-enum
    * window OVER such an aggregate is fine (q173's per-type window
    * over |days| rows; q57's over histogram buckets). `value`-like
    * continuous measures are deliberately absent — their distinct
    * count tracks the corpus, which is exactly what separates q178's
    * original plan from q173. */
  val DefaultBoundedFrameCols: Set[String] =
    Set("day", "date", "week", "month", "hour", "hr", "bin", "bucket",
      "decile", "period",
      // histogram-bin edges: functionally dependent on `bin` in every
      // rollup in this codebase (Sketches.dailyValueHistograms)
      "lo", "hi",
      // the two-level machinery's range-bucket column (cumHistogram):
      // an aggregate grouped by (group, __b) has ≤ |groups|·buckets
      // rows — the bounded frame its prefix window then rides
      "__b")

  /** The FOURTH hazard class: a `Window` whose partition keys are ALL
    * low-cardinality-by-construction while its child frame grows with
    * the corpus. [[singleTaskHazards]] cannot see this — the window IS
    * partitioned, just by a ~5-value key, so the plan looks parallel
    * while every partition's frame lands in one task.
    *
    * A child frame counts as bounded when every row path passes
    * through an aggregate whose grouping keys are all bounded-
    * cardinality columns (`lowCard ∪ boundedCols` — the q173/q57
    * shape), a global limit, or reads only non-growing leaves. An
    * aggregate grouped by a continuous corpus measure (q178's
    * `value`) does NOT bound — its distinct count tracks the corpus.
    *
    * Audits the ANALYZED logical plan: the optimizer may collapse
    * aliases, but grouping/partition attribute NAMES are what the
    * heuristic keys on, and they survive analysis untouched. */
  def lowCardPartitionWindowHazards(
      df: DataFrame,
      lowCard: Set[String] = DefaultLowCardCols,
      boundedCols: Set[String] = DefaultBoundedFrameCols,
      corpusGrowing: Set[String] = DefaultCorpusGrowing): Seq[Finding] = {
    import org.apache.spark.sql.catalyst.plans.logical._
    val frameBounding = lowCard ++ boundedCols
    def leafGrowing(p: LogicalPlan): Boolean = p match {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation match {
          case fs: org.apache.spark.sql.execution.datasources
              .HadoopFsRelation =>
            fs.location.rootPaths.exists { rp =>
              val segs = rp.toString.toLowerCase.split("[/\\\\]").toSeq
              segs.exists(s => corpusGrowing.exists(g =>
                s == g || s.startsWith(g + ".")))
            }
          case _ => true
        }
      case r: org.apache.spark.sql.execution.datasources.v2
          .DataSourceV2Relation =>
        corpusGrowing.exists(g => r.table.name().toLowerCase.contains(g))
      case _: LocalRelation | _: OneRowRelation => false
      case _: Range => false
      case _ => true
    }
    // A grouping expression is bounded-cardinality when its OUTPUT
    // name (alias or attribute — `groupBy(to_date(ts).as("day"))`
    // keeps the Alias in the analyzed Aggregate, and the underlying
    // `ts` reference must not defeat the day-grain) is a declared
    // bounded column, or when it is DATE-typed outright (calendar
    // grain regardless of name).
    def groupBounded(e: org.apache.spark.sql.catalyst.expressions
        .Expression): Boolean = {
      import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute,
        Literal, TruncDate, TruncTimestamp}
      val named = e match {
        case a: Alias => Some(a.name)
        case a: Attribute => Some(a.name)
        case _ => None
      }
      // date_trunc at hour grain or coarser: the analyzer strips the
      // `.as("hr")` alias from grouping expressions, so the calendar
      // truncation itself must be recognized (≤ |hours in the corpus
      // span| distinct values — time-bounded like `day`)
      val coarseTrunc = e match {
        case t: TruncTimestamp => t.format match {
          case Literal(s, _) if s != null =>
            Set("year", "yyyy", "yy", "quarter", "month", "mon", "mm",
              "week", "day", "dd", "hour").contains(
              s.toString.toLowerCase)
          case _ => false
        }
        case _: TruncDate => true // date-grain by type
        case _ => false
      }
      named.exists(n => frameBounding.contains(n.toLowerCase)) ||
        e.dataType == org.apache.spark.sql.types.DateType ||
        coarseTrunc
    }
    def frameBounded(p: LogicalPlan): Boolean = p match {
      case a: Aggregate =>
        a.groupingExpressions.forall(groupBounded) ||
          a.children.forall(frameBounded)
      // `.distinct()` is a Deduplicate node in the ANALYZED plan (the
      // optimizer later rewrites it to an Aggregate): |distinct keys|
      // rows, bounded exactly when the keys are
      case d: Deduplicate =>
        d.keys.forall(groupBounded) || d.children.forall(frameBounded)
      case _: GlobalLimit => true
      case l: LeafNode => !leafGrowing(l)
      case other =>
        other.children.nonEmpty && other.children.forall(frameBounded)
    }
    df.queryExecution.analyzed.collect {
      case w: Window
          if w.partitionSpec.nonEmpty &&
            w.partitionSpec.forall(_.references.forall(r =>
              lowCard.contains(r.name.toLowerCase))) &&
            !frameBounded(w.child) =>
        Finding("low-card-partition-window",
          w.partitionSpec.flatMap(_.references.map(_.name))
            .distinct.mkString("partitionBy(", ",", ")") +
            " over a corpus-growing frame")
    }
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
