package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deequ-style data-quality constraint audit (the public
  * amazon-deequ "VerificationSuite" shape): declare completeness /
  * uniqueness / range / set / pattern constraints against a table,
  * get back one report row per constraint with the measured metric
  * and a pass flag. (The reference engine has no counterpart — this
  * extends the engine's pipeline-hardening surface, SURVEY §2.12;
  * a 100 TB ingest without an audit gate ships silent corruption.)
  *
  * Scale contract: every metric is expressed as an AGGREGATE COLUMN,
  * and [[audit]] evaluates all of a table's metrics in ONE
  * `agg(...)` — a single scan with map-side partial aggregation, no
  * matter how many constraints are declared (Deequ's analyzer-
  * batching insight). Only [[refFraction]] (referential integrity)
  * adds a join, and its probe side carries nothing but the key.
  * Nothing collects more than one row per table.
  */
object Constraints {

  /** One declared constraint: `metric` must be an aggregate
    * expression yielding DOUBLE; `pass` maps the measured-metric
    * COLUMN to the verdict column (e.g. `_ >= 1.0`). */
  final case class Check(
      name: String, metric: Column, pass: Column => Column)

  /** Fraction of rows satisfying `cond` — the workhorse metric
    * (completeness, range, set membership, pattern). Integer
    * sum/count ratio, so both engines derive the identical double. */
  def fraction(cond: Column): Column =
    sum(when(cond, 1L).otherwise(0L)).cast("double") /
      count(lit(1)).cast("double")

  /** Distinct-combinations-to-rows ratio: 1.0 iff the columns form a
    * unique key. Exact distinct (a shuffle), not approx — an audit
    * gate that can false-pass inside HLL error defeats its purpose;
    * the distinct agg still partial-aggregates map-side. */
  def uniqueness(cols: Column*): Column =
    count_distinct(cols.head, cols.tail: _*).cast("double") /
      count(lit(1)).cast("double")

  /** Evaluate all `checks` against `df` in a single aggregate pass
    * and return (check_name, metric, passed) rows — the whole audit
    * is one scan + a 1-row explode. */
  def audit(df: DataFrame, checks: Seq[Check]): DataFrame = {
    val metricCols = checks.zipWithIndex.map { case (c, i) =>
      round(c.metric, 6).as(s"__m$i")
    }
    val one = df.agg(metricCols.head, metricCols.tail: _*)
    val reports = checks.zipWithIndex.map { case (c, i) =>
      struct(
        lit(c.name).as("check_name"),
        col(s"__m$i").as("metric"),
        c.pass(col(s"__m$i")).as("passed"))
    }
    one.select(explode(array(reports: _*)).as("r")).select("r.*")
  }

  /** Referential-integrity metric as its own 1-row frame: fraction of
    * `child` rows whose `childKey` exists in `parent.parentKey`. The
    * probe ships only the key column; the build side is distinct
    * parent keys (broadcast when small, shuffle join otherwise). */
  def refFraction(
      child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String, name: String): DataFrame = {
    val hit = child.select(col(childKey).as("__k"))
      .join(
        parent.select(col(parentKey).as("__k")).distinct()
          .withColumn("__hit", lit(1L)),
        Seq("__k"), "left")
    hit.agg(round(fraction(col("__hit").isNotNull), 6).as("metric"))
      .select(
        lit(name).as("check_name"), col("metric"),
        (col("metric") >= 1.0).as("passed"))
  }

  /** q159 — the declared audit: nine constraints over lineitem +
    * orders (+ one referential join). Two FAIL on the fixture —
    * `bound_l_discount_le_005` (discounts run to 0.10) and
    * `uniqueness_l_orderkey_linenumber` (the synthetic generator
    * collides line numbers in ~24% of rows — exactly the class of
    * silent data defect an audit gate exists to surface) — so the
    * report exercises both verdict paths on real data. */
  def q159(t: graft.Tables): DataFrame = {
    val li = audit(t.lineitem, Seq(
      Check("completeness_l_shipdate",
        fraction(col("l_shipdate").isNotNull), _ >= 1.0),
      Check("uniqueness_l_orderkey_linenumber",
        uniqueness(col("l_orderkey"), col("l_linenumber")), _ >= 1.0),
      Check("range_l_quantity_1_50",
        fraction(col("l_quantity").between(1.0, 50.0)), _ >= 1.0),
      Check("nonneg_l_extendedprice",
        fraction(col("l_extendedprice") >= 0.0), _ >= 1.0),
      Check("bound_l_discount_le_005",
        fraction(col("l_discount") <= 0.05), _ >= 1.0)))
    val ord = audit(t.orders, Seq(
      Check("set_o_orderstatus",
        fraction(col("o_orderstatus").isin("O", "F", "P")), _ >= 1.0),
      Check("pattern_o_orderpriority",
        fraction(col("o_orderpriority").rlike("^[1-5]-[A-Z ]+$")),
        _ >= 1.0),
      Check("positive_o_totalprice",
        fraction(col("o_totalprice") > 0.0), _ >= 1.0)))
    val ref = refFraction(t.lineitem, "l_orderkey",
      t.orders, "o_orderkey", "ref_lineitem_orderkey_in_orders")
    li.unionByName(ord).unionByName(ref).orderBy("check_name")
  }

  // ---- q165: k-anonymity audit ------------------------------------

  /** k-anonymity audit over a quasi-identifier column set (the
    * Sweeney model every privacy review runs before a tabular release
    * — PII *redaction* (q150) handles direct identifiers; THIS
    * catches re-identification through combinations of innocent
    * columns): group rows into equivalence classes by the QI columns
    * and report the class-size histogram — `min(class_size)` IS the
    * dataset's k, and the small-size rows quantify exactly how much
    * re-identification surface a release would carry.
    *
    * Scale: one hash-agg on the QI key (partial map-side), a second
    * hash-agg on |distinct sizes| ≪ rows, and a 1-row total via the
    * scalar cross-join pattern — no unpartitioned window, nothing
    * driver-side. */
  def kAnonymity(df: DataFrame, qiCols: Seq[String]): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier")
    val classes = df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("__sz"))
    val hist = classes.groupBy(col("__sz").as("class_size"))
      .agg(count(lit(1)).as("n_classes"),
        sum(col("__sz")).as("n_rows"))
    val total = df.agg(count(lit(1)).as("__total"))
    hist.crossJoin(broadcast(total))
      .select(col("class_size").cast("long").as("class_size"),
        col("n_classes").cast("long").as("n_classes"),
        col("n_rows").cast("long").as("n_rows"),
        round(col("n_rows") * 100.0 / col("__total"), 4)
          .as("pct_rows"))
      .orderBy("class_size")
  }

  /** q165 — the declared audit: customer released with quasi-
    * identifiers (c_nationkey, c_mktsegment). First row's class_size
    * is the dataset's k. */
  def q165(t: graft.Tables): DataFrame =
    kAnonymity(t.customer, Seq("c_nationkey", "c_mktsegment"))

  // ---- q208: l-diversity audit ------------------------------------

  /** l-diversity audit (Machanavajjhala et al.) — k-anonymity's
    * necessary companion: a large equivalence class is still a leak
    * if everyone in it shares the SENSITIVE value (the homogeneity
    * attack q165's size histogram cannot see). Per QI class: row
    * count, the number of DISTINCT sensitive values (distinct
    * l-diversity — the class's l), the base-2 entropy of the
    * sensitive distribution (entropy l-diversity: a class passes
    * "entropy l" iff entropy ≥ log2 l), and the below-lBar flag.
    *
    * Scale: one (QI, sensitive) hash-agg, one QI re-agg, one
    * broadcast join of the |classes|-row totals — the q165 posture
    * with one extra aggregate level; no windows, nothing
    * driver-side. Entropy follows the q198 convention (log2, 4 dp,
    * −0.0 folded). */
  def lDiversity(
      df: DataFrame, qiCols: Seq[String], sensitive: Column,
      lBar: Int = 3): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier")
    val qi = qiCols.map(col)
    val cls = df.groupBy(qi :+ sensitive.as("__sens"): _*)
      .agg(count(lit(1)).as("__c"))
    val tot = cls.groupBy(qi: _*).agg(sum("__c").as("__n"))
    cls.join(broadcast(tot), qiCols)
      .groupBy(qi: _*)
      .agg(first(col("__n")).as("n_rows"),
        count(lit(1)).as("l_distinct"),
        (round(-sum((col("__c").cast("double") / col("__n"))
          * log2(col("__c").cast("double") / col("__n"))), 4)
          + lit(0.0)).as("sens_entropy"))
      .select(qi ++ Seq(col("n_rows").cast("long").as("n_rows"),
        col("l_distinct").cast("long").as("l_distinct"),
        col("sens_entropy"),
        when(col("l_distinct") < lBar, 1L).otherwise(0L)
          .as("below_l")): _*)
      .orderBy(qi: _*)
  }

  /** q208 — the declared audit: q165's release (QI = c_nationkey,
    * c_mktsegment) with the account-balance band
    * floor(c_acctbal / 2000) as the sensitive attribute. */
  def q208(t: graft.Tables): DataFrame =
    lDiversity(t.customer, Seq("c_nationkey", "c_mktsegment"),
      floor(col("c_acctbal") / 2000.0).cast("long"))
}
