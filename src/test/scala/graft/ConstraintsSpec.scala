package graft

import graft.operators.Constraints
import graft.operators.Constraints.Check
import org.apache.spark.sql.catalyst.plans.logical.Aggregate
import org.apache.spark.sql.functions._

/** Deequ-style constraint audit (q159): metric math on crafted
  * violations, the one-scan-per-table plan contract, and the fixture
  * report's expected verdicts. */
class ConstraintsSpec extends SparkSpec {
  import spark.implicits._

  private val crafted = Seq(
    (1L, Some("a"), 10.0), (2L, Some("b"), -5.0),
    (3L, None, 20.0), (4L, Some("d"), 30.0),
    (4L, Some("e"), 40.0)) // duplicate id
    .toDF("id", "s", "v")

  test("fraction / uniqueness metrics measure crafted violations " +
    "and both verdict paths fire") {
    val got = Constraints.audit(crafted, Seq(
      Check("complete_s", Constraints.fraction(col("s").isNotNull),
        _ >= 1.0),
      Check("unique_id", Constraints.uniqueness(col("id")), _ >= 1.0),
      Check("nonneg_v", Constraints.fraction(col("v") >= 0), _ >= 1.0),
      Check("some_rows", count(lit(1)).cast("double"), _ >= 1.0)))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getBoolean(2))).toMap
    assert(got("complete_s") == ((0.8, false)))
    assert(got("unique_id") == ((0.8, false)))
    assert(got("nonneg_v") == ((0.8, false)))
    assert(got("some_rows") == ((5.0, true)))
  }

  test("audit evaluates every declared check in ONE aggregate pass " +
    "(the Deequ analyzer-batching contract)") {
    val df = Constraints.audit(crafted, Seq(
      Check("a", Constraints.fraction(col("v") > 0), _ >= 1.0),
      Check("b", Constraints.fraction(col("s").isNotNull), _ >= 1.0),
      Check("c", Constraints.uniqueness(col("id")), _ >= 1.0)))
    val aggs = df.queryExecution.optimizedPlan.collect {
      case a: Aggregate => a
    }
    // uniqueness adds the internal distinct-expand rewrite, but there
    // is exactly one aggregate SUBTREE over the input — no per-check
    // rescan (each scan would show as a separate leaf)
    val leaves = df.queryExecution.optimizedPlan.collectLeaves()
    assert(leaves.length == 1, leaves.mkString("\n"))
    assert(aggs.nonEmpty)
  }

  test("refFraction measures orphaned children") {
    val child = Seq((1L, "x"), (2L, "y"), (3L, "z"), (9L, "orphan"))
      .toDF("fk", "payload")
    val parent = Seq(1L, 2L, 3L, 4L).toDF("pk")
    val r = Constraints.refFraction(child, "fk", parent, "pk", "ref")
      .head()
    assert(r.getString(0) == "ref")
    assert(r.getDouble(1) == 0.75)
    assert(!r.getBoolean(2))
  }

  test("kAnonymity: crafted table with known equivalence classes; " +
    "histogram, percentages, and the k headline are exact") {
    // QI (age, zip): classes {(30,A):3, (30,B):1, (40,A):2} -> k=1
    val t = Seq(
      (30, "A"), (30, "A"), (30, "A"),
      (30, "B"),
      (40, "A"), (40, "A"))
      .toDF("age", "zip")
    val rows = Constraints.kAnonymity(t, Seq("age", "zip")).collect()
    val bysz = rows.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(bysz(1L) == ((1L, 1L, 16.6667)))
    assert(bysz(2L) == ((1L, 2L, 33.3333)))
    assert(bysz(3L) == ((1L, 3L, 50.0)))
    // the dataset's k = smallest class size = first row ordered by size
    assert(rows.map(_.getLong(0)).min == 1L)
    // percentages cover the whole table
    assert(math.abs(rows.map(_.getDouble(3)).sum - 100.0) < 0.001)
  }

  test("lDiversity: crafted classes — a homogeneous class flags " +
    "despite its size, a diverse one passes; entropy exact at 4 dp") {
    // QI zip: class A = 4 rows ALL sensitive value 1 (the homogeneity
    // attack k-anonymity misses: k=4 but l=1); class B = 4 rows over
    // 4 distinct values (l=4, entropy = log2 4 = 2); class C = 2+1
    // split (entropy = -(2/3 log2 2/3 + 1/3 log2 1/3) = 0.9183)
    val t = Seq(
      ("A", 1), ("A", 1), ("A", 1), ("A", 1),
      ("B", 1), ("B", 2), ("B", 3), ("B", 4),
      ("C", 1), ("C", 1), ("C", 2))
      .toDF("zip", "sens")
    val rows = Constraints.lDiversity(t, Seq("zip"), col("sens"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4))).toMap
    assert(rows("A") == ((4L, 1L, 0.0, 1L)))
    assert(rows("B") == ((4L, 4L, 2.0, 0L)))
    assert(rows("C") == ((3L, 2L, 0.9183, 1L)))
    // fixture q208: every class's l is at least 1, entropy bounds its
    // log2(l), and flags agree with l_distinct < 3
    Constraints.q208(tables).collect().foreach { r =>
      val (l, e, f) = (r.getAs[Long]("l_distinct"),
        r.getAs[Double]("sens_entropy"), r.getAs[Long]("below_l"))
      assert(l >= 1L)
      assert(e <= math.log(l.toDouble) / math.log(2.0) + 5e-5,
        s"entropy $e exceeds log2($l) beyond 4-dp rounding slack")
      assert(f == (if (l < 3) 1L else 0L))
    }
  }

  test("q159 on the fixture: nine rows; the discount bound AND the " +
    "line-number uniqueness fail (a genuine fixture finding — " +
    "(l_orderkey, l_linenumber) collides in ~24% of rows); the rest " +
    "pass at exactly 1.0") {
    val rows = Constraints.q159(tables).collect()
    assert(rows.length == 9)
    val byName = rows.map(r => r.getString(0) ->
      (r.getDouble(1), r.getBoolean(2))).toMap
    val failing =
      Set("bound_l_discount_le_005", "uniqueness_l_orderkey_linenumber")
    failing.foreach { n =>
      assert(!byName(n)._2 && byName(n)._1 < 1.0,
        s"$n: ${byName(n)}")
    }
    (byName.keySet -- failing).foreach { n =>
      val (m, p) = byName(n)
      assert(p && m == 1.0, s"$n: metric=$m passed=$p")
    }
  }
}
