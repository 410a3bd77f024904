package graft

import graft.plans.PlanAudit
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Plan-audit gate (SURVEY §4.3), wired into `sbt test` so a new query
  * cannot land with a single-task scale hazard unnoticed (previously
  * `AuditAll` was a manual main). AQE is disabled for the audit so the
  * STATIC physical plan is complete and no query needs executing —
  * auditing all ~155 declared queries stays cheap.
  */
class PlanAuditSpec extends SparkSpec {
  import spark.implicits._

  test("negative: an unpartitioned window is caught") {
    val df = tables.events
      .withColumn("rn", row_number().over(Window.orderBy("ts")))
    val hz = PlanAudit.singleTaskHazards(df)
    assert(hz.exists(_.kind == "unpartitioned-window"), hz.toString)
    intercept[IllegalStateException](PlanAudit.assertScalable(df))
  }

  test("negative: an explicit single-partition shuffle is caught") {
    val df = tables.events.repartition(1).select(sum("value"))
    val hz = PlanAudit.singleTaskHazards(df)
    assert(hz.exists(_.kind == "single-partition-shuffle"), hz.toString)
  }

  test("a keyed window + scalar agg plan is hazard-free (no false hit " +
    "on the benign ENSURE_REQUIREMENTS final exchange)") {
    val df = tables.events
      .withColumn("rn",
        row_number().over(Window.partitionBy("user_id").orderBy("ts")))
      .select(sum("rn"))
    assert(PlanAudit.singleTaskHazards(df).isEmpty)
  }

  test("a rank window over a top-k frame is exempt (bounded by limit)") {
    val df = tables.documents.orderBy(col("n_chars").desc).limit(20)
      .withColumn("rk", row_number().over(Window.orderBy(col("n_chars").desc)))
    assert(PlanAudit.singleTaskHazards(df).isEmpty,
      df.queryExecution.executedPlan.toString)
  }

  // Audited exemptions, each justified by a RUNTIME bound the static
  // plan cannot show. Adding a query here requires naming the guard.
  private val allowlisted = Map(
    // rangeCountByDay: global rolling window over the #days-sized
    // histogram, guarded by `require(histRows <= maxHistRows)` at
    // RangeJoin.rangeCountByDay — the operator REFUSES unbounded keys.
    "q41_range_join" -> "histogram window, require(histRows<=100k) guard")

  test("every declared query plans without single-task scale hazards") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val bad = SparkEntry.queries.toSeq.sortBy(_._1)
        .filterNot { case (name, _) => allowlisted.contains(name) }
        .flatMap { case (name, fn) =>
          val hz = PlanAudit.singleTaskHazards(fn(spark, sfDir))
          if (hz.isEmpty) None
          else Some(s"$name: ${hz.map(f => s"[${f.kind}] ${f.node}").mkString("; ")}")
        }
      assert(bad.isEmpty, "single-task hazards:\n" + bad.mkString("\n"))
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }
}
