package graft

import graft.operators.Sketches
import org.apache.spark.sql.functions._

/** HLL sketch operators: estimate quality vs exact distinct counts,
  * merge exactness, and parquet round-trip of sketch state (the
  * materialized-sketch-table pattern). */
class SketchSpec extends SparkSpec {

  private lazy val events = tables.events

  test("q78 merged estimate within 5% of exact distinct users per key") {
    val exact = events.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("d")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    Sketches.q78(tables).collect().foreach { r =>
      val (key, merged) = (r.getString(0), r.getLong(3))
      val d = exact(key)
      assert(math.abs(merged - d).toDouble / d < 0.05,
        s"$key merged=$merged exact=$d")
      // per-day estimates double-count repeat visitors: sum >= merged
      assert(r.getLong(2) >= merged, s"$key sum_daily < merged")
    }
  }

  test("union of daily sketches equals the single global sketch") {
    val viaDays = Sketches.dailyUserSketches(events)
      .groupBy("event_type")
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"), lit(false)))
        .as("est"))
    val global = events.groupBy("event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(12)))
        .as("est"))
    val joined = viaDays.join(global, "event_type")
      .collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getLong(1) == r.getLong(2),
        s"${r.getString(0)}: day-merged ${r.getLong(1)} != global ${r.getLong(2)}")
    }
  }

  test("sketches survive a parquet round-trip and still merge") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_sketch").toString
    Sketches.dailyUserSketches(events).write
      .mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
      .groupBy("event_type")
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"), lit(false)))
        .as("est"))
    val direct = Sketches.q78(tables)
      .select(col("event_type"), col("merged_users"))
    val mismatch = back.join(direct, "event_type")
      .filter(col("est") =!= col("merged_users")).count()
    assert(mismatch == 0)
  }

  test("q104 histogram-sketch quantiles are within one bin width") {
    val approx = Sketches.q104(tables).collect()
      .map(r => r.getString(0) ->
        (r.getDouble(2), r.getDouble(3))).toMap
    val exact = tables.events.filter(col("value").isNotNull)
      .groupBy("event_type")
      .agg(expr("percentile(value, 0.5)").as("p50"),
        expr("percentile(value, 0.9)").as("p90"),
        ((max("value") - min("value")) / 32).as("w"))
      .collect()
    exact.foreach { r =>
      val (a50, a90) = approx(r.getString(0))
      val w = r.getDouble(3)
      assert(math.abs(a50 - r.getDouble(1)) <= w + 1e-9,
        s"${r.getString(0)} p50")
      assert(math.abs(a90 - r.getDouble(2)) <= w + 1e-9,
        s"${r.getString(0)} p90")
    }
  }

  test("histogram sketches merge associatively (day rollup == direct)") {
    // merging the per-day sketch table must equal histogramming the
    // raw values directly — the mergeability property that lets
    // incremental days append without rescanning history
    val viaDays = Sketches.dailyValueHistograms(events)
      .groupBy("event_type", "bin").agg(sum("cnt").as("cnt"))
    val direct = Sketches
      .dailyValueHistograms(events.withColumn("ts",
        lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))))
      .groupBy("event_type", "bin").agg(sum("cnt").as("cnt"))
    assert(viaDays.exceptAll(direct).count() == 0 &&
      direct.exceptAll(viaDays).count() == 0)
  }

  test("count-min sketch: estimates are exact over-estimates within " +
    "the eps*N bound, distributed == local reference, merge is the " +
    "sum of halves") {
    import graft.functions.CountMinSketch
    val (depth, width) = (5, 1024)
    val toks = tables.documents
      .select(explode(split(col("text"), " ")).as("tok"))
    val truth = toks.groupBy("tok").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = truth.values.sum
    val sketch = toks.agg(CountMinSketch
      .cms_sketch(col("tok"), depth, width).as("s"))
      .head().getAs[scala.collection.Seq[Long]]("s").toArray
    // the CMS guarantee: never under, over by at most ~eps*N (checked
    // with slack 2x the expectation bound — deterministic fixture)
    val eps = math.E / width
    truth.foreach { case (tok, c) =>
      val est = CountMinSketch.estimate(sketch, depth, width, tok)
      assert(est >= c, s"$tok underestimated: $est < $c")
      assert(est <= c + (2 * eps * n).toLong + 1,
        s"$tok overestimated: $est vs $c (N=$n)")
    }
    // distributed aggregation == single-threaded reference
    val agg = new CountMinSketch(depth, width)
    val local = tables.documents.collect()
      .flatMap(_.getAs[String]("text").split(" "))
      .foldLeft(agg.zero)(agg.reduce)
    assert(sketch.toSeq == local.toSeq)
    // mergeability: sum of the halves' sketches == whole
    val half1 = toks.limit(1000).collect().map(_.getString(0))
      .foldLeft(agg.zero)(agg.reduce)
    val rest = toks.collect().map(_.getString(0)).drop(1000)
      .foldLeft(agg.zero)(agg.reduce)
    assert(agg.merge(half1, rest).toSeq == local.toSeq)
  }

  test("MisraGries + count-min compose: MG candidates, CMS counts, " +
    "top token agrees with the exact table") {
    import graft.functions.{CountMinSketch, MisraGries}
    val (depth, width) = (5, 2048)
    val toks = tables.documents
      .select(explode(split(col("text"), " ")).as("tok"))
    val row = toks.agg(
      MisraGries.mg_candidates(col("tok"), 16).as("cand"),
      CountMinSketch.cms_sketch(col("tok"), depth, width).as("s"))
      .head()
    val cand = row.getAs[scala.collection.Seq[String]]("cand")
    val sketch = row.getAs[scala.collection.Seq[Long]]("s").toArray
    assert(cand.nonEmpty)
    val estTop = cand
      .map(t => t -> CountMinSketch.estimate(sketch, depth, width, t))
      .maxBy { case (t, e) => (e, t) }._1
    // CMS ranks by (over-)estimate, so near-ties can swap; the
    // guarantee to hold is that the sketch-chosen top's TRUE count is
    // within the eps*N additive bound of the true maximum
    val truth = toks.groupBy("tok").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = truth.values.sum
    val bound = (2 * math.E / width * n).toLong + 1
    assert(truth(estTop) >= truth.values.max - bound,
      s"$estTop true=${truth(estTop)} vs max=${truth.values.max}")
  }
}
