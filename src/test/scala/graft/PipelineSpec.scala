package graft

import java.nio.file.Files
import graft.cli.Main
import org.apache.spark.sql.functions._

/** End-to-end t1 smoke (SURVEY §5.2.4): fixture TSVs → parse →
  * featurize → train → score via the CLI driver, pinned seeds,
  * shape + reproducibility assertions. */
class PipelineSpec extends SparkSpec {

  lazy val dir: String = Files.createTempDirectory("graft-e2e").toString
  lazy val (slPath, pcPath, _) = Fixtures.write(dir)

  test("arg validation matrix") {
    assert(Main.parseArgs(Array()).isLeft)
    assert(Main.parseArgs(Array("--extract-features")).isLeft)
    assert(Main.parseArgs(
      Array("--parse-raw-data", "--raw-sitelinks", "x")).isLeft)
    assert(Main.parseArgs(Array(
      "--parse-raw-data", "--raw-sitelinks", "x", "--raw-pagecounts", "y")).isRight)
    assert(Main.parseArgs(Array(
      "--extract-features", "--parsed-data", "p")).isRight)
    assert(Main.parseArgs(Array("--bogus")).isLeft)
  }

  test("full pipeline: parse → features → models → scores") {
    val p = Main.Params(
      parse = true, extract = true, build = true, score = true,
      sitelinks = Some(slPath), pagecounts = Some(pcPath),
      outputDir = s"$dir/out1")
    val matrix = Main.run(spark, p)
    // schema: id + one double column per site that had missing items
    assert(matrix.columns.head == "id")
    assert(matrix.columns.length > 1)
    assert(matrix.count() > 0)
    // scores stay within the label range
    val scoreCols = matrix.columns.drop(1)
    val bad = scoreCols.map(c =>
      matrix.filter(col(c) < 0 || col(c) > 1).count()).sum
    assert(bad == 0)
    // artifacts on disk: parsed + feature parquet, models, predictions
    val base = new java.io.File(s"$dir/out1")
    val entries = base.listFiles().map(_.getName)
    assert(entries.exists(_.endsWith("_parsedData")))
    assert(entries.exists(_.endsWith("_featureData")))
    assert(entries.exists(_.endsWith("_models")))
    assert(entries.exists(_.endsWith("_predictions")))
  }

  test("--target-wikis restricts the score matrix columns") {
    val p = Main.Params(
      parse = true, extract = true, build = true, score = true,
      sitelinks = Some(slPath), pagecounts = Some(pcPath),
      targetSites = Seq("enwiki", "dewiki"),
      outputDir = s"$dir/out_t")
    val matrix = Main.run(spark, p)
    assert(matrix.columns.toSet.subsetOf(Set("id", "enwiki", "dewiki")))
    assert(matrix.columns.length <= 3)
  }

  test("pipeline is reproducible with pinned seeds") {
    def run(n: Int) = {
      val p = Main.Params(
        parse = true, extract = true, build = true, score = true,
        sitelinks = Some(slPath), pagecounts = Some(pcPath),
        outputDir = s"$dir/out_rep$n")
      Main.run(spark, p)
    }
    val a = run(1).collect().map(_.toString).sorted
    Thread.sleep(1100) // distinct timestamped layout dirs
    val b = run(2).collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }
}
