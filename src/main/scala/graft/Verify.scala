package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // optional substring filter for focused local iteration; the driver
    // sets no filter and always dumps the full set
    val filter = sys.env.get("SPARK_GRAFT_VERIFY_FILTER")
    // Failed queries must stay VISIBLE: round 6's correctness artifact
    // silently dropped three erroring queries (152 entries where round 5
    // had 155) and the absence was only caught by a cross-round diff.
    // Record every failure in errors.json and leave an empty marker dir
    // so the driver reports an err row instead of omitting the query.
    val failures = scala.collection.mutable.ListBuffer.empty[(String, String)]
    SparkEntry.queries
      .filter { case (n, _) =>
        filter.forall(f => f.split(',').exists(n.contains)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        // nextOption guards an EMPTY (non-null) message — .next()
        // would throw from inside the handler, abort the loop, and
        // silently drop every remaining query from the artifact
        val msg = Option(e.getMessage).filter(_.nonEmpty)
          .getOrElse(e.getClass.getName)
        System.err.println(s"[verify] $name FAILED: ${msg.take(300)}")
        val firstLine = msg.linesIterator.find(_.trim.nonEmpty)
          .getOrElse(msg).take(200)
        // the marker dir must be EMPTY: a mid-write failure leaves
        // _temporary debris, and a rerun over a previous success would
        // otherwise serve STALE parquet as current results. If the
        // cleanup itself fails, say so LOUDLY in the recorded error —
        // stale-served-as-current must never be invisible.
        val dir = new java.io.File(s"$outDir/$name")
        def rmrf(f: java.io.File): Boolean = {
          val childrenOk =
            if (f.isDirectory)
              Option(f.listFiles()).getOrElse(Array.empty)
                .forall(rmrf)
            else true
          childrenOk && (f.delete() || !f.exists())
        }
        val cleaned = rmrf(dir)
        dir.mkdirs()
        val residue = Option(dir.listFiles()).getOrElse(Array.empty)
        failures += name -> (
          if (cleaned && residue.isEmpty) firstLine
          else s"[STALE-DIR: marker dir could not be emptied — " +
            s"results under $name may be stale] " + firstLine)
        if (!cleaned || residue.nonEmpty)
          System.err.println(
            s"[verify] $name marker dir NOT emptied — stale risk")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val errJson = failures
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/errors.json"), errJson)
    if (failures.nonEmpty) {
      System.err.println(
        s"[verify] ${failures.size} queries FAILED: " +
          failures.map(_._1).mkString(", "))
    }
    spark.stop()
  }
}
