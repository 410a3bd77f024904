package graft
object AuditAll {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.001"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (n, fn) =>
      try {
        val df = fn(spark, sfDir)
        df.collect()
        val hz = graft.plans.PlanAudit.singleTaskHazards(df)
        if (hz.nonEmpty) println(s"HAZARD $n: ${hz.mkString("; ")}")
      } catch { case e: Throwable =>
        println(s"ERR $n: ${e.getMessage.take(80)}") }
    }
    println("audit done")
    spark.stop()
  }
}
