package graft

import org.apache.spark.sql.SparkSession

/** Engine session bootstrap: the configuration posture every graft
  * deployment wants, in one place.
  *
  *  - AQE on with partition coalescing and skew-join splitting — the
  *    runtime re-plan layer every shuffle relies on at scale;
  *  - shuffle partitions sized to the environment (not the 200
  *    default);
  *  - UTC session timezone (oracle parity and sane timestamps);
  *  - FAIR scheduling so the per-site ML fan-out's concurrent jobs
  *    share executors instead of convoying (reference used FIFO with 8
  *    driver threads, JobRunner.scala:15,51-54);
  *  - the engine's SQL functions registered via GraftExtensions.
  */
object Sessions {

  def builder(
      appName: String = "graft",
      master: Option[String] = None,
      shufflePartitions: Int =
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt): SparkSession.Builder = {
    val b = SparkSession.builder()
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
    master.fold(b)(b.master)
  }

  def local(appName: String = "graft", cores: String = "*"): SparkSession = {
    val spark = builder(appName, Some(s"local[$cores]")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
