package graft

import org.apache.spark.sql.SparkSession

/** SparkSession factory with the engine's standard tuning.
  *
  * Scale notes (100 TB design): AQE on for runtime shuffle-partition
  * coalescing + skew-join splitting; shuffle partitions sized to the
  * local core count here (would be ~2-3x total cluster cores in
  * production); UTC session tz for oracle parity.
  */
object Engine {
  def session(
      master: String = "local[32]",
      appName: String = "graft",
      shufflePartitions: Int = 32,
      extraConfs: Map[String, String] = Map.empty): SparkSession = {
    val builder = SparkSession
      .builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      // events.parquet carries TIMESTAMP(NANOS); reading nanos as long
      // is an engine-wide default set at construction (a mid-query
      // spark.conf.set would surprise concurrent readers).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // extraConfs LAST so callers can override any default above.
    extraConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
