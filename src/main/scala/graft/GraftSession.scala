package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL-surface entry point: registers the star schema as temp views so
  * the whole engine is usable from raw Spark SQL (the reference's
  * users are SQL-first; every DataFrame operator here has a SQL twin).
  */
object GraftSession {

  val TableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  private val loaders: Map[String, (SparkSession, String) => DataFrame] = Map(
    "region" -> Tables.region _,
    "nation" -> Tables.nation _,
    "customer" -> Tables.customer _,
    "supplier" -> Tables.supplier _,
    "part" -> Tables.part _,
    "orders" -> Tables.orders _,
    "lineitem" -> Tables.lineitem _,
    "events" -> Tables.events _,
    "documents" -> Tables.documents _,
    "embeddings" -> Tables.embeddings _)

  /** Register every table under its canonical name. */
  def registerTables(spark: SparkSession, dir: String): Unit = synchronized {
    TableNames.foreach(n => loaders(n)(spark, dir).createOrReplaceTempView(n))
    registered = Some((spark, dir))
  }

  // Last (session, dir) registered — avoids re-reading 10 parquet
  // schemas on every sql() call.
  @volatile private var registered: Option[(SparkSession, String)] = None

  /** Run a SQL query against the registered star schema. */
  def sql(spark: SparkSession, dir: String, query: String): DataFrame = {
    if (!registered.contains((spark, dir))) registerTables(spark, dir)
    spark.sql(query)
  }

  /** Register a GraftLake table (latest snapshot, or a time-travel
    * version) as a temp view — the lake's SQL surface. The view holds
    * the snapshot AS OF registration: refresh by re-registering.
    */
  def registerLake(
      spark: SparkSession, path: String, viewName: String,
      version: Option[Int] = None): Unit = {
    val df = version match {
      case Some(v) => graft.sources.GraftLake.readAt(spark, path, v)
      case None => graft.sources.GraftLake.read(spark, path)
    }
    df.createOrReplaceTempView(viewName)
  }
}
