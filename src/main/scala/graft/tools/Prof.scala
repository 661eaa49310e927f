package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-job profiler for single gate queries: runs each named query
  * (SPARK_GRAFT_ONLY prefix match) once warm, once timed, and prints
  * every Spark job's wall time, task-time sum, and call site — so a
  * slow key can be attributed to a specific action instead of guessed
  * at. Measurement tooling only; not part of the query surface.
  */
object Prof {
  private case class JobRow(
      id: Int, wallMs: Long, taskMs: Long, tasks: Int, desc: String)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = scala.collection.concurrent.TrieMap[Int, JobRow]()
    val stageTask = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Int)]()
    val stageToJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val d = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(e.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("")
        jobs.put(e.jobId, (System.nanoTime(), d))
        e.stageIds.foreach(s => stageToJob.put(s, e.jobId))
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val s = e.stageInfo
        val cur = stageTask.getOrDefault(s.stageId, (0L, 0))
        stageTask.put(s.stageId,
          (cur._1 + s.taskMetrics.executorRunTime, cur._2 + s.numTasks))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        Option(jobs.get(e.jobId)).foreach { case (t0, d) =>
          import scala.jdk.CollectionConverters._
          val stages = stageToJob.asScala.filter(_._2 == e.jobId).keys
          val (tms, nt) = stages.map(s =>
            stageTask.getOrDefault(s, (0L, 0))).foldLeft((0L, 0)) {
            case ((a, b), (c, d0)) => (a + c, b + d0)
          }
          done.put(e.jobId,
            JobRow(e.jobId, (System.nanoTime() - t0) / 1000000L, tms, nt, d))
        }
      }
    })

    val only = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_ONLY"))
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty)
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.isEmpty || only.exists(n.startsWith))

    names.foreach { name =>
      def run(): Double = {
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val warm = run() // warmup: JIT + codegen + footer caches
      done.clear()
      val t = Seq(run(), run(), run()).min // min-of-3 warm legs
      println(f"\n=== $name warm=$warm%.2fs timed=$t%.2fs jobs=${done.size}")
      val rows = done.values.toSeq.sortBy(-_.wallMs)
      val totWall = rows.map(_.wallMs).sum
      println(f"    sum(job wall)=${totWall / 1000.0}%.2fs  (gaps = driver-side work)")
      rows.take(30).foreach { r =>
        println(f"    job ${r.id}%4d wall=${r.wallMs}%6dms task=${r.taskMs}%7dms n=${r.tasks}%4d  ${r.desc.take(110)}")
      }
    }
    spark.stop()
  }
}
