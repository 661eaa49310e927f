package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling harness (not part of the driver contract): run one
  * query with a listener that aggregates Spark job/stage counts and
  * durations, so per-gate fixed costs (job count x scheduling) are
  * visible without the UI. `SPARK_GRAFT_ONLY` selects the keys.
  */
object Prof {
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

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var jobMs = 0L
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val bySite = new java.util.concurrent.ConcurrentHashMap[String, (Int, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        // Prefer the job's captured callSite (survives executeTake's
        // thread hop); fall back to the last stage's graft frame.
        val cs = Option(j.properties)
          .flatMap(p => Option(p.getProperty("callSite.long")))
          .flatMap(_.linesIterator
            .find(l => l.contains("graft.") && !l.contains("Prof")))
          .map(_.trim.take(80))
        val site = cs.orElse(j.stageInfos.lastOption.map { si =>
          val n = si.name
          val d = si.details.linesIterator.toSeq
            .find(l => l.contains("graft.") && !l.contains("Prof"))
            .getOrElse("").trim.take(80)
          s"$n | $d"
        }).getOrElse("?")
        starts.put(j.jobId, (System.nanoTime(), site)); jobs += 1
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val t0 = starts.remove(j.jobId)
        if (t0 != null) {
          val ms = (System.nanoTime() - t0._1) / 1000000L
          jobMs += ms
          bySite.merge(t0._2, (1, ms),
            (a, b) => (a._1 + b._1, a._2 + b._2))
        }
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1; tasks += s.stageInfo.numTasks
      }
      // SQL executions carry the ORIGINAL action call site even when
      // the job itself runs on an executeTake future thread — the only
      // reliable attribution for head()/collect() probes.
      override def onOtherEvent(e: org.apache.spark.scheduler.SparkListenerEvent): Unit =
        e match {
          case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
            bySite.merge("sql: " + s.description.linesIterator.next().take(70),
              (1, 0L), (a, b) => (a._1 + b._1, a._2 + b._2))
          case _ => ()
        }
    })

    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.exists(n.startsWith)))
    // warmup pass
    names.foreach { n =>
      SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    names.foreach { n =>
      jobs = 0; stages = 0; tasks = 0; jobMs = 0; bySite.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      Thread.sleep(150) // let the listener bus drain
      val wallMs = (System.nanoTime() - t0) / 1000000L
      println(f"[prof] $n%-28s wall=${wallMs}%6d ms jobs=$jobs%4d " +
        f"stages=$stages%4d tasks=$tasks%6d jobMs=$jobMs%6d")
      if (sys.env.contains("GRAFT_PROF_SITES")) {
        import scala.jdk.CollectionConverters._
        bySite.asScala.toSeq.sortBy(s => (-s._2._2, -s._2._1)).take(40).foreach {
          case (site, (n2, ms)) =>
            println(f"[site]   $site%-46s n=$n2%3d ms=$ms%6d")
        }
      }
    }
    spark.stop()
  }
}
