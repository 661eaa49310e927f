package graft.tools

import graft.{Engine, SparkEntry}

/** Dev tool: dump formatted physical plans for every SparkEntry query
  * (driven by the plan-audit pass; see PLANS.md for conclusions).
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = Engine.session("local[8]", "graft-explain", 8)
    names.foreach { name =>
      println(s"\n##### $name #####")
      SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
