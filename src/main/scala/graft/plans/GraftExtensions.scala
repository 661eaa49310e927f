package graft.plans

import org.apache.spark.sql.SparkSessionExtensions

/** Engine extension point: registers graft's native Catalyst functions
  * so they are usable from SQL as well as the Column API.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    graft.functions.VectorFunctions.registrations.foreach {
      case (ident, (info, builder)) =>
        ext.injectFunction((ident, info, builder))
    }
    ext.injectResolutionRule(_ => ApproxDistinctRule)
    ext.injectResolutionRule(_ => ApproxPercentileRule)
    // SQL MERGE/DELETE over registered GraftLake tables route to the
    // lake's transactional merge/delete (LakeSql.register opts in).
    ext.injectResolutionRule(_ => graft.sources.LakeDmlRule)
    // ALTER TABLE ... RENAME COLUMN must be intercepted at the PARSER
    // (plan substitution before analysis): the analyzer's
    // ResolveRelations rejects views for ALTER TABLE before any
    // injected resolution rule can see the plan, whereas MERGE/DELETE
    // resolution is deferred long enough for LakeDmlRule to win.
    ext.injectParser((_, delegate) => new graft.sources.LakeDdlParser(delegate))
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
  }
}
