package graft.sources

import org.apache.spark.sql.{GraftSqlBridge, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{EqualTo, Expression}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction, DeleteFromTable, InsertAction, InsertStarAction, LogicalPlan, MergeAction, MergeIntoTable, SubqueryAlias, UpdateAction, UpdateStarAction, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions.expr

/** SQL DML/DDL surface for GraftLake: `spark.sql("MERGE INTO lake
  * ...")`, `DELETE FROM lake WHERE ...`, `UPDATE lake SET ... WHERE
  * ...`, `ALTER TABLE lake RENAME COLUMN a TO b`, and time-travel
  * reads (`SELECT ... FROM lake VERSION AS OF n / TIMESTAMP AS OF
  * ts`) plus `RESTORE TABLE lake TO VERSION AS OF n` route to
  * [[GraftLake.merge]] / [[GraftLake.delete]] /
  * [[GraftLake.update]] / [[GraftLake.renameColumn]] /
  * [[GraftLake.readAt]] / [[GraftLake.readAsOf]] — the warehouse
  * surface is SQL-complete, not Scala-only.
  *
  * Spark-first mechanics: the parser already produces
  * `MergeIntoTable` / `DeleteFromTable` logical plans for ANY target;
  * for a temp view they would die in the analyzer ("only supported
  * with v2 tables"). [[LakeDmlRule]] — injected through
  * `GraftExtensions` as a resolution rule — intercepts those plans
  * while the target is still a registered lake name and rewrites them
  * to runnable commands that execute the lake's own transactional
  * merge/delete (claim/publish loop, zone-map pruned rewrites, CHECK
  * constraints, conflict detection all included). This is exactly the
  * Delta/Iceberg shape: SQL DML is a thin resolution step onto the
  * table format's transaction primitive, never a second write path.
  */
object LakeSql {

  /** One registered DML-capable lake table. `statsCol` is the
    * merge's zone-map pruning column (must be functionally dependent
    * on the merge keys — see [[GraftLake.merge]]'s contract).
    */
  final case class DmlTable(path: String, statsCol: String)

  // name (lowercased) -> table; tiny, session-global, write-rare.
  private val tables = new java.util.concurrent.ConcurrentHashMap[String, DmlTable]

  /** Register `name` for BOTH reads (temp view over the latest
    * snapshot) and SQL DML (MERGE/DELETE route to the lake). Reads
    * see the snapshot AS OF registration (re-register to refresh —
    * same contract as [[graft.GraftSession.registerLake]]); DML
    * always executes against the CURRENT table state, exactly like a
    * catalog table would.
    */
  def register(
      spark: SparkSession, path: String, name: String, statsCol: String): Unit = {
    tables.put(name.toLowerCase(java.util.Locale.ROOT), DmlTable(path, statsCol))
    GraftLake.read(spark, path).createOrReplaceTempView(name)
  }

  def unregister(name: String): Unit =
    tables.remove(name.toLowerCase(java.util.Locale.ROOT))

  // ----- BEGIN/COMMIT/ROLLBACK TRANSACTION (SQL surface of the
  // provisional-commit machinery, see [[GraftLake.sqlTxnBegin]]):
  // between BEGIN TRANSACTION and COMMIT, INSERT / DELETE / UPDATE /
  // MERGE statements execute EAGERLY as PROVISIONAL commits carrying
  // one shared token — invisible to every other reader until COMMIT
  // flips the single decision marker, visible to this thread's own
  // later statements (read-your-writes — for statements resolving
  // the TABLE; a SELECT through a registered lake temp view reads
  // the pre-transaction snapshot, since views re-register only at
  // COMMIT to keep pending rows out of the session-global view).
  // ROLLBACK publishes the
  // abort decision and reclaims the invisible staged sets. The
  // transaction is THREAD-scoped (Spark executes SQL commands
  // eagerly on the calling thread): concurrent sessions/threads
  // running their own statements can never be captured by someone
  // else's open transaction.
  private[sources] def txnOpen: Boolean = GraftLake.sqlTxnOpen

  /** Statements that can neither stage transactionally nor be rolled
    * back (TRUNCATE / RESTORE / CONVERT) refuse LOUDLY inside an open
    * SQL transaction instead of silently running non-transactionally.
    */
  private[sources] def refuseInTxn(stmt: String): Unit =
    require(!txnOpen,
      s"$stmt inside BEGIN TRANSACTION: this statement cannot be " +
        "staged transactionally or rolled back — COMMIT or ROLLBACK " +
        "first")

  private[sources] def txnBegin(): Unit = GraftLake.sqlTxnBegin()

  private[sources] def txnRollback(): Unit = GraftLake.sqlTxnRollback()

  private[sources] def txnCommit(spark: SparkSession): Unit =
    GraftLake.sqlTxnCommit(spark)

  private[sources] def lookup(name: String): Option[DmlTable] =
    Option(tables.get(name.toLowerCase(java.util.Locale.ROOT)))

  /** The lake-table name a DML target plan refers to, if any: matches
    * the pre-resolution `UnresolvedRelation` AND the post-resolution
    * temp-view shape (`SubqueryAlias(name, ...)`), so the rule wins
    * regardless of whether the view resolved first in the fixed-point
    * batch.
    */
  private[sources] def targetName(plan: LogicalPlan): Option[String] =
    plan match {
      case u: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation =>
        Some(u.multipartIdentifier.mkString(".")).filter(lookup(_).isDefined)
      // ALTER TABLE targets parse as UnresolvedTable, not
      // UnresolvedRelation.
      case u: org.apache.spark.sql.catalyst.analysis.UnresolvedTable =>
        Some(u.multipartIdentifier.mkString(".")).filter(lookup(_).isDefined)
      // A user alias over the registered name (`MERGE INTO t AS x`)
      // wraps it in another SubqueryAlias — recurse to the relation.
      case SubqueryAlias(ident, child) =>
        Some(ident.name).filter(lookup(_).isDefined)
          .orElse(targetName(child))
      case _ => None
    }

  /** Bare-name leaf of an attribute expression, resolved or not. */
  private[sources] def leafName(e: Expression): Option[String] = e match {
    case a: UnresolvedAttribute => Some(a.nameParts.last)
    case a: org.apache.spark.sql.catalyst.expressions.AttributeReference => Some(a.name)
    case _ => None
  }

  /** Strip `table.`/alias qualifiers (and resolution) from a DML
    * condition so its SQL text re-parses against the bare lake read —
    * the command executes on a fresh snapshot, not the analyzed view.
    */
  private[sources] def bareCondition(cond: Expression): String =
    cond.transform {
      case a: UnresolvedAttribute if a.nameParts.length > 1 =>
        UnresolvedAttribute(Seq(a.nameParts.last))
      case ar: org.apache.spark.sql.catalyst.expressions.AttributeReference =>
        UnresolvedAttribute(Seq(ar.name))
    }.sql

  /** Is this action the canonical "UPDATE SET *" — either still the
    * star form, or the analyzer's expansion of it (identity
    * assignments `t.c = s.c` covering columns 1:1)? Partial or
    * computed assignments are NOT star: the lake merge replaces the
    * whole matched row with the source row, so executing them as a
    * full replace would be wrong — reject instead.
    */
  private[sources] def isStarUpdate(a: MergeAction): Boolean = a match {
    case UpdateStarAction(None) => true
    case u: UpdateAction =>
      u.condition.isEmpty && u.assignments.nonEmpty &&
        u.assignments.forall { as =>
          (leafName(as.key), leafName(as.value)) match {
            case (Some(k), Some(v)) => k.equalsIgnoreCase(v)
            case _ => false
          }
        }
    case _ => false
  }

  private[sources] def isStarInsert(a: MergeAction): Boolean = a match {
    case InsertStarAction(None) => true
    case i: InsertAction =>
      i.condition.isEmpty && i.assignments.nonEmpty &&
        i.assignments.forall { as =>
          (leafName(as.key), leafName(as.value)) match {
            case (Some(k), Some(v)) => k.equalsIgnoreCase(v)
            case _ => false
          }
        }
    case _ => false
  }

  /** Key columns of a canonical merge condition: a conjunction of
    * `target.k = source.k` equalities over the SAME column name.
    * Anything else (inequalities, expressions, cross-named equality)
    * is rejected loudly — those shapes have no sound mapping onto the
    * lake's key-equality merge.
    */
  private[sources] def mergeKeys(cond: Expression): Seq[String] = {
    def split(e: Expression): Seq[Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) => split(l) ++ split(r)
      case other => Seq(other)
    }
    split(cond).map {
      case EqualTo(l, r) =>
        (leafName(l), leafName(r)) match {
          case (Some(a), Some(b)) if a.equalsIgnoreCase(b) => a
          case _ => throw new IllegalArgumentException(
            s"MERGE INTO <graft lake>: unsupported ON clause term " +
              s"'${EqualTo(l, r).sql}' — use target.k = source.k equalities")
        }
      case other => throw new IllegalArgumentException(
        s"MERGE INTO <graft lake>: unsupported ON clause term " +
          s"'${other.sql}' — use AND-ed key equalities")
    }
  }

  /** Every name a plan subtree can be referred to by in a qualified
    * attribute: its aliases and relation names, lowercased.
    */
  private def planNames(p: LogicalPlan): Set[String] = p.collect {
    case SubqueryAlias(ident, _) => ident.name.toLowerCase(java.util.Locale.ROOT)
    case u: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation =>
      u.multipartIdentifier.last.toLowerCase(java.util.Locale.ROOT)
  }.toSet

  /** Rewrite a MERGE clause expression's attribute qualifiers onto
    * the execution frame's canonical `t` (target) / `s` (source)
    * aliases, returning re-parseable SQL text. Side attribution:
    * resolved attributes by exprId membership in the (possibly
    * already-resolved) source/target plans, else by qualifier name;
    * unqualified names stay bare (ambiguity then fails at execution,
    * exactly as it would in a join).
    */
  private[sources] def reQualify(
      e: Expression, m: MergeIntoTable, registeredName: String): String = {
    val tNames = planNames(m.targetTable) +
      registeredName.toLowerCase(java.util.Locale.ROOT)
    val sNames = planNames(m.sourceTable)
    val tIds: Set[org.apache.spark.sql.catalyst.expressions.ExprId] =
      if (m.targetTable.resolved) m.targetTable.outputSet.map(_.exprId).toSet
      else Set.empty
    val sIds: Set[org.apache.spark.sql.catalyst.expressions.ExprId] =
      if (m.sourceTable.resolved) m.sourceTable.outputSet.map(_.exprId).toSet
      else Set.empty
    e.transform {
      case a: UnresolvedAttribute if a.nameParts.length > 1 =>
        val q = a.nameParts.init.last.toLowerCase(java.util.Locale.ROOT)
        // Only a recognized alias/relation qualifier directly above a
        // column is rewritable. A longer path (t.addr.city — nested
        // struct fields) or an unknown qualifier must fail LOUDLY:
        // stripping it to the bare leaf could silently reattach the
        // reference to the wrong side.
        if (tNames(q) && a.nameParts.length == 2)
          UnresolvedAttribute(Seq("t", a.nameParts.last))
        else if (sNames(q) && a.nameParts.length == 2)
          UnresolvedAttribute(Seq("s", a.nameParts.last))
        else throw new IllegalArgumentException(
          s"MERGE INTO <graft lake>: unsupported attribute " +
            s"'${a.nameParts.mkString(".")}' — only <alias>.<column> " +
            s"references to the target/source are supported " +
            s"(known aliases: ${(tNames ++ sNames).toSeq.sorted.mkString(", ")})")
      case ar: org.apache.spark.sql.catalyst.expressions.AttributeReference =>
        val side =
          if (sIds(ar.exprId)) Some("s")
          else if (tIds(ar.exprId)) Some("t")
          else ar.qualifier.lastOption
            .map(_.toLowerCase(java.util.Locale.ROOT)) match {
              case Some(q) if sNames(q) => Some("s")
              case Some(q) if tNames(q) => Some("t")
              case _ => None
            }
        UnresolvedAttribute(side.toSeq :+ ar.name)
    }.sql
  }

  /** Compile the parsed MERGE action lists into the lake's
    * [[GraftLake.MergeClause]] form (conditions/values re-qualified
    * onto `t`/`s`; star actions become empty assignment lists).
    */
  private[sources] def compileMergeClauses(
      m: MergeIntoTable, registeredName: String): Seq[GraftLake.MergeClause] = {
    def assigns(as: Seq[Assignment]): Seq[(String, String)] = as.map { a =>
      val k = leafName(a.key).getOrElse(throw new IllegalArgumentException(
        s"MERGE INTO <graft lake>: unsupported assignment target " +
          s"'${a.key.sql}' — assign to a top-level column"))
      k -> reQualify(a.value, m, registeredName)
    }
    def cond(c: Option[Expression]): Option[String] =
      c.map(reQualify(_, m, registeredName))
    val matched = m.matchedActions.map {
      case UpdateStarAction(c) =>
        GraftLake.MergeClause("matched", "update", cond(c))
      case u: UpdateAction if isStarUpdate(u) =>
        GraftLake.MergeClause("matched", "update", cond(u.condition))
      case u: UpdateAction =>
        GraftLake.MergeClause("matched", "update", cond(u.condition),
          assigns(u.assignments))
      case d: DeleteAction =>
        GraftLake.MergeClause("matched", "delete", cond(d.condition))
      case other => throw new IllegalArgumentException(
        s"MERGE INTO <graft lake>: unsupported WHEN MATCHED action $other")
    }
    val notMatched = m.notMatchedActions.map {
      case InsertStarAction(c) =>
        GraftLake.MergeClause("notMatched", "insert", cond(c))
      case i: InsertAction if isStarInsert(i) =>
        GraftLake.MergeClause("notMatched", "insert", cond(i.condition))
      case i: InsertAction =>
        GraftLake.MergeClause("notMatched", "insert", cond(i.condition),
          assigns(i.assignments))
      case other => throw new IllegalArgumentException(
        s"MERGE INTO <graft lake>: unsupported WHEN NOT MATCHED action $other")
    }
    val bySource = m.notMatchedBySourceActions.map {
      case d: DeleteAction =>
        GraftLake.MergeClause("bySource", "delete", cond(d.condition))
      case u: UpdateAction =>
        GraftLake.MergeClause("bySource", "update", cond(u.condition),
          assigns(u.assignments))
      case other => throw new IllegalArgumentException(
        "MERGE INTO <graft lake>: unsupported WHEN NOT MATCHED BY SOURCE " +
          s"action $other")
    }
    matched ++ notMatched ++ bySource
  }}

/** DELETE FROM <lake view> WHERE <cond> — executes the lake's
  * copy-on-write row-level delete.
  */
final case class GraftLakeDeleteCommand(
    path: String, condSql: String, statsCol: String,
    viewName: String = "")
  extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    // Tables opted into deletion vectors (Delta's
    // enableDeletionVectors) take the merge-on-read route: an
    // O(deleted rows) position sidecar instead of a file-set rewrite;
    // OPTIMIZE materializes. Otherwise copy-on-write as before.
    // Inside BEGIN TRANSACTION the commit rides the transaction
    // token (provisional, rolled back by ROLLBACK).
    if (GraftLake.dvDeletesEnabled(path))
      GraftLake.deleteDv(spark, path, expr(condSql))
    else
      GraftLake.delete(spark, path, expr(condSql), statsCol = Some(statsCol))
    if (viewName.nonEmpty) {
      if (LakeSql.txnOpen) GraftLake.txnTouchView(viewName, path)
      else GraftLake.read(spark, path).createOrReplaceTempView(viewName)
    }
    Seq.empty
  }
}

/** DELETE FROM <lake view> WHERE <col> IN (<subquery>) — the CDC-apply
  * shape as SQL: the subquery's keys become a DISTRIBUTED delta frame
  * for [[GraftLake.deleteKeys]] (zone-map + Bloom victim
  * shortlisting, O(delta + hit sets)) instead of collapsing the
  * subquery into a driver-side predicate. The subquery must produce
  * exactly one column; the IN column must be a bare table column.
  */
final case class GraftLakeDeleteInCommand(
    path: String, keyCol: String, keys: LogicalPlan, statsCol: String,
    viewName: String)
  extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = keys :: Nil
  override def run(spark: SparkSession): Seq[Row] = {
    val kdf = GraftSqlBridge.ofRows(spark, keys)
    require(kdf.columns.length == 1,
      s"DELETE FROM $viewName WHERE $keyCol IN (subquery): the subquery " +
        s"must produce exactly ONE column, got ${kdf.columns.length}")
    // Canonicalize to the table's own column casing — deleteKeys
    // resolves stats/blooms case-sensitively.
    val target = org.apache.spark.sql.types.StructType.fromDDL(
      GraftLake.snapshot(path).schemaDdl)
    val canon = target.fieldNames.find(_.equalsIgnoreCase(keyCol)).getOrElse(
      throw new IllegalArgumentException(
        s"DELETE FROM $viewName: no column '$keyCol'"))
    GraftLake.deleteKeys(spark, path, kdf.toDF(canon), canon, Some(statsCol))
    if (LakeSql.txnOpen) GraftLake.txnTouchView(viewName, path)
    else GraftLake.read(spark, path).createOrReplaceTempView(viewName)
    Seq.empty
  }
}

/** UPDATE <lake view> SET c = expr, ... [WHERE <cond>] — executes the
  * lake's zone-pruned copy-on-write row-level update. Assignment
  * right-hand sides and the condition re-parse as bare SQL against a
  * fresh snapshot at execution time (same posture as DELETE).
  */
final case class GraftLakeUpdateCommand(
    path: String, condSql: String, assigns: Seq[(String, String)],
    statsCol: String)
  extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    // Tables opted into deletion vectors (Delta's
    // enableDeletionVectors) take the merge-on-read route: ONE atomic
    // commit of a position sidecar + the rewritten rows — zero bytes
    // of the hit sets rewritten; OPTIMIZE materializes. Otherwise
    // zone-pruned copy-on-write as before.
    if (GraftLake.dvDeletesEnabled(path))
      GraftLake.updateDv(spark, path, expr(condSql),
        assigns.map { case (c, v) => c -> expr(v) }, Some(statsCol))
    else
      GraftLake.update(spark, path, expr(condSql),
        assigns.map { case (c, v) => c -> expr(v) }, Some(statsCol))
    Seq.empty
  }
}

/** RESTORE TABLE <lake view> TO VERSION AS OF <n> — executes the
  * lake's zero-copy rollback (see [[GraftLake.restore]]'s fences).
  */
final case class GraftLakeRestoreCommand(path: String, version: Int)
  extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    LakeSql.refuseInTxn(s"RESTORE TABLE at $path")
    GraftLake.restore(spark, path, version)
    Seq.empty
  }
}

/** DESCRIBE HISTORY <lake view> — the audit surface as a SQL result
  * set (version, action, timestamp, added/removed set counts, tag),
  * straight off the commit log: O(commits) metadata rows.
  */
final case class GraftLakeHistoryCommand(path: String)
  extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.AttributeReference
  import org.apache.spark.sql.types._
  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    Seq(
      AttributeReference("version", IntegerType, nullable = false)(),
      AttributeReference("action", StringType, nullable = false)(),
      AttributeReference("committed_at", TimestampType, nullable = false)(),
      AttributeReference("n_added", IntegerType, nullable = false)(),
      AttributeReference("n_removed", IntegerType, nullable = false)(),
      AttributeReference("tag", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    GraftLake.history(spark, path).collect().toSeq
}

/** DESCRIBE DETAIL <lake view> — Delta's one-row table summary off
  * the snapshot: format, location, current version, live/tombstone
  * set counts, constraint count, CDF flag. O(log suffix) metadata.
  */
final case class GraftLakeDetailCommand(path: String)
  extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.AttributeReference
  import org.apache.spark.sql.types._
  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    Seq(
      AttributeReference("format", StringType, nullable = false)(),
      AttributeReference("location", StringType, nullable = false)(),
      AttributeReference("version", IntegerType, nullable = false)(),
      AttributeReference("num_live_sets", IntegerType, nullable = false)(),
      AttributeReference("num_tombstone_sets", IntegerType, nullable = false)(),
      AttributeReference("num_constraints", IntegerType, nullable = false)(),
      AttributeReference("cdf_enabled", BooleanType, nullable = false)(),
      AttributeReference("partition_column", StringType, nullable = true)(),
      AttributeReference("dv_enabled", BooleanType, nullable = false)(),
      AttributeReference("auto_compact", IntegerType, nullable = true)(),
      AttributeReference("num_defaults", IntegerType, nullable = false)(),
      AttributeReference("num_generated", IntegerType, nullable = false)(),
      AttributeReference("num_ingested_files", IntegerType, nullable = false)(),
      AttributeReference("num_files", LongType, nullable = false)(),
      AttributeReference("size_bytes", LongType, nullable = false)(),
      // served from the commit-time `_ridmap` sidecars — zero parquet
      // footer opens; NULL when any live set predates the sidecar
      AttributeReference("num_rows", LongType, nullable = true)())
  override def run(spark: SparkSession): Seq[Row] = {
    val s = GraftLake.snapshot(path)
    // Delta's numFiles/sizeInBytes: live parquet files only, one
    // driver-side metadata walk, no tasks.
    import scala.jdk.CollectionConverters._
    val files = s.live.flatMap { ls =>
      // setPathOf: a shallow clone's sets are absolute source paths
      java.nio.file.Files.walk(java.nio.file.Paths.get(
        GraftLake.setPathOf(path, ls.set)))
        .iterator().asScala.toSeq
        .filter(_.getFileName.toString.endsWith(".parquet"))
    }
    Seq(Row("graft-lake", path, s.version, s.live.size, s.tombstones.size,
      s.constraints.size, GraftLake.cdfEnabled(path),
      Option(GraftLake.partitionColumnsOf(path))
        .filter(_.nonEmpty).map(_.mkString(",")).orNull,
      GraftLake.dvDeletesEnabled(path),
      GraftLake.autoCompactThreshold(path)
        .map(Integer.valueOf).orNull,
      s.defaults.size, s.generated.size, s.ingested.size,
      files.size.toLong,
      files.map(java.nio.file.Files.size(_)).sum, {
        // NULL rather than a wrong number when outstanding MoR masks
        // make the physical counts overstate the visible rows —
        // checked FIRST so the masked path reads zero sidecars.
        if (s.tombstones.nonEmpty) null
        else {
          val counts = s.live.map(ls =>
            GraftLake.setRecordCountFromSidecar(path, ls.set))
          if (counts.exists(_.isEmpty)) null
          else java.lang.Long.valueOf(counts.flatten.sum)
        }
      }))
  }
}

/** SHOW TBLPROPERTIES <lake view> — the recorded property surface as
  * rows (Delta's SHOW TBLPROPERTIES shape): feature opt-ins, the
  * layout column, and the per-column DEFAULT/GENERATED expressions.
  */
final case class GraftLakeShowPropsCommand(path: String)
  extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.AttributeReference
  import org.apache.spark.sql.types.StringType
  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    Seq(AttributeReference("key", StringType, nullable = false)(),
      AttributeReference("value", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val s = GraftLake.snapshot(path)
    val props =
      Seq("enableChangeDataFeed" -> GraftLake.cdfEnabled(path).toString,
        "enableDeletionVectors" -> GraftLake.dvDeletesEnabled(path).toString,
        "schemaAutoMerge" -> GraftLake.schemaAutoMergeEnabled(path).toString,
        "enableRowTracking" -> GraftLake.rowTrackingEnabled(path).toString) ++
      GraftLake.autoCompactThreshold(path).map(n =>
        "autoCompact" -> n.toString).toSeq ++
      (if (s.partitionCols.isEmpty) Seq.empty
       else Seq("partitionColumns" -> s.partitionCols.mkString(","))) ++
      s.defaults.toSeq.sortBy(_._1).map { case (c, q) =>
        s"default.$c" -> q } ++
      s.generated.toSeq.sortBy(_._1).map { case (c, q) =>
        s"generated.$c" -> q } ++
      s.identities.toSeq.sortBy(_._1).map { case (c, (st, sp)) =>
        s"identity.$c" -> s"START WITH $st INCREMENT BY $sp" }
    props.map { case (k, v) => Row(k, v) }
  }
}

/** ALTER TABLE <lake view> ADD COLUMNS (c type, ...) — executes the
  * lake's zero-data metadata evolve, then refreshes the registered
  * view so reads see the (null-filled) columns.
  */
final case class GraftLakeAddColumnsCommand(
    path: String, viewName: String,
    cols: Seq[(String, org.apache.spark.sql.types.DataType)])
  extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    GraftLake.addColumns(path, cols)
    GraftLake.read(spark, path).createOrReplaceTempView(viewName)
    Seq.empty
  }
}

/** ALTER TABLE <lake view> ADD CONSTRAINT <n> CHECK (<p>) — routes
  * onto the lake's validated, crc-sealed rule commit (existing rows
  * must already satisfy the rule; every later write validates).
  */
final case class GraftLakeAddConstraintCommand(
    path: String, name: String, condition: String)
  extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    GraftLake.addConstraint(spark, path, name, condition)
    Seq.empty
  }
}

/** ALTER TABLE <lake view> DROP CONSTRAINT <n> — drops the rule; with
  * IF EXISTS an absent name is a clean no-op, otherwise it refuses.
  */
final case class GraftLakeDropConstraintCommand(
    path: String, name: String, ifExists: Boolean)
  extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    require(ifExists || GraftLake.constraintsOf(path).contains(name),
      s"no constraint '$name' on $path (use IF EXISTS for a no-op)")
    GraftLake.dropConstraint(path, name)
    Seq.empty
  }
}

/** ALTER TABLE <lake view> DROP COLUMN <c> — executes the lake's
  * zero-rewrite column drop, then refreshes the registered view.
  */
final case class GraftLakeDropColumnCommand(
    path: String, viewName: String, colName: String)
  extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    GraftLake.dropColumn(path, colName)
    GraftLake.read(spark, path).createOrReplaceTempView(viewName)
    Seq.empty
  }
}

/** ALTER TABLE <lake view> RENAME COLUMN <old> TO <new> — executes
  * the lake's zero-rewrite column-mapping rename, then refreshes the
  * registered temp view so subsequent reads see the new name.
  */
final case class GraftLakeRenameCommand(
    path: String, viewName: String, oldName: String, newName: String)
  extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    GraftLake.renameColumn(path, oldName, newName)
    GraftLake.read(spark, path).createOrReplaceTempView(viewName)
    Seq.empty
  }
}

/** INSERT INTO / INSERT OVERWRITE <lake view> — routes onto
  * [[GraftLake.append]] / [[GraftLake.overwrite]] (claim/publish
  * loop, CHECK constraints, schema fences inherited — SQL INSERT is
  * the one write path, never a second one). SQL assignment semantics:
  * positional when no column list is given (arity-checked), by-name
  * with null-fill for an explicit `(c1, c2, ...)` list; values
  * store-assign (cast) to the table's column types. The registered
  * temp view refreshes so subsequent SQL reads see the rows.
  */
final case class GraftLakeInsertCommand(
    path: String, viewName: String, query: LogicalPlan,
    overwrite: Boolean, userCols: Seq[String], statsCol: String,
    partitionSpec: Seq[(String, Option[String])] = Seq.empty)
  extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = query :: Nil
  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.{col, lit}
    val df = GraftSqlBridge.ofRows(spark, query)
    val target = org.apache.spark.sql.types.StructType.fromDDL(
      GraftLake.snapshot(path).schemaDdl)
    val layout = GraftLake.partitionColumnsOf(path)
    // PARTITION (...) clause: legal only against the table's recorded
    // layout, FULL tuple, IN LAYOUT ORDER — a partial spec would leave
    // some layout column floating under a static pin (Hive refuses the
    // same way), and accepting a reordered spec would silently bind
    // values to the wrong columns on positional readers. `PARTITION
    // (c1, c2)` (all bare = dynamic form) routes the dynamic insert;
    // `PARTITION (c1=v1, c2=v2)` pins every value — the query then
    // provides every OTHER column.
    val staticPins: Seq[(String, String)] = partitionSpec match {
      case Seq() => Seq.empty
      case spec =>
        require(layout.nonEmpty, s"INSERT INTO $viewName PARTITION: " +
          "not a partitioned lake table")
        require(spec.length == layout.length &&
          spec.map(_._1).zip(layout).forall {
            case (k, pc) => k.equalsIgnoreCase(pc) },
          s"INSERT INTO $viewName PARTITION: the table layout is " +
            s"${layout.mkString("(", ", ", ")")} — name every layout " +
            s"column, in that order (got " +
            s"${spec.map(_._1).mkString("(", ", ", ")")})")
        val defined = spec.count(_._2.isDefined)
        require(defined == 0 || defined == spec.length,
          s"INSERT INTO $viewName PARTITION: pin every layout column " +
            "or none (mixed static/dynamic specs are ambiguous)")
        spec.zip(layout).flatMap { case ((_, v), pc) => v.map(pc -> _) }
    }
    // GENERATED and IDENTITY columns are never supplied — they are
    // computed on write; listing one explicitly refuses (Delta's rule).
    val genCols = GraftLake.generatedColumnsOf(path)
    val defCols = GraftLake.columnDefaultsOf(path)
    val idCols = GraftLake.identityColumnsOf(path)
    val idDefaults = GraftLake.identityDefaultsOf(path)
    // BY DEFAULT identity columns accept explicit values; ALWAYS ones
    // refuse (Delta's rule). A column listed explicitly passes its
    // values through appendIdentity, which advances the high water
    // past them.
    val idAlways = idCols.keySet.filterNot(c =>
      idDefaults.exists(_.equalsIgnoreCase(c)))
    val idSupplied = idCols.keySet.filter(c =>
      userCols.exists(_.equalsIgnoreCase(c)))
    userCols.find(c => genCols.keys.exists(_.equalsIgnoreCase(c))).foreach(c =>
      throw new IllegalArgumentException(
        s"INSERT INTO $viewName: column '$c' is GENERATED — it is " +
          "computed on write, do not supply it"))
    userCols.find(c => idAlways.exists(_.equalsIgnoreCase(c))).foreach(c =>
      throw new IllegalArgumentException(
        s"INSERT INTO $viewName: column '$c' is GENERATED ALWAYS AS " +
          "IDENTITY — it is allocated on write, do not supply it"))
    // With static PARTITION values the query feeds the remaining
    // columns; the pinned values fill the layout columns.
    val insertTarget = {
      staticPins.foreach { case (pc, _) =>
        require(!userCols.exists(_.equalsIgnoreCase(pc)),
          s"INSERT INTO $viewName: column '$pc' is pinned by the " +
            "PARTITION clause — do not also list it")
      }
      org.apache.spark.sql.types.StructType(
        target.fields.filterNot(f =>
          staticPins.exists(_._1.equalsIgnoreCase(f.name)) ||
            genCols.keys.exists(_.equalsIgnoreCase(f.name)) ||
            (idCols.keys.exists(_.equalsIgnoreCase(f.name)) &&
              !idSupplied.exists(_.equalsIgnoreCase(f.name)))))
    }
    val alignedPart =
      if (userCols.isEmpty) {
        require(df.columns.length == insertTarget.fields.length,
          s"INSERT INTO $viewName: ${df.columns.length} column(s) " +
            s"provided, expected ${insertTarget.fields.length} — match " +
            "the arity or name the columns")
        df.toDF(insertTarget.fieldNames.toIndexedSeq: _*)
          .select(insertTarget.fields.map(f =>
            col(f.name).cast(f.dataType)).toIndexedSeq: _*)
      } else {
        val lower = userCols.map(_.toLowerCase(java.util.Locale.ROOT))
        require(lower.distinct.size == lower.size,
          s"INSERT INTO $viewName: duplicate column in the insert list")
        val unknown = lower.filterNot(c =>
          insertTarget.fieldNames.exists(_.equalsIgnoreCase(c)))
        require(unknown.isEmpty,
          s"INSERT INTO $viewName: unknown column(s) ${unknown.mkString(", ")}")
        require(df.columns.length == userCols.length,
          s"INSERT INTO $viewName: ${df.columns.length} value column(s) " +
            s"for ${userCols.length} named column(s)")
        val renamed = df.toDF(userCols.toIndexedSeq: _*)
        renamed.select(insertTarget.fields.map { f =>
          userCols.find(_.equalsIgnoreCase(f.name)) match {
            case Some(u) => col(u).cast(f.dataType).as(f.name)
            case None =>
              // An omitted column takes its DEFAULT when one is
              // recorded, else NULL — SQL insert semantics.
              defCols.find(_._1.equalsIgnoreCase(f.name)) match {
                case Some((_, sql)) => expr(sql).cast(f.dataType).as(f.name)
                case None => lit(null).cast(f.dataType).as(f.name)
              }
          }
        }.toIndexedSeq: _*)
      }
    val withPart = staticPins.foldLeft(alignedPart) { case (d, (pc, v)) =>
      val pf = target.fields.find(_.name.equalsIgnoreCase(pc)).get
      d.withColumn(pf.name, lit(v).cast(pf.dataType))
    }
    // GENERATED columns compute from the aligned row, store-assign
    // cast to their declared type, then everything takes table order.
    val withGen = genCols.foldLeft(withPart) { case (df0, (g, sql)) =>
      val gf = target.fields.find(_.name.equalsIgnoreCase(g)).get
      df0.withColumn(gf.name, expr(sql).cast(gf.dataType))
    }
    // Inside an open SQL transaction, a plain append executes as a
    // PROVISIONAL commit riding the transaction token (invisible
    // until COMMIT, visible to this thread's later statements). Only
    // plain appends participate; the view re-registers at COMMIT —
    // a mid-transaction refresh would leak pending rows to other
    // threads through the session-global temp view.
    if (LakeSql.txnOpen) {
      require(!overwrite && layout.isEmpty && idCols.isEmpty,
        s"INSERT INTO $viewName inside BEGIN TRANSACTION: only plain " +
          "appends participate (no OVERWRITE, partitioned layouts, or " +
          "IDENTITY tables) — COMMIT first")
      GraftLake.append(
        withGen.select(target.fields.map(f => col(f.name)).toIndexedSeq: _*),
        path, statsCol = Some(statsCol))
      GraftLake.txnTouchView(viewName, path)
      return Seq.empty
    }
    // IDENTITY tables route through the allocating append: values are
    // computed off the row-tracking range claim, never supplied.
    if (idCols.nonEmpty) {
      require(layout.isEmpty,
        s"INSERT INTO $viewName: IDENTITY columns on a PARTITIONED " +
          "lake are not supported — drop one of the two")
      require(!overwrite,
        s"INSERT OVERWRITE on $viewName: not supported with IDENTITY " +
          "columns (identity values are append-allocated) — DELETE + " +
          "INSERT instead")
      val nonId = withGen.select(target.fields
        .filterNot(f => idCols.keys.exists(_.equalsIgnoreCase(f.name)) &&
          !idSupplied.exists(_.equalsIgnoreCase(f.name)))
        .map(f => col(f.name)).toIndexedSeq: _*)
      GraftLake.appendIdentity(nonId, path, Some(statsCol))
      GraftLake.read(spark, path).createOrReplaceTempView(viewName)
      return Seq.empty
    }
    val aligned =
      withGen.select(target.fields.map(f => col(f.name)).toIndexedSeq: _*)
    (layout, overwrite) match {
      case (pcs, false) if pcs.nonEmpty =>
        // Dynamic or static append: per-value-tuple file-sets, exact
        // manifest zone maps — the layout survives every SQL INSERT.
        GraftLake.appendPartitionedBy(aligned, path, pcs,
          statsCols = Seq(statsCol)
            .filterNot(c => pcs.exists(_.equalsIgnoreCase(c))))
      case (pcs, true) if pcs.nonEmpty =>
        (staticPins, pcs) match {
          case (Seq((pc, v)), Seq(_)) =>
            val lv =
              try v.toLong
              catch { case _: NumberFormatException =>
                throw new IllegalArgumentException(
                  s"INSERT OVERWRITE $viewName PARTITION ($pc=$v): the " +
                    "layout column is integral — give an integral value")
              }
            GraftLake.replaceWhere(spark, path, aligned, pc, lv, lv)
          case (pins, _) if pins.nonEmpty =>
            // Multi-column static pin: the pinned df holds exactly one
            // value tuple, so the dynamic route replaces exactly that
            // partition and nothing else.
            GraftLake.overwritePartitionsDynamic(spark, aligned, path,
              statsCols = Seq(statsCol)
                .filterNot(c => pcs.exists(_.equalsIgnoreCase(c))))
          case (_, _) if partitionSpec.nonEmpty =>
            // Dynamic `PARTITION (c1, c2)` overwrite: replace exactly
            // the partitions present in the query, every other
            // partition survives by reference with the layout intact.
            GraftLake.overwritePartitionsDynamic(spark, aligned, path,
              statsCols = Seq(statsCol)
                .filterNot(c => pcs.exists(_.equalsIgnoreCase(c))))
          case _ => throw new IllegalArgumentException(
            s"INSERT OVERWRITE on partitioned lake $viewName needs a " +
              s"PARTITION clause — PARTITION " +
              s"(${pcs.map(_ + "=<value>").mkString(", ")}) replaces one " +
              s"partition, PARTITION (${pcs.mkString(", ")}) replaces " +
              "the partitions in the query; a bare overwrite would drop " +
              "the layout")
        }
      case (_, false) =>
        GraftLake.append(aligned, path, statsCol = Some(statsCol))
      case (_, true) =>
        GraftLake.overwrite(aligned, path)
    }
    GraftLake.read(spark, path).createOrReplaceTempView(viewName)
    Seq.empty
  }
}

/** CREATE TABLE <name> USING graftlake LOCATION '<path>'
  * [TBLPROPERTIES ('statscol'='c')] AS SELECT ... — creates a NEW
  * lake table at the location from the query result and registers
  * `name` for SQL reads + DML (the Delta `USING delta` CTAS shape).
  * `IF NOT EXISTS` over an existing lake is a clean no-op (the table
  * is still registered).
  */
final case class GraftLakeCtasCommand(
    path: String, name: String, query: LogicalPlan,
    statsCol: Option[String], ignoreIfExists: Boolean,
    partCols: Seq[String] = Seq.empty)
  extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = query :: Nil
  override def run(spark: SparkSession): Seq[Row] = {
    val df = GraftSqlBridge.ofRows(spark, query)
    statsCol.foreach(c => require(df.columns.exists(_.equalsIgnoreCase(c)),
      s"CREATE TABLE $name: statscol '$c' is not a query column"))
    partCols.foreach(c => require(df.columns.exists(_.equalsIgnoreCase(c)),
      s"CREATE TABLE $name: partition column '$c' is not a query column"))
    val exists = java.nio.file.Files.exists(
      java.nio.file.Paths.get(path, "_graft_log"))
    if (exists) {
      require(ignoreIfExists,
        s"CREATE TABLE $name: a lake table already exists at $path " +
          "(use IF NOT EXISTS to register it instead)")
    } else {
      val canonStats =
        statsCol.flatMap(c => df.columns.find(_.equalsIgnoreCase(c)))
      partCols.map(c => df.columns.find(_.equalsIgnoreCase(c)).get) match {
        case pcs if pcs.nonEmpty =>
          // Partitioned create: one set per value TUPLE with exact
          // manifest zone maps on every layout column, then the
          // marker so every later SQL INSERT keeps the layout.
          GraftLake.appendPartitionedBy(df, path, pcs,
            statsCols = canonStats
              .filterNot(c => pcs.exists(_.equalsIgnoreCase(c))).toSeq)
          GraftLake.setPartitionColumns(path, pcs)
        case _ =>
          GraftLake.create(df, path, statsCol = canonStats)
      }
    }
    // Merge pruning needs a registered stats column; absent the
    // property, fall back to the first column — merges stay CORRECT
    // (unpruned victims are scanned), just less pruned. Register the
    // CASE-CORRECTED name (the same df.columns match used for
    // create): statsFor lookups are case-sensitive, so a raw
    // TBLPROPERTIES casing would record stats under a name zone-map
    // pruning never finds.
    LakeSql.register(spark, path, name,
      statsCol.flatMap(c => df.columns.find(_.equalsIgnoreCase(c)))
        .getOrElse(df.columns.head))
    Seq.empty
  }
}

/** CREATE TABLE <name> (col defs) USING graftlake LOCATION '<path>'
  * [TBLPROPERTIES ('statscol'='c')] [PARTITIONED BY (c)] — the
  * column-list create (Delta's empty-table shape): ONE zero-data
  * `create` commit carries the declared schema; the table is
  * immediately readable (zero rows), insertable, and DDL-able.
  * `IF NOT EXISTS` over an existing lake registers it instead.
  */
final case class GraftLakeCreateEmptyCommand(
    path: String, name: String,
    tableSchema: org.apache.spark.sql.types.StructType,
    statsCol: Option[String], partCols: Seq[String],
    ignoreIfExists: Boolean,
    defaults: Seq[(String, String)] = Seq.empty,
    generated: Seq[(String, String)] = Seq.empty,
    identity: Seq[(String, (Long, Long))] = Seq.empty,
    identityDefault: Set[String] = Set.empty)
  extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    statsCol.foreach(c => require(tableSchema.fieldNames.exists(_.equalsIgnoreCase(c)),
      s"CREATE TABLE $name: statscol '$c' is not a declared column"))
    val canonPart = partCols.map { c =>
      val f = tableSchema.fields.find(_.name.equalsIgnoreCase(c)).getOrElse(
        throw new IllegalArgumentException(
          s"CREATE TABLE $name: partition column '$c' is not a declared column"))
      require(GraftLake.isIntegralType(f.dataType),
        s"CREATE TABLE $name: partition column '$c' must be integral, " +
          s"got ${f.dataType.simpleString}")
      f.name
    }
    val exists = java.nio.file.Files.exists(
      java.nio.file.Paths.get(path, "_graft_log"))
    if (exists) {
      require(ignoreIfExists,
        s"CREATE TABLE $name: a lake table already exists at $path " +
          "(use IF NOT EXISTS to register it instead)")
    } else {
      GraftLake.createEmpty(path, tableSchema)
      // The layout marker lands BEFORE any insert, so the very first
      // `INSERT INTO` already takes the partitioned route.
      if (canonPart.nonEmpty) GraftLake.setPartitionColumns(path, canonPart)
      // IDENTITY allocation rides the row-tracking high water — the
      // opt-in lands with the create, before any insert.
      if (identity.nonEmpty) GraftLake.enableRowTracking(path)
      if (defaults.nonEmpty || generated.nonEmpty || identity.nonEmpty)
        GraftLake.recordColDefs(path, defaults, generated, identity,
          identityDefault)
    }
    LakeSql.register(spark, path, name,
      statsCol.flatMap(c => tableSchema.fieldNames.find(_.equalsIgnoreCase(c)))
        .getOrElse(tableSchema.fieldNames.head))
    Seq.empty
  }
}

/** TRUNCATE TABLE <lake view> — drop every live file-set by
  * reference in one O(1) metadata commit ([[GraftLake.truncate]]);
  * schema/constraints/layout survive, time travel still serves the
  * pre-truncate versions until VACUUM.
  */
final case class GraftLakeTruncateCommand(path: String, viewName: String)
  extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    LakeSql.refuseInTxn(s"TRUNCATE TABLE $viewName")
    GraftLake.truncate(path)
    GraftLake.read(spark, path).createOrReplaceTempView(viewName)
    Seq.empty
  }
}

/** COPY INTO <lake view> FROM '<dir>' [FILEFORMAT = PARQUET|CSV|JSON]
  * [FORMAT_OPTIONS('k'='v', ...)] — Delta's idempotent batch file
  * ingest ([[GraftLake.copyInto]]): only files not yet in the
  * table's ingest ledger load; re-runs are no-ops; the ledger rides
  * the same atomic commit as the data. Returns
  * (files_loaded, rows_loaded).
  */
final case class GraftLakeCopyIntoCommand(
    path: String, viewName: String, srcDir: String, format: String,
    options: Seq[(String, String)], statsCol: String)
  extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.AttributeReference
  import org.apache.spark.sql.types.{IntegerType, LongType}
  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    Seq(AttributeReference("files_loaded", IntegerType, nullable = false)(),
      AttributeReference("rows_loaded", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val (_, files, rows) = GraftLake.copyInto(spark, path, srcDir, format,
      options.toMap, Some(statsCol))
    GraftLake.read(spark, path).createOrReplaceTempView(viewName)
    Seq(Row(files, rows))
  }
}

/** VACUUM <lake view> [RETAIN n HOURS] — the lake's physical
  * reclamation as SQL (Delta's VACUUM grammar), returning the
  * reclaimed set names.
  */
final case class GraftLakeVacuumCommand(
    path: String, retainMillis: Long, dryRun: Boolean = false)
  extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.AttributeReference
  import org.apache.spark.sql.types.StringType
  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    Seq(AttributeReference("reclaimed_set", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    (if (dryRun) GraftLake.vacuumDryRun(path, retainMillis)
     else GraftLake.vacuum(path, retainMillis)).map(Row(_))
}

/** RESTORE TABLE <lake view> TO TIMESTAMP AS OF <ts> — the stamp-to-
  * version rule of `readAsOf` composed with the zero-copy rollback.
  */
final case class GraftLakeRestoreTsCommand(path: String, tsMillis: Long)
  extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    GraftLake.restoreAsOf(spark, path, tsMillis)
    Seq.empty
  }
}

/** OPTIMIZE <lake view> [WHERE <pred>] [ZORDER BY (a, b)] —
  * transactional compaction as SQL (Delta's OPTIMIZE): plain form
  * range-sorts by the registered stats column, ZORDER clusters on
  * the Morton key of the two named dimensions, WHERE scopes the
  * compaction to the sets that might hold matching rows (manifest-
  * pruned — the 100 TB shape: coalesce yesterday's small files, not
  * the table). WHERE + ZORDER together refuse (run them separately).
  * Returns (sets_before, sets_after).
  */
final case class GraftLakeOptimizeCommand(
    path: String, viewName: String, zorder: Option[(String, String)],
    statsCol: String, numFiles: Int = 4, where: Option[String] = None)
  extends LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.AttributeReference
  import org.apache.spark.sql.types.IntegerType
  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    Seq(AttributeReference("sets_before", IntegerType, nullable = false)(),
      AttributeReference("sets_after", IntegerType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val before = GraftLake.snapshot(path).live.size
    (zorder, where) match {
      case (Some(_), Some(_)) => throw new IllegalArgumentException(
        s"OPTIMIZE $viewName: WHERE and ZORDER BY don't compose — " +
          "scope-compact first, then ZORDER the result")
      case (Some((a, b)), None) =>
        GraftLake.compactZOrder(spark, path, a, b, numFiles)
      case (None, Some(w)) =>
        GraftLake.compactWhere(spark, path, expr(w), Seq(statsCol),
          numFiles, Some(statsCol))
      case (None, None) =>
        GraftLake.compact(spark, path, Seq(statsCol), numFiles, Some(statsCol))
    }
    GraftLake.read(spark, path).createOrReplaceTempView(viewName)
    Seq(Row(before, GraftLake.snapshot(path).live.size))
  }
}

/** MERGE INTO <lake view> USING <source> ON <key equalities>
  * WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT * —
  * the canonical upsert — executes the lake's zone-map-pruned merge.
  * `source` is the analyzed source plan, turned back into a DataFrame
  * at execution time.
  */
final case class GraftLakeMergeCommand(
    path: String, source: LogicalPlan, keyCols: Seq[String], statsCol: String)
  extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = source :: Nil
  override def run(spark: SparkSession): Seq[Row] = {
    // Tables opted into deletion vectors (Delta's
    // enableDeletionVectors) take the merge-on-read route: a position
    // sidecar masks the matched target rows and ONE appended set
    // carries every update row — O(update rows) write cost, zero
    // bytes of the hit sets rewritten, and it runs atop outstanding
    // sidecars (no inter-batch compact). Otherwise the zone-pruned
    // copy-on-write merge as before.
    val evolve = GraftLake.schemaAutoMergeEnabled(path)
    if (GraftLake.dvDeletesEnabled(path))
      GraftLake.mergeDv(spark, path, GraftSqlBridge.ofRows(spark, source),
        keyCols, statsCol, autoEvolve = evolve)
    else
      GraftLake.merge(spark, path, GraftSqlBridge.ofRows(spark, source),
        keyCols, statsCol, autoEvolve = evolve)
    Seq.empty
  }
}

/** MERGE INTO <lake view> with the GENERAL clause shape — computed
  * SET, `WHEN MATCHED ... DELETE`, conditional inserts, `WHEN NOT
  * MATCHED BY SOURCE` — executes [[GraftLake.mergeActions]] (same
  * claim/publish + zone-pruned rewrite + CDF path as the canonical
  * upsert). Clauses arrive pre-compiled to `t`/`s`-qualified SQL
  * text; the registered view refreshes so later SQL reads see the
  * merged rows.
  */
final case class GraftLakeMergeActionsCommand(
    path: String, viewName: String, source: LogicalPlan,
    keyCols: Seq[String], statsCol: String,
    clauses: Seq[GraftLake.MergeClause])
  extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = source :: Nil
  override def run(spark: SparkSession): Seq[Row] = {
    // Same DV opt-in routing as the canonical MERGE: tables with
    // enableDeletionVectors take the merge-on-read clause executor
    // (position sidecar + O(affected rows) append, zero set rewrites).
    if (GraftLake.dvDeletesEnabled(path))
      GraftLake.mergeActionsDv(spark, path,
        GraftSqlBridge.ofRows(spark, source), keyCols, statsCol, clauses)
    else
      GraftLake.mergeActions(spark, path,
        GraftSqlBridge.ofRows(spark, source), keyCols, statsCol, clauses)
    if (LakeSql.txnOpen) GraftLake.txnTouchView(viewName, path)
    else GraftLake.read(spark, path).createOrReplaceTempView(viewName)
    Seq.empty
  }
}

/** ALTER TABLE <lake view> SET TBLPROPERTIES ('k'='v', ...) — the
  * Delta table-property surface for the lake's feature opt-ins:
  * `enableDeletionVectors` flips the DML routes (DELETE / UPDATE /
  * MERGE) onto the merge-on-read executors; `enableChangeDataFeed`
  * (alias `enableCdf`) turns on CDF staging. Delta-prefixed names
  * (`delta.enableDeletionVectors`, `delta.enableChangeDataFeed`)
  * are accepted verbatim. Both opt-ins are one-way — `'false'`
  * refuses loudly (committed sidecars / feed history cannot be
  * retroactively un-written), as does any unknown key: silently
  * ignoring a property a user believes they set is worse than an
  * error.
  */
final case class GraftLakeSetPropsCommand(
    path: String, props: Seq[(String, String)])
  extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    require(props.nonEmpty,
      "SET TBLPROPERTIES: no 'key'='value' pairs parsed")
    props.foreach { case (k0, v) =>
      val k = k0.stripPrefix("delta.")
        .toLowerCase(java.util.Locale.ROOT)
      (k, v.toLowerCase(java.util.Locale.ROOT)) match {
        case ("enabledeletionvectors", "true") =>
          GraftLake.enableDeletionVectors(path)
        case ("enablechangedatafeed" | "enablecdf", "true") =>
          GraftLake.enableCdf(path)
        case ("enabledeletionvectors" | "enablechangedatafeed" |
              "enablecdf", _) =>
          throw new IllegalArgumentException(
            s"TBLPROPERTIES '$k0'='$v': the opt-in is one-way — " +
              "committed sidecars / feed history cannot be un-written")
        // Pure route flag (nothing committed depends on it), so it
        // toggles both ways — Delta's schema.autoMerge as a table
        // property instead of a session conf.
        case ("schemaautomerge" | "schema.automerge.enabled", "true") =>
          GraftLake.enableSchemaAutoMerge(path)
        case ("schemaautomerge" | "schema.automerge.enabled", "false") =>
          GraftLake.disableSchemaAutoMerge(path)
        // Delta's autoOptimize.autoCompact — 'true' takes the default
        // threshold, an integer sets it, 'false' disables (pure
        // behavior flag, two-way).
        case ("autocompact" | "autooptimize.autocompact", "true") =>
          GraftLake.enableAutoCompact(path)
        case ("autocompact" | "autooptimize.autocompact", "false") =>
          GraftLake.disableAutoCompact(path)
        case ("autocompact" | "autooptimize.autocompact", n)
            if n.forall(_.isDigit) && n.nonEmpty =>
          GraftLake.enableAutoCompact(path, n.toInt)
        // Row tracking is one-way like CDF/DV: committed id ranges
        // cannot be un-allocated.
        case ("enablerowtracking", "true") =>
          GraftLake.enableRowTracking(path)
        case ("enablerowtracking", _) =>
          throw new IllegalArgumentException(
            s"TBLPROPERTIES '$k0'='$v': the opt-in is one-way — " +
              "allocated row-id ranges cannot be un-written")
        case _ =>
          throw new IllegalArgumentException(
            s"unsupported TBLPROPERTIES key '$k0' (supported: " +
              "enableDeletionVectors, enableChangeDataFeed, " +
              "schemaAutoMerge, autoCompact, enableRowTracking)")
      }
    }
    Seq.empty
  }
}

/** CREATE TABLE <new> SHALLOW CLONE <lake view> LOCATION '<path>' —
  * Delta's zero-copy fork from SQL: [[GraftLake.shallowClone]]'s
  * by-reference commit (constraints, rename lineage, and the
  * partition-layout marker copy; the source gets a vacuum fence),
  * then the clone registers under the new name with the source's
  * stats column, so SQL reads/DML work on it immediately.
  */
final case class GraftLakeCloneCommand(
    srcPath: String, dstPath: String, dstName: String, statsCol: String)
  extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    GraftLake.shallowClone(srcPath, dstPath)
    LakeSql.register(spark, dstPath, dstName, statsCol)
    Seq.empty
  }
}

/** CONVERT TO GRAFTLAKE '<dir>' [AS <name>] [STATSCOL '<col>'] —
  * adopt a plain parquet directory as a lake table IN PLACE
  * ([[GraftLake.convert]]'s zero-copy move); `AS <name>` registers
  * the converted table for SQL (statsCol defaults to the recorded
  * zone-map column, else the first column).
  */
final case class GraftLakeConvertCommand(
    dir: String, name: Option[String], statsCol: Option[String])
  extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    LakeSql.refuseInTxn(s"CONVERT TO GRAFTLAKE '$dir'")
    GraftLake.convert(spark, dir, statsCol)
    name.foreach { n =>
      val sc = statsCol.getOrElse(GraftLake.read(spark, dir).columns.head)
      LakeSql.register(spark, dir, n, sc)
    }
    Seq.empty
  }
}

/** BEGIN TRANSACTION / COMMIT / ROLLBACK — the SQL surface of
  * [[GraftLake.appendAtomic]] (see [[LakeSql.txnBegin]]).
  */
final case class GraftLakeTxnCommand(verb: String)
  extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    verb match {
      case "begin" => LakeSql.txnBegin()
      case "commit" => LakeSql.txnCommit(spark)
      case "rollback" => LakeSql.txnRollback()
    }
    Seq.empty
  }
}

/** CONVERT FROM DELTA '<deltaDir>' TO GRAFTLAKE '<graftDir>'
  * [AS <name>] [STATSCOL '<col>'] — the SQL surface of
  * [[DeltaImport.importDelta]] (Delta's `CONVERT TO DELTA`, pointed
  * the other way); `AS <name>` registers the imported table for DML.
  */
final case class GraftDeltaImportCommand(
    deltaDir: String, graftDir: String, name: Option[String],
    statsCol: Option[String])
  extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    LakeSql.refuseInTxn(s"CONVERT FROM DELTA '$deltaDir'")
    DeltaImport.importDelta(spark, deltaDir, graftDir,
      statsCols = statsCol.toSeq)
    name.foreach { n =>
      val sc = statsCol.getOrElse(
        GraftLake.read(spark, graftDir).columns.head)
      LakeSql.register(spark, graftDir, n, sc)
    }
    Seq.empty
  }
}

/** CONVERT TO DELTA '<deltaDir>' FROM <registered lake name> — the
  * SQL surface of [[DeltaExport.exportDelta]]: the table's current
  * snapshot lands as a self-contained Delta table at `deltaDir`.
  */
final case class GraftDeltaExportCommand(path: String, deltaDir: String)
  extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    LakeSql.refuseInTxn(s"CONVERT TO DELTA '$deltaDir'")
    DeltaExport.exportDelta(spark, path, deltaDir)
    Seq.empty
  }
}

/** CONVERT FROM ICEBERG '<tableDir>' TO GRAFTLAKE '<graftDir>'
  * [AS <name>] [STATSCOL '<col>'] — the SQL surface of
  * [[IcebergImport.importIceberg]]: the current Iceberg snapshot
  * (v1/v2, position deletes applied) lands as a NEW graft table,
  * optionally registered DML-capable.
  */
final case class GraftIcebergImportCommand(
    icebergDir: String, graftDir: String,
    name: Option[String], statsCol: Option[String])
  extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    LakeSql.refuseInTxn(s"CONVERT FROM ICEBERG '$icebergDir'")
    IcebergImport.importIceberg(spark, icebergDir, graftDir,
      statsCols = statsCol.toSeq)
    name.foreach { n =>
      val sc = statsCol.getOrElse(
        GraftLake.read(spark, graftDir).columns.head)
      LakeSql.register(spark, graftDir, n, sc)
    }
    Seq.empty
  }
}

/** CONVERT TO ICEBERG '<tableDir>' FROM <registered lake name> — the
  * SQL surface of [[IcebergExport.exportIceberg]]: the table's
  * VISIBLE rows (MoR state materialized through the read path, the
  * DeltaExport posture) land as a self-contained single-snapshot
  * Iceberg v2 table.
  */
final case class GraftIcebergExportCommand(path: String, icebergDir: String)
  extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    LakeSql.refuseInTxn(s"CONVERT TO ICEBERG '$icebergDir'")
    IcebergExport.exportIceberg(GraftLake.read(spark, path), icebergDir)
    Seq.empty
  }
}

/** Parser wrapper for lake DDL: `ALTER TABLE <registered lake name>
  * RENAME COLUMN old TO new` is substituted RIGHT AFTER PARSING with
  * the runnable rename command — the analyzer's ResolveRelations
  * rejects ALTER TABLE on views before any injected resolution rule
  * runs, so (unlike MERGE/DELETE) this statement cannot be routed at
  * resolution time. Everything else delegates verbatim.
  */
final class LakeDdlParser(
    delegate: org.apache.spark.sql.catalyst.parser.ParserInterface)
  extends org.apache.spark.sql.catalyst.parser.ParserInterface {

  // RESTORE TABLE <name> TO VERSION AS OF <n> — not Spark grammar at
  // all (Delta ships it in its own parser extension), so the wrapper
  // recognizes the statement BEFORE delegating; unregistered names
  // fall through to Spark's parser for its native error.
  private val RestoreRe =
    """(?is)\s*RESTORE\s+TABLE\s+([\w.]+)\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*""".r
  // RESTORE ... TO TIMESTAMP AS OF <epoch-millis | 'yyyy-MM-dd HH:mm:ss[.fff]'>
  private val RestoreTsRe =
    """(?is)\s*RESTORE\s+TABLE\s+([\w.]+)\s+TO\s+TIMESTAMP\s+AS\s+OF\s+(?:'([^']+)'|(\d+))\s*;?\s*""".r
  private val HistoryRe =
    """(?is)\s*DESCRIBE\s+HISTORY\s+([\w.]+)\s*;?\s*""".r
  private val DetailRe =
    """(?is)\s*DESCRIBE\s+DETAIL\s+([\w.]+)\s*;?\s*""".r
  private val ShowPropsRe =
    """(?is)\s*SHOW\s+TBLPROPERTIES\s+([\w.]+)\s*;?\s*""".r
  // VACUUM / OPTIMIZE are Delta grammar, not Spark's — pre-parse
  // intercepts, same posture as RESTORE.
  private val VacuumRe =
    """(?is)\s*VACUUM\s+([\w.]+)(?:\s+RETAIN\s+(\d+)\s+HOURS)?(\s+DRY\s+RUN)?\s*;?\s*""".r
  private val OptimizeRe =
    """(?is)\s*OPTIMIZE\s+([\w.]+)(?:\s+WHERE\s+(.+?))?(?:\s+ZORDER\s+BY\s*\(\s*(\w+)\s*,\s*(\w+)\s*\))?\s*;?\s*""".r
  // ALTER TABLE <lake> SET TBLPROPERTIES ('k'='v', ...) — Spark's
  // grammar parses it but the analyzer rejects it on views, so the
  // wrapper intercepts registered lake names pre-parse (same posture
  // as RENAME COLUMN). Delta-prefixed keys are accepted verbatim.
  private val SetPropsRe =
    """(?is)\s*ALTER\s+TABLE\s+([\w.]+)\s+SET\s+TBLPROPERTIES\s*\(\s*(.+?)\s*\)\s*;?\s*""".r
  // CREATE TABLE <new> SHALLOW CLONE <lake> LOCATION '<path>' —
  // Delta's zero-copy fork as SQL. LOCATION is required: the clone
  // is a new lake table and needs a filesystem home.
  private val CloneRe =
    """(?is)\s*CREATE\s+TABLE\s+([\w.]+)\s+SHALLOW\s+CLONE\s+([\w.]+)(?:\s+LOCATION\s+'([^']+)')?\s*;?\s*""".r
  // CONVERT TO GRAFTLAKE '<dir>' [AS <name>] [STATSCOL '<col>'] —
  // Delta's CONVERT TO DELTA: adopt a plain parquet directory in
  // place (zero-copy move into the first file-set).
  private val ConvertRe =
    """(?is)\s*CONVERT\s+TO\s+GRAFTLAKE\s+'([^']+)'(?:\s+AS\s+([\w.]+))?(?:\s+STATSCOL\s+'(\w+)')?\s*;?\s*""".r
  // COPY INTO <lake> FROM '<dir>' [FILEFORMAT = fmt]
  // [FORMAT_OPTIONS('k'='v', ...)] — Delta's batch-ingest grammar.
  private val CopyIntoRe =
    ("""(?is)\s*COPY\s+INTO\s+([\w.]+)\s+FROM\s+'([^']+)'""" +
      """(?:\s+FILEFORMAT\s*=\s*(\w+))?""" +
      """(?:\s+FORMAT_OPTIONS\s*\(\s*(.+?)\s*\))?\s*;?\s*""").r
  // BEGIN TRANSACTION / COMMIT / ROLLBACK — Spark has no transaction
  // grammar at all, so the pre-parse intercept is unambiguous.
  private val BeginTxnRe = """(?is)\s*BEGIN\s+TRANSACTION\s*;?\s*""".r
  private val CommitTxnRe = """(?is)\s*COMMIT(?:\s+TRANSACTION)?\s*;?\s*""".r
  private val RollbackTxnRe = """(?is)\s*ROLLBACK(?:\s+TRANSACTION)?\s*;?\s*""".r
  // Delta interop: CONVERT FROM DELTA (import) / CONVERT TO DELTA
  // (export) — Delta's own CONVERT grammar family.
  private val ConvertFromDeltaRe =
    ("""(?is)\s*CONVERT\s+FROM\s+DELTA\s+'([^']+)'\s+TO\s+GRAFTLAKE\s+""" +
      """'([^']+)'(?:\s+AS\s+([\w.]+))?(?:\s+STATSCOL\s+'(\w+)')?\s*;?\s*""").r
  private val ConvertToDeltaRe =
    """(?is)\s*CONVERT\s+TO\s+DELTA\s+'([^']+)'\s+FROM\s+([\w.]+)\s*;?\s*""".r
  // Iceberg interop: the same CONVERT grammar family, other format.
  private val ConvertFromIcebergRe =
    ("""(?is)\s*CONVERT\s+FROM\s+ICEBERG\s+'([^']+)'\s+TO\s+GRAFTLAKE\s+""" +
      """'([^']+)'(?:\s+AS\s+([\w.]+))?(?:\s+STATSCOL\s+'(\w+)')?\s*;?\s*""").r
  private val ConvertToIcebergRe =
    """(?is)\s*CONVERT\s+TO\s+ICEBERG\s+'([^']+)'\s+FROM\s+([\w.]+)\s*;?\s*""".r

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case BeginTxnRe() => GraftLakeTxnCommand("begin")
    case CommitTxnRe() => GraftLakeTxnCommand("commit")
    case RollbackTxnRe() => GraftLakeTxnCommand("rollback")
    case ConvertFromDeltaRe(deltaDir, graftDir, name, statsCol) =>
      GraftDeltaImportCommand(deltaDir, graftDir,
        Option(name), Option(statsCol))
    case ConvertToDeltaRe(deltaDir, srcName)
        if LakeSql.lookup(srcName).isDefined =>
      GraftDeltaExportCommand(LakeSql.lookup(srcName).get.path, deltaDir)
    case ConvertFromIcebergRe(iceDir, graftDir, name, statsCol) =>
      GraftIcebergImportCommand(iceDir, graftDir,
        Option(name), Option(statsCol))
    case ConvertToIcebergRe(iceDir, srcName)
        if LakeSql.lookup(srcName).isDefined =>
      GraftIcebergExportCommand(LakeSql.lookup(srcName).get.path, iceDir)
    case RestoreRe(name, ver) if LakeSql.lookup(name).isDefined =>
      GraftLakeRestoreCommand(LakeSql.lookup(name).get.path, ver.toInt)
    case RestoreTsRe(name, tsLit, tsNum) if LakeSql.lookup(name).isDefined =>
      val millis =
        if (tsNum != null) tsNum.toLong
        else java.sql.Timestamp.valueOf(tsLit).getTime
      GraftLakeRestoreTsCommand(LakeSql.lookup(name).get.path, millis)
    case HistoryRe(name) if LakeSql.lookup(name).isDefined =>
      GraftLakeHistoryCommand(LakeSql.lookup(name).get.path)
    case DetailRe(name) if LakeSql.lookup(name).isDefined =>
      GraftLakeDetailCommand(LakeSql.lookup(name).get.path)
    case ShowPropsRe(name) if LakeSql.lookup(name).isDefined =>
      GraftLakeShowPropsCommand(LakeSql.lookup(name).get.path)
    // Bare `VACUUM t` retains 7 days — Delta's default, so nobody
    // expecting Delta semantics silently destroys time travel. An
    // explicit `RETAIN n HOURS` (including 0) is honored verbatim.
    // `DRY RUN` lists the would-be-reclaimed sets, deletes nothing.
    case VacuumRe(name, hours, dry) if LakeSql.lookup(name).isDefined =>
      GraftLakeVacuumCommand(LakeSql.lookup(name).get.path,
        Option(hours).map(_.toLong * 3600L * 1000L)
          .getOrElse(168L * 3600L * 1000L),
        dryRun = dry != null)
    case OptimizeRe(name, where, za, zb) if LakeSql.lookup(name).isDefined =>
      val t = LakeSql.lookup(name).get
      GraftLakeOptimizeCommand(t.path, name,
        (Option(za), Option(zb)) match {
          case (Some(a), Some(b)) => Some((a, b))
          case _ => None
        }, t.statsCol, where = Option(where))
    case SetPropsRe(name, props) if LakeSql.lookup(name).isDefined =>
      val PropRe = """'([^']+)'\s*=\s*'([^']*)'""".r
      GraftLakeSetPropsCommand(LakeSql.lookup(name).get.path,
        PropRe.findAllMatchIn(props)
          .map(m => (m.group(1), m.group(2))).toSeq)
    case CloneRe(dstName, srcName, loc) if LakeSql.lookup(srcName).isDefined =>
      require(loc != null,
        s"CREATE TABLE $dstName SHALLOW CLONE $srcName needs " +
          "LOCATION '<path>' — the clone is a new lake table")
      val t = LakeSql.lookup(srcName).get
      GraftLakeCloneCommand(t.path, loc, dstName, t.statsCol)
    case ConvertRe(dir, name, statsCol) =>
      GraftLakeConvertCommand(dir, Option(name), Option(statsCol))
    case CopyIntoRe(name, dir, fmt, opts) if LakeSql.lookup(name).isDefined =>
      val t = LakeSql.lookup(name).get
      val PropRe = """'([^']+)'\s*=\s*'([^']*)'""".r
      GraftLakeCopyIntoCommand(t.path, name, dir,
        Option(fmt).getOrElse("parquet"),
        Option(opts).toSeq.flatMap(o =>
          PropRe.findAllMatchIn(o).map(m => (m.group(1), m.group(2))).toSeq),
        t.statsCol)
    case _ => parsePlanDelegated(sqlText)
  }

  private def parsePlanDelegated(sqlText: String): LogicalPlan =
    delegate.parsePlan(sqlText) match {
      // ALTER TABLE <lake> DROP COLUMN c — same parse-time routing as
      // RENAME (the analyzer rejects ALTER on views first otherwise).
      case d: org.apache.spark.sql.catalyst.plans.logical.DropColumns =>
        LakeSql.targetName(d.table) match {
          case Some(name) =>
            val t = LakeSql.lookup(name).get
            require(d.columnsToDrop.size == 1 &&
              d.columnsToDrop.head.name.length == 1,
              "ALTER TABLE <graft lake> DROP COLUMN: one top-level " +
                "column at a time")
            val cn = d.columnsToDrop.head.name.head
            require(!cn.equalsIgnoreCase(t.statsCol),
              s"ALTER TABLE $name DROP COLUMN: '${t.statsCol}' is the " +
                "registered merge-pruning column — re-register the table " +
                "with a new statsCol first")
            GraftLakeDropColumnCommand(t.path, name, cn)
          case None => d
        }
      // ALTER TABLE <lake> ADD COLUMNS (c type, ...) — the zero-data
      // metadata evolve; parse-time routing like RENAME/DROP.
      case a: org.apache.spark.sql.catalyst.plans.logical.AddColumns =>
        LakeSql.targetName(a.table) match {
          case Some(name) =>
            val t = LakeSql.lookup(name).get
            val cols = a.columnsToAdd.map { q =>
              require(q.path.isEmpty,
                s"ALTER TABLE $name ADD COLUMNS: nested fields are not " +
                  "supported — add a top-level column")
              require(q.position.isEmpty,
                s"ALTER TABLE $name ADD COLUMNS: FIRST/AFTER positions " +
                  "are not supported — columns append at the end")
              require(q.default.isEmpty,
                s"ALTER TABLE $name ADD COLUMNS: DEFAULT values are not " +
                  "supported — new columns null-fill")
              q.colName -> q.dataType
            }
            GraftLakeAddColumnsCommand(t.path, name, cols)
          case None => a
        }
      // ALTER TABLE <lake> ADD CONSTRAINT n CHECK (p) / DROP
      // CONSTRAINT n — route onto the lake's crc-sealed rule commits.
      // The CHECK form parses as AddCheckConstraint whose child is a
      // Filter(NOT p) over the target relation — the table name is
      // the CheckConstraint's own tableName field.
      case ac: org.apache.spark.sql.catalyst.plans.logical.AddCheckConstraint
          if LakeSql.lookup(ac.checkConstraint.tableName).isDefined =>
        val cc = ac.checkConstraint
        GraftLakeAddConstraintCommand(
          LakeSql.lookup(cc.tableName).get.path,
          cc.userProvidedName, cc.condition)
      case dc: org.apache.spark.sql.catalyst.plans.logical.DropConstraint =>
        LakeSql.targetName(dc.table) match {
          case Some(name) =>
            val t = LakeSql.lookup(name).get
            GraftLakeDropConstraintCommand(t.path, dc.name, dc.ifExists)
          case None => dc
        }
      case r: org.apache.spark.sql.catalyst.plans.logical.RenameColumn =>
        LakeSql.targetName(r.table) match {
          case Some(name) =>
            val t = LakeSql.lookup(name).get
            require(r.column.name.length == 1,
              "ALTER TABLE <graft lake> RENAME COLUMN: nested fields are " +
                "not supported — rename a top-level column")
            // Renaming the registered merge-pruning column would
            // silently degrade every later SQL MERGE to a full
            // rewrite — refuse until the table is re-registered.
            require(!r.column.name.head.equalsIgnoreCase(t.statsCol),
              s"ALTER TABLE $name RENAME COLUMN: '${t.statsCol}' is the " +
                "registered merge-pruning column — re-register the table " +
                "with a new statsCol first")
            GraftLakeRenameCommand(t.path, name, r.column.name.head, r.newName)
          case None => r
        }
      // VERSION AS OF / TIMESTAMP AS OF over registered lake names —
      // also a parse-time substitution (ResolveRelations throws on
      // temp-view time travel before resolution rules run).
      case other => LakeTimeTravel.splice(other) match {
        // INSERT INTO / INSERT OVERWRITE a registered lake name:
        // parse-time routing (the analyzer rejects inserts into temp
        // views before any injected resolution rule runs). The query
        // child has already been time-travel-spliced above, so
        // `INSERT INTO t SELECT ... FROM t VERSION AS OF 0` composes.
        case ins: org.apache.spark.sql.catalyst.plans.logical.InsertIntoStatement
            if LakeSql.targetName(ins.table).isDefined =>
          val name = LakeSql.targetName(ins.table).get
          val t = LakeSql.lookup(name).get
          require(!ins.ifPartitionNotExists,
            s"INSERT INTO $name: IF NOT EXISTS partition clauses are " +
              "not supported on a graft lake")
          GraftLakeInsertCommand(t.path, name, ins.query, ins.overwrite,
            ins.userSpecifiedCols, t.statsCol,
            ins.partitionSpec.toSeq.map { case (k, v) => (k, v) })
        // CREATE TABLE <name> USING graftlake LOCATION '<p>' AS SELECT:
        // a brand-new lake table from SQL (the name is by definition
        // not registered yet, so the provider is the routing signal).
        case cta: org.apache.spark.sql.catalyst.plans.logical.CreateTableAsSelect
            if cta.tableSpec.isInstanceOf[
              org.apache.spark.sql.catalyst.plans.logical.UnresolvedTableSpec] &&
              cta.tableSpec.asInstanceOf[
                org.apache.spark.sql.catalyst.plans.logical.UnresolvedTableSpec]
                .provider.exists(_.equalsIgnoreCase("graftlake")) =>
          val spec = cta.tableSpec.asInstanceOf[
            org.apache.spark.sql.catalyst.plans.logical.UnresolvedTableSpec]
          val name = cta.name match {
            case u: org.apache.spark.sql.catalyst.analysis.UnresolvedIdentifier =>
              u.nameParts.mkString(".")
            case other => throw new IllegalArgumentException(
              s"CREATE TABLE ... USING graftlake: unsupported name plan $other")
          }
          val loc = spec.location.getOrElse(throw new IllegalArgumentException(
            s"CREATE TABLE $name USING graftlake needs LOCATION '<path>' " +
              "— the lake is path-addressed"))
          // PARTITIONED BY (c1[, c2, ...]): identity layout tuple —
          // one file-set per value combination, exact manifest zone
          // maps on every column (the appendPartitionedBy layout,
          // reachable from pure SQL). Order is the layout order.
          val partCols = cta.partitioning.toSeq.map {
            case t if t.name == "identity" && t.references.length == 1 =>
              t.references.head.fieldNames.mkString(".")
            case other => throw new IllegalArgumentException(
              s"CREATE TABLE $name USING graftlake: only identity " +
                s"PARTITIONED BY columns are supported, got $other")
          }
          val statsCol = spec.properties.collectFirst {
            case (k, v) if k.equalsIgnoreCase("statscol") => v
          }
          GraftLakeCtasCommand(loc, name, cta.query, statsCol,
            cta.ignoreIfExists, partCols)
        // CREATE TABLE <name> (col defs) USING graftlake LOCATION:
        // the EMPTY column-list create — one zero-data commit.
        case ct: org.apache.spark.sql.catalyst.plans.logical.CreateTable
            if ct.tableSpec.isInstanceOf[
              org.apache.spark.sql.catalyst.plans.logical.UnresolvedTableSpec] &&
              ct.tableSpec.asInstanceOf[
                org.apache.spark.sql.catalyst.plans.logical.UnresolvedTableSpec]
                .provider.exists(_.equalsIgnoreCase("graftlake")) =>
          val spec = ct.tableSpec.asInstanceOf[
            org.apache.spark.sql.catalyst.plans.logical.UnresolvedTableSpec]
          val name = ct.name match {
            case u: org.apache.spark.sql.catalyst.analysis.UnresolvedIdentifier =>
              u.nameParts.mkString(".")
            case other => throw new IllegalArgumentException(
              s"CREATE TABLE ... USING graftlake: unsupported name plan $other")
          }
          val loc = spec.location.getOrElse(throw new IllegalArgumentException(
            s"CREATE TABLE $name USING graftlake needs LOCATION '<path>' " +
              "— the lake is path-addressed"))
          require(ct.columns.nonEmpty,
            s"CREATE TABLE $name USING graftlake: declare at least one column")
          // DEFAULT, GENERATED, and IDENTITY clauses are recorded as
          // sealed `coldef` log entries the INSERT/COPY routes
          // consult; IDENTITY allocation rides the row-tracking high
          // water (enabled at create).
          val defaults = ct.columns.toSeq.flatMap(c =>
            c.defaultValue.map(d => c.name -> d.originalSQL))
          val generated = ct.columns.toSeq.flatMap(c =>
            c.generationExpression.map(g => c.name -> g))
          val identity = ct.columns.toSeq.flatMap(c =>
            c.identityColumnSpec.map(i =>
              c.name -> (i.getStart, i.getStep)))
          // GENERATED BY DEFAULT AS IDENTITY: explicit inserts allowed,
          // high water advances past supplied maxima (Delta semantics).
          val identityDefault: Set[String] = ct.columns.toSeq.flatMap(c =>
            c.identityColumnSpec.filter(_.isAllowExplicitInsert)
              .map(_ => c.name)).toSet
          val schema = org.apache.spark.sql.types.StructType(ct.columns.map(c =>
            org.apache.spark.sql.types.StructField(c.name, c.dataType, c.nullable)))
          val partCols = ct.partitioning.toSeq.map {
            case t if t.name == "identity" && t.references.length == 1 =>
              t.references.head.fieldNames.mkString(".")
            case other => throw new IllegalArgumentException(
              s"CREATE TABLE $name USING graftlake: only identity " +
                s"PARTITIONED BY columns are supported, got $other")
          }
          val statsCol = spec.properties.collectFirst {
            case (k, v) if k.equalsIgnoreCase("statscol") => v
          }
          GraftLakeCreateEmptyCommand(loc, name, schema, statsCol, partCols,
            ct.ignoreIfExists, defaults, generated, identity,
            identityDefault)
        // TRUNCATE TABLE <lake view> — O(1) by-reference removal.
        case tt: org.apache.spark.sql.catalyst.plans.logical.TruncateTable
            if LakeSql.targetName(tt.table).isDefined =>
          val name = LakeSql.targetName(tt.table).get
          GraftLakeTruncateCommand(LakeSql.lookup(name).get.path, name)
        case spliced => spliced
      }
    }
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String) =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String) =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String) =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String) =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String) =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String) =
    delegate.parseDataType(sqlText)
}

/** The resolution rule: rewrite parsed DML over registered lake names
  * into the runnable commands above. Unregistered targets pass
  * through untouched (normal v2 analysis handles or rejects them).
  */
/** Time-travel splice for registered lake names, applied AT PARSE
  * TIME (like the RENAME interception): the analyzer's
  * ResolveRelations throws UNSUPPORTED_FEATURE.TIME_TRAVEL on a temp
  * view BEFORE any injected resolution rule can run, so
  * `RelationTimeTravel` over a lake name must be substituted with the
  * analyzed plan of the lake's own [[GraftLake.readAt]] /
  * [[GraftLake.readAsOf]] straight out of the parser — SQL time
  * travel IS the Scala API's read, one code path, like the DML
  * routing.
  */
object LakeTimeTravel {

  def splice(plan: LogicalPlan): LogicalPlan =
    plan.transformUp {
      // table_changes('<lake name>', <fromVersion>) — Delta's CDF
      // table-valued function: splice the analyzed plan of
      // [[GraftLake.changesTyped]] so SQL reads the typed feed
      // (`SELECT * FROM table_changes('t', 2) WHERE _change_type =
      // 'delete'`). Unregistered names / other TVFs pass through to
      // Spark's own resolution.
      case tvf: org.apache.spark.sql.catalyst.analysis.UnresolvedTableValuedFunction
          if tvf.name.map(_.toLowerCase(java.util.Locale.ROOT)) ==
            Seq("table_changes") &&
            tvf.functionArgs.size == 2 =>
        import org.apache.spark.sql.catalyst.expressions.Literal
        (tvf.functionArgs.head, tvf.functionArgs(1)) match {
          case (Literal(n: org.apache.spark.unsafe.types.UTF8String, _),
              Literal(v, _)) if LakeSql.lookup(n.toString).isDefined =>
            val t = LakeSql.lookup(n.toString).get
            val from = v match {
              case i: Int => i
              case l: Long => l.toInt
              case other => throw new IllegalArgumentException(
                s"table_changes: fromVersion must be an integer, got $other")
            }
            val df = GraftLake.changesTyped(SparkSession.active, t.path, from)
            SubqueryAlias("table_changes",
              org.apache.spark.sql.GraftSqlBridge.planOf(df))
          case _ => tvf
        }
      // table_rowids('<lake name>') — the row-tracking read as a
      // table-valued function: splice [[GraftLake.readWithRowIds]]'s
      // plan so SQL sees `_row_id` (`SELECT _row_id, * FROM
      // table_rowids('t') WHERE ...`).
      case tvf: org.apache.spark.sql.catalyst.analysis.UnresolvedTableValuedFunction
          if tvf.name.map(_.toLowerCase(java.util.Locale.ROOT)) ==
            Seq("table_rowids") &&
            tvf.functionArgs.size == 1 =>
        import org.apache.spark.sql.catalyst.expressions.Literal
        tvf.functionArgs.head match {
          case Literal(n: org.apache.spark.unsafe.types.UTF8String, _)
              if LakeSql.lookup(n.toString).isDefined =>
            val t = LakeSql.lookup(n.toString).get
            val df = GraftLake.readWithRowIds(SparkSession.active, t.path)
            SubqueryAlias("table_rowids",
              org.apache.spark.sql.GraftSqlBridge.planOf(df))
          case _ => tvf
        }
      case tt: org.apache.spark.sql.catalyst.analysis.RelationTimeTravel =>
        LakeSql.targetName(tt.relation) match {
          case Some(name) =>
            val t = LakeSql.lookup(name).get
            val spark = SparkSession.active
            val df = (tt.version, tt.timestamp) match {
              case (Some(v), None) =>
                val ver =
                  try v.toInt
                  catch { case _: NumberFormatException =>
                    throw new IllegalArgumentException(
                      s"VERSION AS OF on lake table $name requires an " +
                        s"integer version, got '$v'") }
                GraftLake.readAt(spark, t.path, ver)
              case (None, Some(ts)) =>
                GraftLake.readAsOf(spark, t.path, evalTsMillis(name, ts))
              case _ => throw new IllegalArgumentException(
                s"time travel on lake table $name needs exactly one of " +
                  "VERSION AS OF / TIMESTAMP AS OF")
            }
            SubqueryAlias(name, org.apache.spark.sql.GraftSqlBridge.planOf(df))
          case None => tt
        }
    }

  /** A `TIMESTAMP AS OF` operand to epoch millis: a numeric literal
    * is millis verbatim; a string literal parses as an instant or as
    * UTC `yyyy-MM-dd[ HH:mm:ss]` — evaluated at plan time, like the
    * v2 time-travel spec resolution does.
    */
  private def evalTsMillis(name: String, e: Expression): Long = {
    val v = try e.eval(null) catch { case _: Exception =>
      throw new IllegalArgumentException(
        s"TIMESTAMP AS OF on lake table $name: cannot evaluate " +
          s"'${e.sql}' at plan time — use a literal") }
    v match {
      case l: Long => l
      case i: Int => i.toLong
      case s: org.apache.spark.unsafe.types.UTF8String =>
        val str = s.toString.trim
        try {
          if (str.forall(_.isDigit)) str.toLong
          else if (str.contains("T")) java.time.Instant.parse(str).toEpochMilli
          else {
            val full = if (str.contains(":")) str else str + " 00:00:00"
            java.time.LocalDateTime.parse(full.replace(' ', 'T'))
              .toInstant(java.time.ZoneOffset.UTC).toEpochMilli
          }
        } catch { case _: java.time.format.DateTimeParseException =>
          throw new IllegalArgumentException(
            s"TIMESTAMP AS OF on lake table $name: unparseable timestamp " +
              s"'$str' — use epoch millis, ISO instant, or UTC " +
              "'yyyy-MM-dd[ HH:mm:ss]'") }
      case other => throw new IllegalArgumentException(
        s"TIMESTAMP AS OF on lake table $name: unsupported literal " +
          s"type ${if (other == null) "NULL" else other.getClass.getSimpleName}")
    }
  }
}

object LakeDmlRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case d: DeleteFromTable =>
      LakeSql.targetName(d.table) match {
        case Some(name) =>
          val t = LakeSql.lookup(name).get
          d.condition match {
            // DELETE ... WHERE col IN (subquery): route the subquery
            // as a distributed key delta, not a predicate.
            case org.apache.spark.sql.catalyst.expressions.InSubquery(
                Seq(v), lq) if LakeSql.leafName(v).isDefined =>
              GraftLakeDeleteInCommand(
                t.path, LakeSql.leafName(v).get, lq.plan, t.statsCol, name)
            case _ =>
              GraftLakeDeleteCommand(
                t.path, LakeSql.bareCondition(d.condition), t.statsCol, name)
          }
        case None => plan
      }
    case m: MergeIntoTable =>
      LakeSql.targetName(m.targetTable) match {
        case Some(name) =>
          val t = LakeSql.lookup(name).get
          // Keys first: a malformed ON clause is the more specific
          // error than a non-canonical action list.
          val keys = LakeSql.mergeKeys(m.mergeCondition)
          // Accept the star actions in BOTH shapes — as parsed
          // (UPDATE SET * / INSERT *) and as the analyzer's identity-
          // assignment expansion of them (which may land before this
          // rule in the fixed-point batch).
          val canonical =
            m.matchedActions.size == 1 &&
              LakeSql.isStarUpdate(m.matchedActions.head) &&
              m.notMatchedActions.size == 1 &&
              LakeSql.isStarInsert(m.notMatchedActions.head) &&
              m.notMatchedBySourceActions.isEmpty
          // The canonical upsert keeps its dedicated one-sided path
          // (no full-outer join); every other clause shape compiles
          // to the general mergeActions executor.
          if (canonical)
            GraftLakeMergeCommand(t.path, m.sourceTable, keys, t.statsCol)
          else
            GraftLakeMergeActionsCommand(t.path, name, m.sourceTable, keys,
              t.statsCol, LakeSql.compileMergeClauses(m, name))
        case None => plan
      }
    case u: UpdateTable =>
      LakeSql.targetName(u.table) match {
        case Some(name) =>
          val t = LakeSql.lookup(name).get
          val assigns = u.assignments.map { a =>
            val k = LakeSql.leafName(a.key).getOrElse(
              throw new IllegalArgumentException(
                s"UPDATE <graft lake>: unsupported assignment target " +
                  s"'${a.key.sql}' — assign to a top-level column"))
            k -> LakeSql.bareCondition(a.value)
          }
          val condSql = u.condition.map(LakeSql.bareCondition).getOrElse("true")
          GraftLakeUpdateCommand(t.path, condSql, assigns, t.statsCol)
        case None => plan
      }
    case _ => plan
  }
}
