package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 connector: deterministic synthetic rows, for testing
  * operators at arbitrary scale without files.
  *
  * `spark.read.format("graft-synth").option("rows", n)
  *   .option("partitions", p).load()`
  *
  * Scale surface demonstrated:
  *  - partition planning: the row range splits into `partitions`
  *    independent [start, end) slices, one task each — embarrassingly
  *    parallel across executors, no driver materialization;
  *  - column pruning: SupportsPushDownRequiredColumns — pruned columns
  *    are never computed (verify via ReadSchema in explain);
  *  - deterministic content: row i is a pure function of i, so any
  *    result is reproducible at any parallelism.
  */
class SynthSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-synth"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SynthSource.Schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SynthTable(
      properties.asScala.getOrElse("rows", "1000").toLong,
      properties.asScala.getOrElse("partitions", "8").toInt)
}

object SynthSource {
  val Schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("category", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  /** Deterministic per-row value (splitmix64-style finalizer). */
  def valueOf(i: Long): Double = {
    var z = i + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z = z ^ (z >>> 31)
    (z & 0xfffffffL).toDouble / 0xfffffffL.toDouble * 1000.0
  }

  def categoryOf(i: Long): String = s"cat_${i % 10}"

  /** Test observability: every runtime-narrowed [lo, hi) — runtime
    * filtering happens between planning and execution, so plan strings
    * can't show it. A concurrent queue, not a single slot: gate
    * queries run in parallel and concurrent scans must not clobber
    * each other's recording (bounded — narrowing events are rare).
    */
  val runtimeRanges = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
}

private[sources] class SynthTable(rows: Long, partitions: Int)
    extends Table with SupportsRead {
  override def name(): String = s"graft_synth($rows)"
  override def schema(): StructType = SynthSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SynthScanBuilder(rows, partitions)
}

/** Scan builder with the full V2 pushdown surface: column pruning +
  * id-range filter pushdown + COMPLETE aggregate pushdown. Pushed id
  * predicates narrow the generated [lo, hi) row range at PLANNING
  * time, so pruned rows are never produced — the synthetic analog of
  * parquet row-group skipping. Conjuncts arrive pre-split; the handled
  * shapes are exact, so they need no residual re-evaluation by Spark.
  *
  * Aggregate pushdown (SupportsPushDownAggregates): ungrouped
  * COUNT(*) / MIN(id) / MAX(id) resolve in CLOSED FORM from the
  * (already filter-narrowed) range — count = hi-lo, min = lo,
  * max = hi-1 — so the "scan" emits ONE row and never generates data
  * at all: the DSv2 analog of a parquet footer-stats-only query, the
  * difference between O(0) and a 100 TB scan for `SELECT count(*)`.
  * Anything else (grouping, other columns) is declined and Spark
  * falls back to the ordinary scan + aggregate.
  */
private[sources] class SynthScanBuilder(rows: Long, partitions: Int)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters
    with SupportsPushDownAggregates {
  private var required: StructType = SynthSource.Schema
  private var lo: Long = 0L
  private var hi: Long = rows // generated ids span [lo, hi)
  private var pushed: Array[Filter] = Array.empty
  private var aggDesc: Option[Seq[String]] = None // per-expr kind, in order

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  // Integral types only: a fractional comparison value (e.g. id < 5.5)
  // would truncate under longValue and wrongly drop boundary rows while
  // the filter is reported as fully handled. Non-integral values stay
  // residual so Spark re-evaluates them exactly.
  private def asLong(v: Any): Option[Long] = v match {
    case n: java.lang.Byte => Some(n.longValue)
    case n: java.lang.Short => Some(n.longValue)
    case n: java.lang.Integer => Some(n.longValue)
    case n: java.lang.Long => Some(n.longValue)
    case _ => None
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition {
      case IsNotNull("id") => true // non-nullable: vacuously true
      case GreaterThan("id", v) => asLong(v).isDefined
      case GreaterThanOrEqual("id", v) => asLong(v).isDefined
      case LessThan("id", v) => asLong(v).isDefined
      case LessThanOrEqual("id", v) => asLong(v).isDefined
      case EqualTo("id", v) => asLong(v).isDefined
      case _ => false
    }
    accepted.foreach {
      case GreaterThan("id", v) => lo = math.max(lo, asLong(v).get + 1)
      case GreaterThanOrEqual("id", v) => lo = math.max(lo, asLong(v).get)
      case LessThan("id", v) => hi = math.min(hi, asLong(v).get)
      case LessThanOrEqual("id", v) => hi = math.min(hi, asLong(v).get + 1)
      case EqualTo("id", v) =>
        lo = math.max(lo, asLong(v).get); hi = math.min(hi, asLong(v).get + 1)
      case _ => ()
    }
    pushed = accepted
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  private def classify(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Option[Seq[String]] = {
    import org.apache.spark.sql.connector.expressions.aggregate.{Count, CountStar, Max, Min}
    import org.apache.spark.sql.connector.expressions.NamedReference
    def isId(e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
      e match {
        case f: NamedReference => f.fieldNames.toSeq == Seq("id")
        case _ => false
      }
    if (agg.groupByExpressions.nonEmpty) return None
    val kinds = agg.aggregateExpressions.toSeq.map {
      case _: CountStar => Some("count_star")
      case c: Count if isId(c.column) && !c.isDistinct => Some("count_id")
      case m: Min if isId(m.column) => Some("min_id")
      case m: Max if isId(m.column) => Some("max_id")
      case _ => None
    }
    if (kinds.forall(_.isDefined)) Some(kinds.flatten) else None
  }

  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    classify(agg).isDefined

  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    classify(agg) match {
      case Some(kinds) => aggDesc = Some(kinds); true
      case None => false
    }

  override def build(): Scan = aggDesc match {
    case Some(kinds) =>
      new SynthAggScan(lo, math.max(lo, hi), kinds, pushed)
    case None =>
      new SynthScan(lo, math.max(lo, hi), partitions, required, pushed)
  }
}

/** Planning-time-resolved aggregate "scan": one row, zero data
  * generated. min/max are NULL over an empty range, like SQL.
  */
private[sources] class SynthAggScan(
    lo: Long, hi: Long, kinds: Seq[String], pushed: Array[Filter])
    extends Scan with Batch {
  override def readSchema(): StructType = StructType(kinds.map {
    case "count_star" => StructField("count_star", LongType, nullable = false)
    case "count_id" => StructField("count_id", LongType, nullable = false)
    case "min_id" => StructField("min_id", LongType, nullable = true)
    case "max_id" => StructField("max_id", LongType, nullable = true)
  })
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-synth [$lo, $hi) PushedAggregation: [${kinds.mkString(", ")}] " +
      s"PushedFilters: [${pushed.mkString(", ")}]"
  override def planInputPartitions(): Array[InputPartition] =
    Array(SynthRange(lo, hi))
  override def createReaderFactory(): PartitionReaderFactory = {
    val ks = kinds
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
        val SynthRange(start, end) = p.asInstanceOf[SynthRange]
        val n = math.max(0L, end - start)
        val values: Array[Any] = ks.map {
          case "count_star" | "count_id" => n.asInstanceOf[Any]
          case "min_id" => if (n == 0) null else start.asInstanceOf[Any]
          case "max_id" => if (n == 0) null else (end - 1).asInstanceOf[Any]
        }.toArray
        new PartitionReader[InternalRow] {
          private var emitted = false
          override def next(): Boolean = { val r = !emitted; emitted = true; r }
          override def get(): InternalRow = new GenericInternalRow(values)
          override def close(): Unit = ()
        }
      }
    }
  }
}

private[graft] case class SynthRange(start: Long, end: Long) extends InputPartition

private[sources] class SynthScan(
    lo: Long, hi: Long, partitions: Int, required: StructType,
    pushed: Array[Filter])
    extends Scan with Batch
    with SupportsRuntimeV2Filtering {
  // RUNTIME range, narrowed further by DPP-style runtime filters
  // (delivered AFTER planning, BEFORE partition enumeration).
  private var rLo: Long = lo
  private var rHi: Long = hi

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-synth [$lo, $hi) PushedFilters: [${pushed.mkString(", ")}]"

  /** Runtime filtering (the DSv2 analog of dynamic partition pruning):
    * Spark evaluates the other join side first and hands this scan an
    * IN(id, ...) predicate at RUNTIME; the generated range narrows to
    * the values' [min, max] span before partitions are enumerated.
    * Narrowing is sound regardless of gaps — the join itself still
    * applies exact semantics; the runtime filter only skips generation,
    * exactly as a file source skips partitions it can prove dead.
    */
  override def filterAttributes(): Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions.column("id"))

  override def filter(
      predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate]): Unit = {
    predicates.foreach { p =>
      if (p.name() == "IN") {
        // flatMap + catch-all: an unexpected literal type (decimal
        // cast, future int width) must DECLINE to narrow, not throw a
        // MatchError that fails the whole query — runtime narrowing is
        // an optimization, never a correctness dependency.
        val values = p.children().toSeq.flatMap {
          case l: org.apache.spark.sql.connector.expressions.Literal[_] =>
            l.value() match {
              case n: java.lang.Long => Some(n.longValue())
              case n: java.lang.Integer => Some(n.longValue())
              case _ => None
            }
          case _ => None
        }
        if (values.nonEmpty) {
          rLo = math.max(rLo, values.min)
          rHi = math.min(rHi, values.max + 1)
          SynthSource.runtimeRanges.add((rLo, math.max(rLo, rHi)))
        }
      }
    }
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val (l, h) = (rLo, math.max(rLo, rHi))
    val rows = h - l
    val per = math.max(1L, (rows + partitions - 1) / partitions)
    (l until h by per).map(s => SynthRange(s, math.min(s + per, h)))
      .toArray[InputPartition]
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SynthReaderFactory(required)
}

private[sources] class SynthReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val SynthRange(start, end) = partition.asInstanceOf[SynthRange]
    val fields = required.fieldNames
    new PartitionReader[InternalRow] {
      private var i = start - 1
      override def next(): Boolean = { i += 1; i < end }
      override def get(): InternalRow =
        new GenericInternalRow(fields.map {
          case "id" => i
          case "category" => UTF8String.fromString(SynthSource.categoryOf(i))
          case "value" => SynthSource.valueOf(i)
        }.asInstanceOf[Array[Any]])
      override def close(): Unit = ()
    }
  }
}
