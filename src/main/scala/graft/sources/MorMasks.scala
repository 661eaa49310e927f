package graft.sources

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.filter2.compat.FilterCompat
import org.apache.parquet.filter2.predicate.FilterApi
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.parquet.io.api.Binary
import org.apache.spark.sql.types._

/** TASK-SIDE merge-on-read sidecar loading for the DSv2 scans.
  *
  * The driver plans with sidecar DESCRIPTORS only — the set
  * directories holding positional deletion vectors and key
  * tombstones ([[GraftLake.loadScanMaskRefs]]) — and each partition
  * reader resolves its OWN file's masked positions here, executor
  * side (the Delta/Iceberg task-side DV shape). Driver state stays
  * O(outstanding sidecar sets), never O(deleted rows): a 100 TB
  * table with 10⁹ masked rows plans without materializing a single
  * position.
  *
  * Everything reads through parquet-hadoop's example API directly —
  * no SparkSession, callable from executors.
  */
private[sources] object MorMasks {

  private def parquetFiles(dir: String): Seq[java.nio.file.Path] = {
    val listing = Files.list(Paths.get(dir))
    try listing.iterator().asScala
      .filter { p =>
        val n = p.getFileName.toString
        n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith(".")
      }.toSeq.sortBy(_.getFileName.toString)
    finally listing.close()
  }

  /** Name of the per-sidecar target manifest: the distinct `__dv_set`
    * values of a positional-DV sidecar, written at COMMIT time (the
    * writer already knows them — collected via observe on the sidecar
    * write itself, zero extra passes). Readers consult it to skip
    * sidecars that cannot mask their file, collapsing the per-task
    * footer probing from O(all sidecar sets) to O(sidecars targeting
    * the own set); conflict probes ([[dvTargetSets]]) answer from it
    * without opening parquet rows at all.
    */
  private val TargetsManifest = "_dv_targets.json"

  def writeTargetsManifest(dir: String, targets: Seq[String]): Unit =
    Files.writeString(Paths.get(dir, TargetsManifest),
      targets.sorted.distinct
        .map(t => "\"" + t + "\"").mkString("[", ",", "]"))

  /** Cached manifest lookup: Some(targets) when the sidecar carries
    * one, None for legacy/key-tombstone sidecars (callers fall back
    * to probing). Sidecar sets are immutable once committed, so a
    * cache hit is always current; cleared wholesale past a small
    * bound (same posture as [[keyMask]]'s cache).
    */
  private val targetsCache =
    new java.util.concurrent.ConcurrentHashMap[String, Option[Set[String]]]()

  def targetsOf(dir: String): Option[Set[String]] = {
    val cached = targetsCache.get(dir)
    if (cached != null) return cached
    val p = Paths.get(dir, TargetsManifest)
    val r =
      if (!Files.exists(p)) None
      else {
        val body = Files.readString(p).trim.stripPrefix("[").stripSuffix("]")
        Some(
          if (body.isEmpty) Set.empty[String]
          else body.split(",").map(_.trim.stripPrefix("\"").stripSuffix("\"")).toSet)
      }
    if (targetsCache.size > 256) targetsCache.clear()
    targetsCache.put(dir, r)
    r
  }

  /** Positions masked for (`set`, `fileName`) across the DV sidecar
    * sets under `dvDirs`. Sidecars whose target manifest excludes
    * `set` are skipped without opening a single footer; for the rest,
    * row-group and dictionary statistics prune non-matching groups
    * via the pushed equality predicate, so a task touches O(its own
    * file's positions) of each relevant sidecar.
    */
  def dvPositions(dvDirs: Seq[String], set: String, fileName: String)
      : java.util.HashSet[Long] = {
    val out = new java.util.HashSet[Long]()
    if (dvDirs.isEmpty) return out
    val pred = FilterApi.and(
      FilterApi.eq(FilterApi.binaryColumn("__dv_set"),
        Binary.fromString(set)),
      FilterApi.eq(FilterApi.binaryColumn("__dv_file"),
        Binary.fromString(fileName)))
    dvDirs.filter(d => targetsOf(d).forall(_.contains(set))).foreach { dir =>
      parquetFiles(dir).foreach { f =>
        val reader = ParquetReader
          .builder(new GroupReadSupport(),
            new org.apache.hadoop.fs.Path(f.toString))
          .withConf(new Configuration())
          .withFilter(FilterCompat.get(pred))
          .build()
        try {
          var g = reader.read()
          while (g != null) {
            // The record-level filter already pinned set/file equality.
            val pi = g.getType.getFieldIndex("__dv_pos")
            out.add(g.getLong(pi, 0))
            g = reader.read()
          }
        } finally reader.close()
      }
    }
    out
  }

  /** Key-tombstone value set of one sidecar set directory, normalized
    * exactly like the plan-time loader used to (integral keys widen
    * to Long, strings stay String). Cached per directory: sidecar
    * sets are immutable once committed (mutations stage NEW sets),
    * so a cache hit is always current; the cache is cleared wholesale
    * past a small bound so long-lived executors reading many
    * short-lived tables stay flat.
    */
  private val keyCache =
    new java.util.concurrent.ConcurrentHashMap[String, (String, Set[Any])]()

  def keyMask(dir: String): (String, Set[Any]) = {
    val cached = keyCache.get(dir)
    if (cached != null) return cached
    val vals = scala.collection.mutable.HashSet[Any]()
    var colName: String = null
    parquetFiles(dir).foreach { f =>
      val reader = ParquetReader
        .builder(new GroupReadSupport(),
          new org.apache.hadoop.fs.Path(f.toString))
        .withConf(new Configuration())
        .build()
      try {
        var g = reader.read()
        while (g != null) {
          if (colName == null) colName = g.getType.getFieldName(0)
          if (g.getFieldRepetitionCount(0) > 0) {
            import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
            g.getType.getType(0).asPrimitiveType().getPrimitiveTypeName match {
              case INT64 => vals += g.getLong(0, 0)
              case INT32 => vals += g.getInteger(0, 0).toLong
              case BINARY => vals += g.getString(0, 0)
              case other => throw new IllegalStateException(
                s"unsupported key-tombstone physical type $other in $dir")
            }
          }
          g = reader.read()
        }
      } finally reader.close()
    }
    val r = (colName, vals.toSet)
    if (keyCache.size > 64) keyCache.clear()
    if (colName != null) keyCache.put(dir, r)
    r
  }

  /** The DISTINCT `__dv_set` values of one positional-DV sidecar set
    * — the file-sets its positions target. Served from the commit-time
    * target manifest when present (pure metadata, no parquet rows);
    * legacy sidecars fall back to an O(sidecar rows) read of tiny
    * files, no Spark job either way. Returns empty for key tombstones
    * (no `__dv_set` column). Used on commit conflict paths to decide
    * whether a pending mask pins a set being removed.
    */
  def dvTargetSets(dir: String): Set[String] = {
    targetsOf(dir).foreach(ts => return ts)
    val out = scala.collection.mutable.HashSet[String]()
    parquetFiles(dir).foreach { f =>
      val reader = ParquetReader
        .builder(new GroupReadSupport(),
          new org.apache.hadoop.fs.Path(f.toString))
        .withConf(new Configuration())
        .build()
      try {
        var g = reader.read()
        while (g != null) {
          if (!g.getType.containsField("__dv_set")) return Set.empty
          val i = g.getType.getFieldIndex("__dv_set")
          if (g.getFieldRepetitionCount(i) > 0) out += g.getString(i, 0)
          g = reader.read()
        }
      } finally reader.close()
    }
    out.toSet
  }

  /** Plan-time classification of one sidecar set: its column names
    * and the head column's Spark type, from ONE parquet footer — no
    * Spark job, no row read.
    */
  def sidecarShape(dir: String): (Seq[String], DataType) = {
    val f = parquetFiles(dir).headOption.getOrElse(
      throw new IllegalStateException(s"empty sidecar set at $dir"))
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(f.toString), new Configuration())
    val fr = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    val schema = try fr.getFileMetaData.getSchema finally fr.close()
    val names = schema.getFields.asScala.map(_.getName).toSeq
    val head = schema.getFields.get(0)
    import org.apache.parquet.schema.LogicalTypeAnnotation
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    val dt: DataType =
      if (!head.isPrimitive) BinaryType
      else {
        val ann = head.asPrimitiveType.getLogicalTypeAnnotation
        head.asPrimitiveType.getPrimitiveTypeName match {
          case INT32 => ann match {
            case _: LogicalTypeAnnotation.DateLogicalTypeAnnotation => DateType
            case i: LogicalTypeAnnotation.IntLogicalTypeAnnotation
                if i.getBitWidth == 8 => ByteType
            case i: LogicalTypeAnnotation.IntLogicalTypeAnnotation
                if i.getBitWidth == 16 => ShortType
            case _ => IntegerType
          }
          case INT64 => ann match {
            case _: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
              TimestampType
            case _ => LongType
          }
          case BINARY
              if ann.isInstanceOf[
                LogicalTypeAnnotation.StringLogicalTypeAnnotation] =>
            StringType
          case DOUBLE => DoubleType
          case FLOAT => FloatType
          case BOOLEAN => BooleanType
          case _ => BinaryType
        }
      }
    (names, dt)
  }
}
