package graft.sources.v2

import java.util

import graft.sources.Emd
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, UnsafeArrayData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter,
  GreaterThan, GreaterThanOrEqual, In, IsNotNull, LessThan, LessThanOrEqual,
  StringStartsWith}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 integration for EMD containers (SURVEY §2 H / §7 step 4's
  * "DataSource V2 later"): `spark.read.format("emd").load(dir)` yields the
  * engine's signal-table rows (FIXTURES F1 schema) — one input partition
  * per file, each parsed executor-locally by [[graft.sources.Emd]].
  *
  * Scale shape: file listing happens once at planning; Spark schedules one
  * partition per container, so a directory of thousands of acquisitions
  * parallelizes across the cluster with no driver-side parsing, and
  * column pruning works as usual above the scan.
  */
class EmdDataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "emd"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    EmdDataSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new EmdTable(properties.getOrDefault("path", ""))
}

object EmdDataSource {
  val Schema: StructType = StructType(Seq(
    StructField("experiment_id", StringType, nullable = false),
    StructField("path", StringType, nullable = false),
    StructField("signal_idx", IntegerType, nullable = false),
    StructField("title", StringType, nullable = false),
    StructField("ndim", IntegerType, nullable = false),
    StructField("shape", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("data", ArrayType(DoubleType, containsNull = false), nullable = false),
    StructField("metadata_json", StringType, nullable = false)))

  /** `.emd` files under `path` (a file or directory), deterministic order.
    * A path that does not exist fails BY NAME: the previous walk returned
    * an empty list for a typo'd (or non-local, e.g. hdfs://) path, and an
    * empty scan reads as "zero signals" — silent wrong results instead of
    * an error the user can act on.
    */
  def listFiles(path: String): Seq[String] = {
    val root = new java.io.File(path)
    if (!root.exists())
      throw new IllegalArgumentException(
        s"emd source: path does not exist on the local filesystem: $path")
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
      else if (f.getName.endsWith(".emd")) Seq(f)
      else Seq.empty
    walk(root).map(_.getAbsolutePath).sorted
  }
}

private class EmdTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"emd:$path"
  override def schema(): StructType = EmdDataSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val p = Option(options.get("path")).filter(_.nonEmpty).getOrElse(path)
    new EmdScanBuilder(EmdDataSource.listFiles(p))
  }
}

/** Pushdown support for the light (non-payload) columns. Three tiers, in
  * the order they pay off at scale:
  *   1. `experiment_id` predicates prune whole FILES at planning time —
  *      matching partitions are never scheduled (the custom-source analog
  *      of parquet partition pruning; the id is derivable from the
  *      filename without opening the container);
  *   2. row predicates on the metadata columns filter BEFORE row
  *      materialization, so non-matching signals never copy their `data`
  *      payload into an UnsafeArrayData;
  *   3. column pruning drops unrequested fields from the built row — a
  *      metadata-only query over a petabyte of containers materializes no
  *      payload arrays at all.
  * Filters are re-evaluated above the scan regardless (the parquet
  * discipline: pushdown is an optimization, never a correctness
  * dependency), so partial evaluation here is always safe.
  */
private object EmdPushdown {
  private val LightCols =
    Set("experiment_id", "path", "signal_idx", "title", "ndim")
  private val IntCols = Set("signal_idx", "ndim")

  def supported(f: Filter): Boolean = f match {
    case EqualTo(a, _)            => LightCols(a)
    case In(a, _)                 => LightCols(a)
    case IsNotNull(a)             => LightCols(a)
    case GreaterThan(a, _)        => IntCols(a)
    case GreaterThanOrEqual(a, _) => IntCols(a)
    case LessThan(a, _)           => IntCols(a)
    case LessThanOrEqual(a, _)    => IntCols(a)
    case StringStartsWith(a, _)   => a == "experiment_id" || a == "title" ||
                                     a == "path"
    case _                        => false
  }

  /** File-level predicate on the filename-derived experiment id. */
  def filePredicate(f: Filter): Option[String => Boolean] = f match {
    case EqualTo("experiment_id", v: String)          => Some(_ == v)
    case In("experiment_id", vs)                      =>
      Some(eid => vs.exists(_ == eid))
    case StringStartsWith("experiment_id", p: String) => Some(_.startsWith(p))
    case _                                            => None
  }

  def eidOf(path: String): String =
    new java.io.File(path).getName.replaceAll("\\.[^.]+$", "")

  private def asLong(v: Any): Long = v match {
    case i: Int => i.toLong
    case l: Long => l
    case s: Short => s.toLong
    case b: Byte => b.toLong
    case other => other.toString.toLong
  }

  /** Row-level evaluation against the light fields (never touches data). */
  def rowMatches(f: Filter, get: String => Any): Boolean = f match {
    case EqualTo(a, v)            => get(a) == v
    case In(a, vs)                => vs.contains(get(a))
    case IsNotNull(a)             => get(a) != null
    case GreaterThan(a, v)        => asLong(get(a)) > asLong(v)
    case GreaterThanOrEqual(a, v) => asLong(get(a)) >= asLong(v)
    case LessThan(a, v)           => asLong(get(a)) < asLong(v)
    case LessThanOrEqual(a, v)    => asLong(get(a)) <= asLong(v)
    case StringStartsWith(a, p)   =>
      // null field → over-include (all filters re-evaluate above the scan)
      get(a) match { case s: String => s.startsWith(p); case _ => true }
    case _                        => true
  }
}

private class EmdScanBuilder(files: Seq[String]) extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters
    with SupportsPushDownLimit {
  private var required: StructType = EmdDataSource.Schema
  private var pushed: Array[Filter] = Array.empty
  private var limit: Int = -1

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(EmdPushdown.supported)
    filters // all re-evaluated above the scan: pushdown is never load-bearing
  }
  override def pushedFilters(): Array[Filter] = pushed

  // local limit only (rows stop flowing per partition); returning false
  // keeps Spark's global limit on top for correctness across partitions
  override def pushLimit(l: Int): Boolean = { limit = l; false }

  override def build(): Scan = new EmdScan(files, required, pushed, limit)
}

private class EmdScan(files: Seq[String], required: StructType,
    pushed: Array[Filter], limit: Int) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = {
    val preds = pushed.flatMap(EmdPushdown.filePredicate(_))
    files.filter(f => preds.forall(_(EmdPushdown.eidOf(f))))
      .map(f => EmdInputPartition(f): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new EmdReaderFactory(required, pushed, limit)
  override def description(): String =
    s"EmdScan PushedFilters: ${pushed.mkString("[", ", ", "]")}, " +
      s"ReadSchema: ${required.catalogString}" +
      (if (limit >= 0) s", PushedLimit: $limit" else "")
}

private case class EmdInputPartition(path: String) extends InputPartition

private class EmdReaderFactory(required: StructType, pushed: Array[Filter],
    limit: Int) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new EmdPartitionReader(partition.asInstanceOf[EmdInputPartition].path,
      required, pushed, limit)
}

/** One container = one partition: parse on first advance, then iterate.
  * Pushed row filters run on the light fields before the projected row is
  * built, so pruned signals never copy payload arrays.
  */
private class EmdPartitionReader(path: String, required: StructType,
    pushed: Array[Filter], limit: Int) extends PartitionReader[InternalRow] {
  private lazy val rows: Iterator[InternalRow] = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val eid = EmdPushdown.eidOf(path)
    Emd.signals(bytes).iterator
      .filter { s =>
        def light(name: String): Any = name match {
          case "experiment_id" => eid
          case "path"          => path
          case "signal_idx"    => s.signal_idx
          case "title"         => s.title
          case "ndim"          => s.ndim
          case _               => null
        }
        pushed.forall(EmdPushdown.rowMatches(_, light))
      }
      .map { s =>
        new GenericInternalRow(required.fields.map[Any] { fld =>
          fld.name match {
            case "experiment_id" => UTF8String.fromString(eid)
            case "path"          => UTF8String.fromString(path)
            case "signal_idx"    => s.signal_idx
            case "title"         => UTF8String.fromString(s.title)
            case "ndim"          => s.ndim
            case "shape"         =>
              UnsafeArrayData.fromPrimitiveArray(s.shape.toArray)
            case "data"          =>
              UnsafeArrayData.fromPrimitiveArray(s.data.toArray)
            case "metadata_json" => UTF8String.fromString(s.metadata_json)
            case other =>
              throw new IllegalArgumentException(s"unknown column $other")
          }
        })
      }
  }
  private var served = 0
  private var current: InternalRow = _
  override def next(): Boolean =
    if ((limit < 0 || served < limit) && rows.hasNext) {
      current = rows.next(); served += 1; true
    } else false
  override def get(): InternalRow = current
  override def close(): Unit = ()
}
