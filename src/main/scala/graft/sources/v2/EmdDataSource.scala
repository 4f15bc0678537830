package graft.sources.v2

import java.util

import graft.sources.Emd
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, UnsafeArrayData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
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

  /** `.emd` files under `path` (a file or directory), deterministic order. */
  def listFiles(path: String): Seq[String] = {
    val root = new java.io.File(path)
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

private class EmdScanBuilder(files: Seq[String]) extends ScanBuilder {
  override def build(): Scan = new EmdScan(files)
}

private class EmdScan(files: Seq[String]) extends Scan with Batch {
  override def readSchema(): StructType = EmdDataSource.Schema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    files.map(f => EmdInputPartition(f): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new EmdReaderFactory
}

private case class EmdInputPartition(path: String) extends InputPartition

private class EmdReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new EmdPartitionReader(partition.asInstanceOf[EmdInputPartition].path)
}

/** One container = one partition: parse on first advance, then iterate. */
private class EmdPartitionReader(path: String) extends PartitionReader[InternalRow] {
  private lazy val rows: Iterator[InternalRow] = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val eid = new java.io.File(path).getName.replaceAll("\\.[^.]+$", "")
    Emd.signals(bytes).iterator.map { s =>
      new GenericInternalRow(Array[Any](
        UTF8String.fromString(eid),
        UTF8String.fromString(path),
        s.signal_idx,
        UTF8String.fromString(s.title),
        s.ndim,
        UnsafeArrayData.fromPrimitiveArray(s.shape.toArray),
        UnsafeArrayData.fromPrimitiveArray(s.data.toArray),
        UTF8String.fromString(s.metadata_json)))
    }
  }
  private var current: InternalRow = _
  override def next(): Boolean =
    if (rows.hasNext) { current = rows.next(); true } else false
  override def get(): InternalRow = current
  override def close(): Unit = ()
}
