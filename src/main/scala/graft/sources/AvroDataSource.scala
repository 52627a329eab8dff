package graft.sources

import java.util.{Map => JMap}

import org.apache.hadoop.fs.Path
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.SparkSession

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, IsNotNull}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 connector for Avro container files (see
  * [[AvroSource]] for why the external spark-avro module is stood in
  * by an avro-core bridge):
  *
  * {{{ spark.read.format("graft-avro").load("lake/orders-avro/") }}}
  *
  * Schema comes from the FIRST file's writer schema at plan time
  * (homogeneous-directory contract, like every bulk export); one input
  * partition per file; column pruning materializes only the projected
  * fields per record — visible in `.explain` via `readSchema`. File
  * pruning on `src_file` is not applicable (no such column here;
  * Avro rows are pure data), so only the path list bounds the scan.
  */
class AvroDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-avro"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val paths = PdfDataSource.resolvePaths(options)
      .filter(_.endsWith(".avro"))
    require(paths.nonEmpty, "graft-avro: no .avro files under the given path")
    val conf = SparkSession.active.sessionState.newHadoopConf()
    val p = new Path(paths.head)
    AvroSource.sparkSchemaFor(AvroSource.schemaOf(p.getFileSystem(conf), p))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    // capture the PLANNING session (see PdfDataSource.broadcastSessionConf)
    new AvroTable(schema,
      PdfDataSource.resolvePaths(properties).filter(_.endsWith(".avro")),
      SparkSession.active)
}

private[sources] class AvroTable(tableSchema: StructType, files: Seq[String],
    session: SparkSession) extends Table with SupportsRead {
  override def name(): String = s"graft-avro(${files.length} files)"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new AvroScanBuilder(tableSchema, files, session)
}

private[sources] class AvroScanBuilder(tableSchema: StructType,
    files: Seq[String], session: SparkSession)
    extends ScanBuilder with SupportsPushDownRequiredColumns {

  private var required: StructType = tableSchema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = StructType(
      tableSchema.filter(f => requiredSchema.fieldNames.contains(f.name)))

  override def build(): Scan =
    new AvroScan(tableSchema, files, required, session)
}

private[sources] class AvroScan(tableSchema: StructType, files: Seq[String],
    required: StructType, session: SparkSession) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-avro [${files.length} files, cols=${required.fieldNames.mkString(",")}]"
  override def planInputPartitions(): Array[InputPartition] =
    files.map(f => PdfInputPartition(f): InputPartition).toArray
  // createReaderFactory runs driver-side: broadcast the SESSION Hadoop
  // conf (not a default executor-local Configuration) so readers see
  // non-default FS settings on a real cluster — the built-in file
  // sources' broadcast-conf pattern
  override def createReaderFactory(): PartitionReaderFactory =
    new AvroReaderFactory(tableSchema, required,
      PdfDataSource.broadcastSessionConf(session))
}

private[sources] class AvroReaderFactory(tableSchema: StructType,
    required: StructType, bconf: Broadcast[SerializableHadoopConf])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new AvroPartitionReader(
      partition.asInstanceOf[PdfInputPartition].file, tableSchema, required,
      bconf)
}

/** Executor-side reader: one container file, decoded record-by-record
  * with the file's own writer schema, projected to the pruned columns.
  * Field lookup is by NAME against the plan-time schema (a reordered
  * or widened writer is a plan-time schema mismatch, not silent
  * positional corruption); a field the plan knows but the file lacks
  * reads as null — the same mergeSchema-style drift tolerance as the
  * parquet path.
  *
  * The container is decoded BLOCK-INCREMENTALLY off the open Hadoop
  * input stream (`DataFileStream` buffers one compressed block at a
  * time), never via a whole-file `readAllBytes`: a 100 TB lake has
  * Avro containers beyond any single-buffer limit, and peak reader
  * memory must track the BLOCK size a writer chose, not the file size
  * an accumulation schedule produced. (`DataFileStream.close()` closes
  * the underlying stream.)
  */
private[sources] class AvroPartitionReader(file: String,
    tableSchema: StructType, required: StructType,
    bconf: Broadcast[SerializableHadoopConf])
    extends PartitionReader[InternalRow] {

  private val reader = {
    val path = new Path(file)
    val fs = path.getFileSystem(bconf.value.value)
    AvroSource.openStream(fs.open(path))
  }

  private val picks: Array[(String, org.apache.spark.sql.types.DataType)] =
    required.fields.map(f => (f.name, f.dataType))

  private var current: InternalRow = _

  override def next(): Boolean =
    if (reader.hasNext) {
      val rec = reader.next()
      val values = new Array[Any](picks.length)
      var i = 0
      while (i < picks.length) {
        val (name, dt) = picks(i)
        val raw =
          if (rec.getSchema.getField(name) != null) rec.get(name) else null
        values(i) = AvroSource.toCatalyst(raw, dt)
        i += 1
      }
      current = new GenericInternalRow(values)
      true
    } else false

  override def get(): InternalRow = current
  override def close(): Unit = reader.close()
}
