package graft.sources

import java.util.{Map => JMap}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, IsNotNull}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for the bespoke xlsx parser (S1/S2):
  *
  * {{{
  * spark.read.format("graft-xlsx")
  *   .option("sheet", "Sheet1")     // required
  *   .option("header", "0")         // header row index; omit = headerless
  *   .option("dateSerials", "true") // date-styled cells as ISO strings
  *   .load("lake/reports-2024-.xlsx")
  * }}}
  *
  * → (src_file, row_no, <data columns>), the [[XlsxSource.readMany]]
  * contract as a first-class table: schema fixed at PLAN time from the
  * first parseable workbook (probe bounded to [[XlsxSource.readMany]]'s
  * 64-file limit), every file conformed to it executor-side, per-file
  * failure isolation (a corrupt workbook contributes zero rows, never
  * kills the scan). V2 adds what the flatMap path can't express:
  * column pruning into the scan (a 2-column projection over a 40-column
  * sheet materializes 2 strings per row, visible in `.explain`) and
  * planning-time file pruning on `src_file` equality. Same executor
  * Hadoop-FS caveat as [[PdfDataSource]].
  */
class XlsxDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-xlsx"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val paths = PdfDataSource.resolvePaths(options)
    val opts = XlsxOptions(options)
    val conf = SparkSession.active.sessionState.newHadoopConf()
    val sample = paths.take(XlsxDataSource.SampleProbeLimit).iterator.map { p =>
      val path = new Path(p)
      val in = path.getFileSystem(conf).open(path)
      val bytes = try in.readAllBytes() finally in.close()
      try Some(XlsxSource.readSheetBytes(bytes, opts.sheet, opts.dateSerials))
      catch { case scala.util.control.NonFatal(_) => None }
    }.collectFirst { case Some(rows) => rows }
      .getOrElse(throw new IllegalArgumentException(
        s"graft-xlsx: no parseable workbook in the first " +
          s"${XlsxDataSource.SampleProbeLimit} files"))
    val width = if (sample.isEmpty) 0 else sample.map(_.length).max
    val names = opts.header match {
      case Some(h) =>
        XlsxSource.mangle(sample.lift(h).getOrElse(Vector.empty).padTo(width, ""))
      case None => (0 until width).map(i => s"_c$i").toVector
    }
    StructType(
      StructField("src_file", StringType, nullable = false) +:
        StructField("row_no", LongType, nullable = false) +:
        names.map(n => StructField(n, StringType)))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    // capture the PLANNING session (see PdfDataSource.broadcastSessionConf)
    new XlsxTable(schema, PdfDataSource.resolvePaths(properties),
      XlsxOptions(properties), SparkSession.active)
}

object XlsxDataSource {
  private[sources] val SampleProbeLimit = 64
}

/** Parsed reader options (sheet name, header row, date rendering). */
private[sources] final case class XlsxOptions(sheet: String,
    header: Option[Int], dateSerials: Boolean) extends Serializable

private[sources] object XlsxOptions {
  def apply(m: JMap[String, String]): XlsxOptions = {
    val get = (k: String) => Option(m.get(k))
    XlsxOptions(
      get("sheet").getOrElse(
        throw new IllegalArgumentException("graft-xlsx: option 'sheet' is required")),
      get("header").map(_.trim.toInt),
      get("dateserials").orElse(get("dateSerials")).forall(_.toBoolean))
  }
}

private[sources] class XlsxTable(tableSchema: StructType, files: Seq[String],
    opts: XlsxOptions, session: SparkSession) extends Table with SupportsRead {
  override def name(): String = s"graft-xlsx(${files.length} files)"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new XlsxScanBuilder(tableSchema, files, opts, session)
}

private[sources] class XlsxScanBuilder(tableSchema: StructType,
    files: Seq[String], opts: XlsxOptions, session: SparkSession)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {

  private var required: StructType = tableSchema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = StructType(
      tableSchema.filter(f => requiredSchema.fieldNames.contains(f.name)))

  // advisory, like PdfScanBuilder: prune files, let Spark re-evaluate
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter {
      case EqualTo("src_file", _: String) => true
      case IsNotNull("src_file") => true
      case _ => false
    }
    filters
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = {
    val kept = pushed.collect { case EqualTo("src_file", v: String) => v }
    val files2 =
      if (kept.isEmpty) files
      else files.filter(f => kept.forall(v =>
        f == v || f.endsWith("/" + v.stripPrefix("/"))))
    new XlsxScan(tableSchema, files2, opts, required, pushed, session)
  }
}

private[sources] class XlsxScan(tableSchema: StructType, files: Seq[String],
    opts: XlsxOptions, required: StructType, pushed: Array[Filter],
    session: SparkSession) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-xlsx [${files.length} files, cols=${required.fieldNames.mkString(",")}, " +
      s"PushedFilters: [${pushed.mkString(", ")}]]"
  override def planInputPartitions(): Array[InputPartition] =
    files.map(f => PdfInputPartition(f): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new XlsxReaderFactory(tableSchema, opts, required,
      PdfDataSource.broadcastSessionConf(session))
}

private[sources] class XlsxReaderFactory(tableSchema: StructType,
    opts: XlsxOptions, required: StructType,
    bconf: org.apache.spark.broadcast.Broadcast[SerializableHadoopConf])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new XlsxPartitionReader(
      partition.asInstanceOf[PdfInputPartition].file, tableSchema, opts,
      required, bconf)
}

/** Executor-side reader: one workbook, parsed once, conformed to the
  * plan-time schema, emitted with only the pruned columns materialized.
  * Parse failures yield an empty partition (per-file failure isolation,
  * §2.13's distributed analogue).
  */
private[sources] class XlsxPartitionReader(file: String,
    tableSchema: StructType, opts: XlsxOptions, required: StructType,
    bconf: org.apache.spark.broadcast.Broadcast[SerializableHadoopConf])
    extends PartitionReader[InternalRow] {

  private val rows: Iterator[InternalRow] = {
    val path = new Path(file)
    val fs = path.getFileSystem(bconf.value.value)
    // zip central directory sits at EOF → whole-file read is inherent;
    // guard the 2 GiB single-buffer bound with a real message (the
    // readAllBytes path would otherwise throw an opaque OOM/overflow)
    require(fs.getFileStatus(path).getLen <= Int.MaxValue,
      s"$file exceeds 2 GiB — single-buffer xlsx parse unsupported")
    val in = fs.open(path)
    val bytes = try in.readAllBytes() finally in.close()
    val parsed =
      try XlsxSource.readSheetBytes(bytes, opts.sheet, opts.dateSerials)
      catch { case scala.util.control.NonFatal(_) => Vector.empty[Vector[String]] }
    val data = opts.header match {
      case Some(h) => parsed.drop(h + 1)
      case None => parsed
    }
    val width = tableSchema.length - 2
    val fileUtf8 = UTF8String.fromString(file)
    // data-column ordinal for each required field (schema order)
    val picks: Array[Either[String, Int]] = required.fieldNames.map {
      case "src_file" => Left("src_file")
      case "row_no" => Left("row_no")
      case n => Right(tableSchema.fieldIndex(n) - 2)
    }.toArray
    data.iterator.zipWithIndex.map { case (r, i) =>
      val padded = r.padTo(width, "").take(width)
      val values = picks.map[Any] {
        case Left("src_file") => fileUtf8
        case Left(_) => i.toLong
        case Right(c) => UTF8String.fromString(padded(c))
      }
      new GenericInternalRow(values.toArray[Any])
    }
  }

  private var current: InternalRow = _
  override def next(): Boolean =
    if (rows.hasNext) { current = rows.next(); true } else false
  override def get(): InternalRow = current
  override def close(): Unit = ()
}
