package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

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

/** DataSource V2 connector for the bespoke PDF text parser:
  *
  * {{{ spark.read.format("graft-pdf").load("reports/annual-*.pdf") }}}
  *
  * → (src_file, page_no, line_no, line), one row per text line in
  * page-tree order — the same extraction contract as
  * [[PdfTextSource.extractPageLines]] (S3/S4), re-expressed as a
  * first-class Spark table instead of a driver-side LocalTableScan or
  * an ad-hoc binaryFile+flatMap.
  *
  * What the V2 integration buys at scale:
  *  - '''per-file input partitions''': each PDF parses on an executor;
  *    a million-report corpus fans out like any other file source
  *    (PDFs are unsplittable, so file grain is the correct grain);
  *  - '''column pruning''' ([[SupportsPushDownRequiredColumns]]): a
  *    `count(*)`/page-histogram query materializes no line text —
  *    the pruned schema is visible in `.explain` as ReadSchema;
  *  - '''file pruning''' ([[SupportsPushDownFilters]]): equality
  *    predicates on `src_file` drop whole files at PLANNING time (the
  *    partition-pruning analog for a file-per-document source), shown
  *    in `.explain` as PushedFilters.
  *
  * Executors re-open files through the Hadoop FileSystem for the
  * path's scheme using the OWNING session's Hadoop conf — captured at
  * `getTable()` time, broadcast via [[SerializableHadoopConf]] — so
  * credentialed/endpoint-configured filesystems work the same as in
  * the built-in file sources.
  */
class PdfDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-pdf"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PdfDataSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    // capture the PLANNING session here (getTable runs driver-side
    // inside load(), where active == the session planning this scan)
    new PdfTable(PdfDataSource.resolvePaths(properties), SparkSession.active)
}

/** Java-serializable Hadoop `Configuration` carrier for broadcasting
  * the session conf to executor-side readers/writers. (Spark ships the
  * identical `org.apache.spark.util.SerializableConfiguration`, but it
  * is `private[spark]` — this is the public-API re-expression, using
  * `Configuration`'s own Writable serialization.)
  */
class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

object PdfDataSource {
  val Schema: StructType = StructType(Seq(
    StructField("src_file", StringType, nullable = false),
    StructField("page_no", LongType, nullable = false),
    StructField("line_no", LongType, nullable = false),
    StructField("line", StringType)))

  /** Broadcast a session's Hadoop conf for executor-side
    * `Path.getFileSystem` calls — shared by every graft DSv2 reader
    * factory (pdf/xlsx/avro) and the Avro writer. The OWNING session is
    * captured at `getTable()` time (where the planning session is the
    * active one) and threaded down to `createReaderFactory()` — NOT
    * re-resolved via `SparkSession.active` at factory time, which in a
    * multi-session application can name a different session than the
    * one that planned the scan and silently ship the wrong Hadoop conf.
    * An executor-local `new Configuration()` would likewise drop
    * non-default FS settings (credentials, endpoints, buffer sizes)
    * on a real cluster; this is the built-in file sources' pattern.
    */
  private val confBroadcasts =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession,
        org.apache.spark.broadcast.Broadcast[SerializableHadoopConf]]())

  private[sources] def broadcastSessionConf(s: SparkSession)
      : org.apache.spark.broadcast.Broadcast[SerializableHadoopConf] = {
    // one broadcast per SESSION, not per createReaderFactory() call:
    // factories are built on every physical plan, and a bench loop
    // would otherwise accumulate hundreds of live broadcasts. Keyed by
    // session (not SparkContext) so two sessions with different Hadoop
    // confs on one context each get their own; weak keys so the cache
    // cannot outlive its session.
    confBroadcasts.computeIfAbsent(s, s2 =>
      s2.sparkContext.broadcast(
        new SerializableHadoopConf(s2.sessionState.newHadoopConf())))
  }

  /** Expand the `path`/`paths` table properties (as DataFrameReader
    * .load() populates them) through Hadoop glob resolution into
    * concrete file paths, driver-side — the file listing IS the
    * partition plan.
    */
  private[sources] def resolvePaths(properties: JMap[String, String]): Seq[String] = {
    val props = properties.asScala
    val globs: Seq[String] = props.get("paths") match {
      // DataFrameReader encodes multi-path loads as a JSON string array
      case Some(arr) => "\"((?:[^\"\\\\]|\\\\.)*)\"".r
        .findAllMatchIn(arr).map(_.group(1).replace("\\\"", "\"")).toSeq
      case None => props.get("path").toSeq
    }
    require(globs.nonEmpty, "graft-pdf: no path given to load()")
    val conf = SparkSession.active.sessionState.newHadoopConf()
    globs.flatMap { g =>
      val p = new Path(g)
      val fs = p.getFileSystem(conf)
      Option(fs.globStatus(p)).toSeq.flatten
        // a glob match that is a DIRECTORY means the user passed a plain
        // dir path — list its files, like every Spark file source
        .flatMap(st =>
          if (st.isDirectory) fs.listStatus(st.getPath).toSeq else Seq(st))
        .filter(_.isFile)
        // Path.toString ("file:/x/y"), matching binaryFile's src-path
        // convention, so src_file values agree across the two paths
        .map(_.getPath.toString)
    }.distinct.sorted
  }
}

private[sources] class PdfTable(files: Seq[String], session: SparkSession)
    extends Table with SupportsRead {
  override def name(): String = s"graft-pdf(${files.length} files)"
  override def schema(): StructType = PdfDataSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PdfScanBuilder(files, session)
}

private[sources] class PdfScanBuilder(files: Seq[String], session: SparkSession)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {

  private var required: StructType = PdfDataSource.Schema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve OUR column order (the reader emits fields in schema
    // order); requiredSchema's order reflects the query's projection
    required = StructType(
      PdfDataSource.Schema.filter(f => requiredSchema.fieldNames.contains(f.name)))

  /** Accept what prunes FILES — equality on src_file (and its implied
    * IsNotNull) — but hand every filter back for Spark to re-evaluate
    * on rows (return value = residuals). The pushdown is ADVISORY, like
    * parquet's PushedFilters: it skips whole files at planning time and
    * never changes row-level semantics, so a bare-filename equality
    * (suffix match against the full URI in `src_file`) can prune files
    * without the source having to reimplement Spark's comparison rules.
    */
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
      // equality values name either the full URI or a bare file name
      else files.filter(f => kept.forall(v =>
        f == v || f.endsWith("/" + v.stripPrefix("/"))))
    new PdfScan(files2, required, pushed, session)
  }
}

private[sources] class PdfScan(files: Seq[String], required: StructType,
    pushed: Array[Filter], session: SparkSession) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-pdf [${files.length} files, cols=${required.fieldNames.mkString(",")}, " +
      s"PushedFilters: [${pushed.mkString(", ")}]]"
  override def planInputPartitions(): Array[InputPartition] =
    files.map(f => PdfInputPartition(f): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new PdfReaderFactory(required, PdfDataSource.broadcastSessionConf(session))
}

private[sources] final case class PdfInputPartition(file: String)
    extends InputPartition

private[sources] class PdfReaderFactory(required: StructType,
    bconf: org.apache.spark.broadcast.Broadcast[SerializableHadoopConf])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[PdfInputPartition].file
    new PdfPartitionReader(file, required, bconf)
  }
}

/** Executor-side reader: one PDF, parsed once, emitted line by line in
  * page-tree order with only the pruned columns materialized.
  */
private[sources] class PdfPartitionReader(file: String, required: StructType,
    bconf: org.apache.spark.broadcast.Broadcast[SerializableHadoopConf])
    extends PartitionReader[InternalRow] {

  private val rows: Iterator[InternalRow] = {
    val path = new Path(file)
    val fs = path.getFileSystem(bconf.value.value)
    val len = fs.getFileStatus(path).getLen
    // whole-file parse is inherent to the format (the xref trailer
    // lives at EOF); past 2 GiB the Int cast would wrap into a
    // NegativeArraySizeException or a garbage-length parse — fail
    // with the actual reason instead
    require(len <= Int.MaxValue,
      s"$file is $len bytes — PDFs over 2 GiB are not supported " +
        "(single-buffer parse)")
    val bytes = new Array[Byte](len.toInt)
    val in = fs.open(path)
    try in.readFully(0, bytes) finally in.close()
    val fileUtf8 = UTF8String.fromString(file)
    val fields = required.fieldNames
    PdfTextSource.extractPageLines(bytes).iterator.zipWithIndex.flatMap {
      case (lines, page) =>
        lines.iterator.zipWithIndex.map { case (line, i) =>
          val values = fields.map[Any] {
            case "src_file" => fileUtf8
            case "page_no" => page.toLong
            case "line_no" => i.toLong
            case "line" => UTF8String.fromString(line)
          }
          new GenericInternalRow(values.toArray[Any])
        }
    }
  }

  private var current: InternalRow = _
  override def next(): Boolean =
    if (rows.hasNext) { current = rows.next(); true } else false
  override def get(): InternalRow = current
  override def close(): Unit = ()
}
