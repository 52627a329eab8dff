package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}
import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** S1/S2 — Excel worksheet source (`pd.read_excel`, project-dask.py:23-25,
  * dask-with-dataframe.py:35,64).
  *
  * XLSX is a zip of XML; this reads a worksheet with nothing beyond the
  * JDK (zip + StAX) — no external dependency, zero egress. Two paths:
  *
  *  - [[toDataFrame]] parses ONE workbook on the driver — right for the
  *    reference's single 354 KB file; `spark.createDataFrame` then
  *    distributes the rows.
  *  - [[readMany]] scans a GLOB of workbooks via `binaryFile` and parses
  *    each file inside the executors — the lake-of-thousands-of-workbooks
  *    shape. One workbook = one unsplittable file = one task's unit of
  *    work, which is the correct parallelism grain for a zip container
  *    (the format is not block-splittable).
  *
  * All cells surface as strings (pandas' inference is replaced by the
  * explicit downstream coercion ops, graft.ops.Clean.coerceNumeric —
  * SURVEY.md §1.3's "canonicalize by convention"). Two typed-cell
  * refinements within that contract: boolean cells render "True"/
  * "False" (the str() of what pandas yields, not the stored "0"/"1"),
  * and numeric cells styled with a date format render as ISO dates by
  * default — the `pd.read_excel` shape; `dateSerials = false` keeps
  * the raw serials.
  */
object XlsxSource {

  private val factory = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.IS_NAMESPACE_AWARE, true)
    // no DTDs / external entities in spreadsheet data
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f
  }

  /** Dense row matrix of a worksheet (empty cells filled with ""). */
  def readSheet(path: String, sheetName: String,
      dateSerials: Boolean = true): Vector[Vector[String]] =
    readSheetBytes(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), sheetName, dateSerials)

  /** Bytes-based variant — the executor-side entry point (binaryFile
    * hands whole-file byte arrays). A workbook's entries are materialized
    * into a map first: zip central-directory order is arbitrary, and the
    * files this path exists for are small by construction.
    *
    * @param dateSerials numeric cells whose style carries a date number
    *   format render as ISO dates ("2024-03-31", with a time part when
    *   the serial has a fraction) instead of the raw serial — the
    *   `pd.read_excel` shape, and therefore the DEFAULT (pandas converts
    *   date-styled cells unless told otherwise). Pass false for the
    *   raw-serial contract.
    */
  def readSheetBytes(bytes: Array[Byte], sheetName: String,
      dateSerials: Boolean = true): Vector[Vector[String]] = {
    val entries = readEntries(bytes)
    def entry(name: String): Option[Array[Byte]] = entries.get(name)
    val shared = entry("xl/sharedStrings.xml")
      .map(b => parseSharedStrings(new ByteArrayInputStream(b)))
      .getOrElse(Vector.empty)
    val dateStyles =
      if (!dateSerials) Set.empty[Int]
      else entry("xl/styles.xml")
        .map(b => parseDateStyles(new ByteArrayInputStream(b)))
        .getOrElse(Set.empty)
    // legacy Mac workbooks count serials from 1904-01-01 (workbookPr
    // date1904="1"); pandas honors it, so the date render must too
    val date1904 = dateStyles.nonEmpty && entry("xl/workbook.xml")
      .exists(b => parseDate1904(new ByteArrayInputStream(b)))
    val target = sheetTarget(entry, sheetName)
    val sheetPath = if (target.startsWith("/")) target.drop(1) else s"xl/$target"
    val sheet = entry(sheetPath).getOrElse(
      throw new IllegalArgumentException(
        s"worksheet entry not found for sheet '$sheetName'"))
    val rdr = factory.createXMLStreamReader(new ByteArrayInputStream(sheet))
    try parseSheet(rdr, shared, dateStyles, date1904) finally rdr.close()
  }

  /** Cumulative decompressed-bytes cap per workbook: a high-ratio deflate
    * entry (zip bomb) must bound here and surface as an unparseable file
    * (IllegalArgumentException is NonFatal, so [[readMany]]'s per-file
    * isolation turns it into zero rows) — never an executor OOM.
    */
  private val MaxInflatedBytes: Long = 256L * 1024 * 1024

  private def readEntries(bytes: Array[Byte]): Map[String, Array[Byte]] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    val out = Map.newBuilder[String, Array[Byte]]
    var total = 0L
    val buf = new Array[Byte](64 * 1024)
    try {
      var e = zin.getNextEntry
      while (e != null) {
        if (!e.isDirectory) {
          val acc = new java.io.ByteArrayOutputStream()
          var n = zin.read(buf)
          while (n >= 0) {
            acc.write(buf, 0, n)
            total += n
            if (total > MaxInflatedBytes)
              throw new IllegalArgumentException(
                s"workbook inflates past $MaxInflatedBytes bytes — refusing (zip bomb?)")
            n = zin.read(buf)
          }
          out += e.getName -> acc.toByteArray
        }
        e = zin.getNextEntry
      }
    } finally zin.close()
    out.result()
  }

  /** Worksheet → DataFrame.
    *
    * @param header pandas semantics: `Some(n)` = 0-based row n holds the
    *   column names (rows above are discarded, e.g. a title row for the
    *   reference's `header=1`); empty header cells become `Unnamed: i`,
    *   duplicates get `.k` suffixes — matching what the reference's rename
    *   maps key on (project-dask.py:61-71). `None` = no header: positional
    *   `_c0.._cN` (pandas `header=None` read through our P6 rename).
    */
  def toDataFrame(spark: SparkSession, path: String, sheetName: String,
      header: Option[Int], dateSerials: Boolean = true): DataFrame = {
    val rows = readSheet(path, sheetName, dateSerials)
    val width = if (rows.isEmpty) 0 else rows.map(_.length).max
    def pad(r: Vector[String]) = r.padTo(width, "")
    val (names, data) = header match {
      case Some(h) =>
        val hdr = pad(rows.lift(h).getOrElse(Vector.empty))
        (mangle(hdr), rows.drop(h + 1).map(pad))
      case None =>
        ((0 until width).map(i => s"_c$i").toVector, rows.map(pad))
    }
    val schema = StructType(names.map(n => StructField(n, StringType)))
    // LocalRelation, not parallelize: a driver-parsed workbook should
    // enter the plan as a LocalTableScan (sized, codegen-friendly), not
    // a Scan ExistingRDD bridge
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      data.map(r => Row.fromSeq(r): Row).asJava, schema)
  }

  /** Distributed ingest of MANY workbooks sharing one layout.
    *
    * `binaryFile` lists and reads the glob as a distributed scan; each
    * file's bytes are parsed executor-side by [[readSheetBytes]] — the
    * per-file semantics of the reference's per-file read loop
    * (project-dask.py:23-25), at lake parallelism. The column schema is
    * fixed at plan time from ONE sample workbook (first path in glob
    * order, read driver-side through the Hadoop FS so any scheme works);
    * every file is then conformed to it — rows are padded / truncated to
    * the sample's width, which is the "same layout" contract this API
    * is for.
    *
    * Output carries `src_file` (the file's full path, so same-named files
    * in different subdirectories of the glob stay distinct) and `row_no`
    * (0-based data-row ordinal within its file) ahead of the data
    * columns, so per-file order — the property the reference's concat
    * preserves — survives the distributed scan.
    */
  /** How many glob-leading paths the schema probe may touch. Bounds the
    * driver-side path collect to O(k) on a lake of millions of workbooks;
    * a lake whose first k files are ALL corrupt fails the probe loudly.
    */
  private val SampleProbeLimit = 64

  def readMany(spark: SparkSession, glob: String, sheetName: String,
      header: Option[Int], dateSerials: Boolean = true): DataFrame = {
    import spark.implicits._
    val files = spark.read.format("binaryFile").load(glob)
      .select(col("path"), col("content"))
    // schema from the first PARSEABLE workbook (a corrupt file may sort
    // first; it contributes zero rows below, and it must not block the
    // schema sample either). Only the first SampleProbeLimit paths reach
    // the driver — never the whole listing.
    val paths = files.select("path").orderBy("path").limit(SampleProbeLimit)
      .collect().map(_.getString(0)).toSeq
    require(paths.nonEmpty, s"no files match $glob")
    val fs = new org.apache.hadoop.fs.Path(paths.head)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val sampleRows = paths.iterator.map { path =>
      val in = fs.open(new org.apache.hadoop.fs.Path(path))
      val bytes = try in.readAllBytes() finally in.close()
      try Some(readSheetBytes(bytes, sheetName, dateSerials))
      catch { case scala.util.control.NonFatal(_) => None }
    }.collectFirst { case Some(rows) => rows }
      .getOrElse(throw new IllegalArgumentException(
        s"no parseable workbook in the first $SampleProbeLimit files of $glob"))
    val names = {
      val width = if (sampleRows.isEmpty) 0 else sampleRows.map(_.length).max
      header match {
        case Some(h) => mangle(sampleRows.lift(h).getOrElse(Vector.empty).padTo(width, ""))
        case None => (0 until width).map(i => s"_c$i").toVector
      }
    }
    val schema = StructType(
      StructField("src_file", StringType, nullable = false) +:
      StructField("row_no", LongType, nullable = false) +:
      names.map(n => StructField(n, StringType)))
    val width = names.length
    files.as[(String, Array[Byte])].flatMap { case (path, bytes) =>
      // per-file failure isolation (§2.13, the distributed analogue of
      // readOrEmpty): ONE corrupt workbook in a lake of thousands must
      // contribute zero rows, not kill the whole scan
      val rows =
        try readSheetBytes(bytes, sheetName, dateSerials)
        catch { case scala.util.control.NonFatal(_) => Vector.empty }
      val data = header match {
        case Some(h) => rows.drop(h + 1)
        case None => rows
      }
      data.zipWithIndex.map { case (r, i) =>
        Row.fromSeq(path +: i.toLong +: r.padTo(width, "").take(width))
      }
    }(Encoders.row(schema))
  }

  /** pandas-style header mangling: "" → `Unnamed: i`; duplicates → `.k`,
    * CASCADING past literal collisions the way pandas does — a header
    * ["x", "x.1", "x"] must yield ["x", "x.1", "x.2"], never a second
    * "x.1" (duplicate StructType fields make every by-name access an
    * ambiguous-reference error downstream).
    */
  private[graft] def mangle(hdr: Vector[String]): Vector[String] = {
    val used = mutable.Set.empty[String]
    val nextK = mutable.Map.empty[String, Int]
    hdr.zipWithIndex.map { case (raw, i) =>
      val base = if (raw.trim.isEmpty) s"Unnamed: $i" else raw
      val name =
        if (!used.contains(base)) base
        else {
          var k = nextK.getOrElse(base, 0) + 1
          while (used.contains(s"$base.$k")) k += 1
          nextK(base) = k
          s"$base.$k"
        }
      used += name
      name
    }
  }

  /** sheet name → worksheet zip path via workbook.xml + its rels. */
  private def sheetTarget(entry: String => Option[Array[Byte]],
      sheetName: String): String = {
    def open(name: String): XMLStreamReader =
      factory.createXMLStreamReader(new ByteArrayInputStream(entry(name)
        .getOrElse(throw new IllegalArgumentException(s"missing zip entry $name"))))
    val wb = open("xl/workbook.xml")
    var rid: String = null
    try {
      while (wb.hasNext && rid == null) {
        if (wb.next() == XMLStreamConstants.START_ELEMENT
            && wb.getLocalName == "sheet"
            && attr(wb, "name") == sheetName)
          rid = attr(wb, "id") // r:id — matched by local name
      }
    } finally wb.close()
    require(rid != null, s"sheet '$sheetName' not in workbook")
    val rels = open("xl/_rels/workbook.xml.rels")
    try {
      while (rels.hasNext) {
        if (rels.next() == XMLStreamConstants.START_ELEMENT
            && rels.getLocalName == "Relationship"
            && attr(rels, "Id") == rid)
          return attr(rels, "Target")
      }
    } finally rels.close()
    throw new IllegalArgumentException(s"no relationship for sheet '$sheetName'")
  }

  private def parseSharedStrings(in: ByteArrayInputStream): Vector[String] = {
    val r = factory.createXMLStreamReader(in)
    val out = Vector.newBuilder[String]
    val cur = new StringBuilder
    var inSi = false
    var inT = false
    var inPhonetic = false // <rPh>/<phoneticPr> runs are annotations, not content
    try {
      while (r.hasNext) r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "si" => inSi = true; cur.clear()
            case "rPh" | "phoneticPr" => inPhonetic = true
            case "t" if inSi && !inPhonetic => inT = true
            case _ =>
          }
        case XMLStreamConstants.CHARACTERS if inT =>
          cur.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "t" => inT = false
            case "rPh" | "phoneticPr" => inPhonetic = false
            case "si" => inSi = false; out += cur.toString
            case _ =>
          }
        case _ =>
      }
    } finally r.close()
    out.result()
  }

  private def parseSheet(r: XMLStreamReader, shared: Vector[String],
      dateStyles: Set[Int], date1904: Boolean = false): Vector[Vector[String]] = {
    val rows = Vector.newBuilder[Vector[String]]
    var row: mutable.ArrayBuffer[String] = null
    var cellCol = -1
    var cellType = ""
    var cellStyle = -1
    var inV = false
    var inPhonetic = false // <rPh> inside <is> is annotation, not content
    // accumulated across ALL <t>/<v> runs of a cell: rich-text inlineStr
    // cells (<is><r><t>..</t></r><r><t>..</t></r></is>) concatenate
    val v = new StringBuilder
    while (r.hasNext) r.next() match {
      case XMLStreamConstants.START_ELEMENT =>
        r.getLocalName match {
          case "row" => row = mutable.ArrayBuffer.empty
          case "c" if row != null =>
            cellCol = Option(attr(r, "r")).map(colIndex).getOrElse(row.length)
            cellType = Option(attr(r, "t")).getOrElse("")
            cellStyle = Option(attr(r, "s")).flatMap(_.toIntOption).getOrElse(-1)
            v.clear()
          case "rPh" | "phoneticPr" => inPhonetic = true
          case "v" | "t" if cellCol >= 0 && !inPhonetic => inV = true
          case _ =>
        }
      case XMLStreamConstants.CHARACTERS if inV =>
        v.append(r.getText)
      case XMLStreamConstants.END_ELEMENT =>
        r.getLocalName match {
          case "rPh" | "phoneticPr" => inPhonetic = false
          case "v" | "t" => inV = false
          case "c" if cellCol >= 0 =>
            val raw = v.toString
            val value = cellType match {
              // empty typed cell (<c t="s"/> with no <v>) -> blank
              case "s" => raw.trim.toIntOption
                .flatMap(shared.lift).getOrElse("")
              // boolean cells store "0"/"1"; pandas surfaces the bool
              // itself (str() form "True"/"False") — match that, not
              // the storage digit (project-dask.py:23-25 semantics)
              case "b" =>
                raw.trim match {
                  case "1" => "True"
                  case "0" => "False"
                  case _ => ""
                }
              // numeric cell styled with a date format → ISO date when
              // the caller opted in (dateStyles is empty otherwise)
              case "" | "n" if dateStyles.contains(cellStyle) =>
                raw.trim.toDoubleOption
                  .map(serialToIso(_, date1904)).getOrElse(raw)
              case _ => raw
            }
            while (row.length <= cellCol) row += ""
            row(cellCol) = value
            cellCol = -1
            cellStyle = -1
          case "row" => rows += row.toVector; row = null
          case _ =>
        }
      case _ =>
    }
    rows.result()
  }

  /** Built-in Excel number formats that are dates/times (ECMA-376 §18.8.30). */
  private val BuiltinDateFmts: Set[Int] = (14 to 22).toSet ++ (45 to 47).toSet

  /** Style indices (cellXfs order — what a cell's `s` attribute names)
    * whose number format is a date/time. Custom formats count as dates
    * when, after stripping quoted text, bracketed sections, and escapes,
    * they still contain a y/m/d/h/s date token.
    */
  private[graft] def parseDateStyles(in: ByteArrayInputStream): Set[Int] = {
    val r = factory.createXMLStreamReader(in)
    val customDateFmts = mutable.Set.empty[Int]
    val styleFmtIds = Vector.newBuilder[Int]
    var inCellXfs = false
    try {
      while (r.hasNext) r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "numFmt" =>
              val id = Option(attr(r, "numFmtId")).flatMap(_.toIntOption)
              val code = Option(attr(r, "formatCode")).getOrElse("")
              val bare = code
                .replaceAll("\"[^\"]*\"", "") // quoted literal text
                .replaceAll("\\[[^\\]]*\\]", "") // [Red], [$-409], [h] elapsed
                .replaceAll("\\\\.", "") // escaped single chars
              if (id.isDefined && bare.exists(c => "ymdhsYMDHS".indexOf(c) >= 0))
                customDateFmts ++= id
            case "cellXfs" => inCellXfs = true
            case "xf" if inCellXfs =>
              styleFmtIds += Option(attr(r, "numFmtId"))
                .flatMap(_.toIntOption).getOrElse(0)
            case _ =>
          }
        case XMLStreamConstants.END_ELEMENT if r.getLocalName == "cellXfs" =>
          inCellXfs = false
        case _ =>
      }
    } finally r.close()
    styleFmtIds.result().zipWithIndex.collect {
      case (fmt, i) if BuiltinDateFmts(fmt) || customDateFmts(fmt) => i
    }.toSet
  }

  /** Excel serial → ISO-8601. Serial day 0 is 1899-12-30 (the epoch that
    * absorbs Excel's phantom 1900-02-29 for all modern dates); serials
    * BELOW the phantom day (0 < serial < 60) get the openpyxl-style
    * one-day correction so serial 1 renders 1900-01-01 the way
    * `pd.read_excel` does — without it everything in Jan–Feb 1900 lands
    * one day early. (Serial 60 itself names the nonexistent 1900-02-29;
    * it renders as 1900-02-28, the nearest real day.) A fractional part
    * is a time-of-day. Date-only serials render as "YYYY-MM-DD",
    * timestamps as "YYYY-MM-DD HH:MM:SS" — the str() forms of the
    * date/Timestamp objects `pd.read_excel` yields.
    */
  private[graft] def serialToIso(serial: Double,
      date1904: Boolean = false): String = {
    val days = math.floor(serial).toLong
    // the 1904 system has no phantom leap day; its day 0 IS 1904-01-01
    val leapFix = if (!date1904 && serial > 0 && days < 60) 1 else 0
    val epoch =
      if (date1904) java.time.LocalDate.of(1904, 1, 1)
      else java.time.LocalDate.of(1899, 12, 30)
    val date = epoch.plusDays(days + leapFix)
    // round to whole seconds the way spreadsheet UIs do
    val secs = math.round((serial - days) * 86400.0)
    if (secs == 0L) date.toString
    else if (secs >= 86400L) s"${date.plusDays(1)} 00:00:00"
    else {
      val t = java.time.LocalTime.ofSecondOfDay(secs)
      f"$date ${t.getHour}%02d:${t.getMinute}%02d:${t.getSecond}%02d"
    }
  }

  /** workbookPr date1904 attribute ("1"/"true") of xl/workbook.xml. */
  private[graft] def parseDate1904(in: ByteArrayInputStream): Boolean = {
    val r = factory.createXMLStreamReader(in)
    try {
      while (r.hasNext) r.next() match {
        case XMLStreamConstants.START_ELEMENT
            if r.getLocalName == "workbookPr" =>
          val v = attr(r, "date1904")
          return v == "1" || v == "true"
        case _ =>
      }
      false
    } finally r.close()
  }

  /** "BC12" → 0-based column index of "BC". */
  private def colIndex(ref: String): Int = {
    val letters = ref.takeWhile(_.isLetter)
    letters.foldLeft(0)((acc, ch) => acc * 26 + (ch - 'A' + 1)) - 1
  }

  private def attr(r: XMLStreamReader, localName: String): String = {
    var i = 0
    while (i < r.getAttributeCount) {
      if (r.getAttributeLocalName(i) == localName) return r.getAttributeValue(i)
      i += 1
    }
    null
  }
}
