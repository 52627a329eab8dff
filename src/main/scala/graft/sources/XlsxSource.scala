package graft.sources

import java.util.zip.ZipFile
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}
import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** S1/S2 — Excel worksheet source (`pd.read_excel`, project-dask.py:23-25,
  * dask-with-dataframe.py:35,64).
  *
  * XLSX is a zip of XML; this reads a worksheet with nothing beyond the
  * JDK (zip + StAX) — no external dependency, zero egress. Parsing runs
  * on the DRIVER, deliberately: spreadsheets are a small-file format (the
  * reference's workbook is 354 KB); bulk data arrives via
  * parquet/csv/jdbc. `spark.createDataFrame` then distributes the rows.
  *
  * All cells surface as strings (pandas' inference is replaced by the
  * explicit downstream coercion ops, graft.ops.Clean.coerceNumeric —
  * SURVEY.md §1.3's "canonicalize by convention").
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
  def readSheet(path: String, sheetName: String): Vector[Vector[String]] = {
    val zip = new ZipFile(path)
    try {
      val shared = readSharedStrings(zip)
      val target = sheetTarget(zip, sheetName)
      val entry = zip.getEntry(if (target.startsWith("/")) target.drop(1) else s"xl/$target")
      require(entry != null, s"worksheet entry not found for sheet '$sheetName'")
      val rdr = factory.createXMLStreamReader(zip.getInputStream(entry))
      try parseSheet(rdr, shared) finally rdr.close()
    } finally zip.close()
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
      header: Option[Int]): DataFrame = {
    val rows = readSheet(path, sheetName)
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
    val rdd = spark.sparkContext.parallelize(data.map(r => Row.fromSeq(r)))
    spark.createDataFrame(rdd, schema)
  }

  /** pandas-style header mangling: "" → `Unnamed: i`; duplicates → `.k`. */
  private def mangle(hdr: Vector[String]): Vector[String] = {
    val seen = mutable.Map.empty[String, Int]
    hdr.zipWithIndex.map { case (raw, i) =>
      val base = if (raw.trim.isEmpty) s"Unnamed: $i" else raw
      seen.get(base) match {
        case None => seen(base) = 0; base
        case Some(k) => seen(base) = k + 1; s"$base.${k + 1}"
      }
    }
  }

  /** sheet name → worksheet zip path via workbook.xml + its rels. */
  private def sheetTarget(zip: ZipFile, sheetName: String): String = {
    val wb = factory.createXMLStreamReader(
      zip.getInputStream(zip.getEntry("xl/workbook.xml")))
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
    val rels = factory.createXMLStreamReader(
      zip.getInputStream(zip.getEntry("xl/_rels/workbook.xml.rels")))
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

  private def readSharedStrings(zip: ZipFile): Vector[String] = {
    val e = zip.getEntry("xl/sharedStrings.xml")
    if (e == null) return Vector.empty
    val r = factory.createXMLStreamReader(zip.getInputStream(e))
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

  private def parseSheet(r: XMLStreamReader,
      shared: Vector[String]): Vector[Vector[String]] = {
    val rows = Vector.newBuilder[Vector[String]]
    var row: mutable.ArrayBuffer[String] = null
    var cellCol = -1
    var cellType = ""
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
              case _ => raw
            }
            while (row.length <= cellCol) row += ""
            row(cellCol) = value
            cellCol = -1
          case "row" => rows += row.toVector; row = null
          case _ =>
        }
      case _ =>
    }
    rows.result()
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
