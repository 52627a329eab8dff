package graft

import java.io.ByteArrayOutputStream
import java.util.zip.{ZipEntry, ZipOutputStream}

import graft.sources.XlsxSource

/** Typed-cell semantics of the xlsx source: boolean cells render as
  * pandas' "True"/"False" (not the stored "0"/"1"), and date-styled
  * numeric cells render as ISO dates BY DEFAULT (the `pd.read_excel`
  * shape) — raw serials behind `dateSerials = false`. Plus the
  * decompression cap: a zip bomb must surface as an unparseable
  * workbook, never an OOM.
  */
class XlsxTypedCellsSpec extends SparkSpec {

  private val SsMain =
    "http://schemas.openxmlformats.org/spreadsheetml/2006/main"

  /** Minimal single-sheet workbook (sheet name "S") from raw part XML. */
  private def workbook(sheetXml: String,
      stylesXml: Option[String]): Array[Byte] = {
    val wbXml =
      s"""<?xml version="1.0" encoding="UTF-8"?>
         |<workbook xmlns="$SsMain"
         | xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
         |<sheets><sheet name="S" sheetId="1" r:id="rId1"/></sheets>
         |</workbook>""".stripMargin
    val relsXml =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1"
        | Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet"
        | Target="worksheets/sheet1.xml"/>
        |</Relationships>""".stripMargin
    val entries = Seq(
      "xl/workbook.xml" -> wbXml,
      "xl/_rels/workbook.xml.rels" -> relsXml,
      "xl/worksheets/sheet1.xml" -> sheetXml) ++
      stylesXml.map("xl/styles.xml" -> _)
    val bos = new ByteArrayOutputStream()
    val zos = new ZipOutputStream(bos)
    entries.foreach { case (name, xml) =>
      zos.putNextEntry(new ZipEntry(name))
      zos.write(xml.getBytes("UTF-8"))
      zos.closeEntry()
    }
    zos.close()
    bos.toByteArray
  }

  private val typedSheet =
    s"""<?xml version="1.0" encoding="UTF-8"?>
       |<worksheet xmlns="$SsMain"><sheetData>
       |<row r="1">
       |  <c r="A1" t="b"><v>1</v></c>
       |  <c r="B1" t="b"><v>0</v></c>
       |  <c r="C1" s="1"><v>45382</v></c>
       |  <c r="D1" s="1"><v>45382.5</v></c>
       |  <c r="E1" s="2"><v>45382</v></c>
       |  <c r="F1" s="3"><v>123.5</v></c>
       |  <c r="G1"><v>45382</v></c>
       |</row>
       |</sheetData></worksheet>""".stripMargin

  // style 1 = built-in date fmt 14; style 2 = custom date fmt 164
  // (quoted text and bracketed sections must not count as date tokens);
  // style 3 = custom NON-date fmt 165 whose only "m" is quoted text
  private val styles =
    s"""<?xml version="1.0" encoding="UTF-8"?>
       |<styleSheet xmlns="$SsMain">
       |<numFmts count="2">
       |  <numFmt numFmtId="164" formatCode="[Red]dd/mm/yyyy&quot;.&quot;"/>
       |  <numFmt numFmtId="165" formatCode="0.00&quot;m&quot;"/>
       |</numFmts>
       |<cellXfs count="4">
       |  <xf numFmtId="0"/>
       |  <xf numFmtId="14"/>
       |  <xf numFmtId="164"/>
       |  <xf numFmtId="165"/>
       |</cellXfs>
       |</styleSheet>""".stripMargin

  test("boolean cells render True/False regardless of the date opt-in") {
    val bytes = workbook(typedSheet, Some(styles))
    val row = XlsxSource.readSheetBytes(bytes, "S").head
    assert(row(0) == "True" && row(1) == "False")
  }

  test("date-styled serials turn ISO by default, stay raw behind the opt-out") {
    val bytes = workbook(typedSheet, Some(styles))
    val raw = XlsxSource.readSheetBytes(bytes, "S", dateSerials = false).head
    assert(raw(2) == "45382" && raw(3) == "45382.5")
    val iso = XlsxSource.readSheetBytes(bytes, "S").head
    assert(iso(2) == "2024-03-31")
    assert(iso(3) == "2024-03-31 12:00:00")
    // custom format with real date tokens counts as a date...
    assert(iso(4) == "2024-03-31")
    // ...but quoted "m" in a numeric format does NOT, and an unstyled
    // numeric cell never converts even when its value looks like a serial
    assert(iso(5) == "123.5" && iso(6) == "45382")
  }

  test("a workbook without styles.xml survives the date default") {
    val bytes = workbook(typedSheet, stylesXml = None)
    val row = XlsxSource.readSheetBytes(bytes, "S").head
    assert(row(2) == "45382" && row(0) == "True")
  }

  test("serialToIso epoch, 1900-leap-bug window, and rounding") {
    assert(XlsxSource.serialToIso(45292.0) == "2024-01-01")
    // openpyxl/pandas parity below the phantom 1900-02-29: serials
    // 1..59 get the +1-day correction (serial 1 IS 1900-01-01)
    assert(XlsxSource.serialToIso(1.0) == "1900-01-01")
    assert(XlsxSource.serialToIso(59.0) == "1900-02-28")
    assert(XlsxSource.serialToIso(59.5) == "1900-02-28 12:00:00")
    // 61 is the first serial past the phantom day: 1900-03-01
    assert(XlsxSource.serialToIso(61.0) == "1900-03-01")
    // a fraction one ulp under midnight rounds forward to the next day
    assert(XlsxSource.serialToIso(45382.9999999) == "2024-04-01 00:00:00")
  }

  test("a date1904 workbook renders serials from the 1904 epoch") {
    // serialToIso directly: the 1904 system has no phantom leap day
    assert(XlsxSource.serialToIso(0.0, date1904 = true) == "1904-01-01")
    assert(XlsxSource.serialToIso(366.0, date1904 = true) == "1905-01-01")
    assert(XlsxSource.serialToIso(45292.0, date1904 = true) == "2028-01-02")
    // end-to-end: same sheet, workbook.xml carries workbookPr date1904
    val wbXml1904 =
      s"""<?xml version="1.0" encoding="UTF-8"?>
         |<workbook xmlns="$SsMain"
         | xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
         |<workbookPr date1904="1"/>
         |<sheets><sheet name="S" sheetId="1" r:id="rId1"/></sheets>
         |</workbook>""".stripMargin
    val base = workbook(typedSheet, Some(styles))
    // rebuild the zip with the 1904 workbook.xml swapped in
    val zin = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(base))
    val bos = new ByteArrayOutputStream()
    val zos = new ZipOutputStream(bos)
    var e = zin.getNextEntry
    while (e != null) {
      zos.putNextEntry(new ZipEntry(e.getName))
      if (e.getName == "xl/workbook.xml") zos.write(wbXml1904.getBytes("UTF-8"))
      else zos.write(zin.readAllBytes())
      zos.closeEntry()
      e = zin.getNextEntry
    }
    zos.close()
    val row = XlsxSource.readSheetBytes(bos.toByteArray, "S").head
    // serial 45382 from 1904-01-01 = 2028-04-01 (vs 2024-03-31 in 1900)
    assert(row(2) == "2028-04-01")
  }

  test("zip bomb bounds at the cap and isolates in readMany") {
    // one entry that inflates far past the 256 MB cap (zeros deflate
    // ~1000:1, so the bomb itself is small on disk)
    val bos = new ByteArrayOutputStream()
    val zos = new ZipOutputStream(bos)
    zos.putNextEntry(new ZipEntry("xl/worksheets/sheet1.xml"))
    val chunk = new Array[Byte](1 << 20)
    (0 until 300).foreach(_ => zos.write(chunk))
    zos.closeEntry()
    zos.close()
    val bomb = bos.toByteArray
    intercept[IllegalArgumentException] {
      XlsxSource.readSheetBytes(bomb, "S")
    }
    // distributed scan: the bomb contributes zero rows, the good file reads
    val dir = java.nio.file.Files.createTempDirectory("graft_xlsx_bomb")
    java.nio.file.Files.write(dir.resolve("good.xlsx"),
      workbook(typedSheet, Some(styles)))
    java.nio.file.Files.write(dir.resolve("zz_bomb.xlsx"), bomb)
    val many = XlsxSource.readMany(spark, s"$dir/*.xlsx", "S", header = None)
    val srcs = many.select("src_file").distinct()
      .collect().map(_.getString(0)).toSeq
    assert(srcs.exists(_.endsWith("good.xlsx")))
    assert(!srcs.exists(_.endsWith("zz_bomb.xlsx")), "bomb leaked rows")
  }
}
