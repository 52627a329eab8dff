package graft

import graft.ops.PdfTable
import graft.sources.PdfTextSource

/** Positioned-run extraction + table reconstruction against the
  * checked-in fixture (fixtures/bin/annual_table.pdf, regenerable via
  * tools/make_pdf_table_fixture.py): page 1 positions every cell with an
  * absolute Tm (one row written out of x-order, one row with sub-point
  * baseline jitter), page 2 with relative Td deltas plus a TJ-array
  * cell and a TL + ' footnote. Expected runs are hand-derived from the
  * fixture's operator streams.
  */
class PdfTableSpec extends SparkSpec {
  import spark.implicits._

  private val pdf = "/root/repo/fixtures/bin/annual_table.pdf"
  private def bytes = java.nio.file.Files.readAllBytes(
    java.nio.file.Paths.get(pdf))

  private val page1Runs = Vector(
    (72.0, 720.0, "PT Contoh Sejahtera Tbk"),
    (72.0, 704.0, "Laporan Posisi Keuangan"),
    (72.0, 660.0, "Keterangan"), (300.0, 660.0, "2024"), (400.0, 660.0, "2023"),
    (72.0, 640.0, "Kas dan setara kas"), (300.0, 640.0, "1.234"),
    (400.0, 640.0, "987"),
    (300.0, 620.0, "5.678"), (72.0, 620.0, "Piutang usaha"),
    (400.0, 620.0, "4.321"),
    (72.0, 600.5, "Persediaan"), (300.0, 600.0, "2.468"),
    (400.0, 599.6, "2.400"))

  // relative Td arithmetic: rows return via Td(-328, -20); the TJ array
  // is one run; the trailing ' shows at line start after a 16 TL
  private val page2Runs = Vector(
    (72.0, 720.0, "Laporan Laba Rugi"),
    (72.0, 680.0, "Keterangan"), (300.0, 680.0, "2024"),
    (400.0, 680.0, "2023"),
    (72.0, 660.0, "Pendapatan"), (300.0, 660.0, "9.000"),
    (400.0, 660.0, "8.500"),
    (72.0, 640.0, "Beban pokok"), (300.0, 640.0, "3.000"),
    (400.0, 640.0, "2.800"),
    (72.0, 620.0, "Laba kotor"), (300.0, 620.0, "6.000"),
    (400.0, 620.0, "5.700"),
    (72.0, 596.0, "Catatan:"),
    (72.0, 580.0, "Angka dalam jutaan rupiah"))

  test("extractPageRuns tracks Tm, Td deltas, TL and the ' operator") {
    val pages = PdfTextSource.extractPageRuns(bytes)
    assert(pages.length == 2)
    assert(pages(0) == page1Runs)
    assert(pages(1) == page2Runs)
  }

  test("rows reconstructs the grid: x-sort, y-banding, row order") {
    val grid = PdfTable.rows(PdfTextSource.toRunsDataFrame(spark, pdf))
      .orderBy($"page_no", $"row_no")
      .as[(Long, Long, Seq[String])].collect().toSeq
    assert(grid == Seq(
      (0L, 0L, Seq("PT Contoh Sejahtera Tbk")),
      (0L, 1L, Seq("Laporan Posisi Keuangan")),
      (0L, 2L, Seq("Keterangan", "2024", "2023")),
      (0L, 3L, Seq("Kas dan setara kas", "1.234", "987")),
      (0L, 4L, Seq("Piutang usaha", "5.678", "4.321")),
      (0L, 5L, Seq("Persediaan", "2.468", "2.400")),
      (1L, 0L, Seq("Laporan Laba Rugi")),
      (1L, 1L, Seq("Keterangan", "2024", "2023")),
      (1L, 2L, Seq("Pendapatan", "9.000", "8.500")),
      (1L, 3L, Seq("Beban pokok", "3.000", "2.800")),
      (1L, 4L, Seq("Laba kotor", "6.000", "5.700")),
      (1L, 5L, Seq("Catatan:")),
      (1L, 6L, Seq("Angka dalam jutaan rupiah"))))
  }

  test("same-position shows concatenate into one cell") {
    // two Tj at one (x, y) plus a third after a reposition: 2 cells
    val runs = Seq(
      (0L, 72.0, 700.0, "Piu"), (0L, 72.0, 700.0, "tang"),
      (0L, 300.0, 700.0, "42"))
      .toDF("page_no", "x", "y", "run")
    val grid = PdfTable.rows(runs)
      .as[(Long, Long, Seq[String])].collect().toSeq
    assert(grid == Seq((0L, 0L, Seq("Piutang", "42"))))
  }

  test("financialRows drops headers and coerces thousands-dot values") {
    val got = PdfTable.financialRows(PdfTextSource.toRunsDataFrame(spark, pdf))
      .orderBy($"page_no", $"item")
      .as[(Long, String, Double, Double)].collect().toSeq
    assert(got == Seq(
      (0L, "Kas dan setara kas", 1234.0, 987.0),
      (0L, "Persediaan", 2468.0, 2400.0),
      (0L, "Piutang usaha", 5678.0, 4321.0),
      (1L, "Beban pokok", 3000.0, 2800.0),
      (1L, "Laba kotor", 6000.0, 5700.0),
      (1L, "Pendapatan", 9000.0, 8500.0)))
  }

  test("damaged file: no geometry offered, line fallback still works") {
    // amputate the xref + trailer: the structural path must fail, and
    // the order-of-appearance fallback has no trustworthy positions —
    // extractPageRuns refuses (empty), while extractLines still reads
    val s = new String(bytes,
      java.nio.charset.StandardCharsets.ISO_8859_1)
    val cut = s.substring(0, s.lastIndexOf("xref"))
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(PdfTextSource.extractPageRuns(cut).isEmpty)
    assert(PdfTextSource.extractLines(cut).nonEmpty)
  }

  test("readManyRuns: per-file executor-side parse, extraKeys grouping") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pdf_tables")
    (1 to 3).foreach { i =>
      java.nio.file.Files.copy(java.nio.file.Paths.get(pdf),
        dir.resolve(s"report_$i.pdf"))
    }
    val runs = PdfTextSource.readManyRuns(spark, s"$dir/*.pdf")
    assert(runs.columns.toSeq == Seq("src_file", "page_no", "x", "y", "run"))
    assert(runs.count() == 3L * (page1Runs.length + page2Runs.length))
    val fin = graft.ops.PdfTable
      .financialRows(runs, extraKeys = Seq("src_file"))
    assert(fin.count() == 3L * 6)
    val one = fin.filter($"src_file".endsWith("report_2.pdf"))
      .orderBy($"page_no", $"item")
      .select($"item", $"curr").as[(String, Double)].collect().toSeq
    assert(one == Seq(
      ("Kas dan setara kas", 1234.0), ("Persediaan", 2468.0),
      ("Piutang usaha", 5678.0), ("Beban pokok", 3000.0),
      ("Laba kotor", 6000.0), ("Pendapatan", 9000.0)))
  }

  test("toRunsDataFrame enters the plan as a LocalTableScan") {
    val df = PdfTextSource.toRunsDataFrame(spark, pdf)
    assert(df.columns.toSeq == Seq("page_no", "x", "y", "run"))
    assert(df.queryExecution.executedPlan.toString.contains("LocalTableScan"))
  }
}
