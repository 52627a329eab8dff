package graft

import graft.pipelines.DetailNotes
import graft.sources.PdfTextSource

/** PDF text source against the checked-in fixture
  * (fixtures/bin/calk_notes.pdf, regenerable via
  * tools/make_pdf_fixture.py): page 1 is FlateDecode-compressed, page 2
  * raw, and the text ops cover Tj, TJ arrays with kerning, hex strings,
  * the ' move-and-show operator, and escaped parentheses.
  */
class PdfTextSpec extends SparkSpec {
  import spark.implicits._

  private val pdf = "/root/repo/fixtures/bin/calk_notes.pdf"

  private val expectedLines = Vector(
    "PT Contoh Sejahtera Tbk",
    "Laporan Tahunan 2024",
    "Catatan Atas Laporan Keuangan",
    "1. Umum",
    "Entitas didirikan di Jakarta pada tahun 1995.",
    "Kantor pusat beralamat di Jalan Sudirman.",
    "2. Ikhtisar Kebijakan Akuntansi",
    "Dasar penyusunan laporan keuangan adalah biaya historis.",
    "2.a. Pernyataan Kepatuhan",
    "Laporan keuangan disusun sesuai SAK.",
    "3. Kas dan Setara Kas",
    "Saldo kas (lihat catatan 5) adalah 1.234.")

  test("extractLines decodes both stream flavors and all text ops") {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(pdf))
    assert(PdfTextSource.extractLines(bytes) == expectedLines)
  }

  test("toLinesDataFrame matches the textWithLineNo shape") {
    val df = PdfTextSource.toLinesDataFrame(spark, pdf)
    assert(df.columns.toSeq == Seq("line_no", "line"))
    val got = df.orderBy($"line_no").as[(Long, String)].collect().toSeq
    assert(got == expectedLines.zipWithIndex.map { case (l, i) => (i.toLong, l) })
  }

  test("extractCalkPdf sections the notes like the reference") {
    val rows = DetailNotes.extractCalkPdf(spark, pdf)
      .orderBy($"id").collect()
    assert(rows.map(_.getAs[String]("Nomor")).toSeq
      == Seq("1.", "2.", "2.a.", "3."))
    assert(rows.map(_.getAs[String]("calk")).toSeq == Seq(
      "1. Umum",
      "2. Ikhtisar Kebijakan Akuntansi",
      "2.a. Pernyataan Kepatuhan",
      "3. Kas dan Setara Kas"))
    assert(rows.map(_.getAs[String]("deskripsi")).toSeq == Seq(
      "Entitas didirikan di Jakarta pada tahun 1995. Kantor pusat beralamat di Jalan Sudirman.",
      "Dasar penyusunan laporan keuangan adalah biaya historis.",
      "Laporan keuangan disusun sesuai SAK.",
      "Saldo kas (lihat catatan 5) adalah 1.234."))
  }

  test("readMany parses N PDFs executor-side with per-file line order") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pdf_lake")
    (1 to 3).foreach { i =>
      java.nio.file.Files.copy(java.nio.file.Paths.get(pdf),
        dir.resolve(s"notes_$i.pdf"))
    }
    val many = PdfTextSource.readMany(spark, s"$dir/*.pdf").persist()
    assert(many.count() == 3L * expectedLines.length)
    val one = many.filter($"src_file" === "notes_2.pdf")
      .orderBy($"line_no").select("line").as[String].collect().toSeq
    assert(one == expectedLines)
    many.unpersist()
  }
}
