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

  test("indirect /Length (N 0 R) falls through to the endstream scan") {
    // rewrite the fixture's RAW stream dict to an indirect length ref —
    // a backtracking /Length regex would truncate the stream to 1 byte
    // and silently lose page 2's text
    val s = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(pdf)),
      java.nio.charset.StandardCharsets.ISO_8859_1)
    val rewritten = s.replaceFirst("""<< /Length \d+ >>""", "<< /Length 12 0 R >>")
    assert(rewritten != s, "fixture should contain a raw-stream dict")
    val lines = PdfTextSource.extractLines(
      rewritten.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    assert(lines == expectedLines)
  }

  test("binary streams and garbage hex runs never crash extraction") {
    // a fake image XObject whose binary payload contains BT/ET and a
    // non-hex '<' run — must contribute nothing and must not throw
    val junkStream = ("9 0 obj\n<< /Subtype /Image /Length 16 >>\nstream\n"
      + "BT <zz!!> Tj ET\n" + "\nendstream\nendobj\n")
    val base = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(pdf)),
      java.nio.charset.StandardCharsets.ISO_8859_1)
    val doctored = (base + junkStream)
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(PdfTextSource.extractLines(doctored) == expectedLines)
    // same bytes but WITHOUT the image marker: the garbage hex run
    // yields an empty string instead of NumberFormatException
    val doctored2 = (base + junkStream.replace("/Subtype /Image ", ""))
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(PdfTextSource.extractLines(doctored2) == expectedLines)
  }

  test("property: build→extract round-trips arbitrary ASCII lines") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // printable ASCII incl ( ) \ — the escape-sensitive characters
    val lineGen = Gen.nonEmptyListOf(Gen.choose(32.toChar, 126.toChar))
      .map(_.mkString.trim).suchThat(_.nonEmpty)
    val docGen = for {
      lines <- Gen.nonEmptyListOf(lineGen).map(_.take(20))
      flate <- Gen.oneOf(true, false)
      asHex <- Gen.listOfN(lines.length, Gen.oneOf(true, false))
    } yield (lines, flate, asHex)
    val prop = Prop.forAll(docGen) { case (lines, flate, asHex) =>
      val bytes = buildPdf(lines.zip(asHex), flate)
      PdfTextSource.extractLines(bytes) == lines.toVector
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }

  /** Minimal single-page PDF builder (test-only mirror of
    * tools/make_pdf_fixture.py): each line shown as a literal string
    * (escaped) or a hex string; the content stream optionally
    * Flate-compressed.
    */
  private def buildPdf(lines: Seq[(String, Boolean)], flate: Boolean): Array[Byte] = {
    def esc(s: String) = s.replace("\\", "\\\\")
      .replace("(", "\\(").replace(")", "\\)")
    def hex(s: String) = s.map(c => f"${c.toInt}%02X").mkString
    val body = lines.zipWithIndex.map { case ((l, asHex), j) =>
      val move = if (j == 0) "72 720 Td" else "0 -16 Td"
      val show = if (asHex) s"<${hex(l)}> Tj" else s"(${esc(l)}) Tj"
      s"$move $show"
    }.mkString("BT /F1 12 Tf\n", "\n", "\nET")
    val raw = body.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val data = if (flate) {
      val d = new java.util.zip.Deflater()
      d.setInput(raw); d.finish()
      val buf = new Array[Byte](raw.length * 2 + 64)
      val n = d.deflate(buf); d.end()
      java.util.Arrays.copyOf(buf, n)
    } else raw
    val filter = if (flate) " /Filter /FlateDecode" else ""
    val objs = Seq(
      "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1),
      "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1),
      ("3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        + "/Contents 4 0 R >>\nendobj\n").getBytes(java.nio.charset.StandardCharsets.ISO_8859_1),
      (s"4 0 obj\n<< /Length ${data.length}$filter >>\nstream\n"
        .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
        ++ data ++ "\nendstream\nendobj\n".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)))
    val out = new java.io.ByteArrayOutputStream()
    out.write("%PDF-1.4\n".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    val offsets = objs.map { o => val off = out.size(); out.write(o); off }
    val xref = out.size()
    out.write((s"xref\n0 ${objs.length + 1}\n0000000000 65535 f \n"
      + offsets.map(o => f"$o%010d 00000 n \n").mkString
      + s"trailer\n<< /Size ${objs.length + 1} /Root 1 0 R >>\n"
      + s"startxref\n$xref\n%%EOF\n").getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    out.toByteArray
  }

  test("readMany parses N PDFs executor-side with per-file line order") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pdf_lake")
    (1 to 3).foreach { i =>
      java.nio.file.Files.copy(java.nio.file.Paths.get(pdf),
        dir.resolve(s"notes_$i.pdf"))
    }
    val many = PdfTextSource.readMany(spark, s"$dir/*.pdf").persist()
    assert(many.count() == 3L * expectedLines.length)
    val one = many.filter($"src_file".endsWith("notes_2.pdf"))
      .orderBy($"line_no").select("line").as[String].collect().toSeq
    assert(one == expectedLines)
    many.unpersist()
  }
}
