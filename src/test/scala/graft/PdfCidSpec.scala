package graft

import java.nio.charset.StandardCharsets.ISO_8859_1

import graft.pipelines.DetailNotes
import graft.sources.{Pdf, PdfTextSource}

/** Structural PDF path against the checked-in MODERN-layout fixture
  * (fixtures/bin/calk_notes_cid.pdf, regenerable via
  * tools/make_pdf_cid_fixture.py): xref STREAM with PNG Up predictor,
  * object streams holding every dict, an indirect /Length, inherited
  * /Resources, and a subsetted Type0/CID font whose show strings are
  * glyph indices — text exists ONLY through the /ToUnicode CMap
  * (lowercase via scalar bfrange, digits via a REVERSED array bfrange,
  * the rest via scrambled bfchar entries).
  */
class PdfCidSpec extends SparkSpec {
  import spark.implicits._

  private val pdf = "/root/repo/fixtures/bin/calk_notes_cid.pdf"

  private val expectedLines = Vector(
    "PT Subset CID Tbk",
    "Catatan Atas Laporan Keuangan",
    "1. Umum",
    "Entitas didirikan tahun 2001 dengan fon CID subset.",
    "2. Ikhtisar Kebijakan",
    "Laporan disusun sesuai SAK.",
    "2.a. Instrumen Keuangan",
    "Nilai wajar diukur per 31 Desember 2023.",
    "3. Kas",
    "Saldo akhir 9.876.")

  private def bytes = java.nio.file.Files.readAllBytes(
    java.nio.file.Paths.get(pdf))

  test("extractLines decodes CID show strings through the ToUnicode CMap") {
    assert(PdfTextSource.extractLines(bytes) == expectedLines)
  }

  test("extractPageLines splits at the page-tree boundary") {
    val pages = PdfTextSource.extractPageLines(bytes)
    assert(pages.map(_.length) == Vector(4, 6))
    assert(pages.flatten == expectedLines)
    val paged = PdfTextSource.toPagedLinesDataFrame(spark, pdf)
      .as[(Long, Long, String)].collect().toVector
    assert(paged.count(_._1 == 0L) == 4 && paged.count(_._1 == 1L) == 6)
    // line_no restarts per page
    assert(paged.filter(_._1 == 1L).map(_._2) == (0L until 6L).toVector)
  }

  test("the raw byte scan alone cannot read this file (CID is load-bearing)") {
    // the fallback path (file-order streams, simple-font semantics) on
    // the same bytes: glyph-index bytes are NOT the text — proving the
    // structural+CMap path is what decodes this fixture, not luck
    val s = new String(bytes, ISO_8859_1)
    assert(!s.contains("Umum") && !s.contains("Keuangan"),
      "fixture must not contain plaintext outside the CMap")
  }

  test("extractCalkPdf sections the CID notes like the reference") {
    val rows = DetailNotes.extractCalkPdf(spark, pdf).orderBy($"id").collect()
    assert(rows.map(_.getAs[String]("Nomor")).toSeq
      == Seq("1.", "2.", "2.a.", "3."))
    assert(rows.map(_.getAs[String]("deskripsi")).toSeq == Seq(
      "Entitas didirikan tahun 2001 dengan fon CID subset.",
      "Laporan disusun sesuai SAK.",
      "Nilai wajar diukur per 31 Desember 2023.",
      "Saldo akhir 9.876."))
  }

  test("a damaged startxref falls back to the order-of-appearance scan") {
    // classic fixture: both paths decode it; breaking the xref offset
    // must degrade to the fallback, not to zero lines
    val classic = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/repo/fixtures/bin/calk_notes.pdf"))
    val s = new String(classic, ISO_8859_1)
    val broken = s.replaceFirst("(?s)startxref\\s*\\d+", "startxref\n999999999")
    val lines = PdfTextSource.extractLines(broken.getBytes(ISO_8859_1))
    assert(lines.contains("1. Umum") && lines.contains("3. Kas dan Setara Kas"))
  }

  test("an encrypted document yields zero lines, not ciphertext garbage") {
    val s = new String(
      java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/root/repo/fixtures/bin/calk_notes.pdf")),
      ISO_8859_1)
    val encrypted = s.replaceFirst("/Size", "/Encrypt 99 0 R /Size")
    assert(encrypted != s)
    assert(PdfTextSource.extractLines(encrypted.getBytes(ISO_8859_1)).isEmpty)
  }

  test("random byte corruption never throws out of extractLines") {
    // executor-safety contract: arbitrary damage degrades, never kills.
    // Deterministic seed — this is a regression net, not a flake source.
    val rnd = new scala.util.Random(8)
    val base = bytes
    (1 to 40).foreach { _ =>
      val mutated = base.clone()
      (1 to 1 + rnd.nextInt(8)).foreach { _ =>
        mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
      }
      PdfTextSource.extractLines(mutated) // must not throw
    }
    // truncations too, including mid-stream and mid-xref cuts
    Seq(7, 100, 500, 1000, 1500, base.length - 5).foreach { n =>
      PdfTextSource.extractLines(base.take(n))
    }
  }

  test("PNG Up/Sub/Paeth predictors reconstruct") {
    // round-trip a tiny 3-column image through each filter type
    val rows = Vector(Vector(10, 20, 30), Vector(13, 24, 35), Vector(1, 2, 3))
    def encode(filter: Int): Array[Byte] = {
      val out = Array.newBuilder[Byte]
      var prev = Vector(0, 0, 0)
      rows.foreach { r =>
        out += filter.toByte
        r.indices.foreach { i =>
          val a = if (i > 0) r(i - 1) else 0
          val b = prev(i)
          val c = if (i > 0) prev(i - 1) else 0
          val x = filter match {
            case 0 => r(i)
            case 1 => (r(i) - a) & 0xff
            case 2 => (r(i) - b) & 0xff
            case 3 => (r(i) - (a + b) / 2) & 0xff
            case 4 =>
              val p = a + b - c
              val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
              val paeth = if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
              (r(i) - paeth) & 0xff
          }
          out += x.toByte
        }
        prev = r
      }
      out.result()
    }
    (0 to 4).foreach { f =>
      val got = Pdf.unpredict(encode(f), predictor = 12, columns = 3)
      assert(got.map(_ & 0xff).toVector == rows.flatten, s"filter $f")
    }
  }

  test("ToUnicode parser: bfchar, scalar bfrange, array bfrange") {
    val cmap = """/CIDInit /ProcSet findresource begin
      |begincmap
      |1 begincodespacerange
      |<0000> <FFFF>
      |endcodespacerange
      |2 beginbfchar
      |<0101> <0041>
      |<0108> <00E9>
      |endbfchar
      |1 beginbfrange
      |<0010> <0012> <0061>
      |endbfrange
      |1 beginbfrange
      |<0200> <0201> [<0039> <0038>]
      |endbfrange
      |endcmap
      |end""".stripMargin.getBytes(ISO_8859_1)
    val m = Pdf.parseToUnicode(cmap)
    assert(m(0x101) == "A" && m(0x108) == "é")
    assert(m(0x10) == "a" && m(0x11) == "b" && m(0x12) == "c")
    assert(m(0x200) == "9" && m(0x201) == "8")
  }

  test("readMany parses classic and CID PDFs side by side, executor-side") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pdf_mix")
    java.nio.file.Files.copy(java.nio.file.Paths.get(pdf),
      dir.resolve("cid.pdf"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/repo/fixtures/bin/calk_notes.pdf"),
      dir.resolve("classic.pdf"))
    val got = PdfTextSource.readMany(spark, s"$dir/*.pdf")
      .as[(String, Long, String)].collect()
      .groupBy(_._1.split('/').last)
      .map { case (f, rows) => f -> rows.sortBy(_._2).map(_._3).toVector }
    assert(got("cid.pdf") == expectedLines)
    assert(got("classic.pdf").contains("2.a. Pernyataan Kepatuhan"))
  }
}
