package graft

import java.nio.charset.StandardCharsets.ISO_8859_1
import scala.collection.mutable

import graft.sources.{Pdf, PdfTextSource}

/** The non-flate stream filters of the structural PDF path: ASCIIHex,
  * ASCII85, and LZW (the PDF flavor: 9→12-bit MSB codes, clear=256,
  * EOD=257, EarlyChange=1) — plus end-to-end proof that a document
  * whose content stream uses them still extracts (filters are applied
  * by PdfDoc.decodeStream, structural path only).
  */
class PdfFiltersSpec extends SparkSpec {

  test("ASCIIHexDecode: pairs, whitespace, odd tail, terminator") {
    assert(Pdf.asciiHexDecode("48 65 6C\n6c 6F>".getBytes(ISO_8859_1))
      .sameElements("Hello".getBytes(ISO_8859_1)))
    // odd final digit pads with 0; data after '>' ignored
    assert(Pdf.asciiHexDecode("417>FF".getBytes(ISO_8859_1))
      .sameElements(Array[Byte](0x41, 0x70)))
  }

  test("ASCII85Decode: groups, z shortcut, partial tail, terminator") {
    // "Man " encodes to 9jqo^ in ASCII85
    assert(new String(Pdf.ascii85Decode("9jqo^~>".getBytes(ISO_8859_1)),
      ISO_8859_1) == "Man ")
    assert(Pdf.ascii85Decode("z~>".getBytes(ISO_8859_1))
      .sameElements(Array[Byte](0, 0, 0, 0)))
    // partial group: "Man" (3 bytes) -> 4 chars
    val enc3 = Pdf.ascii85Decode("9jqo~>".getBytes(ISO_8859_1))
    assert(new String(enc3, ISO_8859_1) == "Man")
  }

  /** Reference LZW encoder (PDF semantics, EarlyChange=1) — exists only
    * to round-trip the decoder.
    */
  private def lzwEncode(data: Array[Byte]): Array[Byte] = {
    val dict = mutable.Map.empty[Vector[Byte], Int]
    var nextCode = 258
    var width = 9
    val out = new java.io.ByteArrayOutputStream()
    var acc = 0L
    var nbits = 0
    def emit(code: Int): Unit = {
      acc = (acc << width) | code
      nbits += width
      while (nbits >= 8) {
        out.write(((acc >> (nbits - 8)) & 0xff).toInt)
        nbits -= 8
      }
    }
    emit(256) // leading clear
    var w = Vector.empty[Byte]
    def codeOf(v: Vector[Byte]): Int =
      if (v.length == 1) v.head & 0xff else dict(v)
    data.foreach { b =>
      val wb = w :+ b
      if (wb.length == 1 || dict.contains(wb)) w = wb
      else {
        emit(codeOf(w))
        if (nextCode < 4096) {
          dict(wb) = nextCode
          nextCode += 1
          // EarlyChange=1, seen from the encoder side: the encoder's
          // table runs one entry AHEAD of the decoder's at the same
          // stream position, so it widens at nextCode >= 2^w exactly
          // when the decoder's `dictSize + 1 >= 2^w` fires
          if (nextCode >= (1 << width) && width < 12) width += 1
        }
        w = Vector(b)
      }
    }
    if (w.nonEmpty) emit(codeOf(w))
    emit(257) // EOD
    if (nbits > 0) out.write(((acc << (8 - nbits)) & 0xff).toInt)
    out.toByteArray
  }

  test("LZWDecode round-trips: repetitive, random, and width-growth data") {
    val rnd = new scala.util.Random(42)
    val cases = Seq(
      "aaaaaaaaaabbbbbbbbbbababababab".getBytes(ISO_8859_1),
      Array.fill(30000)((rnd.nextInt(8) + 'a').toByte), // grows past 1023 codes
      Array.fill(5000)(rnd.nextInt(256).toByte),
      Array.emptyByteArray,
      Array[Byte](0))
    cases.zipWithIndex.foreach { case (c, i) =>
      val got = Pdf.lzwDecode(lzwEncode(c))
      assert(got.sameElements(c), s"case $i: ${got.length} vs ${c.length}")
    }
  }

  test("LZW garbage input bounds instead of throwing") {
    val rnd = new scala.util.Random(7)
    (1 to 20).foreach { _ =>
      Pdf.lzwDecode(Array.fill(200)(rnd.nextInt(256).toByte)) // must not throw
    }
  }

  /** Minimal classic one-page PDF whose content stream is encoded with
    * `filterName`; offsets computed so the xref table is valid (the
    * structural path — the only one that applies filters — must engage).
    */
  private def onePagePdf(filterName: String, encoded: Array[Byte]): Array[Byte] = {
    val objs = Vector(
      "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n".getBytes(ISO_8859_1),
      ("2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n").getBytes(ISO_8859_1),
      ("3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        "/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>\nendobj\n").getBytes(ISO_8859_1),
      (s"4 0 obj\n<< /Length ${encoded.length} /Filter /$filterName >>\nstream\n").getBytes(ISO_8859_1)
        ++ encoded ++ "\nendstream\nendobj\n".getBytes(ISO_8859_1),
      ("5 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n").getBytes(ISO_8859_1))
    val buf = mutable.ArrayBuffer.empty[Byte]
    buf ++= "%PDF-1.4\n".getBytes(ISO_8859_1)
    val offsets = objs.map { o => val at = buf.length; buf ++= o; at }
    val xrefAt = buf.length
    buf ++= s"xref\n0 ${objs.length + 1}\n".getBytes(ISO_8859_1)
    buf ++= "0000000000 65535 f \n".getBytes(ISO_8859_1)
    offsets.foreach(o => buf ++= f"$o%010d 00000 n \n".getBytes(ISO_8859_1))
    buf ++= (s"trailer\n<< /Size ${objs.length + 1} /Root 1 0 R >>\n" +
      s"startxref\n$xrefAt\n%%EOF\n").getBytes(ISO_8859_1)
    buf.toArray
  }

  test("content streams behind LZW / ASCIIHex / ASCII85 extract end-to-end") {
    val content = "BT /F1 12 Tf 72 720 Td (Neraca LZW 2024) Tj ET"
      .getBytes(ISO_8859_1)
    val hex = (content.map(b => f"${b & 0xff}%02X").mkString + ">")
      .getBytes(ISO_8859_1)
    val cases = Seq(
      "LZWDecode" -> lzwEncode(content),
      "ASCIIHexDecode" -> hex)
    cases.foreach { case (f, enc) =>
      val lines = PdfTextSource.extractLines(onePagePdf(f, enc))
      assert(lines == Vector("Neraca LZW 2024"), s"filter $f: $lines")
    }
  }
}
