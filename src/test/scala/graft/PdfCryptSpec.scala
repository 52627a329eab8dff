package graft



import graft.sources.{PdfCrypt, PdfTextSource}

/** Standard-security-handler decryption against the checked-in encrypted
  * fixtures (regenerable via tools/make_pdf_encrypted_fixtures.py). The
  * encryption side there is an INDEPENDENT Python implementation of ISO
  * 32000 Algorithms 2–5 / 2.B (hashlib + its own RC4 + `cryptography`
  * AES), and every fixture carries the same text as the plaintext
  * calk_notes.pdf — so "decrypts correctly" is pinned as "line-for-line
  * equal to the plaintext fixture's extraction", not as self-agreement
  * between our encryptor and decryptor.
  */
class PdfCryptSpec extends SparkSpec {

  private def bytes(name: String): Array[Byte] =
    java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"/root/repo/fixtures/bin/$name"))

  private lazy val plaintextLines =
    PdfTextSource.extractLines(bytes("calk_notes.pdf"))

  test("plaintext fixture extracts (sanity precondition)") {
    assert(plaintextLines.nonEmpty)
    assert(plaintextLines.head == "PT Contoh Sejahtera Tbk")
  }

  test("RC4 128-bit (V=2 R=3) decrypts to the plaintext lines") {
    assert(PdfTextSource.extractLines(bytes("calk_notes_rc4.pdf"))
      == plaintextLines)
  }

  test("AESV2 (V=4 R=4, AES-128-CBC) decrypts to the plaintext lines") {
    assert(PdfTextSource.extractLines(bytes("calk_notes_aesv2.pdf"))
      == plaintextLines)
  }

  test("AESV3 (V=5 R=6, AES-256 + hardened hash) decrypts to the plaintext lines") {
    assert(PdfTextSource.extractLines(bytes("calk_notes_aesv3.pdf"))
      == plaintextLines)
  }

  test("password-protected document yields zero lines, never garbage") {
    assert(PdfTextSource.extractLines(bytes("calk_notes_locked.pdf"))
      == Vector.empty)
  }

  test("page grouping survives decryption") {
    val pages = PdfTextSource.extractPageLines(bytes("calk_notes_aesv2.pdf"))
    assert(pages.length == 2)
    assert(pages.flatten == plaintextLines)
  }

  test("a broken-xref encrypted document never falls back to a ciphertext scan") {
    // corrupt the startxref offset: the structural path dies, and the
    // order-of-appearance fallback must refuse encrypted bytes
    val b = bytes("calk_notes_rc4.pdf")
    val s = new String(b, java.nio.charset.StandardCharsets.ISO_8859_1)
    val doctored = s.replaceAll("startxref\\n\\d+", "startxref\n999999")
    assert(doctored != s)
    assert(PdfTextSource.extractLines(
      doctored.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
      == Vector.empty)
  }

  test("RC4 round-trips (public-vector-free self-check of the keystream)") {
    // RC4 is its own inverse; independence from the Python side is
    // established by the fixture tests above
    val key = Array[Byte](1, 2, 3, 4, 5)
    val msg = "Laporan Keuangan 2024".getBytes("UTF-8")
    assert(PdfCrypt.rc4(key, PdfCrypt.rc4(key, msg)).sameElements(msg))
  }

  test("modern layout + encryption: AESV2 over xref stream/ObjStm/CID decodes like its plaintext twin") {
    // the real 2023-report shape: object stream, CMap, and content
    // streams are ALL ciphertext; the xref stream and the strings inside
    // the object stream are plaintext per spec. Expected text is pinned
    // to the unencrypted CID fixture's extraction.
    val plainCid = PdfTextSource.extractLines(bytes("calk_notes_cid.pdf"))
    assert(plainCid.nonEmpty)
    assert(PdfTextSource.extractLines(bytes("calk_notes_cid_aesv2.pdf"))
      == plainCid)
  }

  test("pdf_encrypted_sectionizer matches the plaintext query's sections per scheme") {
    val rows = graft.queries.Registry.queries("pdf_encrypted_sectionizer")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 12)
    assert(rows.map(_.getAs[String]("scheme")).distinct.sorted.toSeq
      == Seq("aesv2", "aesv3", "rc4"))
    val plain = graft.queries.Registry.queries("pdf_calk_sectionizer")(
      spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("Nomor"),
        r.getAs[String]("calk"), r.getAs[String]("deskripsi"))).toSeq
    Seq("rc4", "aesv2", "aesv3").foreach { scheme =>
      val got = rows.filter(_.getAs[String]("scheme") == scheme)
        .map(r => (r.getAs[Long]("id"), r.getAs[String]("Nomor"),
          r.getAs[String]("calk"), r.getAs[String]("deskripsi"))).toSeq
      assert(got == plain, s"scheme=$scheme")
    }
  }

  test("readMany decrypts executor-side: mixed plain/encrypted/locked glob") {
    // distributed ingest over a directory holding plaintext, three
    // encrypted variants, and a password-locked file: every readable
    // document contributes its full line set, the locked one zero
    // lines, and nothing throws (per-source failure isolation)
    val dir = java.nio.file.Files.createTempDirectory("graft_pdf_mix")
    Seq("calk_notes.pdf", "calk_notes_rc4.pdf", "calk_notes_aesv2.pdf",
        "calk_notes_aesv3.pdf", "calk_notes_locked.pdf").foreach { n =>
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"/root/repo/fixtures/bin/$n"),
        dir.resolve(n))
    }
    val df = PdfTextSource.readMany(spark, dir.toString + "/*.pdf")
    val perFile = df.groupBy("src_file").count().collect()
      .map(r => (r.getString(0).split('/').last, r.getLong(1))).toMap
    assert(perFile.keySet == Set("calk_notes.pdf", "calk_notes_rc4.pdf",
      "calk_notes_aesv2.pdf", "calk_notes_aesv3.pdf"))
    assert(perFile.values.toSet == Set(plaintextLines.length.toLong))
  }

  test("R6 hardened hash is deterministic and 32 bytes") {
    val h1 = PdfCrypt.hashR56(6, Array.emptyByteArray,
      "UVALSALT".getBytes("UTF-8"), Array.emptyByteArray)
    val h2 = PdfCrypt.hashR56(6, Array.emptyByteArray,
      "UVALSALT".getBytes("UTF-8"), Array.emptyByteArray)
    assert(h1.length == 32)
    assert(h1.sameElements(h2))
  }
}
