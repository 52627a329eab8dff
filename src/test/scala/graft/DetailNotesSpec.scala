package graft

import java.nio.file.Files
import graft.pipelines.DetailNotes

class DetailNotesSpec extends SparkSpec {
  import spark.implicits._

  test("extractCalk: marker gate + numbered headings + accumulated bodies") {
    val tmp = Files.createTempFile("calk", ".txt")
    Files.writeString(tmp,
      """PT Contoh Tbk
        |Laporan Auditor Independen
        |Catatan Atas Laporan Keuangan
        |1. Umum
        |Perusahaan didirikan tahun 1995.
        |Kantor pusat di Jakarta.
        |1.a. Anak perusahaan
        |Memiliki tiga anak perusahaan.
        |2. Ikhtisar kebijakan akuntansi
        |Disusun sesuai SAK.
        |""".stripMargin)
    val got = DetailNotes.extractCalk(spark, tmp.toString)
      .select($"Nomor", $"calk", $"deskripsi")
      .as[(String, String, String)].collect().toSeq
    assert(got == Seq(
      ("1.", "1. Umum",
        "Perusahaan didirikan tahun 1995. Kantor pusat di Jakarta."),
      ("1.a.", "1.a. Anak perusahaan", "Memiliki tiga anak perusahaan."),
      ("2.", "2. Ikhtisar kebijakan akuntansi", "Disusun sesuai SAK.")))
  }

  test("extractCalk without marker -> empty") {
    val tmp = Files.createTempFile("calk2", ".txt")
    Files.writeString(tmp, "no marker here\n1. heading\nbody\n")
    assert(DetailNotes.extractCalk(spark, tmp.toString).count() == 0)
  }
}
