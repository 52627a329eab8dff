package graft

import org.apache.spark.sql.functions._

import graft.sources.PdfTextSource

/** The graft-pdf DataSource V2 connector: same extraction contract as
  * the driver-side paths, plus the three V2-only properties — per-file
  * partitions, column pruning, and planning-time file pruning.
  */
class PdfDsv2Spec extends SparkSpec {
  import spark.implicits._

  private val binDir = "/root/repo/fixtures/bin"
  private val calk = s"$binDir/calk_notes.pdf"

  test("dsv2 lines equal the driver-side per-page extraction") {
    val v2 = spark.read.format("graft-pdf").load(calk)
      .select($"page_no", $"line_no", $"line")
      .as[(Long, Long, String)].collect().toSeq.sorted
    val direct = PdfTextSource.toPagedLinesDataFrame(spark, calk)
      .select($"page_no", $"line_no", $"line")
      .as[(Long, Long, String)].collect().toSeq.sorted
    assert(v2.nonEmpty && v2 == direct)
  }

  test("one input partition per file; encrypted variants decode too") {
    val df = spark.read.format("graft-pdf").load(s"$binDir/calk_notes*.pdf")
    val files = df.select($"src_file").distinct().count()
    // calk_notes + aesv2/aesv3/rc4/cid/cid_aesv2/locked = 7 fixture files
    assert(files >= 6, s"expected >=6 decodable files, got $files")
    assert(df.rdd.getNumPartitions == 7,
      s"expected 7 partitions (one per file), got ${df.rdd.getNumPartitions}")
    // the empty-password encrypted variants must yield the same text as
    // the plain file (locked has a REAL password -> zero lines, never
    // ciphertext garbage)
    val plain = df.filter($"src_file".endsWith("/calk_notes.pdf"))
      .select($"line").as[String].collect().toSeq
    val rc4 = df.filter($"src_file".endsWith("/calk_notes_rc4.pdf"))
      .select($"line").as[String].collect().toSeq
    val locked = df.filter($"src_file".endsWith("/calk_notes_locked.pdf")).count()
    assert(plain.nonEmpty && plain == rc4)
    assert(locked == 0L)
  }

  test("column pruning reaches the scan") {
    val df = spark.read.format("graft-pdf").load(calk).select($"page_no")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("cols=page_no,"), s"scan not pruned:\n$plan")
    assert(df.distinct().as[Long].collect().sorted.toSeq == Seq(0L, 1L))
  }

  test("src_file equality prunes files at planning time") {
    val glob = s"$binDir/calk_notes*.pdf"
    val full = spark.read.format("graft-pdf").load(glob)
    val uri = full.select($"src_file").as[String].head()
      .replaceAll("calk_notes[^/]*\\.pdf$", "calk_notes.pdf")
    val pruned = spark.read.format("graft-pdf").load(glob)
      .filter($"src_file" === uri)
    assert(pruned.rdd.getNumPartitions == 1,
      s"expected 1 partition after file pruning, got ${pruned.rdd.getNumPartitions}")
    assert(pruned.queryExecution.executedPlan.toString.contains("PushedFilters"))
    // and the pruned read still returns exactly the plain file's rows
    assert(pruned.count() ==
      full.filter($"src_file" === uri).select($"line").count())
  }
}
