package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.{Canon, Compose, Ingest}
import graft.pipelines.FinancialStatements
import graft.sources.XlsxSource

/** Exercises the driver-side XLSX source and pipeline B against the
  * reference's actual workbook (read-only fixture).
  */
class XlsxIngestSpec extends SparkSpec {
  import spark.implicits._

  private val wb = "/root/repo/fixtures/xlsx/FinancialStatement-2024-I-ACES.xlsx"

  test("S2 + P1: headerless sheet scan and scalar lookup") {
    val info = Ingest.excelRaw(spark, wb, "1000000")
    assert(info.columns.take(2).toSeq == Seq("_c0", "_c1"))
    assert(Compose.lookupScalar(info, "_c0", "Kode entitas", "_c1")
      .contains("ACES"))
    assert(Compose.lookupScalar(info, "_c0", "Nama entitas", "_c1")
      .contains("Ace Hardware Indonesia Tbk"))
  }

  test("S1: header-row sheet scan mangles headers pandas-style") {
    val df = Ingest.excel(spark, wb, "1311000", headerRow = 1)
    // title row consumed; blank header cells -> Unnamed: i (pandas style)
    assert(df.columns.toSeq
      == Seq("Laporan laba rugi dan penghasilan komprehensif lain",
        "Unnamed: 1",
        "Statement of profit or loss and other comprehensive income",
        "Unnamed: 3"))
    assert(df.count() > 50)
  }

  test("readOrEmpty isolates a failing source") {
    val schema = StructType(Seq(StructField("x", StringType)))
    val df = Ingest.readOrEmpty(spark, schema) {
      Ingest.excelRaw(spark, wb, "NO_SUCH_SHEET")
    }
    assert(df.schema == schema && df.count() == 0)
  }

  test("pipeline B over the real workbook") {
    val out = FinancialStatements.pipelineB(spark, wb)
    val rows = out.collect()
    assert(rows.length > 300)
    assert(rows.forall(_.getAs[String]("emitent") == "ACES"))
    // IDs are 1..n contiguous in (src_rank, line_no) order
    assert(rows.map(_.getAs[Int]("ID")).sorted.toSeq == (1 to rows.length))
    assert(out.columns.toSeq == Seq("ID", "emitent", "grup_lk",
      "LaporanDetail", "CurrentYearInstant", "PriorYearInstant"))
    // all three statements present
    assert(out.select("grup_lk").distinct().count() == 3)
    // numerics coerced: at least some non-zero monetary values
    assert(out.filter($"CurrentYearInstant" =!= 0.0).count() > 50)
  }

  test("pipeline A over the real workbook: per-sheet IDs restart at 1") {
    val out = FinancialStatements.pipelineA(spark, wb).persist()
    val rows = out.collect()
    assert(rows.length > 300)
    assert(out.columns.toSeq == Seq("ID", "emitent", "LaporanKeuangan",
      "LaporanDetail", "CurrentYearInstant", "PriorYearInstant"))
    assert(rows.forall(_.getAs[String]("emitent") == "ACES"))
    val groups = out.select("LaporanKeuangan").distinct().collect()
      .map(_.getString(0)).sorted.toSeq
    assert(groups == Seq("Arus Kas", "Laba Rugi", "Posisi Keuangan"))
    // O3 contract: IDs are 1..len per sheet, not global
    groups.foreach { g =>
      val ids = rows.filter(_.getAs[String]("LaporanKeuangan") == g)
        .map(_.getAs[Int]("ID")).sorted.toSeq
      assert(ids == (1 to ids.length), s"$g IDs not contiguous from 1")
    }
    out.unpersist()
  }

  test("readMany: N-workbook distributed ingest equals the driver path per file") {
    // lake shape: the reference workbook replicated N times under a glob
    val dir = java.nio.file.Files.createTempDirectory("graft_xlsx_lake")
    val n = 4
    (1 to n).foreach { i =>
      java.nio.file.Files.copy(java.nio.file.Paths.get(wb),
        dir.resolve(f"wb_$i%02d.xlsx"))
    }
    val many = XlsxSource.readMany(spark, s"$dir/*.xlsx", "1311000",
      header = Some(1)).persist()
    val one = XlsxSource.toDataFrame(spark, wb, "1311000", header = Some(1))
    val oneRows = one.collect().map(_.toSeq)
    // same columns (after the provenance prefix), N files, n×rows
    assert(many.columns.take(2).toSeq == Seq("src_file", "row_no"))
    assert(many.columns.drop(2).toSeq == one.columns.toSeq)
    assert(many.select("src_file").distinct().count() == n)
    assert(many.count() == n.toLong * oneRows.length)
    // each file's rows equal the driver path's, in row_no order
    // (src_file carries the FULL path; match on the unique suffix)
    (1 to n).foreach { i =>
      val got = many.filter($"src_file".endsWith(f"wb_$i%02d.xlsx"))
        .orderBy($"row_no").drop("src_file", "row_no")
        .collect().map(_.toSeq)
      assert(got.toSeq == oneRows.toSeq, s"file $i diverged from driver path")
    }
    many.unpersist()
  }

  test("readMany: a corrupt workbook isolates to zero rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft_xlsx_corrupt")
    java.nio.file.Files.copy(java.nio.file.Paths.get(wb), dir.resolve("good.xlsx"))
    java.nio.file.Files.write(dir.resolve("bad.xlsx"),
      "this is not a zip".getBytes("UTF-8"))
    val many = XlsxSource.readMany(spark, s"$dir/*.xlsx", "1311000", Some(1))
    val bySrc = many.groupBy($"src_file").count()
      .as[(String, Long)].collect().toMap
    assert(bySrc.keys.exists(_.endsWith("good.xlsx"))
      && bySrc.collectFirst { case (k, v) if k.endsWith("good.xlsx") => v }.get > 50)
    assert(!bySrc.keys.exists(_.endsWith("bad.xlsx")), "corrupt workbook leaked rows")
  }

  test("mangle cascades past literal collisions like pandas") {
    // ["x", "x.1", "x"] must NOT produce a second "x.1" (duplicate
    // StructType fields make every by-name access ambiguous)
    assert(XlsxSource.mangle(Vector("x", "x.1", "x"))
      == Vector("x", "x.1", "x.2"))
    assert(XlsxSource.mangle(Vector("a", "a", "a"))
      == Vector("a", "a.1", "a.2"))
    assert(XlsxSource.mangle(Vector("", "b", ""))
      == Vector("Unnamed: 0", "b", "Unnamed: 2"))
  }

  test("readMany: headerless mode emits positional columns") {
    val dir = java.nio.file.Files.createTempDirectory("graft_xlsx_raw")
    java.nio.file.Files.copy(java.nio.file.Paths.get(wb), dir.resolve("a.xlsx"))
    val many = XlsxSource.readMany(spark, s"$dir/*.xlsx", "1000000", header = None)
    val one = XlsxSource.toDataFrame(spark, wb, "1000000", header = None)
    assert(many.columns.drop(2).toSeq == one.columns.toSeq)
    assert(many.count() == one.count())
  }

  test("Canon: positional rename, truncate, strict drop, pin-first") {
    val df = Seq((1, 2, 3)).toDF("a", "b", "c")
    assert(Canon.renamePositional(df, Seq("x", "y")).columns.toSeq
      == Seq("x", "y", "c"))
    assert(Canon.truncateNames(Seq((1, 2)).toDF("a" * 80, "b"), 64)
      .columns.head.length == 64)
    assert(Canon.pinFirst(df, Seq("c")).columns.toSeq == Seq("c", "a", "b"))
    intercept[IllegalArgumentException] {
      Canon.dropStrict(df, Seq("nope"))
    }
    assert(Canon.dropStrict(df, Seq("b")).columns.toSeq == Seq("a", "c"))
    assert(Canon.renameMap(df, Map("a" -> "z", "missing" -> "w")).columns.toSeq
      == Seq("z", "b", "c"))
  }

  test("propagateScalar: present-but-NULL cell falls back to default") {
    val lookup = Seq(Option.empty[String]).toDF("v")
    val out = graft.ops.Compose.propagateScalar(
      Seq(1).toDF("x"), lookup, "q", "Unknown")
    assert(out.select("q").first().getString(0) == "Unknown")
    assert(graft.ops.Compose.lookupScalar(
      Seq((Option.empty[String], "k")).toDF("v", "kk"), "kk", "k", "v").isEmpty)
  }

  test("random workbook corruption degrades, never hangs or escapes") {
    // executor-safety parity with the PDF fuzz net: arbitrary byte
    // damage must either parse or throw a catchable exception (which
    // readMany's per-file isolation turns into zero rows) — never an
    // uncaught error or a hang. Deterministic seed: regression net,
    // not a flake source.
    val base = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      "/root/repo/fixtures/xlsx/FinancialStatement-2024-I-ACES.xlsx"))
    val rnd = new scala.util.Random(8)
    (1 to 25).foreach { _ =>
      val mutated = base.clone()
      (1 to 1 + rnd.nextInt(12)).foreach { _ =>
        mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
      }
      try XlsxSource.readSheetBytes(mutated, "1000000")
      catch { case scala.util.control.NonFatal(_) => () }
    }
    Seq(10, 1000, 50000, base.length - 7).foreach { n =>
      try XlsxSource.readSheetBytes(base.take(n), "1000000")
      catch { case scala.util.control.NonFatal(_) => () }
    }
  }

  test("textWithLineNo numbers lines in file order") {
    val tmp = java.nio.file.Files.createTempFile("graft", ".txt")
    java.nio.file.Files.writeString(tmp, "alpha\nbeta\ngamma\n")
    val df = Ingest.textWithLineNo(spark, tmp.toString)
    // Tungsten-resident: the numbering is a codegen'd projection over
    // the file scan, not an rdd.zipWithIndex bridge
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Scan ExistingRDD"),
      s"line numbering left Tungsten:\n$plan")
    val got = df.orderBy($"line_no").as[(Long, String)].collect().toSeq
    assert(got == Seq((0L, "alpha"), (1L, "beta"), (2L, "gamma")))
  }
}
