package graft

import graft.sources.XlsxSource

/** The graft-xlsx DataSource V2 connector: readMany's contract as a
  * first-class table, plus column pruning and planning-time file
  * pruning.
  */
class XlsxDsv2Spec extends SparkSpec {
  import spark.implicits._

  private val wb = "/root/repo/fixtures/xlsx/FinancialStatement-2024-I-ACES.xlsx"

  test("dsv2 read equals the readMany path (header mode)") {
    val v2 = spark.read.format("graft-xlsx")
      .option("sheet", "1311000").option("header", "1")
      .load(wb)
    val many = XlsxSource.readMany(spark, wb, "1311000", header = Some(1))
    assert(v2.columns.toSeq == many.columns.toSeq)
    assert(v2.orderBy($"row_no").collect().map(_.toSeq).toSeq ==
      many.orderBy($"row_no").collect().map(_.toSeq).toSeq)
  }

  test("dsv2 headerless mode emits positional columns") {
    val v2 = spark.read.format("graft-xlsx")
      .option("sheet", "1000000")
      .load(wb)
    assert(v2.columns.take(4).toSeq == Seq("src_file", "row_no", "_c0", "_c1"))
    assert(v2.count() > 0)
  }

  test("column pruning: a 1-column projection reaches the scan pruned") {
    val df = spark.read.format("graft-xlsx")
      .option("sheet", "1000000")
      .load(wb)
      .select($"_c0")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("cols=_c0,"), s"scan not pruned:\n$plan")
    assert(df.count() > 0)
  }

  test("loading a plain directory path lists its files") {
    val dir = java.nio.file.Files.createTempDirectory("graft_xlsx_dirload")
    (1 to 2).foreach { i =>
      java.nio.file.Files.copy(java.nio.file.Paths.get(wb),
        dir.resolve(f"wb_$i%02d.xlsx"))
    }
    val df = spark.read.format("graft-xlsx")
      .option("sheet", "1311000").option("header", "1")
      .load(dir.toString)
    assert(df.select($"src_file").distinct().count() == 2)
  }

  test("file pruning + per-file failure isolation across a lake glob") {
    val dir = java.nio.file.Files.createTempDirectory("graft_xlsx_dsv2")
    (1 to 3).foreach { i =>
      java.nio.file.Files.copy(java.nio.file.Paths.get(wb),
        dir.resolve(f"wb_$i%02d.xlsx"))
    }
    // one corrupt workbook: must isolate to zero rows, not kill the scan
    java.nio.file.Files.write(dir.resolve("wb_99.xlsx"),
      "this is not a zip".getBytes)
    val df = spark.read.format("graft-xlsx")
      .option("sheet", "1311000").option("header", "1")
      .load(s"$dir/*.xlsx")
    assert(df.rdd.getNumPartitions == 4)
    assert(df.select($"src_file").distinct().count() == 3)
    val uri = df.select($"src_file").as[String].head()
      .replaceAll("wb_[0-9]+\\.xlsx$", "wb_02.xlsx")
    val pruned = df.filter($"src_file" === uri)
    assert(pruned.rdd.getNumPartitions == 1,
      s"expected 1 partition after file pruning, got ${pruned.rdd.getNumPartitions}")
    assert(pruned.count() > 0)
  }
}
