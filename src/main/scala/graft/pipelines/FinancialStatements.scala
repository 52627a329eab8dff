package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Canon, Clean, Compose, Ids, Ingest}

/** Pipeline B (dask-with-dataframe.py, the canonical Excel→warehouse
  * shape, SURVEY.md §3.1) end-to-end over a REAL XBRL workbook:
  *
  *   scalar emitent lookup (P1) → per-sheet ingest with positional
  *   canonical rename (P6) → clean_text (F1) → numeric coercion (F3) →
  *   group label (O1) → union-all with source rank (U1) → global 1-based
  *   ID over (src_rank, line_no) (O4) → canonical projection (P3).
  *
  * The three statement sheets carry *different* period headers
  * (CurrentYearDuration vs CurrentYearInstant vs PriorEndYearInstant —
  * SURVEY §1.3); the positional rename unifies them, which is exactly the
  * load-bearing canonicalization the reference performs.
  */
object FinancialStatements {

  val CanonicalColumns: Seq[String] =
    Seq("LaporanDetail", "CurrentYearInstant", "PriorYearInstant")

  /** One statement sheet → canonical (line_no, grup_lk, LaporanDetail,
    * CurrentYearInstant, PriorYearInstant).
    */
  def statementSheet(spark: SparkSession, path: String, sheet: String,
      label: String): DataFrame = {
    val raw = Ingest.withLineNo(Ingest.excel(spark, path, sheet, headerRow = 1))
    Canon.renamePositional(raw, CanonicalColumns)
      .select(
        col("line_no"),
        lit(label).as("grup_lk"),
        Clean.cleanTextV1(col("LaporanDetail")).as("LaporanDetail"),
        Clean.coerceNumeric(col("CurrentYearInstant")).as("CurrentYearInstant"),
        Clean.coerceNumeric(col("PriorYearInstant")).as("PriorYearInstant"))
      .filter(col("LaporanDetail") =!= "")
  }

  /** Full pipeline A (project-dask.py:23-88): the same three statement
    * sheets, but with the reference A-script's op order — truncate-64
    * identifiers (P7) → strict drop of the spillover column (P2) →
    * per-sheet sequential ID minted BEFORE the union (O3; IDs restart at
    * 1 in every statement, pandas' per-frame `range(1, len+1)`) →
    * emitent + LaporanKeuangan stamps → canonical positional rename →
    * reorder → concat (U1).
    */
  def pipelineA(spark: SparkSession, xlsxPath: String,
      sheets: Seq[(String, String)] = Seq(
        "1311000" -> "Laba Rugi",
        "1510000" -> "Arus Kas",
        "1210000" -> "Posisi Keuangan")): DataFrame = {
    val info = Ingest.excelRaw(spark, xlsxPath, "1000000")
    val emitent = Compose
      .lookupScalar(info, "_c0", "Kode entitas", "_c1")
      .getOrElse(throw new IllegalStateException("Kode entitas not found"))
    val frames = sheets.map { case (sheet, label) =>
      val raw = Ingest.withLineNo(Ingest.excel(spark, xlsxPath, sheet, headerRow = 1))
      // P7 then P2: the real workbook's 4th header cell is blank → pandas
      // mangles it to `Unnamed: 3`, the exact name the reference drops
      val canon = Canon.dropStrict(Canon.truncateNames(raw, 64), Seq("Unnamed: 3"))
      val renamed = Canon.renamePositional(canon, CanonicalColumns)
      Ids.withGlobalId(renamed, "ID", Seq(col("line_no")))
        .withColumn("emitent", lit(emitent))
        .withColumn("LaporanKeuangan", lit(label))
        .select(
          col("ID"), col("emitent"), col("LaporanKeuangan"),
          Clean.cleanTextV1(col("LaporanDetail")).as("LaporanDetail"),
          Clean.coerceNumeric(col("CurrentYearInstant")).as("CurrentYearInstant"),
          Clean.coerceNumeric(col("PriorYearInstant")).as("PriorYearInstant"))
    }
    frames.reduce(_.unionAll(_))
  }

  /** Full pipeline B. `sheets` maps sheet name → statement label
    * (defaults = the reference's three statements).
    */
  def pipelineB(spark: SparkSession, xlsxPath: String,
      sheets: Seq[(String, String)] = Seq(
        "1210000" -> "Posisi Keuangan",
        "1311000" -> "Laba Rugi",
        "1510000" -> "Arus Kas")): DataFrame = {
    // P1 scalar lookup on the general-information sheet (header=None)
    val info = Ingest.excelRaw(spark, xlsxPath, "1000000")
    val emitent = Compose
      .lookupScalar(info, "_c0", "Kode entitas", "_c1")
      .getOrElse(throw new IllegalStateException(
        "Kode entitas not found")) // reference exits fatally here too (B:66-68)
    val unioned = Compose.unionWithRank(
      sheets.map { case (sheet, label) => statementSheet(spark, xlsxPath, sheet, label) })
    Ids.withGlobalId(unioned, "ID", Seq(col("src_rank"), col("line_no")))
      .withColumn("emitent", lit(emitent))
      .select("ID", "emitent", "grup_lk", "LaporanDetail",
        "CurrentYearInstant", "PriorYearInstant")
  }
}
