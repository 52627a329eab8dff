package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Ingest, Sectionize}

/** Pipeline D (detail_notes.py, SURVEY.md §3.3): notes-to-financials
  * (CALK) text → stateful sectionizer → (Nomor, CALK, Deskripsi) rows.
  *
  * The reference's mutable-loop fold becomes the running-sum window
  * sectionizer; the section-marker gate ("Catatan Atas Laporan Keuangan",
  * F11) and numbered-heading regex (F10) are the same predicates it used.
  */
object DetailNotes {

  /** F10: `^(\d+(\.\w+)*\.)\s+(.*)` — headings like `1.`, `1.a.`, `2.b.i.` */
  val HeadingPattern = "^(\\d+(\\.\\w+)*\\.)\\s+.*"

  /** F11: everything before this marker line is preamble and dropped. */
  val SectionMarker = "Catatan Atas Laporan Keuangan"

  /** Extract CALK sections from a text file of notes lines. */
  def extractCalk(spark: SparkSession, path: String): DataFrame =
    extractCalkLines(spark, Ingest.textWithLineNo(spark, path))

  /** Extract CALK sections straight from a PDF (the reference's actual
    * input, detail_notes.py:30-38): PdfTextSource supplies the ordered
    * line stream, the sectionizer algebra is shared with the text path.
    */
  def extractCalkPdf(spark: SparkSession, pdfPath: String): DataFrame =
    extractCalkLines(spark,
      graft.sources.PdfTextSource.toLinesDataFrame(spark, pdfPath))

  // private[graft]: the graft-pdf DSv2 query path feeds its own
  // (line_no, line) frame — same sectionizer algebra, different scan
  private[graft] def extractCalkLines(spark: SparkSession, lines: DataFrame): DataFrame = {
    // marker gate: keep only lines STRICTLY AFTER the first marker line
    // (the reference consumes the marker line itself, detail_notes.py:42-44)
    val markerNo = lines
      .filter(col("line").contains(SectionMarker))
      .agg(min(col("line_no")).as("m"))
      .collect()(0)
    if (markerNo.isNullAt(0)) return emptyResult(spark)
    val gated = lines.filter(col("line_no") > markerNo.getLong(0))
    Sectionize.sectionize(
        gated,
        orderCol = col("line_no"),
        isHead = regexp_like(col("line"), lit(HeadingPattern)),
        lineCol = col("line"))
      .select(
        col("section_no").as("id"),
        regexp_extract(col("heading"), HeadingPattern, 1).as("Nomor"),
        col("heading").as("calk"),
        col("body").as("deskripsi"))
      .orderBy(col("id"))
  }

  private def emptyResult(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("id", LongType),
        StructField("Nomor", StringType),
        StructField("calk", StringType),
        StructField("deskripsi", StringType))))
  }
}
