package graft.ops

import scala.util.Try

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.sources.XlsxSource

/** Source composition — SURVEY.md §2.1 (S1-S4) and §2.13 (per-source
  * failure isolation): every ingestion point mints an explicit line
  * number (SURVEY §2.10's order discipline — Spark relations are
  * orderless, pandas' implicit index must become a column), and a failing
  * source degrades to an empty frame instead of killing the pipeline.
  */
object Ingest {

  /** §2.13: the reference returns an empty DataFrame when one sheet/PDF
    * fails and continues (dask-with-dataframe.py:58-60,
    * dask-with-dataframe-[2].py:144-146). Same contract: evaluate the
    * source thunk, fall back to an empty frame with the declared schema.
    */
  def readOrEmpty(spark: SparkSession, schema: StructType)
      (source: => DataFrame): DataFrame =
    Try(source).getOrElse(
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema))

  /** S4: text file as (line_no, line) rows. `zipWithIndex` numbers rows in
    * file order (read.text preserves in-file order across splits) with one
    * lightweight count job — no global window, no single-task funnel.
    */
  def textWithLineNo(spark: SparkSession, path: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("line_no", LongType, nullable = false),
      StructField("line", StringType)))
    val rdd = spark.read.textFile(path).rdd
      .zipWithIndex()
      .map { case (line, idx) => Row(idx, line) }
    spark.createDataFrame(rdd, schema)
  }

  /** S1: Excel worksheet with a header row (pandas `header=n`). */
  def excel(spark: SparkSession, path: String, sheet: String,
      headerRow: Int): DataFrame =
    XlsxSource.toDataFrame(spark, path, sheet, Some(headerRow))

  /** S2: headerless key-value worksheet (pandas `header=None`) —
    * positional `_c0.._cN` columns.
    */
  def excelRaw(spark: SparkSession, path: String, sheet: String): DataFrame =
    XlsxSource.toDataFrame(spark, path, sheet, None)

  /** Add a 0-based line_no to an in-memory-ordered frame (driver-parsed
    * sources like xlsx, where row order is the file's row order).
    */
  def withLineNo(df: DataFrame): DataFrame = {
    val schema = StructType(
      df.schema.fields :+ StructField("line_no", LongType, nullable = false))
    val rdd = df.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ i)
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }
}
