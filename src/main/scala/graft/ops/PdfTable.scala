package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Layout-aware table reconstruction over POSITIONED text runs —
  * (page_no, x, y, run) from
  * [[graft.sources.PdfTextSource.toRunsDataFrame]]. This is the
  * geometry-based step the reference's line-parse pipeline
  * (dask-with-dataframe-[2].py:86-97, regex over
  * `pdfplumber.extract_text()` lines) cannot do: when a report lays a
  * table out in columns, the flat line model interleaves cells, while
  * (x, y) clustering recovers the grid.
  *
  * Model: a visual ROW is the set of runs sharing a baseline (same y
  * within `yTol`, via fixed banding — generators re-position every cell
  * at its row's y, with at most sub-point jitter from matrix rounding);
  * CELLS order left-to-right by x; rows order top-to-bottom (PDF y
  * grows upward, so descending y). Runs at the same (x, y) — repeated
  * shows without repositioning — concatenate in show order into one
  * cell.
  *
  * Scale: the aggregation and the window both key on (page_no, yband) /
  * page_no. One driver-parsed document is a LocalTableScan; the
  * many-documents shape (a `src_file` column from a binaryFile scan)
  * keys on (src_file, page_no, ...) via `extraKeys`, so reconstruction
  * distributes per document-page with no global shuffle wider than the
  * natural grouping.
  */
object PdfTable {

  /** Runs → visual rows: (page_no, row_no, cells ARRAY<STRING>).
    * `row_no` is 0-based top-to-bottom within its page. `extraKeys`
    * prepends document-identity columns (e.g. "src_file") to every
    * grouping/window key for the many-documents shape.
    */
  def rows(runs: DataFrame, yTol: Double = 2.0,
      extraKeys: Seq[String] = Nil): DataFrame = {
    require(yTol > 0, s"yTol must be positive: $yTol")
    val keys: Seq[Column] = extraKeys.map(col) :+ col("page_no")
    // fixed-width banding, not exact equality: jittered baselines such
    // as 600.5 / 600 / 599.6 must land in one band. round() half-up on
    // the scaled value keeps bands stable for the sub-point jitter case
    // (band centers every yTol points).
    val banded = runs.withColumn("yband",
      round(col("y") / lit(yTol)).cast("long"))
    // level 1 — CELL: same-(row, x) runs are one logical cell written in
    // pieces (repeated shows without repositioning); join them in y-desc
    // then run order for total determinism. struct fields sort
    // lexicographically field-by-field, so store -y to get y desc.
    val cells = banded
      .groupBy(keys ++ Seq(col("yband"), col("x")): _*)
      .agg(array_join(
        transform(
          array_sort(collect_list(struct((-col("y")).as("yneg"), col("run")))),
          e => e.getField("run")),
        "").as("cell"))
    // level 2 — ROW: cells left-to-right by x. Both aggregations and the
    // window key on the same (document, page) prefix, so at many-document
    // scale everything stays within the natural per-page grouping.
    val grouped = cells
      .groupBy(keys :+ col("yband"): _*)
      .agg(transform(
        array_sort(collect_list(struct(col("x"), col("cell")))),
        e => e.getField("cell")).as("cells"))
    grouped
      .withColumn("row_no",
        (row_number().over(
          Window.partitionBy(keys: _*).orderBy(col("yband").desc)) - 1)
          .cast("long"))
      .select(extraKeys.map(col) ++ Seq(col("page_no"), col("row_no"),
        col("cells")): _*)
  }

  /** The financial-statement shape: 3-column grid rows (label, current,
    * prior) with the per-page header row dropped and Indonesian
    * thousands-dot values coerced to DOUBLE (the F4 coercion,
    * dask-with-dataframe-[2].py:93-96, applied to geometry-recovered
    * cells instead of regex-split lines). Non-grid rows (titles,
    * footnotes — fewer than 3 cells) fall away with the size filter.
    */
  def financialRows(runs: DataFrame, yTol: Double = 2.0,
      extraKeys: Seq[String] = Nil): DataFrame = {
    val grid = rows(runs, yTol, extraKeys).filter(size(col("cells")) === 3)
    val w = Window
      .partitionBy(extraKeys.map(col) :+ col("page_no"): _*)
      .orderBy(col("row_no"))
    def num(c: Column): Column =
      regexp_replace(c, "\\.", "").cast("double")
    grid
      .withColumn("grid_rk", row_number().over(w))
      .filter(col("grid_rk") > 1) // first full-width row = column header
      .select(extraKeys.map(col) ++ Seq(
        col("page_no"),
        col("cells").getItem(0).as("item"),
        num(col("cells").getItem(1)).as("curr"),
        num(col("cells").getItem(2)).as("prior")): _*)
  }
}
