package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** G2 — the reference's stateful CALK sectionizer (detail_notes.py:23-79)
  * re-expressed declaratively: a linear scan that flags heading lines,
  * groups every following line under the last-seen heading, and emits one
  * row per section with the concatenated body.
  *
  * pandas/Python does this with mutable loop state; in Spark it's the
  * classic running-sum window: `grp = sum(is_head) over (order by line)`.
  * Rows before the first heading get grp=0 and are dropped (the
  * reference's "skip everything before the section marker" gate,
  * detail_notes.py:42-44).
  */
object Sectionize {

  /** @param df        input lines
    * @param orderCol  explicit total order of the lines (Spark relations
    *                  are orderless — order must be a column, SURVEY §2.10)
    * @param isHead    predicate marking section-heading rows
    * @param lineCol   the line text column
    *
    * Output: (section_no, heading, n_lines, body) one row per section.
    *
    * Scale note: the global `Window.orderBy` funnels through one task —
    * exact reference semantics, fine for document-sized inputs. For 100 TB
    * the same algebra runs per-document: callers partition by a document
    * key first (see [[sectionizeBy]]), which keeps every window and the
    * final aggregation fully parallel.
    */
  def sectionize(df: DataFrame, orderCol: Column, isHead: Column,
      lineCol: Column): DataFrame =
    sectionized(df, Seq.empty, orderCol, isHead, lineCol)

  /** Per-document sectionizer: identical semantics, but the running sum and
    * grouping are partitioned by `docCols` — no global ordering anywhere,
    * shuffles only on the (high-cardinality) document key. This is the
    * 100 TB path.
    */
  def sectionizeBy(df: DataFrame, docCols: Seq[Column], orderCol: Column,
      isHead: Column, lineCol: Column): DataFrame =
    sectionized(df, docCols, orderCol, isHead, lineCol)

  private def sectionized(df: DataFrame, docCols: Seq[Column],
      orderCol: Column, isHead: Column, lineCol: Column): DataFrame = {
    val w =
      if (docCols.isEmpty) Window.orderBy(orderCol)
      else Window.partitionBy(docCols: _*).orderBy(orderCol)
    val grouped = df
      .withColumn("__head", isHead)
      .withColumn("__line", lineCol)
      .withColumn("__ord", orderCol)
      .withColumn("section_no", sum(col("__head").cast("int")).over(w))
      .filter(col("section_no") >= 1)
    val groupKeys = docCols :+ col("section_no")
    grouped
      .groupBy(groupKeys: _*)
      .agg(
        // exactly one heading row per group, by construction
        max(when(col("__head"), col("__line"))).as("heading"),
        count(when(!col("__head"), lit(1))).as("n_lines"),
        // collect_list has no ordering guarantee → carry the order column
        // in a struct and sort before joining (deterministic, no UDF)
        array_join(
          transform(
            array_sort(collect_list(when(!col("__head"),
              struct(col("__ord"), col("__line"))))),
            x => x("__line")),
          " ").as("body"))
  }
}
