package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Tables

/** Nested-data reshaping with higher-order functions: group → array of
  * structs → per-element computation over the array → explode back
  * flat. The point under test is the HOF pipeline (collect_list /
  * sort_array / transform-with-index / slice / aggregate) producing
  * the SAME numbers as the relational window form the oracle uses —
  * the two idioms a user switches between when data arrives nested
  * (logs, JSON) vs flat.
  *
  * Scale notes: the nested array lives per ORDER (≤ 7 lines in
  * TPC-H-like data), so the O(n²) slice-aggregate inside each array is
  * bounded and the whole pipeline is one groupBy shuffle on the
  * high-cardinality order key — same cost as the window form, with the
  * array form additionally usable when the input is ALREADY nested
  * (skipping the explode+window round-trip entirely).
  */
object NestedOps {

  /** Per-order running revenue by line number, computed in the nested
    * domain: lines collected and sorted per order, cumulative sums via
    * transform(i) + slice(1..i+1) + aggregate, then exploded flat.
    */
  private def nestedCumulativeLines(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cents = expr(
      "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
    Tables.lineitem(s, dir)
      .select($"l_orderkey", $"l_linenumber", cents.as("cents"))
      .groupBy($"l_orderkey")
      .agg(sort_array(collect_list(struct($"l_linenumber", $"cents"))).as("lines"))
      .select($"l_orderkey", explode(transform($"lines", (x, i) => struct(
        x.getField("l_linenumber").as("l_linenumber"),
        aggregate(
          slice($"lines", lit(1), i + 1),
          lit(0L),
          (acc, y) => acc + y.getField("cents")).as("cum_cents")))).as("e"))
      .select($"l_orderkey", $"e.l_linenumber",
        ($"e.cum_cents".cast("double") / 100).as("cum_revenue"))
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  /** The data has duplicate (orderkey, linenumber) pairs, so the frame
    * must be positional (ROWS) over the same (linenumber, cents) order
    * sort_array uses — a bare ORDER BY would use a RANGE frame that
    * lumps tie rows into one cumulative value. Rows identical in BOTH
    * fields get interchangeable cumulative positions; the gate's
    * row-sorted hash is insensitive to that.
    */
  private val nestedCumulativeOracle =
    """WITH c AS (
      |  SELECT l_orderkey, l_linenumber,
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM lineitem)
      |SELECT l_orderkey, l_linenumber,
      |  CAST(CAST(sum(cents) OVER (PARTITION BY l_orderkey
      |    ORDER BY l_linenumber, cents
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS DOUBLE) / 100
      |    AS cum_revenue
      |FROM c
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  val queries: Seq[Q] = Seq(
    Q("nested_cumulative_lines", nestedCumulativeLines, Some(nestedCumulativeOracle)))
}
