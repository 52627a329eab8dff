package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF join — the classic operator Spark lacks natively: for each left
  * row, attach the single most recent right row with
  * `rightTime <= leftTime` on the same key.
  *
  * Composed scalably (SURVEY §7.5 preference (a)): tag both sides, union,
  * and carry the latest right-side values forward with
  * `last(..., ignoreNulls)` over a (key, time) window. ONE shuffle on the
  * join key, no range-join row explosion, no per-row probe — the shape
  * that survives 100 TB (a naive `l.t >= r.t` theta-join is quadratic
  * per key). Right rows sort before left rows at equal timestamps, which
  * yields inclusive (>=) semantics.
  *
  * The right side must be unique per (key, time) — pre-aggregate it if
  * not, or the match is nondeterministic (as it is in any asof engine).
  */
object AsOf {

  /** @param left       probe side
    * @param right      reference side, unique per (key, time)
    * @param leftKey/rightKey   equality key columns
    * @param leftTime/rightTime event-time columns (same type)
    * @param carry      right-side value columns to attach
    * @return left rows + carried columns (null when no prior right row)
    */
  def asofJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      carry: Seq[String]): DataFrame = {
    val leftCols = left.columns
    val reserved = Set("__k", "__t", "__r", "__right", "asof_time")
    require(carry.toSet.intersect(leftCols.toSet).isEmpty,
      s"carry columns collide with left columns: ${carry.toSet.intersect(leftCols.toSet).mkString(", ")}")
    require((leftCols ++ carry).forall(!reserved(_)),
      s"column names ${reserved.mkString("/")} are reserved by asofJoin")
    val tagged =
      left.select(
        (col(leftKey).as("__k") +: col(leftTime).as("__t") +:
          lit(0).as("__r") +:
          (leftCols.map(col) ++ carry.map(c => lit(null).cast(right.schema(c).dataType).as(c)))): _*)
        .unionByName(
          right.select(
            (col(rightKey).as("__k") +: col(rightTime).as("__t") +:
              lit(1).as("__r") +:
              (leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
                carry.map(col))): _*))
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__r").desc) // right first at equal t -> inclusive
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // carry the latest right ROW as one struct, not per-column: per-column
    // last(ignoreNulls) would skip a genuinely-NULL carry value and tear
    // the row (value from one right row, asof_time from a newer one)
    val rightRow = last(
      when(col("__r") === 1, struct((col("__t").as("__asof_t") +: carry.map(col)): _*)),
      ignoreNulls = true).over(w)
    tagged
      .withColumn("__right", rightRow)
      .filter(col("__r") === 0)
      .select((leftCols.map(col) :+ col("__right.__asof_t").as("asof_time"))
        ++ carry.map(c => col(s"__right.$c").as(c)): _*)
  }
}
