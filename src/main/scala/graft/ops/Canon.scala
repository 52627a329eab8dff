package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Schema canonicalization — SURVEY.md §2.2 (P2-P7). The reference never
  * trusts source column names: schemas are normalized positionally or by
  * rename map before any union (§1.3). All pure metadata transforms —
  * zero execution cost.
  */
object Canon {

  /** P6: positional rename — `df.columns[i] -> canonical[i]`
    * (dask-with-dataframe.py:38-43). Extra columns keep their names.
    */
  def renamePositional(df: DataFrame, names: Seq[String]): DataFrame = {
    require(names.length <= df.columns.length,
      s"cannot rename ${names.length} columns on ${df.columns.length}")
    df.toDF(names ++ df.columns.drop(names.length): _*)
  }

  /** P5: rename by map (`df.rename(columns={...})`, project-dask.py:61-71).
    * Missing keys are ignored — pandas semantics.
    */
  def renameMap(df: DataFrame, renames: Map[String, String]): DataFrame =
    df.toDF(df.columns.map(c => renames.getOrElse(c, c)): _*)

  /** P7: cap identifier length (MySQL 64-char limit, project-dask.py:31-38). */
  def truncateNames(df: DataFrame, maxLen: Int = 64): DataFrame =
    df.toDF(df.columns.map(_.take(maxLen)): _*)

  /** P2 strict: `df.drop(columns=[...])` without `errors='ignore'` —
    * pandas RAISES on a missing column (project-dask.py:41-43), Spark's
    * drop silently no-ops; replicate the strict contract.
    */
  def dropStrict(df: DataFrame, cols: Seq[String]): DataFrame = {
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not found: ${missing.mkString(", ")}")
    df.drop(cols: _*)
  }

  /** P4: pin columns first, keep the rest in their current order
    * (dask-with-dataframe-[2].py:205).
    */
  def pinFirst(df: DataFrame, first: Seq[String]): DataFrame =
    df.select((first ++ df.columns.filterNot(first.contains)).map(col): _*)
}
