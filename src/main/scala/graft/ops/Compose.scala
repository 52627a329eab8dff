package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-source composition — the reference's U1 union-all
  * (`pd.concat`, project-dask.py:79, dask-with-dataframe.py:81) and O2
  * cross-source scalar propagation (dask-with-dataframe-[2].py:186-190).
  */
object Compose {

  /** Union-all of canonicalized sources, tagging each with its 1-based
    * `src_rank` so a downstream global ID (Ids.withGlobalId ordered by
    * (src_rank, line_no)) reproduces pandas' concat order exactly.
    * `unionByName` aligns on names, not positions — schema drift between
    * sources fails loudly at analysis instead of silently misaligning.
    */
  def unionWithRank(sources: Seq[DataFrame], rankCol: String = "src_rank"): DataFrame =
    sources.zipWithIndex
      .map { case (df, i) => df.withColumn(rankCol, lit(i + 1)) }
      .reduce(_ unionByName _)

  /** O2: compute a scalar on the driver from a (tiny) lookup frame and
    * stamp it as a literal column — the reference's
    * `quarter = pdf_data['quarter'].iloc[0]` bridge. Materializes a
    * sub-plan (one small job), then constant-folds into the main plan;
    * at scale this is equivalent to a broadcast 1-row cross join but
    * keeps the main plan free of the extra join.
    */
  def propagateScalar(df: DataFrame, lookup: DataFrame, outCol: String,
      default: String): DataFrame = {
    // flatMap(Option(...)): a present-but-NULL cell falls back to the
    // default instead of NPE-ing on .toString
    val v = lookup.limit(1).collect().headOption
      .flatMap(r => Option(r.get(0))).map(_.toString).getOrElse(default)
    df.withColumn(outCol, lit(v))
  }

  /** P1: equality-predicate scalar lookup
    * (`df.loc[df[0]=='Kode entitas', 1].values[0]`). The filter pushes into
    * the scan; only the projected column is read.
    */
  def lookupScalar(df: DataFrame, keyCol: String, keyValue: String,
      valueCol: String): Option[String] =
    df.filter(col(keyCol) === keyValue).select(valueCol)
      .limit(1).collect().headOption
      .flatMap(r => Option(r.get(0))).map(_.toString)
}
