package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequential surrogate-ID minting — the reference's O3/O4
  * (`df['ID'] = range(1, len(df)+1)`, project-dask.py:46-48,
  * dask-with-dataframe.py:84-87). pandas gets row order for free from its
  * index; Spark relations are orderless, so every variant here takes an
  * EXPLICIT ordering.
  */
object Ids {

  /** 1-based contiguous ID over the given total order, via a global
    * `row_number()` window. Exactly matches pandas semantics. A global
    * window funnels through one task — correct at harness scale; use
    * [[withScalableGlobalId]] for the 100 TB path.
    */
  def withGlobalId(df: DataFrame, idCol: String, order: Seq[Column]): DataFrame =
    df.withColumn(idCol, row_number().over(Window.orderBy(order: _*)))

  /** Same ordering contract as [[withGlobalId]] (IDs are LongType here —
    * the point is >2^31 rows) but scales: range-partition by the ordering
    * so partitions are globally ordered, then `zipWithIndex` numbers rows
    * with one lightweight count job plus a map — no single-task funnel,
    * no extra shuffle beyond the range exchange.
    *
    * zipWithIndex's count job and the numbering job run over the SAME
    * RDD, so the shuffle output is computed once and reused — the range
    * boundaries cannot drift between the two passes (re-invoking
    * repartitionByRange per action could re-sample them differently).
    */
  def withScalableGlobalId(df: DataFrame, idCol: String, order: Seq[Column]): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField}
    val sorted = df.repartitionByRange(order: _*)
      .sortWithinPartitions(order: _*)
    val outSchema = sorted.schema.add(StructField(idCol, LongType, nullable = false))
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    df.sparkSession.createDataFrame(rdd, outSchema)
  }
}
