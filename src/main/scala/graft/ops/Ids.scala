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

  /** Same contract as [[withGlobalId]] but scales: range-partition by the
    * ordering (so partitions are globally ordered), count rows per
    * partition in one cheap job, then assign `offset(partition) +
    * local_rank` with no single-task funnel. Two jobs instead of one
    * all-to-one shuffle — the standard zipWithIndex trade.
    */
  def withScalableGlobalId(df: DataFrame, idCol: String, order: Seq[Column]): DataFrame = {
    val spark = df.sparkSession
    val ranged = df.repartitionByRange(order: _*)
      .sortWithinPartitions(order: _*)
    val counts = ranged.select(spark_partition_id().as("pid"))
      .groupBy("pid").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val numParts = ranged.rdd.getNumPartitions
    val offsets = (0 until numParts)
      .scanLeft(0L)((acc, p) => acc + counts.getOrElse(p, 0L))
    // local rank within an already-sorted partition = position, minted
    // without any further shuffle; offsets looked up from a folded array
    // literal (codegen-friendly, no UDF, no broadcast round-trip).
    val offsetArr = typedLit(offsets.toArray)
    ranged
      .withColumn("__pid", spark_partition_id())
      .withColumn("__rank",
        row_number().over(
          Window.partitionBy(col("__pid")).orderBy(order: _*)))
      .withColumn(idCol,
        (element_at(offsetArr, col("__pid") + 1) + col("__rank")).cast("int"))
      .drop("__pid", "__rank")
  }
}
