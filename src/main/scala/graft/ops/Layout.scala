package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators for the lake side of the engine: Z-order
  * (Morton) clustering keys and range-clustered writes. At 100 TB the
  * scan cost of a 2-D selective query is decided by FILE LAYOUT, not
  * plan shape: parquet row-group/file min-max stats only prune when
  * rows with similar values are physically adjacent. A single-column
  * sort gives perfect pruning on that column and none on any other;
  * interleaving the bits of two columns gives partial pruning on BOTH
  * — the standard multi-dimensional clustering trade (Delta/Iceberg
  * OPTIMIZE ZORDER does exactly this).
  *
  * The z-value is pure bit arithmetic on built-in expressions
  * (shiftleft/and/or are all codegen'd, and DuckDB mirrors them
  * operator-for-operator), so the key is engine-portable and needs no
  * custom Expression.
  */
object Layout {

  /** 32-bit Morton code: interleaves the low 16 bits of `a` (even bit
    * positions) and `b` (odd positions). Monotone locality: points
    * close in (a, b) are close in z, which is what makes range
    * partitioning by z cluster both dimensions at once.
    */
  def zorder16(a: Column, b: Column): Column =
    (0 until 16).map { i =>
      val abit = shiftleft(shiftrightunsigned(a, i).bitwiseAND(lit(1L)), 2 * i)
      val bbit = shiftleft(shiftrightunsigned(b, i).bitwiseAND(lit(1L)), 2 * i + 1)
      abit.bitwiseOR(bbit)
    }.reduce(_ bitwiseOR _)

  /** The matching DuckDB SQL for [[zorder16]] over column names `a`,`b`. */
  def zorder16Sql(a: String, b: String): String =
    (0 until 16).map { i =>
      s"((($a >> $i) & 1) << ${2 * i}) | ((($b >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " | ", ")")

  /** Cluster `df` into `files` files range-partitioned and sorted by
    * the given key — the write shape that makes parquet min-max stats
    * selective. (Range partitioning samples the key distribution, so
    * file boundaries adapt to skew; a hash repartition would scatter
    * neighboring keys across every file and destroy pruning.)
    */
  def clusteredBy(df: DataFrame, key: Column, files: Int): DataFrame =
    df.repartitionByRange(files, key).sortWithinPartitions(key)
}
