package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Layout, Tables}

/** Z-order clustering-key computation through the oracle gate. The
  * layout EFFECT (fewer candidate files under a 2-D predicate) is
  * asserted in LayoutSpec over real partitioned writes; here the gate
  * proves the Morton key itself is bit-identical across engines — the
  * property that lets a DuckDB/Trino reader prune files written by
  * this engine's z-clustered writer.
  */
object LayoutQueries {

  /** Morton keys for a deterministic sample of orders: custkey × epoch-
    * day interleaved. Map-side only — the z-value is 32 codegen'd bit
    * ops riding on the scan, no shuffle (the global sort here is the
    * presentation ORDER BY on a 16-row sample, not the clustering
    * write, which uses repartitionByRange).
    */
  private def zorderOrders(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val day = datediff(to_date($"o_orderdate"), lit("1970-01-01").cast("date"))
      .cast("bigint")
    Tables.orders(s, dir)
      .filter($"o_orderkey" % 997 === 0)
      .select($"o_orderkey", $"o_custkey", day.as("day_no"))
      .withColumn("z", Layout.zorder16($"o_custkey", $"day_no"))
      .orderBy($"o_orderkey")
  }

  private val zorderOracle =
    s"""SELECT o_orderkey, o_custkey,
       |  CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS day_no,
       |  ${Layout.zorder16Sql("o_custkey",
            "CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)")} AS z
       |FROM orders
       |WHERE o_orderkey % 997 = 0
       |ORDER BY o_orderkey""".stripMargin

  val queries: Seq[Q] = Seq(
    Q("zorder_orders", zorderOrders, Some(zorderOracle)))
}
