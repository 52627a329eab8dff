package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.GlobalSeqId

/** The §7.5(a) rewrite: global row_number() → two-pass range plan. */
class GlobalSeqIdSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def numbered() = {
    GlobalSeqId.install(spark)
    spark.read.parquet(s"$dir/orders.parquet")
      .select($"o_orderkey", $"o_totalprice")
      .withColumn("row_id", row_number().over(Window.orderBy($"o_orderkey")))
  }

  test("rewrite replaces the single-task window with a range two-pass plan") {
    val df = numbered()
    val plan = df.queryExecution.executedPlan.toString
    // SparkPlan.nodeName strips the Exec suffix in plan strings
    assert(plan.contains("GlobalSeqId"), s"rewrite did not fire:\n$plan")
    assert(!plan.contains("Window"), s"window funnel survived:\n$plan")
    assert(plan.contains("rangepartitioning"),
      s"child not range-distributed:\n$plan")
  }

  test("ids are exactly row_number's: 1-based, contiguous, order-aligned") {
    val got = numbered().orderBy($"row_id")
      .as[(Long, Double, Int)].collect().toSeq
    assert(got.nonEmpty)
    assert(got.map(_._3) == (1 to got.size))
    // order alignment: ids ascend with the ordering key
    assert(got.map(_._1) == got.map(_._1).sorted)
    // schema fidelity: row_number is IntegerType, non-null
    val f = numbered().schema("row_id")
    assert(f.dataType.typeName == "integer")
  }

  test("partitioned windows and other window functions are left alone") {
    GlobalSeqId.install(spark)
    val byCust = spark.read.parquet(s"$dir/orders.parquet")
      .withColumn("rn",
        row_number().over(Window.partitionBy($"o_custkey").orderBy($"o_orderkey")))
    assert(byCust.queryExecution.executedPlan.toString.contains("Window"))
    val ranked = spark.read.parquet(s"$dir/orders.parquet")
      .withColumn("rk", rank().over(Window.orderBy($"o_orderkey")))
    assert(ranked.queryExecution.executedPlan.toString.contains("Window"))
  }

  test("install is idempotent across calls") {
    GlobalSeqId.install(spark)
    GlobalSeqId.install(spark)
    assert(spark.experimental.extraOptimizations
      .count(_ == graft.plans.GlobalRowNumberRule) == 1)
    assert(spark.experimental.extraStrategies
      .count(_ == graft.plans.GlobalSeqIdStrategy) == 1)
  }
}
