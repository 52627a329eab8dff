package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Bucketing = the co-located-join story for 100 TB: both fact tables
  * pre-hashed into the same bucket count on the join key means the join
  * runs with ZERO exchanges at read time, every time the tables are
  * joined — the shuffle is paid once at write.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed join plans without a shuffle exchange") {
    val dir = "/root/testdata/sf0.001" // warehouse dir set in SparkSpec
    val orders = graft.ops.Tables.orders(spark, dir)
    val lineitem = graft.ops.Tables.lineitem(spark, dir)

    orders.write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_b")
    lineitem.write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("lineitem_b")
    try {
      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"),
          $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      // co-located: no shuffle before the join (only the final agg shuffles)
      val shufflesBeforeJoin = "Exchange hashpartitioning\\((l_orderkey|o_orderkey)".r
        .findAllIn(plan).length
      assert(shufflesBeforeJoin == 0, s"unexpected join shuffle in:\n$plan")
      // and the result is right
      val n = joined.agg(sum($"n")).first().getLong(0)
      assert(n == lineitem.count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("bucket pruning engages on IN-filter + groupBy over the bucket column") {
    val got = graft.queries.Registry.queries("bucket_pruned_orders")(
      spark, "/root/testdata/sf0.001")
    val plan = got.queryExecution.executedPlan.toString
    val sel = "SelectedBucketsCount: (\\d+) out of 8".r.findFirstMatchIn(plan)
    assert(sel.isDefined, s"no bucket pruning in:\n${plan.take(1000)}")
    assert(sel.get.group(1).toInt < 8, "IN-filter should prune at least one bucket")
    // the groupBy on the bucket column must not need a pre-agg exchange:
    // the only exchange is the final orderBy's range partitioning
    assert(!"Exchange hashpartitioning\\(o_custkey".r.findFirstIn(plan).isDefined,
      s"unexpected agg shuffle in:\n$plan")
    assert(got.count() >= 0)
  }

  test("partition pruning on a partitioned parquet sink") {
    val tmp = Files.createTempDirectory("graft_prune").toString
    val dir = "/root/testdata/sf0.001"
    val events = graft.ops.Tables.events(spark, dir)
      .withColumn("day", to_date($"ts"))
    graft.ops.Sink.parquetPartitioned(events, s"$tmp/ev", Seq("day"))
    val back = spark.read.parquet(s"$tmp/ev")
      .filter($"day" === "2024-01-05")
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      "PartitionFilters: \\[[^\\]]*isnotnull\\(day".r.findFirstIn(plan).isDefined,
      s"partition filter missing in:\n${plan.take(800)}")
    val expected = events.filter(to_date($"ts") === "2024-01-05").count()
    assert(back.count() == expected && expected > 0)
  }
}
