package graft

import java.nio.file.Files
import java.sql.Timestamp
import graft.queries.Registry

/** data_quality_audit on a planted-violation corpus — the harness data
  * is clean (all zeros), so this proves each check actually fires.
  */
class DataQualitySpec extends SparkSpec {
  import spark.implicits._

  test("every check fires on planted violations") {
    val dir = Files.createTempDirectory("graft_dq").toString
    Seq(
      (1L, 10L, Timestamp.valueOf("2024-01-01 00:00:00"), 100.0, "1-URGENT"),
      (1L, 10L, Timestamp.valueOf("2024-01-02 00:00:00"), 100.0, "1-URGENT"), // dup key
      (2L, 99L, Timestamp.valueOf("2024-01-03 00:00:00"), 100.0, "2-HIGH"),   // orphan cust
      (3L, null.asInstanceOf[Any], Timestamp.valueOf("2024-01-04 00:00:00"), 1.0, "3-MEDIUM")) // null cust
      .map { case (k, c, d, p, pr) => (k, Option(c).map(_.asInstanceOf[Long]), d, p, pr) }
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice", "o_orderpriority")
      .coalesce(1).write.parquet(s"$dir/orders.parquet")
    Seq(
      (1L, 1L, 1L, 60.0, 1000.0, 0.05, 0.02),  // qty > 50
      (1L, 2L, 1L, 2.5, 1000.0, 0.05, 0.02),   // non-integral qty
      (2L, 1L, 1L, 10.0, 1000.0, 0.5, 0.02))   // discount > 0.1
      .toDF("l_orderkey", "l_linenumber", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax")
      .coalesce(1).write.parquet(s"$dir/lineitem.parquet")
    Seq((10L, 1, "Customer#10", 100.0, "BUILDING"))
      .toDF("c_custkey", "c_nationkey", "c_name", "c_acctbal", "c_mktsegment")
      .coalesce(1).write.parquet(s"$dir/customer.parquet")
    Seq((1L, "  ", "en", "src0", 2L), (2L, "real text", "en", "src0", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")

    val got = Registry.queries("data_quality_audit")(spark, dir)
      .as[(String, Long)].collect().toMap
    assert(got == Map(
      "orders_null_custkey" -> 1L,
      "lineitem_qty_out_of_range" -> 2L,
      "lineitem_discount_out_of_range" -> 1L,
      "orders_duplicate_orderkey" -> 1L,
      "orders_orphan_custkey" -> 1L,
      "documents_empty_text" -> 1L), got.toString)
  }
}
