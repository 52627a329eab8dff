package graft

import java.nio.file.Files
import java.sql.Timestamp
import graft.queries.Registry

/** Planted-data semantics for the Analytic suite: the RANGE (not ROWS)
  * frame must skip calendar gaps, the compact-forward triangle count
  * must agree with a brute-force triple join, MERGE must route every
  * row to exactly one of update/insert/keep, the unpivot must surface
  * absent cells as zeros, and median/mode must handle even groups and
  * frequency ties. The sf0.01 oracle gate proves engine equivalence;
  * these prove the rules bite on adversarial minimal inputs.
  */
class AnalyticSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private def ts(day: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-${day}%02d 00:00:00")

  private def writeOrders(dir: String, rows: Seq[(Long, Long, String, Double, Timestamp, String)]): Unit =
    rows.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
      .coalesce(1).write.parquet(s"$dir/orders.parquet")

  test("rolling_7d_revenue RANGE frame excludes days beyond the 7-day horizon") {
    val dir = Files.createTempDirectory("graft_roll").toString
    // sales on day 1 and day 10: the gap exceeds 7 days, so day 10's
    // trailing sum must NOT include day 1 (a ROWS 6-preceding frame would)
    writeOrders(dir, Seq(
      (1L, 1L, "O", 100.0, ts(1), "5-LOW"),
      (2L, 1L, "O", 50.0, ts(10), "5-LOW"),
      (3L, 1L, "O", 25.0, ts(12), "5-LOW")))
    val out = Registry.queries("rolling_7d_revenue")(spark, dir)
      .select("revenue", "rolling_7d").as[(Double, Double)].collect()
    assert(out.toSeq === Seq((100.0, 100.0), (50.0, 50.0), (25.0, 75.0)))
  }

  test("triangle_count matches a brute-force triple join on the same graph") {
    val sf = "/root/testdata/sf0.001"
    val fast = Registry.queries("triangle_count")(spark, sf)
      .as[Long].head()
    val n = spark.read.parquet(s"$sf/customer.parquet").count()
    spark.read.parquet(s"$sf/orders.parquet")
      .selectExpr("o_custkey AS u", s"1 + (o_orderkey * 31) % $n AS v")
      .selectExpr("least(u, v) AS a", "greatest(u, v) AS b")
      .filter($"a" =!= $"b").distinct()
      .createOrReplaceTempView("tri_edges")
    val brute = spark.sql(
      """SELECT count(*) FROM tri_edges e1
        |JOIN tri_edges e2 ON e2.a = e1.b
        |JOIN tri_edges e3 ON e3.a = e1.a AND e3.b = e2.b""".stripMargin)
      .as[Long].head()
    assert(fast === brute && fast > 0)
  }

  test("merge_upsert_orders routes rows to update/insert/keep exactly once") {
    val dir = Files.createTempDirectory("graft_merge").toString
    writeOrders(dir, Seq(
      (10L, 1L, "O", 100.0, ts(1), "5-LOW"),  // %10==0 -> update (+$5)
      (17L, 1L, "F", 200.0, ts(2), "5-LOW"),  // %7==3  -> keep + spawn insert
      (11L, 1L, "P", 300.0, ts(3), "5-LOW"))) // untouched -> keep
    val out = Registry.queries("merge_upsert_orders")(spark, dir)
      .select("o_orderkey", "status", "price", "op")
      .as[(Long, String, Double, String)].collect().toSeq
    assert(out === Seq(
      (10L, "O", 105.0, "update"), // 10 is ALSO ≡3 mod 7: updated in place…
      (11L, "P", 300.0, "keep"),
      (17L, "F", 200.0, "keep"),
      (28L, "N", 100.0, "insert"), // …and spawns insert 10 + max(17) + 1
      (35L, "N", 200.0, "insert"))) // 17 + max(17) + 1
  }

  test("unpivot_revenue surfaces absent (month, priority) cells as zero rows") {
    val dir = Files.createTempDirectory("graft_unpivot").toString
    writeOrders(dir, Seq((1L, 1L, "O", 60.0, ts(5), "2-HIGH")))
    val out = Registry.queries("unpivot_revenue")(spark, dir)
    assert(out.count() === 5) // one month x full 5-priority domain
    assert(out.filter($"revenue" === 0.0).count() === 4)
    assert(out.filter($"priority" === "2-HIGH" && $"revenue" === 60.0).count() === 1)
  }

  test("median averages the middle pair on even groups; mode breaks ties low") {
    val dir = Files.createTempDirectory("graft_med").toString
    writeOrders(dir, Seq(
      // even group: median = (20 + 30) / 2 = 25; mode tie 20 vs 30 -> 20
      (1L, 1L, "O", 10.0, ts(1), "2-HIGH"),
      (2L, 1L, "O", 20.0, ts(1), "2-HIGH"),
      (3L, 1L, "O", 20.0, ts(1), "2-HIGH"),
      (4L, 1L, "O", 30.0, ts(1), "2-HIGH"),
      (5L, 1L, "O", 30.0, ts(1), "2-HIGH"),
      (6L, 1L, "O", 99.0, ts(1), "2-HIGH"),
      // odd group: median = middle value; all counts 1 -> mode ties to min
      (7L, 1L, "O", 1.0, ts(1), "5-LOW"),
      (8L, 1L, "O", 7.0, ts(1), "5-LOW"),
      (9L, 1L, "O", 9.0, ts(1), "5-LOW")))
    val out = Registry.queries("median_mode_by_priority")(spark, dir)
      .as[(String, Double, Double, Long)].collect().toSeq
    assert(out === Seq(
      ("2-HIGH", 25.0, 20.0, 2L),
      ("5-LOW", 7.0, 1.0, 1L)))
  }

  test("window_rank_suite: rank family consistent on a planted tie") {
    val dir = Files.createTempDirectory("graft_rank").toString
    writeOrders(dir, Seq(
      (1L, 1L, "O", 50.0, ts(1), "5-LOW"),
      (2L, 1L, "O", 50.0, ts(1), "5-LOW"),
      (3L, 1L, "O", 10.0, ts(1), "5-LOW")))
    val out = Registry.queries("window_rank_suite")(spark, dir)
      .select("o_orderkey", "rnk", "drnk", "pct_rank", "cume", "quartile")
      .as[(Long, Long, Long, Double, Double, Long)].collect().toSeq
    assert(out === Seq( // cume is rounded to 9 decimals by the query
      (1L, 1L, 1L, 0.0, 0.666666667, 1L),
      (2L, 1L, 1L, 0.0, 0.666666667, 2L),
      (3L, 3L, 2L, 1.0, 1.0, 3L)))
  }

  test("mv_incremental_refresh merges a priority present only in the delta") {
    val dir = Files.createTempDirectory("graft_mv").toString
    writeOrders(dir, Seq(
      // 2-HIGH: one base row (1995) + one delta row (1997) -> merged stats
      (1L, 1L, "O", 100.0, Timestamp.valueOf("1995-06-01 00:00:00"), "2-HIGH"),
      (2L, 1L, "O", 300.0, Timestamp.valueOf("1997-06-01 00:00:00"), "2-HIGH"),
      // 5-LOW: delta-only -> base side of the full-outer join is NULL
      (3L, 1L, "O", 40.0, Timestamp.valueOf("1997-01-01 00:00:00"), "5-LOW")))
    val out = Registry.queries("mv_incremental_refresh")(spark, dir)
      .as[(String, Long, Double, Double, Double, Double)].collect().toSeq
    assert(out === Seq(
      ("2-HIGH", 2L, 400.0, 200.0, 100.0, 300.0),
      ("5-LOW", 1L, 40.0, 40.0, 40.0, 40.0)))
  }

  test("weighted_sample_docs is biased toward long documents, keys <= 0") {
    val sf = "/root/testdata/sf0.001"
    val sample = Registry.queries("weighted_sample_docs")(spark, sf)
      .select("n_chars", "es_key_nano").as[(Long, Double)].collect()
    assert(sample.length === 50)
    assert(sample.forall(_._2 <= 0.0)) // ln(u) <= 0, w > 0
    val corpusMean = spark.read.parquet(s"$sf/documents.parquet")
      .agg(avg($"n_chars")).as[Double].head()
    val sampleMean = sample.map(_._1).sum.toDouble / sample.length
    assert(sampleMean > corpusMean,
      s"length-weighted sample mean $sampleMean should exceed corpus mean $corpusMean")
  }

  test("bm25_rank scores more query-term hits above fewer on sf0.001") {
    val out = Registry.queries("bm25_rank")(spark, "/root/testdata/sf0.001")
      .select("bm25", "terms_hit").as[(Double, Long)].collect()
    assert(out.length === 20)
    assert(out.forall { case (s, h) => s > 0 && h >= 1 && h <= 3 })
    // descending by construction
    assert(out.map(_._1).toSeq === out.map(_._1).sortBy(-_).toSeq)
  }

  test("hybrid_rrf_retrieval: fusion arithmetic and list membership") {
    val dir = "/root/testdata/sf0.001"
    val rows = Registry.queries("hybrid_rrf_retrieval")(spark, dir)
      .as[(Long, Option[Int], Option[Int], Long)].collect().toSeq
    assert(rows.size == 10)
    // ordered by fused score, every row reachable from at least one list
    assert(rows.map(_._4) == rows.map(_._4).sorted.reverse)
    def term(r: Option[Int]): Long =
      r.map(x => math.floor(1e9 / (60 + x)).toLong).getOrElse(0L)
    rows.foreach { case (id, tr, vr, rrf) =>
      assert(tr.nonEmpty || vr.nonEmpty, s"doc $id in neither list")
      tr.foreach(r => assert(r >= 1 && r <= 20))
      vr.foreach(r => assert(r >= 1 && r <= 20))
      assert(rrf == term(tr) + term(vr), s"doc $id rrf mismatch")
    }
    // the text side is exactly bm25_rank's top-20 doc set
    val bm25Docs = Registry.queries("bm25_rank")(spark, dir)
      .select("doc_id").as[Long].collect().toSet
    rows.foreach { case (id, tr, _, _) =>
      tr.foreach(_ => assert(bm25Docs.contains(id),
        s"text-ranked doc $id not in bm25_rank's top-20"))
    }
  }
}
