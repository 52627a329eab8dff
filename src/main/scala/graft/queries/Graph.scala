package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Tables

/** Graph analytics done relationally: weighted PageRank over the
  * supplier-nation → customer-nation trade graph (edge weight = lineitem
  * count between the two nations). The edge build is the corpus-scale
  * work — one pass over the fact table with broadcast dimension joins;
  * the iterations are join + groupBy message passing, the canonical
  * distributed-graph shape that scales to billions of edges unchanged.
  *
  * Engine-portability: ranks are BIGINT nano-units (scale 1e9) and every
  * transition is integer arithmetic — contrib = (w · r) div w_out,
  * r' = (1−d)/N + (850 · Σcontrib) div 1000 — so there is no floating
  * point anywhere and both engines produce bit-identical ranks (same
  * discipline as the dedup hash pipelines: exactness beats tolerance).
  * Mass lost to integer flooring is identical on both sides.
  */
object Graph {

  private val Iters = 3
  private val InitNano = 40000000L      // 1e9 / 25 nations
  private val TeleportNano = 6000000L   // 0.15e9 / 25

  private def tradeEdges(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, dir).select($"l_orderkey", $"l_suppkey")
    val ord = Tables.orders(s, dir).select($"o_orderkey", $"o_custkey")
    val cust = Tables.customer(s, dir).select($"c_custkey", $"c_nationkey")
    val supp = Tables.supplier(s, dir).select($"s_suppkey", $"s_nationkey")
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(supp), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .groupBy($"s_nationkey".as("src"), $"c_nationkey".as("dst"))
      .agg(count(lit(1)).as("w"))
  }

  private def nationPagerank(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val edges0 = tradeEdges(s, dir)
    val wOut = edges0.groupBy($"src").agg(sum($"w").as("w_out"))
    // transition probability in nano-units, quantized ONCE at build time:
    // p ≤ 1e9, so every per-iteration product p·r ≤ 1e18 stays inside
    // BIGINT at ANY edge weight — w·r directly would overflow once
    // per-pair lineitem counts reach 1e10 (the 100 TB regime). The
    // DECIMAL(38,0) widening covers w·1e9 in the one-time precompute.
    val edges = edges0.join(wOut, "src")
      .select($"src", $"dst",
        expr("CAST((CAST(w AS DECIMAL(38,0)) * 1000000000) div w_out AS BIGINT)")
          .as("p_nano"))
      .persist()
    val nations = Tables.nation(s, dir).select($"n_nationkey", $"n_name")
    var ranks = nations.select($"n_nationkey".as("node"))
      .withColumn("r", lit(InitNano))
    for (_ <- 1 to Iters) {
      val contrib = edges.join(ranks, $"src" === $"node")
        .select($"dst", expr("(p_nano * r) div 1000000000").as("c"))
      ranks = nations.select($"n_nationkey".as("node"))
        .join(contrib.groupBy($"dst").agg(sum($"c").as("sc")),
          $"node" === $"dst", "left")
        .select($"node",
          (lit(TeleportNano) + expr("(850 * coalesce(sc, 0)) div 1000")).as("r"))
    }
    // NO unpersist here: the whole loop above only BUILDS plans (no
    // action runs until the caller executes the returned frame), so an
    // eager unpersist would unmark the cache before it ever serves the
    // 3 iteration reads + the final join — defeating it entirely. The
    // cached frame is ≤ nations² rows; LRU eviction owns its lifetime.
    nations.join(ranks, $"n_nationkey" === $"node")
      .select($"n_name", $"r".as("rank_nano"))
      .orderBy($"rank_nano".desc, $"n_name")
  }

  /** One integer-PageRank iteration as SQL; `prev` holds (node, r). */
  private def prIterSql(prev: String, n: Int): String =
    s"""r$n AS (
       |  SELECT nn.node,
       |    $TeleportNano + (850 * coalesce(sc.sc, 0)) // 1000 AS r
       |  FROM (SELECT n_nationkey AS node FROM nation) nn
       |  LEFT JOIN (
       |    SELECT e.dst, CAST(sum((e.p_nano * p.r) // 1000000000) AS BIGINT) AS sc
       |    FROM e JOIN $prev p ON e.src = p.node
       |    GROUP BY e.dst) sc ON nn.node = sc.dst)""".stripMargin

  private val pagerankOracle =
    s"""WITH e0 AS (
       |  SELECT s.s_nationkey AS src, c.c_nationkey AS dst,
       |    count(*) AS w
       |  FROM lineitem l
       |  JOIN orders o ON l.l_orderkey = o.o_orderkey
       |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
       |  JOIN customer c ON o.o_custkey = c.c_custkey
       |  GROUP BY src, dst),
       |e AS (
       |  SELECT e0.src, e0.dst,
       |    CAST((CAST(w AS HUGEINT) * 1000000000) // w_out AS BIGINT) AS p_nano
       |  FROM e0
       |  JOIN (SELECT src, CAST(sum(w) AS BIGINT) AS w_out FROM e0 GROUP BY src) t
       |  USING (src)),
       |r0 AS (SELECT n_nationkey AS node, CAST($InitNano AS BIGINT) AS r FROM nation),
       |${prIterSql("r0", 1)},
       |${prIterSql("r1", 2)},
       |${prIterSql("r2", 3)}
       |SELECT n.n_name, CAST(r3.r AS BIGINT) AS rank_nano
       |FROM nation n JOIN r3 ON n.n_nationkey = r3.node
       |ORDER BY rank_nano DESC, n.n_name""".stripMargin

  val queries: Seq[Q] = Seq(
    Q("nation_pagerank", nationPagerank, Some(pagerankOracle)))
}
