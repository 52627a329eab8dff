package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Tables

/** Core relational coverage over the harness star schema: scan+filter+agg,
  * multi-way broadcast joins, window ranking, distinct aggregation, top-k.
  * The reference itself has no joins/aggs (SURVEY.md §2.6-2.8); these are
  * the harness-native breadth queries of SURVEY.md §7.3(5), written
  * DataFrame-first so Catalyst handles pushdown/pruning/join-planning.
  */
object Relational {

  /** TPC-H Q1 shape: single scan, filter pushed to parquet, hash
    * aggregation with map-side partials. Grouping key cardinality is tiny
    * (RF×LS ≤ 9) so the shuffle is negligible at any scale.
    */
  private def q01PricingSummary(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .filter($"l_shipdate" <= lit("2000-09-02"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        round(sum($"l_quantity"), 2).as("sum_qty"),
        round(sum($"l_extendedprice"), 2).as("sum_base_price"),
        round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("sum_disc_price"),
        round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax")), 2).as("sum_charge"),
        round(avg($"l_quantity"), 2).as("avg_qty"),
        round(avg($"l_extendedprice"), 2).as("avg_price"),
        round(avg($"l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  private val q01Oracle =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  round(sum(l_extendedprice), 2) AS sum_base_price,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
      |  round(sum(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)), 2) AS sum_charge,
      |  round(avg(l_quantity), 2) AS avg_qty,
      |  round(avg(l_extendedprice), 2) AS avg_price,
      |  round(avg(l_discount), 4) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q3 shape: customer⋈orders⋈lineitem with selective filters on
    * both dimension and fact. customer is small relative to the fact →
    * broadcast; orders⋈lineitem shuffles on orderkey. Top-10 via
    * TakeOrderedAndProject (no global sort materialized).
    */
  private def q03ShippingPriority(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cust = Tables.customer(s, dir).filter($"c_mktsegment" === "BUILDING")
    val ord = Tables.orders(s, dir).filter($"o_orderdate" < lit("1998-03-15"))
    val li = Tables.lineitem(s, dir).filter($"l_shipdate" > lit("1998-03-15"))
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .groupBy($"l_orderkey", $"o_orderdate", $"o_orderpriority")
      .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("revenue"))
      .orderBy($"revenue".desc, $"l_orderkey")
      .limit(10)
  }

  private val q03Oracle =
    """SELECT l_orderkey, o_orderdate, o_orderpriority,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  /** TPC-H Q5 shape: 6-way join. region/nation/supplier/customer are all
    * broadcast-able dims; only orders⋈lineitem is a real shuffle join. The
    * c_nationkey = s_nationkey predicate rides on the joined row.
    */
  private def q05RegionRevenue(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val region = Tables.region(s, dir).filter($"r_name" === "ASIA")
    val nation = Tables.nation(s, dir)
    val ord = Tables.orders(s, dir)
      .filter($"o_orderdate" >= lit("1996-01-01") && $"o_orderdate" < lit("1997-01-01"))
    Tables.lineitem(s, dir)
      .join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(Tables.supplier(s, dir)), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(Tables.customer(s, dir)),
        $"o_custkey" === $"c_custkey" && $"c_nationkey" === $"s_nationkey")
      .join(broadcast(nation), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(region), $"n_regionkey" === $"r_regionkey")
      .groupBy($"n_name")
      .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("revenue"))
      .orderBy($"revenue".desc, $"n_name")
  }

  private val q05Oracle =
    """SELECT n_name,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
      |FROM customer, orders, lineitem, supplier, nation, region
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  /** Global top-k: Spark plans TakeOrderedAndProject — per-partition heaps
    * + driver merge of k rows, no full sort at any scale.
    */
  private def topkOrders(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice", $"o_orderdate")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .limit(25)
  }

  private val topkOracle =
    """SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
      |FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 25""".stripMargin

  /** Partitioned window ranking: top-3 orders per customer. One shuffle on
    * o_custkey, per-group heap sort inside the window — partitions by a
    * high-cardinality key so it scales linearly.
    */
  private def windowTopOrders(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
    Tables.orders(s, dir)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .orderBy($"o_custkey", $"rn")
  }

  private val windowTopOracle =
    """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    CAST(row_number() OVER (
      |      PARTITION BY o_custkey
      |      ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
      |  FROM orders)
      |WHERE rn <= 3
      |ORDER BY o_custkey, rn""".stripMargin

  /** Distinct aggregation per group (count-distinct expands to a two-phase
    * aggregate; cardinality is small here).
    */
  private def aggCustomerSegments(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, dir)
      .groupBy($"c_mktsegment")
      .agg(
        countDistinct($"c_nationkey").as("n_nations"),
        count(lit(1)).as("n_cust"),
        round(avg($"c_acctbal"), 2).as("avg_bal"),
        round(sum($"c_acctbal"), 2).as("sum_bal"))
      .orderBy($"c_mktsegment")
  }

  private val aggSegmentsOracle =
    """SELECT c_mktsegment,
      |  CAST(count(DISTINCT c_nationkey) AS BIGINT) AS n_nations,
      |  count(*) AS n_cust,
      |  round(avg(c_acctbal), 2) AS avg_bal,
      |  round(sum(c_acctbal), 2) AS sum_bal
      |FROM customer
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  /** Anti-join coverage: customers with no URGENT order, counted per
    * segment. Kept as a shuffled anti-join on the high-cardinality key —
    * AQE converts it to broadcast when the build side turns out small.
    */
  private def customersWithoutOrders(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cust = Tables.customer(s, dir)
    val urgent = Tables.orders(s, dir)
      .filter($"o_orderpriority" === "1-URGENT")
      .select($"o_custkey")
    cust.join(urgent, $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_no_urgent"))
      .orderBy($"c_mktsegment")
  }

  private val noOrdersOracle =
    """SELECT c_mktsegment, count(*) AS n_no_urgent
      |FROM customer
      |WHERE c_custkey NOT IN (
      |  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  /** Correlated-subquery shape ("orders above their customer's average"),
    * written as the decorrelated join-with-aggregate Catalyst would
    * produce: one pass computes per-customer averages, a second joins
    * them back. The avg side is orders-of-magnitude smaller than the
    * fact → AQE broadcasts it.
    */
  private def ordersAboveCustAvg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ord = Tables.orders(s, dir)
    val avgs = ord.groupBy($"o_custkey".as("ck"))
      .agg(avg($"o_totalprice").as("cust_avg"))
    ord.join(avgs, $"o_custkey" === $"ck")
      .filter($"o_totalprice" > $"cust_avg")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_above"),
        round(avg($"o_totalprice" - $"cust_avg"), 2).as("avg_excess"))
      .orderBy($"o_orderpriority")
  }

  private val aboveAvgOracle =
    """SELECT o_orderpriority, count(*) AS n_above,
      |  round(avg(o_totalprice - cust_avg), 2) AS avg_excess
      |FROM (
      |  SELECT o.*, avg(o_totalprice) OVER (PARTITION BY o_custkey) AS cust_avg
      |  FROM orders o)
      |WHERE o_totalprice > cust_avg
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** Exact interpolated percentiles per group — Spark `percentile` and
    * DuckDB `quantile_cont` share the continuous-interpolation
    * definition.
    */
  private def pricePercentiles(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .groupBy($"o_orderpriority")
      .agg(
        round(expr("percentile(o_totalprice, 0.5)"), 2).as("p50"),
        round(expr("percentile(o_totalprice, 0.9)"), 2).as("p90"),
        round(expr("percentile(o_totalprice, 0.99)"), 2).as("p99"))
      .orderBy($"o_orderpriority")
  }

  private val percentilesOracle =
    """SELECT o_orderpriority,
      |  round(quantile_cont(o_totalprice, 0.5), 2) AS p50,
      |  round(quantile_cont(o_totalprice, 0.9), 2) AS p90,
      |  round(quantile_cont(o_totalprice, 0.99), 2) AS p99
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** Sampled quantiles — the constant-memory scale path for
    * [[pricePercentiles]] (exact percentile() sorts every group; at
    * 100 TB that's the operator you replace first). The sample is the
    * BOTTOM-K ROWS BY PORTABLE HASH of the row key: a deterministic,
    * order-independent, MERGEABLE set (bottom-k of a union = bottom-k of
    * merged bottom-ks — the KMV property), so executors keep k rows per
    * group, results are reproducible run-to-run, and the DuckDB oracle
    * reconstructs the identical sample. Same interpolation as the exact
    * form, evaluated on the sample.
    */
  private val SampleK = 512

  private def sampledPercentiles(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // Two-phase bottom-k: the group key has only 5 values, so a single
    // bottom-k window would funnel the WHOLE table through 5 sort tasks
    // (the r8 soak measured it super-linear). Phase 1 takes bottom-k
    // within (group, salt) — 80 parallel partitions; phase 2 re-takes
    // bottom-k of the surviving ≤ salt·k rows per group. Bottom-k of
    // disjoint bottom-ks IS the global bottom-k (the KMV merge
    // property), so the final sample — and the oracle — are unchanged.
    val hash = graft.ops.TextOps.portableHash64($"o_orderkey".cast("string"), 7)
    val w1 = Window.partitionBy($"o_orderpriority", $"salt")
      .orderBy($"h", $"o_orderkey")
    val w2 = Window.partitionBy($"o_orderpriority").orderBy($"h", $"o_orderkey")
    Tables.orders(s, dir)
      .select($"o_orderpriority", $"o_orderkey", $"o_totalprice")
      .withColumn("h", hash)
      .withColumn("salt", pmod($"h", lit(16)))
      .withColumn("rn", row_number().over(w1))
      .filter($"rn" <= SampleK)
      .withColumn("rn2", row_number().over(w2))
      .filter($"rn2" <= SampleK)
      .groupBy($"o_orderpriority")
      .agg(
        count(lit(1)).as("n_sample"),
        round(expr("percentile(o_totalprice, 0.5)"), 2).as("p50"),
        round(expr("percentile(o_totalprice, 0.9)"), 2).as("p90"))
      .orderBy($"o_orderpriority")
  }

  private val sampledPercentilesOracle =
    s"""SELECT o_orderpriority,
       |  count(*) AS n_sample,
       |  round(quantile_cont(o_totalprice, 0.5), 2) AS p50,
       |  round(quantile_cont(o_totalprice, 0.9), 2) AS p90
       |FROM (
       |  SELECT o_orderpriority, o_totalprice,
       |    row_number() OVER (PARTITION BY o_orderpriority
       |      ORDER BY ('0x' || substr(md5('7|' || CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT,
       |               o_orderkey) AS rn
       |  FROM orders)
       |WHERE rn <= $SampleK
       |GROUP BY o_orderpriority
       |ORDER BY o_orderpriority""".stripMargin

  /** Price-distribution deciles per order priority, with EXACT
    * `ntile(10)` semantics but WITHOUT the ntile plan: a window
    * partitioned by the 5-value priority hash-routes each priority's
    * entire row mass through ONE task's sort — a 5-way funnel at
    * 100 TB. Instead the total order (priority, price, orderkey —
    * ntile is rank-based, so a non-total order would be
    * engine-ambiguous on price ties) is established once by the
    * range-partitioned two-pass numbering of
    * [[graft.ops.Ids.withScalableGlobalIdManaged]] (every core sorts a
    * slice), the rank WITHIN a priority falls out as
    * `gid − min(gid per priority) + 1` via a broadcast of the ≤5-row
    * bounds frame, and the bucket is the closed-form ntile assignment
    * (first `n mod k` buckets get `n div k + 1` rows, the rest
    * `n div k`) — a pure per-row expression, no window anywhere.
    * min/max stay on the 2dp input grid (no rounding hazard), counts
    * are exact; the ≤50-row result materializes while the pinned range
    * partitioning is alive, then the DISK_ONLY entry is released
    * (idsScalableOrders lifecycle).
    */
  private def priceDeciles(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (withId, release) = graft.ops.Ids.withScalableGlobalIdManaged(
      Tables.orders(s, dir)
        .select($"o_orderpriority", $"o_orderkey", $"o_totalprice"),
      "gid", Seq($"o_orderpriority", $"o_totalprice", $"o_orderkey"))
    // per-priority row count + first global id — ≤5 rows, broadcast
    val bounds = withId.groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("np"), min($"gid").as("startp"))
    // closed-form ntile(K): q = np div K rows per bucket, the first
    // rem = np mod K buckets hold one extra. The rem*(q+1) guard keeps
    // the q=0 branch (np < K ⇒ bucket = rank) out of the division; the
    // greatest(q,1) is belt-and-braces for ANSI div-by-zero.
    val K = 10
    val agg = withId.join(broadcast(bounds), "o_orderpriority")
      .withColumn("r", $"gid" - $"startp" + lit(1L))
      .withColumn("q", expr(s"np div $K"))
      .withColumn("rem", expr(s"np % $K"))
      .withColumn("decile", expr(
        s"""CAST(CASE WHEN r <= rem * (q + 1)
           |  THEN (r - 1) div (q + 1)
           |  ELSE rem + (r - rem * (q + 1) - 1) div greatest(q, 1L)
           |END AS INT) + 1""".stripMargin))
      .groupBy($"o_orderpriority", $"decile")
      .agg(count(lit(1)).as("n"),
        min($"o_totalprice").as("min_price"),
        max($"o_totalprice").as("max_price"))
      .orderBy($"o_orderpriority", $"decile")
    val rows = agg.collect().toIndexedSeq
    release()
    import scala.jdk.CollectionConverters._
    s.createDataFrame(rows.asJava, agg.schema)
  }

  private val decilesOracle =
    """SELECT o_orderpriority, decile, count(*) AS n,
      |  min(o_totalprice) AS min_price,
      |  max(o_totalprice) AS max_price
      |FROM (
      |  SELECT o_orderpriority, o_totalprice,
      |    ntile(10) OVER (PARTITION BY o_orderpriority
      |                    ORDER BY o_totalprice, o_orderkey) AS decile
      |  FROM orders)
      |GROUP BY o_orderpriority, decile
      |ORDER BY o_orderpriority, decile""".stripMargin

  /** TPC-H Q10 shape: revenue lost to returned items per customer, top
    * 20. Fact⋈fact shuffle join on orderkey; customer/nation broadcast;
    * TakeOrderedAndProject for the top-k.
    */
  private def q10ReturnedItems(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, dir).filter($"l_returnflag" === "R")
    val ord = Tables.orders(s, dir)
      .filter($"o_orderdate" >= lit("1996-01-01") && $"o_orderdate" < lit("1996-07-01"))
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(Tables.customer(s, dir)), $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables.nation(s, dir)), $"c_nationkey" === $"n_nationkey")
      .groupBy($"c_custkey", $"c_name", $"n_name", $"c_mktsegment")
      .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("revenue"))
      .orderBy($"revenue".desc, $"c_custkey")
      .limit(20)
  }

  private val q10Oracle =
    """SELECT c_custkey, c_name, n_name, c_mktsegment,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE l_returnflag = 'R'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
      |GROUP BY c_custkey, c_name, n_name, c_mktsegment
      |ORDER BY revenue DESC, c_custkey
      |LIMIT 20""".stripMargin

  /** TPC-H Q12 shape: conditional (CASE) aggregation — high/low priority
    * line counts per ship month. Single fact⋈fact join, map-side CASE.
    */
  private def q12ShipPriority(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hi = $"o_orderpriority".isin("1-URGENT", "2-HIGH")
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), $"l_orderkey" === $"o_orderkey")
      .withColumn("ship_month", date_trunc("month", $"l_shipdate"))
      .groupBy($"ship_month")
      .agg(
        sum(when(hi, 1).otherwise(0)).as("high_line_count"),
        sum(when(!hi, 1).otherwise(0)).as("low_line_count"))
      .orderBy($"ship_month")
  }

  private val q12Oracle =
    """SELECT date_trunc('month', l_shipdate) AS ship_month,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY ship_month
      |ORDER BY ship_month""".stripMargin

  /** TPC-H Q19 shape: disjunctive mixed predicates spanning both join
    * sides, carried IN the join condition. Catalyst extracts the
    * common `l_partkey = p_partkey` equi-key (hash join, part broadcast)
    * and derives single-side filters from the OR-of-ANDs (constraint
    * propagation), so both scans still prune before the join.
    */
  private def q19MixedPredicates(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cond =
      ($"p_brand" === "Brand#12" && $"p_size".between(1, 10) && $"l_quantity".between(1, 15)) ||
        ($"p_brand" === "Brand#23" && $"p_size".between(5, 25) && $"l_quantity".between(10, 30)) ||
        ($"p_brand" === "Brand#3" && $"p_size".between(20, 50) && $"l_quantity".between(25, 50))
    Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir)), $"l_partkey" === $"p_partkey" && cond)
      .agg(
        round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  private val q19Oracle =
    """SELECT round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
      |  count(*) AS n_lines
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 15)
      |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 5 AND 25 AND l_quantity BETWEEN 10 AND 30)
      |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 25 AND 50)""".stripMargin

  /** TPC-H Q21 shape: suppliers who were the SOLE late shipper of a
    * multi-supplier finished order ("late" adapted to this schema:
    * shipped >1000 days after the order date — no receipt/commit dates
    * here). The EXISTS/NOT-EXISTS pair collapses into a two-level
    * rollup: per (order, supplier) fold the line rows once (late-line
    * count + any-late flag), then per order count suppliers and late
    * suppliers — "waiting" iff n_supp > 1 and exactly one supplier was
    * late, in which case that supplier's late-line count is the order's
    * contribution. Two grouped shuffles on order-prefixed keys replace
    * the countDistinct expands and the two joins back onto the line
    * rows; supplier broadcasts at the end (true dimension).
    */
  private def q21WaitingSuppliers(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ord = Tables.orders(s, dir).filter($"o_orderstatus" === "F")
      .select($"o_orderkey", $"o_orderdate")
    val perOrdSupp = Tables.lineitem(s, dir)
      .select($"l_orderkey", $"l_suppkey", $"l_shipdate")
      .join(ord, $"l_orderkey" === $"o_orderkey")
      .withColumn("is_late",
        ($"l_shipdate" > $"o_orderdate" + expr("INTERVAL 1000 DAYS")).cast("long"))
      .groupBy($"l_orderkey", $"l_suppkey")
      .agg(max($"is_late").as("any_late"), sum($"is_late").as("n_late_lines"))
    perOrdSupp
      .groupBy($"l_orderkey")
      .agg(
        count(lit(1)).as("n_supp"),
        sum($"any_late").as("n_late"),
        max(when($"any_late" === 1, $"l_suppkey")).as("late_supp"),
        sum(when($"any_late" === 1, $"n_late_lines")).as("late_lines"))
      .filter($"n_supp" > 1 && $"n_late" === 1)
      .join(broadcast(Tables.supplier(s, dir)), $"late_supp" === $"s_suppkey")
      .groupBy($"s_name")
      .agg(sum($"late_lines").as("numwait"))
      .orderBy($"numwait".desc, $"s_name")
      .limit(10)
  }

  private val q21Oracle =
    """SELECT s_name, count(*) AS numwait
      |FROM lineitem l1
      |JOIN orders ON l1.l_orderkey = o_orderkey
      |JOIN supplier ON l1.l_suppkey = s_suppkey
      |WHERE o_orderstatus = 'F'
      |  AND l1.l_shipdate > o_orderdate + INTERVAL 1000 DAY
      |  AND EXISTS (
      |    SELECT 1 FROM lineitem l2
      |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (
      |    SELECT 1 FROM lineitem l3
      |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      |      AND l3.l_shipdate > o_orderdate + INTERVAL 1000 DAY)
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name
      |LIMIT 10""".stripMargin

  /** TPC-H Q22 shape: rich idle customers — acctbal above the global
    * positive average (scalar subquery) and no order since 1999
    * (NOT EXISTS → left-anti against a date-pruned orders scan), counted
    * per nation (stand-in for the phone prefix this schema lacks).
    * The scalar is a one-row driver bridge (the same A2 pattern as
    * Compose.firstScalar): the average lands as a LITERAL, so the
    * comparison pushes into the customer scan as
    * `GreaterThan(c_acctbal, …)` — strictly better than the 1-row
    * BroadcastNestedLoopJoin a cross-join formulation plans.
    *
    * Determinism: a raw double average differs between engines (and
    * across partitionings) in the last ulps, so a customer sitting
    * exactly on the boundary could flip the row set. Both sides instead
    * compare against the EXACT integer-cent threshold: balances are
    * 2-decimal, so `cents > floor(sum_cents / n)` ⟺ `c_acctbal >
    * (floor(sum_cents/n) + 0.5) / 100` — sum_cents (< 2^53) and the
    * division/floor are bit-identical in every engine, and the ±0.005
    * dead zone absorbs double-representation noise.
    */
  private def q22IdleCustomers(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cust = Tables.customer(s, dir)
    val row = cust.filter($"c_acctbal" > 0)
      .agg(count(lit(1)).as("n"), round(sum($"c_acctbal" * 100), 0).as("cents"))
      .first()
    val avgBal = ((row.getDouble(1) / row.getLong(0)).floor + 0.5) / 100.0
    val recent = Tables.orders(s, dir)
      .filter($"o_orderdate" >= lit("1999-01-01"))
      .select($"o_custkey")
    cust.filter($"c_acctbal" > lit(avgBal))
      .join(recent, $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy($"c_nationkey")
      .agg(count(lit(1)).as("numcust"), round(sum($"c_acctbal"), 2).as("totacctbal"))
      .orderBy($"c_nationkey")
  }

  private val q22Oracle =
    """SELECT c_nationkey, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
      |FROM customer
      |WHERE c_acctbal > (SELECT (floor(round(sum(c_acctbal * 100)) / count(*)) + 0.5) / 100
      |                   FROM customer WHERE c_acctbal > 0)
      |  AND NOT EXISTS (
      |    SELECT 1 FROM orders
      |    WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
      |GROUP BY c_nationkey
      |ORDER BY c_nationkey""".stripMargin

  val queries: Seq[Q] = Seq(
    Q("q19_mixed_predicates", q19MixedPredicates, Some(q19Oracle)),
    Q("q21_waiting_suppliers", q21WaitingSuppliers, Some(q21Oracle)),
    Q("q22_idle_customers", q22IdleCustomers, Some(q22Oracle)),
    Q("q10_returned_items", q10ReturnedItems, Some(q10Oracle)),
    Q("q12_ship_priority", q12ShipPriority, Some(q12Oracle)),
    Q("orders_above_cust_avg", ordersAboveCustAvg, Some(aboveAvgOracle)),
    Q("price_percentiles", pricePercentiles, Some(percentilesOracle)),
    Q("orders_price_deciles", priceDeciles, Some(decilesOracle)),
    Q("price_quantiles_sampled", sampledPercentiles, Some(sampledPercentilesOracle)),
    Q("q01_pricing_summary", q01PricingSummary, Some(q01Oracle)),
    Q("q03_shipping_priority", q03ShippingPriority, Some(q03Oracle)),
    Q("q05_region_revenue", q05RegionRevenue, Some(q05Oracle)),
    Q("topk_orders", topkOrders, Some(topkOracle)),
    Q("window_top_orders_per_cust", windowTopOrders, Some(windowTopOracle)),
    Q("agg_customer_segments", aggCustomerSegments, Some(aggSegmentsOracle)),
    Q("customers_without_orders", customersWithoutOrders, Some(noOrdersOracle)))
}
