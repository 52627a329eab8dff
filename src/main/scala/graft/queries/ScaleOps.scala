package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Exact, Skew, Tables}

/** Scale-mechanism queries: the techniques that keep 100 TB plans healthy
  * — skew salting and bucket pruning — proven SEMANTICS-PRESERVING by
  * running them through the same DuckDB oracle gate as every other query
  * (the oracle computes the plain, unsalted/unbucketed form).
  */
object ScaleOps {

  /** Salted fact⋈dim join on a synthetically skewed key: half the fact
    * lands on hot key 0 (the classic null/default-key hot spot), the
    * rest spreads over the dim's 25 keys. [[Skew.saltedJoin]] splits the
    * hot key across 8 salt buckets so no single task owns 50% of the
    * rows; the oracle is the plain join — identical output proves
    * salting changes the schedule, not the answer.
    */
  private def skewSaltedJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val fact = Tables.lineitem(s, dir)
      .withColumn("hotkey",
        when($"l_orderkey" % 2 === 0, lit(0))
          .otherwise(pmod($"l_suppkey", lit(25))).cast("int"))
    val dim = Tables.nation(s, dir)
      .select($"n_nationkey".cast("int").as("hotkey"), $"n_name")
    Skew.saltedJoin(fact, dim, "hotkey", salts = 8)
      .groupBy($"n_name")
      .agg(
        count(lit(1)).as("n_lines"),
        round(sum($"l_extendedprice"), 2).as("gross"))
      .orderBy($"n_name")
  }

  private val skewSaltedOracle =
    """WITH fact AS (
      |  SELECT *, CASE WHEN l_orderkey % 2 = 0 THEN 0
      |    ELSE l_suppkey % 25 END AS hotkey
      |  FROM lineitem)
      |SELECT n_name, count(*) AS n_lines,
      |  round(sum(l_extendedprice), 2) AS gross
      |FROM fact JOIN nation ON hotkey = n_nationkey
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  /** Bucket-pruned keyed aggregate: orders written once per session as a
    * bucketed table (8 buckets on o_custkey), then an IN-filter +
    * groupBy on the bucket column. Two bucketing payoffs in one plan:
    * the IN list prunes to only the buckets that can hold those keys
    * (`SelectedBucketsCount: k out of 8` in the scan — the read-side
    * analogue of partition pruning for high-cardinality keys), and the
    * groupBy on the bucket column needs NO exchange (data is already
    * hash-distributed by the layout). At 100 TB the bucketing write is
    * paid once; every keyed lookup/agg/join after that skips most of
    * the data and the shuffle. The oracle reads the raw parquet —
    * identical output proves bucketing changes layout, not semantics.
    */
  private def bucketPrunedOrders(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // the sanitized path keeps the name readable, but sanitizing is lossy
    // ('/a/b' and '/a_b' collapse together) — an md5 suffix of the RAW
    // path makes the table key injective, so one dataset's bucketed table
    // can never serve another's query
    val rawKey = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString
    val table = "orders_bucketed_" +
      dir.replaceAll("[^A-Za-z0-9]", "_").replaceAll("_+", "_").stripPrefix("_") +
      "_" + rawKey
    if (!s.catalog.tableExists(table)) {
      Tables.orders(s, dir).write
        .bucketBy(8, "o_custkey").sortBy("o_custkey")
        .saveAsTable(table)
    }
    s.table(table)
      .filter($"o_custkey".isin(401, 421, 433))
      .groupBy($"o_custkey")
      .agg(count(lit(1)).as("n_orders"), round(sum($"o_totalprice"), 2).as("spend"))
      .orderBy($"o_custkey")
  }

  private val bucketPrunedOracle =
    """SELECT o_custkey, count(*) AS n_orders,
      |  round(sum(o_totalprice), 2) AS spend
      |FROM orders
      |WHERE o_custkey IN (401, 421, 433)
      |GROUP BY o_custkey
      |ORDER BY o_custkey""".stripMargin

  /** Bloom-pruned fact join ([[graft.ops.BloomOps]]): build a 16 KB
    * Bloom filter over the selective dim side (one customer segment),
    * prune the orders scan with the codegen'd probe BEFORE any shuffle,
    * then run the real (broadcast) join — the hand-rolled runtime
    * filter / semi-join reduction that cuts a 100 TB fact shuffle to
    * the ~1/5 that can match. The filter has false positives only, so
    * the result is bit-identical to the oracle's plain unpruned join —
    * which is the point of putting it through the gate.
    */
  private def bloomPrunedJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dim = Tables.customer(s, dir)
      .filter($"c_mktsegment" === "MACHINERY")
      .select($"c_custkey")
    val words = graft.ops.BloomOps.buildBloom(dim, "c_custkey")
    Tables.orders(s, dir)
      .filter(graft.ops.BloomOps.mightContain($"o_custkey", words))
      .join(broadcast(dim), $"o_custkey" === $"c_custkey")
      .withColumn("cents", Exact.cents("o_totalprice"))
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        (sum($"cents").cast("double") / 100).as("spend"))
      .orderBy($"o_orderpriority")
  }

  private val bloomPrunedOracle =
    """SELECT o_orderpriority, count(*) AS n_orders,
      |  CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS DOUBLE) / 100 AS spend
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'MACHINERY'
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** Per-group top-k via the BOUNDED Aggregator ([[graft.ops.Aggregators.TopKByScore]])
    * instead of window row_number + filter: the window form sorts every
    * group in full (a group with 10^9 rows sorts 10^9 rows to keep 3);
    * the aggregator keeps ≤ k pairs per partial buffer, so memory and
    * spill are O(k·groups) at any scale. The oracle IS the window form
    * — identical output proves the cheap shape computes the same top-k
    * (ties broken by orderkey asc on both sides).
    */
  private def topkAggPerPriority(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val top3 = udaf(new graft.ops.Aggregators.TopKByScore(3))
    Tables.orders(s, dir)
      .select($"o_orderpriority",
        Exact.cents("o_totalprice").as("cents"),
        $"o_orderkey")
      .groupBy($"o_orderpriority")
      .agg(top3($"cents".cast("double"), $"o_orderkey").as("top"))
      .select($"o_orderpriority", posexplode($"top"))
      .select($"o_orderpriority", ($"pos" + 1).cast("bigint").as("rnk"),
        $"col".as("o_orderkey"))
      .orderBy($"o_orderpriority", $"rnk")
  }

  private val topkAggOracle =
    """SELECT o_orderpriority, CAST(rnk AS BIGINT) AS rnk, o_orderkey
      |FROM (
      |  SELECT o_orderpriority, o_orderkey,
      |    row_number() OVER (PARTITION BY o_orderpriority
      |      ORDER BY CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) DESC,
      |               o_orderkey) AS rnk
      |  FROM orders)
      |WHERE rnk <= 3
      |ORDER BY o_orderpriority, rnk""".stripMargin

  /** Incremental materialized-view refresh: the per-priority revenue MV
    * is maintained as ALGEBRAIC partial state (count, sum, min, max) —
    * the "base" partials (orders before 1996-01-01) are merged with the
    * "delta" batch's partials instead of recomputing from scratch, and
    * derived values (avg) are produced only at finish. The merge is a
    * full-outer join on the tiny group-key frame, so a daily refresh at
    * 100 TB touches ONLY the delta partition plus MV-sized state. The
    * oracle recomputes the whole thing in one pass — identical output
    * proves merge(partial(base), partial(delta)) = full recompute, the
    * algebraic-aggregate law the technique rests on.
    */
  private def mvIncrementalRefresh(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cents = Exact.cents("o_totalprice")
    def partials(df: DataFrame): DataFrame =
      df.select($"o_orderpriority".as("prio"), cents.as("cents"))
        .groupBy($"prio")
        .agg(count(lit(1)).as("n"), sum($"cents").as("s"),
          min($"cents").as("lo"), max($"cents").as("hi"))
    val all = Tables.orders(s, dir)
    val base = partials(all.filter($"o_orderdate" < lit("1996-01-01")))
    val delta = partials(all.filter($"o_orderdate" >= lit("1996-01-01")))
    base.as("b").join(delta.as("d"), col("b.prio") === col("d.prio"), "full_outer")
      .select(
        coalesce(col("b.prio"), col("d.prio")).as("prio"),
        (coalesce(col("b.n"), lit(0L)) + coalesce(col("d.n"), lit(0L))).as("n"),
        (coalesce(col("b.s"), lit(0L)) + coalesce(col("d.s"), lit(0L))).as("s"),
        least(coalesce(col("b.lo"), col("d.lo")), coalesce(col("d.lo"), col("b.lo"))).as("lo"),
        greatest(coalesce(col("b.hi"), col("d.hi")), coalesce(col("d.hi"), col("b.hi"))).as("hi"))
      .select($"prio", $"n",
        ($"s".cast("double") / 100).as("revenue"),
        round($"s".cast("double") / $"n" / 100, 6).as("avg_price"),
        ($"lo".cast("double") / 100).as("min_price"),
        ($"hi".cast("double") / 100).as("max_price"))
      .orderBy($"prio")
  }

  private val mvRefreshOracle =
    """WITH o AS (
      |  SELECT o_orderpriority AS prio,
      |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM orders)
      |SELECT prio, CAST(count(*) AS BIGINT) AS n,
      |  CAST(CAST(sum(cents) AS BIGINT) AS DOUBLE) / 100 AS revenue,
      |  round(CAST(CAST(sum(cents) AS BIGINT) AS DOUBLE) / count(*) / 100, 6) AS avg_price,
      |  CAST(min(cents) AS DOUBLE) / 100 AS min_price,
      |  CAST(max(cents) AS DOUBLE) / 100 AS max_price
      |FROM o
      |GROUP BY prio
      |ORDER BY prio""".stripMargin

  val queries: Seq[Q] = Seq(
    Q("topk_agg_per_priority", topkAggPerPriority, Some(topkAggOracle)),
    Q("mv_incremental_refresh", mvIncrementalRefresh, Some(mvRefreshOracle)),
    Q("skew_salted_join", skewSaltedJoin, Some(skewSaltedOracle)),
    Q("bucket_pruned_orders", bucketPrunedOrders, Some(bucketPrunedOracle)),
    Q("bloom_pruned_join", bloomPrunedJoin, Some(bloomPrunedOracle)))
}
