package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{Exact, Tables}

/** Behavioral / temporal warehouse analytics the reference's downstream
  * consumers run on event and order history: funnel conversion, cohort
  * retention, changelog compaction (CDC latest-state), SCD Type-2
  * dimension versioning, calendar gap-fill with LOCF, and integer-exact
  * outlier detection. All shuffles key on high-cardinality ids
  * (user_id / o_custkey); the one global window (gap-fill) is over the
  * CALENDAR axis, whose row count is bounded by days-in-range and does
  * not grow with data volume.
  *
  * Portability discipline (see Q.scala): timestamp math in integer
  * microseconds, money in integer cents, exact decimal/HUGEINT
  * arithmetic for variance tests — no order-dependent double folds
  * anywhere.
  */
object Behavioral {

  /** Ordered conversion funnel signup → view → click → purchase: a user
    * reaches stage k+1 with the first event of that type STRICTLY AFTER
    * their stage-k time. Each stage is a groupBy + equi-join on user_id
    * — the frames shrink monotonically, and every shuffle shares the
    * user_id partitioning, so AQE reuses the exchange. The final result
    * is a union of four single-row aggregates.
    */
  private def funnelSteps(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.events(s, dir)
      .select($"user_id", $"event_type", unix_micros($"ts").as("us"))
    def stage(prev: DataFrame, prevT: String, typ: String, t: String): DataFrame =
      prev.join(e.filter($"event_type" === typ), Seq("user_id"))
        .filter($"us" > col(prevT))
        .groupBy($"user_id").agg(min($"us").as(t))
    val s1 = e.filter($"event_type" === "signup")
      .groupBy($"user_id").agg(min($"us").as("t1"))
    val s2 = stage(s1, "t1", "view", "t2")
    val s3 = stage(s2, "t2", "click", "t3")
    val s4 = stage(s3, "t3", "purchase", "t4")
    Seq("1_signup" -> s1, "2_view" -> s2, "3_click" -> s3, "4_purchase" -> s4)
      .map { case (nm, df) =>
        df.agg(count(lit(1)).as("users")).select(lit(nm).as("stage"), $"users")
      }
      .reduce(_ unionAll _)
      .orderBy($"stage")
  }

  private val funnelOracle =
    """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
      |s1 AS (SELECT user_id, min(us) AS t1 FROM e
      |       WHERE event_type = 'signup' GROUP BY user_id),
      |s2 AS (SELECT e.user_id, min(e.us) AS t2 FROM e JOIN s1 ON e.user_id = s1.user_id
      |       WHERE e.event_type = 'view' AND e.us > s1.t1 GROUP BY e.user_id),
      |s3 AS (SELECT e.user_id, min(e.us) AS t3 FROM e JOIN s2 ON e.user_id = s2.user_id
      |       WHERE e.event_type = 'click' AND e.us > s2.t2 GROUP BY e.user_id),
      |s4 AS (SELECT e.user_id, min(e.us) AS t4 FROM e JOIN s3 ON e.user_id = s3.user_id
      |       WHERE e.event_type = 'purchase' AND e.us > s3.t3 GROUP BY e.user_id)
      |SELECT stage, users FROM (
      |  SELECT '1_signup' AS stage, CAST(count(*) AS BIGINT) AS users FROM s1
      |  UNION ALL SELECT '2_view', CAST(count(*) AS BIGINT) FROM s2
      |  UNION ALL SELECT '3_click', CAST(count(*) AS BIGINT) FROM s3
      |  UNION ALL SELECT '4_purchase', CAST(count(*) AS BIGINT) FROM s4)
      |ORDER BY stage""".stripMargin

  /** Weekly retention cohorts: cohort = a user's first active week,
    * offset = weeks since. Weeks are epoch-day div 7 (integer — no
    * engine week-truncation rules). (user, week) is made distinct
    * FIRST, so the final count(*) per (cohort, offset) IS distinct
    * users — no count-distinct shuffle amplification.
    */
  private def retentionCohorts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wk = Tables.events(s, dir)
      .select($"user_id", expr("unix_micros(ts) div 86400000000 div 7").as("week"))
      .distinct()
    val first = wk.groupBy($"user_id").agg(min($"week").as("cohort_week"))
    wk.join(first, "user_id")
      .groupBy($"cohort_week", ($"week" - $"cohort_week").as("week_offset"))
      .agg(count(lit(1)).as("active_users"))
      .orderBy($"cohort_week", $"week_offset")
  }

  private val retentionOracle =
    """WITH wk AS (
      |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 // 7 AS week
      |  FROM events),
      |f AS (SELECT user_id, min(week) AS cohort_week FROM wk GROUP BY user_id)
      |SELECT f.cohort_week, wk.week - f.cohort_week AS week_offset,
      |  count(*) AS active_users
      |FROM wk JOIN f ON wk.user_id = f.user_id
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  /** Changelog compaction (CDC apply): events are a per-user change
    * stream ordered by (ts, event_id); the latest row wins and a
    * trailing 'error' row is a tombstone that deletes the key. One
    * window shuffle on the high-cardinality key — the standard
    * latest-state materialization for an upsert feed.
    */
  private def cdcLatestState(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val byUserDesc = Window.partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
    Tables.events(s, dir)
      .withColumn("rn", row_number().over(byUserDesc))
      .filter($"rn" === 1 && $"event_type" =!= "error")
      .select($"user_id", $"event_id".as("last_event_id"),
        $"event_type".as("last_type"), unix_micros($"ts").as("last_us"),
        expr("CAST(CAST(value AS DECIMAL(28,6)) * 1000000 AS BIGINT)").as("last_v_micro"))
      .orderBy($"user_id")
  }

  private val cdcOracle =
    """WITH ranked AS (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events)
      |SELECT user_id, event_id AS last_event_id, event_type AS last_type,
      |  epoch_us(ts) AS last_us,
      |  CAST(CAST(value AS DECIMAL(28,6)) * 1000000 AS BIGINT) AS last_v_micro
      |FROM ranked
      |WHERE rn = 1 AND event_type <> 'error'
      |ORDER BY user_id""".stripMargin

  /** SCD Type-2 from a change stream: each customer's order-priority
    * history collapsed to versions — a new version opens only when the
    * attribute CHANGES (lag filter), valid_to = next version's
    * valid_from (lead), open-ended for the current version. Both
    * windows share the o_custkey partitioning: one shuffle, two sorts.
    * (o_orderdate, o_orderkey) is a deterministic total order per
    * customer because o_orderkey is unique.
    */
  private def scd2OrderPriority(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val byCust = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
    Tables.orders(s, dir)
      .select($"o_custkey", $"o_orderkey", $"o_orderdate", $"o_orderpriority")
      .withColumn("prev_prio", lag($"o_orderpriority", 1).over(byCust))
      .filter($"prev_prio".isNull || $"prev_prio" =!= $"o_orderpriority")
      .withColumn("version_no", row_number().over(byCust).cast("bigint"))
      .withColumn("valid_to", lead($"o_orderdate", 1).over(byCust))
      .select($"o_custkey", $"version_no", $"o_orderpriority".as("priority"),
        $"o_orderdate".as("valid_from"), $"valid_to",
        $"valid_to".isNull.as("is_current"))
      .orderBy($"o_custkey", $"version_no")
  }

  private val scd2Oracle =
    """WITH ch AS (
      |  SELECT * FROM (
      |    SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority,
      |      lag(o_orderpriority) OVER w AS prev_prio
      |    FROM orders
      |    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey))
      |  WHERE prev_prio IS NULL OR prev_prio <> o_orderpriority)
      |SELECT o_custkey,
      |  CAST(row_number() OVER w2 AS BIGINT) AS version_no,
      |  o_orderpriority AS priority,
      |  o_orderdate AS valid_from,
      |  lead(o_orderdate) OVER w2 AS valid_to,
      |  (lead(o_orderdate) OVER w2 IS NULL) AS is_current
      |FROM ch
      |WINDOW w2 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, version_no""".stripMargin

  /** Calendar gap-fill + LOCF: densify daily revenue over the full date
    * range (zero-filling silent days) and carry forward the last day
    * that had sales. The min/max pull is a 1-row scalar bridge (same
    * pattern as the IVF centroid pull); the un-partitioned window is
    * over the CALENDAR axis — its row count is days-in-range (~2.5k
    * here, ~37k for a century), independent of data volume, so the
    * single-task sort is bounded at any scale. Money in integer cents.
    */
  private def gapfillDailyRevenue(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val orders = Tables.orders(s, dir)
    val mm = orders
      .agg(min(to_date($"o_orderdate")).as("lo"), max(to_date($"o_orderdate")).as("hi"))
      .collect()(0)
    val days = s.range(1)
      .select(explode(sequence(lit(mm.getDate(0)), lit(mm.getDate(1)))).as("day"))
    val daily = orders
      .groupBy(to_date($"o_orderdate").as("day"))
      .agg(sum(Exact.cents("o_totalprice")).as("cents"))
    val byDay = Window.orderBy($"day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    days.join(daily, Seq("day"), "left")
      .withColumn("last_sale_day",
        last(when($"cents".isNotNull, $"day"), ignoreNulls = true).over(byDay))
      .select($"day",
        (coalesce($"cents", lit(0L)).cast("double") / 100).as("revenue"),
        $"last_sale_day",
        datediff($"day", $"last_sale_day").as("days_since_sale"))
      .orderBy($"day")
  }

  private val gapfillOracle =
    """WITH mm AS (SELECT CAST(min(o_orderdate) AS DATE) AS lo,
      |                  CAST(max(o_orderdate) AS DATE) AS hi FROM orders),
      |days AS (SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
      |         FROM mm),
      |daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
      |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
      |  FROM orders GROUP BY 1),
      |j AS (SELECT d.day, daily.cents FROM days d LEFT JOIN daily ON d.day = daily.day),
      |l AS (SELECT day, cents,
      |    last_value(CASE WHEN cents IS NOT NULL THEN day END IGNORE NULLS)
      |      OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS last_sale_day
      |  FROM j)
      |SELECT day, CAST(coalesce(cents, 0) AS DOUBLE) / 100 AS revenue,
      |  last_sale_day,
      |  CAST(day - last_sale_day AS INTEGER) AS days_since_sale
      |FROM l
      |ORDER BY day""".stripMargin

  /** Integer-exact z-score outliers: orders more than 2 population
    * standard deviations ABOVE their customer's mean spend, among
    * customers with ≥ 5 orders. z > 2 ⇔ (n·x − S)² > 4·(n·SS − S²)
    * ∧ n·x > S — evaluated entirely in exact wide-integer arithmetic
    * (DECIMAL(38,0) on Spark, HUGEINT in the oracle), so there is no
    * float variance fold whose rounding could differ between engines.
    * One groupBy + one self-equi-join, both on o_custkey.
    */
  private def anomalyOrders(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, dir)
      .withColumn("cents", Exact.cents("o_totalprice"))
    val stats = o.groupBy($"o_custkey".as("ck"))
      .agg(count(lit(1)).as("n"), sum($"cents").as("s"),
        sum(expr("CAST(cents AS DECIMAL(19,0)) * CAST(cents AS DECIMAL(19,0))")).as("ss"))
    o.join(stats, $"o_custkey" === $"ck")
      .filter($"n" >= 5)
      .withColumn("d", expr(
        "CAST(n AS DECIMAL(38,0)) * CAST(cents AS DECIMAL(38,0)) - CAST(s AS DECIMAL(38,0))"))
      .filter(expr("d > 0") && expr(
        "d * d > CAST(4 AS DECIMAL(38,0)) * (CAST(n AS DECIMAL(38,0)) * CAST(ss AS DECIMAL(38,0)) - CAST(s AS DECIMAL(38,0)) * CAST(s AS DECIMAL(38,0)))"))
      .select($"o_orderkey", $"o_custkey",
        ($"cents".cast("double") / 100).as("price"), $"n".as("cust_orders"))
      .orderBy($"o_orderkey")
  }

  private val anomalyOracle =
    """WITH o AS (
      |  SELECT o_orderkey, o_custkey,
      |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM orders),
      |st AS (
      |  SELECT o_custkey AS ck, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(cents) AS BIGINT) AS s,
      |    CAST(sum(CAST(cents AS HUGEINT) * CAST(cents AS HUGEINT)) AS HUGEINT) AS ss
      |  FROM o GROUP BY 1)
      |SELECT o_orderkey, o_custkey,
      |  CAST(cents AS DOUBLE) / 100 AS price, n AS cust_orders
      |FROM o JOIN st ON o.o_custkey = st.ck
      |WHERE n >= 5
      |  AND CAST(n AS HUGEINT) * cents - s > 0
      |  AND (CAST(n AS HUGEINT) * cents - s) * (CAST(n AS HUGEINT) * cents - s)
      |      > 4 * (CAST(n AS HUGEINT) * ss - CAST(s AS HUGEINT) * s)
      |ORDER BY o_orderkey""".stripMargin

  /** Equi-width price histogram: 20 fixed $30k buckets over
    * [0, 600k) with an overflow-clamped top bucket — pure map-side
    * bucketing in integer cents, then a 20-key aggregate.
    */
  private def priceHistogram(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .withColumn("cents", Exact.cents("o_totalprice"))
      .withColumn("bucket", least(expr("cents div 3000000"), lit(19L)))
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n"),
        (min($"cents").cast("double") / 100).as("lo_price"),
        (max($"cents").cast("double") / 100).as("hi_price"))
      .orderBy($"bucket")
  }

  private val histogramOracle =
    """WITH o AS (
      |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM orders)
      |SELECT least(cents // 3000000, 19) AS bucket,
      |  count(*) AS n,
      |  CAST(min(cents) AS DOUBLE) / 100 AS lo_price,
      |  CAST(max(cents) AS DOUBLE) / 100 AS hi_price
      |FROM o
      |GROUP BY 1
      |ORDER BY 1""".stripMargin

  /** First/last-touch conversion attribution — the credit-assignment
    * query every marketing warehouse runs: each purchase credits the
    * most recent (last-touch) and earliest (first-touch) preceding
    * non-purchase event of the same user; purchases with no prior
    * touch fall to the 'none' channel (direct conversions). Both
    * credits come from ONE ordered window pass (rows unbounded-
    * preceding..1-preceding, `last/first(..., ignoreNulls)`), so the
    * corpus is shuffled once on user_id and conversions never join
    * back to the event history; the two per-channel aggregates then
    * run over the purchases-only frame. Revenue follows the
    * integer-micro discipline ([[Exact]]).
    */
  private def attributionTouch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = when($"event_type" =!= "purchase", $"event_type")
    val purchases = Tables.events(s, dir)
      .select($"user_id", $"event_id", $"event_type",
        unix_micros($"ts").as("us"), Exact.micro("value").as("v_micro"))
      .withColumn("lt", last(touch, ignoreNulls = true).over(w))
      .withColumn("ft", first(touch, ignoreNulls = true).over(w))
      .filter($"event_type" === "purchase")
      .select(coalesce($"lt", lit("none")).as("lt"),
        coalesce($"ft", lit("none")).as("ft"), $"v_micro")
    // ONE downstream pass: grouping by lt and by ft are different keys,
    // so each purchase explodes into a (channel, kind) credit row — two
    // rows per conversion, not two evaluations of the scan+window plan
    // (a lastAgg/firstAgg branch pair re-runs the whole upstream twice
    // and full-outer-joins the results back; PLANS.md caught exactly
    // that shape in the first cut of this query)
    purchases
      .select(explode(array(
        struct($"lt".as("channel"), lit("last").as("kind"),
          $"v_micro".as("v")),
        struct($"ft".as("channel"), lit("first").as("kind"),
          lit(0L).as("v")))).as("c"))
      .groupBy($"c.channel".as("channel"))
      .agg(
        sum(when($"c.kind" === "last", 1L).otherwise(0L))
          .as("last_touch_conversions"),
        sum(when($"c.kind" === "first", 1L).otherwise(0L))
          .as("first_touch_conversions"),
        sum($"c.v").as("rev_m"))
      .select($"channel", $"last_touch_conversions",
        $"first_touch_conversions",
        Exact.microSumTo4dp("rev_m").as("last_touch_revenue"))
      .orderBy($"channel")
  }

  private val attributionOracle = {
    val frame = """OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)""".stripMargin
    s"""WITH p AS (
       |  SELECT event_type,
       |    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
       |      $frame AS lt,
       |    first_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
       |      $frame AS ft,
       |    ${Exact.microSql("value")} AS v_micro
       |  FROM events),
       |pur AS (SELECT coalesce(lt, 'none') AS lt, coalesce(ft, 'none') AS ft,
       |               v_micro
       |        FROM p WHERE event_type = 'purchase'),
       |la AS (SELECT lt AS channel, count(*) AS last_touch_conversions,
       |              CAST(sum(v_micro) AS BIGINT) AS rev FROM pur GROUP BY lt),
       |fa AS (SELECT ft AS channel, count(*) AS first_touch_conversions
       |       FROM pur GROUP BY ft)
       |SELECT channel,
       |  coalesce(last_touch_conversions, 0) AS last_touch_conversions,
       |  coalesce(first_touch_conversions, 0) AS first_touch_conversions,
       |  ${Exact.microSumTo4dpSql("coalesce(rev, 0)", Exact.DuckDiv)} AS last_touch_revenue
       |FROM la FULL OUTER JOIN fa USING (channel)
       |ORDER BY channel""".stripMargin
  }

  val queries: Seq[Q] = Seq(
    Q("attribution_touch", attributionTouch, Some(attributionOracle)),
    Q("funnel_steps", funnelSteps, Some(funnelOracle)),
    Q("retention_cohorts", retentionCohorts, Some(retentionOracle)),
    Q("cdc_latest_state", cdcLatestState, Some(cdcOracle)),
    Q("scd2_order_priority", scd2OrderPriority, Some(scd2Oracle)),
    Q("gapfill_daily_revenue", gapfillDailyRevenue, Some(gapfillOracle)),
    Q("anomaly_orders", anomalyOrders, Some(anomalyOracle)),
    Q("price_histogram", priceHistogram, Some(histogramOracle)))
}
