package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{Exact, Tables}

/** Event-stream analytics over the `events` table (batch semantics —
  * the reference defines no streaming, SURVEY.md §2.11; the same
  * transforms run unmodified under Structured Streaming, see
  * graft.streaming). Covers tumbling-window aggregation, gap-based
  * sessionization, JSON property extraction, and a day × type pivot.
  */
object Events {

  /** Tumbling 1-hour windows per event type. `window($"ts", "1 hour")` is
    * epoch-aligned, so window.start ≡ date_trunc('hour', ts) — which is
    * what the oracle uses. Group key cardinality = hours × types: tiny
    * shuffle at any scale, map-side partial aggregation does the work.
    */
  private def tumblingHourly(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // Micro-unit accounting: values quantized to 1e-6 per row, summed as
    // exact BIGINTs, rounded HALF-AWAY to 4dp in integer arithmetic.
    // round(double) is NOT engine-portable on "nice" inputs — Spark
    // rounds the exact binary expansion HALF_UP while DuckDB rounds the
    // ×1e4-scaled double half-to-even, and averages of few-significant-
    // digit values land on that boundary often (observed at sf0.1).
    // Integer micro-units make every step order-independent and
    // tie-rule-free until the final exact small-decimal → double cast.
    Tables.events(s, dir)
      .withColumn("v_micro", Exact.micro("value"))
      .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
      .agg(
        count(lit(1)).as("n"),
        sum($"v_micro").as("s_micro"))
      .select($"w.start".as("hour_start"), $"event_type", $"n",
        Exact.microSumTo4dp("s_micro").as("sum_value"),
        Exact.microAvgTo4dp("s_micro", "n").as("avg_value"))
      .orderBy($"hour_start", $"event_type")
  }

  private val tumblingOracle =
    s"""SELECT hour_start, event_type, n,
      |  ${Exact.microSumTo4dpSql("s_micro", Exact.DuckDiv)} AS sum_value,
      |  ${Exact.microAvgTo4dpSql("s_micro", "n", Exact.DuckDiv)} AS avg_value
      |FROM (
      |  SELECT date_trunc('hour', ts) AS hour_start, event_type,
      |    count(*) AS n,
      |    CAST(sum(${Exact.microSql("value")}) AS BIGINT) AS s_micro
      |  FROM events
      |  GROUP BY hour_start, event_type)
      |ORDER BY hour_start, event_type""".stripMargin

  /** Gap-based sessionization: a >30-minute silence starts a new session.
    * lag + running sum, both windowed by user_id (high-cardinality key →
    * fully parallel; nothing global anywhere). Timestamp math in integer
    * microseconds (unix_micros / epoch_us) so both engines agree exactly.
    */
  private def sessionize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val byUser = Window.partitionBy($"user_id").orderBy($"ts")
    val gapUs = 30L * 60 * 1000000
    Tables.events(s, dir)
      .withColumn("prev_us", lag(unix_micros($"ts"), 1).over(byUser))
      .withColumn("new_session",
        when($"prev_us".isNull || unix_micros($"ts") - $"prev_us" > gapUs, 1)
          .otherwise(0))
      .withColumn("session_no", sum($"new_session").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"session_no")
      .agg(
        count(lit(1)).as("n_events"),
        (max(unix_micros($"ts")) - min(unix_micros($"ts"))).as("duration_us"))
      .orderBy($"user_id", $"session_no")
  }

  private val sessionizeOracle =
    """WITH t AS (
      |  SELECT user_id, ts,
      |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS prev_us
      |  FROM events),
      |flagged AS (
      |  SELECT user_id, ts,
      |    CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > 1800000000
      |      THEN 1 ELSE 0 END AS new_session
      |  FROM t),
      |sess AS (
      |  SELECT user_id, ts,
      |    CAST(sum(new_session) OVER (
      |      PARTITION BY user_id ORDER BY ts
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_no
      |  FROM flagged)
      |SELECT user_id, session_no,
      |  count(*) AS n_events,
      |  max(epoch_us(ts)) - min(epoch_us(ts)) AS duration_us
      |FROM sess
      |GROUP BY user_id, session_no
      |ORDER BY user_id, session_no""".stripMargin

  /** JSON property extraction (semi-structured column) + aggregation. */
  private def jsonProps(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .withColumn("k", get_json_object($"props", "$.k").cast("int"))
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n"),
        sum($"k").as("sum_k"),
        min($"k").as("min_k"),
        max($"k").as("max_k"))
      // integer inputs: 4dp mean in exact integer arithmetic (see
      // tumblingHourly — round(avg(double)) is not engine-portable)
      .withColumn("avg_k",
        expr("""CAST(CASE WHEN sum_k >= 0 THEN (20000 * sum_k + n) div (2 * n)
               |     ELSE -((20000 * -sum_k + n) div (2 * n)) END AS DOUBLE) / 10000""".stripMargin))
      .select($"event_type", $"n", $"sum_k", $"avg_k", $"min_k", $"max_k")
      .orderBy($"event_type")
  }

  private val jsonPropsOracle =
    """SELECT event_type, n, sum_k,
      |  CAST(CASE WHEN sum_k >= 0 THEN (20000 * sum_k + n) // (2 * n)
      |       ELSE -((20000 * -sum_k + n) // (2 * n)) END AS DOUBLE) / 10000 AS avg_k,
      |  min_k, max_k
      |FROM (
      |  SELECT event_type,
      |    count(*) AS n,
      |    CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
      |    min(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k,
      |    max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
      |  FROM events
      |  GROUP BY event_type)
      |ORDER BY event_type""".stripMargin

  /** Day × event_type pivot with an explicit (fixed) pivot column list —
    * the only shape that scales: Spark never scans twice for values, and
    * the output schema is static.
    */
  private def dailyPivot(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .withColumn("day", to_date($"ts"))
      .groupBy($"day")
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .count()
      .na.fill(0L)
      .orderBy($"day")
  }

  private val dailyPivotOracle =
    """SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
      |  count(*) FILTER (event_type = 'click') AS click,
      |  count(*) FILTER (event_type = 'error') AS error,
      |  count(*) FILTER (event_type = 'purchase') AS purchase,
      |  count(*) FILTER (event_type = 'signup') AS signup,
      |  count(*) FILTER (event_type = 'view') AS view
      |FROM events
      |GROUP BY day
      |ORDER BY day""".stripMargin

  /** Native session windows (session_window merges events with < 30 min
    * gaps) — the built-in counterpart of the manual lag+cumsum
    * sessionizer above. The oracle reconstructs identical sessions by
    * hand (start = min ts, end = max ts + gap), proving the two
    * formulations agree event-for-event.
    */
  private def sessionWindow(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // micro-unit integer sum (see tumblingHourly — round(double) is not
    // engine-portable; exact BIGINT accounting is)
    Tables.events(s, dir)
      .withColumn("v_micro", Exact.micro("value"))
      .groupBy(session_window($"ts", "30 minutes").as("w"), $"user_id")
      .agg(count(lit(1)).as("n_events"),
        sum($"v_micro").as("s_micro"))
      .select($"user_id", $"w.start".as("session_start"),
        $"w.end".as("session_end"), $"n_events",
        Exact.microSumTo4dp("s_micro").as("sum_value"))
      .orderBy($"user_id", $"session_start")
  }

  // shared with the streaming session gate (StreamingGates) — batch and
  // stream must agree on the same independently-derived sessions
  private[queries] val sessionWindowOracle =
    s"""WITH t AS (
      |  SELECT user_id, ts, value,
      |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS prev_us
      |  FROM events),
      |flagged AS (
      |  SELECT user_id, ts, value,
      |    CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us >= 1800000000
      |      THEN 1 ELSE 0 END AS new_session
      |  FROM t),
      |sess AS (
      |  SELECT user_id, ts, value,
      |    sum(new_session) OVER (
      |      PARTITION BY user_id ORDER BY ts
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
      |  FROM flagged)
      |SELECT user_id,
      |  min_ts AS session_start,
      |  max_ts + INTERVAL 30 MINUTE AS session_end,
      |  n_events,
      |  ${Exact.microSumTo4dpSql("s_micro", Exact.DuckDiv)} AS sum_value
      |FROM (
      |  SELECT user_id, session_no, min(ts) AS min_ts, max(ts) AS max_ts,
      |    count(*) AS n_events,
      |    CAST(sum(${Exact.microSql("value")}) AS BIGINT) AS s_micro
      |  FROM sess GROUP BY user_id, session_no)
      |ORDER BY user_id, session_start""".stripMargin

  /** AS-OF join: each event picks up the user's most recent order-day
    * total as of the event time (graft.ops.AsOf — union+window
    * composition, one shuffle on the key). Oracle: DuckDB's native
    * ASOF LEFT JOIN over the identical pre-aggregated right side.
    */
  private def eventsAsofOrders(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ordersDaily = Tables.orders(s, dir)
      .groupBy($"o_custkey", $"o_orderdate")
      .agg(round(sum($"o_totalprice"), 2).as("day_total"))
    graft.ops.AsOf.asofJoin(
        Tables.events(s, dir).select($"event_id", $"user_id", $"ts"),
        ordersDaily,
        leftKey = "user_id", rightKey = "o_custkey",
        leftTime = "ts", rightTime = "o_orderdate",
        carry = Seq("day_total"))
      .select($"event_id", $"user_id", $"asof_time".as("asof_date"), $"day_total")
      .orderBy($"event_id")
  }

  private val eventsAsofOracle =
    """WITH r AS (
      |  SELECT o_custkey, o_orderdate, round(sum(o_totalprice), 2) AS day_total
      |  FROM orders GROUP BY o_custkey, o_orderdate)
      |SELECT e.event_id, e.user_id, r.o_orderdate AS asof_date, r.day_total
      |FROM events e ASOF LEFT JOIN r
      |  ON e.user_id = r.o_custkey AND e.ts >= r.o_orderdate
      |ORDER BY e.event_id""".stripMargin

  /** Sliding 1-hour windows advancing every 15 minutes — each event lands
    * in 4 overlapping windows. Spark's window(ts, len, slide) replicates
    * rows window-side BEFORE the shuffle (map-side explode, group key
    * cardinality = slides × types — still tiny); the oracle reproduces
    * the replication with an explicit generate_series unnest. Counting
    * in micro-units like tumblingHourly (round(double) portability).
    */
  private def slidingHourly(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .withColumn("v_micro", Exact.micro("value"))
      .groupBy(window($"ts", "1 hour", "15 minutes").as("w"), $"event_type")
      .agg(count(lit(1)).as("n"), sum($"v_micro").as("s_micro"))
      .select($"w.start".as("window_start"), $"event_type", $"n",
        Exact.microSumTo4dp("s_micro").as("sum_value"))
      .orderBy($"window_start", $"event_type")
  }

  private val slidingOracle =
    s"""SELECT window_start, event_type, n,
      |  ${Exact.microSumTo4dpSql("s_micro", Exact.DuckDiv)} AS sum_value
      |FROM (
      |  SELECT window_start, event_type, count(*) AS n,
      |    CAST(sum(${Exact.microSql("value")}) AS BIGINT) AS s_micro
      |  FROM (
      |    SELECT event_type, value,
      |      make_timestamp(epoch_us(ts) // 900000000 * 900000000
      |        - k.k * 900000000) AS window_start
      |    FROM events
      |    CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS k) k)
      |  GROUP BY window_start, event_type)
      |ORDER BY window_start, event_type""".stripMargin

  val queries: Seq[Q] = Seq(
    Q("events_asof_orders", eventsAsofOrders, Some(eventsAsofOracle)),
    Q("events_sliding_hourly", slidingHourly, Some(slidingOracle)),
    Q("events_tumbling_hourly", tumblingHourly, Some(tumblingOracle)),
    Q("events_sessionize", sessionize, Some(sessionizeOracle)),
    Q("events_session_window", sessionWindow, Some(sessionWindowOracle)),
    Q("events_json_props", jsonProps, Some(jsonPropsOracle)),
    Q("events_daily_pivot", dailyPivot, Some(dailyPivotOracle)))
}
