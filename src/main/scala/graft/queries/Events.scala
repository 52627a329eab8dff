package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Tables

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
    Tables.events(s, dir)
      .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
      .agg(
        count(lit(1)).as("n"),
        round(sum($"value"), 4).as("sum_value"),
        round(avg($"value"), 4).as("avg_value"))
      .select($"w.start".as("hour_start"), $"event_type", $"n", $"sum_value", $"avg_value")
      .orderBy($"hour_start", $"event_type")
  }

  private val tumblingOracle =
    """SELECT date_trunc('hour', ts) AS hour_start, event_type,
      |  count(*) AS n,
      |  round(sum(value), 4) AS sum_value,
      |  round(avg(value), 4) AS avg_value
      |FROM events
      |GROUP BY hour_start, event_type
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
        round(avg($"k"), 4).as("avg_k"),
        min($"k").as("min_k"),
        max($"k").as("max_k"))
      .orderBy($"event_type")
  }

  private val jsonPropsOracle =
    """SELECT event_type,
      |  count(*) AS n,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
      |  round(avg(CAST(json_extract_string(props, '$.k') AS INTEGER)), 4) AS avg_k,
      |  min(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k,
      |  max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
      |FROM events
      |GROUP BY event_type
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
    Tables.events(s, dir)
      .groupBy(session_window($"ts", "30 minutes").as("w"), $"user_id")
      .agg(count(lit(1)).as("n_events"),
        round(sum($"value"), 4).as("sum_value"))
      .select($"user_id", $"w.start".as("session_start"),
        $"w.end".as("session_end"), $"n_events", $"sum_value")
      .orderBy($"user_id", $"session_start")
  }

  private val sessionWindowOracle =
    """WITH t AS (
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
      |  min(ts) AS session_start,
      |  max(ts) + INTERVAL 30 MINUTE AS session_end,
      |  count(*) AS n_events,
      |  round(sum(value), 4) AS sum_value
      |FROM sess
      |GROUP BY user_id, session_no
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

  val queries: Seq[Q] = Seq(
    Q("events_asof_orders", eventsAsofOrders, Some(eventsAsofOracle)),
    Q("events_tumbling_hourly", tumblingHourly, Some(tumblingOracle)),
    Q("events_sessionize", sessionize, Some(sessionizeOracle)),
    Q("events_session_window", sessionWindow, Some(sessionWindowOracle)),
    Q("events_json_props", jsonProps, Some(jsonPropsOracle)),
    Q("events_daily_pivot", dailyPivot, Some(dailyPivotOracle)))
}
