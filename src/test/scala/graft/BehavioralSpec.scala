package graft

import java.nio.file.Files
import java.sql.Timestamp
import graft.queries.Registry

/** Planted-data semantics for the behavioral/temporal suite — the
  * harness data is dense enough that (e.g.) every user completes the
  * funnel, so these prove the ORDERING / tombstone / change-collapse /
  * gap rules actually bite.
  */
class BehavioralSpec extends SparkSpec {
  import spark.implicits._

  /** events.parquet schema with ts as raw NANOS long (what the harness
    * files store and Tables.events expects under nanosAsLong).
    */
  private def writeEvents(dir: String, rows: Seq[(Long, Long, Long, String, Double)]): Unit =
    rows.map { case (id, tsNanos, user, typ, v) => (id, tsNanos, user, typ, v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$dir/events.parquet")

  private def writeOrders(dir: String, rows: Seq[(Long, Long, String, Double, Timestamp, String)]): Unit =
    rows.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
      .coalesce(1).write.parquet(s"$dir/orders.parquet")

  private def ns(day: Int, hour: Int): Long =
    (19719L * 86400 + day * 86400L + hour * 3600L) * 1000000000L // week-aligned epoch day

  test("funnel counts only strictly-ordered stage completions") {
    val dir = Files.createTempDirectory("graft_funnel").toString
    writeEvents(dir, Seq(
      // user 10: full ordered funnel
      (1L, ns(0, 1), 10L, "signup", 1.0),
      (2L, ns(0, 2), 10L, "view", 1.0),
      (3L, ns(0, 3), 10L, "click", 1.0),
      (4L, ns(0, 4), 10L, "purchase", 1.0),
      // user 11: signup then purchase with no view — stops at stage 1
      (5L, ns(0, 1), 11L, "signup", 1.0),
      (6L, ns(0, 2), 11L, "purchase", 1.0),
      // user 12: never signs up — counted nowhere
      (7L, ns(0, 1), 12L, "view", 1.0),
      (8L, ns(0, 2), 12L, "click", 1.0),
      // user 13: view BEFORE signup only — strict ordering stops it
      (9L, ns(0, 1), 13L, "view", 1.0),
      (10L, ns(0, 2), 13L, "signup", 1.0)))
    val got = Registry.queries("funnel_steps")(spark, dir)
      .as[(String, Long)].collect().toMap
    assert(got == Map(
      "1_signup" -> 3L, "2_view" -> 1L, "3_click" -> 1L, "4_purchase" -> 1L), got.toString)
  }

  test("attribution credits last/first prior touch; direct buys hit 'none'") {
    val dir = Files.createTempDirectory("graft_attr").toString
    writeEvents(dir, Seq(
      // user 10: view → click → purchase(5.5): last=click, first=view
      (1L, ns(0, 1), 10L, "view", 1.0),
      (2L, ns(0, 2), 10L, "click", 1.0),
      (3L, ns(0, 3), 10L, "purchase", 5.5),
      // user 11: purchase with NO prior touch → 'none'; the view AFTER
      // must not be credited
      (4L, ns(0, 1), 11L, "purchase", 2.0),
      (5L, ns(0, 2), 11L, "view", 1.0),
      // user 12: ts TIE between click(id 6) and view(id 7) — event_id
      // breaks it, so last touch is the view; an intervening purchase
      // is never a touch for the next purchase
      (6L, ns(0, 1), 12L, "click", 1.0),
      (7L, ns(0, 1), 12L, "view", 1.0),
      (8L, ns(0, 2), 12L, "purchase", 1.25),
      (9L, ns(0, 3), 12L, "purchase", 0.75)))
    val got = Registry.queries("attribution_touch")(spark, dir)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      // user 12: both purchases last-credit the view (the intervening
      // purchase is transparent) and first-credit the click (event_id
      // breaks the ts tie), so view takes 1.25 + 0.75 of revenue
      ("click", 1L, 2L, 5.5),
      ("none", 1L, 1L, 2.0),
      ("view", 2L, 1L, 2.0)), got.toString)
  }

  test("cdc latest-state honors (ts, event_id) order and error tombstones") {
    val dir = Files.createTempDirectory("graft_cdc").toString
    writeEvents(dir, Seq(
      // user 1: last event by ts is an error → key deleted
      (1L, ns(0, 1), 1L, "view", 1.0),
      (2L, ns(0, 2), 1L, "error", 1.0),
      // user 2: two events at the SAME ts — event_id breaks the tie
      (3L, ns(0, 1), 2L, "view", 1.5),
      (4L, ns(0, 1), 2L, "purchase", 2.5),
      // user 3: plain latest wins
      (5L, ns(0, 1), 3L, "purchase", 9.0),
      (6L, ns(0, 5), 3L, "click", 3.25)))
    val got = Registry.queries("cdc_latest_state")(spark, dir)
      .select("user_id", "last_event_id", "last_type", "last_v_micro")
      .as[(Long, Long, String, Long)].collect().toSet
    assert(got == Set(
      (2L, 4L, "purchase", 2500000L),
      (3L, 6L, "click", 3250000L)), got.toString)
  }

  test("retention cohorts report week offsets from each user's first week") {
    val dir = Files.createTempDirectory("graft_ret").toString
    writeEvents(dir, Seq(
      // user 1: active weeks +0 and +2 (day 0 is week-aligned in ns())
      (1L, ns(0, 1), 1L, "view", 1.0),
      (2L, ns(14, 1), 1L, "view", 1.0),
      // user 2: joins a week later, active only that week
      (3L, ns(7, 1), 2L, "view", 1.0)))
    val w0 = (19719L + 0) / 7
    val got = Registry.queries("retention_cohorts")(spark, dir)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((w0, 0L, 1L), (w0, 2L, 1L), (w0 + 1, 0L, 1L)), got.toString)
  }

  test("scd2 opens a version only on change and chains validity") {
    val dir = Files.createTempDirectory("graft_scd2").toString
    def t(d: String) = Timestamp.valueOf(s"$d 00:00:00")
    writeOrders(dir, Seq(
      (1L, 7L, "F", 10.0, t("1995-01-01"), "A"),
      (2L, 7L, "F", 10.0, t("1995-02-01"), "A"), // same value → NO new version
      (3L, 7L, "F", 10.0, t("1995-03-01"), "B"),
      (4L, 7L, "F", 10.0, t("1995-04-01"), "A"))) // back to A → new version
    val got = Registry.queries("scd2_order_priority")(spark, dir)
      .select("version_no", "priority", "valid_from", "valid_to", "is_current")
      .as[(Long, String, Timestamp, Option[Timestamp], Boolean)].collect().toList
    assert(got == List(
      (1L, "A", t("1995-01-01"), Some(t("1995-03-01")), false),
      (2L, "B", t("1995-03-01"), Some(t("1995-04-01")), false),
      (3L, "A", t("1995-04-01"), None, true)), got.toString)
  }

  test("gapfill densifies silent days and carries the last sale forward") {
    val dir = Files.createTempDirectory("graft_gap").toString
    def t(d: String) = Timestamp.valueOf(s"$d 00:00:00")
    writeOrders(dir, Seq(
      (1L, 1L, "F", 100.50, t("1995-01-01"), "A"),
      (2L, 1L, "F", 9.50, t("1995-01-04"), "A")))
    val got = Registry.queries("gapfill_daily_revenue")(spark, dir)
      .select("revenue", "days_since_sale")
      .as[(Double, Int)].collect().toList
    assert(got == List((100.50, 0), (0.0, 1), (0.0, 2), (9.50, 0)), got.toString)
  }

  test("anomaly flags only >2-sigma-above-mean orders of n>=5 customers") {
    val dir = Files.createTempDirectory("graft_anom").toString
    def t(d: String) = Timestamp.valueOf(s"$d 00:00:00")
    // customer 1: five 100s and one 10_000 → the spike is >2σ above mean
    val base = (1 to 5).map(i =>
      (i.toLong, 1L, "F", 100.0, t(s"1995-01-0$i"), "A"))
    val spike = Seq((6L, 1L, "F", 10000.0, t("1995-01-06"), "A"))
    // customer 2: an identical spike but only 2 orders → below the n≥5 gate
    val small = Seq(
      (7L, 2L, "F", 100.0, t("1995-01-01"), "A"),
      (8L, 2L, "F", 10000.0, t("1995-01-02"), "A"))
    writeOrders(dir, base ++ spike ++ small)
    val got = Registry.queries("anomaly_orders")(spark, dir)
      .select("o_orderkey").as[Long].collect().toList
    assert(got == List(6L), got.toString)
  }
}
