package graft

import graft.ops.AsOf

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private val left = Seq(
    (1L, "u1", 100L), // before any right row -> null
    (2L, "u1", 200L), // exactly at right t=200 -> inclusive match
    (3L, "u1", 350L), // after t=300 -> 300 wins over 200
    (4L, "u2", 500L), // other key
    (5L, "u3", 500L)) // key with no right rows at all
    .toDF("id", "k", "t")

  private val right = Seq(
    ("u1", 200L, "a"), ("u1", 300L, "b"), ("u2", 400L, "c"))
    .toDF("k", "t", "v")

  test("asofJoin: inclusive latest-prior match, nulls when none") {
    val got = AsOf.asofJoin(left, right, "k", "k", "t", "t", Seq("v"))
      .select($"id", $"asof_time", $"v")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        r.getString(2))).toSet
    assert(got == Set(
      (1L, -1L, null),
      (2L, 200L, "a"),
      (3L, 300L, "b"),
      (4L, 400L, "c"),
      (5L, -1L, null)))
  }

  test("asofJoin: NULL carry value is attached, not skipped (no row tear)") {
    // right row at t=2 has v=NULL; the t=3 probe must get (asof_time=2,
    // v=NULL) — not v from the older t=1 row paired with t=2's timestamp
    val r = Seq(("u1", 1L, Some("x")), ("u1", 2L, None))
      .toDF("k", "t", "v")
    val got = AsOf.asofJoin(
        Seq((1L, "u1", 3L)).toDF("id", "k", "t"),
        r, "k", "k", "t", "t", Seq("v"))
      .select($"asof_time", $"v").first()
    assert(got.getLong(0) == 2L)
    assert(got.isNullAt(1))
  }

  test("asofJoin carries multiple columns") {
    val r2 = Seq(("u1", 10L, "x", 1.5)).toDF("k", "t", "v", "w")
    val got = AsOf.asofJoin(
        Seq((1L, "u1", 20L)).toDF("id", "k", "t"),
        r2, "k", "k", "t", "t", Seq("v", "w"))
      .select($"v", $"w").first()
    assert(got.getString(0) == "x" && got.getDouble(1) == 1.5)
  }
}
