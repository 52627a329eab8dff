package graft

import org.apache.spark.sql.functions._
import graft.ops.Aggregators

class AggregatorsSpec extends SparkSpec {
  import spark.implicits._

  test("ConcatInOrder: order-correct under partitioned aggregation") {
    val udafCol = udaf(new Aggregators.ConcatInOrder)
    val df = Seq((1, 3L, "c"), (1, 1L, "a"), (1, 2L, "b"), (2, 1L, "x"))
      .toDF("g", "ord", "s")
      .repartition(4) // force merge path
    val got = df.groupBy($"g")
      .agg(udafCol($"ord", $"s").as("txt"))
      .orderBy($"g").as[(Int, String)].collect().toSeq
    assert(got == Seq((1, "a b c"), (2, "x")))
  }

  test("KmvDistinct: exact below k, matches k-th-smallest formula above") {
    val k = 16
    val kmv = udaf(new Aggregators.KmvDistinct(k))
    // below k distinct values: exhaustive, returns the exact count
    val small = (1 to 10).flatMap(i => Seq(i.toLong, i.toLong)).toDF("h")
      .repartition(4)
      .agg(kmv($"h")).first().getLong(0)
    assert(small == 10L)
    // above k: (k-1)*M / h_k with h_k the k-th smallest distinct hash
    val rnd = new scala.util.Random(7)
    val hashes = Seq.fill(500)(rnd.nextLong().abs % (1L << 28))
    val got = hashes.toDF("h").repartition(8).agg(kmv($"h")).first().getLong(0)
    val hk = hashes.distinct.sorted.apply(k - 1)
    val expected = math.round((k - 1) * 268435456.0 / math.max(hk, 1L))
    assert(got == expected)
    // sanity: the estimate is in the right ballpark of the true count
    assert(got > 200 && got < 1200, s"estimate $got wildly off")
  }

  test("MisraGries: exact below capacity, bounded error above it") {
    // exact regime: distinct (3) <= capacity (8) -> true counts
    val mg8 = udaf(new Aggregators.MisraGries(8))
    val small = (Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ Seq.fill(20)("c"))
    val exact = small.toDF("k").repartition(8)
      .agg(mg8($"k")).first().getMap[String, Long](0)
    assert(exact == Map("a" -> 50L, "b" -> 30L, "c" -> 20L))

    // lossy regime: capacity 2 over 12 distinct keys, n = 400.
    // MG guarantee: every key with true count > n/(c+1) survives, and
    // estimates sit in [true - n/(c+1), true] — regardless of partial
    // aggregation order (repartition(8) forces multi-buffer merges).
    val mg2 = udaf(new Aggregators.MisraGries(2))
    val n = 400
    val heavy = Seq.fill(200)("hot") ++ Seq.fill(120)("warm")
    val tail = (0 until n - 320).map(i => s"t${i % 10}")
    val got = (heavy ++ tail).toDF("k").repartition(8)
      .agg(mg2($"k")).first().getMap[String, Long](0)
    val err = n / 3 // n/(c+1)
    assert(got.contains("hot"), s"hot (true 200 > $err) must survive: $got")
    assert(got("hot") <= 200 && got("hot") >= 200 - err, s"hot estimate ${got("hot")}")
    got.get("warm").foreach(v => assert(v <= 120, s"warm overestimated: $v"))
    assert(got.size <= 2)
  }

  test("TopKByScore: bounded per-group top-k equals window ranking") {
    val udafCol = udaf(new Aggregators.TopKByScore(3))
    val rnd = new scala.util.Random(11)
    val rows = (1 to 500).map(i => (i % 5, rnd.nextDouble(), i.toLong))
    val df = rows.toDF("g", "score", "id").repartition(8)
    val got = df.groupBy($"g")
      .agg(udafCol($"score", $"id").as("top"))
      .as[(Int, Seq[Long])].collect().toMap
    val expected = rows.groupBy(_._1).map { case (g, rs) =>
      g -> rs.sortBy(r => (-r._2, r._3)).take(3).map(_._3).toSeq
    }
    assert(got == expected)
  }
}
