package graft

import org.apache.spark.sql.functions._
import graft.ops.Sampling

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def ids = spark.range(0, 2000).toDF("id")

  test("hash gate is deterministic and partition-independent") {
    val a = ids.filter(Sampling.keep($"id", 7, lit(300L))).select($"id")
      .collect().map(_.getLong(0)).sorted
    val b = ids.repartition(7).filter(Sampling.keep($"id", 7, lit(300L)))
      .select($"id").collect().map(_.getLong(0)).sorted
    assert(a.sameElements(b))
  }

  test("keep rate tracks the requested per-mille within tolerance") {
    val kept = ids.filter(Sampling.keep($"id", 3, lit(250L))).count()
    assert(math.abs(kept / 2000.0 - 0.25) < 0.05, s"kept=$kept")
  }

  test("different seeds give decorrelated samples") {
    val overlap = ids
      .filter(Sampling.keep($"id", 1, lit(500L)) && Sampling.keep($"id", 2, lit(500L)))
      .count()
    // independent 50% gates overlap on ~25%
    assert(overlap > 2000 * 0.15 && overlap < 2000 * 0.35, s"overlap=$overlap")
  }

  test("split covers every row and growing a later cut is monotone") {
    val cuts = Seq("train" -> 900, "val" -> 950)
    val s1 = ids.select($"id", Sampling.split($"id", 13, cuts, "test").as("sp"))
    assert(s1.groupBy($"sp").count().collect().map(_.getLong(1)).sum == 2000)
    // widen val: 950 -> 980. No row may move between train and val/test
    // in a way that crosses the unchanged 900 cut.
    val s2 = ids.select($"id", Sampling.split($"id", 13, Seq("train" -> 900, "val" -> 980), "test").as("sp2"))
    val moved = s1.join(s2, "id")
      .filter(($"sp" === "train") =!= ($"sp2" === "train")).count()
    assert(moved == 0)
    // and only test -> val movement happens, never val -> test
    val shrunk = s1.join(s2, "id").filter($"sp" === "val" && $"sp2" === "test").count()
    assert(shrunk == 0)
  }

  test("shard shuffle covers the corpus, balances, and repeats exactly") {
    val sf = "/root/testdata/sf0.001"
    def run() = graft.queries.Registry.queries("corpus_shard_shuffle")(spark, sf)
      .select("shard", "n_docs", "sum_chars", "order_check")
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    val a = run()
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(a.map(_._1) == (0L until 8L))
    assert(a.map(_._2).sum == nDocs)
    // hash sharding balances: no shard more than 3x another (n/8 = 12.5
    // expected at sf0.001 — loose bound, but catches mod-bias bugs)
    assert(a.map(_._2).max <= 3 * a.map(_._2).min, a.map(_._2).toString)
    // the permutation (shard assignment AND within-shard order) is
    // deterministic: a fresh plan reproduces every checksum bit-for-bit
    assert(run() == a)
  }

  test("unimaxFromCounts: the epoch cap binds on a skewed corpus") {
    // tiny source (10 tokens, cap 40) + three big ones; budget = one
    // epoch = 3010 tokens. Water-filling: tiny is capped at 4 epochs,
    // the remaining 2970 splits 990/990/990
    val counts = Seq(("tiny", 10L), ("big_a", 1000L), ("big_b", 1000L),
      ("big_c", 1000L)).toDF("source", "n_tokens")
    val got = graft.queries.CorpusSampling.unimaxFromCounts(counts)
      .as[(String, Long, Long, Long, Boolean, Long)].collect().toSeq
    assert(got == Seq(
      ("big_a", 1000L, 4000L, 990L, false, 990L),
      ("big_b", 1000L, 4000L, 990L, false, 990L),
      ("big_c", 1000L, 4000L, 990L, false, 990L),
      ("tiny", 10L, 40L, 40L, true, 4000L)))
  }

  test("unimaxFromCounts: invariants — exact budget, caps respected, near-uniform") {
    val counts = Seq(("a", 7L), ("b", 19L), ("c", 400L), ("d", 401L),
      ("e", 52L)).toDF("source", "n_tokens")
    val rows = graft.queries.CorpusSampling.unimaxFromCounts(counts)
      .as[(String, Long, Long, Long, Boolean, Long)].collect().toSeq
    val budget = rows.map(_._2).sum
    assert(rows.map(_._4).sum == budget, "allocations must spend the budget exactly")
    rows.foreach { case (src, _, cap, alloc, atCap, _) =>
      assert(alloc <= cap, s"$src over its epoch cap")
      assert(atCap == (alloc == cap) || alloc < cap)
    }
    val un = rows.filter(!_._5).map(_._4)
    assert(un.isEmpty || un.max - un.min <= 1,
      s"uncapped allocations must be near-uniform: $un")
  }

  test("corpus_unimax_mix: budget spent exactly on the real corpus") {
    val rows = graft.queries.Registry.queries("corpus_unimax_mix")(
        spark, "/root/testdata/sf0.001")
      .as[(String, Long, Long, Long, Boolean, Long)].collect().toSeq
    assert(rows.map(_._4).sum == rows.map(_._2).sum)
    rows.foreach { case (_, _, cap, alloc, _, _) => assert(alloc <= cap) }
  }
}
