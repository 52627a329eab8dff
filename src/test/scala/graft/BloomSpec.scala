package graft

import graft.ops.BloomOps
import graft.plans.BloomKernels

/** Bloom runtime filter: the load-bearing guarantees are (1) ZERO false
  * negatives — pruning can never drop a matching fact row — and (2) a
  * false-positive rate small enough that the prune is worth it. Both
  * tested on the kernel directly and through the distributed
  * build-then-probe path (multi-partition → the Aggregator's merge ORs
  * partial word arrays).
  */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  test("no false negatives through the distributed build (merge path)") {
    val keys = (1L to 500L).map(_ * 7919)
    val df = keys.toDF("k").repartition(4) // forces partial-buffer merges
    val words = BloomOps.buildBloom(df, "k")
    assert(keys.forall(BloomKernels.mightContain(_, words, BloomOps.DefaultProbes)))
  }

  test("false-positive rate is near the analytic bound") {
    val keys = (1L to 500L).map(_ * 7919)
    val words = BloomOps.buildBloom(keys.toDF("k"), "k")
    // n=500, m=2^17, k=5 → fpp = (1 - e^{-kn/m})^k ≈ 2.4e-9; across
    // 100k foreign probes even 10 hits would be 4000× the bound
    val probes = (1L to 100000L).filterNot(keys.toSet)
    val fp = probes.count(BloomKernels.mightContain(_, words, BloomOps.DefaultProbes))
    assert(fp <= 10, s"false positives: $fp / ${probes.size}")
  }

  test("probe column prunes a DataFrame without losing members") {
    val keys = Seq(3L, 17L, 4242L)
    val words = BloomOps.buildBloom(keys.toDF("k"), "k")
    val kept = (1L to 10000L).toDF("k")
      .filter(BloomOps.mightContain($"k", words))
      .as[Long].collect().toSet
    assert(keys.forall(kept)) // members always survive
    assert(kept.size < 100, s"pruned frame kept ${kept.size} of 10000")
  }
}
