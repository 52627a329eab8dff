package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{col, udaf}

import graft.plans.{BloomExpressions, BloomKernels}

/** Bloom runtime filter — the semi-join reduction that keeps a 100 TB
  * fact scan from shuffling rows that cannot survive a selective dim
  * join. Build: a mergeable constant-size Aggregator ORs each dim key's
  * k probe bits into a fixed word array (16 KB at m=2^17 — map-side
  * partials, one tiny final merge). Probe: a codegen'd native
  * expression filters the fact BEFORE its shuffle/join. The filter
  * admits false positives only (the join removes them), never false
  * negatives — so the pruned plan is bit-identical to the unpruned one,
  * which is exactly what the oracle gate proves.
  *
  * This is the hand-rolled form of Spark's own
  * spark.sql.optimizer.runtime.bloomFilter (InjectRuntimeFilter), built
  * explicitly so the mechanism is visible, testable, and available on
  * plans the optimizer rule wouldn't rewrite.
  */
object BloomOps {

  /** Default 2^17 bits / 5 probes: n=10^4 keys → fpp ≈ 3·10^-4;
    * n=10^5 → ≈ 0.08. Size the bits ~13×n for ~1% fpp.
    */
  val DefaultBits: Int = 1 << 17
  val DefaultProbes: Int = 5

  /** Mergeable Bloom build: zero = empty word array, reduce = set k
    * bits, merge = word-wise OR. Constant 8·numWords bytes per partial
    * regardless of group size — the same sketch discipline as
    * Aggregators.KmvDistinct.
    */
  final class BloomAgg(numWords: Int, k: Int)
      extends Aggregator[Long, Array[Long], Array[Long]] {
    require((numWords & (numWords - 1)) == 0, "numWords must be a power of two")
    override def zero: Array[Long] = new Array[Long](numWords)
    override def reduce(b: Array[Long], key: Long): Array[Long] = {
      BloomKernels.setBits(b, key, k); b
    }
    override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < x.length) { x(i) |= y(i); i += 1 }
      x
    }
    override def finish(b: Array[Long]): Array[Long] = b
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Build the filter over a (selective, dim-sized) key column and pull
    * the 16 KB word array to the driver — a constant-size scalar
    * bridge, like a broadcast variable's build side, NOT a data-sized
    * collect.
    */
  def buildBloom(keys: DataFrame, keyCol: String,
      mBits: Int = DefaultBits, k: Int = DefaultProbes): Array[Long] = {
    val agg = udaf(new BloomAgg(mBits / 64, k))
    keys.select(agg(col(keyCol)).as("w"))
      .head().getAs[collection.Seq[Long]]("w").toArray
  }

  /** Probe column for pruning a fact scan: keep rows whose key might be
    * in the filter (codegen'd, evaluated inside the scan stage).
    */
  def mightContain(key: Column, words: Array[Long],
      k: Int = DefaultProbes): Column =
    BloomExpressions.bloomMightContain(key, words, k)
}
