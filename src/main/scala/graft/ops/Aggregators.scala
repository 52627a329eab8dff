package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregates — SURVEY.md §2.12's escalation path for folds
  * the built-ins can't express. Registered via `functions.udaf` when a
  * Column-API handle is needed.
  */
object Aggregators {

  /** Order-correct string concatenation: the reference's
    * accumulate-lines-in-order fold (F13/A4, detail_notes.py:58,76) as a
    * real `Aggregator` — merge-safe (buffers concatenate and sort), so it
    * is correct under partial aggregation, unlike a naive collect_list
    * concat which has no order guarantee.
    */
  final class ConcatInOrder extends Aggregator[(Long, String), List[(Long, String)], String] {
    override def zero: List[(Long, String)] = Nil
    override def reduce(b: List[(Long, String)], a: (Long, String)) = a :: b
    override def merge(x: List[(Long, String)], y: List[(Long, String)]) = x ++ y
    override def finish(b: List[(Long, String)]): String =
      b.sortBy(_._1).map(_._2).mkString(" ")
    override def bufferEncoder: Encoder[List[(Long, String)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[String] = Encoders.STRING
  }

  /** KMV (k-minimum-values) distinct-count sketch over an
    * already-hashed column: keep the k smallest DISTINCT hash values;
    * estimate = (k-1)·M / h_k where h_k is the k-th smallest hash and M
    * the hash space (2^28, TextOps.portableHashBase). Constant memory
    * per group, merge = union-and-trim — the classic mergeable distinct
    * sketch (Bar-Yossef et al.), here over the engine-portable md5
    * prefix so a DuckDB oracle derives the IDENTICAL k-th smallest hash
    * and therefore the identical estimate — a deterministic,
    * cross-engine-checkable approximate aggregate (unlike HLL++, whose
    * sketch layout is engine-private). Below k distinct hashes the
    * sketch is exhaustive and returns the exact count.
    *
    * Buffer is a plain list compacted (distinct → sort → take k) only
    * when it grows past 8k, so per-row reduce is O(1) amortized.
    */
  final class KmvDistinct(k: Int) extends Aggregator[Long, List[Long], Long] {
    private val M = 268435456.0 // 2^28: portableHashBase space

    private def compact(b: List[Long]): List[Long] =
      b.distinct.sorted.take(k)

    override def zero: List[Long] = Nil
    override def reduce(b: List[Long], h: Long): List[Long] = {
      val nb = h :: b
      if (nb.lengthCompare(8 * k) >= 0) compact(nb) else nb
    }
    override def merge(x: List[Long], y: List[Long]): List[Long] =
      compact(x ++ y)
    override def finish(b: List[Long]): Long = {
      val d = compact(b)
      if (d.lengthCompare(k) < 0) d.length.toLong
      // max(h_k, 1): hash 0 in the sketch would divide by zero; the
      // oracle mirrors with greatest(h, 1)
      else math.round((k - 1) * M / math.max(d(k - 1), 1L))
    }
    override def bufferEncoder: Encoder[List[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** [[KmvDistinct]]'s raw SKETCH (the k smallest distinct hashes,
    * ascending) instead of the count estimate — the mergeable form
    * other estimators compose from: bottom-k of a union is bottom-k of
    * the concatenated bottom-k's, so pairwise set-overlap estimates
    * (Jaccard, containment) between groups need only the per-group
    * sketches, never a re-scan or a pair join over the raw sets.
    */
  final class KmvSketch(k: Int) extends Aggregator[Long, List[Long], Seq[Long]] {
    private def compact(b: List[Long]): List[Long] =
      b.distinct.sorted.take(k)
    override def zero: List[Long] = Nil
    override def reduce(b: List[Long], h: Long): List[Long] = {
      val nb = h :: b
      if (nb.lengthCompare(8 * k) >= 0) compact(nb) else nb
    }
    override def merge(x: List[Long], y: List[Long]): List[Long] =
      compact(x ++ y)
    override def finish(b: List[Long]): Seq[Long] = compact(b)
    override def bufferEncoder: Encoder[List[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Misra–Gries heavy-hitters summary: at most `c` counters per group,
    * constant memory regardless of input size. reduce: bump a present
    * key, admit if a slot is free, else decrement every counter (the
    * classic frequent-items step). merge (Agarwal et al., "Mergeable
    * Summaries"): sum counterparts, and if over capacity subtract the
    * (c+1)-th largest count from all and drop the non-positive — the
    * error bound n/(c+1) survives arbitrary merge trees, which is what
    * makes this safe under Spark's partial aggregation. When the true
    * distinct count ≤ c no decrement ever fires and the summary is
    * EXACT — the property the oracle gate exploits (bounded-domain
    * column, generous capacity).
    */
  final class MisraGries(c: Int)
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    private def trim(m: Map[String, Long]): Map[String, Long] =
      if (m.size <= c) m
      else {
        val bar = m.values.toSeq.sorted(Ordering[Long].reverse)(c)
        m.collect { case (k, v) if v > bar => k -> (v - bar) }
      }
    override def zero: Map[String, Long] = Map.empty
    override def reduce(b: Map[String, Long], key: String): Map[String, Long] =
      b.get(key) match {
        case Some(v)            => b.updated(key, v + 1)
        case None if b.size < c => b.updated(key, 1L)
        case None => // decrement-all; evict exhausted counters
          b.collect { case (k, v) if v > 1 => k -> (v - 1) }
      }
    override def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] =
      trim(y.foldLeft(x) { case (m, (k, v)) =>
        m.updated(k, m.getOrElse(k, 0L) + v)
      })
    override def finish(b: Map[String, Long]): Map[String, Long] = b
    override def bufferEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Bounded top-k by score: keeps at most k (score, payload) pairs per
    * group — constant memory per group regardless of group size, the
    * aggregation-side alternative to window row_number + filter when
    * groups are huge (the 100 TB-safe shape for per-key top-k).
    */
  final class TopKByScore(k: Int)
      extends Aggregator[(Double, Long), List[(Double, Long)], Seq[Long]] {
    private def trim(b: List[(Double, Long)]) =
      b.sortBy { case (s, id) => (-s, id) }.take(k)
    override def zero: List[(Double, Long)] = Nil
    // amortized O(log k)/row: let the buffer grow to 2k unsorted, then
    // trim — a full sort per input row would make the hot per-row path
    // O(k log k) for no behavioral difference (merge/finish re-trim)
    override def reduce(b: List[(Double, Long)], a: (Double, Long)) = {
      val nb = a :: b
      if (nb.lengthCompare(2 * k) >= 0) trim(nb) else nb
    }
    override def merge(x: List[(Double, Long)], y: List[(Double, Long)]) = trim(x ++ y)
    override def finish(b: List[(Double, Long)]): Seq[Long] = trim(b).map(_._2)
    override def bufferEncoder: Encoder[List[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** HyperLogLog register array (Flajolet et al. 2007) over the 60-bit
    * engine-portable hash ([[TextOps.portableHash64]]): 256 registers
    * (b=8), bucket = low byte, rho = leading-zero rank of the remaining
    * 52 bits (1..52; 53 marks the all-zero remainder). State is 256
    * ints, merge = elementwise max — the textbook mergeable sketch, safe
    * under any partial-aggregation tree. Unlike Spark's built-in
    * approx_count_distinct (HLL++, engine-private layout and bias
    * tables), every register here is derivable by another engine from
    * md5 alone, so a DuckDB oracle reproduces the IDENTICAL array (via
    * `53 - length(bin(h // 256))`) and therefore the identical
    * estimate. The raw-estimate formula and its corrections live with
    * the caller — the aggregate's contract is just the registers.
    */
  final class HllRegisters extends Aggregator[Long, Array[Int], Array[Int]] {
    private val M = 256
    override def zero: Array[Int] = new Array[Int](M)
    override def reduce(b: Array[Int], h: Long): Array[Int] = {
      val bucket = (h & (M - 1)).toInt
      val w = h >>> 8 // 52 significant bits remain below 2^52
      val rho = if (w == 0L) 53 else java.lang.Long.numberOfLeadingZeros(w) - 11
      if (rho > b(bucket)) b(bucket) = rho
      b
    }
    override def merge(x: Array[Int], y: Array[Int]): Array[Int] = {
      var i = 0
      while (i < M) { if (y(i) > x(i)) x(i) = y(i); i += 1 }
      x
    }
    override def finish(b: Array[Int]): Array[Int] = b
    override def bufferEncoder: Encoder[Array[Int]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[Array[Int]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** One-pass exact second moments of an embedding column in integer
    * micro-units — the distributed half of PCA/whitening: count, Σx_j,
    * and the upper-triangle Gram Σ round(x_i·x_j·1e6). Buffer layout:
    * [0] = n, [1..dim] = s_j, then g(i,j) for i ≤ j at
    * dim+1 + i·dim − i(i−1)/2 + (j−i). Each term is quantized
    * (`floor(x_i·x_j·1e6 + 0.5)`, f32→f64 exact, same IEEE ops the
    * DuckDB oracle runs), so partial sums are INTEGERS — merge order
    * across partitions cannot change the result, which is what makes
    * the whole PCA gate engine-portable. Map-side combine applies as
    * with any Aggregator; one buffer of 1 + dim + dim(dim+1)/2 longs
    * (dim 64 → 2145, ~17 KB) per partition reaches the driver.
    *
    * Per-term magnitude ≤ 1e6 for unit-normalized embeddings, so Long
    * overflow needs ~9e12 rows per EXECUTOR-PARTIAL — at petabyte row
    * counts, widen to 128-bit accumulation (the oracle already runs
    * HUGEINT); the driver-side eigen math is BigInt and has no bound.
    */
  final class VecMoments(dim: Int)
      extends Aggregator[Seq[Float], Array[Long], Seq[Long]] {
    private val size = 1 + dim + dim * (dim + 1) / 2
    override def zero: Array[Long] = new Array[Long](size)
    override def reduce(b: Array[Long], v: Seq[Float]): Array[Long] = {
      require(v != null && v.length == dim,
        s"VecMoments(dim=$dim): embedding of length ${if (v == null) -1 else v.length}")
      val x = new Array[Double](dim)
      var j = 0
      while (j < dim) { x(j) = v(j).toDouble; j += 1 }
      b(0) += 1L
      j = 0
      var t = 1 + dim
      while (j < dim) {
        b(1 + j) += math.floor(x(j) * 1000000.0 + 0.5).toLong
        j += 1
      }
      var i = 0
      while (i < dim) {
        j = i
        while (j < dim) {
          b(t) += math.floor(x(i) * x(j) * 1000000.0 + 0.5).toLong
          t += 1
          j += 1
        }
        i += 1
      }
      b
    }
    override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < size) { x(i) += y(i); i += 1 }
      x
    }
    override def finish(b: Array[Long]): Seq[Long] = b.toSeq
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }
}
