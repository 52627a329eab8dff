package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.Aggregators
import graft.queries.Registry

/** HLL register semantics + Count-Min guarantees beyond what the oracle
  * gate can see: the gate proves cross-engine equality of the full
  * pipeline, these tests pin the SKETCH-theoretic properties (register
  * content under merge trees, one-sided CM error) on adversarial inputs
  * the harness tables don't contain.
  */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def refRegisters(hashes: Seq[Long]): Array[Int] = {
    val regs = new Array[Int](256)
    hashes.foreach { h =>
      val b = (h & 255).toInt
      val w = h >>> 8
      val rho = if (w == 0L) 53 else java.lang.Long.numberOfLeadingZeros(w) - 11
      if (rho > regs(b)) regs(b) = rho
    }
    regs
  }

  test("HllRegisters: registers match reference under partitioned merges") {
    val hll = udaf(new Aggregators.HllRegisters)
    val rnd = new scala.util.Random(11)
    val hashes = Seq.fill(5000)(rnd.nextLong().abs % (1L << 60)) :+ 0L :+ 255L
    // 0L exercises bucket 0 / zero-remainder (rho = 53); 255L exercises
    // bucket 255 / zero-remainder
    val got = hashes.toDF("h").repartition(8) // force multi-buffer merge
      .agg(hll($"h")).first().getSeq[Int](0).toArray
    assert(got.sameElements(refRegisters(hashes)))
  }

  test("HllRegisters: raw estimate within 3 standard errors on 10k distinct") {
    val hll = udaf(new Aggregators.HllRegisters)
    val rnd = new scala.util.Random(23)
    val n = 10000
    val hashes = Iterator.continually(rnd.nextLong().abs % (1L << 60))
      .distinct.take(n).toSeq
    val regs = hashes.toDF("h").repartition(8)
      .agg(hll($"h")).first().getSeq[Int](0)
    val s = regs.map(r => 1L << (53 - r)).sum
    val est = 0.7213 / (1 + 1.079 / 256) * 590295810358705651712.0 / s
    // std error for m=256 is 1.04/sqrt(256) = 6.5%; allow 3 sigma
    assert(math.abs(est - n) / n < 0.195, s"estimate $est vs true $n")
  }

  test("HllRegisters: merge-tree invariant — same registers at any width") {
    // Spark is free to build ANY partial-aggregation tree; a sketch
    // that is only correct for one merge order would pass the oracle
    // gate by luck. Pin equality across widths 1/3/16 on data with
    // heavy duplication (merge sees overlapping registers).
    val hll = udaf(new Aggregators.HllRegisters)
    val rnd = new scala.util.Random(31)
    val hashes = Seq.fill(2000)(rnd.nextLong().abs % (1L << 60))
      .flatMap(h => Seq(h, h, h)) // triplicate: non-trivial overlaps
    val byWidth = Seq(1, 3, 16).map { w =>
      hashes.toDF("h").repartition(w).agg(hll($"h"))
        .first().getSeq[Int](0).toSeq
    }
    assert(byWidth.distinct.size == 1,
      "registers differ across partial-aggregation widths")
  }

  test("quantile_sketch_prices: estimates sandwich the exact percentiles") {
    val dir = Files.createTempDirectory("graft_qs").toString
    // log-spread prices across many octaves (the sketch's hard case),
    // deterministic; exact percentiles computed in-test by sorting
    val rnd = new scala.util.Random(7)
    val prices = (1 to 5000).map(_ =>
      math.round(math.exp(rnd.nextDouble() * 9 + 2) * 100.0) / 100.0)
    prices.zipWithIndex.map { case (p, i) => (i.toLong, p) }
      .toDF("o_orderkey", "o_totalprice")
      .coalesce(1).write.parquet(s"$dir/orders.parquet")

    val row = Registry.queries("quantile_sketch_prices")(spark, dir).first()
    assert(row.getLong(0) == 5000L)
    val sorted = prices.sorted
    def exactAtCeil(q: Double): Double = sorted((q * 5000).ceil.toInt - 1)
    for ((est, q) <- Seq(row.getDouble(2) -> 0.5,
        row.getDouble(3) -> 0.9, row.getDouble(4) -> 0.99)) {
      val exact = exactAtCeil(q)
      // lower-bound readout: never above the true quantile, and within
      // one part in eight below it (sub-bucket width / bucket base)
      assert(est <= exact + 1e-9, s"p$q overshot: est $est > exact $exact")
      assert(exact < est * 1.125 + 1e-9,
        s"p$q under by more than 1/8: est $est, exact $exact")
    }
  }

  test("cm_user_frequencies: one-sided error under forced collisions") {
    val dir = Files.createTempDirectory("graft_cm").toString
    // 2300 distinct users over a 512-column sketch: collisions certain,
    // so estimates may exceed truth — but must NEVER undershoot it.
    val heavy = (0 until 3).flatMap(i => Seq.fill(500 - i * 100)(9000L + i))
    val tail = (0 until 2300).flatMap(u => Seq.fill(1 + (u % 3))(u.toLong))
    val rows = (heavy ++ tail).zipWithIndex.map { case (u, i) =>
      (i.toLong, 1700000000000000000L + i * 1000000L, u, "click", 1.0, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$dir/events.parquet")

    val got = Registry.queries("cm_user_frequencies")(spark, dir)
      .as[(String, Long, Long)].collect().toSeq
    assert(got.size == 10)
    assert(got.map(_._2) == got.map(_._2).sorted.reverse, "exact_cnt not desc")
    // the three planted heavies dominate the top-k
    assert(got.take(3).map(_._1) == Seq("9000", "9001", "9002"))
    got.foreach { case (k, exact, est) =>
      assert(est >= exact, s"CM undershot key $k: est $est < exact $exact")
    }
  }
}
