package graft

import graft.queries.Registry

/** domain_reweight_excess: the mixture must be a probability (permille
  * sums to ~1000 modulo floor rounding), token-weighted excess must
  * center on zero, and the multiplicative-weights direction must hold —
  * a domain with higher excess loss gains share relative to its
  * natural (token-mass) share.
  */
class DomainReweightSpec extends SparkSpec {
  import spark.implicits._

  test("weights form a distribution and follow the excess direction") {
    val rows = Registry.queries("domain_reweight_excess")(
      spark, "/root/testdata/sf0.001")
      .select("source", "n_bigrams", "excess", "weight_permille")
      .as[(String, Long, Double, Long)].collect().toSeq
    assert(rows.nonEmpty)
    val totalW = rows.map(_._4).sum
    // integer floors can only lose mass: within |sources| permille low
    assert(totalW <= 1000 && totalW >= 1000 - rows.size, s"sum $totalW")
    // token-weighted excess centers on zero (integer-division slack)
    val nb = rows.map(_._2).sum.toDouble
    val wExcess = rows.map(r => r._2 * r._3).sum / nb
    assert(math.abs(wExcess) < 0.001, s"weighted excess $wExcess")
    // direction: between any two domains, higher excess => boosted
    // weight RELATIVE to natural share (w/share ordering follows
    // excess). weight_permille is an integer FLOOR, so each boost
    // carries up to 1 permille of quantization — allow exactly that.
    for (a <- rows; b <- rows if a._3 > b._3 + 1e-9) {
      val boostA = (a._4 + 1).toDouble / a._2 // +1: undo worst-case floor
      val boostB = b._4.toDouble / b._2
      assert(boostA >= boostB,
        s"${a._1} (excess ${a._3}) not boosted over ${b._1} (${b._3})")
    }
  }
}
