package graft

import java.nio.file.Files
import graft.queries.Registry

/** unigram_lm_segment on a corpus small enough to enumerate by hand:
  * the Viterbi DP must pick the single multi-char piece when its
  * log-probability beats every split, and the packed (score, pieces)
  * encoding must decode to the analytic optimum.
  */
class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  test("DP picks the whole-word piece when it dominates") {
    val dir = Files.createTempDirectory("graft_uni").toString
    // word types: abab (n=3), xy (n=1). Piece freqs (weighted by type
    // count, every start position): a=6 b=6 x=1 y=1, ab=6 ba=3 aba=3
    // bab=3 abab=3 xy=1 -> F = 33.
    // Best "abab": [abab] = ln(3/33) beats [ab,ab] = 2*ln(6/33).
    Seq((1L, "abab abab xy", "en", "s1"), (2L, "abab", "en", "s1"))
      .map { case (id, t, l, src) => (id, t, l, src, t.length) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val rows = Registry.queries("unigram_lm_segment")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getInt(2), r.getInt(3), r.getDouble(4))).toMap
    def lp(f: Long): Double = {
      val micro = java.math.BigDecimal
        .valueOf(math.log(f.toDouble / 33.0) * 1e6)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
      java.math.BigDecimal.valueOf(micro.toDouble / 1e6)
        .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    }
    assert(rows("abab") == ((3L, 4, 1, lp(3))), rows.toString)
    assert(rows("xy") == ((1L, 2, 1, lp(1))), rows.toString)

    // hard-EM usage counts: both optimal paths are whole-word pieces,
    // so exactly two pieces survive with weighted counts 3 and 1
    val em = Registry.queries("unigram_em_step")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    def lpm(n: Long, t: Long): Long = java.math.BigDecimal
      .valueOf(math.log(n.toDouble / t.toDouble) * 1e6)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
    assert(em == Map(
      "abab" -> ((3L, 1L, lpm(3, 4))),
      "xy" -> ((1L, 1L, lpm(1, 4)))), em.toString)
  }

  test("segmentations are well-formed on the harness corpus") {
    val rows = Registry.queries("unigram_lm_segment")(
      spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getInt(2), r.getInt(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (w, nChars, nPieces, logprob) =>
      assert(nPieces >= 1 && nPieces <= nChars, s"$w: $nPieces/$nChars")
      assert(logprob < 0.0, s"$w: $logprob")
      assert(nChars == w.length)
    }
  }
}
