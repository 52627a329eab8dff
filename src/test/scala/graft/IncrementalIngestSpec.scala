package graft

import java.nio.file.Files
import graft.queries.Registry

/** Black-box test of incremental_ingest on a planted corpus covering all
  * three classification branches (the sf0.01 harness data happens to
  * contain no src19 duplicates, so the oracle gate alone never fires the
  * exact_dup / near_dup branches there — sf0.1 does).
  */
class IncrementalIngestSpec extends SparkSpec {
  import spark.implicits._

  test("incremental_ingest classifies exact, near and novel batch docs") {
    val dir = Files.createTempDirectory("graft_incr").toString
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val near = "alpha beta gamma delta epsilon zeta eta theta iota NOPE"
    Seq(
      // corpus
      (1L, base, "en", "src0", base.length.toLong),
      (2L, "completely different words in this one here", "en", "src1", 44L),
      // batch: exact copy of 1, near-dup of 1, novel
      (10L, base, "en", "src19", base.length.toLong),
      (11L, near, "en", "src19", near.length.toLong),
      (12L, "nothing shared with anything else at all", "en", "src19", 40L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")

    val got = Registry.queries("incremental_ingest")(spark, dir)
      .as[(Long, String, Double)].collect().toSeq
    assert(got.map(r => r._1 -> r._2) ==
      Seq(10L -> "exact_dup", 11L -> "near_dup", 12L -> "novel"))
    // exact copy: identical shingle sets, J = 1; near-dup: 9 shared
    // leading tokens -> 7 shared 3-shingles of 8 each: J = 7/9 = 0.7778
    assert(got(0)._3 == 1.0)
    assert(got(1)._3 == 0.7778)
    assert(got(2)._3 == 0.0)

    // the BOUNDED variant on the same corpus: nothing truncates (every
    // token has far fewer than PrefixCap corpus entries), so it must
    // agree with the lossless audit bit for bit, and disclose cap=0
    val bounded = Registry.queries("incremental_ingest_bounded")(spark, dir)
      .as[(Long, String, Double, Long)].collect().toSeq
    assert(bounded.map(r => (r._1, r._2, r._3))
      == got.map(r => (r._1, r._2, r._3)))
    assert(bounded.forall(_._4 == 0L), "cap wrongly reported truncation")
  }

  test("the bounded audit truncates at the cap and DISCLOSES it") {
    // Construction that forces truncation: a true near-dup (doc 5) of
    // the batch doc ranks FIFTH by c_id on every shared prefix token,
    // behind four long decoys (docs 1-4) that carry the same tokens in
    // their prefixes but fail the 2*min >= max length bound — so with
    // PrefixCap = 4 the bounded audit finds NO candidate and must
    // (a) downgrade the batch doc to novel, (b) report n_capped_tokens
    // > 0, while (c) the lossless audit still calls it near_dup. This
    // is the disclosed-truncation contract: bounded answers may lose
    // recall, but never silently.
    val dir = Files.createTempDirectory("graft_incrb").toString
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val near = "alpha beta gamma delta epsilon zeta eta theta iota NOPE"
    val filler = (1 to 22).map(i => f"w$i%02d").mkString(" ")
    val decoy = s"$filler $base" // 30 shingles: clen > 2*len(batch)
    val docs =
      (1 to 4).map(i => (i.toLong, decoy, "en", "src0", decoy.length.toLong)) ++
      Seq((5L, near, "en", "src0", near.length.toLong)) ++
      // filler-only docs: push filler-shingle df above the shared
      // shingles' df so the decoys' prefixes hold the SHARED tokens
      (6 to 9).map(i => (i.toLong, filler, "en", "src1", filler.length.toLong)) ++
      Seq((10L, base, "en", "src19", base.length.toLong))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")

    val lossless = Registry.queries("incremental_ingest")(spark, dir)
      .as[(Long, String, Double)].collect().toSeq
    assert(lossless == Seq((10L, "near_dup", 0.7778)),
      s"lossless audit should see the near-dup: $lossless")

    val bounded = Registry.queries("incremental_ingest_bounded")(spark, dir)
      .as[(Long, String, Double, Long)].collect().toSeq
    assert(bounded.size == 1)
    val (id, cat, bj, capped) = bounded.head
    assert(id == 10L && cat == "novel" && bj == 0.0,
      s"cap should have truncated the rank-5 near-dup: $bounded")
    assert(capped >= 4L, s"truncation must be disclosed, got $capped")
  }
}
