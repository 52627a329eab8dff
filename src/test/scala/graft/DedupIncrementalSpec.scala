package graft

import java.nio.file.Files
import graft.queries.Registry

/** Black-box test of dedup_incremental (LSH band-index admission) on a
  * planted corpus covering all three branches — exact_dup,
  * lsh_candidate, admit — plus the index-probe semantics: an exact copy
  * must hit EVERY band bucket, a near-dup at least one, a novel doc
  * none. (The sf0.01 harness data has no src19 duplicates so the oracle
  * gate alone only fires `admit` there; sf0.1 fires all three.)
  */
class DedupIncrementalSpec extends SparkSpec {
  import spark.implicits._

  test("dedup_incremental admits novels, flags band hits, catches exact copies") {
    val dir = Files.createTempDirectory("graft_dincr").toString
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

    val got = Registry.queries("dedup_incremental")(spark, dir)
      .as[(Long, String, Long, Option[Long])].collect().toSeq
    assert(got.map(r => (r._1, r._2)) ==
      Seq(10L -> "exact_dup", 11L -> "lsh_candidate", 12L -> "admit"))
    val byId = got.map(r => r._1 -> r).toMap
    // identical text -> identical signature -> all 4 band buckets hit,
    // and the candidate the index surfaces is the corpus doc itself
    assert(byId(10L)._3 == 4L && byId(10L)._4.contains(1L))
    // J = 7/9 near-dup: at least one band must collide (it's what made
    // it a candidate), and the probe can only point at corpus doc 1
    assert(byId(11L)._3 >= 1L && byId(11L)._4.contains(1L))
    // novel: zero occupied buckets, no candidate
    assert(byId(12L)._3 == 0L && byId(12L)._4.isEmpty)
  }
}
