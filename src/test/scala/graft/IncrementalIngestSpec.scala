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
  }
}
