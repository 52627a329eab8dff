package graft

import java.nio.file.Files
import graft.queries.Registry

/** source_jaccard_kmv on planted source overlap: identical sources must
  * estimate J = 1 exactly (their sketches coincide), disjoint sources
  * J = 0, and a half-shared source lands strictly between.
  */
class SourceJaccardSpec extends SparkSpec {
  import spark.implicits._

  test("identical sources read 10000 permyriad, disjoint read 0") {
    val dir = Files.createTempDirectory("graft_srcj").toString
    val shared = "alpha beta gamma delta epsilon zeta"
    val other = "uno dos tres cuatro cinco seis"
    Seq(
      (1L, shared, "sA"), (2L, shared, "sB"),   // sB duplicates sA
      (3L, other, "sC"),                        // sC disjoint from both
      (4L, shared, "sD"), (5L, other, "sD"))    // sD = half of each
      .map { case (id, t, src) => (id, t, "en", src, t.length) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val m = Registry.queries("source_jaccard_kmv")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(4)).toMap
    assert(m(("sA", "sB")) == 10000L, m.toString)
    assert(m(("sA", "sC")) == 0L && m(("sB", "sC")) == 0L, m.toString)
    // sD holds all of sA's shingles plus all of sC's: J(sA,sD) = 1/2
    assert(m(("sA", "sD")) == 5000L, m.toString)
    assert(m(("sC", "sD")) == 5000L, m.toString)
    assert(m.size == 6)
  }
}
