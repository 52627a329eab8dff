package graft

import java.nio.file.Files
import graft.queries.Registry

/** dedup_containment: the asymmetric metric must catch a short doc
  * quoted inside a much longer one — the case Jaccard misses by
  * construction — and must not fire on unrelated docs.
  */
class ContainmentSpec extends SparkSpec {
  import spark.implicits._

  test("a quoted doc is contained in its quoting article; Jaccard misses it") {
    val dir = Files.createTempDirectory("graft_contain").toString
    val quote = "alpha beta gamma delta epsilon zeta eta theta"
    val article = ("intro words first " + quote + " middle passage then " +
      "unrelated tail content keeps going on and on with many extra tokens " +
      "that dilute the union so jaccard stays low while containment is high")
    Seq(
      (1L, quote, "en", "src0", quote.length.toLong),
      (2L, article, "en", "src1", article.length.toLong),
      (3L, "totally different text with no shared shingles at all here",
        "en", "src2", 59L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")

    val got = Registry.queries("dedup_containment")(spark, dir)
      .as[(Long, Long, Double)].collect().toSeq
    // exactly the (quote -> article) direction fires; the reverse has
    // C = |inter|/|article| << 0.8, and doc 3 shares nothing
    assert(got.map(r => (r._1, r._2)) == Seq((1L, 2L)), got.toString)
    assert(got.head._3 >= 0.8)
    // ...and the symmetric blocked-Jaccard query does NOT pair them
    val j = Registry.queries("dedup_jaccard_blocked")(spark, dir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    assert(!j.contains((1L, 2L)))
  }
}
