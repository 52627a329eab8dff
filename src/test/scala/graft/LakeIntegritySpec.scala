package graft

import org.apache.spark.sql.functions._
import graft.queries.LakeOps

class LakeIntegritySpec extends SparkSpec {
  import spark.implicits._

  private def docsFrame(rows: Seq[(Long, String, String, Long, String)]) =
    rows.toDF("doc_id", "lang", "source", "n_chars", "text")

  private val base = Seq(
    (1L, "en", "a", 5L, "hello"),
    (2L, "en", "a", 5L, "world"),
    (3L, "de", "b", 4L, "hallo"),
    (4L, "de", "b", 4L, "welt!"))

  private def digests(df: org.apache.spark.sql.DataFrame) =
    LakeOps.integrityDigests(df)
      .as[(String, Long, Long, Long)].collect().toSeq.sortBy(_._1)

  test("integrityDigests: invariant under partitioning and row order") {
    val d1 = digests(docsFrame(base).coalesce(1))
    val d8 = digests(docsFrame(base.reverse).repartition(8))
    assert(d1 == d8)
    assert(d1.map(_._1) == Seq("__ROOT__", "a", "b"))
    assert(d1.head._2 == 4) // root row count
  }

  test("integrityDigests: one flipped character changes group and root digests") {
    val clean = digests(docsFrame(base))
    val tampered = digests(docsFrame(base.updated(1, (2L, "en", "a", 5L, "worle"))))
    // group b untouched
    assert(clean.find(_._1 == "b") == tampered.find(_._1 == "b"))
    // group a and the root both move, in BOTH digests
    for (g <- Seq("a", "__ROOT__")) {
      val c = clean.find(_._1 == g).get
      val t = tampered.find(_._1 == g).get
      assert(c._3 != t._3, s"$g xor digest blind to the tamper")
      assert(c._4 != t._4, s"$g sum digest blind to the tamper")
    }
  }

  test("integrityDigests: duplicate-row replacement defeats xor but not sum+count") {
    // replace row 2 with a copy of row 1: xor cancels the pair to the
    // same value as {1,2}-xor only by luck — what MUST catch it is the
    // modular sum (2h1 != h1+h2) with the count unchanged
    val clean = digests(docsFrame(base))
    val duped = digests(docsFrame(base.updated(1, base.head)))
    val (ca, da) = (clean.find(_._1 == "a").get, duped.find(_._1 == "a").get)
    assert(ca._2 == da._2, "count unchanged by the swap")
    assert(ca._4 != da._4, "sum digest must catch a duplicated-row swap")
  }
}
