package graft

import java.nio.file.Files
import graft.queries.Registry

/** corpus_drift_kl on planted distributions — the analytic KL values are
  * known in closed form, so this gates the math, not just plumbing.
  */
class CorpusDriftSpec extends SparkSpec {
  import spark.implicits._

  private def run(dir: String) =
    Registry.queries("corpus_drift_kl")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap

  private def write(dir: String, docs: Seq[(Long, String, String)]): Unit =
    docs.map { case (id, src, text) => (id, text, "en", src, text.length) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")

  test("identical per-source distributions have zero drift") {
    val dir = Files.createTempDirectory("graft_drift0").toString
    // both sources are 2:1 alpha:beta — each equals the corpus mixture
    write(dir, Seq(
      (1L, "s1", "alpha alpha beta"),
      (2L, "s2", "alpha alpha beta alpha alpha beta")))
    val m = run(dir)
    assert(m("s1") == ((3L, 2L, 0.0)) && m("s2") == ((6L, 2L, 0.0)))
  }

  test("disjoint vocabularies drift by ln(N/n_s) exactly") {
    val dir = Files.createTempDirectory("graft_drift1").toString
    // c_sw = c_w for every word, so KL(s) = ln(N / n_s):
    // s1 has 2 of 8 tokens -> ln(4); s2 has 6 of 8 -> ln(8/6)
    write(dir, Seq(
      (1L, "s1", "alpha beta"),
      (2L, "s2", "gamma delta gamma delta gamma delta")))
    val m = run(dir)
    assert(math.abs(m("s1")._3 - math.log(4.0)) < 1e-3)
    assert(math.abs(m("s2")._3 - math.log(8.0 / 6.0)) < 1e-3)
    assert(m("s1")._1 == 2L && m("s2")._1 == 6L)
  }

  test("KL is non-negative on skewed mixtures") {
    val dir = Files.createTempDirectory("graft_drift2").toString
    write(dir, Seq(
      (1L, "s1", "alpha alpha alpha beta"),
      (2L, "s2", "alpha beta beta beta gamma")))
    val m = run(dir)
    assert(m.values.forall(_._3 >= 0.0), m.toString)
    assert(m.values.exists(_._3 > 0.0), m.toString)
  }
}
