package graft

import graft.queries.Registry

/** span_corruption_plan: masks must be well-formed (spans within the
  * doc, merged counts consistent) and hit the T5 corruption target in
  * aggregate, deterministically.
  */
class SpanCorruptionSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("masks are well-formed and corruption lands near the 15% target") {
    def run() = Registry.queries("span_corruption_plan")(spark, sf)
      .select("doc_id", "n_tokens", "n_masked", "n_spans", "corruption_permille")
      .as[(Long, Int, Long, Long, Long)].collect().toSeq
    val rows = run()
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.size == nDocs)
    rows.foreach { case (id, n, masked, spans, permille) =>
      assert(masked >= spans, s"doc $id: masked $masked < spans $spans")
      assert(masked <= n && spans >= 0)
      assert(permille == 1000 * masked / n)
    }
    // corpus-level corruption rate: 5% starts x mean length 3 ~ 15%,
    // minus overlap merging — accept a generous 8..22% band
    val rate = rows.map(_._3).sum.toDouble / rows.map(_._2.toLong).sum
    assert(rate > 0.08 && rate < 0.22, s"corruption rate $rate")
    // the mask is a pure function of (doc, position): rerun is identical
    assert(run() == rows)
  }
}
