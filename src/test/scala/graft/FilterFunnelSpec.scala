package graft

import graft.queries.Registry

/** Funnel-vs-independent consistency for the quality-rule queries: the
  * sequential funnel (`filter_funnel`) and the independent per-rule
  * accounting (`corpus_quality_rules`) are two aggregations of the SAME
  * per-doc flags, so their invariants must interlock exactly.
  */
class FilterFunnelSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("funnel stages chain: n_in(1)=docs, n_in(i+1)=n_out(i), drops add up") {
    val rows = Registry.queries("filter_funnel")(spark, sf)
      .select("stage", "rule", "n_in", "n_drop", "n_out")
      .as[(Long, String, Long, Long, Long)].collect().sortBy(_._1)
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.length == 7)
    assert(rows.head._3 == nDocs)
    rows.foreach { case (_, _, in, drop, out) =>
      assert(drop >= 0 && out >= 0 && in == drop + out)
    }
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 == a._5, s"stage ${b._1} n_in != stage ${a._1} n_out")
    }
  }

  test("funnel end equals the independent all_rules pass count; marginal <= isolated drops") {
    val funnel = Registry.queries("filter_funnel")(spark, sf)
      .select("rule", "n_drop", "n_out", "stage")
      .as[(String, Long, Long, Long)].collect()
    val indep = Registry.queries("corpus_quality_rules")(spark, sf)
      .select("rule", "n_pass", "n_fail").as[(String, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    val lastOut = funnel.maxBy(_._4)._3
    assert(lastOut == indep("all_rules")._2)
    // a stage can only drop docs that ALSO fail the rule in isolation
    funnel.foreach { case (rule, drop, _, _) =>
      assert(drop <= indep(rule)._3,
        s"$rule marginal drop $drop exceeds isolated fails ${indep(rule)._3}")
    }
    // the funnel must be non-trivial on real data: something survives,
    // something is dropped along the way
    assert(lastOut > 0 && lastOut < funnel.map(_._2).sum + lastOut)
  }
}
