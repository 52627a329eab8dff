package graft

import graft.queries.Registry

/** Invariants of the integer-exact PageRank on the harness data: mass
  * conservation bounds and structural sanity. (Value-level correctness
  * is the DuckDB oracle's job; these pin the arithmetic contract.)
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("nation_pagerank: nano-unit ranks are mass-bounded and total-ordered") {
    val rows = Registry.queries("nation_pagerank")(spark, "/root/testdata/sf0.001")
      .as[(String, Long)].collect().toSeq
    assert(rows.size == 25)
    // every node keeps at least the teleport mass; integer flooring only
    // ever LOSES mass, so the total never exceeds the initial 1e9
    rows.foreach { case (n, r) => assert(r >= 6000000L, s"$n: $r") }
    assert(rows.map(_._2).sum <= 1000000000L)
    // output is ordered by rank desc then name
    assert(rows == rows.sortBy { case (n, r) => (-r, n) })
    // deterministic: a second run is bit-identical
    val again = Registry.queries("nation_pagerank")(spark, "/root/testdata/sf0.001")
      .as[(String, Long)].collect().toSeq
    assert(rows == again)
  }

  test("kmeans_train: every vector is assigned and populations sum to n") {
    val rows = Registry.queries("kmeans_train")(spark, "/root/testdata/sf0.001")
      .as[(Int, Long, Double)].collect().toSeq
    assert(rows.nonEmpty && rows.size <= 8)
    val total = rows.map(_._2).sum
    val nVec = graft.ops.Tables.embeddings(spark, "/root/testdata/sf0.001").count()
    assert(total == nVec, s"assigned $total of $nVec vectors")
    // mean member cosine to the OWN centroid is a valid cosine
    rows.foreach { case (c, n, avg) =>
      assert(n > 0 && avg >= -1.0001 && avg <= 1.0001, s"cell $c: n=$n avg=$avg")
    }
  }
}
