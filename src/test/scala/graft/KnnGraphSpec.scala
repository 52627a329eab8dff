package graft

import java.nio.file.Files
import graft.queries.Registry

/** knn_graph_mutual on planted clusters: two sign-LSH buckets whose
  * members are each other's nearest neighbors — the mutual graph is
  * known exactly (cliques within each bucket), and cross-bucket edges
  * are impossible by construction.
  */
class KnnGraphSpec extends SparkSpec {
  import spark.implicits._

  test("planted clusters yield exactly their mutual cliques") {
    val dir = Files.createTempDirectory("graft_knn").toString
    def vec(sign: Float, last: Float): Array[Float] =
      Array.fill(12)(sign) :+ last
    // bucket A (all dims positive): 4 near-identical vectors -> K6
    // clique has C(4,2)=6 mutual edges at k=3 (each keeps the other 3)
    // bucket B (dim 1..12 negative): a mutual pair
    val rows = Seq(
      (1L, vec(1f, 0.1f), "a"), (2L, vec(1f, 0.2f), "a"),
      (3L, vec(1f, 0.3f), "a"), (4L, vec(1f, 0.4f), "a"),
      (5L, vec(-1f, 0.5f), "b"), (6L, vec(-1f, 0.6f), "b"))
    rows.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    val edges = Registry.queries("knn_graph_mutual")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val pairs = edges.map { case (a, b, _) => (a, b) }.toSet
    val expected = Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (5L, 6L))
    assert(pairs == expected, s"got $pairs")
    assert(edges.forall { case (a, b, c) => a < b && c >= -1.0 && c <= 1.0 })
    // near-identical directions: every kept edge is high-cosine
    assert(edges.forall(_._3 > 0.9), edges.mkString(", "))

    // the planted buckets are exactly the graph's connected components
    val clusters = Registry.queries("knn_graph_clusters")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(clusters.map(c => (c._1, c._2)).toSet ==
      Set((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), (5L, 5L), (6L, 5L)),
      clusters.mkString(", "))
    assert(clusters.count(_._3) == 2)
  }
}
