package graft

import org.apache.spark.sql.functions._
import graft.queries.Registry

/** contrastive_pairs: the mined training pairs must respect the
  * contract — positives share the anchor's label, negatives don't,
  * ranks order by descending similarity, and every candidate comes
  * from the anchor's own LSH bucket (the approximate-mining guarantee
  * that bounds the join).
  */
class ContrastivePairsSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("pair roles, ranks, and bucket provenance hold on the harness corpus") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id", $"label",
        graft.ops.VectorOps.signBucket($"embedding", 6).as("bkt"))
      .as[(Long, Int, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val rows = Registry.queries("contrastive_pairs")(spark, sf)
      .select("anchor_id", "role", "rnk", "vec_id", "cos")
      .as[(Long, String, Long, Long, Double)].collect().toSeq
    assert(rows.nonEmpty)
    rows.foreach { case (a, role, rnk, v, _) =>
      assert(a % 97 == 0 && v != a)
      assert(emb(a)._2 == emb(v)._2, s"pair ($a,$v) crosses buckets")
      if (role == "pos") { assert(rnk == 1); assert(emb(a)._1 == emb(v)._1) }
      else { assert(rnk >= 1 && rnk <= 3); assert(emb(a)._1 != emb(v)._1) }
    }
    // at most one positive per anchor; negative ranks are dense from 1
    // and their cosines non-increasing
    rows.groupBy(r => (r._1, r._2)).foreach { case ((_, role), g) =>
      if (role == "pos") assert(g.size == 1)
      else {
        val sorted = g.sortBy(_._3)
        assert(sorted.map(_._3) == (1L to sorted.size))
        assert(sorted.map(_._5).sliding(2).forall {
          case Seq(x, y) => x >= y
          case _ => true
        })
      }
    }
  }
}
