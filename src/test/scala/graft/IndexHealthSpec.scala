package graft

import java.nio.file.Files
import graft.queries.Registry

/** lsh_bucket_stats + embedding_outliers: the index-health histogram
  * must conserve mass (every signature lands in exactly one bucket per
  * band) and price pairs correctly; the outlier ranking must surface a
  * planted far vector first.
  */
class IndexHealthSpec extends SparkSpec {
  import spark.implicits._

  test("bucket histogram conserves per-band mass and prices pair work") {
    val sf = "/root/testdata/sf0.001"
    val rows = Registry.queries("lsh_bucket_stats")(spark, sf)
      .select("band", "occ", "n_buckets", "pair_mass")
      .as[(Int, Long, Long, Long)].collect().toSeq
    assert(rows.nonEmpty && rows.map(_._1).distinct.sorted == Seq(0, 1, 2, 3))
    rows.foreach { case (_, occ, nb, pm) =>
      assert(occ >= 1 && nb >= 1 && pm == nb * occ * (occ - 1) / 2)
    }
    // every signed doc occupies exactly one bucket per band
    val perBand = rows.groupBy(_._1).view.mapValues(_.map(r => r._2 * r._3).sum)
    assert(perBand.values.toSet.size == 1, perBand.toMap.toString)
  }

  test("a planted far vector is each label's top outlier") {
    val dir = Files.createTempDirectory("graft_outlier").toString
    def near(seed: Int) = Array.tabulate(8)(i => 0.1f * ((seed + i) % 3))
    val far = Array.fill(8)(9.9f)
    val rows = (0L to 9L).map(i => (i, near(i.toInt), 1)) ++
      Seq((10L, far, 1)) ++
      (20L to 29L).map(i => (i, near(i.toInt), 2)) ++
      Seq((30L, far.map(-_), 2))
    rows.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    val got = Registry.queries("embedding_outliers")(spark, dir)
      .select("label", "rnk", "vec_id")
      .as[(Int, Long, Long)].collect().toSeq
    assert(got.filter(r => r._1 == 1 && r._2 == 1L).map(_._3) == Seq(10L))
    assert(got.filter(r => r._1 == 2 && r._2 == 1L).map(_._3) == Seq(30L))
  }
}
