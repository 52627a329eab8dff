package graft

import org.apache.spark.sql.functions._
import graft.queries.SimilarityQueries

class PcaSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 64

  /** Moments vector for constructed data living on ONE axis: every
    * sample is t·e_axis, t over `ts`, quantized exactly like
    * Aggregators.VecMoments.
    */
  private def axisMoments(axis: Int, ts: Seq[Double]): Seq[Long] = {
    val m = new Array[Long](1 + dim + dim * (dim + 1) / 2)
    m(0) = ts.length.toLong
    ts.foreach { t =>
      m(1 + axis) += math.floor(t * 1000000.0 + 0.5).toLong
      val idx = 1 + dim + axis * dim - axis * (axis - 1) / 2
      m(idx) += math.floor(t * t * 1000000.0 + 0.5).toLong
    }
    m.toSeq
  }

  test("pcaFromMoments: a single-axis corpus recovers that axis exactly") {
    val got = SimilarityQueries
      .pcaFromMoments(spark, axisMoments(7, Seq(0.9, -0.4, 0.7, -0.1, 0.3)))
      .as[(Int, Long, Long, Long)].collect().toSeq
    assert(got.length == dim)
    got.foreach { case (i, v, n, evr) =>
      assert(n == 5)
      // ALL variance lives on axis 7 -> explained-variance 1000 milli
      assert(evr == 1000)
      assert(v == (if (i == 7) 1000000L else 0L), s"dim $i -> $v")
    }
  }

  test("embedding_pca_power: explained variance is stable past 15 steps") {
    // the synthetic embeddings are near-isotropic (top-PC explains only
    // ~2-3% of variance), so the ITERATE keeps micro-wandering within
    // the top eigenspace — but the Rayleigh/trace ratio it reports must
    // already be settled: doubling the iteration budget may move
    // evr_milli by at most a couple of milli
    val vm = udaf(new graft.ops.Aggregators.VecMoments(dim))
    val m = graft.ops.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .filter($"embedding".isNotNull)
      .agg(vm($"embedding")).as[Seq[Long]].head()
    def evr(it: Int): Long = SimilarityQueries.pcaFromMoments(spark, m, iters = it)
      .select($"evr_milli").as[Long].head()
    assert(math.abs(evr(15) - evr(30)) <= 3, s"evr drift ${evr(15)} -> ${evr(30)}")
    // and the 15-step output itself is a deterministic function of the
    // moments: recomputing yields the identical frame
    val a = SimilarityQueries.pcaFromMoments(spark, m).collect().toSeq
    val b = SimilarityQueries.pcaFromMoments(spark, m).collect().toSeq
    assert(a == b)
  }

  test("embedding_pca_power: unit-norm output, sane explained variance") {
    val rows = graft.queries.Registry.queries("embedding_pca_power")(
        spark, "/root/testdata/sf0.001")
      .as[(Int, Long, Long, Long)].collect().toSeq
    assert(rows.map(_._1) == (0 until dim))
    val vs = rows.map(_._2)
    // |v|_inf normalization is exact: the leading component is ±1e6,
    // sign-canonicalized positive
    assert(vs.map(math.abs).max == 1000000L)
    assert(vs(vs.map(math.abs).zipWithIndex.max._2) > 0)
    val evr = rows.head._4
    assert(evr > 0 && evr <= 1000, s"evr_milli $evr")
    assert(rows.map(_._4).distinct.size == 1)
  }

  test("VecMoments: merge across partitions equals single-partition result") {
    val vecs = (0 until 40).map { r =>
      Array.tabulate(dim)(j => ((r * 31 + j * 17) % 13 - 6) / 7.0f)
    }
    val vm = udaf(new graft.ops.Aggregators.VecMoments(dim))
    def moments(parts: Int): Seq[Long] =
      vecs.map(v => Tuple1(v.toSeq)).toDF("embedding").repartition(parts)
        .agg(vm($"embedding")).as[Seq[Long]].head()
    assert(moments(1) == moments(8))
  }

  test("embedding_pca_project: projection matches a driver-side recount") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.queries.Registry.queries("embedding_pca_project")(spark, dir)
      .select($"vec_id", $"proj_micro").as[(Long, Long)].collect().toMap
    val vec = graft.queries.Registry.queries("embedding_pca_power")(spark, dir)
      .select($"eigvec_micro").as[Long].collect()
    val embs = graft.ops.Tables.embeddings(spark, dir)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    assert(got.size == embs.length)
    embs.foreach { case (id, x) =>
      val p = (0 until dim).map(i =>
        BigInt(math.floor(x(i).toDouble * 1000000.0 + 0.5).toLong) * vec(i)).sum
      val q = BigInt(2000000)
      val num = 2 * p + BigInt(1000000)
      val want = ((num - ((num % q) + q) % q) / q).toLong
      assert(got(id) == want, s"vec $id: ${got(id)} != $want")
    }
  }
}
