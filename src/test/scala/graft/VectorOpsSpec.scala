package graft

import org.apache.spark.sql.functions._
import graft.ops.VectorOps

class VectorOpsSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (Array(1f, 0f, 0f), Array(1f, 0f, 0f)),
    (Array(1f, 0f, 0f), Array(0f, 1f, 0f)),
    (Array(1f, 2f, 3f), Array(-1f, -2f, -3f)))
    .toDF("a", "b")

  test("cosine: identical=1, orthogonal=0, opposite=-1") {
    val got = df.select(round(VectorOps.cosine($"a", $"b"), 9).as("c"))
      .as[Double].collect().toSeq
    assert(got == Seq(1.0, 0.0, -1.0))
  }

  test("dot and norm") {
    val r = Seq((Array(3f, 4f), Array(1f, 1f))).toDF("a", "b")
      .select(VectorOps.dot($"a", $"b"), VectorOps.norm($"a"))
      .first()
    assert(r.getDouble(0) == 7.0)
    assert(r.getDouble(1) == 5.0)
  }

  test("native expressions match HOF forms bit-for-bit") {
    val rnd = new scala.util.Random(7)
    val vecs = Seq.fill(50)((
      Array.fill(64)(rnd.nextFloat() * 2 - 1),
      Array.fill(64)(rnd.nextFloat() * 2 - 1)))
    val df = vecs.toDF("a", "b")
    val rows = df.select(
      VectorOps.dot($"a", $"b").as("dn"),
      VectorOps.dotHof($"a", $"b").as("dh"),
      VectorOps.cosine($"a", $"b").as("cn"),
      VectorOps.cosineHof($"a", $"b").as("ch")).collect()
    rows.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1)) // exact, not approximate
      assert(r.getDouble(2) == r.getDouble(3))
    }
  }

  test("ragged arrays: HOF dot matches the native min(n) semantics") {
    val df = Seq((Array(1f, 2f, 3f), Array(1f, 2f))).toDF("a", "b")
    val (native, hof) = df.select(
        VectorOps.dot($"a", $"b"), VectorOps.dotHof($"a", $"b"))
      .as[(Double, Double)].first()
    assert(native == 5.0 && hof == 5.0) // 1*1 + 2*2 over the common prefix
  }

  test("signBucket partitions by leading-dim signs") {
    val r = Seq(
      (Array(1f, 1f, -1f, 1f), 0),
      (Array(-1f, 1f, 1f, 1f), 0),
      (Array(1f, 1f, -1f, -9f), 0))
      .toDF("v", "z")
      .select(VectorOps.signBucket($"v", 3).as("b")).as[Int].collect().toSeq
    assert(r(0) == (1 + 2)) // dims 1,2 positive, dim 3 negative
    assert(r(1) == (2 + 4))
    assert(r(0) == r(2)) // 4th dim beyond bucket bits ignored
  }
}
