package graft

import graft.ops.Skew

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals plain join on skewed data") {
    // 90% of the large side on one hot key
    val large = ((1 to 900).map(i => (1, s"row$i"))
      ++ (1 to 100).map(i => (i % 7 + 2, s"tail$i"))).toDF("k", "payload")
    val small = Seq((1, "hot"), (3, "a"), (5, "b"), (99, "absent"))
      .toDF("k", "dim")
    val plain = large.join(small, "k")
      .select($"k", $"payload", $"dim").collect().toSet
    val salted = Skew.saltedJoin(large, small, "k", salts = 8)
      .select($"k", $"payload", $"dim").collect().toSet
    assert(salted == plain)
    assert(plain.count(_.getInt(0) == 1) == 900)
  }
}
