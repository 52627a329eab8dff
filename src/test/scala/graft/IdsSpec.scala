package graft

import org.apache.spark.sql.functions._
import graft.ops.Ids

class IdsSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (2, 30, "c"), (1, 10, "a"), (1, 20, "b"), (3, 5, "d"), (2, 1, "e"))
    .toDF("src_rank", "line_no", "v")

  test("withGlobalId: 1-based contiguous, ordered by (src_rank, line_no)") {
    val got = Ids.withGlobalId(df, "id", Seq($"src_rank", $"line_no"))
      .orderBy($"id").select($"v").as[String].collect().toSeq
    assert(got == Seq("a", "b", "e", "c", "d"))
    val ids = Ids.withGlobalId(df, "id", Seq($"src_rank", $"line_no"))
      .select($"id").as[Int].collect().sorted.toSeq
    assert(ids == (1 to 5))
  }

  test("withScalableGlobalId matches withGlobalId (long vs int widths)") {
    val a = Ids.withGlobalId(df, "id", Seq($"src_rank", $"line_no"))
      .select($"v", $"id".cast("long"))
    val b = Ids.withScalableGlobalId(df, "id", Seq($"src_rank", $"line_no"))
      .select($"v", $"id")
    assert(a.collect().toSet == b.collect().toSet)
  }

  test("withScalableGlobalId on a larger shuffled input") {
    val big = spark.range(1000).toDF("line_no")
      .withColumn("src_rank", lit(1))
      .repartition(7)
    val ids = Ids.withScalableGlobalId(big, "id", Seq($"src_rank", $"line_no"))
    val rows = ids.select($"line_no", $"id").as[(Long, Long)].collect().sortBy(_._1)
    assert(rows.map(_._2).toSeq == (1L to 1000L))
  }
}
