package graft

import org.apache.spark.sql.functions._
import graft.ops.Aggregators

class AggregatorsSpec extends SparkSpec {
  import spark.implicits._

  test("ConcatInOrder: order-correct under partitioned aggregation") {
    val udafCol = udaf(new Aggregators.ConcatInOrder)
    val df = Seq((1, 3L, "c"), (1, 1L, "a"), (1, 2L, "b"), (2, 1L, "x"))
      .toDF("g", "ord", "s")
      .repartition(4) // force merge path
    val got = df.groupBy($"g")
      .agg(udafCol($"ord", $"s").as("txt"))
      .orderBy($"g").as[(Int, String)].collect().toSeq
    assert(got == Seq((1, "a b c"), (2, "x")))
  }

  test("TopKByScore: bounded per-group top-k equals window ranking") {
    val udafCol = udaf(new Aggregators.TopKByScore(3))
    val rnd = new scala.util.Random(11)
    val rows = (1 to 500).map(i => (i % 5, rnd.nextDouble(), i.toLong))
    val df = rows.toDF("g", "score", "id").repartition(8)
    val got = df.groupBy($"g")
      .agg(udafCol($"score", $"id").as("top"))
      .as[(Int, Seq[Long])].collect().toMap
    val expected = rows.groupBy(_._1).map { case (g, rs) =>
      g -> rs.sortBy(r => (-r._2, r._3)).take(3).map(_._3).toSeq
    }
    assert(got == expected)
  }
}
