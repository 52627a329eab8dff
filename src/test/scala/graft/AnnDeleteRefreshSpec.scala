package graft

import org.apache.spark.sql.functions._
import graft.ops.SnapshotTable
import graft.queries.SimilarityQueries

/** Branch-level proof for the deletion-aware top-k refresh: the fast
  * path must NOT rescan (its answer is derivable from the k stored rows
  * alone), and the fallback must admit the risen k+1 member that no
  * incremental state holds.
  */
class AnnDeleteRefreshSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft_anndel").toString + "/t"

  // a 6-vector corpus scored 60..10; k = 3 stored
  private def scored() = Seq(
    (1L, "a", 60.0), (2L, "b", 50.0), (3L, "c", 40.0),
    (4L, "d", 30.0), (5L, "e", 20.0), (6L, "f", 10.0))
    .toDF("vec_id", "label", "cos_raw")

  test("unranked delete takes the fast path: stored rows unchanged") {
    val dir = freshDir()
    val all = scored()
    val v1 = SnapshotTable.commit(
      all.orderBy($"cos_raw".desc, $"vec_id").limit(3), dir)
    val tomb = Seq(6L).toDF("vec_id") // never ranked
    // live deliberately EMPTY: if the fast path touched the corpus at
    // all, the refreshed top-k would come out empty — the strongest
    // observable proof that no rescan happened
    val v2 = SimilarityQueries.refreshWithDeletes(
      spark, dir, v1, tomb, live = all.limit(0))
    assert(SnapshotTable.readAt(spark, dir, v2)
      .select($"vec_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("ranked delete falls back to rescan and admits the k+1 member") {
    val dir = freshDir()
    val all = scored()
    val v1 = SnapshotTable.commit(
      all.orderBy($"cos_raw".desc, $"vec_id").limit(3), dir)
    val tomb = Seq(1L).toDF("vec_id") // the stored top-1
    val v2 = SimilarityQueries.refreshWithDeletes(
      spark, dir, v1, tomb,
      live = all.join(tomb, Seq("vec_id"), "left_anti"), k = 3)
    // vec 4 (the old k+1) must rise into the slot — only a rescan knows it
    assert(SnapshotTable.readAt(spark, dir, v2)
      .select($"vec_id").as[Long].collect().sorted.toSeq == Seq(2L, 3L, 4L))
  }

  test("a tombstoned row already absent from storage stays a fast path") {
    val dir = freshDir()
    val all = scored()
    val v1 = SnapshotTable.commit(
      all.orderBy($"cos_raw".desc, $"vec_id").limit(3), dir)
    // delete 5 AND 6 (both unranked): still fast, still k intact
    val v2 = SimilarityQueries.refreshWithDeletes(
      spark, dir, v1, Seq(5L, 6L).toDF("vec_id"), live = all.limit(0))
    assert(SnapshotTable.readAt(spark, dir, v2).count() == 3)
  }
}
