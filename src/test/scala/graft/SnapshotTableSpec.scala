package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.ops.SnapshotTable

class SnapshotTableSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("graft_snap").toString + "/t"

  test("commit assigns monotone versions and read follows the pointer") {
    val dir = freshDir()
    assert(SnapshotTable.currentVersion(dir).isEmpty)
    assert(SnapshotTable.versions(dir).isEmpty)
    intercept[IllegalStateException] { SnapshotTable.read(spark, dir) }
    val v1 = SnapshotTable.commit(Seq((1, "a"), (2, "b")).toDF("k", "v"), dir)
    val v2 = SnapshotTable.commit(Seq((1, "a2")).toDF("k", "v"), dir)
    assert(v1 == 1 && v2 == 2)
    assert(SnapshotTable.currentVersion(dir).contains(2L))
    assert(SnapshotTable.versions(dir) == Seq(1L, 2L))
    assert(SnapshotTable.read(spark, dir).collect().toSet
      == Set(org.apache.spark.sql.Row(1, "a2")))
  }

  test("snapshot isolation: a v1 reader is untouched by a later commit") {
    val dir = freshDir()
    SnapshotTable.commit(spark.range(10).toDF("id"), dir)
    // reader resolves `current` (= v1) BEFORE the writer commits v2 —
    // the 100-TB-scan-during-refresh scenario
    val reader = SnapshotTable.read(spark, dir)
    SnapshotTable.commit(spark.range(3).toDF("id"), dir)
    assert(reader.count() == 10)
    assert(SnapshotTable.read(spark, dir).count() == 3)
    // time travel pins both
    assert(SnapshotTable.readAt(spark, dir, 1).count() == 10)
    assert(SnapshotTable.readAt(spark, dir, 2).count() == 3)
  }

  test("a crashed writer's orphan directory is skipped, never reused") {
    val dir = freshDir()
    SnapshotTable.commit(spark.range(5).toDF("id"), dir)
    // simulate a writer that died after writing data, before the flip:
    // v2 exists on disk but `current` still says v1
    spark.range(99).toDF("id").write.parquet(s"$dir/v2")
    assert(SnapshotTable.currentVersion(dir).contains(1L))
    assert(SnapshotTable.read(spark, dir).count() == 5)
    // next commit must go PAST the orphan (v3), not clobber it
    val v = SnapshotTable.commit(spark.range(7).toDF("id"), dir)
    assert(v == 3)
    assert(SnapshotTable.read(spark, dir).count() == 7)
    assert(SnapshotTable.versions(dir) == Seq(1L, 2L, 3L))
  }

  test("expire keeps the newest versions and never the live one") {
    val dir = freshDir()
    for (n <- Seq(2, 4, 6, 8)) SnapshotTable.commit(
      spark.range(n).toDF("id"), dir)
    assert(SnapshotTable.expire(dir, keepLast = 2) == Seq(1L, 2L))
    assert(SnapshotTable.versions(dir) == Seq(3L, 4L))
    assert(SnapshotTable.read(spark, dir).count() == 8)
    assert(SnapshotTable.readAt(spark, dir, 3).count() == 6)
    // live version survives even a keepLast that would drop it: roll
    // the pointer back to v3 (simulating an operator pin), expire hard
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "current"), "v3")
    assert(SnapshotTable.expire(dir, keepLast = 1) == Seq.empty)
    assert(SnapshotTable.versions(dir) == Seq(3L, 4L))
  }

  test("deleteTree: removes a tree, no-ops on a missing path") {
    val dir = freshDir()
    SnapshotTable.commit(spark.range(3).toDF("id"), dir)
    assert(new java.io.File(dir).exists())
    SnapshotTable.deleteTree(dir)
    assert(!new java.io.File(dir).exists())
    SnapshotTable.deleteTree(dir) // second delete: no-op, not an error
  }

  test("withPersisted releases the cache even when the body throws") {
    import graft.ops.Tables
    val df = spark.range(5).toDF("id")
    intercept[IllegalStateException] {
      Tables.withPersisted(df) { d =>
        d.count() // materialize the cache
        throw new IllegalStateException("boom")
      }
    }
    // the failed scope must not leave a pinned cache behind
    assert(df.storageLevel == org.apache.spark.storage.StorageLevel.NONE,
      "withPersisted leaked its cache on the exception path")
  }

  test("the pointer flip is atomic: no torn state ever visible") {
    val dir = freshDir()
    SnapshotTable.commit(spark.range(1).toDF("id"), dir)
    // the temp pointer must not survive a commit (ATOMIC_MOVE consumed it)
    val leftovers = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith(".current.tmp"))
    assert(leftovers.isEmpty)
  }
}
