package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal snapshot/commit protocol for parquet tables — the spine that
  * turns the lake ops ([[graft.queries.LakeOps]] compaction/integrity,
  * zorder_orders, merge_upsert_orders, the streaming upsert's
  * versioned-state pattern in [[graft.streaming.Streaming]]) into an
  * actual table story: atomic overwrite, snapshot-isolated reads, and
  * time travel, with no table-format dependency.
  *
  * Layout (the mini table-format pattern every modern lake format
  * shares — Iceberg/Delta reduce to this plus metadata):
  * {{{
  *   <dir>/v1/ ... v2/ ...   immutable parquet snapshot directories
  *   <dir>/current           pointer file, contents "v<N>"
  * }}}
  *
  * Guarantees:
  *  - '''Atomic commit''': data lands fully in a fresh `v<N>` directory
  *    BEFORE the pointer flips, and the flip is a same-directory atomic
  *    rename of a temp file — a reader sees the old complete snapshot
  *    or the new complete snapshot, never a torn mix. A writer crash
  *    before the flip leaves an orphan directory that is never read and
  *    is skipped (not reused) by the next writer.
  *  - '''Snapshot isolation''': version directories are immutable, so a
  *    reader that resolved `current` keeps a consistent view for the
  *    whole job even while writers commit — exactly the property a
  *    multi-hour 100 TB scan needs under a concurrently-refreshing
  *    table.
  *  - '''Time travel''': [[readAt]] pins any retained version —
  *    reproducible training-data builds point at the version, not at
  *    "whatever the table said that day".
  *
  * Single-writer protocol (concurrent READERS are unrestricted): two
  * simultaneous writers race the pointer — serialize commits per table,
  * as every lock-service-free table format requires. At cluster scale
  * the same layout works on any filesystem with atomic rename (HDFS;
  * on S3 the pointer becomes a conditional PUT).
  */
object SnapshotTable {

  private def pointer(dir: String) = java.nio.file.Paths.get(dir, "current")

  /** The committed version, if any commit has happened. */
  def currentVersion(dir: String): Option[Long] = {
    val p = pointer(dir)
    if (java.nio.file.Files.exists(p))
      Some(java.nio.file.Files.readString(p).trim)
        .filter(_.startsWith("v")).map(_.drop(1).toLong)
    else None
  }

  /** All snapshot versions present on disk (committed or orphaned),
    * ascending. Retention policy is the caller's: delete old `v*`
    * directories freely, never the one `current` names.
    */
  def versions(dir: String): Seq[Long] = {
    val d = new java.io.File(dir)
    if (!d.isDirectory) Seq.empty
    else d.listFiles().toSeq
      .filter(f => f.isDirectory && f.getName.matches("v\\d+"))
      .map(_.getName.drop(1).toLong).sorted
  }

  /** Commit `df` as the next snapshot: write `v<N>` fully, then flip
    * the pointer atomically. Returns the committed version. N skips
    * past any orphan directory from a crashed writer (max on disk + 1,
    * not pointer + 1) so an orphan is never silently overwritten while
    * a historical reader might still list it.
    */
  def commit(df: DataFrame, dir: String): Long = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    val next = (versions(dir) :+ 0L).max + 1
    df.write.mode("errorifexists").parquet(s"$dir/v$next")
    val tmp = java.nio.file.Paths.get(dir, s".current.tmp$next")
    java.nio.file.Files.writeString(tmp, s"v$next")
    java.nio.file.Files.move(tmp, pointer(dir),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    next
  }

  /** Read the current snapshot (the version `current` named at call
    * time — later commits do not move this frame's data underneath it).
    */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val v = currentVersion(dir).getOrElse(
      throw new IllegalStateException(s"no committed snapshot under $dir"))
    readAt(spark, dir, v)
  }

  /** Time travel: read an exact retained version. */
  def readAt(spark: SparkSession, dir: String, version: Long): DataFrame =
    spark.read.parquet(s"$dir/v$version")

  /** Retention: delete all but the newest `keepLast` snapshot
    * directories. The version `current` names is never deleted
    * regardless of `keepLast` — expiring the live snapshot would turn
    * every reader into a crash. Returns the versions removed. Like
    * every table format's VACUUM, this is the one operation that can
    * break an in-flight time-travel reader of an EXPIRED version;
    * callers pick a retention window longer than their longest job.
    */
  def expire(dir: String, keepLast: Int): Seq[Long] = {
    require(keepLast >= 1, s"keepLast must be >= 1, got $keepLast")
    val live = currentVersion(dir)
    val all = versions(dir)
    val drop = all.dropRight(keepLast).filterNot(live.contains)
    drop.foreach(v => deleteTree(s"$dir/v$v"))
    drop
  }

  /** Recursive delete that FAILS LOUDLY when the tree survives — a
    * half-deleted snapshot directory is exactly the state that makes a
    * later reader or version-numbering decision silently wrong (a
    * leftover v2 shifts the next commit to v3 while a caller that
    * assumed fresh numbering reads stale data). Null-safe against
    * listFiles' I/O-error null. Deleting a path that does not exist is
    * a no-op, not an error.
    */
  def deleteTree(path: String): Unit = {
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) {
        val children = f.listFiles()
        require(children != null, s"deleteTree: cannot list $f")
        children.foreach(rm)
      }
      require(f.delete(), s"deleteTree: failed to delete $f")
    }
    val f = new java.io.File(path)
    if (f.exists()) rm(f)
  }
}
