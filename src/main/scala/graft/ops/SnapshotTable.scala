package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}

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
  *  - '''Atomic commit''': data lands fully in a writer-unique staging
  *    directory, is atomically RENAMED to its `v<N>` name (so a
  *    numbered directory is complete and single-writer by
  *    construction, even under concurrent commits), and only then does
  *    the pointer flip — itself a same-directory atomic rename of a
  *    temp file. A reader sees the old complete snapshot or the new
  *    complete snapshot, never a torn mix. A writer crash leaves only
  *    `.staged-*` junk or an un-pointed version directory, both never
  *    read and skipped (not reused) by the next writer.
  *  - '''Snapshot isolation''': version directories are immutable, so a
  *    reader that resolved `current` keeps a consistent view for the
  *    whole job even while writers commit — exactly the property a
  *    multi-hour 100 TB scan needs under a concurrently-refreshing
  *    table.
  *  - '''Time travel''': [[readAt]] pins any retained version —
  *    reproducible training-data builds point at the version, not at
  *    "whatever the table said that day".
  *  - '''Lost-update detection''': [[commit]] with `expectedVersion`
  *    is a compare-and-swap on the pointer — it fails loudly (leaving
  *    the loser's data as a skipped orphan, never torn state) when
  *    another writer committed since the caller read the table. This is
  *    the optimistic-concurrency core of every lock-service-free table
  *    format (Delta's commit-version check, Iceberg's metadata CAS; on
  *    S3 it becomes a conditional PUT). Unconditional commits remain
  *    last-wins by design — blind overwrite jobs that don't read first
  *    have nothing to lose.
  *
  * Writer concurrency: the pointer flip itself is serialized through a
  * short-lived `.commit.lock` file (atomic create; held only across the
  * check-and-flip, never across the data write). A writer crash inside
  * that microsecond window leaves a stale lock that fails later commits
  * LOUDLY with removal instructions — the bounded, operator-visible
  * failure mode, as opposed to silent lost updates.
  */
object SnapshotTable {

  /** Root under which queries place their snapshot tables. Env-resolved
    * (`SPARK_GRAFT_LAKE_DIR`) so concurrent harness runs on one host
    * can be isolated and the soak can place tables on a disk with known
    * bandwidth; defaults to `/tmp/graft_lake`. Note the queries that
    * deleteTree-then-recreate their table (lsh_index_refresh,
    * ann_topk_refresh, snapshot_time_travel) assume a SINGLE process
    * per root — two runs sharing a root must set distinct values.
    */
  def lakeRoot: String =
    sys.env.getOrElse("SPARK_GRAFT_LAKE_DIR", "/tmp/graft_lake")

  private def pointer(dir: String) = java.nio.file.Paths.get(dir, "current")

  /** The committed version, if any commit has happened. A pointer file
    * whose contents are not exactly `v<digits>` is CORRUPTION — that is
    * a loud IllegalStateException carrying the bad contents, never a
    * silent None (which would read as "empty table" and invite a fresh
    * v1 write next to live data) and never a bare NumberFormatException.
    */
  def currentVersion(dir: String): Option[Long] = {
    val p = pointer(dir)
    if (!java.nio.file.Files.exists(p)) None
    else {
      val raw = java.nio.file.Files.readString(p).trim
      if (raw.matches("v\\d+")) Some(raw.drop(1).toLong)
      else throw new IllegalStateException(
        s"corrupt snapshot pointer $p: expected v<N>, got '$raw'")
    }
  }

  /** All snapshot versions present on disk (committed or orphaned),
    * ascending. Retention policy is the caller's: delete old `v*`
    * directories freely, never the one `current` names.
    */
  def versions(dir: String): Seq[Long] = {
    val d = new java.io.File(dir)
    if (!d.isDirectory) Seq.empty
    else {
      val children = d.listFiles()
      // listFiles returns null on I/O error even for an existing
      // directory — same loud guard as deleteTree, not an opaque NPE
      require(children != null, s"versions: cannot list $dir")
      children.toSeq
        .filter(f => f.isDirectory && f.getName.matches("v\\d+"))
        .map(_.getName.drop(1).toLong).sorted
    }
  }

  /** Commit `df` as the next snapshot: write the data fully into a
    * writer-unique staging directory, CLAIM the next version number by
    * atomically renaming it to `v<N>` (the filesystem arbitrates
    * concurrent claims — see the inline note), then flip the pointer
    * atomically. Returns the committed version. N skips past any
    * orphan directory from a crashed writer (max on disk + 1, not
    * pointer + 1) so an orphan is never silently overwritten while a
    * historical reader might still list it.
    *
    * `expectedVersion` makes the commit CONDITIONAL (optimistic CAS):
    * pass `Some(v)` where `v` came from the [[currentVersion]] read
    * this read-modify-write is based on ([[ExpectEmpty]] for "no
    * snapshot yet" — real numbering starts at 1), or omit the argument
    * for a last-wins blind overwrite. When the pointer at flip time
    * does not name the expected version, the commit throws
    * ConcurrentModificationException and the written `v<N>` directory
    * remains as a skipped orphan — the caller re-reads and retries its
    * whole read-modify-write, exactly like any table format's
    * conflict-retry loop. The expensive data write happens OUTSIDE the
    * lock; only the pointer check-and-flip is serialized.
    *
    * `partitionCols` (optional) hive-partitions the snapshot data by
    * those columns — provenance/pruning layouts keep working through
    * the spine.
    */
  def commit(df: DataFrame, dir: String,
      expectedVersion: Option[Long] = None,
      partitionCols: Seq[String] = Nil): Long = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    // fast-fail BEFORE the expensive write when the table has already
    // moved — the conflict is certain, no need to burn the I/O
    checkExpected(dir, expectedVersion, detail = "")
    // Stage-then-rename version allocation. Writing straight to
    // v<max+1> is a RACE: two writers can both list the same max,
    // both pass Spark's errorifexists pre-check, and their part files
    // silently MERGE inside one version directory (observed in the
    // two-writer spec: a 30-row and a 40-row commit producing a 70-row
    // snapshot). Instead the data lands fully in a writer-unique
    // .staged-* directory, and the claim on a version NUMBER is an
    // atomic directory rename — the filesystem arbitrates: the loser's
    // rename fails on the non-empty target and retries the next
    // number. A numbered directory is therefore always COMPLETE and
    // single-writer; a crashed writer leaves only .staged-* junk or an
    // un-pointed (skipped) version, never a mergeable target.
    val staged = java.nio.file.Paths.get(dir,
      s".staged-${java.util.UUID.randomUUID().toString.take(12)}")
    val w = df.write.mode("errorifexists")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(staged.toString)
    var next = (versions(dir) :+ 0L).max + 1
    var claimed = false
    while (!claimed) {
      try {
        java.nio.file.Files.move(staged,
          java.nio.file.Paths.get(dir, s"v$next"),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        claimed = true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => next += 1
        case _: java.nio.file.DirectoryNotEmptyException => next += 1
        case e: java.nio.file.FileSystemException
            // raw rename(2) reports a non-empty target as ENOTEMPTY,
            // which surfaces as a generic FileSystemException on some
            // JDK/filesystem combinations
            if e.getMessage != null && e.getMessage.contains("not empty") =>
          next += 1
      }
    }
    val tmp = java.nio.file.Paths.get(dir, s".current.tmp$next")
    java.nio.file.Files.writeString(tmp, s"v$next")
    withPointerLock(dir) {
      // v<next> would stay behind as an orphan on conflict — immutable,
      // never read, skipped by the next writer; torn state impossible
      try checkExpected(dir, expectedVersion,
        detail = s" (v$next left as an orphan; re-read and retry)")
      catch { case e: Throwable =>
        java.nio.file.Files.deleteIfExists(tmp); throw e }
      java.nio.file.Files.move(tmp, pointer(dir),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    next
  }

  /** The CAS predicate: the table must sit exactly at `expected`
    * ([[ExpectEmpty]] = no pointer yet). Violation throws
    * ConcurrentModificationException — the standard conflict-retry
    * signal.
    */
  private def checkExpected(dir: String, expected: Option[Long],
      detail: String): Unit =
    expected.foreach { exp =>
      val cur = currentVersion(dir)
      if (!cur.contains(exp) && !(exp == 0L && cur.isEmpty))
        throw new java.util.ConcurrentModificationException(
          s"conditional commit on $dir: expected v$exp, table is at " +
            s"${cur.map("v" + _).getOrElse("<uncommitted>")}$detail")
    }

  /** Version-0 convenience for conditional FIRST commits: expected
    * "no snapshot yet". Encoded as expectedVersion = Some(0) in
    * [[commit]] (v0 can never be a real version — numbering starts
    * at 1).
    */
  val ExpectEmpty: Option[Long] = Some(0L)

  /** Optimistic single-table TRANSACTION: read the current snapshot,
    * apply `mutate`, commit conditionally on the version that was
    * read; on conflict, re-read and re-apply — the standard
    * conflict-retry loop every optimistic table format wraps around
    * its CAS (Delta's commitWithRetries, Iceberg's Tasks.retry). This
    * is what upgrades lost-update DETECTION into lost-update
    * PREVENTION: N concurrent transactors each re-derive their change
    * from the state that actually won, so every update lands exactly
    * once (the two-writer increment spec pins it). `mutate` receives
    * None on an uncommitted table and MUST be a pure function of its
    * input — it re-executes on retry. Returns the committed version.
    * Exhausting `maxRetries` under sustained contention fails loudly
    * with the last conflict attached.
    */
  def transact(spark: SparkSession, dir: String, maxRetries: Int = 10)(
      mutate: Option[DataFrame] => DataFrame): Long = {
    var attempt = 0
    var lastConflict: Throwable = null
    while (attempt <= maxRetries) {
      val base = currentVersion(dir)
      val next = mutate(base.map(v => readAt(spark, dir, v)))
      try return commit(next, dir, expectedVersion = Some(base.getOrElse(0L)))
      catch {
        case e: java.util.ConcurrentModificationException =>
          lastConflict = e
          attempt += 1
      }
    }
    throw new IllegalStateException(
      s"transact on $dir: still conflicting after $maxRetries retries",
      lastConflict)
  }

  /** Serialize the pointer check-and-flip across processes via atomic
    * lock-file creation. Held for microseconds (no data I/O inside).
    * Bounded spin; a stale lock (writer crashed mid-flip) fails loudly
    * with removal instructions rather than deadlocking or silently
    * proceeding into a lost update.
    */
  private def withPointerLock[A](dir: String)(body: => A): A = {
    val lock = java.nio.file.Paths.get(dir, ".commit.lock")
    // property-tunable so the stale-lock spec doesn't stall the build
    val timeoutMs = java.lang.Long.getLong("graft.snapshot.lockTimeoutMs", 10000L)
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    var acquired = false
    while (!acquired) {
      try { java.nio.file.Files.createFile(lock); acquired = true }
      catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          if (System.nanoTime() > deadline)
            throw new IllegalStateException(
              s"could not acquire $lock within ${timeoutMs}ms — a writer " +
                "crashed mid-flip or is wedged; verify no writer is live, " +
                "then remove the lock file")
          Thread.sleep(5)
      }
    }
    try body
    finally java.nio.file.Files.deleteIfExists(lock)
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

  /** Time travel CONFORMED to the live schema — the reader half of
    * schema evolution. Versions are immutable, so a commit that widens
    * the schema leaves old versions narrow on disk forever; this read
    * presents any retained version under the CURRENT version's schema:
    * columns the old version lacks surface as NULL (by NAME, never a
    * positional bind — the schema_drift_union discipline), columns are
    * cast to the current type, and columns the current schema dropped
    * are omitted. With this, `readAtConformed(v) unionByName
    * readAtConformed(w)` is well-typed for any two retained versions —
    * the exact contract a multi-generation 100 TB table needs.
    */
  def readAtConformed(spark: SparkSession, dir: String, version: Long): DataFrame = {
    val target = read(spark, dir).schema
    val df = readAt(spark, dir, version)
    val have = df.columns.toSet
    df.select(target.fields.toSeq.map { f =>
      if (have(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*)
  }

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
