package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, count, input_file_name, lit, max, min, sum}

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
  *   <dir>/v2/_stats.tsv     optional per-file column min/max sidecar
  *   <dir>/v2/_bloom.tsv     optional per-file column bloom sidecar
  *   <dir>/v3/_base          merge-on-read DELETE commit: no data files,
  *   <dir>/v3/_deletes/      a base-version pointer plus tombstone keys
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
  *    have nothing to lose — but the pointer itself is MONOTONIC: a
  *    slow blind writer that claimed a lower number than the version a
  *    faster writer already published keeps its directory as a
  *    readable orphan and skips the flip, so readers never observe the
  *    table move backwards.
  *  - '''Merge-on-read deletes''': [[commitDeletes]] commits a
  *    tombstone sidecar AGAINST an existing version without rewriting
  *    a byte of data — the deletion-vector pattern that makes a
  *    GDPR-erasure on a 100 TB table a kilobyte write instead of a
  *    table rewrite. [[readAt]] applies the tombstones (an anti-join
  *    on the tombstone's key columns — the tombstone side is tiny, so
  *    the join broadcasts); a later [[transact]] that rewrites the
  *    table materializes them away (compaction).
  *  - '''File skipping''': [[commit]] with `statsCols` writes a
  *    per-file column min/max/nullCount sidecar (`_stats.tsv`,
  *    underscore-prefixed so data readers never see it — the Delta
  *    add-file-stats / Iceberg manifest-metrics pattern), and
  *    [[readWhere]] prunes files whose [min,max] cannot satisfy a
  *    range predicate BEFORE the scan: the biggest single scan win an
  *    unpartitioned predicate read gets at 100 TB.
  *
  * Writer concurrency: the pointer flip itself is serialized through a
  * short-lived `.commit.lock` file (atomic create; held only across the
  * check-and-flip, never across the data write). The lock carries its
  * owner's pid/timestamp, and a lock older than the staleness threshold
  * (`graft.snapshot.staleLockMs`, default 60 s — the flip itself is
  * microseconds, so age is proof of a crashed owner) is RECLAIMED by
  * the next writer; only a FRESH contended lock fails loudly after the
  * acquisition timeout, with removal instructions — the bounded,
  * operator-visible failure mode, as opposed to silent lost updates.
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

  /** The metadata-I/O profile this table directory runs on — POSIX
    * rename by default, the rename-less object-store protocol when the
    * directory is registered ([[SnapshotFileIO.register]]).
    */
  private def io(dir: String): SnapshotFileIO = SnapshotFileIO.forDir(dir)

  private def tablePath(dir: String) = java.nio.file.Paths.get(dir)

  /** Parse a pointer's content with the shared corruption guard: a
    * pointer whose contents are not exactly `v<digits>` is a loud
    * IllegalStateException carrying the bad contents, never a silent
    * None (which would read as "empty table" and invite a fresh v1
    * write next to live data) and never a bare NumberFormatException.
    */
  private def parsePointer(raw0: String, what: String): Long = {
    val raw = raw0.trim
    if (raw.matches("v\\d+")) raw.drop(1).toLong
    else throw new IllegalStateException(
      s"corrupt $what: expected v<N>, got '$raw'")
  }

  /** The committed version, if any commit has happened. */
  def currentVersion(dir: String): Option[Long] =
    io(dir).readPointer(tablePath(dir), "current")
      .map(parsePointer(_, s"snapshot pointer ${pointer(dir)}"))

  /** All COMPLETE snapshot versions present on disk (committed or
    * orphaned), ascending — a version a crashed writer half-published
    * never appears (on the POSIX profile completeness is rename
    * atomicity; on the object-store profile it is the seal marker).
    * Retention policy is the caller's: delete old `v*` directories
    * freely, never the one `current` names.
    */
  def versions(dir: String): Seq[Long] =
    io(dir).listVersions(tablePath(dir))

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
    *
    * `statsCols` (optional) gathers per-file min/max/nullCount for the
    * named DATA columns into the version's `_stats.tsv` sidecar — the
    * file-skipping manifest [[readWhere]] prunes with. The stats scan
    * reads only the named columns of the freshly staged files (column-
    * pruned parquet footers+pages, one extra pass over what was just
    * written — the same bookkeeping cost every stats-writing format
    * pays), and the sidecar is one line per (file, column): driver-
    * bounded the way a Delta log / Iceberg manifest is.
    */
  def commit(df: DataFrame, dir: String,
      expectedVersion: Option[Long] = None,
      partitionCols: Seq[String] = Nil,
      statsCols: Seq[String] = Nil,
      bloomCols: Seq[String] = Nil,
      bloomExpectedItems: Long = DefaultBloomExpectedItems,
      meta: Map[String, String] = Map.empty): Long = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    // fast-fail BEFORE the expensive write when the table has already
    // moved — the conflict is certain, no need to burn the I/O
    checkExpected(dir, expectedVersion, detail = "")
    val staged = stageData(df, dir, partitionCols, statsCols, bloomCols,
      bloomExpectedItems, meta)
    publishStaged(dir, staged, expectedVersion)
  }

  // -------------------------------------------------- commit metadata

  /** Write caller metadata into the staging directory as
    * `_meta.properties` (URL-encoded k=v lines) — the Iceberg
    * snapshot-summary / Delta commitInfo pattern: facts about the
    * commit (a streaming epoch, a job id) ride INSIDE the version
    * directory, covered by the same atomic claim-rename as the data,
    * which is what makes them usable for exactly-once decisions (a
    * marker outside the directory could tear against the publish).
    */
  private def writeMeta(staged: java.nio.file.Path,
      meta: Map[String, String]): Unit =
    if (meta.nonEmpty) {
      val enc = (s: String) =>
        java.net.URLEncoder.encode(s, java.nio.charset.StandardCharsets.UTF_8)
      java.nio.file.Files.writeString(staged.resolve("_meta.properties"),
        meta.toSeq.sortBy(_._1)
          .map { case (k, v) => s"${enc(k)}=${enc(v)}" }
          .mkString("", "\n", "\n"))
    }

  /** A version's commit metadata (empty when the commit carried none). */
  def readMeta(dir: String, version: Long): Map[String, String] = {
    val p = java.nio.file.Paths.get(dir, s"v$version", "_meta.properties")
    if (!java.nio.file.Files.exists(p)) Map.empty
    else java.nio.file.Files.readAllLines(p).toArray(Array.empty[String])
      .toSeq.filter(_.nonEmpty).map { line =>
        val i = line.indexOf('=')
        require(i > 0, s"corrupt _meta.properties line in $p: '$line'")
        val dec = (s: String) =>
          java.net.URLDecoder.decode(s, java.nio.charset.StandardCharsets.UTF_8)
        dec(line.substring(0, i)) -> dec(line.substring(i + 1))
      }.toMap
  }

  /** The commit chain from `version` down through `_append`/`_base`
    * pointers, tip first — the versions a read of `version` observes.
    * What exactly-once ingest dedup must scan: a CAS-loser orphan
    * NEVER appears here, so a crash between claim-rename and pointer
    * flip re-delivers (at-least-once) instead of silently dropping
    * the batch (a naive versions(dir) scan would see the orphan's
    * epoch marker and skip it — lost data).
    */
  def chainOf(dir: String, version: Long): Seq[Long] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var v = Option(version)
    while (v.isDefined) {
      out += v.get
      v = baseOf(dir, v.get).orElse(appendBaseOf(dir, v.get))
    }
    out.toSeq
  }

  private def stagedPath(dir: String) = java.nio.file.Paths.get(dir,
    s".staged-${java.util.UUID.randomUUID().toString.take(12)}")

  /** The deliberate failure [[commitUpsert]]'s `crashBeforePublish`
    * raises — thrown with every upsert artifact staged but NOTHING
    * published, the exact window that used to sit between the legacy
    * two-commit merge's delete and append steps. The
    * `snapshot_mor_upsert_atomic` gate injects it to prove no reader
    * can ever observe a deletes-applied/batch-missing state.
    */
  final class InjectedCrash(msg: String) extends RuntimeException(msg)

  /** The column names a chain read of `version` exposes, WITHOUT
    * resolving the chain: from the version's `_names` sidecar when
    * present (written by every commit flavor — schema-in-metadata, the
    * move every real format makes: Delta's log schema, Iceberg's
    * table metadata), falling back to the legacy full chain-read
    * inference for pre-sidecar versions. The difference is what keeps
    * a commit O(1) against chain depth: the commit-time schema checks
    * used to plan a readAt over EVERY generation (listing + footer per
    * generation, measured 2.6 s at depth 33 — quadratic over a
    * streaming table's life); the sidecar is one tiny file read.
    */
  def chainFieldNames(spark: SparkSession, dir: String,
      version: Long): Seq[String] = {
    val p = java.nio.file.Paths.get(dir, s"v$version", "_names")
    if (java.nio.file.Files.exists(p)) {
      val dec = (s: String) =>
        java.net.URLDecoder.decode(s, java.nio.charset.StandardCharsets.UTF_8)
      java.nio.file.Files.readAllLines(p).toArray(Array.empty[String])
        .toSeq.filter(_.nonEmpty).map(dec)
    } else readAt(spark, dir, version).schema.fieldNames.toSeq
  }

  /** Stage the `_names` sidecar: the chain-read column set this
    * version will expose, URL-encoded one name per line.
    */
  private def writeNames(staged: java.nio.file.Path,
      names: Seq[String]): Unit = {
    val enc = (s: String) =>
      java.net.URLEncoder.encode(s, java.nio.charset.StandardCharsets.UTF_8)
    java.nio.file.Files.writeString(staged.resolve("_names"),
      names.map(enc).mkString("", "\n", "\n"))
  }

  /** Stage `df`'s data plus every requested sidecar (stats, blooms,
    * commit metadata) into a fresh writer-unique directory — the
    * shared write half of all four commit flavors (main, branch,
    * append, rebase); the claim half is [[claimVersion]]. Chain
    * markers (`_append`/`_base`) are the caller's: they go in LAST,
    * after the sidecar builders have re-read the staged data files.
    */
  private def stageData(df: DataFrame, dir: String,
      partitionCols: Seq[String], statsCols: Seq[String],
      bloomCols: Seq[String], bloomExpectedItems: Long,
      meta: Map[String, String]): java.nio.file.Path = {
    val staged = stagedPath(dir)
    val w = df.write.mode("errorifexists")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(staged.toString)
    if (statsCols.nonEmpty)
      writeStatsSidecar(df.sparkSession, staged, statsCols)
    if (bloomCols.nonEmpty)
      writeBloomSidecar(df.sparkSession, staged, bloomCols, bloomExpectedItems)
    writeMeta(staged, meta)
    // schema-in-metadata: a full commit exposes its own columns (the
    // chain-extending flavors overwrite this with the merged set)
    writeNames(staged, df.columns.toSeq)
    staged
  }

  /** Claim a version number for a fully-written staging directory and
    * flip the pointer. Stage-then-rename version allocation: writing
    * straight to v<max+1> is a RACE — two writers can both list the
    * same max, both pass Spark's errorifexists pre-check, and their
    * part files silently MERGE inside one version directory (observed
    * in the two-writer spec: a 30-row and a 40-row commit producing a
    * 70-row snapshot). Instead the data lands fully in a writer-unique
    * .staged-* directory, and the claim on a version NUMBER is an
    * atomic directory rename — the filesystem arbitrates: the loser's
    * rename fails on the non-empty target and retries the next number.
    * A numbered directory is therefore always COMPLETE and
    * single-writer; a crashed writer leaves only .staged-* junk or an
    * un-pointed (skipped) version, never a mergeable target.
    */
  private def publishStaged(dir: String, staged: java.nio.file.Path,
      expectedVersion: Option[Long]): Long = {
    val next = claimVersion(dir, staged)
    flipPointer(dir, next, expectedVersion)
    next
  }

  /** The claim loop shared by main commits and branch commits: claim
    * the next free `v<N>` name for the staged directory and return N.
    * Arbitration is the profile's ([[SnapshotFileIO.claimDir]]): POSIX
    * atomic rename by default, claim-marker conditional PUT + copy +
    * seal on the rename-less object-store profile. The starting
    * number comes from `maxClaimed`, not `versions` — on a store
    * where data movement is non-atomic, an IN-FLIGHT claim holds its
    * number before its data is visible, and a writer that only looked
    * at complete versions would collide with it.
    */
  private def claimVersion(dir: String, staged: java.nio.file.Path): Long = {
    // the log's creation marker must exist BEFORE this claim lands on
    // disk, so the pre-log floor never shields post-log versions
    ensureLog(dir)
    val fio = io(dir)
    var next = fio.maxClaimed(tablePath(dir)) + 1
    var claimed = false
    while (!claimed) {
      val target = java.nio.file.Paths.get(dir, s"v$next")
      if (fio.claimDir(staged, target)) claimed = true else next += 1
    }
    next
  }

  /** The locked pointer check-and-flip. Returns false when the flip was
    * SKIPPED for monotonicity: a slow unconditional writer that claimed
    * v5 while a faster one already published v6 must not flip the
    * pointer BACKWARDS (readers would observe v6 then v5 — version
    * order every table format preserves even for blind writers). Its
    * v5 stays a complete, time-travel-readable orphan.
    */
  private[graft] def flipPointer(dir: String, next: Long,
      expectedVersion: Option[Long] = None): Boolean =
    withPointerLock(dir) {
      // v<next> would stay behind as an orphan on conflict — immutable,
      // never read, skipped by the next writer; torn state impossible
      checkExpected(dir, expectedVersion,
        detail = s" (v$next left as an orphan; re-read and retry)")
      if (currentVersion(dir).exists(_ >= next)) false
      else {
        // log BEFORE the flip: a crash between the two must err toward
        // a spurious line (a readable, complete version recorded as
        // published though the flip never landed — conservative: GC
        // keeps it, as-of may resolve it) rather than a missing one
        // (a version readers SAW with no provenance — a later GC would
        // destroy published history)
        logPublish(dir, next, "current")
        io(dir).publishPointer(tablePath(dir), "current", s"v$next")
        true
      }
    }

  // ------------------------------------------------------- publish log

  /** Append-only record of every version a ref (main pointer or branch)
    * has EVER named — the table's transaction log, the provenance that
    * lets [[gcOrphans]] tell real history (an old version a reader may
    * still time-travel to) from CAS-loser debris (a claimed version no
    * ref ever pointed at). One line per publish, `v<N>\t<refname>`
    * (`current` for the main pointer), written under the pointer lock
    * so lines never tear; duplicates are fine (the reader folds to a
    * map). The hot-path cost is one appended line per commit — the
    * same order as any format's log write.
    */
  private def publishLog(dir: String) =
    java.nio.file.Paths.get(dir, "publishes.log")

  /** The reserved ref of the log's CREATION MARKER: the first line of a
    * fresh publish log records `v<max-version-on-disk-at-creation>`, so
    * the pre-log floor [[gcOrphans]] must respect is EXPLICIT instead of
    * inferred from the minimum published version (the inference
    * permanently shielded any CAS loser claimed at or below the first
    * logged publish — e.g. two writers racing on an empty table left the
    * loser's v1 unreclaimable forever). Written by the first claim under
    * a dir ([[claimVersion]] calls [[ensureLog]] BEFORE the claim-rename
    * lands), so on a brand-new table the floor is v0 — nothing shielded
    * — and on a legacy pre-log table it is exactly the pre-log history.
    */
  val LogCreatedRef: String = "_log_created"

  private def ensureLog(dir: String): Unit = {
    val p = publishLog(dir)
    if (!io(dir).logExists(p)) {
      val floor = (versions(dir) :+ 0L).max
      // conditional create: exactly ONE creation marker can ever be
      // written — two racing first-committers race on the atomic
      // create itself, and the loser is the success path (the winner's
      // marker carries an equivalent floor). The earlier CREATE+APPEND
      // form let both racers append a marker, leaving the GC floor to
      // depend on append ordering — a property weakly-consistent
      // filesystems don't guarantee.
      io(dir).logCreateNew(p,
        s"v$floor\t$LogCreatedRef\t${System.currentTimeMillis()}")
    }
  }

  private def logPublish(dir: String, version: Long, ref: String): Unit =
    io(dir).logAppend(publishLog(dir),
      s"v$version\t$ref\t${System.currentTimeMillis()}")

  /** The raw publish history: (version, ref, epoch-ms) per event, in
    * log order. Corrupt lines are a loud error, like the pointer's own
    * parse.
    */
  def publishEvents(dir: String): Seq[(Long, String, Long)] = {
    val p = publishLog(dir)
    io(dir).logRead(p).map { line =>
        val f = line.split("\t", -1)
        if (f.length == 3 && f(0).matches("v\\d+") && f(1).nonEmpty &&
            f(2).matches("\\d+"))
          (f(0).drop(1).toLong, f(1), f(2).toLong)
        else throw new IllegalStateException(
          s"corrupt publishes.log line in $p: '$line'")
      }
  }

  /** version → the refs that have EVER named it (empty for a table
    * that predates the log — [[gcOrphans]] then removes nothing, the
    * conservative reading). The creation marker is bookkeeping, not a
    * publish — excluded here.
    */
  def publishedRefs(dir: String): Map[Long, Set[String]] =
    publishEvents(dir).filter(_._2 != LogCreatedRef)
      .groupMap(_._1)(_._2).view.mapValues(_.toSet).toMap

  /** The pre-log floor: versions at or below it predate the publish log
    * (or were in flight when it was created) and carry no provenance —
    * [[gcOrphans]] keeps them all. Explicit from the creation marker
    * when present; inferred from the minimum published version on
    * legacy logs written before the marker existed.
    */
  private def preLogFloor(dir: String, pubs: Map[Long, Set[String]]): Long =
    publishEvents(dir).collectFirst { case (v, LogCreatedRef, _) => v }
      .getOrElse(pubs.keySet.min)

  /** Every version any ref has ever published. */
  def publishedVersions(dir: String): Set[Long] = publishedRefs(dir).keySet

  /** Time travel BY TIMESTAMP (Delta's `TIMESTAMP AS OF`): the version
    * MAIN showed at `tsMs` — the newest `current` publish at or before
    * that instant (the pointer is monotonic, so "latest event ≤ ts"
    * and "max version ≤ ts" coincide). Branch publishes don't count:
    * a reader asking "the table as of Tuesday" means the table its
    * production readers saw, not a WAP candidate. Loud when the table
    * had no publish yet at `tsMs` and on pre-log tables (no
    * provenance, no timestamp travel — pin a version instead).
    *
    * Crash-window reconciliation: the flip logs BEFORE it moves the
    * pointer (the conservative direction — see [[flipPointer]]), so a
    * writer that died between the two leaves a TRAILING logged version
    * the pointer never reached. Any logged version above the live
    * pointer is therefore unreachable-or-in-flight and is ignored here
    * — as-of never resolves a version no main reader could have seen
    * through the pointer's own monotonic history. The one residual
    * caveat (documented, not detectable from the log alone): a version
    * logged mid-crash and later OVERTAKEN by a higher publish stays in
    * the log and resolves for timestamps inside that crash window;
    * that read is still a complete committed snapshot, just one the
    * pointer skipped.
    */
  def versionAsOf(dir: String, tsMs: Long): Long = {
    val live = currentVersion(dir)
    val evs = publishEvents(dir).filter(e =>
      e._2 == "current" && e._3 <= tsMs && live.exists(e._1 <= _))
    require(evs.nonEmpty,
      s"no main publish at or before ts=$tsMs on $dir — the table did " +
        "not exist yet, or predates the publish log (use readAt)")
    evs.map(_._1).max
  }

  /** [[versionAsOf]] for a BRANCH: the version the branch ref showed at
    * `tsMs` — the audit-trail read "what was the WAP candidate when the
    * Tuesday audit ran". Same publish-log provenance, same trailing
    * crash-window reconciliation against the branch's live pointer,
    * same loud error when the branch had no publish yet at `tsMs`.
    */
  def branchVersionAsOf(dir: String, name: String, tsMs: Long): Long = {
    refPtr(dir, name) // validate the name (and reserve 'current') first
    val live = branchVersion(dir, name)
    val evs = publishEvents(dir).filter(e =>
      e._2 == name && e._3 <= tsMs && live.exists(e._1 <= _))
    require(evs.nonEmpty,
      s"no publish to branch '$name' at or before ts=$tsMs on $dir — " +
        "the branch did not exist yet, or predates the publish log")
    evs.map(_._1).max
  }

  /** [[readAt]] of [[branchVersionAsOf]] — branch-level time travel. */
  def readBranchAsOf(spark: SparkSession, dir: String, name: String,
      tsMs: Long): DataFrame =
    readAt(spark, dir, branchVersionAsOf(dir, name, tsMs))

  /** The publish log AS A TABLE — the lake's own audit trail surfaced
    * to SQL the way [[manifest]] surfaces file stats: one row per
    * publish event `(version, ref, ts_ms)`, read DISTRIBUTED straight
    * off the TSV (FAILFAST, so a corrupt line is as loud here as in
    * [[publishEvents]]'s driver parse), never a driver loop — a
    * long-lived ingest table's log is one line per commit, and
    * provenance questions ("who published v N", "how many publishes
    * per day", "which versions only ever lived on a branch") become
    * plain DataFrame queries. Includes the [[LogCreatedRef]] marker
    * line; filter on `ref` for publishes only. Loud on a table with no
    * log (no provenance to query).
    */
  def publishesTable(spark: SparkSession, dir: String): DataFrame = {
    require(io(dir).logExists(publishLog(dir)),
      s"no publish log under $dir — the table predates the log or has " +
        "never committed")
    // the log is metadata-scale (one line per publish) and
    // [[publishEvents]] already carries the loud corrupt-line parse,
    // so build the frame from the profile-aware read — spark.read.csv
    // on the raw path would miss the object-store profile's
    // entry-per-object layout
    import spark.implicits._
    publishEvents(dir).toDF("version", "ref", "ts_ms")
  }

  /** [[readAt]] of [[versionAsOf]] — reproducible "the table as the
    * pipeline saw it that day" reads without bookkeeping version
    * numbers, as long as retention keeps the version.
    */
  def readAsOf(spark: SparkSession, dir: String, tsMs: Long): DataFrame =
    readAt(spark, dir, versionAsOf(dir, tsMs))

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
    *
    * Because `mutate` reads through the tombstone-aware [[readAt]], a
    * plain identity transact (`cur => cur.get`) over a table with
    * merge-on-read deletes is COMPACTION: it materializes the deletes
    * into a full rewrite and the new version carries no `_base` chain.
    *
    * The layout params (`partitionCols`/`statsCols`/`bloomCols`) pass
    * through to the conditional [[commit]], so a transact can also be
    * an OPTIMIZE: an identity mutate plus `repartitionByRange` and
    * `statsCols` rewrites an ingest-ordered table into a skip-friendly
    * clustered layout in one CAS-protected step (the
    * `snapshot_optimize_cluster` gate).
    */
  def transact(spark: SparkSession, dir: String, maxRetries: Int = 10,
      partitionCols: Seq[String] = Nil, statsCols: Seq[String] = Nil,
      bloomCols: Seq[String] = Nil)(
      mutate: Option[DataFrame] => DataFrame): Long = {
    var attempt = 0
    var lastConflict: Throwable = null
    while (attempt <= maxRetries) {
      val base = currentVersion(dir)
      val next = mutate(base.map(v => readAt(spark, dir, v)))
      try return commit(next, dir, expectedVersion = Some(base.getOrElse(0L)),
        partitionCols = partitionCols, statsCols = statsCols,
        bloomCols = bloomCols)
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

  // ------------------------------------------------------- branch refs

  /** Branch-name discipline: filesystem-safe, never the reserved main
    * pointer's name. A ref is a pointer file `ref.<name>` beside
    * `current`, flipped under the same table lock with the same
    * CAS/monotonicity contract — the Iceberg refs / Delta branch
    * pattern reduced to its essentials.
    */
  private def refPtr(dir: String, name: String) = {
    require(name.matches("[A-Za-z0-9_-]{1,64}") && name != "current",
      s"branch name must be [A-Za-z0-9_-]{1,64} and not 'current': '$name'")
    java.nio.file.Paths.get(dir, s"ref.$name")
  }

  /** The version branch `name` points at, if the branch exists. Same
    * loud corruption guard as [[currentVersion]].
    */
  def branchVersion(dir: String, name: String): Option[Long] = {
    val p = refPtr(dir, name) // validates the name
    io(dir).readPointer(tablePath(dir), s"ref.$name")
      .map(parsePointer(_, s"branch pointer $p"))
  }

  /** All branch names with a live ref under `dir`. */
  def branches(dir: String): Seq[String] =
    io(dir).listPointers(tablePath(dir))
      .filter(_.startsWith("ref.")).map(_.stripPrefix("ref.")).sorted

  /** The branch-pointer CAS predicate, mirroring [[checkExpected]]:
    * the branch must sit exactly at `expected` ([[ExpectEmpty]] = no
    * such branch yet).
    */
  private def checkExpectedRef(dir: String, name: String,
      expected: Option[Long], detail: String): Unit =
    expected.foreach { exp =>
      val cur = branchVersion(dir, name)
      if (!cur.contains(exp) && !(exp == 0L && cur.isEmpty))
        throw new java.util.ConcurrentModificationException(
          s"conditional commit on $dir branch '$name': expected v$exp, " +
            s"branch is at ${cur.map("v" + _).getOrElse("<absent>")}$detail")
    }

  /** Commit `df` as a new version published to BRANCH `name` instead
    * of main — the write half of write-audit-publish (WAP): the data
    * lands as a full first-class version (same staging, claim-rename,
    * sidecars and immutability as [[commit]]), but only the branch ref
    * flips, so main readers never see it until [[publishBranch]].
    * `expectedBranchVersion` is the branch's own CAS ([[ExpectEmpty]]
    * for a new branch); the branch pointer is monotonic like main's.
    * Returns the committed version.
    */
  def commitToBranch(df: DataFrame, dir: String, name: String,
      expectedBranchVersion: Option[Long] = None,
      partitionCols: Seq[String] = Nil,
      statsCols: Seq[String] = Nil,
      bloomCols: Seq[String] = Nil,
      bloomExpectedItems: Long = DefaultBloomExpectedItems,
      meta: Map[String, String] = Map.empty): Long = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    refPtr(dir, name) // validate the name before any I/O
    checkExpectedRef(dir, name, expectedBranchVersion, detail = "")
    val staged = stageData(df, dir, partitionCols, statsCols, bloomCols,
      bloomExpectedItems, meta)
    // claim a version number exactly like a main commit (one shared
    // number space — a branch version IS a version), then flip only
    // the branch ref
    val next = claimVersion(dir, staged)
    withPointerLock(dir) {
      checkExpectedRef(dir, name, expectedBranchVersion,
        detail = s" (v$next left as an orphan; re-read and retry)")
      if (!branchVersion(dir, name).exists(_ >= next)) {
        // log-before-flip, same crash-asymmetry reasoning as flipPointer
        logPublish(dir, next, name)
        io(dir).publishPointer(tablePath(dir), s"ref.$name", s"v$next")
      }
    }
    next
  }

  /** The publish half of WAP: fast-forward MAIN to branch `name`'s
    * head — METADATA-ONLY (one pointer flip under the table lock; not
    * a byte of data moves, which is the entire point: the audited
    * candidate becomes live atomically, however many terabytes it
    * holds). `expectedVersion` is the usual main-pointer CAS; a
    * publish is always a read-audit-publish, so passing the main
    * version the audit ran against is how a racing writer fails this
    * loudly instead of being silently overwritten. Fast-forward ONLY:
    * publishing a branch whose head is not ahead of main throws
    * (stale branch — re-branch from current and re-audit), never a
    * silent skip, because the caller was promised their audited data
    * went live. Returns the published version.
    */
  def publishBranch(dir: String, name: String,
      expectedVersion: Option[Long] = None): Long = {
    val head = branchVersion(dir, name).getOrElse(
      throw new IllegalStateException(
        s"publishBranch: no branch '$name' under $dir"))
    withPointerLock(dir) {
      checkExpected(dir, expectedVersion, detail =
        s" (branch '$name' untouched; re-read, re-audit and retry)")
      val cur = currentVersion(dir)
      require(cur.forall(_ < head),
        s"publishBranch: fast-forward only — main is at " +
          s"${cur.map("v" + _).getOrElse("<uncommitted>")}, branch " +
          s"'$name' head v$head is not ahead; re-branch and re-audit")
      // log-before-flip, same crash-asymmetry reasoning as flipPointer
      logPublish(dir, head, "current")
      io(dir).publishPointer(tablePath(dir), "current", s"v$head")
    }
    head
  }

  /** Delete branch `name`'s ref file (the versions it published stay
    * on disk — [[gcOrphans]] reclaims the never-published ones, and
    * [[expire]] ages out the rest). Loud on a missing branch: dropping
    * a branch that does not exist is a caller bug, not a no-op.
    */
  def dropBranch(dir: String, name: String): Unit = {
    refPtr(dir, name) // validate the name
    if (!io(dir).dropPointer(tablePath(dir), s"ref.$name"))
      throw new IllegalStateException(s"dropBranch: no branch '$name' under $dir")
  }

  // ------------------------------------------------ merge-on-read deletes

  private def basePtr(dir: String, version: Long) =
    java.nio.file.Paths.get(dir, s"v$version", "_base")

  private def appendPtr(dir: String, version: Long) =
    java.nio.file.Paths.get(dir, s"v$version", "_append")

  /** The base version an APPEND commit extends, if `version` is one
    * (full-rewrite data commits and delete commits have no `_append`).
    */
  def appendBaseOf(dir: String, version: Long): Option[Long] = {
    val p = appendPtr(dir, version)
    if (!java.nio.file.Files.exists(p)) None
    else {
      val raw = java.nio.file.Files.readString(p).trim
      if (raw.matches("v\\d+")) Some(raw.drop(1).toLong)
      else throw new IllegalStateException(
        s"corrupt append pointer $p: expected v<N>, got '$raw'")
    }
  }

  /** APPEND commit: publish a new version whose content is the base
    * version PLUS `delta`, writing ONLY the delta's files — the
    * delta-generation pattern (Iceberg's append snapshot, Delta's
    * add-only commit): a 100 TB table takes an ingest batch at the
    * cost of the BATCH, never a rewrite. The version directory holds
    * the delta's parquet plus an `_append` pointer to the base;
    * [[readAt]] resolves the chain as base ∪ delta (by NAME — the
    * schema_drift_union discipline), and a full-rewrite [[transact]]
    * is compaction for append chains exactly as it is for delete
    * chains.
    *
    * `expectedVersion` is MANDATORY: an append extends the state the
    * caller inspected, and losing the race to a compaction or an
    * erasure must conflict loudly, not resurrect or double rows.
    *
    * Each GENERATION carries its own layout: `partitionCols` here
    * partitions only the delta's files, independent of how the base
    * generation was laid out — partition-spec EVOLUTION (the Iceberg
    * spec-evolution story): a reader's predicate prunes each
    * generation by that generation's own directories
    * (`snapshot_partition_evolve` pins it). Likewise `statsCols` /
    * `bloomCols` sidecar only the delta's files; the base keeps its
    * own sidecars, so skipping composes per generation. Note the
    * skipping READS ([[readWhere]]/[[readWhereIn]]/[[manifest]])
    * target single-generation versions and refuse an append version
    * loudly — prune each generation against its own manifest, then
    * union (what the gate does); a silent cross-generation answer
    * from one generation's sidecar would be wrong.
    *
    * The delta must carry exactly the base read's column set (checked
    * loudly). Hive-partition type round-trip is the caller's care as
    * with [[commit]]: a partition column read back from directory
    * names gets the inferred type, so cast before the write.
    */
  def commitAppend(delta: DataFrame, dir: String, expectedVersion: Long,
      partitionCols: Seq[String] = Nil, statsCols: Seq[String] = Nil,
      bloomCols: Seq[String] = Nil,
      bloomExpectedItems: Long = DefaultBloomExpectedItems,
      meta: Map[String, String] = Map.empty,
      allowSchemaEvolution: Boolean = false): Long = {
    require(expectedVersion >= 1,
      s"commitAppend needs a committed base version, got v$expectedVersion")
    // name check from the _names sidecar, NOT a chain-read plan: the
    // commit must stay O(1) against chain depth (a 10^3-commit ingest
    // table would otherwise pay a per-batch cost that grows with age)
    val baseNames = chainFieldNames(delta.sparkSession, dir, expectedVersion)
    val baseCols = baseNames.toSet
    val deltaCols = delta.columns.toSet
    // schema EVOLUTION mid-chain is opt-in (Delta's mergeSchema): an
    // accidental column drift must stay a loud commit-time error, but
    // a deliberate widening (the ingest feed grew a column) appends
    // with its own schema — the chain read resolves by NAME and
    // presents each generation's missing columns as NULL. A SHARED
    // core must remain (a disjoint delta is a different table, not an
    // evolution), checked either way.
    require(deltaCols.intersect(baseCols).nonEmpty,
      s"append delta shares no columns with the base read of $dir " +
        s"v$expectedVersion — not an evolution, a different table")
    require(allowSchemaEvolution || deltaCols == baseCols,
      s"append delta schema must match the base read: delta has " +
        s"${(deltaCols -- baseCols).mkString(", ")} extra / " +
        s"${(baseCols -- deltaCols).mkString(", ")} missing vs $dir " +
        s"v$expectedVersion (pass allowSchemaEvolution = true for a " +
        "deliberate widening)")
    checkExpected(dir, Some(expectedVersion), detail = "")
    val staged = stageData(delta, dir, partitionCols, statsCols, bloomCols,
      bloomExpectedItems, meta)
    // fold the ancestors' manifests forward so chain reads stay O(1)
    // at any depth (no-op on stats-less commits/ancestry)
    if (statsCols.nonEmpty)
      writeChainManifestFold(staged, dir, expectedVersion)
    // the chain read exposes base ∪ delta names (an evolved delta's
    // new columns append; order: base first, the unionByName shape)
    writeNames(staged, baseNames ++ delta.columns.filterNot(baseCols))
    // chain marker LAST (stageData's sidecar builders re-read the
    // staged dir and must see only the delta's data files)
    java.nio.file.Files.writeString(staged.resolve("_append"),
      s"v$expectedVersion")
    publishStaged(dir, staged, Some(expectedVersion))
  }

  /** REBASE commit — the primitive under incremental OPTIMIZE: publish
    * a new version whose `_append` pointer names `baseVersion` (an
    * append-ancestor of the current tip) instead of the tip itself,
    * with `delta` REPLACING every generation between them. The caller
    * asserts (and [[optimizeDeltas]] guarantees) that `delta` holds
    * exactly those generations' rows, re-shaped; the commit CAS-es on
    * `expectedVersion` (the tip whose deltas are being folded), so a
    * racing ingest conflicts loudly and retries on top of the new
    * shape. The rebase window must be APPEND-ONLY: a merge-on-read
    * delete commit between base and tip carries tombstones that apply
    * to the BASE's rows too, and folding it away would resurrect them
    * — that case is full compaction's job ([[transact]]), checked
    * loudly here.
    */
  def commitRebase(delta: DataFrame, dir: String, expectedVersion: Long,
      baseVersion: Long, partitionCols: Seq[String] = Nil,
      statsCols: Seq[String] = Nil, bloomCols: Seq[String] = Nil,
      bloomExpectedItems: Long = DefaultBloomExpectedItems,
      meta: Map[String, String] = Map.empty,
      allowSchemaEvolution: Boolean = false): Long = {
    require(baseVersion >= 1 && expectedVersion > baseVersion,
      s"commitRebase folds deltas ABOVE a base: base v$baseVersion, " +
        s"tip v$expectedVersion")
    var v = expectedVersion
    while (v != baseVersion) {
      require(baseOf(dir, v).isEmpty,
        s"commitRebase: v$v in the rebase window of $dir is a merge-on-" +
          "read delete commit — its tombstones apply to the base too; " +
          "run a full compaction (transact) instead")
      require(!isUpsert(dir, v),
        s"commitRebase: v$v in the rebase window of $dir is an upsert " +
          "commit — folding it away would resurrect the base rows its " +
          "tombstones replaced; run a full compaction (transact) instead")
      v = appendBaseOf(dir, v).getOrElse(throw new IllegalArgumentException(
        s"v$baseVersion is not an append-ancestor of v$expectedVersion " +
          s"in $dir (chain breaks at v$v)"))
    }
    val baseNames = chainFieldNames(delta.sparkSession, dir, baseVersion)
    val baseCols = baseNames.toSet
    val deltaCols = delta.columns.toSet
    require(deltaCols.intersect(baseCols).nonEmpty,
      s"rebase delta shares no columns with the base read of $dir " +
        s"v$baseVersion — not an evolution, a different table")
    require(allowSchemaEvolution || deltaCols == baseCols,
      s"rebase delta schema must match the base read: delta has " +
        s"${(deltaCols -- baseCols).mkString(", ")} extra / " +
        s"${(baseCols -- deltaCols).mkString(", ")} missing vs $dir " +
        s"v$baseVersion (pass allowSchemaEvolution = true when folding " +
        "an evolved chain)")
    checkExpected(dir, Some(expectedVersion), detail = "")
    val staged = stageData(delta, dir, partitionCols, statsCols, bloomCols,
      bloomExpectedItems, meta)
    if (statsCols.nonEmpty)
      writeChainManifestFold(staged, dir, baseVersion)
    writeNames(staged, baseNames ++ delta.columns.filterNot(baseCols))
    java.nio.file.Files.writeString(staged.resolve("_append"),
      s"v$baseVersion")
    publishStaged(dir, staged, Some(expectedVersion))
  }

  /** Incremental OPTIMIZE — compact ONLY the append deltas above
    * `baseVersion`, leaving the base generation's files untouched: the
    * Delta auto-compaction / Iceberg rewrite-data-files-with-filter
    * pattern that keeps a streaming-ingested table skip-friendly
    * WITHOUT paying a full rewrite. Reads the delta generations' own
    * files (never the base), applies `reshape` (typically
    * `repartitionByRange` onto the cluster key), and publishes one
    * [[commitRebase]] whose cost is delta-proportional: after a week
    * of small appends onto a 100 TB base, the nightly optimize touches
    * the week, not the table. The chain shrinks to base + one
    * clustered delta generation; `statsCols`/`bloomCols` re-sidecar
    * the new generation so file skipping bites on it again.
    */
  def optimizeDeltas(spark: SparkSession, dir: String, baseVersion: Long,
      partitionCols: Seq[String] = Nil, statsCols: Seq[String] = Nil,
      bloomCols: Seq[String] = Nil, allowSchemaEvolution: Boolean = false,
      raceWindow: () => Unit = () => (),
      metaExtra: Map[String, String] = Map.empty)(
      reshape: DataFrame => DataFrame): Long = {
    val tip = currentVersion(dir).getOrElse(throw new IllegalStateException(
      s"no committed snapshot under $dir"))
    require(tip != baseVersion,
      s"nothing to optimize: $dir is at its base v$baseVersion")
    val gens = scala.collection.mutable.ArrayBuffer.empty[Long]
    var v = tip
    while (v != baseVersion) {
      require(baseOf(dir, v).isEmpty,
        s"optimizeDeltas: v$v of $dir is a merge-on-read delete commit " +
          "— run a full compaction (transact) instead")
      require(!isUpsert(dir, v),
        s"optimizeDeltas: v$v of $dir is an upsert commit — folding it " +
          "away would resurrect the base rows its tombstones replaced; " +
          "run a full compaction (transact) instead")
      gens += v
      v = appendBaseOf(dir, v).getOrElse(throw new IllegalArgumentException(
        s"v$baseVersion is not an append-ancestor of the tip v$tip of $dir"))
    }
    // the deltas' OWN files only — the base is never read, which is
    // the entire point (unionByName: each generation's layout is free
    // to differ, the spec-evolution discipline)
    val delta = gens.map(g => spark.read.parquet(s"$dir/v$g"))
      .reduce(_.unionByName(_, allowMissingColumns = true))
    // fold the generations' metadata forward: the numeric exactly-once
    // markers — "epoch" and every per-writer "txn.<id>" — fold as MAX
    // (each high-water mark must survive the optimize, or a replayed
    // old batch afterwards would re-append); any other key takes the
    // newest generation's value
    val metas = gens.map(g => readMeta(dir, g)) // tip-first
    val merged0 = metas.reverse.foldLeft(Map.empty[String, String])(_ ++ _)
    val hwmKeys = metas.flatMap(_.keys)
      .filter(k => k == "epoch" || k.startsWith("txn.")).distinct
    // metaExtra LAST: the newest-wins default is wrong for ADDITIVE
    // per-generation scalars (an index's n_docs / sum_dl fold as sums
    // across the generations being folded) — only the caller knows
    // which keys are additive, so it computes the fold and overrides
    val merged = merged0 ++ hwmKeys.map { k =>
      k -> metas.flatMap(_.get(k)).map(_.toLong).max.toString
    } ++ metaExtra
    // deterministic interleave hook for the contention gate: a racing
    // append landing HERE (after the fold read the tip, before the
    // rebase commits) must CAS-fail the rebase loudly — the caller
    // re-reads and retries, and the racer's delta is never lost
    raceWindow()
    commitRebase(reshape(delta), dir, expectedVersion = tip,
      baseVersion = baseVersion, partitionCols = partitionCols,
      statsCols = statsCols, bloomCols = bloomCols, meta = merged,
      allowSchemaEvolution = allowSchemaEvolution)
  }

  /** The base version a merge-on-read delete commit applies to, if
    * `version` is one (data commits have no `_base`).
    */
  def baseOf(dir: String, version: Long): Option[Long] = {
    val p = basePtr(dir, version)
    if (!java.nio.file.Files.exists(p)) None
    else {
      val raw = java.nio.file.Files.readString(p).trim
      if (raw.matches("v\\d+")) Some(raw.drop(1).toLong)
      else throw new IllegalStateException(
        s"corrupt base pointer $p: expected v<N>, got '$raw'")
    }
  }

  /** Merge-on-read DELETE commit: publish a new version that is the
    * base version MINUS the `tombstones` keys, without rewriting any
    * data — the version directory holds only a `_base` pointer and a
    * `_deletes/` parquet of the tombstone keys (both underscore-
    * prefixed: invisible to any direct parquet read). [[readAt]]
    * resolves the chain; a later full-rewrite commit (e.g. an identity
    * [[transact]]) is compaction and cuts it.
    *
    * `expectedVersion` is MANDATORY (not optional as on [[commit]]):
    * a deletion is always a read-modify-write against the state the
    * caller inspected — GDPR-erasure semantics admit no last-wins
    * blind variant, because losing the race could silently resurrect
    * rows a concurrent rewrite re-inserted. On conflict the usual
    * ConcurrentModificationException fires; retry via [[transact]]-
    * style re-read.
    *
    * The tombstone frame's COLUMNS are the delete key: rows of the
    * base version matching a tombstone on all of them are gone from
    * the new version. Keys must exist in the base schema (checked
    * loudly here, not at first read). Tombstones are collected-free —
    * written as parquet, applied as an anti-join that Spark broadcasts
    * (the tombstone side is delete-proportional, not table-
    * proportional).
    */
  def commitDeletes(tombstones: DataFrame, dir: String,
      expectedVersion: Long): Long = {
    require(expectedVersion >= 1,
      s"commitDeletes needs a committed base version, got v$expectedVersion")
    val baseNames = chainFieldNames(tombstones.sparkSession, dir,
      expectedVersion)
    val missing = tombstones.columns.filterNot(baseNames.toSet)
    require(missing.isEmpty,
      s"tombstone key column(s) ${missing.mkString(", ")} not in base " +
        s"schema of $dir v$expectedVersion")
    checkExpected(dir, Some(expectedVersion), detail = "")
    val staged = stagedPath(dir)
    tombstones.write.mode("errorifexists")
      .parquet(staged.resolve("_deletes").toString)
    writeNames(staged, baseNames) // a delete exposes the base's columns
    java.nio.file.Files.writeString(staged.resolve("_base"),
      s"v$expectedVersion")
    publishStaged(dir, staged, Some(expectedVersion))
  }

  /** Whether `version` is a merge (UPSERT) commit: an append-chain
    * generation that ALSO carries a `_deletes/` tombstone set against
    * its base — [[commitUpsert]]'s shape. Its tombstones apply to the
    * base generations' rows, so it can never be folded away by a
    * rebase/optimize (that would resurrect the replaced rows) and its
    * chain's manifests cannot answer counts.
    */
  def isUpsert(dir: String, version: Long): Boolean =
    appendBaseOf(dir, version).isDefined &&
      java.nio.file.Files.exists(
        java.nio.file.Paths.get(dir, s"v$version", "_deletes"))

  /** ATOMIC merge-on-read UPSERT (MERGE INTO): publish ONE version that
    * is the base MINUS the batch's keys PLUS the batch's rows — the
    * tombstone set (`_deletes/`, the batch's distinct `keyCols`), the
    * batch's data files, and the `_append` chain marker all land in one
    * staged directory and publish through one claim-rename + one
    * pointer flip. A reader at ANY version therefore sees either the
    * pre-merge or the post-merge state; the deletes-applied/batch-
    * missing intermediate that a commitDeletes-then-commitAppend
    * sequence exposes (a crash between the two publishes a table with
    * matched keys erased and their replacements absent — reader-visible
    * data loss) is unrepresentable by construction. Cost is
    * batch-proportional: tombstone keys + batch rows, never a rewrite —
    * the MERGE a 100 TB table can afford per micro-batch.
    *
    * [[readAt]] resolves the generation as
    * `(base ∖ tombstone-keys) ∪ batch`; the anti-join applies BEFORE
    * this generation's own files union in, so the batch replaces, never
    * deletes, itself. `expectedVersion` is MANDATORY (a merge is always
    * a read-modify-write); the batch must carry exactly the base
    * schema (a merge is not an evolution vehicle — widen with
    * [[commitAppend]] first). Layout params sidecar ONLY the batch's
    * files, like any append generation.
    *
    * `crashBeforePublish` is deterministic fault injection for the
    * atomicity gate: it raises [[InjectedCrash]] AFTER everything is
    * staged and BEFORE the claim-rename — the staged directory stays
    * behind as ordinary crash debris ([[expire]]'s gcStaged sweeps it)
    * and no reader observes anything.
    */
  /** `recordChainStats = true` additionally records the tombstone-side
    * metadata that keeps chain-level stats answerable THROUGH this
    * merge ([[chainStats]]): the batch's distinct key count, per-key-
    * column min/max, the batch row count, and — the expensive one —
    * the EXACT number of base-chain rows the tombstones remove
    * (one bounded semi-join of the base read against the batch's
    * keys). That extra pass over the base is why recording is a
    * per-commit POLICY, not a default: a hot CDC path that never
    * answers from metadata should not pay it, and an unrecorded
    * upsert makes [[chainStats]] fail loudly rather than guess.
    */
  def commitUpsert(batch: DataFrame, keyCols: Seq[String], dir: String,
      expectedVersion: Long,
      partitionCols: Seq[String] = Nil, statsCols: Seq[String] = Nil,
      bloomCols: Seq[String] = Nil,
      bloomExpectedItems: Long = DefaultBloomExpectedItems,
      meta: Map[String, String] = Map.empty,
      crashBeforePublish: Boolean = false,
      recordChainStats: Boolean = false): Long = {
    require(expectedVersion >= 1,
      s"commitUpsert needs a committed base version, got v$expectedVersion")
    require(keyCols.nonEmpty, "commitUpsert needs at least one key column")
    val missing = keyCols.filterNot(batch.columns.contains)
    require(missing.isEmpty,
      s"upsert key column(s) ${missing.mkString(", ")} not in the batch " +
        s"(${batch.columns.mkString(", ")})")
    val baseCols = chainFieldNames(batch.sparkSession, dir,
      expectedVersion).toSet
    require(batch.columns.toSet == baseCols,
      s"upsert batch schema must match the base read: batch has " +
        s"${(batch.columns.toSet -- baseCols).mkString(", ")} extra / " +
        s"${(baseCols -- batch.columns.toSet).mkString(", ")} missing vs " +
        s"$dir v$expectedVersion")
    checkExpected(dir, Some(expectedVersion), detail = "")
    val statsMeta: Map[String, String] = if (!recordChainStats) Map.empty else {
      val spark = batch.sparkSession
      val keysDf = batch.select(keyCols.map(col): _*).distinct()
      val enc = (s: String) => java.net.URLEncoder.encode(s,
        java.nio.charset.StandardCharsets.UTF_8)
      // ONE aggregation job for batch rows + distinct keys + key bounds
      // (group by key, then fold the groups): the previous
      // keysDf.agg + batch.count() pair was two scans of the batch for
      // numbers one pass produces — min/max over the groups equal
      // min/max over the rows, sum of group sizes is the row count,
      // and group count (null groups included, unlike countDistinct)
      // is the distinct-key count
      val krow = batch.groupBy(keyCols.map(col): _*)
        .agg(count(lit(1)).as("_grp_rows"))
        .agg(count(lit(1)).as("nk"),
          sum(col("_grp_rows")).as("nr") +:
            keyCols.flatMap(c =>
              Seq(min(col(c)).as(s"mn_$c"), max(col(c)).as(s"mx_$c"))): _*)
        .head()
      val matched = readAt(spark, dir, expectedVersion)
        .join(keysDf, keyCols, "left_semi").count()
      Map(
        "upsert_rows" -> krow.getAs[Long]("nr").toString,
        "upsert_matched" -> matched.toString,
        "upsert_tombstones" -> krow.getAs[Long]("nk").toString) ++
        keyCols.map { c =>
          val typ = statsTag(batch.schema(c).dataType)
          val mn = Option(krow.getAs[Any](s"mn_$c")).map(v => enc(v.toString))
          val mx = Option(krow.getAs[Any](s"mx_$c")).map(v => enc(v.toString))
          s"upsert_stats.$c" ->
            s"$typ,${mn.getOrElse("")},${mx.getOrElse("")}"
        }
    }
    val staged = stageData(batch, dir, partitionCols, statsCols, bloomCols,
      bloomExpectedItems, meta ++ statsMeta)
    // tombstones + chain marker LAST (stageData's sidecar builders
    // re-read the staged dir and must see only the batch's data files;
    // underscore prefixes keep both invisible to data readers)
    batch.select(keyCols.map(col): _*).distinct()
      .write.mode("errorifexists").parquet(staged.resolve("_deletes").toString)
    java.nio.file.Files.writeString(staged.resolve("_append"),
      s"v$expectedVersion")
    // the ancestor fold continues THROUGH a merge (chainStats' O(1)-
    // scan shape); this generation's own tombstone record joins the
    // fold when the NEXT commit composes it from the meta above
    writeChainManifestFold(staged, dir, expectedVersion)
    if (crashBeforePublish)
      throw new InjectedCrash(
        s"injected crash: upsert fully staged at $staged, nothing published")
    publishStaged(dir, staged, Some(expectedVersion))
  }

  // ------------------------------------------------------------- reads

  /** Read the current snapshot (the version `current` named at call
    * time — later commits do not move this frame's data underneath it).
    */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val v = currentVersion(dir).getOrElse(
      throw new IllegalStateException(s"no committed snapshot under $dir"))
    readAt(spark, dir, v)
  }

  /** Time travel: read an exact retained version. A merge-on-read
    * delete version resolves its `_base` chain (data of the base,
    * anti-joined with every accumulated tombstone set along the way);
    * an append version resolves its `_append` chain (base generation ∪
    * this version's own delta files, unioned BY NAME so each
    * generation's hive layout is free to differ). Chains stay short in
    * practice because any full-rewrite commit (compaction) cuts them.
    * A filter over the chain read pushes into EVERY generation's scan
    * branch, so partition pruning applies per generation's own layout.
    */
  def readAt(spark: SparkSession, dir: String, version: Long): DataFrame = {
    // visibility gate, not just existence: on the rename-less profile a
    // dead writer's half-copied v<N> directory is PRESENT on the store
    // — reading it would silently return partial data. One metadata
    // probe per chain generation, noise against the scan it fronts.
    require(io(dir).versionVisible(tablePath(dir), version),
      s"no complete version v$version under $dir")
    baseOf(dir, version) match {
      case Some(b) =>
        val dels = spark.read.parquet(s"$dir/v$version/_deletes")
        readAt(spark, dir, b).join(dels, dels.columns.toSeq, "left_anti")
      case None => appendBaseOf(dir, version) match {
        case None => spark.read.parquet(s"$dir/v$version")
        case Some(b) =>
          // an UPSERT generation carries tombstones against its base:
          // anti-join them BEFORE this generation's own files union in,
          // so the batch replaces (never deletes) itself — the
          // single-commit MERGE read shape
          val base0 = readAt(spark, dir, b)
          val base =
            if (isUpsert(dir, version)) {
              val dels = spark.read.parquet(s"$dir/v$version/_deletes")
              base0.join(dels, dels.columns.toSeq, "left_anti")
            } else base0
          // allowMissingColumns: an evolved append generation's new
          // columns surface as NULL on older generations' rows (and
          // vice versa) — commit-time checks already guarded against
          // ACCIDENTAL drift, so by read time a difference is a
          // deliberate evolution
          base.unionByName(spark.read.parquet(s"$dir/v$version"),
            allowMissingColumns = true)
      }
    }
  }

  /** Time travel CONFORMED to the live schema — the reader half of
    * schema evolution. Versions are immutable, so a commit that widens
    * the schema leaves old versions narrow on disk forever; this read
    * presents any retained version under the CURRENT version's schema:
    * columns the old version lacks surface as NULL (by NAME, never a
    * positional bind — the schema_drift_union discipline), columns are
    * UPCAST to the current type, and columns the current schema dropped
    * are omitted. With this, `readAtConformed(v) unionByName
    * readAtConformed(w)` is well-typed for any two retained versions —
    * the exact contract a multi-generation 100 TB table needs.
    *
    * Only LOSSLESS widenings conform (Catalyst's `Cast.canUpCast`:
    * int→long, float→double, int→decimal(wide), …). An incompatible
    * evolution — string→double, long→int — throws loudly here instead
    * of silently nulling unparseable values, which would present data
    * LOSS as conformance; that case needs an explicit migration
    * rewrite, exactly as reference table formats require.
    */
  def readAtConformed(spark: SparkSession, dir: String, version: Long): DataFrame = {
    val target = read(spark, dir).schema
    val df = readAt(spark, dir, version)
    val have = df.schema.fields.map(f => f.name -> f.dataType).toMap
    df.select(target.fields.toSeq.map { f =>
      have.get(f.name) match {
        case None => lit(null).cast(f.dataType).as(f.name)
        case Some(from) =>
          if (from != f.dataType &&
              !org.apache.spark.sql.catalyst.expressions.Cast
                .canUpCast(from, f.dataType))
            throw new IllegalStateException(
              s"lossy schema evolution on '${f.name}': v$version has " +
                s"${from.simpleString}, live schema wants " +
                s"${f.dataType.simpleString} — not an upcast; rewrite " +
                "the old generation explicitly instead of nulling data")
          col(f.name).cast(f.dataType).as(f.name)
      }
    }: _*)
  }

  // ------------------------------------------- per-file stats / skipping

  /** One (file, column) stats line from a version's `_stats.tsv`:
    * everything [[readWhere]] needs to decide whether a file can
    * contain a row matching a range predicate. `min`/`max` are None
    * for an all-null file. Values are kept in their exact string form
    * and compared under `typ` ("long" | "double" | "decimal" |
    * "string"; dates ride as ISO strings, whose lexicographic order is
    * chronological).
    */
  final case class ColStats(file: String, rowCount: Long, col: String,
      typ: String, min: Option[String], max: Option[String], nulls: Long)

  private def statsTag(dt: org.apache.spark.sql.types.DataType): String = {
    import org.apache.spark.sql.types._
    dt match {
      case ByteType | ShortType | IntegerType | LongType => "long"
      case FloatType | DoubleType => "double"
      case _: DecimalType => "decimal"
      case StringType => "string"
      case DateType => "string" // ISO yyyy-MM-dd: lexicographic = chronological
      case other => throw new IllegalArgumentException(
        s"statsCols: unsupported type ${other.simpleString} — supported: " +
          "integral, float/double, decimal, string, date")
    }
  }

  private def cmpStat(typ: String, a: String, b: String): Int = typ match {
    case "long" => java.lang.Long.compare(a.toLong, b.toLong)
    case "double" => java.lang.Double.compare(a.toDouble, b.toDouble)
    case "decimal" => new java.math.BigDecimal(a).compareTo(new java.math.BigDecimal(b))
    case _ => a.compareTo(b)
  }

  /** Gather per-file min/max/nullCount for `statsCols` over the staged
    * write and persist them as `_stats.tsv` inside it (so the sidecar
    * is covered by the same atomic claim-rename as the data).
    *
    * Fast path (r20): the values come from the PARQUET FOOTERS of the
    * files the write just produced — row counts, null counts and
    * min/max ride in every column chunk's statistics, so the sidecar
    * costs file-count-bounded driver I/O and ZERO Spark jobs (the move
    * every real format makes: Iceberg collects its manifest metrics
    * from the writer's footers). The footer path restricts itself to
    * the types whose footer ordering provably matches the old
    * aggregate's (`min(col).cast("string")`) semantics — integral
    * (signed comparator = Spark's), string (parquet's unsigned-byte
    * comparator = UTF8String ordering), date (day ordinal, rendered
    * ISO like the cast) — and DEMOTES to the original one-job grouped
    * scan for anything else: fractional/decimal columns (NaN / -0.0
    * footer-vs-aggregate divergence), partition columns (absent from
    * data files), or a footer with dropped statistics (parquet omits
    * binary min/max past 4 KB). Either path feeds the same sink, so
    * the sidecar bytes are identical — `StatsFooterParitySpec` pins
    * that equivalence.
    */
  private def writeStatsSidecar(spark: SparkSession,
      staged: java.nio.file.Path, statsCols: Seq[String]): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val rows = statsRowsByFooter(conf, staged, statsCols)
      .getOrElse(statsRowsByScan(spark, staged, statsCols))
      .sortBy(r => (r.file, r.column))
    val enc = (s: String) =>
      java.net.URLEncoder.encode(s, java.nio.charset.StandardCharsets.UTF_8)
    val lines = rows.map { r =>
      Seq(enc(r.file), r.rowCount.toString, enc(r.column), r.tag,
        r.minStr.map(enc).getOrElse(""), r.maxStr.map(enc).getOrElse(""),
        r.nullCount.toString).mkString("\t")
    }
    java.nio.file.Files.writeString(staged.resolve("_stats.tsv"),
      lines.sorted.mkString("", "\n", "\n"))
    // the same stats AS A TABLE (`_manifest/`, parquet, covered by the
    // atomic claim-rename like everything else in the staging dir): the
    // metadata tree every real format keeps queryable (Iceberg's
    // table.files, Delta's log). At 10^5 files a pruning decision is a
    // DataFrame filter over this, not a driver readAllLines loop; the
    // TSV stays as the human-readable compatibility sidecar. The rows
    // are already ON the driver (file-count-bounded), so the tiny
    // parquet is written directly — a Spark job per commit just to
    // persist a handful of metadata rows was pure scheduler overhead.
    writeManifestParquet(conf, staged.resolve("_manifest"), rows)
  }

  /** One per-(file, column) stats record — the unit both stats builders
    * produce and both sidecar forms (`_stats.tsv`, `_manifest/`) are
    * rendered from. `minStr`/`maxStr` are the exact strings the old
    * aggregate produced (`min(col).cast("string")`), None for an
    * all-null file.
    */
  private[graft] final case class FileColStats(file: String, rowCount: Long,
      column: String, tag: String, minStr: Option[String],
      maxStr: Option[String], nullCount: Long)

  /** The original stats builder: one grouped scan of the staged files
    * keyed by `input_file_name()`, collect one row per data file. The
    * fallback for what footers cannot answer byte-identically —
    * partition columns, fractional/decimal types, dropped footer stats.
    */
  private[graft] def statsRowsByScan(spark: SparkSession,
      staged: java.nio.file.Path, statsCols: Seq[String]): Seq[FileColStats] = {
    val sdf = spark.read.parquet(staged.toString)
    val types = sdf.schema.fields.map(f => f.name -> f.dataType).toMap
    statsCols.foreach(c => require(types.contains(c),
      s"statsCols: no column '$c' in committed schema " +
        s"(${sdf.columns.mkString(", ")})"))
    val tags = statsCols.map(c => c -> statsTag(types(c))).toMap
    val aggs = statsCols.flatMap { c =>
      Seq(min(col(c)).cast("string").as(s"min_$c"),
        max(col(c)).cast("string").as(s"max_$c"),
        sum(col(c).isNull.cast("long")).as(s"nulls_$c"))
    }
    val rows = sdf
      .groupBy(input_file_name().as("_f"))
      .agg(count(lit(1)).as("_rc"), aggs: _*)
      .collect()
    val marker = staged.getFileName.toString + "/"
    rows.toSeq.flatMap { r =>
      val full = r.getString(r.fieldIndex("_f"))
      val i = full.indexOf(marker)
      require(i >= 0, s"stats scan returned a file outside the staging dir: $full")
      val rel = full.substring(i + marker.length)
      val rc = r.getLong(r.fieldIndex("_rc"))
      statsCols.map { c =>
        FileColStats(rel, rc, c, tags(c),
          Option(r.getString(r.fieldIndex(s"min_$c"))),
          Option(r.getString(r.fieldIndex(s"max_$c"))),
          r.getLong(r.fieldIndex(s"nulls_$c")))
      }
    }
  }

  /** Footer-based stats builder: reads each staged data file's parquet
    * footer on the driver and renders the SAME records the grouped scan
    * would. Returns None — "demote to the scan" — whenever equivalence
    * cannot be proven from the footer alone: a stats column missing
    * from the data-file schema (partition column or typo: the scan path
    * resolves which, loudly), a non-integral/string/date physical type,
    * a chunk whose statistics were dropped or lack a null count, or a
    * row group that recorded no values for a non-empty chunk. False
    * negatives here cost one extra Spark job; false positives would
    * corrupt pruning — so every branch defaults to None.
    */
  private[graft] def statsRowsByFooter(
      conf: org.apache.hadoop.conf.Configuration,
      staged: java.nio.file.Path,
      statsCols: Seq[String]): Option[Seq[FileColStats]] = {
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
    import org.apache.parquet.schema.LogicalTypeAnnotation
    import scala.jdk.CollectionConverters._
    val dataFiles = {
      val out = scala.collection.mutable.ArrayBuffer.empty[java.nio.file.Path]
      val stream = java.nio.file.Files.walk(staged)
      try stream.forEach { p =>
        val n = p.getFileName.toString
        if (!n.startsWith("_") && !n.startsWith(".") &&
            n.endsWith(".parquet") && java.nio.file.Files.isRegularFile(p))
          out += p
      } finally stream.close()
      out.sortBy(_.toString).toSeq
    }
    if (dataFiles.isEmpty) return None
    // internal value kind per column ("long" | "date" | "string"),
    // fixed by the FIRST file's schema and required identical in every
    // later file; the written tag folds date into "string" (ISO render)
    // exactly like statsTag does
    var kinds: Map[String, String] = null
    val out = Seq.newBuilder[FileColStats]
    for (f <- dataFiles) {
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(f.toUri), conf)
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      val footer = try reader.getFooter finally reader.close()
      val schema = footer.getFileMetaData.getSchema
      val fileKinds = statsCols.map { c =>
        if (!schema.containsField(c)) return None
        val t = schema.getType(schema.getFieldIndex(c))
        if (!t.isPrimitive) return None
        val p = t.asPrimitiveType()
        val kind = (p.getPrimitiveTypeName,
            Option(p.getLogicalTypeAnnotation)) match {
          case (PrimitiveTypeName.INT64, None) => "long"
          case (PrimitiveTypeName.INT64,
              Some(i: LogicalTypeAnnotation.IntLogicalTypeAnnotation))
              if i.isSigned => "long"
          case (PrimitiveTypeName.INT32, None) => "long"
          case (PrimitiveTypeName.INT32,
              Some(i: LogicalTypeAnnotation.IntLogicalTypeAnnotation))
              if i.isSigned => "long"
          case (PrimitiveTypeName.INT32,
              Some(_: LogicalTypeAnnotation.DateLogicalTypeAnnotation)) =>
            "date"
          case (PrimitiveTypeName.BINARY,
              Some(_: LogicalTypeAnnotation.StringLogicalTypeAnnotation)) =>
            "string"
          case _ => return None
        }
        c -> kind
      }.toMap
      if (kinds == null) kinds = fileKinds
      else if (kinds != fileKinds) return None
      val blocks = footer.getBlocks.asScala.toSeq
      val rowCount = blocks.map(_.getRowCount).sum
      // a 0-row file contributes no rows to the grouped scan either
      if (rowCount > 0) {
        val rel = staged.relativize(f).toString
        for (c <- statsCols) {
          val chunks = blocks.map { b =>
            b.getColumns.asScala.find(_.getPath.toDotString == c)
              .getOrElse(return None)
          }
          val stats = chunks.map { ch =>
            val st = ch.getStatistics
            if (st == null || !st.isNumNullsSet) return None
            // a chunk with values but no recorded min/max (e.g. parquet
            // drops binary stats past 4 KB) cannot prove equivalence
            if (!st.hasNonNullValue && st.getNumNulls != ch.getValueCount)
              return None
            st
          }
          val nulls = stats.map(_.getNumNulls).sum
          val withVals = stats.filter(_.hasNonNullValue)
          val (minStr, maxStr): (Option[String], Option[String]) =
            if (withVals.isEmpty) (None, None)
            else kinds(c) match {
              case "long" =>
                val mins = withVals.map(_.genericGetMin.asInstanceOf[Number].longValue)
                val maxs = withVals.map(_.genericGetMax.asInstanceOf[Number].longValue)
                (Some(mins.min.toString), Some(maxs.max.toString))
              case "date" =>
                val mins = withVals.map(_.genericGetMin.asInstanceOf[Number].intValue)
                val maxs = withVals.map(_.genericGetMax.asInstanceOf[Number].intValue)
                (Some(java.time.LocalDate.ofEpochDay(mins.min.toLong).toString),
                  Some(java.time.LocalDate.ofEpochDay(maxs.max.toLong).toString))
              case _ =>
                val mins = withVals.map(_.genericGetMin
                  .asInstanceOf[org.apache.parquet.io.api.Binary].getBytes)
                val maxs = withVals.map(_.genericGetMax
                  .asInstanceOf[org.apache.parquet.io.api.Binary].getBytes)
                val mn = mins.reduce((a, b) =>
                  if (java.util.Arrays.compareUnsigned(a, b) <= 0) a else b)
                val mx = maxs.reduce((a, b) =>
                  if (java.util.Arrays.compareUnsigned(a, b) >= 0) a else b)
                (Some(new String(mn, java.nio.charset.StandardCharsets.UTF_8)),
                  Some(new String(mx, java.nio.charset.StandardCharsets.UTF_8)))
            }
          val tag = if (kinds(c) == "date") "string" else kinds(c)
          out += FileColStats(rel, rowCount, c, tag, minStr, maxStr, nulls)
        }
      }
    }
    Some(out.result())
  }

  /** Write the `_manifest/` parquet from driver-resident stats rows —
    * no Spark job; the schema (names, physical types, nullability)
    * matches what the old `toDF(...).write.parquet` produced, so every
    * existing reader (manifest(), chainStats, the DSv2 relation) sees
    * identical bytes-on-read.
    */
  private def writeManifestParquet(
      conf: org.apache.hadoop.conf.Configuration,
      dest: java.nio.file.Path, rows: Seq[FileColStats]): Unit = {
    import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    val schema = Types.buildMessage()
      .optional(BINARY).as(LogicalTypeAnnotation.stringType()).named("file")
      .required(INT64).named("row_count")
      .optional(BINARY).as(LogicalTypeAnnotation.stringType()).named("column")
      .optional(BINARY).as(LogicalTypeAnnotation.stringType()).named("col_type")
      .optional(BINARY).as(LogicalTypeAnnotation.stringType()).named("min_str")
      .optional(BINARY).as(LogicalTypeAnnotation.stringType()).named("max_str")
      .optional(DOUBLE).named("min_num")
      .optional(DOUBLE).named("max_num")
      .required(INT64).named("null_count")
      .named("spark_schema")
    val num = (tag: String, v: Option[String]) => tag match {
      case "long" | "double" | "decimal" => v.map(_.toDouble)
      case _ => None
    }
    writeDriverParquet(conf, dest, schema) { (factory, write) =>
      rows.foreach { r =>
        val g = factory.newGroup()
        g.add("file", r.file)
        g.add("row_count", r.rowCount)
        g.add("column", r.column)
        g.add("col_type", r.tag)
        r.minStr.foreach(v => g.add("min_str", v))
        r.maxStr.foreach(v => g.add("max_str", v))
        num(r.tag, r.minStr).foreach(v => g.add("min_num", v))
        num(r.tag, r.maxStr).foreach(v => g.add("max_num", v))
        g.add("null_count", r.nullCount)
        write(g)
      }
    }
  }

  /** Shared driver-side tiny-parquet writer for metadata tables that
    * ride inside a staging directory (`_manifest/`, `_bloomtab/`): the
    * rows are already file-count-bounded driver data, so persisting
    * them through a Spark job was a fixed ~0.1 s of scheduler overhead
    * per commit — at a streaming table's 10^3-commit life, real money
    * for zero work.
    */
  private def writeDriverParquet(
      conf: org.apache.hadoop.conf.Configuration,
      dest: java.nio.file.Path,
      schema: org.apache.parquet.schema.MessageType)(
      body: (org.apache.parquet.example.data.simple.SimpleGroupFactory,
        org.apache.parquet.example.data.Group => Unit) => Unit): Unit = {
    require(!java.nio.file.Files.exists(dest),
      s"refusing to overwrite existing metadata table at $dest")
    java.nio.file.Files.createDirectories(dest)
    val part = dest.resolve(
      s"part-00000-${java.util.UUID.randomUUID().toString.take(12)}.snappy.parquet")
    val writer = org.apache.parquet.hadoop.example.ExampleParquetWriter
      .builder(org.apache.parquet.hadoop.util.HadoopOutputFile.fromPath(
        new org.apache.hadoop.fs.Path(part.toUri), conf))
      .withConf(conf)
      .withType(schema)
      .withCompressionCodec(
        org.apache.parquet.hadoop.metadata.CompressionCodecName.SNAPPY)
      .build()
    try body(
      new org.apache.parquet.example.data.simple.SimpleGroupFactory(schema),
      writer.write)
    finally writer.close()
  }

  /** Parse a version's `_stats.tsv` (empty when the commit didn't ask
    * for stats).
    */
  def readStats(dir: String, version: Long): Seq[ColStats] = {
    val p = java.nio.file.Paths.get(dir, s"v$version", "_stats.tsv")
    if (!java.nio.file.Files.exists(p)) Seq.empty
    else {
      val dec = (s: String) =>
        java.net.URLDecoder.decode(s, java.nio.charset.StandardCharsets.UTF_8)
      java.nio.file.Files.readAllLines(p).toArray(Array.empty[String])
        .toSeq.filter(_.nonEmpty).map { line =>
          val f = line.split("\t", -1)
          require(f.length == 7, s"corrupt _stats.tsv line in $p: '$line'")
          ColStats(dec(f(0)), f(1).toLong, dec(f(2)), f(3),
            Option(f(4)).filter(_.nonEmpty).map(dec),
            Option(f(5)).filter(_.nonEmpty).map(dec), f(6).toLong)
        }
    }
  }

  // --------------------------------------- per-file bloom / point skip

  /** Default per-file capacity a bloom sidecar is sized for. At 1% fpp
    * this is ~150 KB of bits per (file, column) — the same order as
    * Parquet's own column bloom filters, and the same contract: the
    * CALLER sizes it to the write's rows-per-file (Parquet's
    * `bloom_filter_expected_ndv`), because a filter sized far below
    * the real distinct count saturates and silently stops pruning
    * (correctness is unaffected — a saturated filter answers
    * "might contain" for everything).
    */
  val DefaultBloomExpectedItems: Long = 1L << 17

  /** Canonical bytes a value contributes to / is probed against a
    * bloom sidecar: the value's Spark `CAST(v AS STRING)` form, UTF-8.
    * One canonical form on both the build and probe side is what makes
    * the filter's no-false-negative guarantee hold for every supported
    * column type (integral, string, date).
    */
  private def bloomKeyBytes(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  /** The bloom type gate: integral, string, date ONLY — strictly
    * narrower than the stats gate. Fractional numerics are excluded
    * because the build side inserts Spark's `CAST(col AS STRING)` form
    * (double 5.0 → "5.0", decimal(10,2) 5 → "5.00") while a probe key
    * canonicalizes through `String.valueOf` (5L → "5"); a form mismatch
    * makes the filter answer "definitely not here" for present rows —
    * SILENT FALSE NEGATIVES, the one failure a bloom must never have.
    * For the admitted types the two forms coincide (Long/Int/String
    * round-trip identically; DateType casts to ISO yyyy-MM-dd, the same
    * form java.sql.Date/LocalDate.toString produce).
    */
  private def bloomTag(dt: org.apache.spark.sql.types.DataType): String = {
    import org.apache.spark.sql.types._
    dt match {
      case ByteType | ShortType | IntegerType | LongType | StringType |
          DateType => statsTag(dt)
      case other => throw new IllegalArgumentException(
        s"bloomCols: unsupported type ${other.simpleString} — supported: " +
          "integral, string, date (fractional numerics would canonicalize " +
          "differently on the build and probe sides and silently produce " +
          "false negatives)")
    }
  }

  /** Build per-file bloom filters for `bloomCols` over the staged write
    * and persist them as `_bloom.tsv` (file TAB column TAB base64 bits,
    * covered by the same atomic claim-rename as the data). One grouped
    * aggregation keyed by `input_file_name()` with a typed Aggregator
    * whose buffer is Spark's own mergeable
    * [[org.apache.spark.util.sketch.BloomFilter]] — map-side partials
    * OR together, so the pass is one column-pruned scan of the fresh
    * files and the collect is one row per (file, column): the same
    * driver-bounded manifest scale as `_stats.tsv`.
    *
    * Null handling matches the stats sidecar's spirit: nulls are NOT
    * inserted, and the point-lookup reader ([[pruneFilesBloom]]) prunes
    * on equality semantics where NULL never matches.
    */
  private def writeBloomSidecar(spark: SparkSession,
      staged: java.nio.file.Path, bloomCols: Seq[String],
      expectedItems: Long): Unit = {
    require(expectedItems > 0, s"bloomExpectedItems must be > 0, got $expectedItems")
    val sdf = spark.read.parquet(staged.toString)
    bloomCols.foreach { c =>
      require(sdf.columns.contains(c),
        s"bloomCols: no column '$c' in committed schema (${sdf.columns.mkString(", ")})")
      // the bloom gate is NARROWER than the stats gate: fractional
      // numerics are rejected (build/probe canonical-form divergence
      // would mean silent false negatives — see bloomTag)
      bloomTag(sdf.schema(c).dataType)
    }
    val agg = new org.apache.spark.sql.expressions.Aggregator[
        String, org.apache.spark.util.sketch.BloomFilter, Array[Byte]] {
      def zero = org.apache.spark.util.sketch.BloomFilter.create(expectedItems, 0.01)
      def reduce(b: org.apache.spark.util.sketch.BloomFilter, v: String) = {
        if (v != null) b.putBinary(bloomKeyBytes(v))
        b
      }
      def merge(a: org.apache.spark.util.sketch.BloomFilter,
          b: org.apache.spark.util.sketch.BloomFilter) = { a.mergeInPlace(b); a }
      def finish(b: org.apache.spark.util.sketch.BloomFilter) = {
        val out = new java.io.ByteArrayOutputStream()
        b.writeTo(out)
        out.toByteArray
      }
      def bufferEncoder =
        org.apache.spark.sql.Encoders.kryo[org.apache.spark.util.sketch.BloomFilter]
      def outputEncoder = org.apache.spark.sql.Encoders.BINARY
    }
    val bloomUdaf = org.apache.spark.sql.functions.udaf(
      agg, org.apache.spark.sql.Encoders.STRING)
    val aggs = bloomCols.map(c => bloomUdaf(col(c).cast("string")).as(s"bf_$c"))
    val rows = sdf
      .groupBy(input_file_name().as("_f"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
    val marker = staged.getFileName.toString + "/"
    val enc = (s: String) =>
      java.net.URLEncoder.encode(s, java.nio.charset.StandardCharsets.UTF_8)
    val b64 = java.util.Base64.getEncoder
    val lines = rows.flatMap { r =>
      val full = r.getString(r.fieldIndex("_f"))
      val i = full.indexOf(marker)
      require(i >= 0, s"bloom scan returned a file outside the staging dir: $full")
      val rel = full.substring(i + marker.length)
      bloomCols.map { c =>
        val bits = r.getAs[Array[Byte]](r.fieldIndex(s"bf_$c"))
        Seq(enc(rel), enc(c), b64.encodeToString(bits)).mkString("\t")
      }
    }
    java.nio.file.Files.writeString(staged.resolve("_bloom.tsv"),
      lines.sorted.mkString("", "\n", "\n"))
    // the same filters AS A TABLE (`_bloomtab/`, parquet, covered by
    // the atomic claim-rename): at 10^5 files × ~150 KB of bits each,
    // a driver-side TSV parse of every filter is gigabytes of heap —
    // the probe must DISTRIBUTE (each task deserializes its rows'
    // filters, tests the keys, emits survivors only), which
    // [[pruneFilesBloom]]'s spark overload does. The TSV stays as the
    // human-readable compatibility sidecar. The rows are already ON
    // the driver, so the tiny parquet is written directly (same
    // no-Spark-job reasoning as the `_manifest` write).
    val btSchema = {
      import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
      import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
      Types.buildMessage()
        .optional(BINARY).as(LogicalTypeAnnotation.stringType()).named("file")
        .optional(BINARY).as(LogicalTypeAnnotation.stringType()).named("column")
        .optional(BINARY).named("bits")
        .named("spark_schema")
    }
    writeDriverParquet(spark.sparkContext.hadoopConfiguration,
      staged.resolve("_bloomtab"), btSchema) { (factory, write) =>
      rows.foreach { r =>
        val full = r.getString(r.fieldIndex("_f"))
        val rel = full.substring(full.indexOf(marker) + marker.length)
        bloomCols.foreach { c =>
          val g = factory.newGroup()
          g.add("file", rel)
          g.add("column", c)
          g.add("bits", org.apache.parquet.io.api.Binary.fromConstantByteArray(
            r.getAs[Array[Byte]](r.fieldIndex(s"bf_$c"))))
          write(g)
        }
      }
    }
  }

  /** Parse a version's `_bloom.tsv` into (file, column, filter) rows
    * (empty when the commit didn't ask for blooms).
    */
  def readBloom(dir: String, version: Long):
      Seq[(String, String, org.apache.spark.util.sketch.BloomFilter)] = {
    val p = java.nio.file.Paths.get(dir, s"v$version", "_bloom.tsv")
    if (!java.nio.file.Files.exists(p)) Seq.empty
    else {
      val dec = (s: String) =>
        java.net.URLDecoder.decode(s, java.nio.charset.StandardCharsets.UTF_8)
      val b64 = java.util.Base64.getDecoder
      java.nio.file.Files.readAllLines(p).toArray(Array.empty[String])
        .toSeq.filter(_.nonEmpty).map { line =>
          val f = line.split("\t", -1)
          require(f.length == 3, s"corrupt _bloom.tsv line in $p: '$line'")
          val bf = org.apache.spark.util.sketch.BloomFilter.readFrom(
            new java.io.ByteArrayInputStream(b64.decode(f(2))))
          (dec(f(0)), dec(f(1)), bf)
        }
    }
  }

  /** The version's stats sidecar as a queryable MANIFEST DataFrame —
    * Iceberg's `table.files` / Delta's transaction-log stats, the
    * metadata side of the table surfaced to SQL: one row per (file,
    * column) with rowCount/min/max/nullCount. The point at 100 TB is
    * METADATA-ONLY ANSWERING: count(*), per-column min/max, and null
    * counts fold over this file-count-bounded frame in milliseconds
    * with ZERO data files opened — min/max come back typed through the
    * sidecar's own type tags, so `min(mins)` is numeric where the
    * column was numeric, not lexicographic.
    *
    * Since r18 the manifest is itself a parquet TABLE committed inside
    * the version directory (`_manifest/`, written by the same staging
    * pass as `_stats.tsv` and covered by the same atomic rename), so a
    * 10⁵-file version's manifest is a distributed scan and a pruning
    * decision is a DataFrame filter — no driver loop anywhere on the
    * metadata path. Versions committed before the table existed fall
    * back to parsing the TSV into a local relation (same schema).
    * Loud error on a stats-less version (a caller answering from
    * metadata must know when there is none), on a merge-on-read delete
    * commit (tombstones invalidate counts; compact first), and on an
    * append commit (this manifest covers ONE generation's files; read
    * each generation's own manifest).
    */
  def manifest(spark: SparkSession, dir: String, version: Long): DataFrame = {
    require(baseOf(dir, version).isEmpty,
      s"manifest targets data versions; v$version of $dir is a merge-on-" +
        "read delete commit whose tombstones invalidate file stats — " +
        "compact first or read its base")
    require(appendBaseOf(dir, version).isEmpty,
      s"manifest covers one generation's files; v$version of $dir is an " +
        "append commit — use manifestChain to compose the generations")
    manifestOwn(spark, dir, version)
  }

  /** The composed metadata tree of an APPEND CHAIN — every
    * generation's own manifest, unioned with a `generation` column
    * naming the version that committed each file: the cross-generation
    * answer [[manifest]] refuses to fake from one generation's
    * sidecar. With it, count(*)/min/max over a table that took a year
    * of ingest batches is STILL a metadata-only fold (sum of per-file
    * row counts across generations — appends never double-count by
    * construction, a file belongs to exactly one generation). Loud on
    * any merge-on-read delete commit in the chain (tombstones
    * invalidate counts; compact first) and on any stats-less
    * generation, same contract as [[manifest]].
    */
  def manifestChain(spark: SparkSession, dir: String, version: Long): DataFrame = {
    require(baseOf(dir, version).isEmpty,
      s"manifestChain: v$version of $dir is a merge-on-read delete " +
        "commit whose tombstones invalidate file stats — compact first")
    require(!isUpsert(dir, version),
      s"manifestChain: v$version of $dir is an upsert commit whose " +
        "tombstones invalidate ancestor file stats — compact first")
    // ancestors too: a RECORDED upsert now folds (for chainStats), so
    // the fold's presence no longer implies a tombstone-free chain —
    // walk the chain markers (O(depth) file stats, zero Spark jobs)
    // and stay loud where the recursion used to be
    var g = version
    while (appendBaseOf(dir, g).isDefined) {
      g = appendBaseOf(dir, g).get
      require(!isUpsert(dir, g),
        s"manifestChain: ancestor v$g of $dir is an upsert commit whose " +
          "tombstones invalidate per-file stats — use chainStats (exact " +
          "count, disclosed-conservative min/max) or compact first")
    }
    val own = manifestOwn(spark, dir, version)
      .withColumn("generation", lit(version))
    appendBaseOf(dir, version) match {
      case None => own
      case Some(b) =>
        // prefer the FOLDED ancestor manifest this generation committed
        // (`_manifest_chain.tsv`, written by commitAppend/commitRebase):
        // the whole chain answers from TWO scans — this version's fold
        // + this version's own manifest — however many generations deep
        // the ingest ran. A 10³-commit streaming table would otherwise
        // pay 10³ recursive reads per pruning decision. Generations
        // without a fold (pre-fold commits, stats-less ancestors) fall
        // back to the recursive walk.
        val folded = foldPath(dir, version)
        if (java.nio.file.Files.exists(folded))
          foldedManifest(spark, folded).unionByName(own)
        else manifestChain(spark, dir, b).unionByName(own)
    }
  }

  /** The fold lives INSIDE an underscore directory so version-dir data
    * scans never see it, but its leaf file carries a plain name — a
    * Spark file source hides underscore-prefixed FILES even when
    * addressed explicitly, so `_manifest_chain.tsv` would read as zero
    * rows; `_manifest_chain/fold.tsv` reads distributed when addressed
    * by its full path.
    */
  private def foldPath(dir: String, version: Long) =
    java.nio.file.Paths.get(dir, s"v$version", "_manifest_chain", "fold.tsv")

  /** The committed fold as a DataFrame, schema-identical to
    * [[manifestChain]]'s union rows: a DISTRIBUTED csv scan of the TSV
    * (FAILFAST — corrupt lines are as loud as the stats parser), never
    * a driver line loop, decoded and typed in the plan. Spark's csv
    * reader maps empty fields to NULL, which is exactly the all-null-
    * file min/max encoding the stats sidecar uses.
    */
  private def foldedManifest(spark: SparkSession,
      p: java.nio.file.Path): DataFrame = {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.functions.{url_decode, when}
    val raw = spark.read
      .option("sep", "\t").option("mode", "FAILFAST")
      .schema(StructType(Seq(
        StructField("generation", LongType, nullable = false),
        StructField("file_enc", StringType, nullable = false),
        StructField("row_count", LongType, nullable = false),
        StructField("col_enc", StringType, nullable = false),
        StructField("col_type", StringType, nullable = false),
        StructField("min_enc", StringType, nullable = true),
        StructField("max_enc", StringType, nullable = true),
        StructField("null_count", LongType, nullable = false))))
      .csv(p.toString)
    val num = (c: org.apache.spark.sql.Column) =>
      when(col("col_type").isin("long", "double", "decimal"),
        c.cast("double"))
    raw.select(
      url_decode(col("file_enc")).as("file"),
      col("row_count"),
      url_decode(col("col_enc")).as("column"),
      col("col_type"),
      url_decode(col("min_enc")).as("min_str"),
      url_decode(col("max_enc")).as("max_str"),
      num(url_decode(col("min_enc"))).as("min_num"),
      num(url_decode(col("max_enc"))).as("max_num"),
      col("null_count"),
      col("generation"))
  }

  /** Raw (still-encoded) `_stats.tsv` lines of a version. */
  private def rawStatsLines(dir: String, version: Long): Seq[String] = {
    val p = java.nio.file.Paths.get(dir, s"v$version", "_stats.tsv")
    if (!java.nio.file.Files.exists(p)) Seq.empty
    else java.nio.file.Files.readAllLines(p).toArray(Array.empty[String])
      .toSeq.filter(_.nonEmpty)
  }

  /** Fold the base chain's manifest into the staged directory as
    * `_manifest_chain.tsv` — the manifest-list compaction every real
    * format performs (Iceberg's manifest list, Delta's checkpoint):
    * each append carries a snapshot of its ANCESTORS' (file, column)
    * stats with their generation ids, so [[manifestChain]] is O(1)
    * scans at any chain depth. The fold is COMPOSED, not recomputed:
    * the base's fold lines plus the base's own stats lines stamped
    * with its generation — pure driver file I/O on file-count-bounded
    * metadata, ZERO Spark jobs per commit (the first fold cut ~0.6 s
    * of read-fold-write jobs from every append). Skipped (the read
    * side's recursive walk remains the correct, slower path) when the
    * ancestry cannot fold: delete/upsert tombstones, stats-less or
    * pre-fold generations.
    */
  private def writeChainManifestFold(staged: java.nio.file.Path,
      dir: String, baseVersion: Long): Unit =
    foldLines(dir, baseVersion).foreach { lines =>
      val d = staged.resolve("_manifest_chain")
      java.nio.file.Files.createDirectories(d)
      java.nio.file.Files.writeString(d.resolve("fold.tsv"),
        lines.mkString("", "\n", "\n"))
    }

  /** Reserved `file` value of a TOMBSTONE record in the chain fold: a
    * line carrying an upsert generation's recorded merge stats
    * (matched base rows, per-key-column min/max, distinct tombstone
    * keys) instead of per-file column stats. [[manifestChain]] refuses
    * chains that contain one (exact per-file stats stop existing past
    * a merge); [[chainStats]] consumes them.
    */
  val TombstoneFoldMarker: String = "__tombstones__"

  /** The fold lines recording an upsert generation's tombstone-side
    * stats (one line per key column, same 8-field shape as a stats
    * line: row_count carries the MATCHED base-row count, null_count
    * the distinct tombstone-key count), or None when the merge was
    * committed without `recordChainStats` — an unrecorded merge cannot
    * fold.
    */
  private def tombstoneFoldLines(dir: String, version: Long): Option[Seq[String]] = {
    val m = readMeta(dir, version)
    m.get("upsert_matched").map { matched =>
      val nKeys = m("upsert_tombstones")
      val enc = (s: String) => java.net.URLEncoder.encode(s,
        java.nio.charset.StandardCharsets.UTF_8)
      m.toSeq.collect { case (k, v) if k.startsWith("upsert_stats.") =>
        val c = k.stripPrefix("upsert_stats.")
        val parts = v.split(",", -1)
        require(parts.length == 3,
          s"corrupt upsert_stats.$c on $dir v$version: '$v'")
        s"$version\t${enc(TombstoneFoldMarker)}\t$matched\t${enc(c)}\t" +
          s"${parts(0)}\t${parts(1)}\t${parts(2)}\t$nKeys"
      }.sorted
    }
  }

  /** The fold lines covering the whole chain at `version`, or None when
    * the ancestry cannot fold. A RECORDED upsert (committed with
    * `recordChainStats`) folds: its tombstone records ride along so
    * [[chainStats]] stays O(1) scans; an unrecorded upsert stops the
    * fold (the read side's recursive walk remains the loud, correct
    * path).
    */
  private def foldLines(dir: String, version: Long): Option[Seq[String]] = {
    if (baseOf(dir, version).isDefined) None
    else {
      val ownStats = rawStatsLines(dir, version)
      if (ownStats.isEmpty) None // stats-less generation: no manifest
      else {
        val tombOpt =
          if (!isUpsert(dir, version)) Some(Seq.empty[String])
          else tombstoneFoldLines(dir, version)
        tombOpt.flatMap { tomb =>
          val own = tomb ++ ownStats.map(l => s"$version\t$l")
          appendBaseOf(dir, version) match {
            case None => Some(own)
            case Some(_) =>
              val p = foldPath(dir, version)
              if (!java.nio.file.Files.exists(p)) None // pre-fold ancestry
              else Some(java.nio.file.Files.readAllLines(p)
                .toArray(Array.empty[String]).toSeq.filter(_.nonEmpty) ++ own)
          }
        }
      }
    }
  }

  /** Metadata-only chain stats that SURVIVE upsert generations — what
    * [[manifestChain]] loudly refuses to fake. Per requested column,
    * one row: the chain's EXACT row count and CONSERVATIVE min/max
    * bounds, answered from the committed fold plus this generation's
    * own sidecars (the same two-scan shape as [[manifestChain]], any
    * chain depth), zero data files opened.
    *
    *  - `n_rows` is EXACT: Σ per-file row counts across generations
    *    minus Σ recorded matched-row counts of the chain's merges —
    *    exact because each merge's `upsert_matched` was measured
    *    against the RESOLVED chain state at its commit, so every
    *    tombstoned row is subtracted exactly once however many times a
    *    key is re-merged.
    *  - `min_num`/`max_num` (numeric columns) and `min_str`/`max_str`
    *    are BOUNDS, not values: tombstones only remove rows, so the
    *    fold over per-file stats can only widen — true min ≥ bound,
    *    true max ≤ bound. `bounds_exact` discloses the distinction:
    *    true on a tombstone-free chain (the bounds are the values),
    *    false past any merge.
    *
    * Loud on: a MOR delete commit (different machinery — compact
    * first), an UNRECORDED upsert anywhere in the chain (commit merges
    * with `recordChainStats = true` to keep metadata answering), a
    * missing fold on a chained generation, and a column lacking stats
    * on any file (a partial bound is not a bound).
    */
  def chainStats(spark: SparkSession, dir: String, version: Long,
      columns: Seq[String]): DataFrame = {
    require(baseOf(dir, version).isEmpty,
      s"chainStats: v$version of $dir is a merge-on-read delete commit " +
        "— compact first or read its base")
    require(columns.nonEmpty, "chainStats needs at least one column")
    import org.apache.spark.sql.functions.first
    import spark.implicits._
    val dec = (s: String) => java.net.URLDecoder.decode(s,
      java.nio.charset.StandardCharsets.UTF_8)
    // own generation, parsed locally (file-count-bounded): stats rows
    // plus tombstone records if this tip is itself a recorded merge
    val ownStats = readStats(dir, version)
    require(ownStats.nonEmpty,
      s"no per-file stats on $dir v$version — commit with statsCols to " +
        "enable metadata-only answering")
    val num = (typ: String, v: Option[String]) => typ match {
      case "long" | "double" | "decimal" => v.map(_.toDouble)
      case _ => None
    }
    val ownRows = ownStats.map { s =>
      (s.file, s.rowCount, s.col, s.typ, s.min, s.max,
        num(s.typ, s.min), num(s.typ, s.max), s.nulls, version)
    } ++ {
      if (!isUpsert(dir, version)) Nil
      else {
        val m = readMeta(dir, version)
        val matched = m.getOrElse("upsert_matched",
          throw new IllegalStateException(
            s"chainStats: upsert v$version of $dir recorded no merge " +
              "stats — commit with recordChainStats = true")).toLong
        val nKeys = m("upsert_tombstones").toLong
        m.toSeq.collect { case (k, v) if k.startsWith("upsert_stats.") =>
          val c = k.stripPrefix("upsert_stats.")
          val parts = v.split(",", -1)
          val mn = if (parts(1).isEmpty) None else Some(dec(parts(1)))
          val mx = if (parts(2).isEmpty) None else Some(dec(parts(2)))
          (TombstoneFoldMarker, matched, c, parts(0), mn, mx,
            num(parts(0), mn), num(parts(0), mx), nKeys, version)
        }
      }
    }
    val own = ownRows.toDF("file", "row_count", "column", "col_type",
      "min_str", "max_str", "min_num", "max_num", "null_count",
      "generation")
    val all = appendBaseOf(dir, version) match {
      case None => own
      case Some(_) =>
        val p = foldPath(dir, version)
        require(java.nio.file.Files.exists(p),
          s"chainStats: v$version of $dir has no chain-manifest fold — " +
            "an ancestor is stats-less or an unrecorded merge")
        foldedManifest(spark, p).unionByName(own)
    }
    val files = all.filter(col("file") =!= lit(TombstoneFoldMarker))
    val tombs = all.filter(col("file") === lit(TombstoneFoldMarker))
    // TWO distributed passes total (was ~2 + 2·|columns| separate
    // jobs — each a fixed ~0.2 s of scheduler overhead on a
    // metadata-sized frame): one per-file fold for data + tombstone
    // totals together, one per-column fold for coverage + bounds.
    // The manifest frame itself stays distributed (the 10^5-file
    // design point); only the NUMBER of passes over it shrinks.
    //
    // stats rows repeat row_count per column: count each file once;
    // tombstone records count once per generation (file is the marker)
    val totals = all.groupBy(
        (col("file") === lit(TombstoneFoldMarker)).as("is_tomb"),
        col("generation"), col("file"))
      .agg(first(col("row_count")).as("rc"))
      .groupBy(col("is_tomb"))
      .agg(count(lit(1)).as("n"), sum(col("rc")).as("rows"))
      .collect()
      .map(r => r.getBoolean(0) -> (r.getLong(1), r.getLong(2))).toMap
    val (nFiles, dataRows) = totals.getOrElse(false, (0L, 0L))
    val (nTombGens, matchedRows) = totals.getOrElse(true, (0L, 0L))
    val nRows = dataRows - matchedRows
    val boundsExact = nTombGens == 0L
    val perCol = files
      .groupBy(col("column"))
      .agg(org.apache.spark.sql.functions
          .countDistinct(col("generation"), col("file")).as("covered"),
        min(col("min_num")).as("mn_num"), max(col("max_num")).as("mx_num"),
        min(col("min_str")).as("mn_str"), max(col("max_str")).as("mx_str"))
      .collect()
      .map(r => r.getString(0) -> r).toMap
    val out = columns.map { c =>
      val r = perCol.get(c)
      val covered = r.map(_.getLong(1)).getOrElse(0L)
      require(covered == nFiles,
        s"chainStats: column '$c' lacks stats on ${nFiles - covered} of " +
          s"$nFiles chain files — a partial bound is not a bound")
      (c, nRows, r.flatMap(x => Option(x.get(2)).map(_.asInstanceOf[Double])),
        r.flatMap(x => Option(x.get(3)).map(_.asInstanceOf[Double])),
        r.flatMap(x => Option(x.get(4)).map(_.asInstanceOf[String])),
        r.flatMap(x => Option(x.get(5)).map(_.asInstanceOf[String])),
        boundsExact)
    }
    out.toDF("column", "n_rows", "min_num", "max_num", "min_str",
      "max_str", "bounds_exact")
  }

  /** One generation's manifest frame, chain checks already done. */
  private def manifestOwn(spark: SparkSession, dir: String,
      version: Long): DataFrame = {
    val mp = java.nio.file.Paths.get(dir, s"v$version", "_manifest")
    if (java.nio.file.Files.exists(mp)) spark.read.parquet(mp.toString)
    else {
      val stats = readStats(dir, version)
      require(stats.nonEmpty,
        s"no per-file stats on $dir v$version — commit with statsCols to " +
          "enable metadata-only answering")
      import spark.implicits._
      stats.map { s =>
        val num = (v: Option[String]) => s.typ match {
          case "long" | "double" | "decimal" => v.map(_.toDouble)
          case _ => None
        }
        (s.file, s.rowCount, s.col, s.typ, s.min, s.max,
          num(s.min), num(s.max), s.nulls)
      }.toDF("file", "row_count", "column", "col_type", "min_str", "max_str",
        "min_num", "max_num", "null_count")
    }
  }

  /** File-skipping decision for `column IN (keys)` on a bloom-carrying
    * version: a file survives iff its filter says ANY key might be
    * present. This is the point-lookup complement to [[pruneFiles]] —
    * min/max ranges are powerless when a high-cardinality key is
    * scattered across every file (each file's [min,max] spans the whole
    * keyspace), but a bloom answers "definitely not here" per file, so
    * a needle query on an unpartitioned, unclustered 100 TB table opens
    * ~the files that actually hold the needles (plus the disclosed 1%
    * false-positive tail). No false negatives: correctness never
    * depends on the filter, only I/O does. Keys are canonicalized
    * through the same string form the build side inserted. Absent or
    * column-less blooms are a LOUD error, same contract as
    * [[pruneFiles]].
    */
  def pruneFilesBloom(dir: String, version: Long, column: String,
      keys: Seq[Any]): (Seq[String], Int) = {
    require(baseOf(dir, version).isEmpty,
      s"pruneFilesBloom targets data versions; v$version of $dir is a " +
        "merge-on-read delete commit — compact first or prune its base")
    require(appendBaseOf(dir, version).isEmpty,
      s"pruneFilesBloom covers one generation; v$version of $dir is an " +
        "append commit — prune each generation against its own sidecar")
    require(keys.nonEmpty, "pruneFilesBloom needs at least one key")
    val blooms = readBloom(dir, version).filter(_._2 == column)
    require(blooms.nonEmpty,
      s"no per-file bloom for column '$column' on $dir v$version — " +
        "commit with bloomCols to enable point-lookup file skipping")
    val keyBytes = keys.map(k => bloomKeyBytes(String.valueOf(k)))
    val kept = blooms.collect {
      case (file, _, bf) if keyBytes.exists(bf.mightContainBinary) => file
    }
    (kept.map(f => s"$dir/v$version/$f"), blooms.size)
  }

  /** The DISTRIBUTED bloom probe — same decision as the driver-side
    * overload, computed as a scan of the committed `_bloomtab` parquet
    * table: each task deserializes only its rows' filters and tests
    * the keys, so at 10⁵ files × ~150 KB of bits the probe never
    * materializes gigabytes of filters on the driver (the collect is
    * SURVIVORS-ONLY, the same driver-bounded file list every planner
    * holds). Falls back to the TSV sidecar for versions committed
    * before the table existed. [[readWhereIn]]/[[readWhereMulti]]
    * route through this.
    */
  def pruneFilesBloom(spark: SparkSession, dir: String, version: Long,
      column: String, keys: Seq[Any]): (Seq[String], Int) = {
    require(baseOf(dir, version).isEmpty,
      s"pruneFilesBloom targets data versions; v$version of $dir is a " +
        "merge-on-read delete commit — compact first or prune its base")
    require(appendBaseOf(dir, version).isEmpty,
      s"pruneFilesBloom covers one generation; v$version of $dir is an " +
        "append commit — prune each generation against its own sidecar " +
        "(pruneFilesBloomOwn / readWhereInChain)")
    require(keys.nonEmpty, "pruneFilesBloom needs at least one key")
    pruneBloomUnguarded(spark, dir, version, column, keys)
  }

  /** The shared probe core, chain guards already applied by callers:
    * distributed over the committed `_bloomtab` when present, the
    * driver-side TSV parse for versions that predate it.
    */
  private def pruneBloomUnguarded(spark: SparkSession, dir: String,
      version: Long, column: String, keys: Seq[Any]): (Seq[String], Int) = {
    val bt = java.nio.file.Paths.get(dir, s"v$version", "_bloomtab")
    if (!java.nio.file.Files.exists(bt)) {
      val blooms = readBloom(dir, version).filter(_._2 == column)
      require(blooms.nonEmpty,
        s"no per-file bloom for column '$column' on $dir v$version — " +
          "commit with bloomCols to enable point-lookup file skipping")
      val keyBytes = keys.map(k => bloomKeyBytes(String.valueOf(k)))
      val kept = blooms.collect {
        case (file, _, bf) if keyBytes.exists(bf.mightContainBinary) => file
      }
      return (kept.map(f => s"$dir/v$version/$f"), blooms.size)
    }
    import spark.implicits._
    val tab = spark.read.parquet(bt.toString)
      .filter(col("column") === column)
      .select(col("file"), col("bits")).as[(String, Array[Byte])]
    val keyBytes = keys.map(k => bloomKeyBytes(String.valueOf(k))).toArray
    val decided = tab.mapPartitions { it =>
      it.map { case (file, bits) =>
        val bf = org.apache.spark.util.sketch.BloomFilter.readFrom(
          new java.io.ByteArrayInputStream(bits))
        (file, keyBytes.exists(bf.mightContainBinary))
      }
    }
    // one pass decides; total and survivors come back together (the
    // frame is file-count-bounded metadata, and the survivors subset
    // is what the planner needs on the driver anyway)
    val rows = decided.collect()
    require(rows.nonEmpty,
      s"no per-file bloom for column '$column' on $dir v$version — " +
        "commit with bloomCols to enable point-lookup file skipping")
    val kept = rows.collect { case (f, true) => f }.toSeq.sorted
    (kept.map(f => s"$dir/v$version/$f"), rows.length)
  }

  /** ONE GENERATION's own-file skipping decision for `column IN
    * (keys)` — the per-generation building block a chain read composes
    * ([[pruneFilesBloom]] refuses append versions precisely because
    * its answer covers one generation's files and silently presenting
    * it as the chain answer would be wrong; this is that
    * one-generation answer made EXPLICIT). A delete commit carries no
    * data files and is refused loudly. Returns (surviving own file
    * paths, own file total).
    */
  def pruneFilesBloomOwn(spark: SparkSession, dir: String, version: Long,
      column: String, keys: Seq[Any]): (Seq[String], Int) = {
    require(baseOf(dir, version).isEmpty,
      s"pruneFilesBloomOwn: v$version of $dir is a merge-on-read delete " +
        "commit with no data files of its own")
    require(keys.nonEmpty, "pruneFilesBloomOwn needs at least one key")
    pruneBloomUnguarded(spark, dir, version, column, keys)
  }

  /** Bloom-pruned point-lookup read over an APPEND CHAIN: each
    * generation's own files prune against that generation's own bloom
    * sidecar, the surviving scans union BY NAME (per-generation
    * layouts and schemas stay free, the spec-evolution discipline),
    * and the row-level IN filter applies on top — byte-identical to
    * the full chain scan, pure I/O savings in EVERY generation. This
    * is the needle read for a table that took a year of ingest
    * batches: the chain's depth costs nothing but one sidecar decision
    * per generation. Tombstone-carrying chains (delete or upsert
    * commits) are refused loudly — an anti-join under per-generation
    * pruning could only be answered correctly by also scanning the
    * tombstones, which [[readAt]] already does; compact first.
    */
  def readWhereInChain(spark: SparkSession, dir: String, version: Long,
      column: String, keys: Seq[Any]): DataFrame = {
    val gens = chainOf(dir, version)
    gens.foreach { g =>
      require(baseOf(dir, g).isEmpty && !isUpsert(dir, g),
        s"readWhereInChain: v$g of $dir carries tombstones — their " +
          "anti-join defeats per-generation pruning; compact first or " +
          "use readAt")
    }
    gens.map { g =>
      val (files, _) = pruneFilesBloomOwn(spark, dir, g, column, keys)
      val vdir = s"$dir/v$g"
      if (files.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          spark.read.parquet(vdir).schema)
      else spark.read.option("basePath", vdir).parquet(files: _*)
    }.reduce(_.unionByName(_, allowMissingColumns = true))
      .filter(col(column).isin(keys: _*))
  }

  /** Bloom-pruned point-lookup read: `readAt(version).filter(column IN
    * keys)` that opens ONLY the files whose bloom admits at least one
    * key. The row-level IN filter still applies (a bloom keeps false
    * positives), so the answer is byte-identical to the full scan —
    * pure I/O savings, like [[readWhere]].
    *
    * Merge-on-read delete commits resolve like [[readAt]]: the pruning
    * happens on the underlying DATA version's sidecar (a bloom cannot
    * forget a key, so a deleted key only costs a false-positive file
    * open) and every `_deletes` level in the chain anti-joins on top —
    * a point lookup can never resurrect an erased key through the
    * skipping path.
    */
  def readWhereIn(spark: SparkSession, dir: String, version: Long,
      column: String, keys: Seq[Any]): DataFrame =
    prunedInScan(spark, dir, version, column, keys)
      .filter(col(column).isin(keys: _*))

  /** The bloom-pruned chain scan WITHOUT the residual row filter —
    * shared by [[readWhereIn]] (which adds an IN literal, parquet-
    * pushable for bounded key lists) and [[readWhereInFrom]]'s
    * large-key path (which adds a broadcast semi-join instead, because
    * a Catalyst IN over tens of thousands of literals bloats the
    * expression tree and codegen).
    */
  private def prunedInScan(spark: SparkSession, dir: String, version: Long,
      column: String, keys: Seq[Any]): DataFrame = baseOf(dir, version) match {
    case Some(b) =>
      val dels = spark.read.parquet(s"$dir/v$version/_deletes")
      prunedInScan(spark, dir, b, column, keys)
        .join(dels, dels.columns.toSeq, "left_anti")
    case None =>
      val (files, _) = pruneFilesBloom(spark, dir, version, column, keys)
      val vdir = s"$dir/v$version"
      if (files.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          spark.read.parquet(vdir).schema)
      else spark.read.option("basePath", vdir).parquet(files: _*)
  }

  /** Past this many keys the residual filter becomes a broadcast
    * semi-join on a local relation instead of an IN literal list — an
    * IN with tens of thousands of literals bloats the Catalyst tree
    * and the generated code, while a broadcast hash semi-join costs
    * one small build side. Below it the IN wins (it pushes into the
    * parquet row-group filters).
    */
  val InlineInLiteralMax: Int = 1024

  /** DYNAMIC file pruning — [[readWhereIn]] whose key set comes from a
    * DIMENSION-SIDE frame at runtime instead of from literals: the
    * semi-join shape every star-schema needle query has (`fact JOIN
    * (small filtered dim)`), pruned at the MANIFEST level. The dim
    * side's distinct keys are collected (the same driver-bounded
    * broadcast Spark's own dynamic partition pruning performs on its
    * dim side — `maxKeys` bounds it LOUDLY: a dim side too big to
    * collect is too big to bloom-probe per key, and the caller should
    * fall back to a plain shuffle join; the default matches
    * broadcast-side DPP scale, NOT the biggest list the driver could
    * physically hold) and probed against the fact version's per-file
    * blooms, so the fact side opens ~the files that hold matching
    * keys. The residual row filter is an IN literal up to
    * [[InlineInLiteralMax]] keys (parquet-pushable) and a broadcast
    * semi-join on a LOCAL relation above it (a 10⁴-literal IN bloats
    * the Catalyst tree and codegen; the semi-join costs one small
    * build side) — either way the answer is byte-identical to the
    * full-scan semi-join.
    *
    * @note BEHAVIORAL CHANGE (r19): the default `maxKeys` dropped from
    *       `1 << 20` to `1 << 16`. A caller whose dim side holds
    *       between ~65k and 1M distinct keys, and who previously relied
    *       on the implicit default, now gets a loud
    *       IllegalArgumentException instead of a run — pass
    *       `maxKeys = 1 << 20` explicitly to restore the old bound (the
    *       broadcast-semi-join residual handles it correctly; the
    *       default is conservative because a million per-key bloom
    *       probes per file is rarely the plan you want — past DPP
    *       scale, a plain shuffle join usually wins).
    */
  def readWhereInFrom(spark: SparkSession, dir: String, version: Long,
      column: String, keysDf: DataFrame, maxKeys: Int = 1 << 16): DataFrame = {
    require(keysDf.columns.length == 1,
      s"readWhereInFrom wants a single-column key frame, got " +
        s"(${keysDf.columns.mkString(", ")}) — select the join key")
    val keys = keysDf.distinct().limit(maxKeys + 1).collect()
      .map(_.get(0)).toSeq
    require(keys.size <= maxKeys,
      s"readWhereInFrom: dim side exceeds maxKeys=$maxKeys distinct " +
        "keys — too big for per-key bloom probing; use a shuffle join")
    if (keys.isEmpty)
      // a dim side with no matches is a VALID query whose semi-join
      // answer is zero rows — the perfect prune (no fact files open),
      // not an error
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        readAt(spark, dir, version).schema)
    else if (keys.size <= InlineInLiteralMax)
      readWhereIn(spark, dir, version, column, keys)
    else {
      // large key set: residual as a broadcast LEFT SEMI against a
      // local relation of the already-collected keys (no file leaves,
      // no re-read of the dim side). Null keys never match under
      // either form — IN and the equi-semi-join are both null-rejecting
      // — so the answers coincide.
      import scala.jdk.CollectionConverters._
      val keyField = keysDf.schema.fields.head
      val local = spark.createDataFrame(
        keys.filter(_ != null).map(org.apache.spark.sql.Row(_)).asJava,
        org.apache.spark.sql.types.StructType(
          Seq(keyField.copy(name = column))))
      prunedInScan(spark, dir, version, column, keys)
        .join(org.apache.spark.sql.functions.broadcast(local),
          Seq(column), "left_semi")
    }
  }

  /** File-skipping decision for `column BETWEEN lo AND hi` on a stats-
    * carrying version: returns (surviving file paths, total file
    * count). A file survives iff its [min,max] interval overlaps
    * [lo,hi]; an all-null file (no min/max) cannot match a range
    * predicate and is pruned. Absent or column-less stats are a LOUD
    * error, not a silent full scan — a caller relying on skipping must
    * know when the manifest it priced its query on is missing.
    */
  def pruneFiles(dir: String, version: Long, column: String,
      lo: Any, hi: Any): (Seq[String], Int) = {
    require(baseOf(dir, version).isEmpty,
      s"pruneFiles targets data versions; v$version of $dir is a " +
        "merge-on-read delete commit — compact first or prune its base")
    require(appendBaseOf(dir, version).isEmpty,
      s"pruneFiles covers one generation; v$version of $dir is an " +
        "append commit — prune each generation against its own sidecar")
    val stats = readStats(dir, version).filter(_.col == column)
    require(stats.nonEmpty,
      s"no per-file stats for column '$column' on $dir v$version — " +
        "commit with statsCols to enable file skipping")
    val loS = String.valueOf(lo)
    val hiS = String.valueOf(hi)
    val kept = stats.filter { st =>
      (st.min, st.max) match {
        case (Some(mn), Some(mx)) =>
          cmpStat(st.typ, mn, hiS) <= 0 && cmpStat(st.typ, mx, loS) >= 0
        case _ => false // all-null file: no row can satisfy a range
      }
    }
    (kept.map(st => s"$dir/v$version/${st.file}"), stats.size)
  }

  /** Stats-pruned range read: `readAt(version).filter(column between
    * lo and hi)` that opens ONLY the files whose min/max admit a
    * match. The row-level filter still applies (file stats are a
    * superset bound), so the answer is byte-identical to the full
    * scan — the pruning is pure I/O savings, which is the entire game
    * on an unpartitioned 100 TB predicate read. `basePath` keeps
    * hive-partition columns resolving when the commit was partitioned.
    * Merge-on-read delete commits resolve like [[readAt]]: pruning on
    * the data version's sidecar, `_deletes` anti-joined on top.
    */
  def readWhere(spark: SparkSession, dir: String, version: Long,
      column: String, lo: Any, hi: Any): DataFrame = baseOf(dir, version) match {
    case Some(b) =>
      val dels = spark.read.parquet(s"$dir/v$version/_deletes")
      readWhere(spark, dir, b, column, lo, hi)
        .join(dels, dels.columns.toSeq, "left_anti")
    case None =>
      val (files, _) = pruneFiles(dir, version, column, lo, hi)
      val vdir = s"$dir/v$version"
      val base =
        if (files.isEmpty)
          spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            spark.read.parquet(vdir).schema)
        else spark.read.option("basePath", vdir).parquet(files: _*)
      base.filter(col(column) >= lit(lo) && col(column) <= lit(hi))
  }

  // ------------------------------- conjunctive multi-column skipping

  /** One term of a conjunctive file-skipping predicate. Real predicates
    * are ANDs over several columns; a single-column prune leaves the
    * other terms' skipping power on the table.
    */
  sealed trait PrunePredicate { def column: String }

  /** `column BETWEEN lo AND hi` — decided against the stats manifest
    * (per-file min/max overlap).
    */
  final case class RangePredicate(column: String, lo: Any, hi: Any)
      extends PrunePredicate

  /** `column IN (keys)` — decided against the per-file bloom sidecar
    * (a file survives iff any key might be present).
    */
  final case class InPredicate(column: String, keys: Seq[Any])
      extends PrunePredicate

  /** `column IS NULL` / `IS NOT NULL` — decided against the stats
    * manifest's per-file null counts: a file with zero nulls cannot
    * satisfy IS NULL, an all-null file cannot satisfy IS NOT NULL.
    * The null-count side of the Delta/Iceberg stats record, which
    * range and bloom terms can't use (neither sidecar sees nulls).
    */
  final case class NullPredicate(column: String, isNull: Boolean)
      extends PrunePredicate

  /** Survivors of one range term, decided as a DataFrame FILTER over
    * the [[manifest]] table (not a driver parse loop — at 10⁵ files
    * the decision distributes; the collect is survivors-only, the same
    * driver-bounded file list every format's planner holds). A file
    * survives iff its [min,max] overlaps [lo,hi], compared numerically
    * for numeric-tagged columns and lexicographically for
    * string/date-tagged ones; an all-null file (null min/max) prunes.
    * Loud error when the column carries no stats rows.
    */
  private def rangeSurvivors(m: DataFrame, dir: String, version: Long,
      p: RangePredicate): Set[String] = {
    val loS = String.valueOf(p.lo)
    val hiS = String.valueOf(p.hi)
    val numericBounds =
      scala.util.Try { loS.toDouble; hiS.toDouble }.isSuccess
    val strCond = col("min_str") <= lit(hiS) && col("max_str") >= lit(loS)
    val cond =
      if (numericBounds)
        org.apache.spark.sql.functions.when(
          col("col_type").isin("long", "double", "decimal"),
          col("min_num") <= lit(hiS.toDouble) &&
            col("max_num") >= lit(loS.toDouble))
          .otherwise(strCond)
      else strCond
    val rows = m.filter(col("column") === p.column)
      .select(col("file"),
        org.apache.spark.sql.functions.coalesce(cond, lit(false)).as("keep"))
      .collect()
    require(rows.nonEmpty,
      s"no per-file stats for column '${p.column}' on $dir v$version — " +
        "commit with statsCols to enable file skipping")
    rows.filter(_.getBoolean(1)).map(_.getString(0)).toSet
  }

  /** Survivors of one null term, decided over the [[manifest]] table
    * like [[rangeSurvivors]]: IS NULL keeps files whose null count is
    * positive, IS NOT NULL keeps files with at least one non-null row.
    * Loud when the column carries no stats rows, same contract.
    */
  private def nullSurvivors(m: DataFrame, dir: String, version: Long,
      p: NullPredicate): Set[String] = {
    val cond =
      if (p.isNull) col("null_count") > 0
      else col("null_count") < col("row_count")
    val rows = m.filter(col("column") === p.column)
      .select(col("file"),
        org.apache.spark.sql.functions.coalesce(cond, lit(false)).as("keep"))
      .collect()
    require(rows.nonEmpty,
      s"no per-file stats for column '${p.column}' on $dir v$version — " +
        "commit with statsCols to enable file skipping")
    rows.filter(_.getBoolean(1)).map(_.getString(0)).toSet
  }

  /** File-skipping decision for a CONJUNCTION of predicates — the shape
    * real queries have (`WHERE k BETWEEN … AND bucket IN (…)`): each
    * term's survivor set comes from its own sidecar (ranges from the
    * stats manifest, INs from the bloom), and the sets INTERSECT, so
    * the conjunction prunes at least as hard as its strongest term and
    * usually strictly harder — on a 2-D-clustered 100 TB layout that is
    * the difference between "one stripe" and "one cell". Same contract
    * as the single-term prunes: a term whose sidecar is missing is a
    * LOUD error, never a silent no-op (a silently skipped term would
    * still be correct here — survivors only shrink — but a caller who
    * priced the query on that term's skipping must know).
    */
  def pruneFilesMulti(spark: SparkSession, dir: String, version: Long,
      preds: Seq[PrunePredicate]): (Seq[String], Int) = {
    require(preds.nonEmpty, "pruneFilesMulti needs at least one predicate")
    require(baseOf(dir, version).isEmpty,
      s"pruneFilesMulti targets data versions; v$version of $dir is a " +
        "merge-on-read delete commit — compact first or prune its base")
    require(appendBaseOf(dir, version).isEmpty,
      s"pruneFilesMulti covers one generation; v$version of $dir is an " +
        "append commit — prune each generation against its own sidecar")
    lazy val m = manifest(spark, dir, version)
    val survivorSets: Seq[Set[String]] = preds.map {
      case r: RangePredicate => rangeSurvivors(m, dir, version, r)
      case i: InPredicate =>
        val (kept, _) = pruneFilesBloom(spark, dir, version, i.column, i.keys)
        kept.map(_.stripPrefix(s"$dir/v$version/")).toSet
      case n: NullPredicate => nullSurvivors(m, dir, version, n)
    }
    val allFiles: Set[String] = {
      val s = readStats(dir, version).map(_.file).toSet
      if (s.nonEmpty) s else readBloom(dir, version).map(_._1).toSet
    }
    val kept = survivorSets.reduce(_ intersect _)
    (kept.toSeq.sorted.map(f => s"$dir/v$version/$f"), allFiles.size)
  }

  /** Conjunction-pruned read: `readAt(version).filter(AND(preds))` that
    * opens only the files every term's sidecar admits. Row-level
    * filters for ALL terms still apply (stats are a superset bound,
    * blooms keep false positives), so the answer is byte-identical to
    * the full scan — pure I/O savings, like [[readWhere]]. Merge-on-
    * read delete commits resolve like [[readAt]]: pruning on the data
    * version's sidecars, `_deletes` anti-joined on top.
    */
  def readWhereMulti(spark: SparkSession, dir: String, version: Long,
      preds: Seq[PrunePredicate]): DataFrame = baseOf(dir, version) match {
    case Some(b) =>
      val dels = spark.read.parquet(s"$dir/v$version/_deletes")
      readWhereMulti(spark, dir, b, preds)
        .join(dels, dels.columns.toSeq, "left_anti")
    case None =>
      val (files, _) = pruneFilesMulti(spark, dir, version, preds)
      val vdir = s"$dir/v$version"
      val base =
        if (files.isEmpty)
          spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            spark.read.parquet(vdir).schema)
        else spark.read.option("basePath", vdir).parquet(files: _*)
      base.filter(preds.map {
        case RangePredicate(c, lo, hi) => col(c) >= lit(lo) && col(c) <= lit(hi)
        case InPredicate(c, keys) => col(c).isin(keys: _*)
        case NullPredicate(c, true) => col(c).isNull
        case NullPredicate(c, false) => col(c).isNotNull
      }.reduce(_ && _))
  }

  // -------------------------------------------------------- maintenance

  /** Retention: delete all but the newest `keepLast` snapshot
    * directories. The version `current` names is never deleted
    * regardless of `keepLast`, and neither is any version REACHABLE
    * from a kept version through a merge-on-read `_base` chain —
    * expiring a delete commit's base would turn its readers into
    * crashes (compaction, not retention, is how chains end). Also
    * garbage-collects crashed writers' `.staged-*` directories and
    * orphaned `.current.tmp*` pointer temps older than the staged-GC
    * threshold (`graft.snapshot.stagedGcMs`, default 24 h — generous
    * because a LIVE writer's staging directory legitimately ages for
    * the whole duration of a large write; only expire reclaims these,
    * never the commit path, so routine commits cannot race a slow
    * writer's staging I/O). Returns the versions removed. Like every
    * table format's VACUUM, this is the one operation that can break
    * an in-flight time-travel reader of an EXPIRED version; callers
    * pick a retention window longer than their longest job.
    */
  def expire(dir: String, keepLast: Int): Seq[Long] = {
    require(keepLast >= 1, s"keepLast must be >= 1, got $keepLast")
    val live = currentVersion(dir)
    val all = versions(dir)
    val keep = scala.collection.mutable.Set.empty[Long]
    // a kept version must keep everything it READS: delete commits
    // reach through `_base`, append commits through `_append`. Branch
    // heads are roots too — an unpublished WAP candidate must survive
    // retention until its branch is dropped or published.
    def reach(v: Long): Unit =
      if (keep.add(v)) {
        baseOf(dir, v).foreach(reach)
        appendBaseOf(dir, v).foreach(reach)
      }
    (all.takeRight(keepLast) ++ live ++
      branches(dir).flatMap(b => branchVersion(dir, b))).foreach(reach)
    val drop = all.filterNot(keep)
    drop.foreach(v => io(dir).dropVersion(tablePath(dir), v))
    gcStaged(dir)
    drop
  }

  /** Sweep crash debris: `.staged-*` data directories and `.current.
    * tmp*` pointer temps whose mtime is older than the threshold. A
    * directory's mtime does not advance while a single large file is
    * being written inside it, hence the conservative default — this
    * reclaims writers that died DAYS ago, not writers that are slow.
    */
  private def gcStaged(dir: String): Unit = {
    val ttlMs = java.lang.Long.getLong("graft.snapshot.stagedGcMs",
      24L * 3600 * 1000)
    val now = System.currentTimeMillis()
    val children = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
    children.foreach { f =>
      val n = f.getName
      // ".current.tmp*"/".ref.tmp*" are legacy pre-FileIO temp names;
      // the POSIX profile now writes ".<pointer-name>.tmp<hex>"
      // (".current.tmp…", ".ref.<branch>.tmp…") — both shapes swept
      if ((n.startsWith(".staged-") || n.startsWith(".current.") ||
          n.startsWith(".ref.")) && now - f.lastModified() > ttlMs)
        deleteTree(f.getPath)
    }
  }

  /** Reclaim DEBRIS VERSIONS: directories that are (a) CAS losers no
    * ref ever published (a conditional commit that lost its race, a
    * monotonicity-skipped blind write — [[publishedRefs]] is the
    * provenance), or (b) versions published ONLY to refs that have
    * since been dropped (an abandoned write-audit-publish candidate
    * after [[dropBranch]] — Iceberg's ref-reachability expiration),
    * in both cases provided nothing live reads them through a
    * `_base`/`_append` chain. This is the complement of [[expire]]:
    * expire ages out real HISTORY by count, this removes versions that
    * never became (or no longer have) history — at 100 TB a contended
    * ingest's losers and failed-audit candidates are full-size data
    * directories, and a format that never reclaims them leaks the
    * table's own volume. Safety rails: the main pointer's chain, every
    * branch head's chain, and every version a still-existing ref ever
    * published (plus everything those read) are always kept; a version
    * younger than `olderThanMs` is kept (a racing writer may be
    * between its claim-rename and its flip RIGHT NOW — age is what
    * proves abandonment, same reasoning as the stale-lock reclaim);
    * and a table with no publish log keeps everything (no provenance,
    * no GC — the conservative reading for pre-log tables). Returns the
    * versions removed.
    */
  def gcOrphans(dir: String,
      olderThanMs: Long = java.lang.Long.getLong(
        "graft.snapshot.orphanGcMs", 24L * 3600 * 1000)): Seq[Long] = {
    val pubs = publishedRefs(dir)
    if (pubs.isEmpty) return Seq.empty
    val fio = io(dir)
    val liveRefs = branches(dir).toSet ++
      (if (fio.readPointer(tablePath(dir), "current").isDefined)
         Set("current")
       else Set.empty[String])
    val keep = scala.collection.mutable.Set.empty[Long]
    def reach(v: Long): Unit =
      if (keep.add(v)) {
        baseOf(dir, v).foreach(reach)
        appendBaseOf(dir, v).foreach(reach)
      }
    (currentVersion(dir).toSeq ++
      branches(dir).flatMap(b => branchVersion(dir, b))).foreach(reach)
    // a version a STILL-EXISTING ref ever published is HISTORY
    // (expire's domain, not ours), and keeps everything it reads
    pubs.foreach { case (v, refs) =>
      if (refs.exists(liveRefs) && fio.versionVisible(tablePath(dir), v))
        reach(v)
    }
    // pre-log history is indistinguishable from pre-log debris — keep
    // it ALL. The floor is the creation marker's recorded max version
    // (explicit: a fresh table's floor is v0, so a CAS loser claimed on
    // an empty table IS reclaimable); legacy logs without the marker
    // fall back to the min-published inference, which errs conservative.
    val floor = preLogFloor(dir, pubs)
    val now = System.currentTimeMillis()
    val orphans = versions(dir).filter { v =>
      v > floor && !keep.contains(v) &&
        now - fio.claimedAtMs(tablePath(dir), v) > olderThanMs
    }
    // plus torn debris no reader can ever see: claims whose writer died
    // before sealing (only the rename-less profile can produce these —
    // under POSIX a v<N> directory IS the seal). Same age bar: a young
    // unsealed claim may be a live writer mid-copy RIGHT NOW.
    val debris = fio.listDebris(tablePath(dir)).filter { v =>
      v > floor && !keep.contains(v) &&
        now - fio.claimedAtMs(tablePath(dir), v) > olderThanMs
    }
    (orphans ++ debris).distinct.sorted
      .map { v => fio.dropVersion(tablePath(dir), v); v }
  }

  /** Serialize the pointer check-and-flip across processes via atomic
    * lock-file creation. Held for microseconds (no data I/O inside),
    * which makes AGE proof of a crashed owner: a lock older than
    * `graft.snapshot.staleLockMs` (default 60 s) is reclaimed in place
    * — the crash debris of a writer that died between createFile and
    * its finally never wedges the table. The lock file carries the
    * owner's pid/timestamp for diagnostics. A FRESH contended lock
    * still fails loudly after the bounded acquisition spin, with
    * removal instructions, rather than deadlocking or silently
    * proceeding into a lost update.
    */
  private def withPointerLock[A](dir: String)(body: => A): A = {
    val lock = java.nio.file.Paths.get(dir, ".commit.lock")
    // property-tunable so the stale-lock spec doesn't stall the build
    val timeoutMs = java.lang.Long.getLong("graft.snapshot.lockTimeoutMs", 10000L)
    val staleMs = java.lang.Long.getLong("graft.snapshot.staleLockMs", 60000L)
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    var acquired = false
    while (!acquired) {
      try {
        java.nio.file.Files.createFile(lock)
        // diagnostic only — the atomic createFile above IS the claim
        try java.nio.file.Files.writeString(lock,
          s"pid=${ProcessHandle.current().pid()} ts=${System.currentTimeMillis()}")
        catch { case scala.util.control.NonFatal(_) => () }
        acquired = true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          val age =
            try System.currentTimeMillis() -
              java.nio.file.Files.getLastModifiedTime(lock).toMillis
            catch { case _: java.nio.file.NoSuchFileException => 0L }
          if (age > staleMs) {
            // crashed owner (the flip is microseconds; minutes of age
            // is not "slow"): reclaim. deleteIfExists + the create
            // race above arbitrate multiple reclaimers — one wins.
            java.nio.file.Files.deleteIfExists(lock)
          } else if (System.nanoTime() > deadline)
            throw new IllegalStateException(
              s"could not acquire $lock within ${timeoutMs}ms — a writer " +
                "crashed mid-flip or is wedged; verify no writer is live, " +
                "then remove the lock file")
          else Thread.sleep(5)
      }
    }
    try body
    finally java.nio.file.Files.deleteIfExists(lock)
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
