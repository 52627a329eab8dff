package graft.ops

import java.nio.file.{FileAlreadyExistsException, Files, Path}
import java.nio.file.{StandardCopyOption, StandardOpenOption}

/** The metadata-I/O contract the snapshot commit protocol runs on — the
  * seam that makes the spine's atomicity PORTABLE instead of an accident
  * of POSIX. Every correctness-bearing metadata operation (version-claim
  * arbitration, pointer publish/read, publish-log create/append/read,
  * version visibility) goes through this trait; the DATA files
  * themselves are written by Spark's own committer and only ever live
  * inside a version directory that this layer has not yet made visible,
  * so they need no abstraction.
  *
  * Two implementations ship:
  *  - [[PosixSnapshotFileIO]] — the default: today's exact on-disk
  *    format and semantics, with atomic `rename(2)` as the claim
  *    arbiter and pointer flip. Byte-compatible with every table the
  *    engine has ever written.
  *  - [[ObjectStoreSnapshotFileIO]] — the rename-less profile: the
  *    ONLY primitives it allows itself are the ones an object store
  *    actually guarantees (atomic whole-object conditional PUT —
  *    S3 `If-None-Match` — plus read, list, delete). Directory rename
  *    does not exist there, so version claim becomes marker-file
  *    arbitration (conditional-put of `v<N>._claim`), data movement is
  *    an openly NON-atomic per-file copy whose torn intermediate states
  *    are invisible to readers until the `v<N>._sealed` marker lands,
  *    pointers are append-only generation objects resolved by
  *    max-name (a flip is ONE conditional PUT — atomic), and the
  *    publish log is a directory of one-line entry objects (appends
  *    on weakly-consistent stores cannot tear what was never a shared
  *    byte range). `ObjectStoreProtocolSpec` drives two-writer races
  *    and injected crash windows through every one of those gaps.
  *
  * Implementations are selected PER TABLE DIRECTORY via
  * [[SnapshotFileIO.register]] — a longest-prefix path registry, so a
  * test (or a future real object-store binding) can route one table
  * through the rename-less protocol while every other table in the JVM
  * keeps the POSIX fast path.
  */
trait SnapshotFileIO {

  /** Claim `target` (a `v<N>` directory name) for the fully-staged
    * directory `staged`. Returns true when THIS writer won the name —
    * after which `target` will become a complete, visible version —
    * and false when the name is already taken (lost a benign race:
    * retry the next number). Real I/O failures propagate.
    */
  def claimDir(staged: Path, target: Path): Boolean

  /** Publish pointer `name` (`current` or `ref.<branch>`) with
    * `content`, visible atomically to concurrent readers. Callers
    * serialize writers via the table lock; this method only has to
    * beat READERS, never another flip.
    */
  def publishPointer(dir: Path, name: String, content: String): Unit

  /** The pointer's current content, None when it has never been
    * published (or was dropped).
    */
  def readPointer(dir: Path, name: String): Option[String]

  /** Remove pointer `name`. Returns false when there was nothing to
    * drop.
    */
  def dropPointer(dir: Path, name: String): Boolean

  /** Names of all live pointers under `dir` (`current`, `ref.*`). */
  def listPointers(dir: Path): Seq[String]

  /** All COMPLETE (reader-visible) version numbers under `dir`,
    * ascending. A version a crashed writer half-materialized must
    * never appear here.
    */
  def listVersions(dir: Path): Seq[Long]

  /** The highest version number any writer has ever CLAIMED under
    * `dir` (complete or in-flight), 0 when none: the next claim must
    * start above this, or a writer could collide with a claim whose
    * data copy is still running.
    */
  def maxClaimed(dir: Path): Long

  /** Is `v<n>` a complete, reader-visible version? */
  def versionVisible(dir: Path, n: Long): Boolean

  /** Version numbers that were CLAIMED but never became visible — a
    * dead writer's torn debris ((claim, no seal) on the object-store
    * profile; structurally impossible under POSIX rename, so empty
    * there). Paired with `dropDebris` so [[SnapshotTable.gcOrphans]]
    * can reclaim what readers can never see.
    */
  def listDebris(dir: Path): Seq[Long]

  /** Age of the claim on `v<n>` in epoch-ms (claim-marker mtime; the
    * version directory's own mtime under POSIX) — gc's proof of
    * abandonment.
    */
  def claimedAtMs(dir: Path, n: Long): Long

  /** Remove a version's directory AND its claim/seal markers. Only
    * call on gc-adjudicated versions (debris, or aged-out orphans).
    */
  def dropVersion(dir: Path, n: Long): Unit

  /** Create the publish log with its first line iff no log exists.
    * Returns true when THIS caller created it; exactly one creation
    * can ever win, on any store.
    */
  def logCreateNew(log: Path, line: String): Boolean

  /** Append one line to the publish log (caller holds the table
    * lock; on the object-store profile even lockless appends cannot
    * tear).
    */
  def logAppend(log: Path, line: String): Unit

  /** Every log line, oldest first. Empty when no log exists. */
  def logRead(log: Path): Seq[String]

  def logExists(log: Path): Boolean
}

object SnapshotFileIO {

  /** The POSIX default — today's on-disk format, unchanged. */
  val posix: SnapshotFileIO = new PosixSnapshotFileIO

  @volatile private var overrides: List[(String, SnapshotFileIO)] = Nil

  /** Route every table directory under `prefix` through `io`.
    * Longest-prefix wins when registrations nest.
    */
  def register(prefix: String, io: SnapshotFileIO): Unit = synchronized {
    overrides = ((prefix, io) :: overrides.filterNot(_._1 == prefix))
      .sortBy(-_._1.length)
  }

  def unregister(prefix: String): Unit = synchronized {
    overrides = overrides.filterNot(_._1 == prefix)
  }

  def forDir(dir: String): SnapshotFileIO =
    overrides.find(o => dir.startsWith(o._1)).map(_._2).getOrElse(posix)
}

/** The default profile: POSIX atomic rename arbitrates version claims
  * and pointer flips — exactly the semantics (and bytes) the engine
  * has always written.
  */
final class PosixSnapshotFileIO extends SnapshotFileIO {

  override def claimDir(staged: Path, target: Path): Boolean =
    try {
      Files.move(staged, target, StandardCopyOption.ATOMIC_MOVE)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
      case _: java.nio.file.DirectoryNotEmptyException => false
      case e: java.nio.file.FileSystemException =>
        // raw rename(2) reports a non-empty target as ENOTEMPTY, which
        // surfaces as a generic FileSystemException on some JDK/fs
        // combinations — and its getMessage text is locale-dependent,
        // so never match it: re-check the TARGET. Exists = benign lost
        // claim; absent = real I/O failure.
        if (Files.exists(target)) false else throw e
    }

  override def publishPointer(dir: Path, name: String,
      content: String): Unit = {
    val tmp = dir.resolve(s".$name.tmp${content.hashCode.toHexString}")
    Files.writeString(tmp, content)
    Files.move(tmp, dir.resolve(name), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  override def readPointer(dir: Path, name: String): Option[String] = {
    val p = dir.resolve(name)
    if (!Files.exists(p)) None else Some(Files.readString(p))
  }

  override def dropPointer(dir: Path, name: String): Boolean =
    Files.deleteIfExists(dir.resolve(name))

  override def listPointers(dir: Path): Seq[String] = {
    val d = dir.toFile
    if (!d.isDirectory) Seq.empty
    else {
      val children = d.listFiles()
      require(children != null, s"listPointers: cannot list $dir")
      children.toSeq
        .filter(f => f.isFile &&
          (f.getName == "current" || f.getName.startsWith("ref.")))
        .map(_.getName).sorted
    }
  }

  override def listVersions(dir: Path): Seq[Long] = {
    val d = dir.toFile
    if (!d.isDirectory) Seq.empty
    else {
      val children = d.listFiles()
      // listFiles returns null on I/O error even for an existing
      // directory — loud guard, not an opaque NPE
      require(children != null, s"listVersions: cannot list $dir")
      children.toSeq
        .filter(f => f.isDirectory && f.getName.matches("v\\d+"))
        .map(_.getName.drop(1).toLong).sorted
    }
  }

  override def maxClaimed(dir: Path): Long =
    (listVersions(dir) :+ 0L).max

  override def versionVisible(dir: Path, n: Long): Boolean =
    Files.isDirectory(dir.resolve(s"v$n"))

  override def listDebris(dir: Path): Seq[Long] = Seq.empty

  override def claimedAtMs(dir: Path, n: Long): Long =
    dir.resolve(s"v$n").toFile.lastModified()

  override def dropVersion(dir: Path, n: Long): Unit =
    SnapshotTable.deleteTree(dir.resolve(s"v$n").toString)

  override def logCreateNew(log: Path, line: String): Boolean =
    try {
      Files.writeString(log, line + "\n", StandardOpenOption.CREATE_NEW)
      true
    } catch {
      case _: FileAlreadyExistsException => false
    }

  override def logAppend(log: Path, line: String): Unit =
    Files.writeString(log, line + "\n", StandardOpenOption.CREATE,
      StandardOpenOption.APPEND)

  override def logRead(log: Path): Seq[String] =
    if (!Files.exists(log)) Seq.empty
    else Files.readAllLines(log).toArray(Array.empty[String])
      .toSeq.filter(_.nonEmpty)

  override def logExists(log: Path): Boolean = Files.exists(log)
}

/** Thrown by [[ObjectStoreSnapshotFileIO]]'s injected crash points —
  * the spec's stand-in for a writer process dying mid-protocol.
  */
final class SimulatedStoreCrash(point: String)
  extends RuntimeException(s"simulated writer crash at '$point'")

/** The rename-less profile: every operation decomposes into the
  * primitives an object store actually guarantees — atomic
  * whole-object conditional PUT (create-if-absent), GET, LIST, DELETE
  * — and correctness never leans on rename atomicity, append
  * atomicity, or directory semantics.
  *
  * Layout deltas vs POSIX (all beside the POSIX names, so a table can
  * migrate profiles mid-life and old readers of either profile stay
  * correct):
  *  - `v<N>._claim`   — claim marker: conditional PUT arbitrates the
  *    version number; content is the staged-directory name, for
  *    debris forensics.
  *  - `v<N>._sealed`  — seal marker: PUT only after the data copy
  *    completed; a `v<N>` directory without it is INVISIBLE (a torn
  *    copy, never readable).
  *  - `_ptr.<name>/g<seq>` — pointer generations: a flip is one
  *    conditional PUT of the next-sequence object; readers resolve
  *    max-name. `DELETED` content is a drop tombstone.
  *  - `<log>.d/e<seq>-<nonce>` — log entries, one object per line,
  *    ordered by name; `e0-create` is the creation marker slot, so
  *    creation arbitration is one conditional PUT.
  *
  * Crash injection: set [[crashAt]] to one of `after-claim-marker`,
  * `mid-copy`, `before-seal` and the NEXT operation that reaches that
  * window throws [[SimulatedStoreCrash]] (one-shot), leaving exactly
  * the on-store debris a real dead writer would.
  */
final class ObjectStoreSnapshotFileIO extends SnapshotFileIO {

  @volatile var crashAt: Option[String] = None

  private def crash(point: String): Unit =
    if (crashAt.contains(point)) {
      crashAt = None
      throw new SimulatedStoreCrash(point)
    }

  /** The one atomic primitive: whole-object conditional PUT. */
  private def putIfAbsent(p: Path, content: String): Boolean =
    try {
      Files.writeString(p, content, StandardOpenOption.CREATE_NEW)
      true
    } catch {
      case _: FileAlreadyExistsException => false
    }

  private def claimMarker(dir: Path, n: Long) = dir.resolve(s"v$n._claim")
  private def sealMarker(dir: Path, n: Long) = dir.resolve(s"v$n._sealed")

  override def claimDir(staged: Path, target: Path): Boolean = {
    val dir = target.getParent
    val n = target.getFileName.toString.drop(1).toLong
    if (!putIfAbsent(claimMarker(dir, n), staged.getFileName.toString))
      return false
    crash("after-claim-marker")
    copyTree(staged, target)
    crash("before-seal")
    // the seal is what makes v<N> exist to readers; the claim winner
    // is the only writer that can reach this line for this N
    putIfAbsent(sealMarker(dir, n), "")
    SnapshotTable.deleteTree(staged.toString)
    true
  }

  /** Per-file PUTs, smallest paths first — deliberately NON-atomic,
    * with the `mid-copy` crash window after the first file so the spec
    * can freeze a half-copied version directory on the store.
    */
  private def copyTree(src: Path, dst: Path): Unit = {
    val walk = Files.walk(src)
    val all =
      try {
        val it = walk.iterator()
        val buf = Seq.newBuilder[Path]
        while (it.hasNext) buf += it.next()
        buf.result().sortBy(_.toString)
      } finally walk.close()
    var copied = 0
    all.foreach { p =>
      val rel = src.relativize(p)
      val out = dst.resolve(rel.toString)
      if (Files.isDirectory(p)) Files.createDirectories(out)
      else {
        Files.createDirectories(out.getParent)
        Files.copy(p, out)
        copied += 1
        if (copied == 1) crash("mid-copy")
      }
    }
  }

  private def ptrDir(dir: Path, name: String) = dir.resolve(s"_ptr.$name")

  private def ptrEntries(pd: Path): Seq[Path] =
    if (!Files.isDirectory(pd)) Seq.empty
    else {
      val children = pd.toFile.listFiles()
      require(children != null, s"ptrEntries: cannot list $pd")
      children.toSeq.filter(f => f.isFile && f.getName.matches("g\\d+"))
        .sortBy(_.getName.drop(1).toLong).map(_.toPath)
    }

  override def publishPointer(dir: Path, name: String,
      content: String): Unit = {
    val pd = ptrDir(dir, name)
    Files.createDirectories(pd)
    var seq = ptrEntries(pd).lastOption
      .map(_.getFileName.toString.drop(1).toLong + 1).getOrElse(1L)
    // the conditional PUT itself arbitrates lockless racers; the
    // loser of a sequence slot takes the next
    while (!putIfAbsent(pd.resolve(f"g$seq%012d"), content)) seq += 1
  }

  override def readPointer(dir: Path, name: String): Option[String] = {
    val entries = ptrEntries(ptrDir(dir, name))
    if (entries.nonEmpty) {
      val raw = Files.readString(entries.last)
      if (raw == "DELETED") None else Some(raw)
    } else {
      // legacy fallback: a POSIX-written table migrated onto this
      // profile keeps answering from its plain pointer file
      val p = dir.resolve(name)
      if (Files.exists(p)) Some(Files.readString(p)) else None
    }
  }

  override def dropPointer(dir: Path, name: String): Boolean =
    if (readPointer(dir, name).isEmpty) false
    else {
      if (ptrEntries(ptrDir(dir, name)).nonEmpty)
        publishPointer(dir, name, "DELETED")
      Files.deleteIfExists(dir.resolve(name))
      true
    }

  override def listPointers(dir: Path): Seq[String] = {
    val d = dir.toFile
    if (!d.isDirectory) return Seq.empty
    val children = d.listFiles()
    require(children != null, s"listPointers: cannot list $dir")
    val generational = children.toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("_ptr."))
      .map(_.getName.stripPrefix("_ptr."))
    val legacy = children.toSeq
      .filter(f => f.isFile &&
        (f.getName == "current" || f.getName.startsWith("ref.")))
      .map(_.getName)
    (generational ++ legacy).distinct
      .filter(n => readPointer(dir, n).isDefined).sorted
  }

  override def listVersions(dir: Path): Seq[Long] = {
    val d = dir.toFile
    if (!d.isDirectory) return Seq.empty
    val children = d.listFiles()
    require(children != null, s"listVersions: cannot list $dir")
    children.toSeq
      .filter(f => f.isDirectory && f.getName.matches("v\\d+"))
      .map(_.getName.drop(1).toLong)
      .filter(versionVisible(dir, _)).sorted
  }

  override def maxClaimed(dir: Path): Long = {
    val d = dir.toFile
    if (!d.isDirectory) return 0L
    val children = d.listFiles()
    require(children != null, s"maxClaimed: cannot list $dir")
    val claimed = children.toSeq.collect {
      case f if f.getName.matches("v\\d+\\._claim") =>
        f.getName.stripSuffix("._claim").drop(1).toLong
      case f if f.isDirectory && f.getName.matches("v\\d+") =>
        f.getName.drop(1).toLong
    }
    (claimed :+ 0L).max
  }

  override def versionVisible(dir: Path, n: Long): Boolean =
    Files.isDirectory(dir.resolve(s"v$n")) &&
      // sealed, or written by the POSIX profile (whose rename made the
      // directory appear complete — no claim marker exists for it)
      (Files.exists(sealMarker(dir, n)) ||
        !Files.exists(claimMarker(dir, n)))

  override def listDebris(dir: Path): Seq[Long] = {
    val d = dir.toFile
    if (!d.isDirectory) return Seq.empty
    val children = d.listFiles()
    require(children != null, s"listDebris: cannot list $dir")
    children.toSeq.collect {
      case f if f.getName.matches("v\\d+\\._claim") =>
        f.getName.stripSuffix("._claim").drop(1).toLong
    }.filterNot(versionVisible(dir, _)).sorted
  }

  override def claimedAtMs(dir: Path, n: Long): Long = {
    val claim = claimMarker(dir, n)
    if (Files.exists(claim)) claim.toFile.lastModified()
    else dir.resolve(s"v$n").toFile.lastModified()
  }

  override def dropVersion(dir: Path, n: Long): Unit = {
    SnapshotTable.deleteTree(dir.resolve(s"v$n").toString)
    Files.deleteIfExists(sealMarker(dir, n))
    Files.deleteIfExists(claimMarker(dir, n))
  }

  private def logDir(log: Path) =
    log.resolveSibling(log.getFileName.toString + ".d")

  private def logEntries(ld: Path): Seq[Path] =
    if (!Files.isDirectory(ld)) Seq.empty
    else {
      val children = ld.toFile.listFiles()
      require(children != null, s"logEntries: cannot list $ld")
      children.toSeq.filter(f => f.isFile && f.getName.startsWith("e"))
        .sortBy(_.getName).map(_.toPath)
    }

  override def logCreateNew(log: Path, line: String): Boolean = {
    if (logExists(log)) return false
    val ld = logDir(log)
    Files.createDirectories(ld)
    // the fixed creation-slot name makes racing first-committers
    // arbitrate on one conditional PUT, exactly like CREATE_NEW
    putIfAbsent(ld.resolve("e000000000000-create"), line)
  }

  override def logAppend(log: Path, line: String): Unit = {
    val ld = logDir(log)
    Files.createDirectories(ld)
    val seq = logEntries(ld).lastOption
      .map(_.getFileName.toString.drop(1).takeWhile(_.isDigit).toLong + 1)
      .getOrElse(1L)
    val nonce = java.util.UUID.randomUUID().toString.take(8)
    // nonce-unique names cannot collide; same-sequence concurrent
    // appends order by nonce — arbitrary, as real stores are
    require(putIfAbsent(ld.resolve(f"e$seq%012d-$nonce"), line),
      s"logAppend: nonce collision on $ld")
  }

  override def logRead(log: Path): Seq[String] = {
    // legacy (POSIX-written) lines first: they predate every entry
    val legacy =
      if (!Files.exists(log)) Seq.empty
      else Files.readAllLines(log).toArray(Array.empty[String])
        .toSeq.filter(_.nonEmpty)
    legacy ++ logEntries(logDir(log)).map(Files.readString(_).trim)
      .filter(_.nonEmpty)
  }

  override def logExists(log: Path): Boolean =
    Files.exists(log) || logEntries(logDir(log)).nonEmpty
}
