package graft

import org.apache.spark.sql.DataFrame

import graft.ops.{ObjectStoreSnapshotFileIO, SimulatedStoreCrash}
import graft.ops.{SnapshotFileIO, SnapshotTable}

/** The rename-less commit protocol ([[ObjectStoreSnapshotFileIO]]):
  * the spine's atomicity re-derived from the primitives an object
  * store actually guarantees (conditional PUT, GET, LIST, DELETE —
  * no atomic rename, no atomic append), driven through two-writer
  * races and injected crash windows. Torn intermediate states are
  * REAL here — the shim's claim is a marker file and its data move is
  * an openly non-atomic per-file copy — so every test is a statement
  * that readers can never observe them.
  */
class ObjectStoreProtocolSpec extends SparkSpec {

  private def withShim[A](f: (String, ObjectStoreSnapshotFileIO) => A): A = {
    val root = java.nio.file.Files.createTempDirectory("osstore").toString
    val shim = new ObjectStoreSnapshotFileIO
    SnapshotFileIO.register(root, shim)
    try f(s"$root/t", shim)
    finally {
      SnapshotFileIO.unregister(root)
      SnapshotTable.deleteTree(root)
    }
  }

  private def df(ks: Range, tagv: Long) = {
    import spark.implicits._
    ks.map(k => (k.toLong, k.toLong * tagv)).toDF("k", "x")
  }

  private def rows(d: DataFrame): Seq[(Long, Long)] =
    d.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted

  /** The full lifecycle on one profile: commit, append, MOR delete,
    * MOR upsert, compaction, branch WAP, drop. Returns (rows at each
    * published main version, final branch list).
    */
  private def lifecycle(dir: String): (Seq[Seq[(Long, Long)]], Seq[String]) = {
    import spark.implicits._
    val v1 = SnapshotTable.commit(df(1 to 40, 10L), dir,
      expectedVersion = SnapshotTable.ExpectEmpty)
    val v2 = SnapshotTable.commitAppend(df(41 to 60, 10L), dir,
      expectedVersion = v1)
    val v3 = SnapshotTable.commitDeletes(
      (1L to 10L).toDF("k"), dir, expectedVersion = v2)
    val v4 = SnapshotTable.commitUpsert(df(55 to 70, 1000L),
      Seq("k"), dir, expectedVersion = v3)
    // compaction: full rewrite of the resolved chain cuts it
    val v5 = SnapshotTable.commit(
      SnapshotTable.readAt(spark, dir, v4), dir, expectedVersion = Some(v4))
    // WAP: a candidate only main sees after publish
    SnapshotTable.commitToBranch(df(1 to 5, 7L), dir, "audit",
      expectedBranchVersion = SnapshotTable.ExpectEmpty)
    SnapshotTable.publishBranch(dir, "audit", expectedVersion = Some(v5))
    val mains = Seq(v1, v2, v3, v4, v5,
      SnapshotTable.currentVersion(dir).get)
      .map(v => rows(SnapshotTable.readAt(spark, dir, v)))
    (mains, SnapshotTable.branches(dir))
  }

  test("full table lifecycle on the rename-less profile matches POSIX") {
    withShim { (shimDir, _) =>
      val posixDir = java.nio.file.Files
        .createTempDirectory("posix").resolve("t").toString
      val (a, ab) = lifecycle(shimDir)
      val (b, bb) = lifecycle(posixDir)
      assert(a == b, "per-version chain reads diverged between profiles")
      assert(ab == bb)
      assert(SnapshotTable.versions(shimDir) ==
        SnapshotTable.versions(posixDir))
      // provenance too: same refs in the same order (timestamps differ)
      assert(SnapshotTable.publishEvents(shimDir).map(e => (e._1, e._2)) ==
        SnapshotTable.publishEvents(posixDir).map(e => (e._1, e._2)))
      SnapshotTable.deleteTree(
        posixDir.stripSuffix("/t"))
    }
  }

  test("a crash after the claim marker never yields a visible version") {
    withShim { (dir, shim) =>
      val v1 = SnapshotTable.commit(df(1 to 10, 1L), dir,
        expectedVersion = SnapshotTable.ExpectEmpty)
      shim.crashAt = Some("after-claim-marker")
      intercept[SimulatedStoreCrash] {
        SnapshotTable.commit(df(11 to 20, 1L), dir, expectedVersion = Some(v1))
      }
      // the dead writer's claim left NO readable state change
      assert(SnapshotTable.versions(dir) == Seq(1L))
      assert(SnapshotTable.currentVersion(dir).contains(v1))
      // the number is BURNED, not reused: the next writer must skip it
      // (its claim marker may still belong to a mid-copy live writer)
      val v3 = SnapshotTable.commit(df(11 to 20, 1L), dir,
        expectedVersion = Some(v1))
      assert(v3 == 3L)
      assert(rows(SnapshotTable.read(spark, dir)) == rows(df(11 to 20, 1L)))
    }
  }

  test("a torn mid-copy directory is invisible and GC reclaims it") {
    withShim { (dir, shim) =>
      val v1 = SnapshotTable.commit(df(1 to 10, 1L), dir,
        expectedVersion = SnapshotTable.ExpectEmpty)
      shim.crashAt = Some("mid-copy")
      intercept[SimulatedStoreCrash] {
        SnapshotTable.commit(df(11 to 20, 1L), dir, expectedVersion = Some(v1))
      }
      // the half-copied v2 directory IS on the store…
      assert(java.nio.file.Files.isDirectory(
        java.nio.file.Paths.get(dir, "v2")))
      // …and no reader can see it
      assert(SnapshotTable.versions(dir) == Seq(1L))
      val e = intercept[IllegalArgumentException] {
        SnapshotTable.readAt(spark, dir, 2L)
      }
      assert(e.getMessage.contains("no complete version"))
      // age-gated reclaim removes the debris and its markers
      Thread.sleep(10)
      assert(SnapshotTable.gcOrphans(dir, olderThanMs = 1L) == Seq(2L))
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(dir, "v2")))
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(dir, "v2._claim")))
      // the reclaimed number is claimable again
      val v2b = SnapshotTable.commit(df(11 to 20, 1L), dir,
        expectedVersion = Some(v1))
      assert(v2b == 2L)
      assert(rows(SnapshotTable.read(spark, dir)) == rows(df(11 to 20, 1L)))
    }
  }

  test("a crash between copy and seal leaves complete-but-dead data") {
    withShim { (dir, shim) =>
      val v1 = SnapshotTable.commit(df(1 to 10, 1L), dir,
        expectedVersion = SnapshotTable.ExpectEmpty)
      shim.crashAt = Some("before-seal")
      intercept[SimulatedStoreCrash] {
        SnapshotTable.commit(df(11 to 20, 1L), dir, expectedVersion = Some(v1))
      }
      // every byte of v2 is on the store, but without the seal it
      // never happened — conservative by design: the writer died
      // before its commit point
      assert(SnapshotTable.versions(dir) == Seq(1L))
      assert(SnapshotTable.currentVersion(dir).contains(v1))
      Thread.sleep(10)
      assert(SnapshotTable.gcOrphans(dir, olderThanMs = 1L) == Seq(2L))
    }
  }

  test("two concurrent writers both land; claim markers arbitrate") {
    withShim { (dir, _) =>
      import java.util.concurrent.{CountDownLatch, Executors}
      val pool = Executors.newFixedThreadPool(2)
      val start = new CountDownLatch(1)
      val vs = (0 until 2).map { i =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long = {
            start.await()
            // unconditional commits: both must land, on distinct numbers
            SnapshotTable.commit(df(1 to 10, (i + 1).toLong), dir)
          }
        })
      }
      start.countDown()
      val claimed = vs.map(_.get()).sorted
      pool.shutdown()
      assert(claimed == Seq(1L, 2L))
      assert(SnapshotTable.versions(dir) == Seq(1L, 2L))
      // the pointer is at the higher claim (monotonic flip), and both
      // versions read back complete
      assert(SnapshotTable.currentVersion(dir).contains(2L))
      assert(rows(SnapshotTable.readAt(spark, dir, 1L)).size == 10)
      assert(rows(SnapshotTable.readAt(spark, dir, 2L)).size == 10)
    }
  }

  test("readers racing pointer flips never see a torn or absent pointer") {
    withShim { (dir, _) =>
      var v = SnapshotTable.commit(df(1 to 10, 1L), dir,
        expectedVersion = SnapshotTable.ExpectEmpty)
      @volatile var stop = false
      @volatile var torn: Option[String] = None
      val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      val reader = new Thread(() => {
        var last = 0L
        while (!stop && torn.isEmpty) {
          SnapshotTable.currentVersion(dir) match {
            case Some(cur) =>
              if (cur < last) torn = Some(s"pointer went backwards: $last -> $cur")
              last = cur
              seen.add(cur)
            case None => torn = Some("pointer vanished mid-flip")
          }
        }
      })
      reader.start()
      (2 to 12).foreach { i =>
        v = SnapshotTable.commit(df(1 to 10, i.toLong), dir,
          expectedVersion = Some(v))
      }
      stop = true
      reader.join()
      assert(torn.isEmpty, torn.getOrElse(""))
      assert(seen.size() > 0)
    }
  }

  test("concurrent log appends survive as distinct objects, all readable") {
    withShim { (dir, shim) =>
      SnapshotTable.commit(df(1 to 5, 1L), dir,
        expectedVersion = SnapshotTable.ExpectEmpty)
      val log = java.nio.file.Paths.get(dir, "publishes.log")
      val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
      val fs = (0 until 4).map { t =>
        pool.submit(new Runnable {
          def run(): Unit = (0 until 25).foreach { i =>
            shim.logAppend(log, s"v99\tstress-$t-$i\t123")
          }
        })
      }
      fs.foreach(_.get())
      pool.shutdown()
      val lines = shim.logRead(log).filter(_.contains("stress-"))
      assert(lines.size == 100, s"lost appends: ${lines.size}/100")
      assert(lines.distinct.size == 100)
    }
  }

  test("a POSIX-written table keeps answering after profile migration") {
    val root = java.nio.file.Files.createTempDirectory("migrate").toString
    val dir = s"$root/t"
    // life before the migration: plain POSIX protocol
    val v1 = SnapshotTable.commit(df(1 to 20, 1L), dir,
      expectedVersion = SnapshotTable.ExpectEmpty)
    SnapshotTable.commitToBranch(df(1 to 3, 5L), dir, "wip",
      expectedBranchVersion = SnapshotTable.ExpectEmpty)
    val shim = new ObjectStoreSnapshotFileIO
    SnapshotFileIO.register(root, shim)
    try {
      // legacy pointers, versions, and log lines all still resolve
      assert(SnapshotTable.currentVersion(dir).contains(v1))
      assert(SnapshotTable.versions(dir) == Seq(1L, 2L))
      assert(SnapshotTable.branches(dir) == Seq("wip"))
      assert(rows(SnapshotTable.read(spark, dir)) == rows(df(1 to 20, 1L)))
      // and new commits through the rename-less protocol extend them
      val v3 = SnapshotTable.commit(df(21 to 30, 1L), dir,
        expectedVersion = Some(v1))
      assert(v3 == 3L)
      assert(SnapshotTable.currentVersion(dir).contains(3L))
      assert(SnapshotTable.publishEvents(dir).map(_._1).contains(3L))
      SnapshotTable.dropBranch(dir, "wip")
      assert(SnapshotTable.branches(dir).isEmpty)
    } finally {
      SnapshotFileIO.unregister(root)
      SnapshotTable.deleteTree(root)
    }
  }

  test("existing lake gates run green on the rename-less profile") {
    val sfDir = "/root/testdata/sf0.001"
    val names = Seq("snapshot_time_travel", "schema_drift_union",
      "snapshot_branch_asof", "snapshot_mor_upsert")
    // posix pass first, then the same gates with the whole lake root
    // routed through the shim — row-identical answers required
    val posix = names.map(n =>
      graft.queries.Registry.queries(n)(spark, sfDir).collect().toSeq)
    val prefix = s"${SnapshotTable.lakeRoot}/" +
      sfDir.replaceAll("[^a-zA-Z0-9]", "_")
    val shim = new ObjectStoreSnapshotFileIO
    SnapshotFileIO.register(prefix, shim)
    try {
      val shimmed = names.map(n =>
        graft.queries.Registry.queries(n)(spark, sfDir).collect().toSeq)
      names.indices.foreach { i =>
        assert(shimmed(i) == posix(i), s"gate ${names(i)} diverged on shim")
      }
    } finally SnapshotFileIO.unregister(prefix)
  }
}
