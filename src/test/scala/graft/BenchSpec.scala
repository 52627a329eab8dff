package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench stdout artifact's length invariant: the driver keeps
  * only the last ~2000 chars of stdout (plus its own ~75-char runner
  * footer), so the compact line must stay far below that no matter how
  * many queries register. Round 4 shipped an unparseable artifact
  * because the full per-query map crossed the window.
  */
class BenchSpec extends SparkSpec {

  private def fakeResults(n: Int): Seq[(String, Double)] =
    (1 to n).map(i => f"some_quite_long_query_name_$i%03d" -> (i * 0.37))

  test("compact line stays under 1500 chars even at 300 queries") {
    for (n <- Seq(1, 10, 74, 150, 300)) {
      val line = Bench.compactLine(fakeResults(n), Nil, Nil, "/root/testdata/sf0.1")
      assert(line.length < 1500, s"n=$n: line is ${line.length} chars")
      assert(line.startsWith("{\"metric\":\"total\""))
      assert(line.endsWith("}"))
    }
  }

  test("compact line keeps the slowest queries and valid JSON punctuation") {
    val line = Bench.compactLine(fakeResults(100), Seq("bad_q"), Seq("noisy_q"),
      "/root/testdata/sf0.1")
    // slowest entry (i=100) must be present; fastest must be dropped
    assert(line.contains("some_quite_long_query_name_100"))
    assert(!line.contains("\"some_quite_long_query_name_001\""))
    assert(line.contains("\"failed\":[\"bad_q\"]"))
    assert(line.contains("\"suspect\":[\"noisy_q\"]"))
    assert(line.contains("\"n_queries\":100"))
    // no decimal commas (digit,digit) regardless of platform locale
    assert("[0-9],[0-9]".r.findFirstIn(line).isEmpty, line)
    assert(line.count(_ == '{') == line.count(_ == '}'))
  }

  test("mass failure stays bounded and failed queries leave the total") {
    val rs = fakeResults(300)
    val allFailed = rs.map(_._1)
    val line = Bench.compactLine(rs, allFailed, allFailed, "/root/testdata/sf0.1")
    assert(line.length < 1500, s"mass failure blew the window: ${line.length}")
    assert(line.contains("\"n_failed\":300"))
    assert(line.contains("...+292 more"))
    // every query failed -> succeeded-total is zero, not the sum of
    // crash durations
    assert(line.contains("\"value\":0.00"))
  }

  test("cache hygiene: no cached entries survive a Bench-protocol pass") {
    // the heaviest persisting queries in the registry — the unscoped
    // "no eager unpersist" sites (ccnet/bm25) plus a withPersisted
    // site (bpe_train_merges). The Bench protocol is action +
    // clearCache; after it, the CacheManager must be EMPTY, or
    // MEMORY_AND_DISK entries accumulate across a full-registry pass
    val dir = "/root/testdata/sf0.001"
    for (q <- Seq("ccnet_perplexity_buckets", "bm25_rank",
        "lang_id_chargram", "bpe_train_merges")) {
      SparkEntry.queries(q)(spark, dir).queryExecution.toRdd.count()
      spark.catalog.clearCache()
    }
    assert(spark.sharedState.cacheManager.isEmpty,
      "cached plans survive the clearCache protocol")
  }

  test("compact line carries the probe host factor") {
    val line = Bench.compactLine(fakeResults(5), Nil, Nil, "sf", 1.84)
    assert(line.contains("\"host\":1.84"), line)
    // default (no probe floor) discloses unknown as 0.00, not absence
    val bare = Bench.compactLine(fakeResults(5), Nil, Nil, "sf")
    assert(bare.contains("\"host\":0.00"), bare)
  }

  test("decimal formatting is locale-independent") {
    val prev = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(java.util.Locale.GERMANY)
      val line = Bench.compactLine(Seq("q" -> 1.5), Nil, Nil, "sf")
      assert(line.contains("\"q\":1.50"), line)
    } finally java.util.Locale.setDefault(prev)
  }

  test("loadWatermarks merges mixed flat and nested rows, nested wins") {
    val f = java.nio.file.Files.createTempFile("graft_wm", ".json")
    // a partially-migrated dev file: one flat legacy row, one nested —
    // nested-wins-all used to silently drop the flat floor entirely
    java.nio.file.Files.writeString(f,
      """{"q_flat": 1.5, "q_nested": {"floor": 2.25, "host": 1.01,
        | "host_note": "x"}}""".stripMargin)
    val wm = Bench.loadWatermarks(f.toString)
    assert(wm == Map("q_flat" -> 1.5, "q_nested" -> 2.25), wm.toString)
    // nested rows' inner fields never masquerade as query names
    assert(!wm.contains("floor") && !wm.contains("host"))
    // pure forms still parse
    java.nio.file.Files.writeString(f, """{"a": 0.5, "b": 3.0}""")
    assert(Bench.loadWatermarks(f.toString) == Map("a" -> 0.5, "b" -> 3.0))
    java.nio.file.Files.writeString(f,
      """{"a": {"floor": 0.5, "host": 1.0}}""")
    assert(Bench.loadWatermarks(f.toString) == Map("a" -> 0.5))
  }
}
