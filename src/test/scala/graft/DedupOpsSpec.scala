package graft

import org.apache.spark.sql.functions._
import graft.ops.{DedupOps, TextOps}

class DedupOpsSpec extends SparkSpec {
  import spark.implicits._

  test("wordShingles: k-grams, distinct, short docs empty") {
    val df = Seq("a b c d", "a b", "x x x x x").toDF("text")
    val got = df.select(DedupOps.wordShingles($"text", 3).as("s"))
      .as[Seq[String]].collect().toSeq
    assert(got(0).toSet == Set("a b c", "b c d"))
    assert(got(1).isEmpty)
    assert(got(2) == Seq("x x x")) // distinct collapses repeats
  }

  test("minhash signature is deterministic and identical for identical docs") {
    val df = Seq(("a", "x y z w"), ("b", "x y z w"), ("c", "p q r s"))
      .toDF("id", "text")
      .select($"id", DedupOps.minhashSignature(
        DedupOps.wordShingles($"text", 2), 8).as("sig"))
    val sigs = df.as[(String, Seq[Long])].collect().toMap
    assert(sigs("a") == sigs("b"))
    assert(sigs("a") != sigs("c"))
    assert(sigs("a").size == 8)
  }

  test("estimatedJaccard: identical=1, disjoint=0") {
    val df = Seq(("x y z a b c", "x y z a b c", "q w e r t u"))
      .toDF("t1", "t2", "t3")
      .select(
        DedupOps.estimatedJaccard(
          DedupOps.minhashSignature(DedupOps.wordShingles($"t1", 2), 8),
          DedupOps.minhashSignature(DedupOps.wordShingles($"t2", 2), 8), 8).as("same"),
        DedupOps.estimatedJaccard(
          DedupOps.minhashSignature(DedupOps.wordShingles($"t1", 2), 8),
          DedupOps.minhashSignature(DedupOps.wordShingles($"t3", 2), 8), 8).as("diff"))
    val (same, diff) = df.as[(Double, Double)].first()
    assert(same == 1.0)
    assert(diff == 0.0)
  }

  test("lshCandidates finds identical docs, skips unrelated") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog end"),
      (2L, "the quick brown fox jumps over the lazy dog end"),
      (3L, "completely different words nothing shared here at all ok"))
      .toDF("doc_id", "text")
      .select($"doc_id", DedupOps.minhashSignature(
        DedupOps.wordShingles($"text", 3), 8).as("sig"))
    val pairs = DedupOps.lshCandidates(docs, "doc_id", "sig", 4, 2)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("jaccardSorted equals hash-set jaccard on sorted distinct arrays") {
    val docs = Seq(
      ("a b c d e f", "a b c d e g"),
      ("x y z w v u", "p q r s t o"),
      ("m n o p q r", "m n o p q r"))
      .toDF("t1", "t2")
      .select(
        DedupOps.sortedShingleHashes($"t1", 2).as("h1"),
        DedupOps.sortedShingleHashes($"t2", 2).as("h2"))
    val rows = docs.select(
      DedupOps.jaccardSorted($"h1", $"h2").as("js"),
      DedupOps.jaccard($"h1", $"h2").as("jh")).collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
    assert(rows(2).getDouble(0) == 1.0)
    assert(rows(1).getDouble(0) == 0.0)
  }

  test("jaccard exact") {
    val df = Seq(1).toDF("x").select(
      DedupOps.jaccard(
        array(lit("a"), lit("b"), lit("c")),
        array(lit("b"), lit("c"), lit("d"))).as("j"))
    assert(math.abs(df.as[Double].first() - 0.5) < 1e-12)
  }

  test("simhash: self-hamming 0, near-doc small, far-doc large") {
    val df = DedupOps.simhashed(
      Seq(
        ("a", "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"),
        ("b", "w1 w2 w3 w4 w5 w6 w7 w8 w9 w11"),
        ("c", "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10"))
        .toDF("id", "text"),
      "id", "text", 24, 99)
    val h = df.as[(String, Long)].collect().toMap
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(ham(h("a"), h("a")) == 0)
    assert(ham(h("a"), h("b")) < ham(h("a"), h("c")))
  }

  // the HOF pipelines are the executable spec for the native kernels:
  // every value must be bit-identical on a corpus with short docs,
  // repeats, empty tokens (double spaces), and unicode
  private val crossDocs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),
    (3L, "a b"), // below k=3 tokens
    (4L, "x  y  z w v"), // empty tokens from double spaces
    (5L, "naive cafe jalapeno uber resume"),
    (6L, "rep rep rep rep rep rep"), // shingle repeats collapse
    (7L, "p q r s t u v w x y z aa bb cc dd"))

  test("native shingleHashSet == array_sort(distinct(HOF shingleHashes))") {
    val df = crossDocs.toDF("id", "text")
    val rows = df.select(
        $"id",
        DedupOps.shingleHashSetNative($"text", 3).as("native"),
        when(size(DedupOps.shingleHashes($"text", 3)) > 0,
          array_sort(array_distinct(DedupOps.shingleHashes($"text", 3)))).as("hof"))
      .as[(Long, Option[Seq[Long]], Option[Seq[Long]])].collect()
    rows.foreach { case (id, n, h) => assert(n == h, s"doc $id") }
    assert(rows.count(_._2.isEmpty) == 1) // only the 2-token doc is null
  }

  test("native minhashSig == HOF minhashFromHashes ∘ shingleHashes") {
    val df = crossDocs.toDF("id", "text")
    val rows = df.select(
        $"id",
        DedupOps.minhashSigNative($"text", 3, 8).as("native"),
        when(size(DedupOps.shingleHashes($"text", 3)) > 0,
          DedupOps.minhashFromHashes(
            DedupOps.shingleHashes($"text", 3), 8)).as("hof"))
      .as[(Long, Option[Seq[Long]], Option[Seq[Long]])].collect()
    rows.foreach { case (id, n, h) => assert(n == h, s"doc $id") }
  }

  test("native simhash == HOF simhashed for every doc") {
    val df = crossDocs.toDF("id", "text")
    val native = df.select($"id", DedupOps.simhashNative($"text", 24, 99).as("sim"))
      .as[(Long, Long)].collect().toMap
    val hof = DedupOps.simhashed(df, "id", "text", 24, 99)
      .as[(Long, Long)].collect().toMap
    assert(native == hof)
  }

  test("connectedComponents: long-diameter chain needs >20 rounds, bounded plans") {
    // 0-1-2-...-24 in a single chain: min-label propagation moves the 0
    // label one hop per round, so convergence takes ~24 rounds — well past
    // several checkpoint intervals, proving lineage stays bounded and the
    // loop still converges (the LSH graphs in the queries have tiny
    // diameters and would never exercise this path). localThreshold = 0
    // forces the DISTRIBUTED path this test exists to exercise.
    val n = 25
    val chain = (0 until n - 1).map(i => (i.toLong, (i + 1).toLong))
    val labels = DedupOps.connectedComponents(
        DedupOps.symmetrize(chain.toDF("src", "dst")), maxIter = 40,
        localThreshold = 0)
      .as[(Long, Long)].collect().toMap
    assert(labels.size == n)
    assert(labels.values.toSet == Set(0L)) // one component, min id 0
    // two components + an isolated-pair sanity pass through the same API
    val two = DedupOps.connectedComponents(DedupOps.symmetrize(
      Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("src", "dst")),
      localThreshold = 0)
      .as[(Long, Long)].collect().toMap
    assert(two == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("connectedComponents: local union-find path matches the distributed loop") {
    // braided components with cross-links and isolated pairs — the local
    // path (default threshold) must produce exactly the distributed
    // loop's labels
    val edges = Seq(
      (5L, 3L), (3L, 9L), (9L, 5L), (9L, 11L),   // cycle + tail, min 3
      (20L, 22L), (21L, 22L), (20L, 21L),        // triangle, min 20
      (40L, 41L),                                // pair
      (50L, 51L), (51L, 52L), (52L, 53L), (53L, 50L)) // cycle, min 50
    val sym = DedupOps.symmetrize(edges.toDF("src", "dst"))
    val local = DedupOps.connectedComponents(sym)
      .as[(Long, Long)].collect().toMap
    val dist = DedupOps.connectedComponents(sym, localThreshold = 0)
      .as[(Long, Long)].collect().toMap
    assert(local == dist)
    assert(local(11L) == 3L && local(21L) == 20L && local(41L) == 40L
      && local(53L) == 50L)
  }

  test("connectedComponents: empty edge list yields an empty label frame") {
    // a corpus with no duplicate pairs is routine, not an error — on the
    // distributed path the NULL sum over zero rows must not fire the
    // overflow guard; both paths must return the empty (id, label) frame
    for (threshold <- Seq(1000000L, 0L)) {
      val out = DedupOps.connectedComponents(
        DedupOps.symmetrize(Seq.empty[(Long, Long)].toDF("src", "dst")),
        localThreshold = threshold)
      assert(out.count() == 0)
      assert(out.columns.toSeq == Seq("id", "label"))
    }
  }

  test("connectedComponents refuses to emit unconverged labels") {
    val chain = (0 until 10).map(i => (i.toLong, (i + 1).toLong))
    intercept[IllegalArgumentException] {
      DedupOps.connectedComponents(
        DedupOps.symmetrize(chain.toDF("src", "dst")), maxIter = 2,
        localThreshold = 0)
    }
  }

  test("portableHash64 is stable across invocations") {
    val v1 = Seq(1).toDF("x").select(TextOps.portableHash64(lit("abc"), 0)).first().getLong(0)
    val v2 = Seq(1).toDF("x").select(TextOps.portableHash64(lit("abc"), 0)).first().getLong(0)
    val v3 = Seq(1).toDF("x").select(TextOps.portableHash64(lit("abc"), 1)).first().getLong(0)
    assert(v1 == v2)
    assert(v1 != v3)
  }

  // ------------------------- pair-free bucket-keeper dedup

  test("lshKeeper: identical docs collapse to the min id, outsider survives") {
    val same = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (10L, same), (11L, same), (12L, same),
      (20L, "completely different words about query engines and columnar io")
    ).toDF("doc_id", "text")
    val got = graft.queries.DedupQueries.lshKeeper(docs)
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(got == Seq(
      (10L, 10L, true), (11L, 10L, false), (12L, 10L, false),
      (20L, 20L, true)))
  }

  test("dedup_lsh_keeper agrees with the pair query: every doc_b is dropped") {
    val dir = "/root/testdata/sf0.001"
    val keeper = graft.queries.DedupQueries.queries
      .find(_.name == "dedup_lsh_keeper").get.fn(spark, dir)
      .as[(Long, Long, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    // invariants: keeper <= doc_id; kept iff keeper == doc_id
    keeper.foreach { case (id, (k, kept)) =>
      assert(k <= id); assert(kept == (k == id))
    }
    // a pair (a,b) from the pair query shares a band bucket, so b's
    // keeper is at most a < b — b can never be kept
    val pairs = graft.queries.DedupQueries.queries
      .find(_.name == "dedup_minhash_lsh").get.fn(spark, dir)
      .as[(Long, Long, Double)].collect().toSeq
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b, _) =>
      assert(keeper(b)._1 <= a && !keeper(b)._2,
        s"pair ($a,$b): doc_b should be dropped, keeper=${keeper(b)}")
    }
  }
  test("canonicalUrl: spellings collapse, real params survive") {
    val urls = Seq(
      "https://example.org/page/7",
      "https://example.org/page/7/",
      "https://www.example.org/page/7?utm_source=feed&utm_campaign=mail",
      "HTTPS://WWW.example.org/page/7#frag",
      "https://example.org/page/7?page=2",
      // tracking param BETWEEN real params: separators must be tidied
      "https://example.org/page/7?a=1&utm_source=x&b=2",
      // tracking param FIRST, real param after
      "https://example.org/page/7?utm_medium=y&b=2"
    ).toDF("u").select(graft.ops.TextOps.canonicalUrl($"u"))
      .as[String].collect().toSeq
    assert(urls == Seq(
      "example.org/page/7",
      "example.org/page/7",
      "example.org/page/7",
      "example.org/page/7",
      "example.org/page/7?page=2",
      "example.org/page/7?a=1&b=2",
      "example.org/page/7?b=2"))
  }

  // --------------- quality-aware bucket keeper

  test("lshKeeperQuality: kept iff argmax of every occupied bucket (independent recount)") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.queries.DedupQueries.queries
      .find(_.name == "dedup_keeper_quality").get.fn(spark, dir)
      .as[(Long, Long, Long, Long, Boolean)].collect().toSeq
    assert(got.nonEmpty)
    // invariants: the doc itself is in every bucket it occupies, so the
    // keeper dominates it in (score, -id) order; kept iff keeper == id
    got.foreach { case (id, score, keeper, kScore, kept) =>
      assert(kScore > score || (kScore == score && keeper <= id),
        s"doc $id: keeper ($keeper, $kScore) does not dominate ($id, $score)")
      assert(kept == (keeper == id))
    }
    // independent recount through a different code path: collect the
    // banded (doc, band, key, score) frame (4 rows/doc at sf0.001) and
    // fold the two-level argmax in plain Scala
    import graft.queries.{DedupQueries, LmPipeline}
    import graft.ops.{DedupOps, Tables, TextOps}
    val banded = Tables.documents(spark, dir)
      .select($"doc_id",
        DedupOps.minhashSigNative($"text", 3, 8).as("sig"),
        LmPipeline.classifierScoreCol(TextOps.tokens($"text")).as("sc"))
      .filter($"sig".isNotNull)
      .select($"doc_id", $"sc",
        explode(DedupOps.lshBands($"sig", 4, 2)).as("b"))
      .select($"doc_id", $"sc", $"b.band", $"b.key")
      .as[(Long, Long, Int, String)].collect().toSeq
    val bucketBest = banded.groupBy(r => (r._3, r._4)).view
      .mapValues(_.map(r => (r._2, -r._1)).max).toMap
    val want = banded.groupBy(_._1).view.mapValues { rows =>
      val (s, nid) = rows.map(r => bucketBest((r._3, r._4))).max
      (-nid, s)
    }.toMap
    got.foreach { case (id, _, keeper, kScore, _) =>
      assert(want(id) == ((keeper, kScore)), s"doc $id")
    }
  }

  test("resolveSurvivors: chain fixed point, local and distributed agree") {
    // keeper forest: 5→4→2→1→1 (chain), 3→3 (root), 9→8→8, plus a
    // merge: 7→2 joins the 1-rooted tree mid-chain
    val assign = Seq(
      (1L, 1L), (2L, 1L), (4L, 2L), (5L, 4L), (7L, 2L),
      (3L, 3L), (8L, 8L), (9L, 8L)).toDF("id", "p")
    val want = Map(1L -> 1L, 2L -> 1L, 4L -> 1L, 5L -> 1L, 7L -> 1L,
      3L -> 3L, 8L -> 8L, 9L -> 8L)
    val local = DedupOps.resolveSurvivors(assign)
      .as[(Long, Long)].collect().toMap
    assert(local == want)
    // localThreshold=0 forces the pointer-doubling path — must agree
    val dist = DedupOps.resolveSurvivors(assign, localThreshold = 0)
      .as[(Long, Long)].collect().toMap
    assert(dist == want)
    // every survivor is itself a root: referential validity, the
    // property the one-step keeper column lacks
    assert(want.values.toSet.forall(s => want(s) == s))
  }

  test("resolveSurvivorsGeneric handles ASCENDING (quality-style) chains") {
    // pointers may point at HIGHER ids (better score wins, not min id):
    // 1→5→9→9 (ascending chain), 2→9, 3→3, 7→5
    val assign = Seq(
      (1L, 5L), (5L, 9L), (9L, 9L), (2L, 9L), (3L, 3L), (7L, 5L))
      .toDF("id", "p")
    val want = Map(1L -> 9L, 5L -> 9L, 9L -> 9L, 2L -> 9L, 3L -> 3L,
      7L -> 9L)
    assert(DedupOps.resolveSurvivorsGeneric(assign)
      .as[(Long, Long)].collect().toMap == want)
    assert(DedupOps.resolveSurvivorsGeneric(assign, localThreshold = 0)
      .as[(Long, Long)].collect().toMap == want)
  }
}
