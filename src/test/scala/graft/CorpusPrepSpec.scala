package graft

import graft.queries.CorpusPrep

class CorpusPrepSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def run(name: String) =
    CorpusPrep.queries.find(_.name == name).get.fn(spark, dir)

  test("vocab_topk: counts are consistent and ordering is by total desc") {
    val rows = run("vocab_topk")
      .as[(String, Long, Long)].collect().toSeq
    assert(rows.nonEmpty && rows.size <= 50)
    // term_count >= doc_freq (a term occurs at least once per doc it's in)
    rows.foreach { case (t, tc, dfq) =>
      assert(tc >= dfq, s"$t: term_count $tc < doc_freq $dfq")
      assert(dfq >= 1)
    }
    assert(rows.map(_._2) == rows.map(_._2).sorted.reverse)
  }

  test("tfidf_keywords: <=3 ranked keywords per doc, scores non-increasing") {
    val rows = run("tfidf_keywords")
      .as[(Long, Int, String, Double)].collect().toSeq
    val byDoc = rows.groupBy(_._1)
    byDoc.foreach { case (doc, rs) =>
      assert(rs.size <= 3 && rs.map(_._2).sorted == rs.map(_._2))
      val scoresByRank = rs.sortBy(_._2).map(_._4)
      assert(scoresByRank == scoresByRank.sorted.reverse,
        s"doc $doc: tf-idf not non-increasing by rank: $scoresByRank")
    }
  }

  test("unigram_quality: logloss bounded by the corpus vocab surprisal range") {
    val rows = run("unigram_quality").as[(Long, Long, Double)].collect().toSeq
    assert(rows.nonEmpty)
    // -ln p is in (0, ln T]; the count-weighted mean inherits the bound
    rows.foreach { case (doc, n, ll) =>
      assert(n > 0 && ll > 0.0, s"doc $doc: n=$n logloss=$ll")
    }
  }

  test("sharedPassages: recovers the exact planted passage length") {
    // doc 1 and doc 2 share exactly one 15-token passage; doc 3 is clean
    val passage = (1 to 15).map(i => s"p$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta $passage gamma delta"),
      (2L, s"x y z $passage q r"),
      (3L, "totally unrelated words only here")
    ).toDF("doc_id", "text")
    val got = graft.queries.CorpusPrep.sharedPassages(docs, 12)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // a 15-token passage at k=12 yields 4 consecutive diagonal matches:
    // max run = 4 + 12 - 1 = 15 — the true passage length
    assert(got == Seq((1L, 2L, 15L, 4L)))
  }

  test("sharedPassages: below-threshold overlap reports nothing") {
    val short = (1 to 11).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, s"a b c $short d"),
      (2L, s"e f $short g h")
    ).toDF("doc_id", "text")
    assert(graft.queries.CorpusPrep.sharedPassages(docs, 12).count() == 0)
  }

  test("sharedPassagesTopN: symmetric, ranked by run length, capped at n") {
    // doc 1 shares a 15-token passage with doc 2 and a 13-token passage
    // with doc 3; docs 2 and 3 share nothing (their filler differs)
    val p15 = (1 to 15).map(i => s"p$i").mkString(" ")
    val p13 = (1 to 13).map(i => s"q$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha $p15 beta $p13 gamma"),
      (2L, s"x y z $p15 w"),
      (3L, s"m n $p13 o k")
    ).toDF("doc_id", "text")
    val got = graft.queries.CorpusPrep
      .sharedPassagesTopN(docs, 12, Int.MaxValue, 1)
      .as[(Long, Int, Long, Long, Long)].collect().toSeq
    // n=1: each doc reports only its LONGEST partner; doc 1's rank-1 is
    // doc 2 (15 > 13), and the symmetric orientation gives docs 2 and 3
    // their own row even though both pairs were mined as doc_a = 1
    assert(got == Seq(
      (1L, 1, 2L, 15L, 4L),
      (2L, 1, 1L, 15L, 4L),
      (3L, 1, 1L, 13L, 2L)))
  }

  test("pii_redact: planted PII is counted and scrubbed deterministically") {
    val rows = run("pii_redact")
      .as[(Long, Int, Int, String)].collect().toSeq
    rows.foreach { case (doc, ne, np, digest) =>
      if (doc % 5 == 0) assert(ne == 1 && np == 0, s"doc $doc: $ne/$np")
      else if (doc % 5 == 1) assert(ne == 0 && np == 1, s"doc $doc: $ne/$np")
      else assert(ne == 0 && np == 0, s"doc $doc: $ne/$np")
      assert(digest.matches("[0-9a-f]{32}"))
    }
    // digests are stable across runs (pure function of input)
    val again = run("pii_redact").as[(Long, Int, Int, String)].collect().toSeq
    assert(rows == again)
  }

  test("bpePairCounts: hand-counted pairs on a toy corpus") {
    // vocab: "abab" x2, "ab" x3, "x" (dropped, length 1)
    // pairs: abab -> ab,ba,ab; ab -> ab
    // counts: ab = 2*2 + 3 = 7, ba = 2
    val docs = Seq((1L, "abab ab x"), (2L, "abab ab ab"))
      .toDF("doc_id", "text")
    val got = graft.queries.TextAnalysis.bpePairCounts(docs)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("ab", 7L), ("ba", 2L)))
  }

  test("bpe_pair_counts: top-k is ranked and pair-level sane at sf0.001") {
    val rows = graft.queries.TextAnalysis.queries
      .find(_.name == "bpe_pair_counts").get.fn(spark, dir)
      .as[(String, Long)].collect().toSeq
    assert(rows.size == 20)
    // descending counts, ties broken by pair ordering
    assert(rows == rows.sortBy(r => (-r._2, r._1)))
    rows.foreach { case (pair, n) =>
      assert(pair.length == 2 && n > 0, s"bad pair row ($pair, $n)")
    }
  }

  test("bpeApplyMerge: merge applied left-to-right, merged pair gone") {
    // vocab: "abab" x2, "cd" x1; pairs: ab=4, ba=2, cd=1 → argmax "ab"
    // apply: abab → [ab][ab] (pair "abab" x2); cd untouched
    val docs = Seq((1L, "abab cd abab")).toDF("doc_id", "text")
    val got = graft.queries.TextAnalysis.bpeApplyMerge(docs)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("abab", 2L), ("cd", 1L)))
    assert(!got.exists(_._1 == "ab"), "merged pair must be absent")
  }

  test("bpeApplyMerge: overlapping occurrences merge non-overlapping") {
    // "aaa": pairs aa (i=1), aa (i=2) → argmax "aa"; greedy
    // left-to-right gives [aa][a] → one symbol pair (aa, a) = "aaa"
    val docs = Seq((1L, "aaa aaa")).toDF("doc_id", "text")
    val got = graft.queries.TextAnalysis.bpeApplyMerge(docs)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("aaa", 2L)))
  }

  test("bpeTrainMerges: hand-traced 3-iteration training run") {
    // vocab: abab:2, cd:1
    // it1: ab=4, ba=2, cd=1 → merge "ab"(4); abab→[ab][ab]
    // it2: ([ab],[ab])=2 beats cd=1 → merge "abab"(2)
    // it3: only cd remains → merge "cd"(1)
    val docs = Seq((1L, "abab cd abab")).toDF("doc_id", "text")
    val got = graft.queries.TextAnalysis.bpeTrainMerges(docs, nMerges = 3)
      .as[(Int, String, Long)].collect().toSeq
    assert(got == Seq((1, "ab", 4L), (2, "abab", 2L), (3, "cd", 1L)))
  }

  test("bpeTrainMerges: stops early when every token is fully merged") {
    val docs = Seq((1L, "xy xy")).toDF("doc_id", "text")
    // it1 merges "xy"(2); nothing is left to pair afterwards
    val got = graft.queries.TextAnalysis.bpeTrainMerges(docs, nMerges = 4)
      .as[(Int, String, Long)].collect().toSeq
    assert(got == Seq((1, "xy", 2L)))
  }

  test("bpe_train_merges: monotone counts, first merge = round-1 argmax") {
    val top1 = graft.queries.TextAnalysis.queries
      .find(_.name == "bpe_pair_counts").get.fn(spark, dir)
      .as[(String, Long)].collect().head
    val rows = graft.queries.TextAnalysis.queries
      .find(_.name == "bpe_train_merges").get.fn(spark, dir)
      .as[(Int, String, Long)].collect().toSeq
    assert(rows.size == 4)
    assert(rows.map(_._1) == Seq(1, 2, 3, 4))
    assert((rows.head._2, rows.head._3) == top1,
      s"first learned merge ${rows.head} != round-1 argmax $top1")
    // counts can only fall or hold as merges consume mass
    assert(rows.map(_._3) == rows.map(_._3).sorted.reverse)
  }

  test("bpeCompressionBySource: hand-traced merge application") {
    // trainer on "abab cd abab" learns ab, [ab][ab], cd then exhausts;
    // applied text "abab cd abab" -> sym 10 -> "  " -> 3
    val docs = Seq((1L, "s9", "abab cd abab")).toDF("doc_id", "source", "text")
    val got = graft.queries.TextAnalysis.bpeCompressionBySource(docs)
      .as[(String, Long, Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(("s9", 1L, 3L, 10L, 3L, 0.3)))
  }

  test("bpeVocabTokenize: hand-traced greedy longest-match + rolling hash") {
    // 1 merge on {"abab" x1, "ab" x1, "xy" x1}: pair counts ab:3, ba:1,
    // xy:1 → vocab = {"ab"}. Doc 1 "abab ab" tokenizes ab|ab|' '|ab:
    // 4 emits, 1 space → n_tokens 3; hash over lens [2,2,1,2]:
    // ((((0·31+2)·31+2)·31+1)·31+2) = 61537. Doc 2 "xy" has no vocab
    // hit: lens [1,1] → n_tokens 2, hash 31+1 = 32.
    val docs = Seq((1L, "abab ab"), (2L, "xy")).toDF("doc_id", "text")
    val got = graft.queries.TextAnalysis.bpeVocabTokenize(docs, nMerges = 1)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 6L, 3L, 61537L), (2L, 2L, 2L, 32L)))
  }

  test("bpeVocabTokenize: maximal munch prefers the longest vocab entry") {
    // 2 merges on "aaaa" x3: round 1 merges "aa" (sentinel S1), round 2
    // merges S1S1 → vocab = {"aa", "aaaa"}. Greedy on "aaaa" takes ONE
    // 4-char token (not two 2-char ones): lens [4] → n_tokens 1, hash 4.
    val docs = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val got = graft.queries.TextAnalysis.bpeVocabTokenize(docs, nMerges = 2)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 4L, 1L, 4L)))
  }

  test("requireSentinelSafe: control characters in tokens fail loudly") {
    val docs = Seq((1L, "okbad ok")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      graft.queries.TextAnalysis.bpeTrainMerges(docs, nMerges = 1).collect()
    }
    assert(e.getMessage.contains("control characters"))
    assert(e.getMessage.contains("U+0001"))
  }

  test("bpe_compression_by_source: merges only shrink, ratio in (0,1]") {
    val rows = graft.queries.TextAnalysis.queries
      .find(_.name == "bpe_compression_by_source").get.fn(spark, dir)
      .as[(String, Long, Long, Long, Long, Double)].collect().toSeq
    assert(rows.nonEmpty)
    rows.foreach { case (src, n, ws, before, after, ratio) =>
      assert(after <= before, s"$src: sym_after $after > sym_before $before")
      assert(after >= ws, s"$src: fewer symbols than tokens")
      assert(ratio > 0 && ratio <= 1, s"$src: ratio $ratio out of range")
    }
  }

  test("dedup_minhash_strict: subset of the loose profile at J>=0.8") {
    val loose = graft.queries.DedupQueries.queries
      .find(_.name == "dedup_minhash_lsh").get.fn(spark, dir)
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2)).toSet
    val strict = graft.queries.DedupQueries.queries
      .find(_.name == "dedup_minhash_strict").get.fn(spark, dir)
      .as[(Long, Long, Double)].collect().toSeq
    assert(strict.nonEmpty, "strict profile found no pairs at sf0.001")
    strict.foreach { case (a, b, j) =>
      assert(j >= 0.8, s"pair ($a,$b) below the strict floor: $j")
      // agreeing on a strict 4-row band implies agreeing on both loose
      // 2-row halves, so strict candidates are a subset of loose ones
      assert(loose.contains((a, b)),
        s"strict pair ($a,$b) not produced by the loose profile")
    }
  }

  test("corpus_temperature_mix: shares normalize, alpha<1 boosts the tail") {
    val rows = graft.queries.CorpusSampling.queries
      .find(_.name == "corpus_temperature_mix").get.fn(spark, dir)
      .as[(String, Long, Long, Double, Double, Double, Long)].collect().toSeq
    assert(rows.nonEmpty)
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-2)
    assert(math.abs(rows.map(_._5).sum - 1.0) < 1e-2)
    assert(math.abs(rows.map(_._7).sum - 100000L) <= rows.size)
    // alpha < 1: boost strictly decreases as natural share grows
    val byShare = rows.sortBy(_._4)
    assert(byShare.map(_._6) == byShare.map(_._6).sorted.reverse,
      s"boost not monotone-decreasing in share: $byShare")
  }

  test("bpe_apply_merge: argmax pair of round 1 is absent at sf0.001") {
    val top1 = graft.queries.TextAnalysis.queries
      .find(_.name == "bpe_pair_counts").get.fn(spark, dir)
      .as[(String, Long)].collect().head._1
    val rows = graft.queries.TextAnalysis.queries
      .find(_.name == "bpe_apply_merge").get.fn(spark, dir)
      .as[(String, Long)].collect().toSeq
    assert(rows.size == 20)
    assert(rows == rows.sortBy(r => (-r._2, r._1)))
    assert(!rows.exists(_._1 == top1),
      s"merged pair $top1 must not survive its own merge")
    // the merged symbol recombines: some ranked pair CONTAINS it
    assert(rows.exists(r => r._1.length > 2 && r._1.contains(top1)),
      s"no composition of merged pair $top1 in ${rows.map(_._1)}")
  }

  test("posGramHashes kernel is bit-identical to the HOF executable spec") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val k = 12
    // 15 tokens (three windows), exactly k (one window), k-1 (empty
    // array, not null — posexplode row parity), empty string (split
    // keeps the empty token: 1 token, < k, empty array)
    val docs = Seq(
      (1L, (1 to 15).map(i => s"w$i").mkString(" ")),
      (2L, (1 to 12).map(i => s"t$i").mkString(" ")),
      (3L, (1 to 11).map(i => s"u$i").mkString(" ")),
      (4L, "")).toDF("doc_id", "text")
    val toks = split($"text", " ")
    val hof = when(size(toks) >= k,
      transform(sequence(lit(0), size(toks) - k),
        i => graft.ops.TextOps.portableHash64(
          concat_ws(" ", slice(toks, i + 1, lit(k))), 0)))
      .otherwise(array().cast("array<long>"))
    val both = docs.select($"doc_id",
      graft.plans.HashExpressions.posGramHashes($"text", k).as("kern"),
      hof.as("spec"))
    val rows = both.as[(Long, Seq[Long], Seq[Long])].collect().sortBy(_._1)
    rows.foreach { case (id, kern, spec) =>
      assert(kern == spec, s"doc $id: kernel $kern != HOF spec $spec")
    }
    assert(rows.map(_._2.size).toSeq == Seq(4, 1, 0, 0))
  }

  test("bpe_fertility_by_source: ratios are consistent and bounded") {
    import spark.implicits._
    val rows = graft.queries.Registry.queries("bpe_fertility_by_source")(
      spark, "/root/testdata/sf0.001")
      .select("source", "n_docs", "n_words", "n_bpe_tokens",
        "fertility_milli", "chars_per_token_milli")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    rows.foreach { case (src, nd, nw, nb, fert, cpt) =>
      assert(nd > 0 && nw > 0 && nb >= nw,
        s"$src: BPE cannot emit fewer tokens than words ($nb < $nw)")
      assert(fert == 1000 * nb / nw && fert >= 1000, s"$src fert $fert")
      // merges only shrink: a token covers at least one character
      assert(cpt >= 1000, s"$src chars/token $cpt")
    }
  }

  test("pmi_collocations: counts respect the floor, PMI finite and sorted") {
    val rows = run("pmi_collocations")
      .as[(String, Long, Double)].collect().toSeq
    assert(rows.nonEmpty && rows.size <= 50)
    rows.foreach { case (bg, c, pmi) =>
      assert(bg.contains(" "), s"'$bg' is not a token pair")
      assert(c >= 5, s"'$bg' below the MinCount floor: $c")
      assert(!pmi.isNaN && !pmi.isInfinite, s"'$bg' PMI $pmi")
    }
    val pmis = rows.map(_._3)
    assert(pmis == pmis.sorted.reverse, "not ordered by PMI desc")
  }

  test("pmi_collocations: PMI matches a literal recount of the marginals") {
    // independently recount c12/c1/c2/N from raw text for the top row
    val (bg, c12, pmi) = run("pmi_collocations")
      .as[(String, Long, Double)].collect().head
    val Array(w1, w2) = bg.split(" ", 2)
    val bigrams = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"text").as[String].collect().toSeq
      .flatMap(t => { val ts = t.split(" ", -1); ts.zip(ts.drop(1)) })
    val n = bigrams.size.toDouble
    val c12r = bigrams.count { case (a, b) => a == w1 && b == w2 }
    val c1r = bigrams.count(_._1 == w1)
    val c2r = bigrams.count(_._2 == w2)
    assert(c12r.toLong == c12, s"pair count $c12 != recount $c12r")
    val want = BigDecimal(math.log(c12r * n / (c1r.toDouble * c2r)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(pmi - want) < 1e-9, s"PMI $pmi != recount $want")
  }

  test("doc_novelty_rate: novel credits partition the distinct shingle space") {
    val rows = run("doc_novelty_rate")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    rows.foreach { case (src, ns, nn, milli) =>
      assert(nn >= 0 && nn <= ns, s"$src: $nn novel of $ns")
      assert(milli == 1000 * nn / ns, s"$src: milli $milli")
    }
    // every distinct shingle is credited to exactly one (source, doc):
    // the per-source novel counts must sum to the corpus-wide distinct
    // fingerprint count, recomputed here through the same kernel
    import org.apache.spark.sql.functions.{explode, array_distinct, countDistinct}
    val distinctH = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(explode(array_distinct(
        graft.plans.HashExpressions.posGramHashes($"text", 8))).as("h"))
      .agg(countDistinct($"h")).collect()(0).getLong(0)
    assert(rows.map(_._3).sum == distinctH,
      s"novel sum ${rows.map(_._3).sum} != distinct shingles $distinctH")
  }

  test("zipfFitFromCounts: an exactly Zipfian vocabulary fits slope -1") {
    // c_r = round(1e9 / r): ln c = ln 1e9 - ln r up to rounding, so the
    // fit must recover slope -1 and an essentially perfect r2
    val counts = (1 to 800)
      .map(r => (f"t$r%04d", math.round(1e9 / r)))
      .toDF("term", "tc")
    val Seq((n, slope, intercept, r2)) = CorpusPrep.zipfFitFromCounts(counts)
      .as[(Long, Double, Double, Double)].collect().toSeq
    assert(n == 800)
    assert(math.abs(slope + 1.0) < 1e-4, s"slope $slope")
    assert(r2 > 0.999999, s"r2 $r2")
    assert(math.abs(intercept - math.log(1e9)) < 1e-3, s"intercept $intercept")
  }

  test("zipf_fit: single summary row with a negative slope and sane r2") {
    val Seq((n, slope, intercept, r2)) = run("zipf_fit")
      .as[(Long, Double, Double, Double)].collect().toSeq
    assert(n > 10 && n <= 1000, s"n_terms $n")
    // counts are non-increasing in rank, so the log-log slope is <= 0
    assert(slope <= 0.0, s"slope $slope")
    assert(r2 >= 0.0 && r2 <= 1.0 + 1e-9, s"r2 $r2")
    // intercept is ln(count) at rank 1 under the fit — bounded by the
    // corpus token mass on the high side, 0 on the low side
    assert(intercept > 0.0, s"intercept $intercept")
  }

  // --------------------------------------------------- C4 span scrub

  test("c4SpanScrub: keep-first semantics on a constructed corpus") {
    // span S = 6 tokens; d1 holds the corpus-first occurrence, d2 a
    // later cross-doc copy, d4 two later copies (one per position),
    // d3 untouched
    val s6 = "s1 s2 s3 s4 s5 s6"
    val docs = Seq(
      (1L, s"$s6 u1 u2 u3"),
      (2L, s"v1 v2 $s6 v3"),
      (3L, "w1 w2 w3 w4 w5 w6 w7"),
      (4L, s"$s6 x1 $s6")
    ).toDF("doc_id", "text")
    val got = CorpusPrep.c4SpanScrub(docs)
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got == Seq(
      // d1: first occurrence kept in full
      (1L, 9L, 0L, s"$s6 u1 u2 u3"),
      // d2: its copy of S removed, frame tokens survive
      (2L, 9L, 6L, "v1 v2 v3"),
      (3L, 7L, 0L, "w1 w2 w3 w4 w5 w6 w7"),
      // d4: BOTH copies are later than d1's -> all 12 span tokens go.
      // x1 survives: no duplicated 6-gram covers it (the grams through
      // x1 occur once each)
      (4L, 13L, 12L, "x1")))
  }

  test("c4SpanScrub: intra-doc repeat keeps only the earlier occurrence") {
    val s6 = "r1 r2 r3 r4 r5 r6"
    val docs = Seq((7L, s"$s6 m1 $s6")).toDF("doc_id", "text")
    val Seq((_, n, rm, clean)) = CorpusPrep.c4SpanScrub(docs)
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(n == 13 && rm == 6 && clean == s"$s6 m1")
  }

  test("c4_span_scrub: registry query invariants at sf0.001") {
    val rows = run("c4_span_scrub")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(rows.nonEmpty)
    rows.foreach { case (id, n, rm, clean) =>
      assert(rm >= 0 && rm <= n, s"doc $id")
      val keptToks = if (clean.isEmpty) 0 else clean.split(" ").length
      assert(keptToks == n - rm, s"doc $id: $keptToks != $n - $rm")
    }
    // the synthetic corpus has copy families: something must be scrubbed
    assert(rows.exists(_._3 > 0))
  }
}
