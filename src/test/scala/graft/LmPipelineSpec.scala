package graft

import graft.queries.LmPipeline

class LmPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def run(name: String) =
    LmPipeline.queries.find(_.name == name).get.fn(spark, dir)

  // ------------------------------------------------- chunk dedup

  test("chunkDedup: shared chunk survives only in the lowest doc_id") {
    // chunkLen=3; docs 1 and 2 share the chunk "a b c" at a chunk
    // boundary; doc 3 is clean
    val docs = Seq(
      (1L, "a b c x y z"),
      (2L, "a b c q r s"),
      (3L, "u v w")
    ).toDF("doc_id", "text")
    val got = LmPipeline.chunkDedup(docs, chunkLen = 3)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 2L, 2L, "a b c x y z"),
      (2L, 2L, 1L, "q r s"),
      (3L, 1L, 1L, "u v w")))
  }

  test("chunkDedup: identical docs — first keeps all, rest keep none") {
    val docs = Seq(
      (10L, "p q r s t u"),
      (11L, "p q r s t u"),
      (12L, "p q r s t u")
    ).toDF("doc_id", "text")
    val got = LmPipeline.chunkDedup(docs, chunkLen = 3)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (10L, 2L, 2L, "p q r s t u"),
      (11L, 2L, 0L, ""),
      (12L, 2L, 0L, "")))
  }

  test("chunkDedup: ragged tail chunk participates in dedup") {
    // 4 tokens at chunkLen=3 → chunks ["a b c", "d"]; the 1-token tail
    // "d" also appears as doc 21's tail → dropped there
    val docs = Seq(
      (20L, "a b c d"),
      (21L, "x y z d")
    ).toDF("doc_id", "text")
    val got = LmPipeline.chunkDedup(docs, chunkLen = 3)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (20L, 2L, 2L, "a b c d"),
      (21L, 2L, 1L, "x y z")))
  }

  test("chunk_dedup_docs: accounting invariants at sf0.001") {
    val rows = run("chunk_dedup_docs")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(rows.nonEmpty)
    rows.foreach { case (doc, n, kept, digest) =>
      assert(kept >= 0 && kept <= n, s"doc $doc: kept $kept of $n")
      assert(digest.length == 32)
    }
    // total kept chunks == number of distinct chunk texts in the corpus
    // (each distinct chunk survives exactly once, in its keeper doc)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val nDistinct = docs
      .selectExpr("explode(transform(sequence(0, cast(ceil(size(split(text,' '))/10.0) as int)-1), " +
        "i -> array_join(slice(split(text,' '), i*10+1, 10), ' '))) AS chunk")
      .distinct().count()
    assert(rows.map(_._3).sum == nDistinct)
  }

  // ------------------------------------------------- bigram LM

  test("bigramLogloss: uniform repetition scores exactly zero") {
    // every bigram in the corpus is "a a": cb == ch everywhere → loss 0
    val docs = Seq((1L, "a a a a")).toDF("doc_id", "text")
    val got = LmPipeline.bigramLogloss(docs)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 3L, 0.0)))
  }

  test("bigramLoglossTopV: OOV bigrams don't score; empty docs drop out") {
    // counts: "a b" x3, "b a" x2, "c d" x1 → v=1 keeps only "a b"
    // (cb=3, head total ch=3). Doc 1 scores over its in-vocab mass
    // only: 3·ln(3/3)/3 = 0 with n_bigrams counting IN-VOCAB bigrams;
    // doc 2's sole bigram is out-of-vocab, so it leaves the loss frame
    // entirely (the closed-vocab convention).
    val docs = Seq((1L, "a b a b a b"), (2L, "c d")).toDF("doc_id", "text")
    val got = LmPipeline.bigramLoglossTopV(docs, 1)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 3L, 0.0)))
  }

  test("bigramLoglossTopV: head totals are over the CLOSED vocab only") {
    // all four bigrams ("a b", "b a", "a c", "d e") count 1; the v=2
    // tie-break (count desc, bigram ASC) keeps {"a b", "a c"}. Head 'a'
    // total ch = 2 — over the CLOSED vocab, not the corpus (which has
    // three 'a'-headed occurrences if "b a" were miscounted in). Doc 1
    // loss = (ln(2/1) + ln(2/1)) / 2 = ln 2 over its 2 in-vocab
    // bigrams; doc 2 ("d e") drops.
    val docs = Seq((1L, "a b a c"), (2L, "d e")).toDF("doc_id", "text")
    val got = LmPipeline.bigramLoglossTopV(docs, 2)
      .as[(Long, Long, Double)].collect().toSeq
    val ln2 = BigDecimal(math.log(2.0))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == Seq((1L, 2L, ln2)))
  }

  test("bigramLogloss: branching context raises loss; hand value matches") {
    // corpus: "a b" x1 and "a c" x1 → p(b|a) = p(c|a) = 1/2,
    // each doc's loss = ln 2
    val docs = Seq((1L, "a b"), (2L, "a c")).toDF("doc_id", "text")
    val got = LmPipeline.bigramLogloss(docs)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    val ln2 = BigDecimal(math.log(2.0))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == Seq((1L, 1L, ln2), (2L, 1L, ln2)))
  }

  test("bigram_lm_quality: loss is non-negative (cb <= ch always)") {
    val rows = run("bigram_lm_quality").as[(Long, Long, Double)].collect().toSeq
    assert(rows.nonEmpty)
    rows.foreach { case (doc, n, ll) =>
      assert(n > 0 && ll >= 0.0, s"doc $doc: n=$n logloss=$ll")
    }
  }

  // ------------------------------------------------- DSIR weights

  test("dsirWeights: separable domains score with opposite signs") {
    // target docs speak only (t1 t2), raw-only docs only (r1 r2); with
    // disjoint feature buckets the likelihood ratio must separate them
    val docs = Seq(
      (1L, "tgt", "t1 t2 t1 t2 t1 t2"),
      (2L, "tgt", "t2 t1 t2 t1"),
      (3L, "other", "r1 r2 r1 r2 r1 r2"),
      (4L, "other", "r2 r1 r2 r1")
    ).toDF("doc_id", "source", "text")
    val got = LmPipeline.dsirWeights(docs, targetSources = Seq("tgt"))
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    val byDoc = got.map(r => r._1 -> r._3).toMap
    assert(byDoc(1L) > 0 && byDoc(2L) > 0,
      s"target docs must score positive: $byDoc")
    assert(byDoc(3L) < 0 && byDoc(4L) < 0,
      s"raw-only docs must score negative: $byDoc")
  }

  // ------------------------------------ hashed linear classifier

  test("qualityClassifierScore: score is the exact token-weight sum") {
    // recompute one doc's score by hand from the published weight
    // formula: w(tok) = (bucket(tok) * 2654435761) % 2001 - 1000
    val docs = Seq((1L, "alpha beta alpha"), (2L, "")).toDF("doc_id", "text")
    val got = LmPipeline.qualityClassifierScore(docs)
      .as[(Long, Int, Long, Boolean)].collect().sortBy(_._1).toSeq
    def w(tok: String): Long = {
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(s"17|$tok".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      val bucket = java.lang.Long.parseLong(md5, 16) % 512
      bucket * 2654435761L % 2001L - 1000L
    }
    val expect1 = 2 * w("alpha") + w("beta")
    assert(got.head == ((1L, 3, expect1, expect1 >= 0)))
    // split("", " ") is Array("") — the empty doc scores w("")
    assert(got(1) == ((2L, 1, w(""), w("") >= 0)))
  }

  test("quality_classifier_score: plan is map-side only (no exchange)") {
    val plan = run("quality_classifier_score").queryExecution.executedPlan
      .toString
    // one fan-out/materialization repartition + the oracle ORDER BY are
    // allowed; the scoring itself must not shuffle — no aggregation of
    // ANY physical flavor and no exchange beyond the two known ones
    for (agg <- Seq("HashAggregate", "SortAggregate", "ObjectHashAggregate"))
      assert(!plan.contains(agg), s"unexpected $agg:\n$plan")
    val exchanges = "Exchange ".r.findAllIn(plan).size
    assert(exchanges <= 2,
      s"expected <=2 exchanges (barrier + ORDER BY), got $exchanges:\n$plan")
  }

  // ------------------------------------ RAG sliding-window chunks

  test("ragChunks: overlapping windows with shortened boundary tails") {
    // 6 tokens, window 4, stride 2 → starts 0,2,4 with slices of
    // length 4,4,2
    val docs = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
    val got = LmPipeline.ragChunks(docs, window = 4, stride = 2)
      .select("chunk_id", "start_tok", "n_tok")
      .as[(Int, Int, Int)].collect().toSeq
    assert(got == Seq((0, 0, 4), (1, 2, 4), (2, 4, 2)))
  }

  test("ragChunks: every token position is covered by some chunk") {
    val rows = run("rag_chunk_overlap")
      .as[(Long, Int, Int, Int, String)].collect().toSeq
    assert(rows.nonEmpty)
    val byDoc = rows.groupBy(_._1)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("doc_id", "size(split(text, ' ')) AS n")
      .as[(Long, Int)].collect().toMap
    byDoc.foreach { case (doc, chunks) =>
      val n = docs(doc)
      val covered = chunks.map(c => c._3 until math.min(c._3 + c._4, n))
        .foldLeft(Set.empty[Int])(_ ++ _)
      assert(covered == (0 until n).toSet, s"doc $doc coverage hole")
      // stride-4 chunk ids are dense from 0
      assert(chunks.map(_._2).sorted == chunks.indices.toList)
    }
  }

  test("dsir_importance_weights: target sources outscore the rest on average") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", $"source").as[(Long, String)].collect().toMap
    val rows = run("dsir_importance_weights")
      .as[(Long, Long, Double)].collect().toSeq
    assert(rows.nonEmpty)
    val (tgt, rest) = rows.partition(r =>
      Seq("src0", "src1", "src2").contains(docs(r._1)))
    assert(tgt.nonEmpty && rest.nonEmpty)
    val mt = tgt.map(_._3).sum / tgt.size
    val mr = rest.map(_._3).sum / rest.size
    assert(mt > mr, s"mean target logweight $mt <= mean rest $mr")
  }

  // ---------------------------------- CCNet perplexity buckets

  test("ccnet_perplexity_buckets: terciles partition, losses ordered") {
    val rows = run("ccnet_perplexity_buckets")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(rows.map(_._1) == Seq("head", "middle", "tail"))
    val total = rows.map(_._2).sum
    // buckets partition the SCORED corpus: docs holding >= 1 in-vocab
    // bigram under the top-V closed-vocab model. On this corpus every
    // >=2-token doc does, so the count matches the unbounded scorer's
    // (a doc-dropping vocab cut here would be a semantics regression)
    val scored = run("bigram_lm_quality").count()
    assert(total == scored, s"bucket docs $total != scored docs $scored")
    // sampled terciles: each bucket holds a nontrivial share
    rows.foreach { case (b, n, _, _) =>
      assert(n >= total / 10, s"bucket $b suspiciously small: $n/$total") }
    // CCNet ordering: head is the most fluent (lowest mean loss)
    val byName = rows.map(r => r._1 -> r._4).toMap
    assert(byName("head") < byName("middle") && byName("middle") < byName("tail"))
  }

  // ------------------------------------ RAG end-to-end retrieval

  test("rag_retrieve_e2e: top-k ranked by exact integer inner product") {
    val rows = run("rag_retrieve_e2e")
      .as[(Long, Int, String, Long)].collect().toSeq
    assert(rows.size == 10)
    // ranked by (score desc, doc_id, chunk_id); all scores positive —
    // the retrieved chunks genuinely share hashed features with the query
    assert(rows == rows.sortBy(r => (-r._4, r._1, r._2)))
    assert(rows.forall(_._4 > 0), s"non-positive score in $rows")
    // retrieved chunk ids exist in the chunker's own output
    val chunkKeys = run("rag_chunk_overlap")
      .select($"doc_id", $"chunk_id").as[(Long, Int)].collect().toSet
    rows.foreach(r => assert(chunkKeys.contains((r._1, r._2)),
      s"retrieved chunk ${(r._1, r._2)} not produced by the chunker"))
  }

  test("rag_retrieve_e2e: one keyed shuffle, no join, codegen'd hashing") {
    val plan = run("rag_retrieve_e2e").queryExecution.executedPlan.toString
    // chunk → explode → hash → combinable dot-sums: the ONLY exchange is
    // the per-chunk aggregation (top-k is TakeOrdered, not a sort); the
    // codebook is expression literals — nothing joined or broadcast
    for (bad <- Seq("Join", "CartesianProduct"))
      assert(!plan.contains(bad), s"unexpected $bad in plan:\n$plan")
    val exchanges = "Exchange ".r.findAllIn(plan).size
    assert(exchanges <= 1,
      s"expected <=1 exchange (chunk agg), got $exchanges:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k should be TakeOrderedAndProject:\n$plan")
  }

  test("bigramBucketIds kernel is bit-identical to the HOF executable spec") {
    import org.apache.spark.sql.functions._
    val (seed, buckets) = (11, 4096L)
    // multi-bigram, exactly 2 tokens, 1 token (empty array), empty
    // string (split keeps the empty token: 1 token, empty array)
    val docs = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "ab cd"), (3L, "solo"), (4L, "")).toDF("doc_id", "text")
    val toks = split($"text", " ")
    val hof = when(size(toks) < 2, array().cast("array<long>"))
      .otherwise(transform(sequence(lit(2), size(toks)), i =>
        pmod(graft.ops.TextOps.portableHash64(
          concat_ws(" ", element_at(toks, i - 1), element_at(toks, i)), seed),
          lit(buckets))))
    val rows = docs.select($"doc_id",
        graft.plans.HashExpressions.bigramBucketIds($"text", seed, buckets)
          .as("kern"),
        hof.as("spec"))
      .as[(Long, Seq[Long], Seq[Long])].collect().sortBy(_._1)
    rows.foreach { case (id, kern, spec) =>
      assert(kern == spec, s"doc $id: kernel $kern != HOF spec $spec")
    }
    assert(rows.map(_._2.size).toSeq == Seq(4, 1, 0, 0))
  }

  test("bigramStrings kernel is value-identical to the HOF executable spec") {
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, "a b c d"), (2L, "x y"), (3L, "one"), (4L, "")).toDF("doc_id", "text")
    val toks = split($"text", " ")
    val hof = when(size(toks) < 2, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(2), size(toks)),
        i => concat_ws(" ", element_at(toks, i - 1), element_at(toks, i))))
    val rows = docs.select($"doc_id",
        graft.plans.HashExpressions.bigramStrings($"text").as("kern"),
        hof.as("spec"))
      .as[(Long, Seq[String], Seq[String])].collect().sortBy(_._1)
    rows.foreach { case (id, kern, spec) =>
      assert(kern == spec, s"doc $id: kernel $kern != HOF spec $spec")
    }
    assert(rows.map(_._2).toSeq ==
      Seq(Seq("a b", "b c", "c d"), Seq("x y"), Nil, Nil))
  }
}
