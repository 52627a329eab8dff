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
}
