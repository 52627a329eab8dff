package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{Tables, TextOps}

/** LM-corpus preparation operators, round 2: the CCNet/DSIR-shaped
  * passes a 100 TB pretraining pipeline runs between raw crawl and
  * tokenizer — chunk-level cross-document dedup (the "line dedup" pass,
  * re-grained to token windows because the synthetic corpus carries no
  * newlines), a bigram language-model perplexity filter (one order up
  * from the unigram gate in [[CorpusPrep]]), and hashed-n-gram
  * importance weighting for targeted data selection (DSIR-shaped:
  * score every raw doc by how much it looks like a target domain).
  *
  * Scale shapes, in order: chunk dedup shuffles once on the chunk hash
  * (the corpus-wide duplicate count) and once on doc_id (reassembly) —
  * both keyed, both combinable, no driver state. The bigram LM keeps
  * both model tables as WINDOW sums over the (doc, bigram) frame
  * (vocabulary grows with the corpus — broadcasting it back is the
  * driver-OOM shape PlanAuditSpec gates). DSIR uses the same window
  * shape over a key space HASHED down to a fixed 1024 buckets — the
  * hashing trick bounds the model's key cardinality no matter how the
  * vocabulary grows, and the global totals it needs reduce to map-side
  * token counts that never touch the exploded frame.
  */
object LmPipeline {

  // ------------------------------------------------ chunk-level dedup

  private val ChunkLen = 10

  /** CCNet-style cross-document chunk dedup over a (doc_id, text)
    * frame. Documents are cut into fixed `chunkLen`-token chunks
    * (deterministic re-graining of CCNet's per-line unit); a chunk is
    * kept only in the lowest-doc_id document that contains it and
    * dropped everywhere else; each document is then reassembled in
    * original chunk order. One shuffle on the chunk text (corpus-wide
    * first-owner), one on doc_id (reassembly) — both keyed, no driver
    * state.
    */
  def chunkDedup(docs: DataFrame, chunkLen: Int = ChunkLen): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val toks = TextOps.tokens($"text")
    val nChunks = ceil(size(toks).cast("double") / chunkLen).cast("int")
    val chunks = transform(
      sequence(lit(0), nChunks - 1),
      i => array_join(slice(toks, i * chunkLen + 1, lit(chunkLen)), " "))
    val exploded = docs
      .select($"doc_id", posexplode(chunks).as(Seq("pos", "chunk")))
    val keeper = min($"doc_id").over(Window.partitionBy($"chunk"))
    exploded
      .withColumn("keep", $"doc_id" === keeper)
      .groupBy($"doc_id")
      .agg(
        count(lit(1)).as("n_chunks"),
        sum($"keep".cast("long")).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(when($"keep", struct($"pos", $"chunk")))),
            x => x("chunk")),
          " ").as("clean_text"))
  }

  private def chunkDedupDocs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    chunkDedup(Tables.fanOut(Tables.documents(s, dir)))
      .select($"doc_id", $"n_chunks", $"n_kept",
        md5($"clean_text").as("clean_md5"))
      .orderBy($"doc_id")
  }

  private val chunkDedupOracle =
    s"""WITH tk AS (
       |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |ch AS (
       |  SELECT doc_id,
       |    unnest(cl) AS chunk,
       |    unnest(range(1, len(cl) + 1)) AS pos
       |  FROM (
       |    SELECT doc_id,
       |      list_transform(
       |        range(0, CAST(ceil(len(toks) / $ChunkLen.0) AS INT)),
       |        i -> array_to_string(toks[i * $ChunkLen + 1 : i * $ChunkLen + $ChunkLen], ' ')) AS cl
       |    FROM tk)),
       |k AS (
       |  SELECT doc_id, pos, chunk,
       |    doc_id = min(doc_id) OVER (PARTITION BY chunk) AS keep
       |  FROM ch)
       |SELECT doc_id,
       |  CAST(count(*) AS BIGINT) AS n_chunks,
       |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  md5(coalesce(
       |    string_agg(CASE WHEN keep THEN chunk END, ' ' ORDER BY pos),
       |    '')) AS clean_md5
       |FROM k
       |GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin

  // ------------------------------------------------- bigram LM quality

  /** Token-bigram array of a text column; empty (not descending-
    * sequence garbage) below two tokens.
    */
  // native kernel (one call per row); the HOF executable spec it is
  // value-identical to — LmPipelineSpec pins parity:
  //   when(size(toks) < 2, array())
  //     .otherwise(transform(sequence(2, size(toks)),
  //       i => concat_ws(" ", element_at(toks, i-1), element_at(toks, i))))
  // which re-evaluated an interpreted concat per bigram on the corpus-
  // scale explodes (bigram LM, CCNet — ~100 M bigrams at the 100× soak)
  private def bigramsOf(text: Column): Column =
    graft.plans.HashExpressions.bigramStrings(text)

  /** Per-document bigram cross-entropy of a (doc_id, text) frame
    * against the frame's own MLE bigram model — the next order up from
    * [[CorpusPrep]]'s unigram gate. p(w2 | w1) = c(w1 w2) / c(w1 ·), so
    * a document's loss is sum(c · ln(c(w1 ·) / c(w1 w2))) / sum(c);
    * formulaic text (whose bigrams repeat corpus-wide) scores near 0,
    * rare-transition text scores high. Both model tables are window
    * sums over the (doc, bigram) frame — see the class doc for why not
    * broadcast.
    */
  def bigramLogloss(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val db = docs
      .select($"doc_id", explode(bigramsOf($"text")).as("bigram"))
      .groupBy($"doc_id", $"bigram")
      .agg(count(lit(1)).as("c"))
      .withColumn("w1", substring_index($"bigram", " ", 1))
    db
      .withColumn("cb", sum($"c").over(Window.partitionBy($"bigram")))
      .withColumn("ch", sum($"c").over(Window.partitionBy($"w1")))
      .groupBy($"doc_id")
      .agg(
        sum($"c").as("n_bigrams"),
        round(sum($"c" * log($"ch" / $"cb")) / sum($"c").cast("double"), 4)
          .as("logloss"))
  }

  private def bigramLmQuality(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    bigramLogloss(Tables.fanOut(Tables.documents(s, dir))).orderBy($"doc_id")
  }

  /** Bigram-LM CTE prefix ending in `ll(doc_id, n_bigrams, logloss)` —
    * shared by the per-doc quality oracle and the CCNet bucket oracle.
    */
  private val bigramCtes =
    """tk AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |bg AS (
      |  SELECT doc_id,
      |    unnest(list_transform(range(2, len(toks) + 1),
      |      i -> toks[i - 1] || ' ' || toks[i])) AS bigram
      |  FROM tk WHERE len(toks) >= 2),
      |db AS (
      |  SELECT doc_id, bigram, count(*) AS c,
      |    string_split(bigram, ' ')[1] AS w1
      |  FROM bg GROUP BY doc_id, bigram),
      |m AS (
      |  SELECT doc_id, c,
      |    sum(c) OVER (PARTITION BY bigram) AS cb,
      |    sum(c) OVER (PARTITION BY w1) AS ch
      |  FROM db),
      |ll AS (
      |  SELECT doc_id,
      |    CAST(sum(c) AS BIGINT) AS n_bigrams,
      |    round(sum(c * ln(CAST(ch AS DOUBLE) / cb)) / CAST(sum(c) AS DOUBLE), 4)
      |      AS logloss
      |  FROM m
      |  GROUP BY doc_id)""".stripMargin

  private val bigramOracle =
    s"""WITH $bigramCtes
      |SELECT doc_id, n_bigrams, logloss FROM ll
      |ORDER BY doc_id""".stripMargin

  // ----------------------- CCNet perplexity buckets (head/middle/tail)

  private val CcnetSampleK = 256
  private val CcnetSeed = 23

  /** Vocabulary bound for the CCNet bucket model: the scoring LM is cut
    * to the [[CcnetVocabV]] most frequent bigrams corpus-wide (count
    * desc, bigram asc — a total order both engines share, since bigrams
    * are unique after the count agg). CCNet itself scores against a
    * FIXED pretrained LM (Wenzek et al. 2020 use KenLM with a closed
    * vocabulary); a corpus-grown unbounded model is the part that does
    * not scale — its two window sums shuffle the full (doc, bigram)
    * frame, measured at 52 s on the 100x soak (the r13 `weak`). The
    * top-V cut makes the model a FIXED-WIDTH artifact: V rows collected
    * once (the bounded codebook-collect bridge), rejoined broadcast, so
    * scoring is one corpus pass. Out-of-vocabulary bigrams contribute
    * nothing to a document's loss (the closed-vocab convention); a
    * document with no in-vocab bigram drops out of the loss frame,
    * exactly as sub-2-token documents already do. 512 is below the
    * synthetic corpus's ~916 distinct bigrams, so the cut is REAL in
    * the oracle-gated run, not a vacuous pass-through.
    */
  private val CcnetVocabV = 512

  /** Per-doc (doc_id, bigram, c) counts — the corpus-sized combinable
    * reduction both the model cut and the scoring pass start from.
    */
  private def docBigramCounts(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs
      .select($"doc_id", explode(bigramsOf($"text")).as("bigram"))
      .groupBy($"doc_id", $"bigram")
      .agg(count(lit(1)).as("c"))
  }

  /** Per-document cross-entropy against the top-`v` closed-vocabulary
    * bigram model (see [[CcnetVocabV]]). The model — (bigram, pair
    * count cb, head count ch = sum of in-vocab cb sharing the first
    * word) — is computed EAGERLY once at call time (a v-row driver
    * bridge) and rejoined as an explicit broadcast, so each evaluation
    * of the returned frame is ONE corpus pass: tokenize → (doc, bigram)
    * agg → broadcast join → per-doc agg. Deliberately NOT persisted:
    * the bucket query evaluates the frame twice (threshold sample, then
    * bucketing) and eats the second pass so the bench watermark prices
    * the COLD path — a persist here survives between bench passes and
    * turns the committed number into a cache-hit measurement.
    */
  def bigramLoglossTopV(docs: DataFrame, v: Int): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    // (doc_id, bigram, c) feeds TWO jobs — the vocabulary count and the
    // scoring join — and unpersisted each re-runs the text parse +
    // bigram explode + count shuffle, the two corpus-sized passes in
    // this query. Persisting the POST-shuffle frame trades one extra
    // materialization (≈ the shuffle files the count already writes,
    // MEMORY_AND_DISK so it spills rather than evicts) for half the
    // corpus scans — the same call CCNet itself makes when it
    // materializes LM training counts. Cold-honest: Bench clears the
    // cache between passes, so the watermark prices the build.
    val db = docBigramCounts(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val vocab: Array[(String, Long)] = db
      .groupBy($"bigram").agg(sum($"c").as("cb"))
      .orderBy($"cb".desc, $"bigram".asc)
      .limit(v)
      .select($"bigram", $"cb").as[(String, Long)].collect()
    // head totals over the CLOSED vocabulary, driver-side over v rows
    val ch: Map[String, Long] = vocab
      .groupBy { case (bigram, _) => bigram.takeWhile(_ != ' ') }
      .view.mapValues(_.map(_._2).sum).toMap
    val model = vocab.toSeq
      .map { case (bigram, cb) => (bigram, cb, ch(bigram.takeWhile(_ != ' '))) }
      .toDF("bigram", "cb", "ch")
    db.join(broadcast(model), "bigram")
      .groupBy($"doc_id")
      .agg(
        sum($"c").as("n_bigrams"),
        round(sum($"c" * log($"ch" / $"cb")) / sum($"c").cast("double"), 4)
          .as("logloss"))
  }

  /** CCNet's head/middle/tail partitioning of a corpus by LM loss
    * (Wenzek et al. 2020): documents bucketed by their bigram-LM
    * cross-entropy against tercile thresholds. Thresholds come from a
    * deterministic [[CcnetSampleK]]-doc sample (bottom-k by portable
    * hash — the KMV-mergeable sample the quantile suite uses) by EXACT
    * RANK SELECTION (the 86th and 171st smallest sampled losses), not
    * interpolation: interpolated quantiles differ across engines in the
    * last ulp exactly when a document sits on the boundary, while a
    * rank-selected threshold IS a grid value both engines share.
    *
    * Scale shape: the per-doc loss frame is [[bigramLoglossTopV]]'s
    * closed-vocabulary broadcast-model pass (NOT the corpus-grown
    * windowed model — see [[CcnetVocabV]]); sampling is the two-phase
    * salted bottom-k (no single-task sort funnel); thresholds are a
    * 2-value driver bridge; bucketing + the final 3-group aggregation
    * are map-side. Loss averages aggregate in exact integer
    * micro-units. The loss frame is evaluated twice (sample, then
    * bucket) with NO persist between: the second corpus pass is the
    * price of an honest cold benchmark watermark, and it is cheap now
    * that the model is a broadcast join instead of two full-frame
    * window shuffles.
    */
  private def ccnetPerplexityBuckets(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // The per-doc loss frame feeds TWO actions (threshold-sample
    // collect, then the bucket agg); unpersisted it is recomputed for
    // the second — and each recompute re-runs the corpus bigram scan
    // twice (vocab count + scoring join), i.e. four corpus passes per
    // query. Persist is bounded and 100-TB-safe: three narrow columns,
    // one row per DOCUMENT (not per bigram — the ~n_docs·avg_bigrams
    // model rows never enter the cache), MEMORY_AND_DISK so an
    // executor under pressure spills instead of evicting to recompute.
    // No eager unpersist: the returned plan still references the cache
    // (Analytic.scala:174 has the same shape); Bench clears the cache
    // between passes, so the committed watermark prices this cold.
    val ll = bigramLoglossTopV(
      Tables.fanOut(Tables.documents(s, dir)), CcnetVocabV)
      .withColumn("micro", round($"logloss" * 1e6).cast("bigint"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val hash = TextOps.portableHash64($"doc_id".cast("string"), CcnetSeed)
    val w1 = Window.partitionBy($"salt").orderBy($"h", $"doc_id")
    val w2 = Window.partitionBy().orderBy($"h", $"doc_id")
    val sample = ll
      .withColumn("h", hash)
      .withColumn("salt", pmod($"h", lit(16)))
      .withColumn("rn", row_number().over(w1))
      .filter($"rn" <= CcnetSampleK)
      .withColumn("rn2", row_number().over(w2))
      .filter($"rn2" <= CcnetSampleK)
      .select($"logloss", $"doc_id")
      .collect().map(r => (r.getDouble(0), r.getLong(1))).sorted
    require(sample.length >= 171,
      s"CCNet bucket thresholds need >= 171 sampled docs, got ${sample.length}")
    val (t1, t2) = (sample(85)._1, sample(170)._1)
    val bucket = when($"logloss" <= t1, "head")
      .when($"logloss" <= t2, "middle").otherwise("tail")
    ll.withColumn("bucket", bucket)
      .groupBy($"bucket")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"n_bigrams").as("n_bigrams"),
        sum($"micro").as("s_micro"))
      .select($"bucket", $"n_docs", $"n_bigrams",
        round($"s_micro".cast("double") / $"n_docs" / 1e6, 4).as("avg_logloss"))
      .orderBy($"bucket")
  }

  /** CTE prefix mirroring [[bigramLoglossTopV]]: db (per-doc bigram
    * counts) → vocab (top-[[CcnetVocabV]] by count desc, bigram asc) →
    * model (cb + closed-vocab head totals ch) → ll (per-doc loss over
    * in-vocab bigrams only).
    */
  private val ccnetCtes =
    s"""tk AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |bg AS (
      |  SELECT doc_id,
      |    unnest(list_transform(range(2, len(toks) + 1),
      |      i -> toks[i - 1] || ' ' || toks[i])) AS bigram
      |  FROM tk WHERE len(toks) >= 2),
      |db AS (
      |  SELECT doc_id, bigram, count(*) AS c
      |  FROM bg GROUP BY doc_id, bigram),
      |vocab AS (
      |  SELECT bigram, sum(c) AS cb FROM db GROUP BY bigram
      |  ORDER BY cb DESC, bigram ASC LIMIT $CcnetVocabV),
      |model AS (
      |  SELECT bigram, cb,
      |    sum(cb) OVER (PARTITION BY string_split(bigram, ' ')[1]) AS ch
      |  FROM vocab),
      |ll AS (
      |  SELECT doc_id,
      |    CAST(sum(c) AS BIGINT) AS n_bigrams,
      |    round(sum(c * ln(CAST(ch AS DOUBLE) / cb)) / CAST(sum(c) AS DOUBLE), 4)
      |      AS logloss
      |  FROM db JOIN model USING (bigram)
      |  GROUP BY doc_id)""".stripMargin

  private val ccnetOracle =
    s"""WITH $ccnetCtes,
      |sh AS (
      |  SELECT logloss, doc_id,
      |    ('0x' || substr(md5('$CcnetSeed|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
      |  FROM ll),
      |sample AS (
      |  SELECT logloss, doc_id FROM sh ORDER BY h, doc_id LIMIT $CcnetSampleK),
      |t1 AS (SELECT logloss AS t FROM sample ORDER BY logloss, doc_id LIMIT 1 OFFSET 85),
      |t2 AS (SELECT logloss AS t FROM sample ORDER BY logloss, doc_id LIMIT 1 OFFSET 170),
      |b AS (
      |  SELECT CASE WHEN logloss <= (SELECT t FROM t1) THEN 'head'
      |              WHEN logloss <= (SELECT t FROM t2) THEN 'middle'
      |              ELSE 'tail' END AS bucket,
      |    n_bigrams,
      |    CAST(round(logloss * 1e6) AS BIGINT) AS micro
      |  FROM ll)
      |SELECT bucket, count(*) AS n_docs,
      |  CAST(sum(n_bigrams) AS BIGINT) AS n_bigrams,
      |  round(CAST(sum(micro) AS DOUBLE) / count(*) / 1e6, 4) AS avg_logloss
      |FROM b
      |GROUP BY bucket
      |ORDER BY bucket""".stripMargin

  // ---------------------- domain reweighting by excess loss (DoReMi)

  /** DoReMi-shaped domain mixture tuning: per source, the
    * token-weighted cross-entropy under the SAME closed-vocabulary
    * bigram model the CCNet buckets score with, its EXCESS over the
    * corpus-wide loss, and a new mixture weight ∝ natural share ×
    * exp(excess) — domains the reference model finds hard get
    * up-weighted (Xie et al. 2023's multiplicative-weights direction,
    * one step, η = 1). This is the principled version of the
    * temperature mix in [[CorpusSampling]]: temperature reweights by
    * SIZE alone; excess loss reweights by how much signal a domain
    * still carries.
    *
    * Determinism contract: per-doc loss enters as integer micro-nats
    * (the ccnet `micro` column), so every cross-row sum — per-source,
    * global, and the weight normalization — is integer and
    * aggregation-order-free; the only per-row doubles are |sources|
    * `exp` calls on a ≤20-row frame, rounded at milli. Scale shape:
    * one corpus pass for the loss frame ([[bigramLoglossTopV]] — the
    * fixed-width broadcast model), one id-join to attach `source`, one
    * combinable per-source aggregate; the global totals and the weight
    * normalization are window sums over the |sources|-row result.
    */
  private def domainReweightExcess(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.fanOut(Tables.documents(s, dir))
    val ll = bigramLoglossTopV(docs, CcnetVocabV)
      .withColumn("micro", round($"logloss" * 1e6).cast("bigint"))
    val all = Window.partitionBy()
    ll.join(docs.select($"doc_id", $"source"), Seq("doc_id"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_bigrams").as("n_bigrams"),
        sum($"n_bigrams" * $"micro").as("s_wmicro"))
      .withColumn("loss_micro", expr("s_wmicro div n_bigrams"))
      .withColumn("g_loss_micro",
        expr("sum(s_wmicro) over () div sum(n_bigrams) over ()"))
      .withColumn("excess_micro", $"loss_micro" - $"g_loss_micro")
      .withColumn("boost_milli",
        round(lit(1000.0) * exp($"excess_micro".cast("double") / 1e6))
          .cast("long"))
      .withColumn("numer", $"n_bigrams" * $"boost_milli")
      .withColumn("weight_permille",
        expr("(1000 * numer) div (sum(numer) over ())"))
      .select($"source", $"n_docs", $"n_bigrams",
        round($"loss_micro".cast("double") / 1e6, 4).as("avg_logloss"),
        round($"excess_micro".cast("double") / 1e6, 4).as("excess"),
        $"weight_permille")
      .orderBy($"source")
  }

  private val domainReweightOracle =
    s"""WITH $ccnetCtes,
      |src AS (SELECT doc_id, source FROM documents),
      |per AS (
      |  SELECT source, count(*) AS n_docs,
      |    CAST(sum(n_bigrams) AS BIGINT) AS nb,
      |    CAST(sum(n_bigrams * CAST(round(logloss * 1e6) AS BIGINT)) AS BIGINT) AS sw
      |  FROM ll JOIN src USING (doc_id)
      |  GROUP BY source),
      |g AS (
      |  SELECT CAST(sum(sw) AS BIGINT) AS gs, CAST(sum(nb) AS BIGINT) AS gn
      |  FROM per),
      |e AS (
      |  SELECT source, n_docs, nb, sw // nb AS loss_micro,
      |    (sw // nb) - (gs // gn) AS excess_micro
      |  FROM per, g),
      |b AS (
      |  SELECT *, nb * CAST(round(1000 * exp(CAST(excess_micro AS DOUBLE) / 1e6))
      |    AS BIGINT) AS numer
      |  FROM e)
      |SELECT source, n_docs, nb AS n_bigrams,
      |  round(CAST(loss_micro AS DOUBLE) / 1e6, 4) AS avg_logloss,
      |  round(CAST(excess_micro AS DOUBLE) / 1e6, 4) AS excess,
      |  CAST((1000 * numer) // (SELECT CAST(sum(numer) AS BIGINT) FROM b)
      |    AS BIGINT) AS weight_permille
      |FROM b
      |ORDER BY source""".stripMargin

  // --------------------------------------- DSIR importance weighting

  private val DsirBuckets = 1024
  private val DsirSeed = 41
  private val TargetSources = Seq("src0", "src1", "src2")

  /** DSIR-shaped importance weights over a (doc_id, source, text)
    * frame: hash every bigram into a fixed `buckets`-bucket feature
    * space, fit add-one-smoothed bucket distributions for the TARGET
    * domain (`targetSources` as the "clean" proxy) and the RAW corpus,
    * and score each document by its feature-weighted log-likelihood
    * ratio sum(c · ln(p_t / p_r)). Positive = looks like the target
    * domain. The bucket model has `buckets` keys regardless of corpus
    * size (the hashing trick's entire purpose at 100 TB), so it rides
    * along as window sums — one exploded pass, no join.
    */
  def dsirWeights(docs: DataFrame, targetSources: Seq[String] = TargetSources,
      buckets: Int = DsirBuckets, seed: Int = DsirSeed): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val isTarget = $"source".isin(targetSources: _*)
    // global totals WITHOUT touching the exploded frame: a document
    // contributes max(len-1, 0) bigrams, so both totals are map-side
    // sums of token counts — a 1-row scalar bridge (the unigramQuality
    // pattern) whose job never hashes a single bigram
    val nb = when(size(TextOps.tokens($"text")) < 2, lit(0L))
      .otherwise((size(TextOps.tokens($"text")) - 1).cast("long"))
    val totals = docs.agg(
      sum(when(isTarget, nb).otherwise(lit(0L))),
      sum(nb)).first()
    val (tt, tr) = (totals.getLong(0), totals.getLong(1))
    // ONE pass over the exploded bigrams; the ≤`buckets`-key model is
    // attached as window sums over partitionBy(b) — the bucketed twin
    // of the bigram-LM pattern, with no second scan and no join. (The
    // hashing trick still does its job: the window key space is fixed
    // at `buckets`, so state per partition is bounded by the corpus's
    // per-bucket share, never by vocabulary growth.)
    val wb = Window.partitionBy($"b")
    docs
      // native kernel: one call per row, only the 8-byte bucket ids
      // leave it — the HOF executable spec this replaces,
      //   explode(bigramsOf(text)) then pmod(portableHash64(bigram,
      //   seed), buckets),
      // materialized every bigram STRING and ran an interpreted
      // md5→hex→conv tree per bigram (LmPipelineSpec pins parity)
      .select($"doc_id", $"source", explode(
        graft.plans.HashExpressions.bigramBucketIds($"text", seed,
          buckets.toLong)).as("b"))
      .groupBy($"doc_id", $"source", $"b")
      .agg(count(lit(1)).as("c"))
      .withColumn("ct", sum(when(isTarget, $"c").otherwise(lit(0L))).over(wb))
      .withColumn("cr", sum($"c").over(wb))
      .withColumn("logratio",
        log(($"ct" + 1).cast("double") / lit(tt.toDouble + buckets))
          - log(($"cr" + 1).cast("double") / lit(tr.toDouble + buckets)))
      .groupBy($"doc_id")
      .agg(
        sum($"c").as("n_feats"),
        round(sum($"c" * $"logratio"), 4).as("logweight"))
  }

  private def dsirImportanceWeights(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    dsirWeights(Tables.fanOut(Tables.documents(s, dir))).orderBy($"doc_id")
  }

  private val dsirOracle = {
    val targets = TargetSources.map(t => s"'$t'").mkString(", ")
    s"""WITH tk AS (
       |  SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents),
       |bg AS (
       |  SELECT doc_id, source,
       |    unnest(list_transform(range(2, len(toks) + 1),
       |      i -> toks[i - 1] || ' ' || toks[i])) AS bigram
       |  FROM tk WHERE len(toks) >= 2),
       |f AS (
       |  SELECT doc_id, source,
       |    ('0x' || substr(md5('$DsirSeed|' || bigram), 1, 15))::BIGINT % $DsirBuckets AS b,
       |    count(*) AS c
       |  FROM bg GROUP BY doc_id, source, b),
       |m AS (
       |  SELECT b,
       |    sum(CASE WHEN source IN ($targets) THEN c ELSE 0 END) AS ct,
       |    sum(c) AS cr
       |  FROM f GROUP BY b),
       |mm AS (
       |  SELECT b,
       |    ln(CAST(ct + 1 AS DOUBLE) / (sum(ct) OVER () + $DsirBuckets))
       |      - ln(CAST(cr + 1 AS DOUBLE) / (sum(cr) OVER () + $DsirBuckets))
       |      AS logratio
       |  FROM m)
       |SELECT doc_id,
       |  CAST(sum(c) AS BIGINT) AS n_feats,
       |  round(sum(c * logratio), 4) AS logweight
       |FROM f JOIN mm USING (b)
       |GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin
  }

  // ------------------------- hashed linear quality classifier

  private val LrBuckets = 512L
  private val LrSeed = 17
  // Knuth multiplicative constant — spreads bucket ids into weights
  private val LrMix = 2654435761L
  private val LrRange = 2001L

  /** FastText-shaped model-based quality filtering: score every
    * document with a LINEAR classifier over hashed unigram features —
    * the "quality classifier" stage (GPT-3 §2.2 / CCNet) that follows
    * the rule pack in a pretraining pipeline. The weight vector is a
    * fixed function of the bucket id (Knuth-mix into ±1000 milli-units)
    * so both engines rebuild the identical model from nothing: the
    * point under test is the INFERENCE shape, not the training.
    *
    * Scale shape: score(doc) = Σ_tok w[hash(tok) mod B] is a per-row
    * fold over the bound token array — pure map work, NO explode and
    * NO shuffle (the model lives in the expression, not in a table to
    * join or broadcast). At 100 TB this is the cheapest possible pass:
    * one scan, one tiny count. All-integer milli-unit arithmetic keeps
    * the gate float-free.
    */
  /** score_milli of a MATERIALIZED token-array column — the model is a
    * pure expression, so the same column works on batch and STREAMING
    * frames alike (the streaming quality gate reuses it verbatim).
    */
  private[graft] def classifierScoreCol(toks: Column,
      buckets: Long = LrBuckets, seed: Int = LrSeed): Column = {
    val w = (t: Column) =>
      pmod(TextOps.portableHash64(t, seed), lit(buckets)) * LrMix % LrRange -
        (LrRange - 1) / 2
    aggregate(toks, lit(0L), (acc, t) => acc + w(t))
  }

  /** SQL mirror of [[classifierScoreCol]] over a `toks` list expression
    * — shared by the batch and streaming gates' oracles.
    */
  private[queries] def classifierScoreSql(toksExpr: String): String =
    s"""CAST(coalesce(list_sum(list_transform($toksExpr, t ->
       |    ((('0x' || substr(md5('$LrSeed|' || t), 1, 15))::BIGINT % $LrBuckets)
       |      * $LrMix) % $LrRange - ${(LrRange - 1) / 2})), 0) AS BIGINT)""".stripMargin

  def qualityClassifierScore(docs: DataFrame, buckets: Long = LrBuckets,
      seed: Int = LrSeed): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    Tables.barrier(docs
      .select($"doc_id", TextOps.tokens($"text").as("toks")))
      .select(
        $"doc_id",
        size($"toks").as("n_tokens"),
        classifierScoreCol($"toks", buckets, seed).as("score_milli"))
      .withColumn("keep", $"score_milli" >= 0)
      .orderBy($"doc_id")
  }

  // no fanOut wrapper: qualityClassifierScore's internal Tables.barrier
  // already fans out a narrow scan (one shuffle, not two)
  private def qualityClassifierDocs(s: SparkSession, dir: String): DataFrame =
    qualityClassifierScore(Tables.documents(s, dir))

  private val qualityClassifierOracle =
    s"""SELECT doc_id,
       |  CAST(len(toks) AS INTEGER) AS n_tokens,
       |  ${classifierScoreSql("toks")} AS score_milli,
       |  ${classifierScoreSql("toks")} >= 0 AS keep
       |FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
       |ORDER BY doc_id""".stripMargin

  // --------------- training the classifier: hashed Naive Bayes

  private val NbBuckets = 256L
  private val NbSeed = 23
  private val NbStops = Seq("the", "a", "of", "and", "in", "to", "is")

  /** TRAINS the model-based quality gate instead of assuming one —
    * the step [[qualityClassifierScore]] deliberately skips (its
    * weights are a fixed hash mix; the point there is inference
    * shape). This is the CCNet/fastText distillation recipe: label
    * every document with a cheap heuristic (here: stopword density
    * ≥ 5%, a C4-style fluency signal that is linear in token counts),
    * train a multinomial Naive Bayes model over hashed unigram
    * features on a 90% split, and report held-out accuracy on the
    * rest. NB rather than iterative GD because its training IS one
    * aggregation — closed-form, no driver loop, no learning rate —
    * which is exactly what a 100-TB training pass wants:
    *
    *  - the model (per-bucket per-class token counts) attaches as
    *    WINDOW sums over `partitionBy(b)` — the dsirWeights/bigram-LM
    *    pattern: one keyed shuffle on the fixed `NbBuckets` key space,
    *    no join, no broadcast of a fact-derived frame, and a bucket
    *    unseen in training degrades to the Laplace prior by the same
    *    arithmetic (its window counts are 0), with no special case.
    *  - class totals are a 4-long scalar bridge (`first()` on a 1-row
    *    aggregate — the dsirWeights/unigramQuality pattern) computed
    *    map-side from doc-level token counts, never off the exploded
    *    frame.
    *  - log-likelihood-ratio weights are rounded to integer
    *    micro-nats, so every cross-row sum in the query (training
    *    counts, per-doc scores, per-split accuracy) is INTEGER —
    *    aggregation-order-free and bit-identical in DuckDB; `ln` is
    *    per token row but each call is pure map work, and the
    *    1e-6-rounded result sits far from decision boundaries.
    *
    * Output: one row per split — docs, correct, accuracy (milli), and
    * the split's total score mass, which pins every weight and every
    * per-doc dot product, not just the argmax decisions.
    *
    * Precision notes: count products entering `ln` stay < 2^53 up to
    * ~1e7-token classes per bucket (the 100x soak's range); beyond
    * that, compute the ratio as two divisions before `ln`. Score sums
    * are micro-nat · count ≤ ~1e13 per doc — BIGINT-safe until corpus
    * row counts approach 1e5 docs per (split) times that, which a
    * per-split DECIMAL(38) sum would lift.
    */
  /** The trained-NB per-doc score frame shared by
    * [[qualityClassifierTrain]] and [[classifierCalibration]]:
    * (y, is_train, score) per document, where score is the
    * integer-micro-nat log-odds (see qualityClassifierTrain's scaladoc
    * for the scale shape — window-summed bucket counts, scalar-bridge
    * class totals).
    */
  private def nbScoredDocs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.barrier(Tables.fanOut(Tables.documents(s, dir))
        .select($"doc_id", TextOps.tokens($"text").as("toks")))
      .select($"doc_id", $"toks",
        when(lit(20) * TextOps.stopwordHits($"toks", NbStops)
          >= size($"toks"), 1L).otherwise(0L).as("y"),
        (pmod($"doc_id", lit(10)) =!= 0).as("is_train"))
    // class totals: 4 longs from doc-level token counts (scalar bridge)
    val t = docs.filter($"is_train").agg(
      sum(when($"y" === 1, size($"toks").cast("long")).otherwise(0L)),
      sum(when($"y" === 0, size($"toks").cast("long")).otherwise(0L)),
      sum($"y"), sum(lit(1L) - $"y")).first()
    val (ptot, ntot) = (t.getLong(0), t.getLong(1))
    val (npos, nneg) = (t.getLong(2), t.getLong(3))
    val tok = docs
      .select($"doc_id", $"y", $"is_train", explode($"toks").as("t"))
      .select($"doc_id", $"y", $"is_train",
        pmod(TextOps.portableHash64($"t", NbSeed), lit(NbBuckets)).as("b"))
    // Laplace-smoothed log-likelihood ratio per bucket, integer
    // micro-nats, off the per-bucket window counts
    def llr(pos: Column, neg: Column): Column =
      round(lit(1e6) * log(
        ((pos + 1L) * lit(ntot + NbBuckets)).cast("double") /
          ((neg + 1L) * lit(ptot + NbBuckets)).cast("double")))
        .cast("long")
    val prior = math.round(1e6 * math.log((npos + 1).toDouble / (nneg + 1)))
    val wb = Window.partitionBy($"b")
    tok
      .select($"doc_id", $"y", $"is_train",
        llr(
          sum(when($"is_train" && $"y" === 1, 1L).otherwise(0L)).over(wb),
          sum(when($"is_train" && $"y" === 0, 1L).otherwise(0L)).over(wb))
          .as("w"))
      .groupBy($"doc_id", $"y", $"is_train")
      .agg(sum($"w").as("sum_w"))
      .select($"y", $"is_train", ($"sum_w" + prior).as("score"))
  }

  private def qualityClassifierTrain(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    nbScoredDocs(s, dir)
      .withColumn("pred", when($"score" >= 0, 1L).otherwise(0L))
      .groupBy($"is_train")
      .agg(count(lit(1)).as("n_docs"),
        sum(when($"pred" === $"y", 1L).otherwise(0L)).as("n_correct"),
        sum($"score").as("sum_score"))
      .select(
        when($"is_train", lit("train")).otherwise(lit("test")).as("split"),
        $"n_docs", $"n_correct",
        expr("1000 * n_correct div n_docs").as("acc_milli"),
        $"sum_score")
      .orderBy($"split")
  }

  /** Shared oracle prefix: the `scored` CTE chain mirroring
    * [[nbScoredDocs]] exactly.
    */
  private val nbScoredCtes = {
    val stops = NbStops.map(w => s"'$w'").mkString(", ")
    s"""d AS (
       |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |docs AS (
       |  SELECT doc_id, toks,
       |    CASE WHEN 20 * len(list_filter(toks, t -> t IN ($stops)))
       |         >= len(toks) THEN 1 ELSE 0 END AS y,
       |    doc_id % 10 <> 0 AS is_train
       |  FROM d),
       |tok AS (
       |  SELECT doc_id, y, is_train,
       |    ('0x' || substr(md5('$NbSeed|' || unnest(toks)), 1, 15))::BIGINT
       |      % $NbBuckets AS b
       |  FROM docs),
       |tots AS (
       |  SELECT
       |    CAST(sum(CASE WHEN y = 1 THEN len(toks) ELSE 0 END) AS BIGINT) AS ptot,
       |    CAST(sum(CASE WHEN y = 0 THEN len(toks) ELSE 0 END) AS BIGINT) AS ntot,
       |    CAST(sum(y) AS BIGINT) AS npos,
       |    CAST(sum(1 - y) AS BIGINT) AS nneg
       |  FROM docs WHERE is_train),
       |wtok AS (
       |  SELECT doc_id, y, is_train,
       |    CAST(sum(CASE WHEN is_train AND y = 1 THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY b) AS BIGINT) AS pos,
       |    CAST(sum(CASE WHEN is_train AND y = 0 THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY b) AS BIGINT) AS neg
       |  FROM tok),
       |consts AS (
       |  SELECT
       |    CAST(round(1e6 * ln(CAST(npos + 1 AS DOUBLE)
       |      / CAST(nneg + 1 AS DOUBLE))) AS BIGINT) AS prior
       |  FROM tots),
       |scored AS (
       |  SELECT doc_id, y, is_train,
       |    CAST(sum(CAST(round(1e6 * ln(
       |        CAST((pos + 1) * (ntot + $NbBuckets) AS DOUBLE) /
       |        CAST((neg + 1) * (ptot + $NbBuckets) AS DOUBLE))) AS BIGINT))
       |      + any_value(prior) AS BIGINT) AS score
       |  FROM wtok, tots, consts
       |  GROUP BY doc_id, y, is_train)""".stripMargin
  }

  private val classifierTrainOracle =
    s"""WITH $nbScoredCtes
       |SELECT
       |  CASE WHEN is_train THEN 'train' ELSE 'test' END AS split,
       |  count(*) AS n_docs,
       |  CAST(sum(CASE WHEN (CASE WHEN score >= 0 THEN 1 ELSE 0 END) = y
       |    THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
       |  CAST(1000 * sum(CASE WHEN (CASE WHEN score >= 0 THEN 1 ELSE 0 END) = y
       |    THEN 1 ELSE 0 END) // count(*) AS BIGINT) AS acc_milli,
       |  CAST(sum(score) AS BIGINT) AS sum_score
       |FROM scored
       |GROUP BY is_train
       |ORDER BY split""".stripMargin

  /** Reliability audit of the trained classifier — the step ML-ops
    * runs after [[qualityClassifierTrain]] before trusting scores as
    * sampling weights: documents bucketed into ten fixed-width
    * probability bins by the sigmoid of the NB log-odds, with the
    * predicted-probability mass and the EMPIRICAL positive count per
    * (split, bin). Per-bin |avg p − pos rate| weighted by n_docs is
    * exactly the expected calibration error, and the per-bin rows pin
    * it while staying integer-exact: p is micro-rounded BEFORE binning
    * and summing, so both engines aggregate identical integers (the
    * sigmoid's 1-ULP wiggle is washed by the same micro-round every
    * trained model in the registry uses).
    *
    * Scale shape: one extra map + combinable agg over the scored-docs
    * frame — ≤ 20 output rows; everything corpus-sized is inherited
    * from [[nbScoredDocs]].
    */
  private def classifierCalibration(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    nbScoredDocs(s, dir)
      .select($"y", $"is_train",
        round(lit(1e6) / (lit(1.0) + exp(-($"score".cast("double")) / lit(1e6))))
          .cast("bigint").as("p_micro"))
      .withColumn("bin", least(expr("p_micro div 100000"), lit(9L)))
      .groupBy($"is_train", $"bin")
      .agg(count(lit(1)).as("n_docs"),
        sum($"p_micro").as("sum_p_micro"),
        sum($"y").as("n_pos"))
      .select(
        when($"is_train", lit("train")).otherwise(lit("test")).as("split"),
        $"bin", $"n_docs", $"sum_p_micro", $"n_pos")
      .orderBy($"split", $"bin")
  }

  private val classifierCalibrationOracle =
    s"""WITH $nbScoredCtes,
       |pb AS (
       |  SELECT y, is_train,
       |    CAST(round(1e6 / (1 + exp(-CAST(score AS DOUBLE) / 1e6))) AS BIGINT)
       |      AS p_micro
       |  FROM scored)
       |SELECT
       |  CASE WHEN is_train THEN 'train' ELSE 'test' END AS split,
       |  CAST(least(p_micro // 100000, 9) AS BIGINT) AS bin,
       |  count(*) AS n_docs,
       |  CAST(sum(p_micro) AS BIGINT) AS sum_p_micro,
       |  CAST(sum(y) AS BIGINT) AS n_pos
       |FROM pb
       |GROUP BY 1, 2
       |ORDER BY split, bin""".stripMargin

  // --------------------------------- RAG sliding-window chunking

  private val RagWindow = 8
  private val RagStride = 4

  /** Retrieval-corpus chunking: cut every document into
    * `window`-token chunks every `stride` tokens (stride < window ⇒
    * overlapping context, the standard RAG indexing shape). Emits one
    * row per chunk with its token offset, length, and content digest —
    * the frame an embedding stage consumes. Start positions are
    * 0, stride, 2·stride, … while they fall inside the document; the
    * final chunks shorten at the boundary rather than padding.
    *
    * Scale shape: per-row map work (sequence + slice off ONE bound
    * token array) followed by posexplode — output rows ≈ docs ×
    * (n_tokens / stride), no shuffle anywhere in the operator (the
    * ORDER BY is oracle determinism). The downstream embedder sees
    * chunks already co-partitioned by source document.
    */
  /** (doc_id, chunk_id, chunk) sliding-window chunk frame — THE single
    * definition of the chunk grid, shared by [[ragChunks]] and
    * [[ragRetrieveE2e]] so the retriever can never drift off the
    * chunker's windows.
    */
  private def chunkFrame(docs: DataFrame, window: Int, stride: Int): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val toks = TextOps.tokens($"text")
    // ceil(n / stride) starts: every multiple of `stride` below n
    val nStarts = ceil(size(toks).cast("double") / stride).cast("int")
    val chunks = transform(
      sequence(lit(0), nStarts - 1),
      i => array_join(slice(toks, i * stride + 1, lit(window)), " "))
    docs.select($"doc_id", posexplode(chunks).as(Seq("chunk_id", "chunk")))
  }

  def ragChunks(docs: DataFrame, window: Int = RagWindow,
      stride: Int = RagStride): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    chunkFrame(docs, window, stride)
      .select(
        $"doc_id",
        $"chunk_id",
        ($"chunk_id" * stride).as("start_tok"),
        size(TextOps.tokens($"chunk")).as("n_tok"),
        md5($"chunk").as("chunk_md5"))
      .orderBy($"doc_id", $"chunk_id")
  }

  private def ragChunkDocs(s: SparkSession, dir: String): DataFrame =
    ragChunks(Tables.fanOut(Tables.documents(s, dir)))

  /** SQL mirror of [[chunkFrame]] — `tk`/`ch` CTEs shared by the
    * chunker and retriever oracles.
    */
  private val ragChunkCtes =
    s"""tk AS (
       |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |ch AS (
       |  SELECT doc_id,
       |    unnest(range(0, CAST(ceil(len(toks) / $RagStride.0) AS INT)))
       |      AS chunk_id,
       |    unnest(list_transform(
       |      range(0, CAST(ceil(len(toks) / $RagStride.0) AS INT)),
       |      i -> array_to_string(
       |        toks[i * $RagStride + 1 : i * $RagStride + $RagWindow], ' ')))
       |      AS chunk
       |  FROM tk)""".stripMargin

  private val ragChunkOracle =
    s"""WITH $ragChunkCtes
       |SELECT doc_id,
       |  CAST(chunk_id AS INTEGER) AS chunk_id,
       |  CAST(chunk_id * $RagStride AS INTEGER) AS start_tok,
       |  CAST(len(string_split(chunk, ' ')) AS INTEGER) AS n_tok,
       |  md5(chunk) AS chunk_md5
       |FROM ch
       |ORDER BY doc_id, chunk_id""".stripMargin

  // --------------------------- RAG end-to-end retrieval gate

  private val RagDim = 16      // hashed-BoW embedding dimensionality
  private val RagHashSeed = 29 // feature-hash seed (md5 scheme)
  private val RagCents = 8     // IVF cells over the chunk index
  private val RagProbe = 2     // cells the query probes
  private val RagRetTopK = 10
  private val RagQuery = "vector join fast query scan"

  /** Driver-side mirror of [[TextOps.portableHash64]] — md5 prefix, 60
    * bits, always non-negative — for hashing the QUERY string's tokens
    * without a Spark job.
    */
  private def portableHash64(seed: Int, t: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$seed|$t".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16)
  }

  /** Driver-side hashed-BoW of a chunk string — exact mirror of
    * [[hashBuckets]] + bucket counting, for the handful of codebook
    * chunks and the query string (no Spark job, no corpus-wide
    * embedding pass just to read k vectors).
    */
  private def bowOf(chunk: String): Array[Long] = {
    val v = new Array[Long](RagDim)
    chunk.split(" ", -1).foreach { t =>
      v((portableHash64(RagHashSeed, t) % RagDim).toInt) += 1L
    }
    v
  }

  /** The COMPOSED retrieval pipeline the chunker and the IVF index
    * exist for, in one oracle-gated plan: documents → sliding-window
    * chunks ([[ragChunks]]' shape) → hashed-BoW chunk embeddings →
    * IVF-style cell assignment against a deterministic codebook (the
    * first [[RagCents]] chunks in (doc_id, chunk_id) order — a LIMIT-k
    * collect, the same k·dim driver bridge as the trained codebook) →
    * the query probes its [[RagProbe]] best cells → exact
    * inner-product ranking of the survivors → top-[[RagRetTopK]]
    * chunks. Maximum-inner-product retrieval (MIPS) rather than
    * cosine keeps every score an exact BIGINT.
    *
    * Scale/codegen shape: per-token work is ROWS, not interpreted HOF
    * elements — explode the chunk tokens, hash each token ONCE in
    * whole-stage codegen, and compute all [[RagCents]]+1 inner
    * products as combinable SUMs of weight-table lookups
    * (dot(emb, w) = Σ_token w[bucket(tok)], so no embedding vector is
    * ever materialized). Map-side partial aggregation collapses the
    * token rows back to one row per chunk before the single keyed
    * shuffle; assignment + probe filter are literal-array arithmetic on
    * the aggregated dots; the final top-k is a TakeOrderedAndProject.
    * Earlier HOF formulations of the same semantics ran 31 s (md5
    * re-hashed per bucket) and 6 s (interpreted per-element folds) at
    * sf0.1; this plan runs ~1 s — the reason §codegen-friendly is a
    * design rule, not a style preference.
    */
  private def ragRetrieveE2e(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def chunks = chunkFrame(Tables.documents(s, dir), RagWindow, RagStride)
    // codebook: first RagCents chunks by (doc_id, chunk_id). Every doc
    // emits chunk 0, so the globally-first RagCents chunks live inside
    // the RagCents lowest doc_ids — chunk ONLY those docs for the
    // collect (a TakeOrdered over <= RagCents documents, not a
    // corpus-wide chunking pass), then hash the strings driver-side.
    val cents: Array[Array[Long]] = chunkFrame(
        Tables.documents(s, dir).orderBy($"doc_id").limit(RagCents),
        RagWindow, RagStride)
      .orderBy($"doc_id", $"chunk_id").limit(RagCents)
      .select($"chunk").as[String].collect()
      .map(bowOf)
    val qv = bowOf(RagQuery)
    // probe cells: best RagProbe centroids by (dot desc, cid asc)
    val probe = cents.zipWithIndex
      .map { case (c, cid) =>
        (cid, c.zip(qv).map { case (a, b) => a * b }.sum) }
      .sortBy { case (cid, d) => (-d, cid) }
      .take(RagProbe).map(_._1).toSeq
    // one codegen'd row per (chunk, token): hash each token exactly once
    val perTok = chunks
      .select($"doc_id", $"chunk_id", $"chunk",
        explode(TextOps.tokens($"chunk")).as("tok"))
      .select($"doc_id", $"chunk_id", $"chunk",
        pmod(TextOps.portableHash64($"tok", RagHashSeed), lit(RagDim))
          .cast("int").as("b"))
    // all RagCents+1 inner products as combinable lookup-table sums;
    // (doc_id, chunk_id) is already unique — carrying `chunk` in the
    // key adds bytes, not cardinality, and saves a second corpus pass
    // to recover the chunk text for the top-k output
    val dotAggs = cents.zipWithIndex.map { case (c, i) =>
      sum(element_at(typedlit(c), $"b" + 1)).as(s"d$i")
    } :+ sum(element_at(typedlit(qv), $"b" + 1)).as("score")
    val scored = perTok
      .groupBy($"doc_id", $"chunk_id", $"chunk")
      .agg(dotAggs.head, dotAggs.tail: _*)
    // assignment: argmax integer dot, array_position finds the FIRST
    // maximum → lowest cid wins ties (cents are in ascending-cid order)
    val dots = array(cents.indices.map(i => col(s"d$i")): _*)
    val cell = array_position(dots, array_max(dots)).cast("int") - 1
    scored
      .withColumn("cell", cell)
      .filter($"cell".isin(probe: _*))
      .orderBy($"score".desc, $"doc_id", $"chunk_id")
      .limit(RagRetTopK)
      .select($"doc_id", $"chunk_id".cast("int").as("chunk_id"),
        md5($"chunk").as("chunk_md5"), $"score")
  }

  private val ragRetrieveOracle = {
    val hashBucket = (v: String) =>
      s"(('0x' || substr(md5('$RagHashSeed|' || $v), 1, 15))::BIGINT % $RagDim)"
    val embOf = (toksExpr: String) =>
      s"""list_transform(range(0, $RagDim), b ->
         |      CAST(len(list_filter($toksExpr, t -> ${hashBucket("t")} = b)) AS BIGINT))"""
        .stripMargin
    s"""WITH $ragChunkCtes,
       |ce AS (
       |  SELECT doc_id, chunk_id, chunk,
       |    ${embOf("string_split(chunk, ' ')")} AS emb
       |  FROM ch),
       |cents AS (
       |  SELECT row_number() OVER (ORDER BY doc_id, chunk_id) - 1 AS cid,
       |    emb AS c
       |  FROM ce ORDER BY doc_id, chunk_id LIMIT $RagCents),
       |q AS (SELECT ${embOf(s"string_split('$RagQuery', ' ')")} AS qv),
       |asg AS (
       |  SELECT ce.doc_id, ce.chunk_id, ce.chunk, ce.emb, cid,
       |    row_number() OVER (PARTITION BY ce.doc_id, ce.chunk_id ORDER BY
       |      list_dot_product(ce.emb::DOUBLE[], c::DOUBLE[]) DESC, cid) AS rn
       |  FROM ce CROSS JOIN cents),
       |qc AS (
       |  SELECT cid FROM (
       |    SELECT cid, row_number() OVER (ORDER BY
       |      list_dot_product(qv::DOUBLE[], c::DOUBLE[]) DESC, cid) AS rn
       |    FROM cents, q) WHERE rn <= $RagProbe)
       |SELECT a.doc_id, CAST(a.chunk_id AS INTEGER) AS chunk_id,
       |  md5(a.chunk) AS chunk_md5,
       |  CAST(list_dot_product(a.emb::DOUBLE[], q.qv::DOUBLE[]) AS BIGINT)
       |    AS score
       |FROM asg a JOIN qc USING (cid), q
       |WHERE a.rn = 1
       |ORDER BY score DESC, a.doc_id, a.chunk_id
       |LIMIT $RagRetTopK""".stripMargin
  }

  def queries: Seq[Q] = Seq(
    Q("chunk_dedup_docs", chunkDedupDocs, Some(chunkDedupOracle)),
    Q("bigram_lm_quality", bigramLmQuality, Some(bigramOracle)),
    Q("ccnet_perplexity_buckets", ccnetPerplexityBuckets, Some(ccnetOracle)),
    Q("domain_reweight_excess", domainReweightExcess, Some(domainReweightOracle)),
    Q("dsir_importance_weights", dsirImportanceWeights, Some(dsirOracle)),
    Q("quality_classifier_score", qualityClassifierDocs,
      Some(qualityClassifierOracle)),
    Q("classifier_calibration", classifierCalibration,
      Some(classifierCalibrationOracle)),
    Q("quality_classifier_train", qualityClassifierTrain,
      Some(classifierTrainOracle)),
    Q("rag_chunk_overlap", ragChunkDocs, Some(ragChunkOracle)),
    Q("rag_retrieve_e2e", ragRetrieveE2e, Some(ragRetrieveOracle)))
}
