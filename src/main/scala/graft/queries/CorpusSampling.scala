package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{Sampling, Tables}

/** Corpus sampling & mixing — the selection stage of a training-data
  * pipeline (after cleaning/dedup, before tokenization): stratified
  * down-sampling by language, availability-capped domain mixing, and
  * train/val/test splitting. All three are deterministic hash gates
  * ([[Sampling]]): pure map-side membership, reproducible across engines
  * and partitionings — which is exactly what lets DuckDB verify the
  * SAME sample row-for-row.
  */
object CorpusSampling {

  /** Weighted sample without replacement (Efraimidis–Spirakis, top-k by
    * key u^(1/w), equivalently argmax ln(u)/w): longer documents are
    * proportionally likelier to be drawn. u comes from the engine-portable
    * 28-bit md5 hash — u = (h+1)/(2^28+1) ∈ (0,1] — so the "randomness"
    * is deterministic and the oracle draws the IDENTICAL sample. The
    * entire computation is map-side + one TakeOrdered: the distributed
    * weighted-reservoir shape (no shuffle of the corpus, no rejection
    * loop), which is why ES keys are the standard way to weighted-sample
    * a 100 TB corpus.
    */
  private def weightedSampleDocs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id", $"n_chars",
        (log((graft.ops.TextOps.portableHashBase($"doc_id".cast("string")) + 1) /
          268435457.0) / $"n_chars").as("es_key"))
      .orderBy($"es_key".desc, $"doc_id")
      .limit(50)
      .select($"doc_id", $"n_chars", round($"es_key" * 1e9, 3).as("es_key_nano"))
  }

  private val weightedSampleOracle =
    """SELECT doc_id, n_chars,
      |  round(ln((('0x' || substr(md5('0|' || CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT + 1)
      |    / 268435457.0) / n_chars * 1e9, 3) AS es_key_nano
      |FROM documents
      |ORDER BY ln((('0x' || substr(md5('0|' || CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT + 1)
      |    / 268435457.0) / n_chars DESC, doc_id
      |LIMIT 50""".stripMargin

  /** Stratified sample: languages are kept at different per-mille rates
    * (en 50%, de 25%, long-tail 10%) — the standard rebalance when one
    * language dominates a crawl. Pure map-side filter; the rate CASE
    * rides on the row.
    */
  private def stratifiedSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rate = when($"lang" === "en", lit(500L))
      .when($"lang" === "de", lit(250L))
      .otherwise(lit(100L))
    Tables.documents(s, dir)
      .filter(Sampling.keep($"doc_id", 7, rate))
      .select($"doc_id", $"lang", $"source")
      .orderBy($"doc_id")
  }

  private val stratifiedOracle =
    """SELECT doc_id, lang, source
      |FROM documents
      |WHERE ('0x' || substr(md5('7|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000
      |  < CASE WHEN lang = 'en' THEN 500 WHEN lang = 'de' THEN 250 ELSE 100 END
      |ORDER BY doc_id""".stripMargin

  /** Domain mix: every source gets an equal document budget (15), capped
    * by availability — rate_s = min(1000, 15000 div count_s) per mille.
    * Integer arithmetic end-to-end, so the rates (and therefore the
    * sample) are bit-identical in every engine. Two phases: a tiny
    * per-source count (one shuffle over |sources| groups), then the rate
    * table joins back onto a map-side gate. The rate frame is
    * |sources|-sized — domain counts are small in practice but still
    * corpus-derived, so no forced broadcast hint: AQE broadcasts it at
    * runtime when it fits (it always should), keeping the fact unshuffled.
    */
  private def domainMix(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val rates = docs.groupBy($"source").agg(count(lit(1)).as("cnt"))
      .withColumn("rate_permille", least(lit(1000L), expr("15000 div cnt")))
      .select($"source", $"rate_permille")
    docs.join(rates, "source")
      .filter(Sampling.keep($"doc_id", 11, $"rate_permille"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_sampled"), max($"rate_permille").as("rate_permille"))
      .orderBy($"source")
  }

  private val domainMixOracle =
    """WITH rates AS (
      |  SELECT source, LEAST(1000, 15000 // count(*)) AS rate_permille
      |  FROM documents GROUP BY source)
      |SELECT d.source, count(*) AS n_sampled, max(rate_permille) AS rate_permille
      |FROM documents d JOIN rates USING (source)
      |WHERE ('0x' || substr(md5('11|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000
      |  < rate_permille
      |GROUP BY d.source
      |ORDER BY d.source""".stripMargin

  /** Train/val/test split (90/5/5) with per-split volume stats. Split
    * membership is a monotone hash-cut assignment ([[Sampling.split]]):
    * re-running, re-partitioning, or growing a later split never moves a
    * document between earlier splits.
    */
  private def splitStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(
        Sampling.split($"doc_id", 13, Seq("train" -> 900, "val" -> 950), "test").as("split"),
        $"n_chars")
      .groupBy($"split")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("sum_chars"))
      .orderBy($"split")
  }

  private val splitStatsOracle =
    """SELECT
      |  CASE WHEN h < 900 THEN 'train' WHEN h < 950 THEN 'val' ELSE 'test' END AS split,
      |  count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
      |FROM (
      |  SELECT n_chars,
      |    ('0x' || substr(md5('13|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000 AS h
      |  FROM documents)
      |GROUP BY split
      |ORDER BY split""".stripMargin

  // --------------------- temperature-weighted multilingual/domain mix

  private val MixAlpha = 0.3 // XLM-R's alpha

  /** Temperature sampling weights per source (Conneau et al. XLM-R /
    * mT5's mixing rule): with natural token share q_s, sample from
    * p_s ∝ q_s^α — α < 1 up-weights low-resource sources. Emits the
    * natural share, the temperature share, and the boost p/q each
    * source gets, plus an integer expected-docs figure for a 100k-doc
    * budget.
    *
    * Scale shape: one combinable per-source aggregation over the corpus
    * (the only corpus-sized pass), then normalization as window sums
    * over the |sources|-row aggregate — the global window runs on a
    * frame bounded by the source count, not the data. Doubles appear
    * only in the α-power normalization; shares are rounded at 4dp far
    * from representation boundaries (the bigram-LM rounding contract).
    */
  private def temperatureMix(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split($"text", " ")).cast("long")).as("n_tokens"))
      .withColumn("q",
        $"n_tokens".cast("double") / sum($"n_tokens").over(Window.partitionBy()))
      .withColumn("p_raw", pow($"q", MixAlpha))
      .withColumn("p", $"p_raw" / sum($"p_raw").over(Window.partitionBy()))
      .select(
        $"source", $"n_docs", $"n_tokens",
        round($"q", 4).as("share_natural"),
        round($"p", 4).as("share_temp"),
        round($"p" / $"q", 4).as("boost"),
        round($"p" * 100000).cast("bigint").as("docs_per_100k"))
      .orderBy($"source")
  }

  private val temperatureMixOracle =
    s"""WITH agg AS (
       |  SELECT source, count(*) AS n_docs,
       |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
       |  FROM documents GROUP BY source),
       |norm AS (
       |  SELECT source, n_docs, n_tokens,
       |    CAST(n_tokens AS DOUBLE) / sum(n_tokens) OVER () AS q,
       |    pow(CAST(n_tokens AS DOUBLE) / sum(n_tokens) OVER (), $MixAlpha)
       |      AS p_raw
       |  FROM agg),
       |w AS (SELECT *, p_raw / sum(p_raw) OVER () AS p FROM norm)
       |SELECT source, n_docs, n_tokens,
       |  round(q, 4) AS share_natural,
       |  round(p, 4) AS share_temp,
       |  round(p / q, 4) AS boost,
       |  CAST(round(p * 100000) AS BIGINT) AS docs_per_100k
       |FROM w
       |ORDER BY source""".stripMargin

  // --------------------------- UniMax budget allocation

  private val UniMaxEpochCap = 4L

  /** UniMax sampling (Chung et al. 2023): spread a total token budget
    * as UNIFORMLY as possible across sources, capping every source at
    * [[UniMaxEpochCap]] epochs of its own data — the mixing rule that
    * replaced temperature sampling for multilingual pretraining
    * because it never over-repeats low-resource sources. Budget here:
    * one epoch of the natural corpus (B = Σ n_tokens).
    *
    * The allocation is the integer closed form of water-filling, NOT
    * the sequential greedy (whose per-step floor divisions would
    * accumulate engine-specific rounding): sort sources by capacity
    * c = n_tokens·E ascending (ties by source), K = the largest rank
    * whose source fits under the uniform share of what remains —
    * c_i·(n−i) ≤ B−P_i with P the running capacity sum — then ranks
    * ≤ K take their full capacity, and the remainder R = B−P_K splits
    * evenly over the m = n−K uncapped sources: ⌊R/m⌋ each, +1 token
    * for the first R mod m of them in sort order. Pure integer
    * arithmetic end to end, so both engines compute the identical
    * allocation.
    *
    * Scale shape: one combinable per-source aggregation is the only
    * corpus-sized pass; every window below runs on the |sources|-row
    * aggregate (the temperature-mix pattern).
    */
  private def unimaxMixing(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    unimaxFromCounts(Tables.documents(s, dir)
      .groupBy($"source")
      .agg(sum(size(split($"text", " ")).cast("long")).as("n_tokens")))
  }

  /** The allocation core of [[unimaxMixing]] over an arbitrary
    * (source, n_tokens) frame — public so SamplingSpec can construct a
    * skewed corpus where the epoch cap actually binds (the balanced
    * synthetic sources never reach it).
    */
  def unimaxFromCounts(counts: DataFrame): DataFrame = {
    val s = counts.sparkSession
    import s.implicits._
    val wAll = Window.partitionBy()
    val wOrd = Window.orderBy($"cap", $"source")
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts
      .withColumn("cap", $"n_tokens" * UniMaxEpochCap)
      .withColumn("budget", sum($"n_tokens").over(wAll))
      .withColumn("n_src", count(lit(1)).over(wAll))
      .withColumn("i", row_number().over(wOrd).cast("long"))
      .withColumn("p_run", sum($"cap").over(wRun))
      .withColumn("capped",
        $"cap" * ($"n_src" - $"i") <= $"budget" - $"p_run")
      .withColumn("k", max(when($"capped", $"i").otherwise(0L)).over(wAll))
      .withColumn("p_k",
        max(when($"capped", $"p_run").otherwise(0L)).over(wAll))
      .withColumn("r", $"budget" - $"p_k")
      .withColumn("m", greatest($"n_src" - $"k", lit(1L)))
      .withColumn("alloc",
        when($"i" <= $"k", $"cap")
          .otherwise(expr("r div m") +
            when($"i" - $"k" <= expr("r % m"), 1L).otherwise(0L)))
      .select(
        $"source", $"n_tokens", $"cap", $"alloc",
        ($"i" <= $"k").as("at_cap"),
        expr("(alloc * 1000) div n_tokens").as("epochs_milli"))
      .orderBy($"source")
  }

  private val unimaxOracle =
    s"""WITH agg AS (
       |  SELECT source,
       |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
       |  FROM documents GROUP BY source),
       |c AS (
       |  SELECT source, n_tokens, n_tokens * $UniMaxEpochCap AS cap,
       |    sum(n_tokens) OVER () AS budget,
       |    count(*) OVER () AS n_src,
       |    row_number() OVER (ORDER BY n_tokens * $UniMaxEpochCap, source) AS i,
       |    sum(n_tokens * $UniMaxEpochCap)
       |      OVER (ORDER BY n_tokens * $UniMaxEpochCap, source
       |            ROWS UNBOUNDED PRECEDING) AS p_run
       |  FROM agg),
       |k AS (
       |  SELECT *,
       |    max(CASE WHEN cap * (n_src - i) <= budget - p_run THEN i ELSE 0 END)
       |      OVER () AS k,
       |    max(CASE WHEN cap * (n_src - i) <= budget - p_run THEN p_run ELSE 0 END)
       |      OVER () AS p_k
       |  FROM c),
       |a AS (
       |  SELECT *, budget - p_k AS r, greatest(n_src - k, 1) AS m FROM k)
       |SELECT source, n_tokens, CAST(cap AS BIGINT) AS cap,
       |  CAST(CASE WHEN i <= k THEN cap
       |    ELSE r // m + (CASE WHEN i - k <= r % m THEN 1 ELSE 0 END)
       |  END AS BIGINT) AS alloc,
       |  i <= k AS at_cap,
       |  CAST((CASE WHEN i <= k THEN cap
       |    ELSE r // m + (CASE WHEN i - k <= r % m THEN 1 ELSE 0 END)
       |  END * 1000) // n_tokens AS BIGINT) AS epochs_milli
       |FROM a
       |ORDER BY source""".stripMargin

  // --------------------------- deterministic shard shuffle

  private val NumShards = 8
  private val ShardSeed = 17

  /** The final write-side step of a training-data pipeline: a
    * DETERMINISTIC global shuffle of the corpus into [[NumShards]]
    * shards — LLM training wants documents in pseudo-random order, but
    * a 100-TB corpus cannot pay a global sort, and the permutation must
    * be reproducible (resume a run, re-emit a shard, diff two emits).
    * The standard shape: shard = hash(doc) mod N, within-shard order by
    * the same hash — one hash repartition + per-shard sort, which is
    * Spark's `repartition(shard).sortWithinPartitions(key)` physical
    * plan (here expressed as a window so the result is a frame, not a
    * write). The hash is the engine-portable md5 form, so DuckDB
    * reproduces the identical permutation.
    *
    * Scale: N is 8 here to keep the oracle small; in production N
    * scales with the corpus (shard ≈ fixed bytes), so per-shard sort
    * mass stays constant as data grows — no operator in this plan sees
    * more than one shard's rows after the one hash exchange.
    *
    * Each output row pins one shard: its size, byte volume, and an
    * order-sensitive checksum `sum(pos · (doc_id mod 1000003))` — any
    * engine that assigns a doc to the wrong shard OR emits the right
    * docs in the wrong order changes `order_check`.
    */
  private def corpusShardShuffle(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val keyed = Tables.documents(s, dir)
      .select($"doc_id", $"n_chars",
        graft.ops.TextOps.portableHash64($"doc_id".cast("string"), ShardSeed)
          .as("k"))
      .withColumn("shard", pmod($"k", lit(NumShards.toLong)))
    keyed
      .withColumn("pos", row_number()
        .over(Window.partitionBy($"shard").orderBy($"k", $"doc_id"))
        .cast("long"))
      .groupBy($"shard")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_chars").cast("long").as("sum_chars"),
        sum($"pos" * pmod($"doc_id", lit(1000003L))).as("order_check"))
      .orderBy($"shard")
  }

  private val corpusShardShuffleOracle =
    s"""WITH k AS (
       |  SELECT doc_id, n_chars,
       |    ('0x' || substr(md5('$ShardSeed|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS k
       |  FROM documents),
       |p AS (
       |  SELECT doc_id, n_chars, k % $NumShards AS shard,
       |    row_number() OVER (PARTITION BY k % $NumShards ORDER BY k, doc_id) AS pos
       |  FROM k)
       |SELECT shard, count(*) AS n_docs,
       |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       |  CAST(sum(pos * (doc_id % 1000003)) AS BIGINT) AS order_check
       |FROM p
       |GROUP BY shard
       |ORDER BY shard""".stripMargin

  val queries: Seq[Q] = Seq(
    Q("weighted_sample_docs", weightedSampleDocs, Some(weightedSampleOracle)),
    Q("corpus_shard_shuffle", corpusShardShuffle, Some(corpusShardShuffleOracle)),
    Q("corpus_stratified_sample", stratifiedSample, Some(stratifiedOracle)),
    Q("corpus_domain_mix", domainMix, Some(domainMixOracle)),
    Q("corpus_temperature_mix", temperatureMix, Some(temperatureMixOracle)),
    Q("corpus_unimax_mix", unimaxMixing, Some(unimaxOracle)),
    Q("corpus_split_stats", splitStats, Some(splitStatsOracle)))
}
