package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Tables

/** Repetition-based quality signals and sequence packing — the two
  * corpus-preparation steps between filtering and tokenization.
  *
  * Repetition scoring follows the published Gopher/MassiveText rule
  * family (duplicate-word fraction, most-frequent-n-gram fraction):
  * documents dominated by one repeated phrase are boilerplate. All
  * fractions divide exact integer counts, and the repetitive FLAG
  * compares integers (freq × 10 > n_bigrams), so no double boundary can
  * flip a row between engines.
  */
object CorpusQuality {

  private def toks(c: Column) = split(c, " ")

  /** Per-document repetition profile: token counts, duplicate-word
    * fraction, top-bigram fraction, and an integer-compare repetitive
    * flag. Pure map-side HOF work over the fanned-out scan; the bigram
    * frequency scan is O(distinct² ) per row, bounded by document length
    * — never a join.
    */
  private def docRepetition(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val t = toks($"text")
    // guard: Spark's sequence(1, 0) steps DESCENDING (DuckDB's
    // generate_series(1, 0) is empty) — 1-token docs need an explicit
    // empty bigram list
    val bg = when(size(t) >= 2,
        transform(sequence(lit(1), size(t) - 1),
          i => concat_ws(" ", element_at(t, i), element_at(t, i + 1))))
      .otherwise(array().cast("array<string>"))
    Tables.barrier(Tables.documents(s, dir)
      .select($"doc_id", t.as("t"), bg.as("bg")))
      // guarded barrier: materialize token/bigram arrays once
      // (interpreted HOFs get no codegen CSE; without this every
      // consumer re-splits); identity on an already-wide scan
      .select(
        $"doc_id",
        size($"t").as("n_tokens"),
        size(array_distinct($"t")).as("n_distinct"),
        size($"bg").as("n_bigrams"),
        // max bigram frequency via a LINEAR run-length scan of the
        // SORTED bigram list (equal values are adjacent after sort, so
        // the longest run IS the top frequency). The previous form —
        // filter() inside transform() over the distinct list — was
        // O(distinct·n) per document; invisible under the old pruned
        // count() benchmark, 2.8 s at sf0.1 under the honest one, and
        // quadratic in document length at corpus scale. The NUL sentinel
        // cannot appear in a space-joined bigram, so the first element
        // always starts a fresh run.
        when(size($"bg") > 0,
          aggregate(array_sort($"bg"),
            struct(lit("\u0000").as("prev"), lit(0).as("run"),
              lit(0).as("best")),
            (acc, x) => {
              val run = when(x === acc("prev"), acc("run") + 1)
                .otherwise(lit(1))
              struct(x.as("prev"), run.as("run"),
                greatest(acc("best"), run).as("best"))
            },
            acc => acc("best")))
          .otherwise(lit(0)).as("top_bigram_freq"))
      .select(
        $"doc_id", $"n_tokens",
        round(lit(1.0) - $"n_distinct".cast("double") / $"n_tokens", 6).as("dup_word_frac"),
        $"top_bigram_freq",
        ($"top_bigram_freq" * 10 > $"n_bigrams").as("is_repetitive"))
      .orderBy($"doc_id")
  }

  private val docRepetitionOracle =
    """SELECT doc_id,
      |  len(t) AS n_tokens,
      |  round(1.0 - len(list_distinct(t)) / CAST(len(t) AS DOUBLE), 6) AS dup_word_frac,
      |  top_bigram_freq,
      |  top_bigram_freq * 10 > n_bigrams AS is_repetitive
      |FROM (
      |  SELECT doc_id, t, bg,
      |    len(bg) AS n_bigrams,
      |    CASE WHEN len(bg) > 0 THEN
      |      list_max(list_transform(list_distinct(bg),
      |        x -> len(list_filter(bg, y -> y = x))))
      |    ELSE 0 END AS top_bigram_freq
      |  FROM (
      |    SELECT doc_id, t,
      |      list_transform(generate_series(1, len(t) - 1),
      |        i -> t[i] || ' ' || t[i + 1]) AS bg
      |    FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)))
      |ORDER BY doc_id""".stripMargin

  /** Contiguous sequence packing: documents are packed source-by-source
    * in doc_id order into fixed 512-token bins — pack k holds the docs
    * whose cumulative token count starts in [k·512, (k+1)·512). The
    * window sum is exact integer arithmetic, so bin membership is
    * deterministic. Parallelism is per-source (the window partition
    * key); at 100 TB the partition key becomes (source, hash-bucket) so
    * no single window task owns a whole domain — same plan shape.
    */
  private def tokenPacking(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"source").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(s, dir)
      .select($"doc_id", $"source", size(toks($"text")).as("n_tokens"))
      .withColumn("cum", sum($"n_tokens").over(w))
      .withColumn("pack_id", (($"cum" - $"n_tokens") / 512).cast("long"))
      .groupBy($"source", $"pack_id")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tokens").as("pack_tokens"))
      .orderBy($"source", $"pack_id")
  }

  private val tokenPackingOracle =
    """SELECT source, pack_id, count(*) AS n_docs,
      |  CAST(sum(n_tokens) AS BIGINT) AS pack_tokens
      |FROM (
      |  SELECT source, doc_id, n_tokens,
      |    CAST(floor((sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
      |      ROWS UNBOUNDED PRECEDING) - n_tokens) / 512) AS BIGINT) AS pack_id
      |  FROM (SELECT source, doc_id, len(string_split(text, ' ')) AS n_tokens
      |        FROM documents))
      |GROUP BY source, pack_id
      |ORDER BY source, pack_id""".stripMargin

  // --------------------- URL filter rules (C4/RefinedWeb crawl step)

  /** URL-rule corpus filtering — the step crawl pipelines run BEFORE
    * any content is fetched or scored: drop blocklisted domains, binary
    * media extensions, over-deep paths, and session-tracking URLs. Pure
    * codegen'd expression cascade (host extraction + `when` chain) with
    * FIRST-MATCH precedence, over the same doc_id-derived synthetic
    * provenance the canonical-URL gate uses (the corpus carries no URL
    * column; both engines derive identical URLs, so the gate checks the
    * RULES, not the synthesis). Map-only until a reasons-sized final
    * aggregate — nothing here shuffles corpus rows at any scale.
    */
  private def urlFilterRules(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val domains = Seq("example.org", "news.example", "blog.example",
      "ads.example", "tracker.example", "cdn.example", "files.example")
    val domain = element_at(typedlit(domains), (pmod($"doc_id", lit(7)) + 1).cast("int"))
    val ext = element_at(typedlit(Seq("", ".html", ".php", ".jpg", ".html",
      ".png", "", ".html", ".mp4", ".html", ".txt")),
      (pmod($"doc_id", lit(11)) + 1).cast("int"))
    val depth = (pmod($"doc_id", lit(9)) + 1).cast("int")
    val url = concat(lit("https://"), domain,
      expr("repeat('/seg', CAST(pmod(doc_id, 9) + 1 AS INT))"),
      lit("/page"), ext,
      when(pmod($"doc_id", lit(13)) === 0, lit("?sessionid=abc123"))
        .otherwise(lit("")))
    val reason = when(domain.isin("ads.example", "tracker.example"),
        lit("blocked_domain"))
      .when(ext.isin(".jpg", ".png", ".mp4"), lit("binary_ext"))
      .when(depth > 6, lit("path_too_deep"))
      .when(url.contains("sessionid="), lit("session_param"))
      .otherwise(lit("kept"))
    Tables.documents(s, dir)
      .select($"doc_id", url.as("url"), reason.as("reason"))
      .groupBy($"reason")
      .agg(count(lit(1)).as("n"), min($"doc_id").as("first_doc"))
      .orderBy($"reason")
  }

  private val urlFilterOracle =
    """WITH u AS (
      |  SELECT doc_id,
      |    ['example.org','news.example','blog.example','ads.example',
      |     'tracker.example','cdn.example','files.example'][(doc_id % 7) + 1] AS domain,
      |    ['', '.html', '.php', '.jpg', '.html', '.png', '', '.html',
      |     '.mp4', '.html', '.txt'][(doc_id % 11) + 1] AS ext,
      |    (doc_id % 9) + 1 AS depth,
      |    CASE WHEN doc_id % 13 = 0 THEN '?sessionid=abc123' ELSE '' END AS qs
      |  FROM documents),
      |r AS (
      |  SELECT doc_id,
      |    CASE
      |      WHEN domain IN ('ads.example', 'tracker.example') THEN 'blocked_domain'
      |      WHEN ext IN ('.jpg', '.png', '.mp4') THEN 'binary_ext'
      |      WHEN depth > 6 THEN 'path_too_deep'
      |      WHEN qs LIKE '%sessionid=%' THEN 'session_param'
      |      ELSE 'kept' END AS reason
      |  FROM u)
      |SELECT reason, count(*) AS n, min(doc_id) AS first_doc
      |FROM r
      |GROUP BY reason
      |ORDER BY reason""".stripMargin

  // --------------------- distribution drift monitor (per-source KL)

  /** Per-source unigram-distribution drift vs the whole corpus:
    * KL(source ‖ corpus) in nats — the monitor a training pipeline runs
    * between corpus snapshots (or across providers) to catch a source
    * whose token distribution silently shifted (scraper change, encoding
    * regression, topic collapse). KL(s‖c) = (1/n_s)·Σ_w c_sw·ln(c_sw·N /
    * (n_s·c_w)): always ≥ 0, and 0 iff the source's word distribution
    * equals the corpus mixture.
    *
    * Determinism contract: every count is an exact BIGINT; the only
    * double is the per-row log-ratio, rounded to integer micro-nats
    * before the cross-row sum, so aggregation order cannot change the
    * result (the ccnet/DoReMi micro-unit convention).
    *
    * Scale shape: ONE corpus pass (explode → combinable (source, word)
    * count); everything after runs on the |sources|·|vocab| count frame,
    * orders of magnitude smaller than the corpus. The two window sums
    * (per-source totals, per-word corpus totals) shuffle only that
    * frame; at 100 TB they would be two small groupBy-join legs off the
    * same counts — same plan family, no corpus re-scan.
    */
  private def corpusDriftKl(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // the (source, word) count frame feeds THREE consumers (corpus
    // total, per-source totals, the scoring pass); persist the
    // POST-SHUFFLE frame so the corpus explode runs once —
    // MEMORY_AND_DISK spills under pressure instead of re-scanning
    // (the docBigramCounts convention). Bench clears the cache between
    // passes, so the committed watermark prices this cold.
    val wc = Tables.fanOut(Tables.documents(s, dir))
      .select($"source", explode(toks($"text")).as("word"))
      .groupBy($"source", $"word")
      .agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // corpus total: 1-row driver bridge → literal (not a crossJoin,
    // which plans as the BNLJ shape the plan audit bans outright).
    // Per-source totals: an UNHINTED join — |sources| rows in practice,
    // but corpus-derived, so the broadcast decision belongs to AQE at
    // runtime, not a hint (the decontaminate convention; a forced
    // broadcast of a grouped fact aggregate is the audited q02 bug
    // shape). NOT `sum over (partition by source)`: one source's whole
    // vocabulary in a single window partition is an unbounded task.
    val srcTot = wc.groupBy($"source").agg(sum($"c").as("ns"))
    val nTot: Long = srcTot.agg(sum($"ns")).head().getLong(0)
    // per-word corpus counts: keyed window, ≤ |sources| rows per key
    val byWord = Window.partitionBy($"word")
    wc.withColumn("cw", sum($"c").over(byWord))
      .join(srcTot, Seq("source"))
      .withColumn("n", lit(nTot))
      // products in DOUBLE, not BIGINT: at lake scale c*n and ns*cw
      // exceed Long range, where Spark (non-ANSI) silently wraps while
      // DuckDB errors — double products stay finite to 1e308 and both
      // engines round the bigint→double cast and the multiply
      // identically (IEEE 754), so the micro-rounded result still
      // hash-matches. Identical op order in the oracle.
      .withColumn("t_micro",
        $"c" * round(log(($"c".cast("double") * $"n") / ($"ns".cast("double") * $"cw")) * 1e6)
          .cast("bigint"))
      .groupBy($"source")
      .agg(
        sum($"c").as("n_tokens"),
        count(lit(1)).as("n_words"),
        sum($"t_micro").as("s_micro"))
      .select($"source", $"n_tokens", $"n_words",
        round($"s_micro".cast("double") / $"n_tokens" / 1e6, 4).as("kl_nats"))
      .orderBy($"source")
  }

  private val corpusDriftOracle =
    """WITH wc AS (
      |  SELECT source, unnest(string_split(text, ' ')) AS word
      |  FROM documents),
      |c AS (
      |  SELECT source, word, count(*) AS c FROM wc GROUP BY source, word),
      |x AS (
      |  SELECT source, word, c,
      |    sum(c) OVER (PARTITION BY source) AS ns,
      |    sum(c) OVER (PARTITION BY word) AS cw,
      |    sum(c) OVER () AS n
      |  FROM c)
      |SELECT source,
      |  CAST(sum(c) AS BIGINT) AS n_tokens,
      |  count(*) AS n_words,
      |  round(CAST(sum(c * CAST(round(ln((CAST(c AS DOUBLE) * n) / (CAST(ns AS DOUBLE) * cw)) * 1e6)
      |      AS BIGINT)) AS DOUBLE) / sum(c) / 1e6, 4) AS kl_nats
      |FROM x
      |GROUP BY source
      |ORDER BY source""".stripMargin

  val queries: Seq[Q] = Seq(
    Q("doc_repetition", docRepetition, Some(docRepetitionOracle)),
    Q("token_packing", tokenPacking, Some(tokenPackingOracle)),
    Q("url_filter_rules", urlFilterRules, Some(urlFilterOracle)),
    Q("corpus_drift_kl", corpusDriftKl, Some(corpusDriftOracle)))
}
