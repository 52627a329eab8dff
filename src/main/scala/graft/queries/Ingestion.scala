package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.TextSources

/** Fault-tolerant text-format ingestion through the oracle gate. The
  * oracle-compared surface is the VALID-ROW projection (DuckDB's
  * ignore_errors skips what Spark quarantines); the quarantine counts
  * themselves are pinned by IngestionSpec, since the two engines
  * deliberately differ there (capture vs skip).
  */
object Ingestion {

  private val JsonlPath = "/root/repo/fixtures/text/docs.jsonl"
  private val CsvPath = "/root/repo/fixtures/text/docs.csv"

  private val jsonlSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("lang", StringType),
    StructField("text", StringType)))

  private val csvSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("lang", StringType),
    StructField("n_words", IntegerType)))

  private def jsonlIngest(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    TextSources.readJsonl(s, JsonlPath, jsonlSchema)
      .filter(col(TextSources.CorruptCol).isNull && $"doc_id".isNotNull)
      .select($"doc_id", $"lang", length($"text").cast("long").as("n_chars"))
      .orderBy($"doc_id")
  }

  private val jsonlOracle =
    s"""SELECT doc_id, lang, CAST(length(text) AS BIGINT) AS n_chars
       |FROM read_json('$JsonlPath',
       |  columns = {doc_id: 'BIGINT', lang: 'VARCHAR', text: 'VARCHAR'},
       |  format = 'newline_delimited', ignore_errors = true)
       |WHERE doc_id IS NOT NULL
       |ORDER BY doc_id""".stripMargin

  private def csvIngest(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    TextSources.readCsv(s, CsvPath, csvSchema)
      .filter(col(TextSources.CorruptCol).isNull && $"doc_id".isNotNull
        && $"n_words".isNotNull)
      .select($"doc_id", $"lang", $"n_words")
      .orderBy($"doc_id")
  }

  private val csvOracle =
    s"""SELECT doc_id, lang, n_words
       |FROM read_csv('$CsvPath',
       |  columns = {doc_id: 'BIGINT', lang: 'VARCHAR', n_words: 'INTEGER'},
       |  header = true, ignore_errors = true)
       |WHERE doc_id IS NOT NULL AND n_words IS NOT NULL
       |ORDER BY doc_id""".stripMargin

  /** ORC round-trip gate: orders → ORC files → scan → aggregate,
    * oracle-compared against DuckDB reading the ORIGINAL parquet — a
    * write-path gate (column types, nulls, date/decimal fidelity
    * through the second columnar format Spark ships), not just a read
    * gate. Money stays in exact integer micros across the round-trip;
    * o_orderdate travels as DATE (the ORC-portable calendar type).
    */
  private def orcIngest(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
    val orcPath = s"/tmp/graft_orc/$tag/orders"
    graft.ops.Tables.orders(s, dir)
      .select($"o_orderkey", $"o_custkey", $"o_orderpriority",
        graft.ops.Exact.micro("o_totalprice").as("price_micro"),
        $"o_orderdate".cast("date").as("o_date"))
      .write.mode("overwrite").orc(orcPath)
    s.read.orc(orcPath)
      .groupBy($"o_orderpriority")
      .agg(
        count(lit(1)).as("n"),
        sum($"price_micro").as("s_micro"),
        min($"o_date").as("first_date"),
        max($"o_date").as("last_date"))
      .select($"o_orderpriority", $"n",
        graft.ops.Exact.microSumTo4dp("s_micro").as("sum_price"),
        $"first_date", $"last_date")
      .orderBy($"o_orderpriority")
  }

  private val orcOracle =
    s"""SELECT o_orderpriority, n,
       |  ${graft.ops.Exact.microSumTo4dpSql("s_micro", graft.ops.Exact.DuckDiv)} AS sum_price,
       |  first_date, last_date
       |FROM (
       |  SELECT o_orderpriority, count(*) AS n,
       |    CAST(sum(${graft.ops.Exact.microSql("o_totalprice")}) AS BIGINT) AS s_micro,
       |    min(CAST(o_orderdate AS DATE)) AS first_date,
       |    max(CAST(o_orderdate AS DATE)) AS last_date
       |  FROM orders GROUP BY o_orderpriority)
       |ORDER BY o_orderpriority""".stripMargin

  /** Avro round-trip through the in-house avro-core bridge (the
    * spark-avro module is absent from this distribution — see
    * [[graft.sources.AvroSource]]): the orders projection is written
    * as per-partition Avro container files executor-side, read back
    * through the registered `graft-avro` DataSource V2 connector, and
    * the same exact-decimal aggregate as [[orcIngest]] is gated
    * against DuckDB reading the ORIGINAL parquet — so schema mapping
    * (long/string/date logical types), the deflate block codec, and
    * the pruned DSv2 read path are all inside the gate, at every sf
    * dir. Completes the ingest matrix: parquet/orc/csv/jsonl/binary/
    * xlsx/pdf/avro.
    */
  private def avroIngest(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
    val avroPath = s"/tmp/graft_avro/$tag/orders"
    graft.sources.AvroSource.write(
      graft.ops.Tables.orders(s, dir)
        .select($"o_orderkey", $"o_custkey", $"o_orderpriority",
          graft.ops.Exact.micro("o_totalprice").as("price_micro"),
          $"o_orderdate".cast("date").as("o_date")),
      avroPath)
    graft.sources.AvroSource.read(s, avroPath)
      .groupBy($"o_orderpriority")
      .agg(
        count(lit(1)).as("n"),
        sum($"price_micro").as("s_micro"),
        min($"o_date").as("first_date"),
        max($"o_date").as("last_date"))
      .select($"o_orderpriority", $"n",
        graft.ops.Exact.microSumTo4dp("s_micro").as("sum_price"),
        $"first_date", $"last_date")
      .orderBy($"o_orderpriority")
  }

  /** Documents → `.warc.gz` response records under `subdir`, then back
    * to (source, doc_id, text) via the reader's HTTP split — shared by
    * the round-trip gate and the crawl pipeline. With `html = true`
    * the written bodies are HTML pages (the [[TextAnalysis]] furniture:
    * style block, entity-laden heading, comment, script) and the read
    * side runs [[graft.ops.TextOps.htmlToText]] — the realistic crawl
    * shape, where what the archive holds is markup, not corpus text.
    */
  private def docsViaWarc(s: SparkSession, dir: String, subdir: String,
      html: Boolean = false): DataFrame = {
    import s.implicits._
    val body =
      if (html) graft.ops.TextOps.wrapInHtml($"text") else $"text"
    val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
    val warcPath = s"/tmp/graft_warc/$tag/$subdir"
    graft.sources.WarcSource.write(
      graft.ops.Tables.documents(s, dir)
        .select(
          concat(lit("https://corpus.example/"), $"source", lit("/"),
            $"doc_id").as("url"),
          lit("2024-01-01T00:00:00Z").as("date"),
          body.as("text")),
      warcPath)
    val decoded = decode($"body", "UTF-8")
    graft.sources.WarcSource.read(s, s"$warcPath/*.warc.gz")
      .filter($"warc_type" === "response" && $"http_status" === 200)
      .select(
        regexp_extract($"target_uri", "corpus\\.example/([^/]+)/", 1)
          .as("source"),
        regexp_extract($"target_uri", "/(\\d+)$", 1).cast("long").as("doc_id"),
        (if (html) graft.ops.TextOps.htmlToText(decoded) else decoded)
          .as("text"))
  }

  /** WARC round-trip: documents written as `.warc.gz` response records
    * (one gzip member per record — the Common Crawl layout,
    * [[graft.sources.WarcSource]]), streamed back, HTTP-split, and
    * aggregated per source with a content fingerprint — so the gate
    * pins BOTH directions byte-exactly against the documents table the
    * oracle reads directly. The source key travels in the URI path and
    * is re-extracted by regexp, like a crawl pipeline would.
    */
  private def warcIngest(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    docsViaWarc(s, dir, "docs")
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(length($"text")).cast("long").as("chars"),
        min($"doc_id").as("min_id"),
        max($"doc_id").as("max_id"),
        sum(pmod(graft.ops.TextOps.rawFingerprint64($"text"),
          lit(1000003L))).cast("long").as("fp_sum"))
      .orderBy($"source")
  }

  private val warcOracle =
    """SELECT source,
      |  count(*) AS n_docs,
      |  CAST(sum(length(text)) AS BIGINT) AS chars,
      |  min(doc_id) AS min_id,
      |  max(doc_id) AS max_id,
      |  CAST(sum(('0x' || substr(md5(text), 1, 15))::BIGINT % 1000003) AS BIGINT) AS fp_sum
      |FROM documents
      |GROUP BY source
      |ORDER BY source""".stripMargin

  /** Crawl → training corpus, end to end over the WARC trip with HTML
    * bodies: the archive holds markup (what a crawl actually stores),
    * so the pipeline is read → [[graft.ops.TextOps.htmlToText]]
    * boilerplate strip → token/stopword quality gate →
    * exact-fingerprint dedup (keeper = min doc_id among quality
    * survivors) → per-source yield accounting. The integration gate
    * for the whole front of the pipeline — every stage reuses an
    * already-gated operator, and the oracle does NOT run any of them:
    * it states the expected extracted text directly off the documents
    * table, so a WARC decode corrupting one byte OR a strip eating one
    * word shows up as a fingerprint-partition difference. Scale shape (the
    * [[CorpusPrep]] corpusPipelineE2e window idiom): ONE archive scan,
    * keeper = min-over-fingerprint-partition window, then the
    * per-source aggregate — a keepers groupBy + join-back would
    * re-execute the WARC decode per branch AND auto-broadcast an
    * unbounded per-fingerprint aggregate (the q02-class shape, which
    * the provenance audit can't even see behind a /tmp path). Tokens
    * materialize behind a barrier per the TextOps rule: interpreted
    * HOFs get no codegen CSE, so an inlined split re-tokenizes per
    * consumer.
    */
  private def crawlPipelineE2e(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val stop = Seq("the", "a", "of", "and", "in", "to", "is")
    val scored = graft.ops.Tables.barrier(docsViaWarc(s, dir, "crawl",
          html = true)
        .select($"source", $"doc_id", $"text",
          graft.ops.TextOps.tokens($"text").as("toks")))
      .select($"source", $"doc_id",
        graft.ops.TextOps.rawFingerprint64($"text").as("fp"),
        size($"toks").cast("long").as("n_tok"),
        graft.ops.TextOps.stopwordHits($"toks", stop).as("stop_hits"))
      .withColumn("quality", $"n_tok" >= 30 && $"stop_hits" >= 2)
    val keeper = min(when($"quality", $"doc_id"))
      .over(Window.partitionBy($"fp"))
    scored
      .withColumn("kept", $"quality" && $"doc_id" === keeper)
      .groupBy($"source").agg(
        count(lit(1)).as("n_crawled"),
        sum(when($"quality", 1L).otherwise(0L)).as("n_quality"),
        sum(when($"kept", 1L).otherwise(0L)).as("n_kept"),
        sum(when($"kept", $"n_tok").otherwise(0L)).as("tokens_kept"))
      .orderBy($"source")
  }

  private val crawlPipelineOracle =
    s"""WITH extracted AS (
      |  SELECT source, doc_id,
      |    trim(regexp_replace('${graft.ops.TextOps.HtmlFurnitureExpected.replace("'", "''")}' || text, '\\s+', ' ', 'g'))
      |      AS text
      |  FROM documents),
      |scored AS (
      |  SELECT source, doc_id,
      |    ('0x' || substr(md5(text), 1, 15))::BIGINT AS fp,
      |    len(string_split(text, ' ')) AS n_tok,
      |    len(list_filter(string_split(text, ' '),
      |      t -> t IN ('the', 'a', 'of', 'and', 'in', 'to', 'is'))) AS stop_hits
      |  FROM extracted),
      |q AS (SELECT *, n_tok >= 30 AND stop_hits >= 2 AS quality FROM scored),
      |keepers AS (
      |  SELECT fp, min(doc_id) AS keeper FROM q WHERE quality GROUP BY fp),
      |kept AS (
      |  SELECT q.source, q.n_tok FROM q JOIN keepers k
      |  ON q.fp = k.fp AND q.doc_id = k.keeper WHERE q.quality),
      |per_src AS (
      |  SELECT source, count(*) AS n_crawled,
      |    CAST(sum(CASE WHEN quality THEN 1 ELSE 0 END) AS BIGINT) AS n_quality
      |  FROM q GROUP BY source),
      |kept_src AS (
      |  SELECT source, count(*) AS n_kept, CAST(sum(n_tok) AS BIGINT) AS tokens_kept
      |  FROM kept GROUP BY source)
      |SELECT p.source, p.n_crawled, p.n_quality,
      |  coalesce(k.n_kept, 0) AS n_kept,
      |  coalesce(k.tokens_kept, 0) AS tokens_kept
      |FROM per_src p LEFT JOIN kept_src k USING (source)
      |ORDER BY source""".stripMargin

  val queries: Seq[Q] = Seq(
    Q("jsonl_ingest", jsonlIngest, Some(jsonlOracle)),
    Q("csv_ingest", csvIngest, Some(csvOracle)),
    Q("orc_ingest", orcIngest, Some(orcOracle)),
    // same oracle as orc: both round-trips must reproduce the source
    Q("avro_ingest", avroIngest, Some(orcOracle)),
    Q("warc_ingest", warcIngest, Some(warcOracle)),
    Q("crawl_pipeline_e2e", crawlPipelineE2e, Some(crawlPipelineOracle)))
}
