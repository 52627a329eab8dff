package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  val queries: Seq[Q] = Seq(
    Q("jsonl_ingest", jsonlIngest, Some(jsonlOracle)),
    Q("csv_ingest", csvIngest, Some(csvOracle)))
}
