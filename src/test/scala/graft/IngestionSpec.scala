package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.TextSources

/** The PERMISSIVE quarantine contract: malformed lines are CAPTURED
  * (whole, in _corrupt) rather than dropped or fatal — the half of the
  * ingestion story the DuckDB oracle can't see (ignore_errors skips).
  */
class IngestionSpec extends SparkSpec {
  import spark.implicits._

  private val jsonlSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("lang", StringType),
    StructField("text", StringType)))

  test("jsonl: 2 malformed lines quarantined whole, 8 parsed") {
    val df = TextSources.readJsonl(spark, "/root/repo/fixtures/text/docs.jsonl",
      jsonlSchema).cache()
    val corrupt = df.filter(col(TextSources.CorruptCol).isNotNull)
    assert(corrupt.count() == 2)
    // the raw line is preserved for audit
    val lines = corrupt.select(TextSources.CorruptCol).as[String].collect().toSet
    assert(lines.exists(_.contains("broken json line")))
    assert(lines.exists(_.contains("another totally malformed line")))
    assert(df.filter(col(TextSources.CorruptCol).isNull).count() == 8)
    df.unpersist()
  }

  test("csv: type-mismatched row quarantined, valid rows typed") {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("lang", StringType),
      StructField("n_words", IntegerType)))
    val df = TextSources.readCsv(spark, "/root/repo/fixtures/text/docs.csv",
      schema).cache()
    val corrupt = df.filter(col(TextSources.CorruptCol).isNotNull)
    assert(corrupt.count() == 1)
    assert(corrupt.select(TextSources.CorruptCol).as[String].head().contains("notanumber"))
    assert(df.filter(col(TextSources.CorruptCol).isNull).count() == 6)
    df.unpersist()
  }

  test("orc: typed round-trip preserves values, nulls, and schema") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_orc_spec").toString
    val rows = Seq(
      (1L, Some("A"), Some(12345678901234L), Some(java.sql.Date.valueOf("1995-03-15"))),
      (2L, None, Some(-42L), None),
      (3L, Some("B"), None, Some(java.sql.Date.valueOf("2000-01-01"))))
      .toDF("id", "tag", "micros", "d")
    rows.write.mode("overwrite").orc(s"$tmp/t")
    val back = spark.read.orc(s"$tmp/t")
    // ORC (like parquet) reads everything back nullable — compare
    // names and types, not writer-side nullability flags
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      rows.schema.map(f => (f.name, f.dataType)))
    assert(back.as[(Long, Option[String], Option[Long], Option[java.sql.Date])]
      .collect().toSet ==
      rows.as[(Long, Option[String], Option[Long], Option[java.sql.Date])]
        .collect().toSet)
  }
}
