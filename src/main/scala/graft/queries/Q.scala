package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named engine query: the Spark implementation plus (where the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle run by
  * the driver's correctness gate over the same parquet tables.
  *
  * Oracle-writing discipline (keeps the hash compare honest):
  *  - alias every computed column identically on both sides;
  *  - round double aggregates on both sides (ULP-order differences);
  *  - pin integer widths (DuckDB `sum(int)` is HUGEINT, `row_number` is
  *    BIGINT — cast to what Spark produces);
  *  - every query totally ordered by an explicit ORDER BY on both sides.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])
