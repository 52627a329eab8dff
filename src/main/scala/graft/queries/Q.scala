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
/** @param scaleNote set ONLY when the query's audit is scale-capped BY
  *   DESIGN: an explicit registry-level statement (not a per-round
  *   machine adjudication) that no 100x soak row exists on purpose,
  *   naming the bounded/disclosed-truncation twin that carries the
  *   100x number. `SoakDriftSpec` accepts it in place of a 100x row
  *   and rejects it as stale the moment a 100x row lands.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    scaleNote: Option[String] = None)
