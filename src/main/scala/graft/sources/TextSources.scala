package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Line-oriented text sources (JSONL / CSV) with explicit schemas and
  * PERMISSIVE bad-record capture — the ingestion posture a production
  * pipeline needs: one malformed line must never kill a 100 TB read, and
  * must stay auditable instead of vanishing.
  *
  * Schemas are always declared (never inferred): inference costs an
  * extra full pass at scale and gives the corrupt-record column no place
  * to land.
  */
object TextSources {

  val CorruptCol = "_corrupt"

  /** JSONL read: well-formed lines parse to the schema, malformed lines
    * land whole in [[CorruptCol]] with every data column null.
    */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add(CorruptCol, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  /** CSV read with header: type-mismatched rows are captured in
    * [[CorruptCol]]; short rows null-pad (Spark semantics). Callers that
    * need "fully valid rows only" filter on [[CorruptCol]] null AND
    * required columns not-null.
    */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add(CorruptCol, StringType))
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .csv(path)
}
