package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Exact, Tables}

/** Lake-maintenance operators: the operational half of running a
  * 100 TB corpus — schemas drift across ingestion generations, and
  * streaming/incremental writers leave small-file debris that must be
  * compacted without changing a byte of content. Both gates write real
  * files (under /tmp, keyed by the sf dir) and re-read them, so the
  * write path is inside the oracle gate, not just the read path.
  */
object LakeOps {

  private def tag(dir: String) = dir.replaceAll("[^a-zA-Z0-9]", "_")

  /** Schema evolution: two parquet generations of the orders feed — an
    * OLD layout without `o_orderpriority` and a NEW layout with it —
    * unioned by a mergeSchema read. Old-generation rows surface the
    * missing column as NULL (never a positional mis-bind); the
    * aggregate pins row counts, null accounting, and the exact money
    * total across both generations against DuckDB reading the
    * original table.
    */
  private def schemaDriftUnion(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = s"/tmp/graft_lake/${tag(dir)}/drift"
    val orders = Tables.orders(s, dir)
      .select($"o_orderkey", $"o_custkey", $"o_orderpriority",
        Exact.micro("o_totalprice").as("price_micro"))
    orders.filter(pmod($"o_orderkey", lit(2)) === 0)
      .drop("o_orderpriority")
      .write.mode("overwrite").parquet(s"$base/gen=old")
    orders.filter(pmod($"o_orderkey", lit(2)) === 1)
      .write.mode("overwrite").parquet(s"$base/gen=new")
    s.read.option("mergeSchema", "true").parquet(base)
      .groupBy($"gen")
      .agg(
        count(lit(1)).as("n"),
        sum($"o_orderpriority".isNull.cast("long")).as("n_null_priority"),
        sum($"price_micro").as("s_micro"))
      .select($"gen", $"n", $"n_null_priority",
        Exact.microSumTo4dp("s_micro").as("sum_price"))
      .orderBy($"gen")
  }

  private val schemaDriftOracle =
    s"""SELECT CASE WHEN o_orderkey % 2 = 0 THEN 'old' ELSE 'new' END AS gen,
       |  count(*) AS n,
       |  CAST(sum(CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_null_priority,
       |  ${Exact.microSumTo4dpSql(
          s"CAST(sum(${Exact.microSql("o_totalprice")}) AS BIGINT)",
          Exact.DuckDiv)} AS sum_price
       |FROM orders
       |GROUP BY gen
       |ORDER BY gen""".stripMargin

  /** Small-file compaction: the documents table scattered into 16-way
    * small-file debris (the streaming-writer shape), then compacted to
    * a single file. The gate proves compaction is CONTENT-PRESERVING
    * with an order-independent fingerprint (sum of a bounded per-row
    * hash — commutative, so file order and row order inside files are
    * free to change) plus exact file-count accounting from the
    * filesystem, and that the compacted layout carries the same row
    * count. At real scale the same op runs per partition directory
    * with a target file size instead of coalesce(1).
    */
  private def compactSmallFiles(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = s"/tmp/graft_lake/${tag(dir)}/compact"
    val docs = Tables.documents(s, dir).select($"doc_id", $"text")
    docs.repartition(16)
      .write.mode("overwrite").parquet(s"$base/small")
    val countFiles = (p: String) =>
      new java.io.File(p).listFiles().count(f =>
        f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    val nSmall = countFiles(s"$base/small")
    s.read.parquet(s"$base/small").coalesce(1)
      .write.mode("overwrite").parquet(s"$base/compacted")
    val nCompacted = countFiles(s"$base/compacted")
    s.read.parquet(s"$base/compacted")
      .agg(
        count(lit(1)).as("n_rows"),
        // RAW md5, not TextOps.fingerprint64 (which normalizes
        // whitespace): compaction must preserve bytes, so the
        // fingerprint must see bytes
        sum(pmod(conv(substring(md5($"text"), 1, 15), 16, 10).cast("long"),
          lit(1000000007L))).as("content_fp"))
      .select(lit(nSmall).as("n_files_small"),
        lit(nCompacted).as("n_files_compacted"),
        $"n_rows", $"content_fp")
  }

  private val compactOracle =
    """SELECT 16 AS n_files_small, 1 AS n_files_compacted,
      |  count(*) AS n_rows,
      |  CAST(sum(('0x' || substr(md5(text), 1, 15))::BIGINT % 1000000007)
      |    AS BIGINT) AS content_fp
      |FROM documents""".stripMargin

  /** File-level provenance: every row tagged with its source file via
    * `input_file_name()`, rolled up to per-file row counts and key
    * ranges — the audit a lake runs after every backfill ("which file
    * contributed what"). The writer scatters orders into 8 files first
    * so the roll-up is a real multi-file accounting, and DuckDB
    * independently re-derives it with `read_parquet(..., filename =
    * true)` over the same files.
    */
  private def fileProvenance(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = s"/tmp/graft_lake/${tag(dir)}/prov"
    Tables.orders(s, dir).select($"o_orderkey", $"o_custkey")
      .repartition(8, $"o_custkey")
      .write.mode("overwrite").parquet(base)
    s.read.parquet(base)
      .withColumn("fname", regexp_extract(input_file_name(), "[^/]+$", 0))
      .groupBy($"fname")
      .agg(count(lit(1)).as("n"),
        min($"o_orderkey").as("min_key"),
        max($"o_orderkey").as("max_key"))
      .orderBy($"fname")
  }

  private def fileProvenanceOracle(dir: String): String =
    s"""SELECT regexp_extract(filename, '[^/]+$$', 0) AS fname,
       |  count(*) AS n,
       |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
       |FROM read_parquet('/tmp/graft_lake/${tag(dir)}/prov/*.parquet',
       |  filename = true)
       |GROUP BY fname
       |ORDER BY fname""".stripMargin

  def queries: Seq[Q] = Seq(
    Q("schema_drift_union", schemaDriftUnion, Some(schemaDriftOracle)),
    Q("compact_small_files", compactSmallFiles, Some(compactOracle)),
    Q("file_provenance", fileProvenance,
      Some(fileProvenanceOracle("/root/testdata/sf0.01"))))
}
