package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sinks — the reference's S5-S7 (SURVEY.md §2.1): JDBC bulk overwrite
  * (`to_sql if_exists='replace'`, project-dask.py:101), JDBC append
  * (detail_notes.py:84-103), and the target-table DDL. JDBC writes go
  * from executors (one connection per partition, batched inserts) — not
  * the reference's driver-side row loop.
  */
object Sink {

  /** `laporan_keuangan` DDL (financial_statement.sql:3-10): compute in
    * double, declare the sink decimal — SURVEY.md §1.2.
    */
  val laporanKeuanganSchema: StructType = StructType(Seq(
    StructField("ID", IntegerType, nullable = false),
    StructField("emitent", StringType),
    StructField("LaporanKeuangan", StringType),
    StructField("LaporanDetail", StringType),
    StructField("CurrentYearInstant", DecimalType(20, 2)),
    StructField("PriorYearInstant", DecimalType(20, 2))))

  /** Cast a frame to a declared sink schema by column name (missing
    * columns fail at analysis, extra columns are dropped) — the
    * schema-canonicalization step before any JDBC write.
    */
  def conformTo(df: DataFrame, schema: StructType): DataFrame =
    df.select(schema.fields.map(f => col(f.name).cast(f.dataType).as(f.name)): _*)

  /** S5: bulk overwrite (pandas `if_exists='replace'`). `truncate=true`
    * keeps the table's DDL/indexes instead of drop+recreate.
    */
  def jdbcOverwrite(df: DataFrame, url: String, table: String,
      props: java.util.Properties, batchSize: Int = 10000): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .option("truncate", "true")
      .option("batchsize", batchSize)
      .jdbc(url, table, props)

  /** S6: append (the reference's ORM per-row session.add loop, done
    * properly: executor-side batched inserts).
    */
  def jdbcAppend(df: DataFrame, url: String, table: String,
      props: java.util.Properties, batchSize: Int = 10000): Unit =
    df.write
      .mode(SaveMode.Append)
      .option("batchsize", batchSize)
      .jdbc(url, table, props)

  /** Partitioned parquet writer — the lake-side sink. Partition columns
    * should be low-cardinality (date, type); sort within partitions to
    * get run-length-friendly files.
    */
  def parquetPartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String], mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w = df.write.mode(mode)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(path)
  }

  /** Small-file compaction: rewrite a parquet directory into
    * ⌈bytes / targetBytes⌉ files. The file count comes from the source's
    * ON-DISK size (sum of data-file lengths), not row estimates, so the
    * decision is exact and cheap (driver-side listing — no data read).
    * Uses coalesce, not repartition: compaction must not pay a shuffle;
    * at 100 TB per-partition skew is already bounded by the source
    * files' sizes. Returns the target file count.
    */
  def compactParquet(spark: org.apache.spark.sql.SparkSession,
      srcPath: String, dstPath: String, targetBytes: Long): Int = {
    val src = new org.apache.hadoop.fs.Path(srcPath)
    val fs = src.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // RECURSIVE listing: a hive-partitioned layout keeps its data files
    // in key=value subdirectories — a flat listStatus would see zero
    // bytes and collapse the whole dataset into one file
    val it = fs.listFiles(src, true)
    var bytes = 0L
    while (it.hasNext) {
      val f = it.next()
      if (f.isFile && f.getPath.getName.endsWith(".parquet")) bytes += f.getLen
    }
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    spark.read.parquet(srcPath).coalesce(nFiles)
      .write.mode(SaveMode.Overwrite).parquet(dstPath)
    nFiles
  }
}
