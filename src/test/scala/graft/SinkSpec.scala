package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.{Canon, Sink}

class SinkSpec extends SparkSpec {
  import spark.implicits._

  test("conformTo casts to the DDL schema (double -> decimal(20,2))") {
    val df = Seq((1, "ACES", "LK", "item", 1234.567, 99.999))
      .toDF("ID", "emitent", "LaporanKeuangan", "LaporanDetail",
        "CurrentYearInstant", "PriorYearInstant")
    val out = Sink.conformTo(df, Sink.laporanKeuanganSchema)
    assert(out.schema("CurrentYearInstant").dataType == DecimalType(20, 2))
    val r = out.first()
    assert(r.getDecimal(4).toString == "1234.57")
    assert(r.getDecimal(5).toString == "100.00")
  }

  test("conformTo drops extra columns and fails on missing ones") {
    val extra = Seq((1, "a")).toDF("ID", "junk")
    intercept[org.apache.spark.sql.AnalysisException] {
      Sink.conformTo(extra, Sink.laporanKeuanganSchema).collect()
    }
  }

  test("JDBC round-trip against embedded Derby: overwrite, truncate, append") {
    // Derby ships with Spark (/opt/spark/jars/derby-*.jar) — a real JDBC
    // database, so the sink path (executor-side batched inserts, truncate
    // vs drop-recreate, append) is exercised for real, not structurally
    System.setProperty("derby.stream.error.file", "/tmp/graft_derby.log")
    val url = "jdbc:derby:memory:graftdb;create=true"
    val props = new java.util.Properties()
    val df1 = Seq((1, "a", 10.5), (2, "b", 20.25)).toDF("id", "name", "v")
    Sink.jdbcOverwrite(df1, url, "t_sink", props)
    assert(spark.read.jdbc(url, "t_sink", props).count() == 2)
    // prove the second overwrite TRUNCATEs rather than drop+recreates
    // (pandas' if_exists='replace' drops; truncate=true keeps the DDL):
    // an index created out-of-band must survive the overwrite
    val conn = java.sql.DriverManager.getConnection(url)
    // Spark passes the table name through unquoted (Derby uppercases it)
    // but quotes column names case-exactly — match both conventions
    conn.createStatement().execute("""CREATE INDEX t_sink_idx ON t_sink("id")""")
    val df2 = Seq((3, "c", 1.0)).toDF("id", "name", "v")
    Sink.jdbcOverwrite(df2, url, "t_sink", props)
    val afterOverwrite = spark.read.jdbc(url, "t_sink", props)
      .as[(Int, String, Double)].collect().toSet
    assert(afterOverwrite == Set((3, "c", 1.0)))
    val idx = {
      val rs = conn.getMetaData.getIndexInfo(null, null, "T_SINK", false, false)
      val names = scala.collection.mutable.Set.empty[String]
      while (rs.next()) Option(rs.getString("INDEX_NAME")).foreach(names += _)
      rs.close(); names
    }
    assert(idx.contains("T_SINK_IDX"),
      s"index dropped by overwrite — got $idx: sink drop+recreated instead of truncating")
    conn.close()
    // append adds on top of the truncated-then-written table
    Sink.jdbcAppend(df1, url, "t_sink", props)
    val all = spark.read.jdbc(url, "t_sink", props)
      .as[(Int, String, Double)].collect().toSet
    assert(all == Set((1, "a", 10.5), (2, "b", 20.25), (3, "c", 1.0)))
  }

  test("parquetPartitioned writes hive-style partition dirs") {
    val tmp = Files.createTempDirectory("graft_sink").toString
    val df = Seq(("2024-01-01", "click", 1), ("2024-01-02", "view", 2))
      .toDF("day", "typ", "n")
    Sink.parquetPartitioned(df, s"$tmp/out", Seq("day"))
    val back = spark.read.parquet(s"$tmp/out")
    assert(back.count() == 2)
    assert(back.columns.contains("day"))
    assert(new java.io.File(s"$tmp/out/day=2024-01-01").exists())
  }

  test("compactParquet sizes a hive-partitioned source recursively") {
    val tmp = Files.createTempDirectory("graft_compact_part").toString
    (1 to 500).map(i => (i.toLong, s"d${i % 4}"))
      .toDF("id", "day").repartition(4)
      .write.partitionBy("day").parquet(s"$tmp/src")
    // flat listing would see 0 bytes (files live under day=*/) and
    // silently coalesce everything to one file regardless of target
    val n = Sink.compactParquet(spark, s"$tmp/src", s"$tmp/dst", 1L)
    assert(n > 1, "recursive listing must see the partitioned data files")
    assert(spark.read.parquet(s"$tmp/dst").count() == 500)
  }

  test("compactParquet rewrites many small files into the computed count") {
    val tmp = Files.createTempDirectory("graft_compact").toString
    // 16 tiny files
    (1 to 1000).map(i => (i.toLong, s"row_$i")).toDF("id", "s")
      .repartition(16).write.parquet(s"$tmp/src")
    val srcFiles = new java.io.File(s"$tmp/src").listFiles
      .count(_.getName.endsWith(".parquet"))
    assert(srcFiles == 16)
    val bytes = new java.io.File(s"$tmp/src").listFiles
      .filter(_.getName.endsWith(".parquet")).map(_.length).sum
    // target = half the total -> exactly 2 output files
    val n = Sink.compactParquet(spark, s"$tmp/src", s"$tmp/dst",
      math.ceil(bytes / 2.0).toLong)
    assert(n == 2)
    val dstFiles = new java.io.File(s"$tmp/dst").listFiles
      .count(_.getName.endsWith(".parquet"))
    assert(dstFiles == 2)
    // content preserved
    assert(spark.read.parquet(s"$tmp/dst").count() == 1000)
    assert(spark.read.parquet(s"$tmp/dst").agg(sum($"id")).head.getLong(0)
      == 1000L * 1001 / 2)
  }

  test("dialect matrix: generated DDL/INSERT shapes per JDBC dialect") {
    // No MySQL server exists in this sandbox (the Derby round-trip above
    // covers the live wire protocol), but the DIALECT surface — what
    // SQL Spark would emit against MySQL — is pure driver-side string
    // generation, testable exactly. This pins the production target's
    // contract: identifier quoting, the DECIMAL(20,2) money DDL
    // (financial_statement.sql:4-9), and the batched-INSERT shape.
    import org.apache.spark.sql.jdbc.JdbcDialects
    import org.apache.spark.sql.execution.datasources.jdbc.JdbcUtils
    val schema = Sink.laporanKeuanganSchema

    val mysql = JdbcDialects.get("jdbc:mysql://host/db")
    // MySQL quotes with backticks — a reserved-word column must survive
    assert(mysql.quoteIdentifier("LaporanKeuangan") == "`LaporanKeuangan`")
    val myDdl = JdbcUtils.schemaString(mysql, schema, true, None)
    assert(myDdl.contains("`CurrentYearInstant` DECIMAL(20,2)"), myDdl)
    assert(myDdl.contains("`PriorYearInstant` DECIMAL(20,2)"), myDdl)
    assert(myDdl.contains("`ID` INTEGER NOT NULL"), myDdl)
    // strings map to a TEXT type on MySQL (no silent VARCHAR(n) cap)
    assert(myDdl.toUpperCase.contains("TEXT"), myDdl)

    val insert = JdbcUtils.getInsertStatement(
      "laporan_keuangan", schema, None, true, mysql)
    assert(insert.startsWith("INSERT INTO laporan_keuangan ("), insert)
    assert(insert.count(_ == '?') == schema.length, insert)
    assert(insert.contains("`emitent`"), insert)

    // Postgres + Derby quote with double quotes; money DDL unchanged
    for (url <- Seq("jdbc:postgresql://h/db", "jdbc:derby:memory:x")) {
      val d = JdbcDialects.get(url)
      assert(d.quoteIdentifier("ID") == "\"ID\"", url)
      val ddl = JdbcUtils.schemaString(d, schema, true, None)
      assert(ddl.contains("20,2"), s"$url: $ddl")
    }

    // P7's reason to exist: MySQL's 64-char identifier cap — conformTo
    // composed with truncateNames keeps every emitted identifier legal
    val longName = "x" * 80
    val truncated = Canon.truncateNames(
      Seq((1, "v")).toDF("id", longName))
    assert(truncated.columns.forall(_.length <= 64))
    assert(truncated.columns.contains("x" * 64))
  }
}
