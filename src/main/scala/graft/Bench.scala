package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // local files are tiny (<11 MB): split aggressively so scans use
      // all cores; at cluster scale the default 128m is the right call
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.files.openCostInBytes", "64k")
      // AQE coalesces shuffles toward 64m by default; our shuffles are
      // byte-tiny but CPU-heavy downstream (hashing, set ops) — keep
      // them spread across cores
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // best-of-2: the host is a shared VM with bursty neighbor load; the
    // min of two passes reports steady-state engine cost, not noise
    val failed = scala.collection.mutable.ListBuffer.empty[String]
    val results = SparkEntry.queries.map { case (name, fn) =>
      var ok = true
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => ok = false }
        (System.nanoTime() - t0) / 1e9
      }
      if (!ok) failed += name
      val sec = times.min
      val flag = if (ok) "" else "  FAILED"
      System.err.println(f"[bench] $name%-28s $sec%8.2fs (passes: ${times.map(t => f"$t%.2f").mkString(", ")})$flag")
      name -> sec
    }
    if (failed.nonEmpty)
      System.err.println(s"[bench] FAILED queries (times are of the failed attempt): ${failed.mkString(", ")}")
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
