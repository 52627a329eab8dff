package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main. Prints ONE JSON line with per-query best times.
  *
  * The harness host is a shared VM with multi-minute CPU-steal bursts
  * (observed 10-30× inflation; round-2's committed artifact was 9× off
  * on queries whose code had not changed). Plain best-of-2 is not
  * burst-proof: both passes of a query run back-to-back and can land
  * inside one burst. So the bench is adaptive:
  *
  *  1. two passes per query (back-to-back, as before);
  *  2. any query whose best time exceeds 3× its checked-in watermark
  *     (BENCH_WATERMARKS.json = clean-host minima from the previous
  *     round) is re-run in later sweeps — time-diversified, so a burst
  *     that poisoned sweep 1 has usually passed;
  *  3. up to 3 retry sweeps; queries still above threshold are reported
  *     in "suspect" so a reader knows those numbers are host noise, not
  *     engine cost.
  *
  * Per-pass times are emitted under "passes" so the artifact itself
  * shows the noise (a 2s/60s split is a burst; 60s/60s is the engine).
  */
object Bench {

  /** Parse the flat {"name": seconds, ...} watermark file without a JSON
    * lib (none on the classpath) — the format is repo-controlled.
    */
  private def loadWatermarks(path: String): Map[String, Double] = {
    val f = new java.io.File(path)
    if (!f.exists()) Map.empty
    else {
      val text = new String(java.nio.file.Files.readAllBytes(f.toPath))
      "\"([^\"]+)\"\\s*:\\s*([0-9.eE+-]+)".r
        .findAllMatchIn(text)
        .map(m => m.group(1) -> m.group(2).toDouble)
        .toMap
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val watermarks = loadWatermarks(
      sys.env.getOrElse("SPARK_GRAFT_WATERMARKS", "/root/repo/BENCH_WATERMARKS.json"))
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
      // events.parquet is TIMESTAMP(NANOS); set at session build (a
      // loader must not mutate global parquet semantics mid-session)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val failed = scala.collection.mutable.LinkedHashSet.empty[String]
    val passes = scala.collection.mutable.LinkedHashMap.empty[String, Vector[Double]]

    def onePass(name: String): Double = {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count(); failed -= name }
      catch { case _: Throwable => failed += name }
      val sec = (System.nanoTime() - t0) / 1e9
      passes(name) = passes.getOrElse(name, Vector.empty) :+ sec
      sec
    }

    // a query is suspect when its best pass is >3× the clean-host
    // watermark (plus a 0.5s floor: sub-second queries jitter harmlessly)
    def suspect(name: String): Boolean = watermarks.get(name) match {
      case Some(w) => passes(name).min > math.max(3.0 * w, w + 0.5)
      case None    => false
    }

    val names = SparkEntry.queries.keys.toVector
    names.foreach { n => onePass(n); onePass(n) }
    var sweep = 0
    while (sweep < 3 && names.exists(suspect)) {
      val redo = names.filter(suspect)
      System.err.println(s"[bench] retry sweep ${sweep + 1}: ${redo.mkString(", ")}")
      redo.foreach(onePass)
      sweep += 1
    }

    val results = names.map { n =>
      val sec = passes(n).min
      val flags = (if (failed(n)) "  FAILED" else "") +
        (if (suspect(n)) "  SUSPECT(host noise)" else "")
      System.err.println(f"[bench] $n%-28s $sec%8.2fs (passes: ${passes(n).map(t => f"$t%.2f").mkString(", ")})$flags")
      n -> sec
    }
    if (failed.nonEmpty)
      System.err.println(s"[bench] FAILED queries (times are of the failed attempt): ${failed.mkString(", ")}")

    def arr(xs: Seq[Double]) = xs.map(v => f"$v%.3f").mkString("[", ",", "]")
    val qs = results.map { case (k, v) => s"\"$k\":$v" }.mkString("{", ",", "}")
    val passJson = names.map(n => s"\"$n\":${arr(passes(n))}").mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val suspectJson = names.filter(suspect).map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"passes":$passJson,"failed":$failedJson,"suspect":$suspectJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
