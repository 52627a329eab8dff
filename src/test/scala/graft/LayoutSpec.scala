package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.ops.Layout

/** Layout effects that only show up on real files: z-clustered writes
  * must make per-file min-max ranges selective on BOTH dimensions
  * (single-column clustering is selective on one and useless on the
  * other), and partitioned writes must be pruned at planning time
  * (PartitionFilters, not a full scan + filter).
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  // 64×64 deterministic grid: every (a, b) pair once
  private def grid = spark.range(64L * 64)
    .select(($"id" % 64).as("a"), ($"id" / 64).cast("long").as("b"))

  /** files whose [min, max] interval of `col` intersects [lo, hi] —
    * what a min-max (row-group / file footer) pruner would keep */
  private def candidateFiles(path: String, c: String, lo: Long, hi: Long): Long =
    spark.read.parquet(path)
      .groupBy(input_file_name())
      .agg(min(col(c)).as("mn"), max(col(c)).as("mx"))
      .filter($"mn" <= hi && $"mx" >= lo)
      .count()

  test("z-clustered layout prunes on BOTH dimensions; linear layout on one") {
    val base = Files.createTempDirectory("graft_zorder").toString
    val linear = s"$base/by_a"
    val zorder = s"$base/by_z"
    Layout.clusteredBy(grid, $"a", 16).write.parquet(linear)
    Layout.clusteredBy(grid.withColumn("z", Layout.zorder16($"a", $"b")), $"z", 16)
      .drop("z").write.parquet(zorder)

    // thin slice on the SECONDARY dimension b (b in [0, 3]):
    // a-sorted files all span b fully -> zero pruning; z-clustered files
    // cover aligned quadrants -> only the bottom row of blocks matches
    val linB = candidateFiles(linear, "b", 0, 3)
    val zB = candidateFiles(zorder, "b", 0, 3)
    assert(linB == 16, s"a-sorted layout should be unprunable on b, got $linB")
    assert(zB <= 8, s"z-layout should prune most files on b, got $zB")

    // the primary dimension stays prunable in BOTH layouts
    val linA = candidateFiles(linear, "a", 0, 3)
    val zA = candidateFiles(zorder, "a", 0, 3)
    assert(linA <= 2, s"a-sorted layout should nail a-slices, got $linA")
    assert(zA <= 8, s"z-layout should still prune on a, got $zA")
  }

  test("hash-scattered layout is unprunable on either dimension") {
    val dir = s"${Files.createTempDirectory("graft_hash")}/data"
    grid.repartition(16, $"a" * 64 + $"b").write.parquet(dir)
    assert(candidateFiles(dir, "a", 0, 3) == 16)
    assert(candidateFiles(dir, "b", 0, 3) == 16)
  }

  test("partitioned write is pruned at planning time (PartitionFilters)") {
    val dir = s"${Files.createTempDirectory("graft_part")}/data"
    grid.withColumn("bucket", ($"a" / 16).cast("int"))
      .write.partitionBy("bucket").parquet(dir)
    val q = spark.read.parquet(dir).filter($"bucket" === 2)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
      s"expected partition pruning in:\n$plan")
    assert(q.count() === 16 * 64)
    // pruned scan reads only the matching directory
    val files = q.select(input_file_name()).distinct().as[String].collect()
    assert(files.nonEmpty && files.forall(_.contains("bucket=2")))
  }

  test("IVF probe over a partition-by-cell layout prunes to the probed cells") {
    // the ANN scale claim made concrete: embeddings written once with
    // their cell assignment as a partition column; a probe touching
    // NProbe cells plans PartitionFilters and reads only those dirs —
    // the corpus outside the probed cells is never scanned
    import graft.ops.{Tables, VectorOps}
    val dir = s"${Files.createTempDirectory("graft_ivf_layout")}/emb"
    Tables.embeddings(spark, "/root/testdata/sf0.001")
      .withColumn("cell", VectorOps.signBucket($"embedding", 3))
      .write.partitionBy("cell").parquet(dir)
    val probe = Seq(1, 5)
    val q = spark.read.parquet(dir).filter($"cell".isin(probe: _*))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      s"expected cell partition pruning in:\n$plan")
    val files = q.select(input_file_name()).distinct().as[String].collect()
    assert(files.nonEmpty
      && files.forall(f => probe.exists(c => f.contains(s"cell=$c"))),
      s"probe read outside its cells: ${files.mkString(", ")}")
    // and the pruned read returns exactly the cells' vectors
    val expected = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .filter(VectorOps.signBucket($"embedding", 3).isin(probe: _*)).count()
    assert(q.count() === expected && expected > 0)
  }
}
