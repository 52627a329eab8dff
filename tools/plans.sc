import graft.queries.Registry
import java.nio.file.{Files, Paths}
// Harmless with timestamp[us] testdata; lets Tables.events' legacy
// TIMESTAMP(NANOS) branch work if run against an old generation.
spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
// Match the bench/driver session shape so audited plans are the plans
// that actually run (AQE coalescing aside).
spark.conf.set("spark.sql.shuffle.partitions", "32")
spark.conf.set("spark.sql.session.timeZone", "UTC")
val sb = new StringBuilder
sb ++= "# PLANS - physical-plan audit (generated against sf0.01)\n\n"
sb ++= "Evidence that the plans are the plans we want: filters pushed\n"
sb ++= "into the parquet scan, columns pruned, dimensions broadcast,\n"
sb ++= "top-k via TakeOrderedAndProject, no shuffle joins where a broadcast\n"
sb ++= "fits. Covers EVERY registry query (PlansCoverageSpec gates the\n"
sb ++= "list against the registry so it cannot drift). Queries whose\n"
sb ++= "builder runs eager work (threshold collects, lake writes,\n"
sb ++= "streaming gates) pay that work here; their section reflects the\n"
sb ++= "FINAL returned frame's plan. Regenerate with tools/plans.sc.\n\n"
val names = Registry.all.map(_.name).sorted
sb ++= s"${names.length} queries audited.\n\n"
for (q <- names) {
  val plan =
    try Registry.queries(q)(spark, "/root/testdata/sf0.01")
      .queryExecution.executedPlan.toString
    catch { case e: Throwable => s"PLAN FAILED: ${e.getClass.getName}: ${e.getMessage}" }
  def n(p: String) = p.r.findAllIn(plan).length
  sb ++= s"## $q\n\n"
  if (plan.startsWith("PLAN FAILED")) sb ++= s"- ${plan.take(200)}\n"
  else {
    sb ++= s"- BroadcastHashJoin: ${n("BroadcastHashJoin")}, SortMergeJoin: ${n("SortMergeJoin")}, ShuffledHashJoin: ${n("ShuffledHashJoin")}, BroadcastNestedLoopJoin: ${n("BroadcastNestedLoopJoin")}\n"
    sb ++= s"- ShuffleExchanges: ${n("Exchange (hash|range|Single)")}, BroadcastExchanges: ${n("BroadcastExchange")}, TakeOrderedAndProject: ${n("TakeOrderedAndProject")}\n"
    val pf = "PushedFilters: \\[[^\\]]*\\]".r.findAllIn(plan).toList.distinct.take(3)
    if (pf.nonEmpty) sb ++= pf.map(f => s"- ${f.take(200)}").mkString("", "\n", "\n")
    // non-empty partition filters only: every non-hive scan carries a
    // noisy "PartitionFilters: []"
    val ptf = "PartitionFilters: \\[[^\\]]+\\]".r.findAllIn(plan).toList.distinct.take(3)
    if (ptf.nonEmpty) sb ++= ptf.map(f => s"- ${f.take(200)}").mkString("", "\n", "\n")
    val rs = "ReadSchema: struct<[^>]*>".r.findAllIn(plan).toList.distinct.take(3)
    if (rs.nonEmpty) sb ++= rs.map(r => s"- ${r.take(180)}").mkString("", "\n", "\n")
    val bk = "SelectedBucketsCount: [^,\\n]*".r.findAllIn(plan).toList.distinct
    if (bk.nonEmpty) sb ++= bk.map(b => s"- $b").mkString("", "\n", "\n")
  }
  sb ++= "\n"
}
Files.writeString(Paths.get("/root/repo/PLANS.md"), sb.toString)
println("WROTE PLANS.md with " + names.length + " sections")
sys.exit(0)
