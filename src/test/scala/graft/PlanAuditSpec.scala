package graft

import graft.queries.Registry

/** Plan-regression gate: PLANS.md documents the plans we want; this spec
  * keeps the load-bearing properties from silently rotting. Every
  * registered query is planned against sf0.001 and its physical plan
  * must never contain a BroadcastNestedLoopJoin or CartesianProduct —
  * the two shapes that mean "a join lost its equi-condition or its
  * broadcast hint" and that detonate at 100× scale.
  */
class PlanAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("no registered query plans a nested-loop or cartesian join") {
    val offenders = Registry.all.flatMap { q =>
      val plan =
        try q.fn(spark, dir).queryExecution.executedPlan.toString
        catch { case e: Throwable => fail(s"${q.name} failed to plan: $e") }
      val bad = Seq("BroadcastNestedLoopJoin", "CartesianProduct").filter(plan.contains)
      if (bad.nonEmpty) Some(s"${q.name}: ${bad.mkString(", ")}") else None
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}
