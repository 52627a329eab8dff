package graft

import org.apache.spark.sql.SparkSession

/** GraftExtensions bind at session-build time, and getOrCreate returns
  * the suite-shared session if one is default — so this spec detaches
  * the default, builds an extended session (same SparkContext), and
  * restores the shared one afterwards.
  */
class ExtensionsSpec extends SparkSpec {

  test("vec_cosine / vec_dot usable from plain SQL") {
    val base = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new graft.plans.GraftExtensions)
        .getOrCreate()
      val r = s.sql(
        """SELECT vec_cosine(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
          |                  array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c,
          |       vec_dot(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)),
          |               array(CAST(1.0 AS FLOAT), CAST(1.0 AS FLOAT))) AS d
          |""".stripMargin).collect()(0)
      assert(r.getDouble(0) == 1.0)
      assert(r.getDouble(1) == 7.0)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
