package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers graft's native
  * expressions as SQL functions, so `spark.sql("... vec_cosine(a, b)
  * ...")` plans the same codegen'd expression as the Column API.
  *
  * Activate with:
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)              // programmatic, or
  *   .config("spark.sql.extensions", "graft.plans.GraftExtensions")
  * }}}
  * No optimizer rules or strategies are injected — the built-in planner
  * already produces the plans we want (see PLANS.md); functions are the
  * only genuine extension this engine needs.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "scala_udf")

  private def binary(name: String, make: (Expression, Expression) => Expression,
      usage: String): (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name), info(name, usage), { exprs =>
      require(exprs.length == 2, s"$name expects 2 arguments, got ${exprs.length}")
      make(exprs(0), exprs(1))
    })

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(binary("vec_dot", DotProduct.apply,
      "vec_dot(a, b) - dot product of two float vectors (double result)"))
    e.injectFunction(binary("vec_cosine", CosineSimilarity.apply,
      "vec_cosine(a, b) - cosine similarity of two float vectors"))
  }
}
