package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types._

/** Native probe for the Bloom runtime filter: the 16 KB word array rides
  * into the generated code as a referenced object (one per plan, shared
  * by every row — at cluster scale it ships once per executor inside the
  * serialized plan, exactly like a broadcast hash-relation but 3 orders
  * of magnitude smaller). Tier-b Expression: the probe is one static
  * kernel call per row inside the scan's whole-stage span, so the fact
  * table is filtered at full codegen speed BEFORE the join shuffle.
  */
case class BloomMightContain(child: Expression, words: Array[Long], k: Int)
    extends UnaryExpression {
  override def prettyName: String = "bloom_might_contain"
  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint key, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    BloomKernels.mightContain(input.asInstanceOf[Long], words, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomWords", words, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.plans.BloomKernels.mightContain($c, $ref, $k);"
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomExpressions {
  def bloomMightContain(key: Column, words: Array[Long], k: Int): Column =
    SqlBridge.column(BloomMightContain(SqlBridge.expression(key), words, k))
}
