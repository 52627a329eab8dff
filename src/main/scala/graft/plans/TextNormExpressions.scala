package graft.plans

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization kernel — static forwarder for both the
  * interpreted and generated paths (same pattern as HashKernels).
  * NFC/NFKC matter for corpus prep: visually-identical text with
  * different codepoint sequences (decomposed accents, compatibility
  * forms) defeats exact dedup fingerprints and token statistics unless
  * everything is canonicalized first. ASCII fast path: normalization
  * cannot change pure-ASCII bytes, so the (overwhelmingly common) case
  * skips the String round-trip entirely.
  */
object TextNormKernels {
  def normalize(s: UTF8String, form: String): UTF8String = {
    if (s == null) return null
    val n = s.numBytes()
    var ascii = true
    var i = 0
    while (ascii && i < n) {
      if ((s.getByte(i) & 0x80) != 0) ascii = false
      i += 1
    }
    if (ascii) s
    else UTF8String.fromString(
      Normalizer.normalize(s.toString, Normalizer.Form.valueOf(form)))
  }
}

/** NFC/NFKC/NFD/NFKD normalization as a tier-b native expression:
  * Spark has no built-in Unicode normalizer, and a Scala UDF would
  * break whole-stage codegen on the corpus-wide hot path this runs in.
  * DuckDB's `nfc_normalize` is the oracle mirror for the NFC form.
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends TextHashUnaryExpression {
  require(Set("NFC", "NFKC", "NFD", "NFKD").contains(form),
    s"unknown normalization form $form")
  override def prettyName: String = "unicode_normalize"
  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    TextNormKernels.normalize(input.asInstanceOf[UTF8String], form)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""${ev.value} = graft.plans.TextNormKernels.normalize($c, "$form");"""
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextNormExpressions {
  def unicodeNormalize(c: Column, form: String = "NFC"): Column =
    SqlBridge.column(UnicodeNormalize(SqlBridge.expression(c), form))
}
