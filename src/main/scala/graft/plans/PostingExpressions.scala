package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document term-frequency kernel — static forwarder for both the
  * interpreted and generated paths (the HashKernels pattern).
  *
  * Term frequency is a PER-DOCUMENT fact, so the posting rows
  * `(term, tf)` of an inverted-index build can be computed inside the
  * row instead of shuffling every token occurrence of the corpus
  * through an `explode` + `groupBy(doc_id, term)` exchange — the
  * difference between a token-count-sized shuffle and zero exchanges
  * on the index build's hot path.
  *
  * Tokenization is byte-split on a single 0x20, EXACTLY Spark's
  * `split(text, " ")` with its keep-empty-tokens semantics (consecutive
  * and trailing separators yield empty tokens, which count like any
  * term — and 0x20 can never be a UTF-8 continuation byte, so the byte
  * split is the character split). Pair order is first occurrence,
  * deterministic in the input text.
  */
object PostingKernels {
  def termCounts(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val counts = new java.util.LinkedHashMap[UTF8String, java.lang.Long]()
    var start = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == 0x20) {
        val tok = UTF8String.fromBytes(bytes, start, i - start)
        val prev = counts.get(tok)
        counts.put(tok, if (prev == null) 1L else prev + 1L)
        start = i + 1
      }
      i += 1
    }
    val out = new Array[Any](counts.size)
    var j = 0
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out(j) = org.apache.spark.sql.catalyst.InternalRow(
        e.getKey, e.getValue.longValue())
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** `term_counts(text)` — array of `(term, tf)` structs for a
  * single-space-tokenized document; null text yields null. The
  * map-side replacement for `explode(split(text)) … groupBy(doc_id,
  * term).count()` wherever `doc_id` is unique per row.
  */
case class TermCounts(child: Expression) extends TextHashUnaryExpression {
  override def prettyName: String = "term_counts"
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("tf", LongType, nullable = false))),
    containsNull = false)

  override def nullSafeEval(input: Any): Any =
    PostingKernels.termCounts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.PostingKernels.termCounts($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PostingExpressions {
  def termCounts(c: Column): Column =
    SqlBridge.column(TermCounts(SqlBridge.expression(c)))
}
