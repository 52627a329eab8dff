package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compiled kernel for Jaro-Winkler similarity — the fuzzy-string
  * primitive entity-resolution / record-linkage pipelines score
  * candidate pairs with (Spark ships `levenshtein` but nothing of the
  * Jaro family).
  *
  * Parity contract with the DuckDB oracle's `jaro_winkler_similarity`
  * (both implement the textbook definition; pinned in
  * StringSimSpec against probed values):
  *  - match window `max(|a|,|b|)/2 - 1` (floor, never negative),
  *  - transpositions = FLOOR of half the pairwise mismatches between
  *    the two matched-character sequences (integer division — probed:
  *    an odd mismatch count rounds DOWN in DuckDB),
  *  - Winkler prefix boost `l·0.1·(1-jaro)` with `l ≤ 4`, applied only
  *    when jaro > 0.7 (the standard boost threshold),
  *  - both-empty → 1, one-empty → 0,
  *  - comparison per UTF-8 BYTE, not per code point — probed: DuckDB
  *    scores 'Müller' vs 'Muller' as 7-vs-6 byte sequences (0.849206),
  *    and its levenshtein counts 'é'→'e' as 2. Operating on the raw
  *    UTF8String bytes gives identical non-ASCII behavior for free
  *    (and skips the String decode).
  */
object StringSimKernels {

  def jaroWinkler(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.getBytes
    val b = ub.getBytes
    val la = a.length
    val lb = b.length
    if (la == 0 && lb == 0) return 1.0
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val aMatch = new Array[Boolean](la)
    val bMatch = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val ca = a(i)
      var j = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var found = false
      while (j <= hi && !found) {
        if (!bMatch(j) && ca == b(j)) {
          aMatch(i) = true; bMatch(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // halfT = mismatches between the matched sequences read in order
    var halfT = 0
    var k = 0
    i = 0
    while (i < la) {
      if (aMatch(i)) {
        while (!bMatch(k)) k += 1
        if (a(i) != b(k)) halfT += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    // transpositions = FLOOR(halfT / 2) — integer division, the
    // DuckDB/rapidfuzz convention (probed: 'new widget' vs 'old widget'
    // has halfT = 3 → t = 1 → 0.752381, not t = 1.5 → 0.728571)
    val jaro = (md / la + md / lb + (md - halfT / 2) / md) / 3.0
    if (jaro <= 0.7) jaro
    else {
      var l = 0
      val lMax = math.min(4, math.min(la, lb))
      while (l < lMax && a(l) == b(l)) l += 1
      jaro + l * 0.1 * (1.0 - jaro)
    }
  }
}

/** `jaro_winkler(a, b)` — tier-b native expression: one static kernel
  * call per row inside whole-stage codegen (same escalation ladder and
  * rationale as [[HashExpressions]]; a Scala UDF would break the
  * surrounding codegen span and box both strings per row).
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "jaro_winkler"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType == StringType)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two string arguments")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    StringSimKernels.jaroWinkler(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.StringSimKernels.jaroWinkler($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
