package graft

import org.apache.spark.sql.functions._
import graft.plans.TextNormExpressions.unicodeNormalize

/** Native Unicode normalization expression: composition semantics, the
  * ASCII fast path, null flow, and codegen integration.
  */
class TextNormSpec extends SparkSpec {
  import spark.implicits._

  // decomposed sequences built from escapes so the source stays ASCII
  private val decomposedCafe = "Cafe\u0301"
  private val composedCafe = "Caf\u00e9"
  private val compat = "\u2460 \ufb01"  // circled one + fi ligature

  test("NFC composes decomposed sequences; ASCII is identity") {
    val df = Seq(("a", decomposedCafe), ("b", "plain ascii"), ("c", composedCafe))
      .toDF("k", "t")
      .select($"k", unicodeNormalize($"t").as("n"), length($"t").as("raw_len"),
        length(unicodeNormalize($"t")).as("nfc_len"))
    val rows = df.collect().map(r => r.getString(0) -> r).toMap
    assert(rows("a").getString(1) == composedCafe)
    assert(rows("a").getInt(2) == 5 && rows("a").getInt(3) == 4)
    assert(rows("b").getString(1) == "plain ascii")
    assert(rows("c").getString(1) == composedCafe) // already composed: fixpoint
  }

  test("NFKC folds compatibility forms; NFD decomposes") {
    val r = Seq(Tuple1(compat)).toDF("t")
      .select(
        unicodeNormalize($"t", "NFKC").as("k"),
        unicodeNormalize(lit(composedCafe), "NFD").as("d"))
      .first()
    assert(r.getString(0) == "1 fi")
    assert(r.getString(1) == decomposedCafe)
  }

  test("null flows through; expression stays inside whole-stage codegen") {
    val df = Seq(Tuple1(Option.empty[String])).toDF("t")
      .select(unicodeNormalize($"t").as("n"))
    assert(df.first().isNullAt(0))
    // non-local, non-foldable input: a LocalRelation projection is
    // evaluated at optimize time (ConvertToLocalRelation) and a literal
    // child constant-folds — neither would exercise doGenCode
    val plan = spark.range(2)
      .select(unicodeNormalize(concat(lit(decomposedCafe), $"id".cast("string"))))
      .queryExecution.executedPlan.toString
    // the `*(n)` prefix IS the whole-stage-codegen marker in this
    // string form; an interpreted fallback renders an unstarred Project
    assert(plan.contains("*(1) Project [unicode_normalize"),
      s"normalize fell out of codegen:\n$plan")
  }
}
