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

  private def litInt(e: Expression, fn: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal integer argument, got $other")
  }

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(binary("vec_dot", DotProduct.apply,
      "vec_dot(a, b) - dot product of two float vectors (double result)"))
    e.injectFunction(binary("vec_cosine", CosineSimilarity.apply,
      "vec_cosine(a, b) - cosine similarity of two float vectors"))
    e.injectFunction(binary("sorted_intersect_count", SortedIntersectCount.apply,
      "sorted_intersect_count(a, b) - |a ∩ b| of two sorted distinct bigint arrays"))
    e.injectFunction(binary("jaro_winkler", JaroWinkler.apply,
      "jaro_winkler(a, b) - Jaro-Winkler similarity (0..1, prefix boost above 0.7)"))
    e.injectFunction((FunctionIdentifier("simhash"),
      info("simhash", "simhash(text, bits, seed) - majority-bit fingerprint over seeded md5 token hashes"),
      { exprs =>
        require(exprs.length == 3, s"simhash expects 3 arguments, got ${exprs.length}")
        Simhash(exprs(0), litInt(exprs(1), "simhash"), litInt(exprs(2), "simhash"))
      }))
    e.injectFunction((FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "minhash_sig(text, k, n) - n-component MinHash signature of k-word shingles"),
      { exprs =>
        require(exprs.length == 3, s"minhash_sig expects 3 arguments, got ${exprs.length}")
        MinhashSig(exprs(0), litInt(exprs(1), "minhash_sig"), litInt(exprs(2), "minhash_sig"))
      }))
    e.injectFunction((FunctionIdentifier("shingle_hash_set"),
      info("shingle_hash_set", "shingle_hash_set(text, k) - sorted distinct k-word shingle hashes"),
      { exprs =>
        require(exprs.length == 2, s"shingle_hash_set expects 2 arguments, got ${exprs.length}")
        ShingleHashSet(exprs(0), litInt(exprs(1), "shingle_hash_set"), sorted = true)
      }))
    e.injectFunction((FunctionIdentifier("unicode_normalize"),
      info("unicode_normalize",
        "unicode_normalize(text[, form]) - Unicode normalization (NFC default; NFKC/NFD/NFKD)"),
      { exprs =>
        require(exprs.length == 1 || exprs.length == 2,
          s"unicode_normalize expects 1-2 arguments, got ${exprs.length}")
        val form = if (exprs.length == 1) "NFC" else exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(s, _) if s != null =>
            s.toString
          case other => throw new IllegalArgumentException(
            s"unicode_normalize expects a literal form name, got $other")
        }
        UnicodeNormalize(exprs(0), form)
      }))
  }
}
