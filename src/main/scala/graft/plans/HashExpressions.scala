package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native expressions for the text-dedup hot path (shingle hashing,
  * MinHash signatures, SimHash) — tier (b) of the extension ladder,
  * used because the composable `transform`/`aggregate` forms evaluate
  * an interpreted md5→hex→conv tree per array ELEMENT. Each expression
  * is one HashKernels call per row; generated code invokes the kernel's
  * static forwarder, so the surrounding whole-stage codegen span is
  * preserved. Hash values are bit-identical to the DuckDB-oracle md5
  * prefixes (see HashKernels parity contract and DedupOpsSpec
  * cross-checks against the HOF forms).
  */
abstract class TextHashUnaryExpression extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${t.sql}")
  }
}

/** Distinct k-word shingle hash set; null for docs shorter than k
  * tokens. `sorted` ⇒ ascending (the SortedIntersectCount contract).
  */
case class ShingleHashSet(child: Expression, k: Int, sorted: Boolean)
    extends TextHashUnaryExpression {
  override def prettyName: String = "shingle_hash_set"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    HashKernels.shingleHashSet(input.asInstanceOf[UTF8String], k, sorted)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.plans.HashKernels.shingleHashSet($c, $k, $sorted);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** MinHash signature (universal-hash family over the shingle hash set);
  * null for docs shorter than k tokens.
  */
case class MinhashSig(child: Expression, k: Int, numHashes: Int)
    extends TextHashUnaryExpression {
  override def prettyName: String = "minhash_sig"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    HashKernels.minhashSig(input.asInstanceOf[UTF8String], k, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.plans.HashKernels.minhashSig($c, $k, $numHashes);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** SimHash fingerprint (majority bit over seeded 60-bit token hashes). */
case class Simhash(child: Expression, bits: Int, seed: Int)
    extends TextHashUnaryExpression {
  override def prettyName: String = "simhash"
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    HashKernels.simhash(input.asInstanceOf[UTF8String], bits, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.HashKernels.simhash($c, $bits, $seed)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Positioned k-gram hashes (index = start token position); empty
  * array for docs shorter than k tokens — posexplode row parity with
  * the HOF form it replaces.
  */
case class PosGramHashes(child: Expression, k: Int)
    extends TextHashUnaryExpression {
  override def prettyName: String = "pos_gram_hashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    HashKernels.posGramHashes(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.plans.HashKernels.posGramHashes($c, $k);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Hashed-bigram bucket ids (DSIR hashing-trick features); empty array
  * below 2 tokens.
  */
case class BigramBucketIds(child: Expression, seed: Int, buckets: Long)
    extends TextHashUnaryExpression {
  override def prettyName: String = "bigram_bucket_ids"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    HashKernels.bigramBucketIds(input.asInstanceOf[UTF8String], seed, buckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.plans.HashKernels.bigramBucketIds($c, $seed, ${buckets}L);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Adjacent-token bigram strings; empty array below 2 tokens. */
case class BigramStrings(child: Expression)
    extends TextHashUnaryExpression {
  override def prettyName: String = "bigram_strings"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    HashKernels.bigramStrings(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.plans.HashKernels.bigramStrings($c);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashExpressions {
  def shingleHashSet(text: Column, k: Int, sorted: Boolean): Column =
    SqlBridge.column(ShingleHashSet(SqlBridge.expression(text), k, sorted))
  def minhashSig(text: Column, k: Int, numHashes: Int): Column =
    SqlBridge.column(MinhashSig(SqlBridge.expression(text), k, numHashes))
  def simhash(text: Column, bits: Int, seed: Int): Column =
    SqlBridge.column(Simhash(SqlBridge.expression(text), bits, seed))
  def posGramHashes(text: Column, k: Int): Column =
    SqlBridge.column(PosGramHashes(SqlBridge.expression(text), k))
  def bigramBucketIds(text: Column, seed: Int, buckets: Long): Column =
    SqlBridge.column(BigramBucketIds(SqlBridge.expression(text), seed, buckets))
  def bigramStrings(text: Column): Column =
    SqlBridge.column(BigramStrings(SqlBridge.expression(text)))
}
