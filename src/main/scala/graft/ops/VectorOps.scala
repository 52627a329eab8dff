package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector operators over `array<float>` embedding columns. All
  * built from higher-order functions (zip_with/aggregate/transform) — no
  * UDFs, no UDTs, no MLlib Vector conversion; the arrays stay in Tungsten
  * format end-to-end.
  *
  * Math is done in double (floats cast up exactly) so results agree with
  * engines that compute in double (DuckDB `list_cosine_similarity`).
  */
object VectorOps {

  /** Native codegen'd expressions (graft.plans.VectorExpressions) — one
    * tight primitive loop per pair. The HOF forms below produce
    * bit-identical doubles (same widening, same summation order) and are
    * kept as the no-internal-APIs fallback and as a cross-check in tests.
    */
  def dot(a: Column, b: Column): Column =
    graft.plans.VectorExpressions.vecDot(a, b)

  def cosine(a: Column, b: Column): Column =
    graft.plans.VectorExpressions.vecCosine(a, b)

  def dotHof(a: Column, b: Column): Column = {
    // slice to the common prefix first: zip_with PADS the shorter array
    // with nulls, which would turn a ragged pair into a NULL dot product
    // where the native kernel returns the min(n)-element sum — the two
    // forms must agree on every input for the cross-check to mean
    // anything
    val n = least(size(a), size(b))
    aggregate(
      zip_with(slice(a, lit(1), n), slice(b, lit(1), n),
        (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)
  }

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosineHof(a: Column, b: Column): Column =
    dotHof(a, b) / (sqrt(dotHof(a, a)) * sqrt(dotHof(b, b)))

  /** Random-hyperplane LSH, degenerate-but-deterministic variant: the
    * "hyperplanes" are the first `bits` coordinate axes, so the bucket is
    * the sign pattern of the leading dims. For isotropic embeddings this
    * partitions like true RH-LSH without needing a seeded random matrix
    * (nothing random is available engine-portably). 2^bits buckets.
    *
    * Scale path: bucket is computed map-side; candidate generation joins
    * on the bucket id, turning the O(n²) all-pairs search into
    * sum-over-buckets O(Σ b_i²) — with a sensible `bits` that's ~n²/2^bits.
    */
  def signBucket(a: Column, bits: Int): Column = signBucketAt(a, bits, 0)

  /** [[signBucket]] over dims `offset+1 .. offset+bits` — disjoint
    * offsets give INDEPENDENT hash tables for multi-index LSH (a pair
    * missed by one table's buckets can still collide in another's),
    * the standard recall lever that costs buckets, not dimensions.
    */
  def signBucketAt(a: Column, bits: Int, offset: Int): Column =
    (0 until bits)
      .map(d => when(element_at(a, offset + d + 1) >= 0f, lit(1 << d)).otherwise(lit(0)))
      .reduce(_ + _)

  /** SQL fragment mirroring [[signBucket]] for DuckDB oracles
    * (1-based list indexing there too).
    */
  def signBucketSql(col: String, bits: Int): String =
    signBucketAtSql(col, bits, 0)

  /** SQL mirror of [[signBucketAt]]. */
  def signBucketAtSql(col: String, bits: Int, offset: Int): String =
    (0 until bits)
      .map(d => s"(CASE WHEN $col[${offset + d + 1}] >= 0 THEN ${1 << d} ELSE 0 END)")
      .mkString("(", " + ", ")")
}
