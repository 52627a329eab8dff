package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: word shingling,
  * MinHash signatures + LSH banding, SimHash, and exact n-gram Jaccard.
  *
  * Design for 100 TB:
  *  - signatures/simhashes are pure map-side expression work (the md5-based
  *    [[TextOps.portableHash64]] keeps hashes engine-portable);
  *  - candidate generation shuffles only on (band, hash) / bucket keys —
  *    never all-pairs;
  *  - exact-Jaccard verification runs only on LSH candidates or inside
  *    small blocking groups.
  */
object DedupOps {

  /** Distinct k-word shingles of a whitespace-tokenized text. Docs shorter
    * than k words yield an empty set (callers typically drop them).
    */
  def wordShingles(c: Column, k: Int): Column = {
    val toks = split(c, " ")
    when(size(toks) >= k,
      array_distinct(
        transform(sequence(lit(0), size(toks) - k),
          i => concat_ws(" ", slice(toks, i + 1, lit(k))))))
      .otherwise(array().cast("array<string>"))
  }

  /** MinHash signature: component i = min over shingles of the seeded
    * portable hash. Entirely per-row (array_min ∘ transform) — no explode,
    * no shuffle.
    */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    array((0 until numHashes).map(i =>
      array_min(transform(shingles, s => TextOps.portableHash64(s, i)))): _*)

  /** LSH banding: split a signature into `numBands` bands of
    * `rowsPerBand` and emit one (band_idx, band_key) struct per band.
    * Docs agreeing on ALL hashes of ANY band become candidates.
    */
  def lshBands(sig: Column, numBands: Int, rowsPerBand: Int): Column =
    array((0 until numBands).map(b =>
      struct(
        lit(b).as("band"),
        concat_ws("_",
          (0 until rowsPerBand).map(r => sig(b * rowsPerBand + r)): _*)
          .as("key"))): _*)

  /** Candidate pairs from banded signatures: explode bands, self-join on
    * (band, key), dedupe pairs. The join key is high-cardinality (a hash),
    * so the shuffle partitions evenly; only near-identical docs collide.
    * Output: (doc_a, doc_b, sig_a, sig_b), doc_a < doc_b.
    */
  def lshCandidates(docSig: DataFrame, idCol: String, sigCol: String,
      numBands: Int, rowsPerBand: Int): DataFrame = {
    val banded = docSig.select(
        col(idCol), col(sigCol),
        explode(lshBands(col(sigCol), numBands, rowsPerBand)).as("b"))
      .select(col(idCol), col(sigCol),
        col("b.band").as("band"), col("b.key").as("key"))
    banded.as("a")
      .join(banded.as("b"), Seq("band", "key"))
      .filter(col(s"a.$idCol") < col(s"b.$idCol"))
      .select(
        col(s"a.$idCol").as("doc_a"), col(s"b.$idCol").as("doc_b"),
        col(s"a.$sigCol").as("sig_a"), col(s"b.$sigCol").as("sig_b"))
      .distinct()
  }

  /** Estimated Jaccard from two MinHash signatures: fraction of agreeing
    * components.
    */
  def estimatedJaccard(sigA: Column, sigB: Column, numHashes: Int): Column =
    aggregate(
      zip_with(sigA, sigB, (x, y) => when(x === y, 1).otherwise(0)),
      lit(0),
      (acc, v) => acc + v).cast("double") / numHashes

  /** Exact Jaccard of two distinct-element arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      nullif(size(array_union(a, b)), lit(0))

  /** SimHash over the token multiset: bit b of the fingerprint is set iff
    * a strict majority of tokens hash with bit b set. `bits` ≤ 31 keeps
    * everything in exact integer range on both Spark and oracle engines.
    */
  def simhash(c: Column, bits: Int, seed: Int): Column = {
    val toks = split(c, " ")
    val n = size(toks)
    (0 until bits).map { b =>
      val cnt = size(filter(toks, t =>
        shiftright(TextOps.portableHash64(t, seed), b).bitwiseAND(lit(1L)) === 1L))
      when(cnt * 2 > n, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Hamming distance between two simhash fingerprints. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
