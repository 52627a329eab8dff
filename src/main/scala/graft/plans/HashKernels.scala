package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Compiled kernels behind the text-dedup hash expressions
  * (graft.plans.HashExpressions). One static call per ROW replaces an
  * interpreted higher-order-function tree evaluated per SHINGLE — the
  * md5 → hex → conv chain in expression form allocates several
  * UTF8Strings per element and cannot reach codegen inside lambda
  * bodies (measured ~3.5× the cost of the raw md5 work at sf0.1).
  *
  * Parity contract: every hash here equals the engine-portable md5
  * prefix used by the DuckDB oracles,
  * `('0x' || substr(md5(seed || '|' || x), 1, hexLen))::BIGINT` — the
  * same definition as TextOps.portableHashBase (hexLen=7, seed "0")
  * and TextOps.portableHash64 (hexLen=15, seed i). The HOF forms in
  * DedupOps remain as executable cross-checks (see DedupOpsSpec).
  *
  * Scala object methods get static forwarders, so generated Java can
  * call `graft.plans.HashKernels.method(...)` directly — each kernel
  * is a single opaque call inside the stage's codegen, keeping the
  * surrounding whole-stage span intact.
  */
object HashKernels {

  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** First `hexLen` hex chars of md5(seedPrefix ++ bytes) as a long —
    * numerically, without building the hex string.
    */
  def md5Prefix(seedPrefix: Array[Byte], bytes: Array[Byte], hexLen: Int): Long = {
    val d = md.get()
    d.reset()
    d.update(seedPrefix)
    d.update(bytes)
    val dig = d.digest()
    var v = 0L
    var i = 0
    while (i < hexLen) {
      val b = dig(i >> 1) & 0xff
      val nibble = if ((i & 1) == 0) b >> 4 else b & 0xf
      v = (v << 4) | nibble
      i += 1
    }
    v
  }

  private def seedPrefix(seed: Int): Array[Byte] =
    (seed.toString + "|").getBytes("UTF-8")

  /** Split on single spaces, KEEPING empty tokens — the semantics of
    * Spark's `split(c, " ")` (limit -1) and DuckDB's `string_split`,
    * which both oracle SQL and the HOF forms rely on.
    */
  private def splitTokens(text: UTF8String): Array[String] =
    text.toString.split(" ", -1)

  /** k-word shingle hash set of `text`: 28-bit md5-prefix hash (seed 0)
    * of each space-joined k-gram, duplicates removed. Returns null when
    * the text has fewer than k tokens (callers drop those docs — same
    * rows as the HOF `size(hs) > 0` / oracle `len(shingles) > 0` gate).
    * `sorted=true` additionally sorts ascending — the representation
    * SortedIntersectCount requires.
    */
  def shingleHashSet(text: UTF8String, k: Int, sorted: Boolean): ArrayData = {
    if (text == null) return null
    val toks = splitTokens(text)
    val n = toks.length - k + 1
    if (n <= 0) return null
    val pre = seedPrefix(0)
    val seen = new java.util.LinkedHashSet[java.lang.Long](n * 2)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < n) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(md5Prefix(pre, sb.toString.getBytes("UTF-8"), 7))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var m = 0
    while (it.hasNext) { out(m) = it.next(); m += 1 }
    if (sorted) java.util.Arrays.sort(out)
    new GenericArrayData(out)
  }

  /** MinHash signature straight from text: component i =
    * min over shingle hashes h of (a_i·h + b_i) mod p, the universal
    * family of DedupOps.minhashA/minhashB/MinhashPrime. Null when the
    * doc has fewer than k tokens.
    */
  def minhashSig(text: UTF8String, k: Int, numHashes: Int): ArrayData = {
    val hsArr = shingleHashSet(text, k, sorted = false)
    if (hsArr == null) return null
    val hs = hsArr.toLongArray()
    val p = graft.ops.DedupOps.MinhashPrime
    val sig = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) {
      val a = graft.ops.DedupOps.minhashA(i)
      val b = graft.ops.DedupOps.minhashB(i)
      var best = Long.MaxValue
      var j = 0
      while (j < hs.length) {
        val v = (a * hs(j) + b) % p
        if (v < best) best = v
        j += 1
      }
      sig(i) = v0(best)
      i += 1
    }
    new GenericArrayData(sig)
  }

  // hs >= 0 and a,b > 0 keep the mod non-negative; guard stays for the
  // pmod parity promise with the HOF form
  private def v0(v: Long): Long = if (v < 0) v + graft.ops.DedupOps.MinhashPrime else v

  /** SimHash fingerprint: bit b set iff a strict majority of the
    * doc's token hashes (60-bit md5 prefix, seeded) have bit b set.
    * Exactly simhashFromHashes ∘ tokenHashes, one pass, no barrier
    * needed — the token hashes never materialize as a column.
    */
  def simhash(text: UTF8String, bits: Int, seed: Int): Long = {
    if (text == null) return 0L
    val toks = splitTokens(text)
    val pre = seedPrefix(seed)
    val counts = new Array[Int](bits)
    // bits <= 60 (the md5-prefix width), so the mask shift cannot wrap
    val mask = (1L << bits) - 1
    var i = 0
    while (i < toks.length) {
      val h = md5Prefix(pre, toks(i).getBytes("UTF-8"), 15)
      // iterate SET bits only (clear-lowest-bit walk): ~bits/2 set on a
      // uniform hash, half the loop work of testing every position —
      // this is the per-token inner loop of a corpus-wide map pass
      var rem = h & mask
      while (rem != 0L) {
        counts(java.lang.Long.numberOfTrailingZeros(rem)) += 1
        rem &= rem - 1
      }
      i += 1
    }
    var sim = 0L
    var b = 0
    while (b < bits) {
      if (2 * counts(b) > toks.length) sim |= (1L << b)
      b += 1
    }
    sim
  }

  /** POSITIONED k-gram hashes: element i = 60-bit md5-prefix hash
    * (seed 0) of the space-joined gram starting at token i — the
    * substring-dedup fingerprint (`reference project-dask.py`'s shared-
    * passage intent), index order preserved so `posexplode` yields
    * (pos, h) directly. Bit-identical to the HOF form
    * `transform(sequence(0, n-k), i -> portableHash64(concat_ws(' ',
    * slice(toks, i+1, k)), 0))` and the oracle's
    * `('0x'||substr(md5('0|'||gram),1,15))::BIGINT`, but ONE kernel
    * call per row: the HOF tree re-evaluates an interpreted
    * md5→hex-substring→conv chain per WINDOW, ~3.5× the digest work,
    * on the hottest frame the passage queries own (28 M windows at the
    * 100× soak). Returns an EMPTY array (not null) for docs shorter
    * than k tokens — the exact `otherwise(array())` the HOF form used,
    * so downstream `posexplode` row counts are unchanged.
    */
  def posGramHashes(text: UTF8String, k: Int): ArrayData = {
    if (text == null) return null
    val toks = splitTokens(text)
    val n = toks.length - k + 1
    if (n <= 0) return new GenericArrayData(Array.emptyLongArray)
    val pre = seedPrefix(0)
    val out = new Array[Long](n)
    val sb = new java.lang.StringBuilder(96)
    var i = 0
    while (i < n) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = md5Prefix(pre, sb.toString.getBytes("UTF-8"), 15)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Hashed-bigram BUCKET ids (the DSIR hashing trick's feature
    * extractor): element i = portableHash64(tok_i ⧺ ' ' ⧺ tok_{i+1},
    * seed) mod buckets — bit-identical to the HOF pipeline
    * `pmod(portableHash64(concat_ws(' ', t_i, t_{i+1}), seed), B)` and
    * its DuckDB mirror, in ONE kernel call per row. The HOF form built
    * every bigram STRING as a column value and re-evaluated an
    * interpreted md5→hex→conv tree per bigram (~100 M at the 100×
    * soak); here only the 8-byte bucket ids ever leave the kernel.
    * Empty array below 2 tokens (the bigramsOf guard).
    */
  def bigramBucketIds(text: UTF8String, seed: Int, buckets: Long): ArrayData = {
    if (text == null) return null
    val toks = splitTokens(text)
    val n = toks.length - 1
    if (n <= 0) return new GenericArrayData(Array.emptyLongArray)
    val pre = seedPrefix(seed)
    val out = new Array[Long](n)
    val sb = new java.lang.StringBuilder(48)
    var i = 0
    while (i < n) {
      sb.setLength(0)
      sb.append(toks(i)).append(' ').append(toks(i + 1))
      // md5Prefix(_, _, 15) is non-negative (< 2^60), so % == pmod
      out(i) = md5Prefix(pre, sb.toString.getBytes("UTF-8"), 15) % buckets
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Adjacent-token bigram STRINGS ("tok_i tok_{i+1}"), one kernel call
    * per row — value-identical to the HOF form
    * `transform(sequence(2, n), i -> concat_ws(' ', t_{i-1}, t_i))`
    * (and DuckDB's equivalent list comprehension), which re-evaluated
    * an interpreted concat per ELEMENT on corpus-scale explodes (the
    * bigram-LM and CCNet scans). Empty array below 2 tokens.
    */
  def bigramStrings(text: UTF8String): ArrayData = {
    if (text == null) return null
    val toks = splitTokens(text)
    val n = toks.length - 1
    if (n <= 0) return new GenericArrayData(new Array[UTF8String](0))
    val out = new Array[UTF8String](n)
    val sb = new java.lang.StringBuilder(48)
    var i = 0
    while (i < n) {
      sb.setLength(0)
      sb.append(toks(i)).append(' ').append(toks(i + 1))
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }
}
