package graft.plans

/** Compiled kernels behind the Bloom runtime filter (graft.ops.BloomOps):
  * k-probe double hashing (Kirsch–Mitzenmacher, "Less Hashing, Same
  * Performance") over the same engine-portable md5 family as every other
  * graft sketch. probe_i = (h1 + i·h2) mod m with m a power of two and
  * h2 forced odd, so consecutive probes stride through distinct
  * positions. The filter is TRANSPARENT to query results (no false
  * negatives; false positives are removed by the real join), so it needs
  * no DuckDB mirror — correctness is proven by the pruned join hashing
  * identical to the unpruned oracle.
  *
  * Static forwarders keep each probe a single opaque call inside
  * whole-stage codegen, same as HashKernels.
  */
object BloomKernels {

  private def h(seed: Array[Byte], key: Long): Long =
    HashKernels.md5Prefix(seed, java.lang.Long.toString(key).getBytes("UTF-8"), 15)

  private val Seed1 = "b1|".getBytes("UTF-8")
  private val Seed2 = "b2|".getBytes("UTF-8")

  /** OR the key's k probe bits into `words` (the build side; words.length
    * must be a power of two).
    */
  def setBits(words: Array[Long], key: Long, k: Int): Unit = {
    val m = words.length.toLong * 64
    val h1 = h(Seed1, key)
    val h2 = h(Seed2, key) | 1L
    var i = 0
    while (i < k) {
      val pos = ((h1 + i * h2) % m + m) % m
      words((pos >>> 6).toInt) |= 1L << (pos & 63)
      i += 1
    }
  }

  /** True iff all k probe bits are set — possibly a false positive,
    * NEVER a false negative for a key that was inserted.
    */
  def mightContain(key: Long, words: Array[Long], k: Int): Boolean = {
    val m = words.length.toLong * 64
    val h1 = h(Seed1, key)
    val h2 = h(Seed2, key) | 1L
    var i = 0
    while (i < k) {
      val pos = ((h1 + i * h2) % m + m) % m
      if ((words((pos >>> 6).toInt) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }
}
