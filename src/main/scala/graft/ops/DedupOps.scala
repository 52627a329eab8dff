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
    * no shuffle. Costs numHashes md5 per shingle; prefer the universal-
    * hashing pair [[shingleHashes]] + [[minhashFromHashes]] (one md5 per
    * shingle) on hot paths.
    */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    array((0 until numHashes).map(i =>
      array_min(transform(shingles, s => TextOps.portableHash64(s, i)))): _*)

  /** 28-bit engine-portable base hash (defined once in
    * [[TextOps.portableHashBase]]). Small enough that `a*h + b` stays far
    * from BIGINT overflow in every engine (DuckDB errors on overflow
    * rather than wrapping).
    */
  def portableHashBase(c: Column): Column = TextOps.portableHashBase(c)

  /** One base hash per k-shingle — the only md5 work MinHash needs under
    * universal hashing. Long arrays also make downstream set-ops
    * (intersect/union for exact Jaccard) much cheaper than string sets.
    */
  def shingleHashes(c: Column, k: Int): Column =
    transform(wordShingles(c, k), s => portableHashBase(s))

  val MinhashPrime = 2147483647L // 2^31 - 1
  def minhashA(i: Int): Long = 1L + 2L * i * 1048583L
  def minhashB(i: Int): Long = 7L + i.toLong * 2654435L

  /** MinHash via the universal family h_i(x) = (a_i·h(x) + b_i) mod p over
    * a MATERIALIZED base-hash array: numHashes cheap linear passes, zero
    * additional md5. h < 2^28 and a_i < 2^25 keep products < 2^53.
    */
  def minhashFromHashes(hs: Column, numHashes: Int): Column =
    array((0 until numHashes).map(i =>
      array_min(transform(hs, h =>
        pmod(h * lit(minhashA(i)) + lit(minhashB(i)), lit(MinhashPrime))))): _*)

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
    *
    * Payload discipline (the part that matters at corpus scale): the
    * banded rows, the self-join, and the pair-dedup carry ONLY
    * (band, key, id) — signatures re-attach by two id-equi-joins AFTER
    * the distinct. Carrying sigs through the candidate machinery would
    * multiply every shuffle by the signature width and make the
    * pair-dedup hash state hold two signatures per CANDIDATE (not per
    * surviving pair) — the r8 100x soak measured exactly that as the
    * dominant cost.
    */
  def lshCandidates(docSig: DataFrame, idCol: String, sigCol: String,
      numBands: Int, rowsPerBand: Int): DataFrame = {
    val banded = docSig.select(
        col(idCol),
        explode(lshBands(col(sigCol), numBands, rowsPerBand)).as("b"))
      .select(col(idCol), col("b.band").as("band"), col("b.key").as("key"))
    val pairs = banded.as("a")
      .join(banded.as("b"), Seq("band", "key"))
      .filter(col(s"a.$idCol") < col(s"b.$idCol"))
      .select(
        col(s"a.$idCol").as("doc_a"), col(s"b.$idCol").as("doc_b"))
      .distinct()
    pairs
      .join(docSig.select(col(idCol).as("doc_a"), col(sigCol).as("sig_a")),
        Seq("doc_a"))
      .join(docSig.select(col(idCol).as("doc_b"), col(sigCol).as("sig_b")),
        Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("sig_a"), col("sig_b"))
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

  /** Sorted, duplicate-free shingle-hash array — the representation
    * [[jaccardSorted]] needs.
    */
  def sortedShingleHashes(c: Column, k: Int): Column =
    array_sort(array_distinct(shingleHashes(c, k)))

  /** Exact Jaccard over SORTED distinct long arrays via the codegen'd
    * two-pointer intersect (graft.plans.SortedIntersectCount):
    * |∩| / (|a| + |b| − |∩|). No per-pair hash-set allocation — the
    * hot-loop form for pairwise verification at scale.
    */
  def jaccardSorted(a: Column, b: Column): Column = {
    val inter = graft.plans.VectorExpressions.sortedIntersectCount(a, b)
    inter.cast("double") / nullif(size(a) + size(b) - inter, lit(0))
  }

  /** Connected components over an undirected edge list (columns
    * `src`, `dst` — ONE row per direction; use [[symmetrize]] first if
    * the input has each edge once). Component id = min vertex id.
    *
    * Two-level strategy (the shape of every production-scale CC, cf.
    * Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC 2014): candidate-pair graphs are PRODUCED distributed but are
    * usually tiny relative to the corpus (dedup components are small by
    * construction), so once the edge list is materialized and counted,
    * a graph under `localThreshold` edges is solved by driver-side
    * union-find — one collect of the edge list, microseconds of work,
    * zero iterative jobs. Graphs above the threshold run iterative
    * min-label propagation: each round every vertex adopts the minimum
    * label among itself and its neighbors — one equi-join + one groupBy
    * per round, converging in ≤ diameter rounds. (Pointer jumping was
    * tried and measured SLOWER here: the extra per-round self-join
    * outweighs the saved rounds at LSH-component diameters.)
    *
    * `localThreshold` is the broadcast-join-threshold philosophy: the
    * default 1M edges collects ≤ ~16 MB to the driver — a bounded,
    * deliberate bridge, not an accidental one. Pass 0 to force the
    * distributed path (tests do).
    *
    * Scale hygiene on the distributed path, sized for deep components
    * at 100 TB:
    *  - every `checkpointEvery` rounds the label frame is
    *    `localCheckpoint()`-ed — without it each round stacks
    *    join+groupBy on the last round's plan: a 50-round run overflows
    *    the planner/driver stack, and even 4 stacked rounds measurably
    *    re-pay the optimizer per round (ckptEvery=1 ran ~20% faster
    *    than =5 on the sf0.1 LSH graph, which is why 1 is the default —
    *    each round's labelSum action materializes the frame anyway, so
    *    checkpointing every round adds no extra materialization);
    *  - intermediate cached frames are unpersisted as soon as the next
    *    round materializes;
    *  - the returned frame is checkpointed and every CacheManager entry
    *    is released before return. Note the caveat: unpersist() on a
    *    localCheckpoint()-ed frame releases its cache ENTRY but not the
    *    checkpoint RDD's blocks — those are reclaimed asynchronously by
    *    the ContextCleaner once the frame is GC'd, so a very long
    *    doubling run holds a bounded tail of prior-round blocks until
    *    the cleaner catches up (never unbounded: each round's unpersist
    *    drops the reference immediately).
    *
    * An unconverged run is a hard error (wrong labels must never be
    * silently emitted).
    */
  def connectedComponents(edgesIn: DataFrame, maxIter: Int = 50,
      checkpointEvery: Int = 1, localThreshold: Long = 1000000L): DataFrame = {
    val edges = edgesIn.toDF("src", "dst").persist()
    // one action materializes the cache AND sizes the graph for the
    // local-vs-distributed decision
    val nEdges = edges.count()
    if (nEdges <= localThreshold) {
      val out = localComponents(edges)
      edges.unpersist()
      return out
    }
    // Seeded init: label₀ = min(id, min(neighbors)) — the same shuffle
    // the plain distinct would pay (every vertex appears as src in the
    // symmetrized list), but it bakes round 1's propagation into the
    // initialization, so every component converges one round earlier
    // and single-edge components (the common near-dup case) need only
    // the confirming round.
    var labels = edges.groupBy(col("src"))
      .agg(min(col("dst")).as("mn"))
      .select(col("src").as("id"), least(col("src"), col("mn")).as("label"))
      .persist()
    // Convergence witness: labels only ever DECREASE under min-
    // propagation, so sum(label) is strictly monotone until the fixpoint
    // — equal sums across a round ⟺ no label changed (element-wise
    // domination + equal sums implies element-wise equality). One cheap
    // map-side aggregate per round instead of a join+filter+count. The
    // sum is exact decimal(38,0): 60-bit hashed ids × billions of
    // vertices stay far inside 38 digits, so no long-overflow wrap can
    // fake a fixpoint.
    def labelSum(df: DataFrame): java.math.BigDecimal = {
      val s = df.agg(sum(col("label").cast("decimal(38,0)"))).first().getDecimal(0)
      // non-ANSI Spark returns NULL on decimal overflow; a null sum here
      // would surface as an opaque NPE in compareTo — fail loudly instead
      require(s != null, "connectedComponents: label-sum overflowed decimal(38,0)")
      s
    }
    // empty edge list (a corpus with no duplicate pairs): sum over zero
    // rows is NULL — that is the legitimate empty-graph case, not an
    // overflow; return the (empty) label frame without iterating
    if (labels.isEmpty) {
      edges.unpersist()
      val out = labels.localCheckpoint()
      labels.unpersist()
      return out
    }
    var prevSum = labelSum(labels)
    var converged = false
    var iter = 0
    // <= maxIter, not <: convergence is WITNESSED by an extra no-change
    // round, so a graph needing exactly maxIter productive rounds gets
    // its confirming round instead of a spurious non-convergence error
    while (!converged && iter <= maxIter) {
      val viaNeighbors = edges.join(labels, col("dst") === col("id"))
        .select(col("src").as("id"), col("label"))
      val merged = labels.unionByName(viaNeighbors)
        .groupBy(col("id")).agg(min(col("label")).as("label"))
      // localCheckpoint is eager: it materializes AND truncates lineage
      val updated =
        if ((iter + 1) % checkpointEvery == 0) merged.localCheckpoint()
        else merged.persist()
      val newSum = labelSum(updated)
      labels.unpersist()
      labels = updated
      converged = newSum.compareTo(prevSum) == 0
      prevSum = newSum
      iter += 1
    }
    edges.unpersist()
    require(converged, s"label propagation did not converge in $maxIter rounds")
    // hand back a lineage-free frame and release the last CacheManager
    // entry (checkpoint blocks of dropped rounds are ContextCleaner/GC
    // reclaimed — see the scaladoc caveat)
    val out = labels.localCheckpoint()
    labels.unpersist()
    out
  }

  /** Driver-side union-find for a graph already known to fit: union by
    * MIN root, so every set's root is its minimum member — the exact
    * min-label semantics of the distributed loop. Path compression
    * keeps finds near-O(1); the result re-parallelizes through the
    * session's default parallelism.
    */
  private def localComponents(edges: DataFrame): DataFrame = {
    import edges.sparkSession.implicits._
    val parent = new scala.collection.mutable.LongMap[Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (c != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    edges.select(col("src").cast("long"), col("dst").cast("long"))
      .collect().foreach { row =>
        val a = row.getLong(0); val b = row.getLong(1)
        if (!parent.contains(a)) parent(a) = a
        if (!parent.contains(b)) parent(b) = b
        val ra = find(a); val rb = find(b)
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
    parent.keys.toSeq.map(v => (v, find(v))).toDF("id", "label")
  }

  /** Both directions of a one-row-per-edge list — the input shape
    * [[connectedComponents]] expects.
    */
  def symmetrize(pairs: DataFrame): DataFrame = {
    val p = pairs.toDF("src", "dst")
    p.unionByName(p.select(col("dst").as("src"), col("src").as("dst")))
  }

  /** Resolve a keeper ASSIGNMENT (id → p, one row per id, p ≤ id, every
    * p present as an id) to its fixed point: survivor(id) = p∘p∘…(id),
    * the element the replaced-by chain terminates at. This is pointer
    * jumping on a functional forest — NOT connected components: in the
    * keeper graph two docs that share a bucket may chain to different
    * roots (keeper is the min over EACH doc's own buckets), and the
    * per-doc chain, not the component minimum of the pair graph, is
    * what "which document actually survives" means.
    *
    * Scale shape mirrors [[connectedComponents]]:
    *  - size-gated: an assignment that fits on the driver (row count ≤
    *    localThreshold) resolves via a path-compressed chase — one
    *    collect, zero shuffles;
    *  - above the gate, distributed pointer DOUBLING: each round joins
    *    the frame to itself (p ← p(p)), halving every chain's depth —
    *    log₂(max chain) keyed shuffles on the id column, never O(chain)
    *    rounds and never all-pairs;
    *  - convergence witness is the same monotone sum trick: pointers
    *    only ever decrease (p ≤ id inductively), so an unchanged
    *    decimal(38,0) sum of p across a round ⟺ fixed point;
    *  - eager localCheckpoint truncates the self-join lineage per
    *    round; every CacheManager entry is released before return
    *    (checkpoint blocks of dropped rounds are reclaimed by the
    *    ContextCleaner once GC'd — the [[connectedComponents]] caveat;
    *    in [[resolveSurvivorsGeneric]] the intermediate stepped frames
    *    are likewise GC-reclaimed, not eagerly freed).
    *
    * Returns (id, survivor). An unconverged run is a hard error.
    */
  def resolveSurvivors(assignIn: DataFrame, maxIter: Int = 50,
      localThreshold: Long = 1000000L): DataFrame = {
    var f = assignIn.toDF("id", "p").persist()
    val n = f.count()
    if (n <= localThreshold) {
      val out = localResolve(f)
      f.unpersist()
      return out
    }
    def pSum(df: DataFrame): java.math.BigDecimal = {
      val s = df.agg(sum(col("p").cast("decimal(38,0)"))).first().getDecimal(0)
      require(s != null, "resolveSurvivors: pointer-sum overflowed decimal(38,0)")
      s
    }
    var prevSum = pSum(f)
    var converged = false
    var iter = 0
    // <= maxIter: the fixed point needs one extra witnessing round (an
    // assignment whose chains take exactly maxIter productive jumps
    // must not fail the convergence require)
    while (!converged && iter <= maxIter) {
      // p ← p(p): a's pointer jumps to its pointer's pointer. Every p
      // exists as an id (precondition), so the inner join loses no rows.
      val jumped = f.as("a")
        .join(f.select(col("id").as("pid"), col("p").as("pp")),
          col("a.p") === col("pid"))
        .select(col("a.id").as("id"), col("pp").as("p"))
        .localCheckpoint()
      val newSum = pSum(jumped)
      f.unpersist()
      f = jumped
      converged = newSum.compareTo(prevSum) == 0
      prevSum = newSum
      iter += 1
    }
    require(converged, s"pointer jumping did not converge in $maxIter rounds")
    f.select(col("id"), col("p").as("survivor"))
  }

  /** [[resolveSurvivors]] for an assignment whose pointers are NOT
    * id-decreasing — e.g. the quality keeper, whose chains strictly
    * ASCEND (score, −id). The functional graph must still be acyclic
    * with self-loop roots (any strictly-monotone keeper rule gives
    * that); what changes is the machinery:
    *  - the id-sum fixpoint witness is unavailable (pointer values are
    *    not monotone in id), so each round applies the ORIGINAL keeper
    *    map once (p ← k(p)) and counts changed rows explicitly — one
    *    keyed join + one count action per round;
    *  - rounds = max chain depth (not log₂ of it). Keeper chains are
    *    bucket-local and a handful deep regardless of corpus size, so
    *    linear stepping is the simpler correct choice at scale; the
    *    size gate still sends anything that fits to the driver chase.
    */
  def resolveSurvivorsGeneric(assignIn: DataFrame, maxIter: Int = 50,
      localThreshold: Long = 1000000L): DataFrame = {
    val k = assignIn.toDF("id", "p").persist()
    val n = k.count()
    if (n <= localThreshold) {
      val out = localResolve(k)
      k.unpersist()
      return out
    }
    val kmap = k.select(col("id").as("kid"), col("p").as("kp"))
    var f = k
    var converged = false
    var iter = 0
    // <= maxIter: same witnessed-convergence off-by-one as above — the
    // no-change round that PROVES the fixed point must not count
    // against the productive-round budget
    while (!converged && iter <= maxIter) {
      val stepped = f.join(kmap, col("p") === col("kid"))
        .select(col("id"), col("p").as("p0"), col("kp").as("p"))
        .localCheckpoint()
      converged = stepped.filter(col("p") =!= col("p0")).isEmpty
      f = stepped.select(col("id"), col("p"))
      iter += 1
    }
    k.unpersist()
    require(converged, s"keeper-map stepping did not converge in $maxIter rounds")
    f.select(col("id"), col("p").as("survivor"))
  }

  /** Driver-side chase for an assignment already known to fit: path
    * compression makes repeated lookups near-O(1); re-parallelizes
    * through the session's default parallelism.
    */
  private def localResolve(assign: DataFrame): DataFrame = {
    import assign.sparkSession.implicits._
    val parent = new scala.collection.mutable.LongMap[Long]()
    assign.select(col("id").cast("long"), col("p").cast("long"))
      .collect().foreach(r => parent(r.getLong(0)) = r.getLong(1))
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (c != r) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    parent.keys.toSeq.map(v => (v, find(v))).toDF("id", "survivor")
  }

  /** One portable hash per whitespace token (the expensive md5 step of
    * SimHash, done exactly once per token).
    */
  def tokenHashes(c: Column, seed: Int): Column =
    transform(split(c, " "), t => TextOps.portableHash64(t, seed))

  /** SimHash bits from an ALREADY-MATERIALIZED hash array: bit b is set
    * iff a strict majority of token hashes have bit b set. Re-scanning the
    * bound array 'bits' times is cheap; what must NOT happen is the md5
    * being recomputed per bit — hence the two-step API (see [[simhashed]]).
    * `bits` ≤ 31 keeps every engine in exact integer range.
    */
  def simhashFromHashes(hashes: Column, bits: Int): Column = {
    val n = size(hashes)
    (0 until bits).map { b =>
      val cnt = size(filter(hashes, h =>
        shiftright(h, b).bitwiseAND(lit(1L)) === 1L))
      when(cnt * 2 > n, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** SimHash as a DataFrame transform with the evaluation structure made
    * physical: fan out the (byte-tiny, CPU-heavy) input, hash every token
    * once, force a barrier so the hash array is materialized, then fold
    * bits. Without the barrier, Catalyst may inline the hash array into
    * all `bits` consumers and the md5 work multiplies by `bits`
    * (interpreted higher-order functions don't get codegen CSE).
    */
  def simhashed(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, bits: Int, seed: Int): org.apache.spark.sql.DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    Tables.fanOut(df.select(col(idCol), col(textCol)))
      .select(col(idCol), tokenHashes(col(textCol), seed).as("__hs"))
      .repartition(target) // barrier: __hs computed exactly once per row
      .select(col(idCol), simhashFromHashes(col("__hs"), bits).as("sim"))
  }

  /** Hamming distance between two simhash fingerprints. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  // ---- native kernel forms (graft.plans.HashExpressions) ----
  //
  // Bit-identical to the HOF pipelines above (cross-checked in
  // DedupOpsSpec) but one compiled kernel call per row instead of an
  // interpreted md5→hex→conv tree per array element — the hot-path
  // forms the dedup queries use. The HOF forms stay as the
  // no-internal-APIs fallback and executable spec.

  /** Native [[sortedShingleHashes]]: sorted distinct shingle-hash set,
    * null (not empty) below k tokens — callers filter `isNotNull`.
    */
  def shingleHashSetNative(text: Column, k: Int): Column =
    graft.plans.HashExpressions.shingleHashSet(text, k, sorted = true)

  /** Native [[minhashFromHashes]] ∘ [[shingleHashes]] in one call; null
    * below k tokens.
    */
  def minhashSigNative(text: Column, k: Int, numHashes: Int): Column =
    graft.plans.HashExpressions.minhashSig(text, k, numHashes)

  /** Native [[simhashFromHashes]] ∘ [[tokenHashes]] in one call — no
    * materialization barrier needed (the token hashes never exist as a
    * column).
    */
  def simhashNative(text: Column, bits: Int, seed: Int): Column =
    graft.plans.HashExpressions.simhash(text, bits, seed)
}
