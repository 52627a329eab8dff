package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import org.apache.spark.sql.expressions.Window

import graft.ops.{Aggregators, Exact, Tables, TextOps}

/** Approximate aggregates done engine-portably. Spark's built-in
  * sketches (HLL++, t-digest) have engine-private layouts that can never
  * hash-match another engine, so the approximate layer here is built on
  * deterministic md5-prefix hashing: the KMV distinct sketch's estimate
  * is a pure function of the k smallest distinct hash values, which
  * DuckDB derives with an ordered list aggregate — approximate in
  * accuracy, EXACT in reproducibility.
  */
object Sketches {

  private val K = 256

  /** Distinct l_partkey per returnflag, twice: the KMV estimate (custom
    * mergeable Aggregator, constant memory per group) next to the exact
    * distinct-hash count (expands to a two-phase aggregate). At 100 TB
    * the exact column is the expensive one — the sketch column's state
    * is k longs per group regardless of input size.
    */
  private def kmvDistinctParts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val kmv = udaf(new Aggregators.KmvDistinct(K))
    val base = Tables.lineitem(s, dir)
      .select($"l_returnflag",
        TextOps.portableHashBase($"l_partkey".cast("string")).as("h"))
    // TWO-LEVEL aggregation, deliberately: a single agg() with
    // countDistinct rewrites to key on (l_returnflag, h) and drags the
    // imperative kmv buffer through a per-distinct-hash partial level —
    // one List buffer serialization PER DISTINCT KEY (measured 3.8 s
    // warmed at sf0.1). Distinct-reducing on (flag, h) first keeps the
    // md5 scan single (the split-aggregations alternative re-scans:
    // 7.0 s), gets map-side combine on the distinct step, and the kmv
    // sketch then folds only distinct hashes with one buffer per FLAG
    // (measured 1.0 s). KMV over distinct values is the same sketch by
    // definition (k smallest DISTINCT hashes).
    base.groupBy($"l_returnflag", $"h").agg(count(lit(1)).as("_n"))
      .groupBy($"l_returnflag")
      .agg(
        kmv($"h").as("est_distinct"),
        count(lit(1)).as("exact_distinct"))
      .orderBy($"l_returnflag")
  }

  private val kmvOracle =
    s"""WITH h AS (
       |  SELECT DISTINCT l_returnflag,
       |    ('0x' || substr(md5('0|' || CAST(l_partkey AS VARCHAR)), 1, 7))::BIGINT AS h
       |  FROM lineitem)
       |SELECT l_returnflag,
       |  CAST(CASE WHEN count(*) < $K THEN count(*)
       |    ELSE round(${K - 1}.0 * 268435456.0
       |      / greatest((list(h ORDER BY h))[$K], 1)) END AS BIGINT) AS est_distinct,
       |  count(*) AS exact_distinct
       |FROM h
       |GROUP BY l_returnflag
       |ORDER BY l_returnflag""".stripMargin

  /** Event-type heavy hitters via the Misra–Gries summary (capacity 64).
    * The event_type domain is far below capacity, so the sketch is
    * provably exact here and the oracle is a plain GROUP BY count — while
    * the execution is the real sketch path: constant-memory partial
    * summaries per partition merged in one reduce (contrast with the
    * groupBy, whose shuffle width is the distinct-key count). The spec
    * covers the lossy regime (capacity < distinct) the oracle can't.
    */
  private def heavyHittersEvents(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val mg = udaf(new Aggregators.MisraGries(64))
    Tables.events(s, dir)
      .agg(mg($"event_type").as("sketch"))
      .select(explode($"sketch").as(Seq("event_type", "cnt")))
      .orderBy($"cnt".desc, $"event_type")
  }

  private val heavyHittersOracle =
    """SELECT event_type, CAST(count(*) AS BIGINT) AS cnt
      |FROM events
      |GROUP BY event_type
      |ORDER BY cnt DESC, event_type""".stripMargin

  // ---------------- HyperLogLog distinct (portable registers) ----------

  private val HllM = 256
  private[queries] val HllSeed = 7
  // alpha_256 * m^2 * 2^53 precomputed HERE, embedded as ONE double
  // literal in both engines (Scala computes it; the oracle SQL inlines
  // its shortest-round-trip decimal form), so the estimate is a single
  // division of that constant by the exact integer register sum —
  // bit-identical cross-engine with no float-expression-order risk.
  private val HllNum: Double =
    0.7213 / (1 + 1.079 / 256) * 590295810358705651712.0 // 2^69 (exact)
  // pre-scaled to centi-units so the 2-dp estimate is floor(x + 0.5) —
  // floor is bit-identical across engines, while round(double, 2)'s
  // half-way behavior is NOT (Spark rounds the shortest-decimal string
  // HALF_UP, DuckDB scales the binary double): the same integer-space
  // discipline as Exact.microSumTo4dp
  private val HllNumCents: Double = HllNum * 100.0

  /** Turn a `regs` register-array column into (hll_est, n_zero_registers)
    * — shared by the batch query and the streaming gate so both sides of
    * the estimate are ONE definition.
    */
  private[queries] def withHllEstimate(df: DataFrame): DataFrame = df
    .withColumn("s", expr(
      "aggregate(transform(regs, r -> shiftleft(CAST(1 AS BIGINT), 53 - r)), " +
        "CAST(0 AS BIGINT), (acc, x) -> acc + x)"))
    .withColumn("hll_est",
      floor(lit(HllNumCents) / col("s") + lit(0.5)) / lit(100.0))
    .withColumn("n_zero_registers",
      expr("CAST(size(filter(regs, r -> r = 0)) AS BIGINT)"))
    .drop("s", "regs")

  /** DuckDB CTE chain ending in `s(event_type, hll_est,
    * n_zero_registers)` — the register/estimate mirror shared by both
    * HLL oracles.
    */
  private[queries] val hllSketchCtes: String =
    s"""h AS (
       |  SELECT event_type, user_id,
       |    ('0x' || substr(md5('$HllSeed|' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
       |  FROM events),
       |r AS (
       |  SELECT event_type, h % $HllM AS bucket,
       |    CASE WHEN h // $HllM = 0 THEN 53 ELSE 53 - length(bin(h // $HllM)) END AS rho
       |  FROM h),
       |regs AS (SELECT event_type, bucket, max(rho) AS m FROM r GROUP BY 1, 2),
       |s AS (
       |  SELECT event_type,
       |    floor($HllNumCents / (list_aggregate(list_transform(list(m), x -> 1::BIGINT << (53 - x)), 'sum')
       |      + ($HllM - count(*)) * (1::BIGINT << 53)) + 0.5) / 100.0 AS hll_est,
       |    CAST($HllM - count(*) AS BIGINT) AS n_zero_registers
       |  FROM regs GROUP BY event_type)""".stripMargin

  /** Distinct user_id per event_type via a 256-register HyperLogLog
    * next to the exact count. The sketch column's state is 256 bytes
    * per group FOREVER — at 100 TB the exact column is the one that
    * stops fitting, and this one replaces it. Register sum stays in
    * exact integer space (Σ 2^(53-M_j) ≤ 2^61 fits a long); only the
    * final constant/S division is floating point. The RAW estimate is
    * reported (no linear-counting/bias correction — n_zero_registers is
    * emitted so a caller can see when the small-range regime applies,
    * as it does at tiny scale factors).
    */
  private def hllDistinctUsers(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hll = udaf(new Aggregators.HllRegisters)
    withHllEstimate(
      Tables.events(s, dir)
        .select($"event_type", $"user_id",
          TextOps.portableHash64($"user_id".cast("string"), HllSeed).as("h"))
        .groupBy($"event_type")
        .agg(hll($"h").as("regs"),
          countDistinct($"user_id").as("exact_distinct")))
      .select($"event_type", $"hll_est", $"n_zero_registers",
        $"exact_distinct")
      .orderBy($"event_type")
  }

  private val hllOracle =
    s"""WITH $hllSketchCtes,
       |ex AS (SELECT event_type, count(DISTINCT user_id) AS exact_distinct
       |       FROM events GROUP BY event_type)
       |SELECT s.event_type, s.hll_est, s.n_zero_registers, ex.exact_distinct
       |FROM s JOIN ex USING (event_type)
       |ORDER BY event_type""".stripMargin

  // ---------------- Count-Min sketch point queries --------------------

  private val CmDepth = 4
  private val CmWidth = 512
  private val CmTopK = 10

  /** Count-Min frequency estimation (Cormode–Muthukrishnan 2005) for
    * user_id occurrence counts: build the d×w cell matrix in ONE
    * aggregation (explode d seeded-hash cells per event; partial
    * aggregation compresses every partition to ≤ d·w = 2048 cells
    * before a byte-tiny shuffle), then answer point queries for the
    * exact top-k users — est = min over rows of the hashed cell, the
    * one-sided (est ≥ exact) CM guarantee. The probe join BROADCASTS
    * the PROBE side (k·d rows, provably bounded by the LIMIT — which
    * the broadcast-provenance audit can verify; the sketch side is
    * also tiny at d·w = 2048 cells, but an aggregate's bound is not
    * visible to a plan auditor) — so frequency lookups never shuffle
    * the corpus. The exact top-k here is ground truth for the gate; a
    * production pipeline probes known keys instead of computing it.
    */
  private def cmUserFrequencies(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir).select($"user_id".cast("string").as("key"))
    def cellsOf(key: org.apache.spark.sql.Column) =
      explode(array((0 until CmDepth).map(i => struct(
        lit(i).as("row"),
        pmod(TextOps.portableHash64(key, i), lit(CmWidth)).as("col"))): _*))
    val sketch = ev.select(cellsOf($"key").as("rc"))
      .groupBy($"rc.row".as("row"), $"rc.col".as("col"))
      .agg(count(lit(1)).as("cnt"))
    val top = ev.groupBy($"key").agg(count(lit(1)).as("exact_cnt"))
      .orderBy($"exact_cnt".desc, $"key").limit(CmTopK)
    val probes = top
      .select($"key".as("user_key"), $"exact_cnt", cellsOf($"key").as("rc"))
      .select($"user_key", $"exact_cnt",
        $"rc.row".as("row"), $"rc.col".as("col"))
    sketch.join(broadcast(probes), Seq("row", "col"))
      .groupBy($"user_key", $"exact_cnt")
      .agg(min($"cnt").as("cm_est"))
      .orderBy($"exact_cnt".desc, $"user_key")
  }

  private val cmOracle =
    s"""WITH k AS (SELECT CAST(user_id AS VARCHAR) AS key FROM events),
       |cells AS (
       |  SELECT i AS row,
       |    ('0x' || substr(md5(i || '|' || key), 1, 15))::BIGINT % $CmWidth AS col,
       |    count(*) AS cnt
       |  FROM k, generate_series(0, ${CmDepth - 1}) t(i) GROUP BY 1, 2),
       |top AS (SELECT key, count(*) AS exact_cnt FROM k GROUP BY key
       |        ORDER BY exact_cnt DESC, key LIMIT $CmTopK),
       |probe AS (
       |  SELECT key, exact_cnt, i AS row,
       |    ('0x' || substr(md5(i || '|' || key), 1, 15))::BIGINT % $CmWidth AS col
       |  FROM top, generate_series(0, ${CmDepth - 1}) t(i))
       |SELECT p.key AS user_key, p.exact_cnt, min(c.cnt) AS cm_est
       |FROM probe p JOIN cells c USING (row, col)
       |GROUP BY 1, 2
       |ORDER BY exact_cnt DESC, user_key""".stripMargin

  // ------------- mergeable log-histogram quantile sketch (HDR-style)

  /** The sub-bucket fragment: top-4-bits of `v` given its bit length
    * `bl` — pure integer arithmetic (pow(2, k) is IEEE-exact and the
    * cast is exact far beyond this data's 40-bit range), so both
    * engines compute the identical bucket for every value.
    */
  private def qsSubSql(intDiv: String) =
    s"CASE WHEN bl <= 4 THEN v ELSE v $intDiv CAST(pow(2, bl - 4) AS BIGINT) END"

  /** Reconstruct a bucket key's LOWER BOUND in micro units. */
  private def qsLowerSql(k: String, intDiv: String) =
    s"(($k) % 16) * CAST(pow(2, greatest(($k) $intDiv 16 - 4, 0)) AS BIGINT)"

  /** Mergeable quantile sketch over order prices — the HDR-histogram
    * pattern: bucket = (bit length, top 4 bits) of the exact micro-unit
    * price, i.e. a log₂ histogram with 8 sub-buckets per octave. Unlike
    * percentile_approx / t-digest (engine-private layouts, unmergeable
    * across engines), this sketch is a plain keyed COUNT: map-side
    * combinable, mergeable across any partitioning by addition, bounded
    * at ≤16·64 buckets regardless of input size — the shape that turns
    * a 100 TB quantile query into one tiny shuffled histogram — and
    * every step (bin(), integer shifts, integer-ceil thresholds, the
    * lower-bound readout) is exact integer math both engines reproduce
    * bit for bit. The estimate is the bucket lower bound, so it
    * UNDERSTATES the true quantile by construction, by less than one
    * part in eight (sub-bucket width / bucket base = 1/8); the spec
    * asserts that sandwich against the exact percentiles.
    */
  /** Bucket micro-unit values into the (bit length, top-4-bits) log₂
    * histogram: the map-side-combinable keyed COUNT both quantile
    * sketches and the cross-version merge share. Codegen'd nlz
    * instruction; length(bin(v)) semantics without the per-row
    * binary-string allocation (the oracle keeps the string form —
    * same VALUES, proven equal for all longs in PropertySpec).
    */
  private def qsHistogram(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.col
    df
      .withColumn("bl", graft.plans.VectorExpressions.bitLength64(col("v")))
      .withColumn("k", col("bl") * 16 + expr(qsSubSql(Exact.SparkDiv)))
      .groupBy(col("k")).agg(count(lit(1)).as("cnt"))
  }

  /** Quantile READOUT over a bounded (k, cnt) histogram: cumulative /
    * total windows and the integer-ceil threshold picks. The windows
    * run over the BOUNDED histogram (≤ ~600 rows), never the data — a
    * single-partition window here is a driver-scale fold.
    */
  private def qsReadout(hist: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.col
    val wCum = Window.orderBy(col("k"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.orderBy(col("k"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val d = Exact.SparkDiv
    val picked = hist
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("total", sum(col("cnt")).over(wAll))
      .agg(
        max(col("total")).as("n"),
        count(lit(1)).as("n_buckets"),
        min(when(col("cum") >= expr(s"(total + 1) $d 2"), col("k"))).as("k50"),
        min(when(col("cum") >= expr(s"(9 * total + 9) $d 10"), col("k"))).as("k90"),
        min(when(col("cum") >= expr(s"(99 * total + 99) $d 100"), col("k"))).as("k99"))
    picked.select(col("n"), col("n_buckets"),
      Exact.microSumTo4dp(qsLowerSql("k50", d)).as("p50_est"),
      Exact.microSumTo4dp(qsLowerSql("k90", d)).as("p90_est"),
      Exact.microSumTo4dp(qsLowerSql("k99", d)).as("p99_est"))
  }

  private def quantileSketchPrices(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    qsReadout(qsHistogram(
      Tables.fanOut(Tables.orders(s, dir))
        .select(Exact.micro("o_totalprice").as("v"))))
  }

  /** The single-pass sketch readout as SQL over any `... AS v` source —
    * shared by the whole-table, cross-version, and CDC-maintained
    * gates: each maintains the histogram a different way, and each must
    * equal this one-pass computation bucket for bucket.
    */
  private def qsOracleOver(srcSql: String) = {
    val d = Exact.DuckDiv
    s"""WITH b AS (
       |  SELECT v, length(bin(v)) AS bl
       |  FROM ($srcSql)),
       |h AS (
       |  SELECT bl * 16 + ${qsSubSql(d)} AS k, count(*) AS cnt
       |  FROM b GROUP BY 1),
       |c AS (
       |  SELECT k, sum(cnt) OVER (ORDER BY k) AS cum,
       |    sum(cnt) OVER () AS total
       |  FROM h),
       |q AS (
       |  SELECT CAST(max(total) AS BIGINT) AS n,
       |    count(*) AS n_buckets,
       |    min(CASE WHEN cum >= (total + 1) $d 2 THEN k END) AS k50,
       |    min(CASE WHEN cum >= (9 * total + 9) $d 10 THEN k END) AS k90,
       |    min(CASE WHEN cum >= (99 * total + 99) $d 100 THEN k END) AS k99
       |  FROM c)
       |SELECT n, n_buckets,
       |  ${Exact.microSumTo4dpSql(qsLowerSql("k50", d), d)} AS p50_est,
       |  ${Exact.microSumTo4dpSql(qsLowerSql("k90", d), d)} AS p90_est,
       |  ${Exact.microSumTo4dpSql(qsLowerSql("k99", d), d)} AS p99_est
       |FROM q""".stripMargin
  }

  private val quantileSketchOracle =
    qsOracleOver(s"SELECT ${Exact.microSql("o_totalprice")} AS v FROM orders")

  /** The GROUPED form of [[quantileSketchPrices]] — per-key quantiles
    * are where the mergeable histogram actually earns its keep at
    * scale: one `groupBy(group, bucket)` count (map-side combinable,
    * state = groups × ≤1024 buckets), then cum/total windows
    * PARTITIONED by group — every window shuffles only histogram rows
    * and parallelizes across groups, so the whole per-group quantile
    * pass costs one scan + one tiny keyed shuffle at any corpus size.
    * Same integer-exact bucket/threshold/readout math as the global
    * sketch, same ≤1-part-in-8 underestimate bound per group.
    */
  private def quantileSketchByPriority(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hist = Tables.fanOut(Tables.orders(s, dir))
      .select($"o_orderpriority".as("grp"),
        Exact.micro("o_totalprice").as("v"))
      .withColumn("bl", graft.plans.VectorExpressions.bitLength64($"v"))
      .withColumn("k", $"bl" * 16 + expr(qsSubSql(Exact.SparkDiv)))
      .groupBy($"grp", $"k").agg(count(lit(1)).as("cnt"))
    val wCum = Window.partitionBy($"grp").orderBy($"k")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy($"grp").orderBy($"k")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val d = Exact.SparkDiv
    hist
      .withColumn("cum", sum($"cnt").over(wCum))
      .withColumn("total", sum($"cnt").over(wAll))
      .groupBy($"grp")
      .agg(
        max($"total").as("n"),
        min(when($"cum" >= expr(s"(total + 1) $d 2"), $"k")).as("k50"),
        min(when($"cum" >= expr(s"(9 * total + 9) $d 10"), $"k")).as("k90"),
        min(when($"cum" >= expr(s"(99 * total + 99) $d 100"), $"k")).as("k99"))
      .select($"grp", $"n",
        Exact.microSumTo4dp(qsLowerSql("k50", d)).as("p50_est"),
        Exact.microSumTo4dp(qsLowerSql("k90", d)).as("p90_est"),
        Exact.microSumTo4dp(qsLowerSql("k99", d)).as("p99_est"))
      .orderBy($"grp")
  }

  private val quantileSketchGroupedOracle = {
    val d = Exact.DuckDiv
    s"""WITH b AS (
       |  SELECT grp, v, length(bin(v)) AS bl
       |  FROM (SELECT o_orderpriority AS grp,
       |          ${Exact.microSql("o_totalprice")} AS v FROM orders)),
       |h AS (
       |  SELECT grp, bl * 16 + ${qsSubSql(d)} AS k, count(*) AS cnt
       |  FROM b GROUP BY 1, 2),
       |c AS (
       |  SELECT grp, k,
       |    sum(cnt) OVER (PARTITION BY grp ORDER BY k) AS cum,
       |    sum(cnt) OVER (PARTITION BY grp) AS total
       |  FROM h),
       |q AS (
       |  SELECT grp, CAST(max(total) AS BIGINT) AS n,
       |    min(CASE WHEN cum >= (total + 1) $d 2 THEN k END) AS k50,
       |    min(CASE WHEN cum >= (9 * total + 9) $d 10 THEN k END) AS k90,
       |    min(CASE WHEN cum >= (99 * total + 99) $d 100 THEN k END) AS k99
       |  FROM c GROUP BY grp)
       |SELECT grp, n,
       |  ${Exact.microSumTo4dpSql(qsLowerSql("k50", d), d)} AS p50_est,
       |  ${Exact.microSumTo4dpSql(qsLowerSql("k90", d), d)} AS p90_est,
       |  ${Exact.microSumTo4dpSql(qsLowerSql("k99", d), d)} AS p99_est
       |FROM q
       |ORDER BY grp""".stripMargin
  }

  /** Cross-VERSION mergeability of the quantile sketch — the claim the
    * per-partition merge leaves untested: commit generation 1's
    * histogram to a [[graft.ops.SnapshotTable]], and when generation 2
    * arrives answer quantiles over the UNION of generations by reading
    * the v1 HISTOGRAM back and adding the delta's bucket counts —
    * generation 1's rows are NEVER rescanned (the code has no
    * reference to them after v1 commits). This is the sketch's 100 TB
    * contract across table generations: each ingest ships its ≤1024-row
    * histogram; any window of generations answers quantiles by bucket
    * addition, zero rescans of old data. Both states publish as
    * conditional snapshot commits; the oracle computes the same
    * integer-exact sketch over ALL orders in one pass, so a green run
    * proves merged-across-versions ≡ single-pass, bucket for bucket
    * (n_buckets included).
    */
  private def quantileSketchVersions(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = LakeOps.lakeBase(dir, "qsketch")
    graft.ops.SnapshotTable.deleteTree(base)
    val orders = Tables.fanOut(Tables.orders(s, dir))
      .select($"o_orderkey", Exact.micro("o_totalprice").as("v"))
    // generation 1 (even keys): its histogram is snapshot v1
    val v1 = graft.ops.SnapshotTable.commit(
      qsHistogram(orders.filter(pmod($"o_orderkey", lit(2)) === 0)),
      base, expectedVersion = graft.ops.SnapshotTable.ExpectEmpty)
    // generation 2 (odd keys) arrives: merge = the COMMITTED v1
    // histogram + the delta's histogram, added by bucket key — the only
    // scan is over the delta
    val merged = graft.ops.SnapshotTable.readAt(s, base, v1)
      .unionByName(qsHistogram(orders.filter(pmod($"o_orderkey", lit(2)) === 1)))
      .groupBy($"k").agg(sum($"cnt").as("cnt"))
    val v2 = graft.ops.SnapshotTable.commit(merged, base,
      expectedVersion = Some(v1))
    qsReadout(graft.ops.SnapshotTable.readAt(s, base, v2))
  }

  /** CDC-MAINTAINED quantile sketch — the subtraction half of the
    * histogram's mergeability contract, which [[quantileSketchVersions]]
    * (pure addition across generations) leaves untested: maintain the
    * committed sketch under a debezium-shaped change batch (op,
    * before-image, after-image) by bucket arithmetic ALONE —
    * +1 per insert/update after-value, −1 per delete/update
    * before-value — with the base table NEVER rescanned (after v1's
    * histogram commits, no code path touches v1's rows; the update
    * reads the ≤1024-row committed histogram plus the change batch).
    * This is how a 100 TB table's percentile dashboard survives a GDPR
    * erasure or a repricing without a recompute: the CDC feed carries
    * before-images, and a keyed count is the one sketch family where
    * deletion is EXACT (t-digest/KLL cannot subtract). Buckets whose
    * count reaches zero are dropped — the maintained histogram must be
    * indistinguishable from a fresh single-pass build, and the oracle
    * pins exactly that: the same readout over the final state computed
    * from `orders` in one pass, `n_buckets` included, so a leftover
    * zero bucket or a miscounted update fails the hash. Both sketch
    * states publish as conditional snapshot commits (CAS), like every
    * index artifact in the engine.
    *
    * Lifecycle (same mod-3 classes as `snapshot_changelog`): base =
    * keys ≡ 0,1; batch deletes ≡ 0, updates ≡ 1 to doubled price,
    * inserts ≡ 2. Final state = {≡1 doubled} ∪ {≡2}.
    */
  private def quantileSketchCdc(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = LakeOps.lakeBase(dir, "qscdc")
    graft.ops.SnapshotTable.deleteTree(base)
    val orders = Tables.fanOut(Tables.orders(s, dir))
      .select($"o_orderkey", Exact.micro("o_totalprice").as("v"))
    val residue = pmod($"o_orderkey", lit(3))
    // v1: the base generation's histogram — the last time base rows
    // are ever read
    val v1 = graft.ops.SnapshotTable.commit(
      qsHistogram(orders.filter(residue < 2).select($"v")),
      base, expectedVersion = graft.ops.SnapshotTable.ExpectEmpty)
    // the change batch, before/after images included (what a CDC feed
    // ships; no engine-side diff, no base rescan)
    val batch = orders.select($"o_orderkey", $"v", residue.as("r"))
      .select(
        when($"r" === 0, lit("delete"))
          .when($"r" === 1, lit("update"))
          .otherwise(lit("insert")).as("op"),
        when($"r" < 2, $"v").as("before_v"),
        when($"r" === 1, $"v" * 2).when($"r" === 2, $"v").as("after_v"))
    // signed bucket deltas: after-images count +1, before-images −1
    val plus = qsHistogram(batch.filter($"after_v".isNotNull)
      .select($"after_v".as("v")))
    val minus = qsHistogram(batch.filter($"op".isin("delete", "update"))
      .select($"before_v".as("v")))
      .withColumn("cnt", -$"cnt")
    val maintained = graft.ops.SnapshotTable.readAt(s, base, v1)
      .unionByName(plus).unionByName(minus)
      .groupBy($"k").agg(sum($"cnt").as("cnt"))
      .filter($"cnt" =!= 0) // emptied buckets must vanish exactly
    val v2 = graft.ops.SnapshotTable.commit(maintained, base,
      expectedVersion = Some(v1))
    qsReadout(graft.ops.SnapshotTable.readAt(s, base, v2))
  }

  private val quantileSketchCdcOracle = qsOracleOver(
    s"""SELECT CASE WHEN o_orderkey % 3 = 1
       |         THEN 2 * ${Exact.microSql("o_totalprice")}
       |         ELSE ${Exact.microSql("o_totalprice")} END AS v
       |  FROM orders WHERE o_orderkey % 3 > 0""".stripMargin)

  val queries: Seq[Q] = Seq(
    Q("quantile_sketch_prices", quantileSketchPrices, Some(quantileSketchOracle)),
    // merged-across-versions must equal the single-pass sketch exactly,
    // so the oracle is the SAME whole-table computation
    Q("quantile_sketch_versions", quantileSketchVersions, Some(quantileSketchOracle)),
    // maintained-under-CDC must equal a fresh single-pass sketch of the
    // final state, bucket for bucket — the oracle IS that single pass
    Q("quantile_sketch_cdc", quantileSketchCdc, Some(quantileSketchCdcOracle)),
    Q("quantile_sketch_by_priority", quantileSketchByPriority,
      Some(quantileSketchGroupedOracle)),
    Q("kmv_distinct_parts", kmvDistinctParts, Some(kmvOracle)),
    Q("heavy_hitters_events", heavyHittersEvents, Some(heavyHittersOracle)),
    Q("hll_distinct_users", hllDistinctUsers, Some(hllOracle)),
    Q("cm_user_frequencies", cmUserFrequencies, Some(cmOracle)))
}
