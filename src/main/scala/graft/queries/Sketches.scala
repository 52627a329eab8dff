package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Aggregators, Tables, TextOps}

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
    Tables.lineitem(s, dir)
      .select($"l_returnflag",
        TextOps.portableHashBase($"l_partkey".cast("string")).as("h"))
      .groupBy($"l_returnflag")
      .agg(
        kmv($"h").as("est_distinct"),
        countDistinct($"h").as("exact_distinct"))
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

  val queries: Seq[Q] = Seq(
    Q("kmv_distinct_parts", kmvDistinctParts, Some(kmvOracle)),
    Q("heavy_hitters_events", heavyHittersEvents, Some(heavyHittersOracle)))
}
