package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Tables

/** Data-quality audit — the constraint-validation pass a pipeline runs
  * before trusting a drop: null counts, domain/range checks, duplicate
  * keys, referential integrity. Each check is a conditional aggregate
  * (one map-side pass per table) except the FK probe, which is an
  * anti-join on the key — the shapes that stay cheap at 100 TB because
  * nothing materializes violating ROWS unless a human asks; the audit
  * only moves counts.
  */
object DataQuality {

  private def dataQualityAudit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val orders = Tables.orders(s, dir)
    val lineitem = Tables.lineitem(s, dir)
    val customer = Tables.customer(s, dir)
    val docs = Tables.documents(s, dir)

    // each `violations` frame is a 1-row global aggregate with column v
    def check(name: String, violations: DataFrame): DataFrame =
      violations.select(lit(name).as("check_name"), $"v".as("n_violations"))

    val checks = Seq(
      // nullability
      check("orders_null_custkey",
        orders.agg(count(when($"o_custkey".isNull, 1)).as("v"))),
      // domain: quantity must be a positive whole number <= 50
      check("lineitem_qty_out_of_range",
        lineitem.agg(count(when($"l_quantity" < 1 || $"l_quantity" > 50
          || $"l_quantity" =!= floor($"l_quantity"), 1)).as("v"))),
      // domain: discount within [0, 0.1]
      check("lineitem_discount_out_of_range",
        lineitem.agg(count(when($"l_discount" < 0 || $"l_discount" > 0.1, 1)).as("v"))),
      // key uniqueness
      check("orders_duplicate_orderkey",
        orders.groupBy($"o_orderkey").agg(count(lit(1)).as("c"))
          .agg(coalesce(sum(when($"c" > 1, $"c" - 1)), lit(0L)).as("v"))),
      // referential integrity: every order's customer must exist. NULL
      // keys are excluded — they belong to the null check above, and an
      // anti-join would count them while SQL NOT IN would not (the
      // planted-violation spec caught exactly that divergence).
      check("orders_orphan_custkey",
        orders.select($"o_custkey").filter($"o_custkey".isNotNull)
          .join(customer.select($"c_custkey"), $"o_custkey" === $"c_custkey",
            "left_anti")
          .agg(count(lit(1)).as("v"))),
      // corpus hygiene: empty documents
      check("documents_empty_text",
        docs.agg(count(when(length(trim($"text")) === 0 || $"text".isNull, 1))
          .as("v"))))

    checks.reduce(_.unionByName(_)).orderBy($"check_name")
  }

  private val auditOracle =
    """SELECT check_name, n_violations FROM (
      |  SELECT 'orders_null_custkey' AS check_name,
      |    (SELECT count(*) FROM orders WHERE o_custkey IS NULL) AS n_violations
      |  UNION ALL
      |  SELECT 'lineitem_qty_out_of_range',
      |    (SELECT count(*) FROM lineitem
      |     WHERE l_quantity < 1 OR l_quantity > 50 OR l_quantity <> floor(l_quantity))
      |  UNION ALL
      |  SELECT 'lineitem_discount_out_of_range',
      |    (SELECT count(*) FROM lineitem WHERE l_discount < 0 OR l_discount > 0.1)
      |  UNION ALL
      |  SELECT 'orders_duplicate_orderkey',
      |    (SELECT CAST(coalesce(sum(c - 1), 0) AS BIGINT) FROM (
      |       SELECT count(*) AS c FROM orders GROUP BY o_orderkey) WHERE c > 1)
      |  UNION ALL
      |  SELECT 'orders_orphan_custkey',
      |    (SELECT count(*) FROM orders
      |     WHERE o_custkey IS NOT NULL AND o_custkey NOT IN (SELECT c_custkey FROM customer))
      |  UNION ALL
      |  SELECT 'documents_empty_text',
      |    (SELECT count(*) FROM documents
      |     WHERE text IS NULL OR length(trim(text)) = 0))
      |ORDER BY check_name""".stripMargin

  /** ANALYZE-style column profile of the orders table — the catalog
    * statistics pass: per column, row/null/distinct counts plus min and
    * max rendered to strings. One aggregate pass per profiled column;
    * count(DISTINCT) here is exact because catalog stats feed the
    * optimizer's estimates (at 100 TB swap in the KMV sketch — see
    * kmv_distinct_parts — without changing the output shape).
    */
  private def columnProfile(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val orders = Tables.orders(s, dir)
    def prof(colName: String, renderMin: org.apache.spark.sql.Column,
        renderMax: org.apache.spark.sql.Column): DataFrame =
      orders.agg(
        count(lit(1)).as("n_rows"),
        count(when(col(colName).isNull, 1)).as("n_null"),
        countDistinct(col(colName)).as("n_distinct"),
        renderMin.as("min_str"), renderMax.as("max_str"))
        .select(lit(colName).as("column_name"), $"n_rows", $"n_null",
          $"n_distinct", $"min_str", $"max_str")
    prof("o_custkey",
        min($"o_custkey").cast("string"), max($"o_custkey").cast("string"))
      .unionByName(prof("o_orderpriority",
        min($"o_orderpriority"), max($"o_orderpriority")))
      .unionByName(prof("o_totalprice",
        min($"o_totalprice").cast("decimal(18,2)").cast("string"),
        max($"o_totalprice").cast("decimal(18,2)").cast("string")))
      .orderBy($"column_name")
  }

  private val profileOracle =
    """SELECT column_name, n_rows, n_null, n_distinct, min_str, max_str FROM (
      |  SELECT 'o_custkey' AS column_name, count(*) AS n_rows,
      |    count(*) FILTER (o_custkey IS NULL) AS n_null,
      |    count(DISTINCT o_custkey) AS n_distinct,
      |    CAST(min(o_custkey) AS VARCHAR) AS min_str,
      |    CAST(max(o_custkey) AS VARCHAR) AS max_str
      |  FROM orders
      |  UNION ALL
      |  SELECT 'o_orderpriority', count(*),
      |    count(*) FILTER (o_orderpriority IS NULL),
      |    count(DISTINCT o_orderpriority),
      |    min(o_orderpriority), max(o_orderpriority)
      |  FROM orders
      |  UNION ALL
      |  SELECT 'o_totalprice', count(*),
      |    count(*) FILTER (o_totalprice IS NULL),
      |    count(DISTINCT o_totalprice),
      |    CAST(CAST(min(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR),
      |    CAST(CAST(max(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR)
      |  FROM orders)
      |ORDER BY column_name""".stripMargin

  /** Record-linkage / fuzzy-dedup over a name domain, the scale shape:
    * (1) DOMAIN COMPRESSION — aggregate the 100 TB fact down to its
    * distinct names with row counts (one shuffle on the name; at sf0.1
    * 20k part rows hold only 64 distinct names, the usual orders-of-
    * magnitude collapse real catalogs show); (2) BLOCKING — candidate
    * pairs only within a cheap canonical block (the name's last word),
    * never all-pairs; (3) SCORING — the native codegen'd
    * [[graft.plans.JaroWinkler]] expression plus Spark's built-in
    * levenshtein, both reproduced exactly by the DuckDB oracle
    * (`jaro_winkler_similarity` / `levenshtein`). The block join is a
    * self-join of the tiny compressed domain — broadcastable at any
    * fact-table scale, because the domain (not the fact) drives it.
    */
  /** `jaro_winkler(a, b)` as a Column (the native expression). */
  private def jw(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.SqlBridge
    SqlBridge.column(graft.plans.JaroWinkler(
      SqlBridge.expression(a), SqlBridge.expression(b)))
  }

  /** The compressed name domain both linkage queries block over:
    * distinct p_name + row count + the last-word blocking key. The one
    * fact-table shuffle; everything downstream is domain-sized.
    */
  private def nameDomain(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.part(s, dir)
      .groupBy($"p_name").agg(count(lit(1)).as("n_rows"))
      .withColumn("last_word", regexp_extract($"p_name", "(\\S+)$", 1))
  }

  private def fuzzyNamePairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val names = nameDomain(s, dir)
    val a = names.select($"p_name".as("name_a"), $"n_rows".as("rows_a"),
      $"last_word")
    val b = names.select($"p_name".as("name_b"), $"n_rows".as("rows_b"),
      $"last_word")
    a.join(b, Seq("last_word"))
      .filter($"name_a" < $"name_b")
      .select($"name_a", $"name_b", $"rows_a", $"rows_b",
        round(jw($"name_a", $"name_b"), 6).as("jw"),
        levenshtein($"name_a", $"name_b").as("lev"))
      .filter($"jw" >= 0.75)
      .orderBy($"jw".desc, $"name_a", $"name_b")
  }

  private val fuzzyNamePairsOracle =
    """WITH names AS (
      |  SELECT p_name, count(*) AS n_rows,
      |    regexp_extract(p_name, '(\S+)$', 1) AS last_word
      |  FROM part GROUP BY p_name)
      |SELECT a.p_name AS name_a, b.p_name AS name_b,
      |  a.n_rows AS rows_a, b.n_rows AS rows_b,
      |  round(jaro_winkler_similarity(a.p_name, b.p_name), 6) AS jw,
      |  levenshtein(a.p_name, b.p_name) AS lev
      |FROM names a JOIN names b
      |  ON a.last_word = b.last_word AND a.p_name < b.p_name
      |WHERE round(jaro_winkler_similarity(a.p_name, b.p_name), 6) >= 0.75
      |ORDER BY jw DESC, name_a, name_b""".stripMargin

  /** Entity CANONICALIZATION on top of the pair scores: names whose
    * Jaro-Winkler reaches 0.9 are edges; connected components (the same
    * checkpointed min-label propagation as dedup_clusters) assign every
    * name a canonical representative (the component's min 60-bit
    * portable hash — arbitrary but deterministic and oracle-
    * reproducible). Singleton names are their own canonical form. The
    * component step runs on the COMPRESSED domain (64 ids at sf0.1), so
    * the iterative part is independent of fact-table scale. The domain
    * feeds four plan branches; exchange reuse writes its fact-side
    * shuffle once, and only the domain-sized post-shuffle aggregation
    * re-executes per branch.
    */
  private def fuzzyNameClusters(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.ops.{DedupOps, TextOps}
    val names = nameDomain(s, dir)
      .withColumn("id", TextOps.portableHash64($"p_name", 0))
    val a = names.select($"p_name".as("name_a"), $"id".as("src"), $"last_word")
    val b = names.select($"p_name".as("name_b"), $"id".as("dst"), $"last_word")
    val edges = a.join(b, Seq("last_word"))
      .filter($"name_a" < $"name_b"
        && round(jw($"name_a", $"name_b"), 6) >= 0.9)
      .select($"src", $"dst")
    val labels = DedupOps.connectedComponents(DedupOps.symmetrize(edges))
    val labeled = names.as("n")
      .join(labels.as("l"), $"n.id" === $"l.id", "left")
      .select($"n.p_name".as("name"), $"n.n_rows",
        coalesce($"l.label", $"n.id").as("label"))
    labeled.as("x")
      .join(names.select($"id", $"p_name".as("canonical_name")).as("rep"),
        $"x.label" === $"rep.id")
      .select($"name", $"canonical_name", $"n_rows",
        ($"name" === $"canonical_name").as("is_canonical"))
      .orderBy($"name")
  }

  private val fuzzyNameClustersOracle =
    """WITH RECURSIVE names AS (
      |  SELECT p_name, count(*) AS n_rows,
      |    regexp_extract(p_name, '(\S+)$', 1) AS last_word,
      |    ('0x' || substr(md5('0|' || p_name), 1, 15))::BIGINT AS id
      |  FROM part GROUP BY p_name),
      |cand AS (
      |  SELECT a.id AS src, b.id AS dst
      |  FROM names a JOIN names b
      |    ON a.last_word = b.last_word AND a.p_name < b.p_name
      |  WHERE round(jaro_winkler_similarity(a.p_name, b.p_name), 6) >= 0.9),
      |edges AS (SELECT src, dst FROM cand UNION SELECT dst, src FROM cand),
      |reach(id, r) AS (
      |  SELECT DISTINCT src, src FROM edges
      |  UNION
      |  SELECT reach.id, e.dst FROM reach JOIN edges e ON reach.r = e.src),
      |labels AS (SELECT id, min(r) AS label FROM reach GROUP BY id)
      |SELECT n.p_name AS name, rep.p_name AS canonical_name, n.n_rows,
      |  n.p_name = rep.p_name AS is_canonical
      |FROM names n
      |LEFT JOIN labels l ON n.id = l.id
      |JOIN names rep ON coalesce(l.label, n.id) = rep.id
      |ORDER BY name""".stripMargin

  // ------------------------------ vector (embedding) QA audit

  /** Vector hygiene — the audit an ANN/retrieval pipeline runs BEFORE
    * building any index, because every defect class here silently
    * poisons similarity math rather than erroring: NULL/empty vectors
    * vanish from recall, a dimension mismatch makes dot products read
    * garbage (or throw mid-build), non-finite components turn whole
    * distance computations into NaN, zero-norm vectors divide by zero
    * in cosine, and duplicate ids corrupt the id→vector mapping.
    * Same contract as [[dataQualityAudit]]: one (check_name,
    * n_violations) row per class, all-zero on healthy data.
    *
    * The expected dimensionality is taken from vec_id 0 — the
    * designated query vector every ANN query in this registry probes
    * with, i.e. the dimension the INDEX will be built at (a 1-value
    * scalar bridge). Each check is a global aggregate over one scan;
    * the only shuffle is the duplicate-id groupBy.
    */
  private def embeddingQualityAudit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, dir)
    val dim0 = emb.filter($"vec_id" === 0).select(size($"embedding"))
      .limit(1).collect().headOption.map(_.getInt(0))
      .getOrElse(sys.error(s"embeddings vec_id=0 missing in $dir"))
    def check(name: String, violations: DataFrame): DataFrame =
      violations.select(lit(name).as("check_name"), $"v".as("n_violations"))
    val finiteBound = lit(3.0e38)
    val checks = Seq(
      check("embeddings_null_vector",
        emb.agg(count(when($"embedding".isNull, 1)).as("v"))),
      check("embeddings_empty_vector",
        emb.agg(count(when($"embedding".isNotNull
          && size($"embedding") === 0, 1)).as("v"))),
      check("embeddings_dim_mismatch",
        emb.agg(count(when($"embedding".isNotNull && size($"embedding") > 0
          && size($"embedding") =!= dim0, 1)).as("v"))),
      check("embeddings_nonfinite_component",
        emb.agg(count(when($"embedding".isNotNull
          && exists($"embedding",
            x => isnan(x) || abs(x) > finiteBound), 1)).as("v"))),
      check("embeddings_zero_norm",
        emb.agg(count(when($"embedding".isNotNull && size($"embedding") > 0
          && array_max(transform($"embedding", x => abs(x))) === 0, 1))
          .as("v"))),
      check("embeddings_duplicate_vec_id",
        emb.groupBy($"vec_id").agg(count(lit(1)).as("c"))
          .agg(coalesce(sum(when($"c" > 1, $"c" - 1)), lit(0L)).as("v"))),
      check("embeddings_null_label",
        emb.agg(count(when($"label".isNull, 1)).as("v"))))
    checks.reduce(_.unionByName(_)).orderBy($"check_name")
  }

  private val embAuditOracle =
    """WITH dim0 AS (
      |  SELECT len(embedding) AS d FROM embeddings WHERE vec_id = 0 LIMIT 1)
      |SELECT check_name, n_violations FROM (
      |  SELECT 'embeddings_null_vector' AS check_name,
      |    (SELECT count(*) FROM embeddings WHERE embedding IS NULL) AS n_violations
      |  UNION ALL
      |  SELECT 'embeddings_empty_vector',
      |    (SELECT count(*) FROM embeddings
      |     WHERE embedding IS NOT NULL AND len(embedding) = 0)
      |  UNION ALL
      |  SELECT 'embeddings_dim_mismatch',
      |    (SELECT count(*) FROM embeddings, dim0
      |     WHERE embedding IS NOT NULL AND len(embedding) > 0
      |       AND len(embedding) <> dim0.d)
      |  UNION ALL
      |  SELECT 'embeddings_nonfinite_component',
      |    (SELECT count(*) FROM embeddings
      |     WHERE embedding IS NOT NULL AND len(list_filter(embedding,
      |       x -> isnan(x) OR abs(x) > 3.0e38)) > 0)
      |  UNION ALL
      |  SELECT 'embeddings_zero_norm',
      |    (SELECT count(*) FROM embeddings
      |     WHERE embedding IS NOT NULL AND len(embedding) > 0
      |       AND list_max(list_transform(embedding, x -> abs(x))) = 0)
      |  UNION ALL
      |  SELECT 'embeddings_duplicate_vec_id',
      |    (SELECT CAST(coalesce(sum(c - 1), 0) AS BIGINT) FROM (
      |       SELECT count(*) AS c FROM embeddings GROUP BY vec_id) WHERE c > 1)
      |  UNION ALL
      |  SELECT 'embeddings_null_label',
      |    (SELECT count(*) FROM embeddings WHERE label IS NULL))
      |ORDER BY check_name""".stripMargin

  val queries: Seq[Q] = Seq(
    Q("fuzzy_name_pairs", fuzzyNamePairs, Some(fuzzyNamePairsOracle)),
    Q("fuzzy_name_clusters", fuzzyNameClusters, Some(fuzzyNameClustersOracle)),
    Q("data_quality_audit", dataQualityAudit, Some(auditOracle)),
    Q("embedding_quality_audit", embeddingQualityAudit, Some(embAuditOracle)),
    Q("column_profile", columnProfile, Some(profileOracle)))
}