package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{Tables, VectorOps}

/** Hybrid lexical + vector retrieval with reciprocal-rank fusion (RRF,
  * Cormack et al. 2009) — the fusion rule every production RAG stack
  * runs when it has both a keyword index and a vector index. The two
  * sides reuse the engine's existing rankers verbatim:
  *
  *  - text: the BM25 integer-micro scores of [[Analytic.bm25MicroScores]]
  *    over the fixed query terms, top-[[HybridK]] as a
  *    TakeOrderedAndProject;
  *  - vector: exact cosine against the stored embedding of
  *    `vec_id = 0` (the ANN suite's query vector; the harness contract
  *    is that `embeddings.vec_id` indexes `documents.doc_id`),
  *    top-[[HybridK]] the same way.
  *
  * Fusion: rrf(d) = Σ_lists floor(1e9 / (60 + rank_d)) — the standard
  * k=60 formula in integer nano-units with an explicit `floor`, because
  * Spark's double→bigint cast truncates while DuckDB's rounds; floor is
  * identical in both engines, so the fused ordering is exact.
  *
  * Scale shape: each side ends in a bounded top-k BEFORE ranks are
  * assigned (row_number runs over k rows, not the corpus), the fusion
  * is a full-outer join of two k-row frames, and the final top-10 is
  * another TakeOrdered. Nothing after the two rankers touches
  * corpus-sized data.
  */
object HybridRetrieval {

  private val HybridK = 20
  private val RrfK = 60
  private val FusedTopK = 10
  private val QueryVecId = 0

  private def hybridRrf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // rank AFTER the bounded top-k: the global row_number window runs
    // over HybridK rows, never the corpus
    val text = Analytic.bm25MicroScores(s, dir)
      .orderBy($"micro".desc, $"doc_id")
      .limit(HybridK)
      .withColumn("text_rank",
        row_number().over(Window.orderBy($"micro".desc, $"doc_id")))
      .select($"doc_id", $"text_rank")
    val qVec = Tables.embeddings(s, dir)
      .filter($"vec_id" === QueryVecId)
      .select($"embedding").as[Array[Float]].head(1)
    require(qVec.nonEmpty, s"query vector vec_id=$QueryVecId missing")
    val vec = Tables.fanOut(Tables.embeddings(s, dir))
      .filter($"vec_id" =!= QueryVecId)
      .withColumn("cos", VectorOps.cosine($"embedding", typedlit(qVec.head)))
      .orderBy($"cos".desc, $"vec_id")
      .limit(HybridK)
      .withColumn("vec_rank",
        row_number().over(Window.orderBy($"cos".desc, $"vec_id")))
      .select($"vec_id".as("doc_id"), $"vec_rank")
    def rrfTerm(rank: org.apache.spark.sql.Column) =
      coalesce(floor(lit(1e9) / (lit(RrfK) + rank)).cast("bigint"), lit(0L))
    text.join(vec, Seq("doc_id"), "full_outer")
      .select($"doc_id", $"text_rank", $"vec_rank",
        (rrfTerm($"text_rank") + rrfTerm($"vec_rank")).as("rrf"))
      .orderBy($"rrf".desc, $"doc_id")
      .limit(FusedTopK)
  }

  private val hybridOracle =
    s"""WITH ${Analytic.bm25Ctes},
       |scores AS (
       |  SELECT doc_id, CAST(sum(micro) AS BIGINT) AS micro
       |  FROM contrib GROUP BY doc_id),
       |txt AS (
       |  SELECT doc_id, text_rank FROM (
       |    SELECT doc_id,
       |      row_number() OVER (ORDER BY micro DESC, doc_id) AS text_rank
       |    FROM scores)
       |  WHERE text_rank <= $HybridK),
       |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = $QueryVecId),
       |vec AS (
       |  SELECT doc_id, vec_rank FROM (
       |    SELECT vec_id AS doc_id,
       |      row_number() OVER (ORDER BY
       |        list_cosine_similarity(embedding::DOUBLE[], q.qv::DOUBLE[]) DESC,
       |        vec_id) AS vec_rank
       |    FROM embeddings, q WHERE vec_id <> $QueryVecId)
       |  WHERE vec_rank <= $HybridK)
       |SELECT coalesce(t.doc_id, v.doc_id) AS doc_id,
       |  CAST(t.text_rank AS INTEGER) AS text_rank,
       |  CAST(v.vec_rank AS INTEGER) AS vec_rank,
       |  coalesce(CAST(floor(1e9 / ($RrfK + t.text_rank)) AS BIGINT), 0)
       |    + coalesce(CAST(floor(1e9 / ($RrfK + v.vec_rank)) AS BIGINT), 0)
       |    AS rrf
       |FROM txt t FULL OUTER JOIN vec v ON t.doc_id = v.doc_id
       |ORDER BY rrf DESC, doc_id
       |LIMIT $FusedTopK""".stripMargin

  val queries: Seq[Q] = Seq(
    Q("hybrid_rrf_retrieval", hybridRrf, Some(hybridOracle)))
}
