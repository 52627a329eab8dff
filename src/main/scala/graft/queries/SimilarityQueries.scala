package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Tables, VectorOps}

/** Approximate-nearest-neighbor search over the `embeddings` table.
  *
  * Two variants of top-k for one query vector (vec_id 0):
  *  - brute force: score all n vectors, TakeOrderedAndProject keeps k —
  *    the exact baseline, O(n) scan with a broadcast 1-row query side;
  *  - LSH-bucketed: restrict the scan to the query's sign-bucket —
  *    the scale path (scan shrinks ~2^bits ×, recall < 1 by design).
  */
object SimilarityQueries {

  private val QueryVecId = 0
  private val TopK = 10
  private val LshBits = 8
  private val LshTopK = 5

  private def queryVec(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .filter(col("vec_id") === QueryVecId)
      .select(col("embedding").as("qv"))

  private def annTopkCosine(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.fanOut(Tables.embeddings(s, dir))
      .filter($"vec_id" =!= QueryVecId)
      .crossJoin(broadcast(queryVec(s, dir)))
      .withColumn("cos_raw", VectorOps.cosine($"embedding", $"qv"))
      .orderBy($"cos_raw".desc, $"vec_id")
      .limit(TopK)
      .select($"vec_id", $"label", round($"cos_raw", 4).as("cos"))
  }

  private val annTopkOracle =
    s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = $QueryVecId)
       |SELECT e.vec_id, e.label,
       |  round(list_cosine_similarity(e.embedding::DOUBLE[], q.qv::DOUBLE[]), 4) AS cos
       |FROM embeddings e, q
       |WHERE e.vec_id <> $QueryVecId
       |ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.qv::DOUBLE[]) DESC, e.vec_id
       |LIMIT $TopK""".stripMargin

  private def annLshTopk(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.fanOut(Tables.embeddings(s, dir))
      .filter($"vec_id" =!= QueryVecId)
      .crossJoin(broadcast(queryVec(s, dir)))
      .filter(VectorOps.signBucket($"embedding", LshBits)
        === VectorOps.signBucket($"qv", LshBits))
      .withColumn("cos_raw", VectorOps.cosine($"embedding", $"qv"))
      .orderBy($"cos_raw".desc, $"vec_id")
      .limit(LshTopK)
      .select($"vec_id", $"label", round($"cos_raw", 4).as("cos"))
  }

  private val annLshOracle = {
    val eb = VectorOps.signBucketSql("e.embedding", LshBits)
    val qb = VectorOps.signBucketSql("q.qv", LshBits)
    s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = $QueryVecId)
       |SELECT e.vec_id, e.label,
       |  round(list_cosine_similarity(e.embedding::DOUBLE[], q.qv::DOUBLE[]), 4) AS cos
       |FROM embeddings e, q
       |WHERE e.vec_id <> $QueryVecId AND $eb = $qb
       |ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.qv::DOUBLE[]) DESC, e.vec_id
       |LIMIT $LshTopK""".stripMargin
  }

  val queries: Seq[Q] = Seq(
    Q("ann_topk_cosine", annTopkCosine, Some(annTopkOracle)),
    Q("ann_lsh_topk", annLshTopk, Some(annLshOracle)))
}
