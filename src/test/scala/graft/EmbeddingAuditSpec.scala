package graft

import java.nio.file.Files
import graft.queries.Registry

/** embedding_quality_audit: every check must FIRE on a planted corpus
  * of defective vectors (the harness data is all-zeros, so the oracle
  * gate alone never proves the checks work) and stay quiet on clean
  * rows.
  */
class EmbeddingAuditSpec extends SparkSpec {
  import spark.implicits._

  test("each audit check counts exactly its planted violations") {
    val dir = Files.createTempDirectory("graft_embaudit").toString
    val good = Array(0.5f, -0.25f, 0.125f)
    val rows: Seq[(Long, Array[Float], Integer)] = Seq(
      (0L, good, Integer.valueOf(1)),              // reference: dim 3
      (1L, good.map(-_), Integer.valueOf(2)),      // clean
      (2L, null, Integer.valueOf(1)),              // null vector
      (3L, Array[Float](), Integer.valueOf(1)),    // empty vector
      (4L, Array(1f, 2f), Integer.valueOf(1)),     // dim mismatch
      (5L, Array(1f, Float.NaN, 3f), Integer.valueOf(1)),          // NaN
      (6L, Array(1f, Float.PositiveInfinity, 3f), Integer.valueOf(1)), // inf
      (7L, Array(0f, 0f, 0f), Integer.valueOf(1)), // zero norm
      (8L, good, null),                            // null label
      (9L, good, Integer.valueOf(1)),              // dup id (x2)
      (9L, good, Integer.valueOf(1)))
    rows.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")

    val got = Registry.queries("embedding_quality_audit")(spark, dir)
      .as[(String, Long)].collect().toMap
    assert(got == Map(
      "embeddings_null_vector" -> 1L,
      "embeddings_empty_vector" -> 1L,
      "embeddings_dim_mismatch" -> 1L,
      "embeddings_nonfinite_component" -> 2L,
      "embeddings_zero_norm" -> 1L,
      "embeddings_duplicate_vec_id" -> 1L,
      "embeddings_null_label" -> 1L), got.toString)
  }

  test("the harness embeddings are clean (all checks zero)") {
    val got = Registry.queries("embedding_quality_audit")(
      spark, "/root/testdata/sf0.001")
      .as[(String, Long)].collect()
    assert(got.length == 7 && got.forall(_._2 == 0L), got.mkString(", "))
  }
}
