package graft

import java.nio.file.Files
import graft.queries.Registry

/** quality_classifier_train: the hashed-feature Naive Bayes model must
  * actually LEARN — on a planted linearly-separable corpus it must
  * classify held-out docs perfectly, and on the harness corpus it must
  * beat the majority-class baseline out of sample.
  */
class ClassifierTrainSpec extends SparkSpec {
  import spark.implicits._

  test("NB separates a planted corpus perfectly out of sample") {
    val dir = Files.createTempDirectory("graft_nb").toString
    // positives: stopword-dense ("the a of" in every doc); negatives:
    // technical-only. doc_id % 10 == 0 is the held-out split, so ids
    // 10/20 (one per class) are scored by a model that never saw them.
    val pos = "the quick a brown of fox the lazy a dog of note"
    val neg = "merge sort hash join scan filter shuffle spill codegen page"
    val rows = (1L to 20L).map { i =>
      val t = if (i % 2 == 0) pos else neg
      (i, t, "en", s"src${i % 3}", t.length.toLong)
    }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")

    val got = Registry.queries("quality_classifier_train")(spark, dir)
      .select("split", "n_docs", "n_correct", "acc_milli")
      .as[(String, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got.map(r => (r._1, r._2)) == Seq("test" -> 2L, "train" -> 18L))
    got.foreach { case (split, n, correct, accMilli) =>
      assert(correct == n, s"$split: $correct/$n")
      assert(accMilli == 1000L)
    }
  }

  test("NB beats the majority-class baseline on the harness corpus") {
    val sf = "/root/testdata/sf0.001"
    val got = Registry.queries("quality_classifier_train")(spark, sf)
      .select("split", "n_docs", "n_correct")
      .as[(String, Long, Long)].collect().map(r => r._1 -> r).toMap
    // majority baseline: the bigger class share among TRAIN labels
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val y = docs.selectExpr("doc_id",
      """CASE WHEN 20 * size(filter(split(text, ' '),
        |  t -> t IN ('the','a','of','and','in','to','is')))
        |  >= size(split(text, ' ')) THEN 1 ELSE 0 END AS y""".stripMargin)
    val Array(trainPos, trainN) = y.filter($"doc_id" % 10 =!= 0)
      .selectExpr("sum(y)", "count(*)").as[(Long, Long)].head()
      .productIterator.map(_.asInstanceOf[Long]).toArray
    val majority = math.max(trainPos, trainN - trainPos).toDouble / trainN
    val (_, n, correct) = got("train")
    assert(correct.toDouble / n > majority,
      s"train acc ${correct.toDouble / n} <= majority baseline $majority")
  }
}
