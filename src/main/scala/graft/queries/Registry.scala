package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Single registration point for every named engine query. SparkEntry
  * (the driver contract) delegates here.
  */
object Registry {
  lazy val all: Seq[Q] =
    Relational.queries ++ RelationalDeep.queries ++ Financial.queries ++ TextAnalysis.queries ++
      DedupQueries.queries ++ SimilarityQueries.queries ++ Events.queries ++
      MultimodalQueries.queries ++ Olap.queries ++ JoinsAndSets.queries ++
      Sketches.queries ++ ScaleOps.queries ++ CorpusSampling.queries ++
      CorpusQuality.queries ++ CorpusPrep.queries ++ Graph.queries ++ Ingestion.queries ++ DataQuality.queries ++
      Behavioral.queries ++ Analytic.queries ++ LayoutQueries.queries ++
      NestedOps.queries

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  lazy val oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
