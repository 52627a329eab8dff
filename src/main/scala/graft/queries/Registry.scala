package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Single registration point for every named engine query. SparkEntry
  * (the driver contract) delegates here.
  */
object Registry {
  lazy val all: Seq[Q] = {
    val qs =
      Relational.queries ++ RelationalDeep.queries ++ Financial.queries ++ TextAnalysis.queries ++
        DedupQueries.queries ++ SimilarityQueries.queries ++ PqQueries.queries ++ Events.queries ++
        StreamingGates.queries ++
        MultimodalQueries.queries ++ Olap.queries ++ JoinsAndSets.queries ++
        Sketches.queries ++ ScaleOps.queries ++ CorpusSampling.queries ++
        CorpusQuality.queries ++ CorpusPrep.queries ++ Graph.queries ++ Ingestion.queries ++ DataQuality.queries ++
        Behavioral.queries ++ Analytic.queries ++ LayoutQueries.queries ++
        NestedOps.queries ++ LmPipeline.queries ++ LakeOps.queries ++
        HybridRetrieval.queries
    // a duplicate name would silently shadow one implementation in the
    // .toMap below — dropping it from bench, verify, AND the oracle gate
    val dups = qs.groupBy(_.name).collect { case (n, g) if g.size > 1 => n }
    require(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
    qs
  }

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  lazy val oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
