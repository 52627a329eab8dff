import graft.queries.Registry
import java.nio.file.{Files, Paths}
// Harmless with timestamp[us] testdata; lets Tables.events' legacy
// TIMESTAMP(NANOS) branch work if run against an old generation.
spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
val sb = new StringBuilder
sb ++= "# PLANS - physical-plan audit (generated against sf0.01)\n\n"
sb ++= "Evidence that the flagship plans are the plans we want: filters\n"
sb ++= "pushed into the parquet scan, columns pruned, dimensions broadcast,\n"
sb ++= "top-k via TakeOrderedAndProject, no shuffle joins where a broadcast\n"
sb ++= "fits. Regenerate with tools/plans.sc.\n\n"
for (q <- Seq("q01_pricing_summary","q03_shipping_priority","q05_region_revenue",
              "topk_orders","dedup_minhash_lsh","dedup_embedding_lsh","dedup_jaccard_blocked","events_asof_orders","orders_above_cust_avg","q10_returned_items","multimodal_features",
              "ann_ivf_topk","events_session_window",
              "dedup_simhash","q04_late_shipments","range_join_events_orders",
              "cheapest_order_per_cust","custkeys_except","olap_cube_orders",
              "kmv_distinct_parts","q19_mixed_predicates","q21_waiting_suppliers",
              "q22_idle_customers","skew_salted_join","bucket_pruned_orders",
              "binary_ingest","q07_nation_volume","q08_market_share",
              "q09_profit_by_nation","q13_order_counts","q15_top_supplier",
              "q17_small_quantity","q20_excess_shippers","q02_min_cost_supplier",
              "q11_important_parts","q16_supplier_counts",
              "corpus_stratified_sample","corpus_domain_mix","corpus_split_stats",
              "vocab_topk","tfidf_keywords","unigram_quality","pii_redact",
              "substring_dedup","incremental_ingest","kmeans_train","ann_ivf_trained_topk",
              "events_sliding_hourly","orders_price_deciles","nation_pagerank",
              "jsonl_ingest","csv_ingest","price_quantiles_sampled","data_quality_audit","column_profile",
              "funnel_steps","retention_cohorts","cdc_latest_state","scd2_order_priority",
              "fuzzy_name_pairs","fuzzy_name_clusters",
              "gapfill_daily_revenue","anomaly_orders","price_histogram",
              "bloom_pruned_join",
              "rolling_7d_revenue","window_rank_suite","triangle_count",
              "bm25_rank","merge_upsert_orders","unpivot_revenue",
              "median_mode_by_priority","heavy_hitters_events",
              "weighted_sample_docs","mv_incremental_refresh","topk_agg_per_priority",
              "a_financial_union","ann_ivf_recall","decontaminate_overlap",
              "text_nfc_normalize","calk_sectionizer","pdf_cid_sectionizer",
              "ann_pq_adc_topk","ann_ivfpq_topk","dedup_pq_codes",
              "pdf_table_cells","pdf_table_extract",
              "chunk_dedup_docs","bigram_lm_quality","dsir_importance_weights",
              "orc_ingest","schema_drift_union","compact_small_files",
              "pdf_dsv2_sectionizer","xlsx_dsv2_info_lookup",
              "ids_rule_orders","ann_int8_topk","file_provenance",
              "dedup_semantic_kmeans","avro_ingest","corpus_quality_rules",
              "quality_classifier_score","rag_chunk_overlap","bpe_pair_counts",
              "rag_retrieve_e2e","bpe_apply_merge","bpe_train_merges",
              "bpe_compression_by_source","corpus_temperature_mix",
              "dedup_minhash_strict","dedup_lsh_keeper","hybrid_rrf_retrieval",
              "streaming_quality_filter","ccnet_perplexity_buckets")) {
  val plan = Registry.queries(q)(spark, "/root/testdata/sf0.01").queryExecution.executedPlan.toString
  def n(p: String) = p.r.findAllIn(plan).length
  sb ++= s"## $q\n\n"
  sb ++= s"- BroadcastHashJoin: ${n("BroadcastHashJoin")}, SortMergeJoin: ${n("SortMergeJoin")}, ShuffledHashJoin: ${n("ShuffledHashJoin")}, BroadcastNestedLoopJoin: ${n("BroadcastNestedLoopJoin")}\n"
  sb ++= s"- ShuffleExchanges: ${n("Exchange (hash|range|Single)")}, BroadcastExchanges: ${n("BroadcastExchange")}, TakeOrderedAndProject: ${n("TakeOrderedAndProject")}\n"
  val pf = "PushedFilters: \\[[^\\]]*\\]".r.findAllIn(plan).toList.distinct.take(3)
  if (pf.nonEmpty) sb ++= pf.map(f => s"- $f").mkString("", "\n", "\n")
  val rs = "ReadSchema: struct<[^>]*>".r.findAllIn(plan).toList.distinct.take(3)
  if (rs.nonEmpty) sb ++= rs.map(r => s"- ${r.take(180)}").mkString("", "\n", "\n")
  val bk = "SelectedBucketsCount: [^,\\n]*".r.findAllIn(plan).toList.distinct
  if (bk.nonEmpty) sb ++= bk.map(b => s"- $b").mkString("", "\n", "\n")
  sb ++= "\n"
}
Files.writeString(Paths.get("/root/repo/PLANS.md"), sb.toString)
println("WROTE PLANS.md")
sys.exit(0)
