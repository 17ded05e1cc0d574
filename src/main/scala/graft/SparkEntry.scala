package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{Advanced, Parity, Relational}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY §2 (and the training-data
  * extensions) appears here as a named query; `oracleSql` carries the
  * DuckDB twin the driver hash-compares against.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Parity.aggHourly(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // —— parity: CDC / enrichment / windowed aggs / sinks (SURVEY §2) ——
    "q_cdc_parse" -> (Parity.cdcParse _),
    "q_enrich_activity" -> (Parity.enrichActivity _),
    "q_enrich_employee" -> (Parity.enrichEmployee _),
    "q_agg_hourly" -> (Parity.aggHourly _),
    "q_agg_daily" -> (Parity.aggDaily _),
    "q_join_activity_employee" -> (Parity.joinActivityEmployee _),
    "q_union_sources" -> (Parity.unionSources _),
    "q_upsert_precombine" -> (Parity.upsertPrecombine _),
    "q_kafka_roundtrip" -> (Parity.kafkaRoundtrip _),
    // —— general relational capability ——
    "q1_pricing_summary" -> (Relational.pricingSummary _),
    "q3_top_revenue" -> (Relational.topRevenue _),
    "q5_supplier_volume" -> (Relational.supplierVolumeByNation _),
    "q_window_topn" -> (Relational.topOrdersPerCustomer _),
    "q_window_running" -> (Relational.runningSupplierRevenue _),
    "q_semi_join" -> (Relational.semiJoinCustomers _),
    "q_anti_join" -> (Relational.antiJoinCustomers _),
    "q_rollup" -> (Relational.rollupOrders _),
    "q_above_avg" -> (Relational.aboveNationAvgCustomers _),
    "q_intersect" -> (Relational.intersectCustomers _),
    "q_except" -> (Relational.exceptCustomers _),
    "q_sql_q6" -> (Relational.sqlRevenueForecast _),
    "q_sort_merge_join" -> (Relational.sortMergeJoin _),
    "q_cube" -> (Relational.cubeOrders _),
    "q_skew_salted" -> (Advanced.saltedJoin _),
    "q_scalar_funcs" -> (Advanced.scalarFuncs _),
    "q_topk_native" -> (Advanced.topKNative _),
    "q_asof_join" -> (Advanced.asofJoin _),
    "q_percentiles" -> (Advanced.percentiles _),
    "q_pivot" -> (Advanced.pivotEvents _),
    "q_sessionize" -> (Advanced.sessionize _),
    "q_session_window" -> (Advanced.sessionWindow _),
    "q_sliding_window" -> (Advanced.slidingWindow _),
    "q_scd2_intervals" -> (Advanced.scd2Intervals _),
    "q_interval_join" -> (Advanced.intervalJoin _),
    "q_grouping_sets" -> (Relational.groupingSetsOrders _),
    "q_posexplode" -> (Advanced.posexplodeTokens _),
    "q_collection_funcs" -> (Advanced.collectionFuncs _),
    "x_exact_distinct" -> (Advanced.exactDistinct _),
    "x_bounded_pages" -> (Advanced.boundedPages _),
    "x_token_freq" -> (Advanced.tokenFreq _),
    "x_token_freq_mg" -> (Advanced.tokenFreqMg _),
    // —— training-data extensions: text analysis ——
    "x_token_stats" -> (ext.Text.tokenStats _),
    "x_tfidf" -> (ext.Text.tfidf _),
    "x_lang_id" -> (ext.Text.langId _),
    "x_quality" -> (ext.Text.quality _),
    "x_fingerprint" -> (ext.Text.fingerprint _),
    "x_pipeline_sample" -> (ext.Text.pipelineSample _),
    "x_stratified_sample" -> (ext.Text.stratifiedSample _),
    "x_pack_sequences" -> (ext.Text.packSequences _),
    "x_redact" -> (ext.Text.redact _),
    "x_decontaminate" -> (ext.Dedup.decontaminate _),
    // —— training-data extensions: dedup ——
    "x_dedup_exact" -> (ext.Dedup.exact _),
    "x_dedup_bow" -> (ext.Dedup.bagOfWords _),
    "x_dedup_ngram_jaccard" -> (ext.Dedup.ngramJaccard _),
    "x_dedup_minhash_lsh" -> (ext.Dedup.minhashLsh _),
    "x_dedup_simhash" -> (ext.Dedup.simhashPairs _),
    "x_dedup_clusters" -> (ext.Clusters.dedupClusters _),
    "x_dup_spans" -> (ext.Dedup.dupSpans _),
    "x_decontaminate_clean" -> (ext.StreamDecon.cleanCorpus _),
    "x_dedup_incremental" -> (ext.StreamDedup.cleanCorpus _),
    "x_repetition" -> (ext.Text.repetition _),
    "x_kmeans" -> (ext.Clustering.kmeans _),
    "x_knn_label_eval" -> (ext.Clustering.knnLabelEval _),
    "x_quantize_int8" -> (ext.Similarity.quantizeInt8 _),
    // —— training-data extensions: similarity search ——
    "x_ann_bruteforce" -> (ext.Similarity.annBruteForce _),
    "x_embedding_pairs" -> (ext.Similarity.embeddingPairs _),
    "x_ann_lsh" -> (ext.Similarity.annLsh _),
    "x_ann_ivf" -> (ext.Similarity.annIvf _),
    "x_ann_int8" -> (ext.Similarity.annInt8 _),
    "x_dedup_embedding" -> (ext.Similarity.dedupByEmbedding _),
    "x_dedup_embedding_lsh" -> (ext.Similarity.dedupByEmbeddingLsh _),
    // —— training-data extensions: multimodal ——
    "x_media_features" -> (ext.Multimodal.mediaFeatures _),
    "x_media_frames" -> (ext.Multimodal.frameFeatures _)
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q_cdc_parse" -> Parity.cdcParseSql,
    "q_enrich_activity" -> Parity.enrichActivitySql,
    "q_enrich_employee" -> Parity.enrichEmployeeSql,
    "q_agg_hourly" -> Parity.aggHourlySql,
    "q_agg_daily" -> Parity.aggDailySql,
    "q_join_activity_employee" -> Parity.joinActivityEmployeeSql,
    "q_union_sources" -> Parity.unionSourcesSql,
    "q_upsert_precombine" -> Parity.upsertPrecombineSql,
    "q_kafka_roundtrip" -> Parity.kafkaRoundtripSql,
    "q1_pricing_summary" -> Relational.pricingSummarySql,
    "q3_top_revenue" -> Relational.topRevenueSql,
    "q5_supplier_volume" -> Relational.supplierVolumeByNationSql,
    "q_window_topn" -> Relational.topOrdersPerCustomerSql,
    "q_window_running" -> Relational.runningSupplierRevenueSql,
    "q_semi_join" -> Relational.semiJoinCustomersSql,
    "q_anti_join" -> Relational.antiJoinCustomersSql,
    "q_rollup" -> Relational.rollupOrdersSql,
    "q_above_avg" -> Relational.aboveNationAvgCustomersSql,
    "q_intersect" -> Relational.intersectCustomersSql,
    "q_except" -> Relational.exceptCustomersSql,
    "q_sql_q6" -> Relational.sqlRevenueForecastSql,
    "q_sort_merge_join" -> Relational.sortMergeJoinSql,
    "q_cube" -> Relational.cubeOrdersSql,
    "q_skew_salted" -> Advanced.saltedJoinSql,
    "q_scalar_funcs" -> Advanced.scalarFuncsSql,
    "q_topk_native" -> Advanced.topKNativeSql,
    "q_asof_join" -> Advanced.asofJoinSql,
    "q_percentiles" -> Advanced.percentilesSql,
    "q_pivot" -> Advanced.pivotEventsSql,
    "q_sessionize" -> Advanced.sessionizeSql,
    "q_session_window" -> Advanced.sessionWindowSql,
    "q_sliding_window" -> Advanced.slidingWindowSql,
    "q_scd2_intervals" -> Advanced.scd2IntervalsSql,
    "q_interval_join" -> Advanced.intervalJoinSql,
    "q_grouping_sets" -> Relational.groupingSetsOrdersSql,
    "q_posexplode" -> Advanced.posexplodeTokensSql,
    "q_collection_funcs" -> Advanced.collectionFuncsSql,
    "x_exact_distinct" -> Advanced.exactDistinctSql,
    "x_bounded_pages" -> Advanced.boundedPagesSql,
    "x_token_freq" -> Advanced.tokenFreqSql,
    "x_token_freq_mg" -> Advanced.tokenFreqMgSql,
    "x_token_stats" -> ext.Text.tokenStatsSql,
    "x_tfidf" -> ext.Text.tfidfSql,
    "x_lang_id" -> ext.Text.langIdSql,
    "x_quality" -> ext.Text.qualitySql,
    "x_fingerprint" -> ext.Text.fingerprintSql,
    "x_pipeline_sample" -> ext.Text.pipelineSampleSql,
    "x_stratified_sample" -> ext.Text.stratifiedSampleSql,
    "x_pack_sequences" -> ext.Text.packSequencesSql,
    "x_redact" -> ext.Text.redactSql,
    "x_decontaminate" -> ext.Dedup.decontaminateSql,
    "x_dedup_exact" -> ext.Dedup.exactSql,
    "x_dedup_bow" -> ext.Dedup.bagOfWordsSql,
    "x_dedup_ngram_jaccard" -> ext.Dedup.ngramJaccardSql,
    "x_dedup_minhash_lsh" -> ext.Dedup.minhashLshSql,
    "x_dedup_simhash" -> ext.Dedup.simhashPairsSql,
    "x_dedup_clusters" -> ext.Clusters.dedupClustersSql,
    "x_dup_spans" -> ext.Dedup.dupSpansSql,
    "x_decontaminate_clean" -> ext.StreamDecon.cleanCorpusSql,
    "x_dedup_incremental" -> ext.StreamDedup.cleanCorpusSql,
    "x_repetition" -> ext.Text.repetitionSql,
    "x_kmeans" -> ext.Clustering.kmeansSql,
    "x_knn_label_eval" -> ext.Clustering.knnLabelEvalSql,
    "x_quantize_int8" -> ext.Similarity.quantizeInt8Sql,
    "x_ann_bruteforce" -> ext.Similarity.annBruteForceSql,
    "x_embedding_pairs" -> ext.Similarity.embeddingPairsSql,
    "x_ann_lsh" -> ext.Similarity.annLshSql,
    "x_ann_ivf" -> ext.Similarity.annIvfSql,
    "x_ann_int8" -> ext.Similarity.annInt8Sql,
    "x_dedup_embedding" -> ext.Similarity.dedupByEmbeddingSql,
    "x_dedup_embedding_lsh" -> ext.Similarity.dedupByEmbeddingLshSql,
    "x_media_features" -> ext.Multimodal.mediaFeaturesSql,
    "x_media_frames" -> ext.Multimodal.frameFeaturesSql
  )
}
