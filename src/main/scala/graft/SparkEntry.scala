package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (and the beyond-reference
  * M6 set) gets a `queries` entry; SQL-expressible ones get a DuckDB
  * `oracleSql` twin with IDENTICAL output column names.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Tpch.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> ((s, d) => Tpch.q1PricingSummary(s, d)),
    "silver_clean" -> ((s, d) => Silver.qClean(s, d)),
    "silver_enrich" -> ((s, d) => Silver.qEnrich(s, d)),
    "silver_daily_agg" -> ((s, d) => Silver.qDailyAgg(s, d)),
    "silver_hourly_agg" -> ((s, d) => Silver.qHourlyAgg(s, d)),
    "serving_latest_per_user" -> ((s, d) => Serving.qLatestPerUser(s, d)),
    "serving_weekly" -> ((s, d) => Serving.qWeeklyStats(s, d)),
    "serving_day_night" -> ((s, d) => Serving.qDayNight(s, d)),
    "quality_dup_scan" -> ((s, d) => Serving.qDupScan(s, d)),
    "quality_null_scan" -> ((s, d) => Serving.qNullScan(s, d)),
    "stats_union" -> ((s, d) => Serving.qStatsUnion(s, d)),
    "q3_shipping_priority" -> ((s, d) => Tpch.q3ShippingPriority(s, d)),
    "q5_local_supplier" -> ((s, d) => Tpch.q5LocalSupplier(s, d)),
    "join_brand_revenue" -> ((s, d) => Joins.qBrandRevenue(s, d)),
    "join_segment_sales" -> ((s, d) => Joins.qSegmentSales(s, d)),
    "join_semi_active_customers" -> ((s, d) => Joins.qActiveCustomers(s, d)),
    "join_anti_dormant_customers" -> ((s, d) => Joins.qDormantCustomers(s, d)),
    "window_top_orders_per_customer" -> ((s, d) => Joins.qTopOrdersPerCustomer(s, d)),
    "topk_orders" -> ((s, d) => Joins.qTop10Orders(s, d)),
    "text_stats" -> ((s, d) => TextAnalysis.qTextStats(s, d)),
    "text_lang_id" -> ((s, d) => TextAnalysis.qLangId(s, d)),
    "text_fingerprint" -> ((s, d) => TextAnalysis.qFingerprint(s, d)),
    "dedup_exact" -> ((s, d) => Dedup.qDedupExact(s, d)),
    "dedup_ngram_jaccard" -> ((s, d) => Dedup.qNgramJaccard(s, d)),
    "dedup_minhash_lsh" -> ((s, d) => Dedup.qMinhashLsh(s, d)),
    "dedup_simhash_pairs" -> ((s, d) => Dedup.qSimhashPairs(s, d)),
    "sim_cosine_topk" -> ((s, d) => Similarity.qCosineTopK(s, d)),
    // bounded-oracle subset twin: bench-scale driver evidence for the
    // brute-force composition the full variant can only gate at sf0.01
    "sim_cosine_topk_subset" -> ((s, d) => Similarity.qCosineTopKSubset(s, d)),
    "sim_lsh_topk" -> ((s, d) => Similarity.qLshTopK(s, d)),
    "sessionize_batch" -> ((s, d) =>
      graft.streaming.StreamingOps.sessionizeBatch(Tables.events(s, d))
        .orderBy(org.apache.spark.sql.functions.col("user_id"),
          org.apache.spark.sql.functions.col("session_start"))),
    "multimodal_features" -> ((s, d) => Multimodal.qMultimodalFeatures(s, d)),
    "multimodal_decode" -> ((s, d) => Multimodal.qMultimodalDecode(s, d)),
    // real multi-frame decode: every-2nd-frame sampling through the
    // JDK's animated-GIF codec (mp4 stays env-bound hash-fallback)
    "multimodal_frame_sample" -> ((s, d) => Multimodal.qMultimodalFrameSample(s, d)),
    "classify_lang_nb" -> ((s, d) => Classify.qClassifyLang(s, d)),
    // chance-corrected agreement (exact integer rational; the
    // imbalance-robust one-number twin of the confusion matrix)
    "classify_cohens_kappa" -> ((s, d) => Classify.qClassifyKappa(s, d)),
    // margin-decile reliability table (does margin predict accuracy?)
    "classify_calibration" -> ((s, d) => Classify.qClassifyCalibration(s, d)),
    "gapfill_hourly" -> ((s, d) => Temporal.qGapFillHourly(s, d)),
    "funnel_view_click_purchase" -> ((s, d) => Temporal.qEventFunnel(s, d)),
    "entity_edit_pairs" -> ((s, d) => Entity.qCustomerEditPairs(s, d)),
    "anomaly_rolling_z" -> ((s, d) => Temporal.qRollingAnomalies(s, d)),
    "asof_events_orders" -> ((s, d) => AsOf.qEventsAsofOrdersDeterministic(s, d)),
    "sim_cosine_topk_native" -> ((s, d) => Similarity.qCosineTopKNative(s, d)),
    // sparse (lexical) top-k: IDF-weighted shingle cosine — the
    // sparse-vector complement of the dense ANN family
    "sim_sparse_topk" -> ((s, d) => SparseSim.qSparseTopK(s, d)),
    // query batch against the persisted inverted index (build amortized)
    "sim_sparse_serving_topk" -> ((s, d) => SparseSim.qSparseTopKServing(s, d)),
    // leakage-safe split: near-dup cluster members share one split
    "corpus_split_leakage_safe" -> ((s, d) => SafeSplit.qClusterSafeSplit(s, d)),
    // per-doc novelty vs the train vocabulary — the data-selection signal
    "text_novelty_vs_train" -> ((s, d) => Novelty.qNoveltyVsTrain(s, d)),
    // erasure propagated to every derived serving artifact, with the
    // compliance report oracle-gated (planted fixture, real sweep path)
    "forget_audit" -> ((s, d) => Forget.qForgetAudit(s, d)),
    // repack SEMANTICS hash gate: full post-erasure packed table, in-pack
    // offset closure recomputed independently by the twin
    "forget_packed_repack" -> ((s, d) => Forget.qForgetPackedRepack(s, d)),
    // erasure-impact audit for TRAINED artifacts: per-cell erased mass
    // + retrain flags for IVF/PQ/NB/BPE/DSIR (machine-unlearning gap)
    "forget_model_audit" -> ((s, d) => ModelAudit.qForgetModelAudit(s, d)),
    // act on the flag: erase the subject source, retrain the flagged
    // text models (NB/BPE/DSIR) on the clean corpus, re-audit to zero
    "forget_retrain" -> ((s, d) => ModelAudit.qForgetRetrain(s, d)),
    "forget_retrain_quantizers" -> ((s, d) =>
      ModelAudit.qForgetRetrainQuantizers(s, d)),
    // the opt-in swap: rebuild the IVFPQ serving layout from the
    // chosen post-sweep quantizers, re-audit THROUGH the serving scan
    "forget_retrain_serving" -> ((s, d) =>
      ModelAudit.qForgetRetrainServing(s, d)),
    "sql_weekly" -> ((s, d) => Sql.qWeeklySql(s, d)),
    "sketch_stats" -> ((s, d) => graft.operators.Sketches.qSketchStats(s, d)),
    "subq_above_avg_parts" -> ((s, d) => Advanced.qAboveAvgParts(s, d)),
    "subq_large_orders" -> ((s, d) => Advanced.qLargeOrders(s, d)),
    "subq_not_in_unordered_parts" -> ((s, d) => Advanced.qUnorderedParts(s, d)),
    "agg_rollup_counts" -> ((s, d) => Advanced.qRollupCounts(s, d)),
    "agg_cube_stats" -> ((s, d) => Advanced.qCubeStats(s, d)),
    "pivot_daily_counts" -> ((s, d) => Advanced.qPivotDaily(s, d)),
    "dedup_embedding_cosine" -> ((s, d) => Dedup.qEmbeddingNearDup(s, d)),
    "range_join_followups" -> ((s, d) => Ranged.qEventFollowups(s, d)),
    // approximate vs brute force, but deterministic given the trained
    // (seeded, cached) quantizer → generated full oracle twin
    "sim_ivf_topk" -> ((s, d) => Ivf.qIvfTopK(s, d)),
    "sim_ivf_adaptive_topk" -> ((s, d) => Ivf.qIvfTopKAdaptive(s, d)),
    "setop_intersect" -> ((s, d) => Advanced.qSetIntersect(s, d)),
    "setop_except" -> ((s, d) => Advanced.qSetExcept(s, d)),
    "window_event_deltas" -> ((s, d) => Advanced.qEventDeltas(s, d)),
    // LSH-blocked candidates, deterministic planes → full oracle twin
    "dedup_embedding_lsh" -> ((s, d) => Dedup.qEmbeddingNearDupLsh(s, d)),
    "q4_order_priority" -> ((s, d) => Tpch.q4OrderPriority(s, d)),
    "q10_returned_items" -> ((s, d) => Tpch.q10ReturnedItems(s, d)),
    "text_winnowing_overlap" -> ((s, d) => TextAnalysis.qWinnowingOverlap(s, d)),
    "dedup_clusters" -> ((s, d) => Dedup.qDedupClusters(s, d)),
    "text_top_ngrams" -> ((s, d) => TextAnalysis.qTopNgrams(s, d)),
    "text_top_terms" -> ((s, d) => TextAnalysis.qTopTerms(s, d)),
    "corpus_split" -> ((s, d) => TextAnalysis.qCorpusSplit(s, d)),
    "dedup_contamination" -> ((s, d) => TextAnalysis.qContamination(s, d)),
    "q6_forecast_revenue" -> ((s, d) => Tpch.q6ForecastRevenue(s, d)),
    "q14_promo_revenue" -> ((s, d) => Tpch.q14PromoRevenue(s, d)),
    "q15_top_supplier" -> ((s, d) => Tpch.q15TopSupplier(s, d)),
    "q19_bracket_revenue" -> ((s, d) => Tpch.q19BracketRevenue(s, d)),
    "q22_dormant_balance" -> ((s, d) => Tpch.q22DormantBalance(s, d)),
    "q2_min_cost_supplier" -> ((s, d) => TpchDeep.q2MinCostSupplier(s, d)),
    "q7_volume_shipping" -> ((s, d) => TpchDeep.q7VolumeShipping(s, d)),
    "q8_market_share" -> ((s, d) => TpchDeep.q8MarketShare(s, d)),
    "q9_product_profit" -> ((s, d) => TpchDeep.q9ProductProfit(s, d)),
    "q12_late_lines" -> ((s, d) => TpchDeep.q12LateLines(s, d)),
    "curation_pii_scrub" -> ((s, d) => Curation.qPiiScrub(s, d)),
    // checksum-validated card scrub: only Luhn-valid 16-digit runs
    // rewrite (false-positive guard a bare regex scrub lacks)
    "curation_pii_luhn" -> ((s, d) => Curation.qPiiLuhn(s, d)),
    "curation_repetition" -> ((s, d) => Curation.qRepetition(s, d)),
    "curation_stratified_sample" -> ((s, d) => Curation.qStratifiedSample(s, d)),
    "curation_seq_pack" -> ((s, d) => Curation.qSeqPack(s, d)),
    "curation_pack_manifest" -> ((s, d) => Curation.qPackManifest(s, d)),
    "curation_filter_funnel" -> ((s, d) => Curation.qFilterFunnel(s, d)),
    "curation_source_cap" -> ((s, d) => Curation.qSourceCap(s, d)),
    "curation_source_mix" -> ((s, d) => Curation.qSourceMix(s, d)),
    "curation_source_mix_tokens" -> ((s, d) => Curation.qSourceMixTokens(s, d)),
    "curation_corpus_diff" -> ((s, d) => Curation.qCorpusDiff(s, d)),
    "curation_budget_select" -> ((s, d) => Curation.qBudgetSelect(s, d)),
    "q13_cust_dist" -> ((s, d) => TpchMore.q13CustDist(s, d)),
    "q16_supplier_cnt" -> ((s, d) => TpchMore.q16SupplierCnt(s, d)),
    "q17_small_qty_revenue" -> ((s, d) => TpchMore.q17SmallQtyRevenue(s, d)),
    "q18_large_orders" -> ((s, d) => TpchMore.q18LargeOrders(s, d)),
    // Q18 over the shared orderkey-bucketed fact layout: zero orderkey
    // exchange (the per-order agg rides the layout's partitioning)
    "tpch_q18_bucketed" -> ((s, d) => graft.operators.Scale.q18Bucketed(s, d)),
    "q20_qualified_suppliers" -> ((s, d) => TpchMore.q20QualifiedSuppliers(s, d)),
    "q21_waiting_suppliers" -> ((s, d) => TpchMore.q21WaitingSuppliers(s, d)),
    "q11_important_stock" -> ((s, d) => TpchMore.q11ImportantStock(s, d)),
    "profile_events" -> ((s, d) => Advanced.qProfileEvents(s, d)),
    "agg_percentiles" -> ((s, d) => Advanced.qPercentiles(s, d)),
    "window_range_frame" -> ((s, d) => Advanced.qRangeFrame(s, d)),
    "unpivot_daily" -> ((s, d) => Advanced.qUnpivotDaily(s, d)),
    "window_value_bounds" -> ((s, d) => Advanced.qValueBounds(s, d)),
    "agg_grouping_sets" -> ((s, d) => Advanced.qGroupingSets(s, d)),
    // bitext mining: best pivot-language neighbor + top1-vs-top2 margin,
    // cross-language LSH blocks only
    "sim_crosslingual_align" -> ((s, d) => Bitext.qCrossLingualAlign(s, d)),
    "dedup_semantic_contamination" -> ((s, d) => Dedup.qSemanticContamination(s, d)),
    "dedup_semantic" -> ((s, d) => Dedup.qSemanticDedup(s, d)),
    "dedup_passages" -> ((s, d) => Passages.qPassageDedup(s, d)),
    "bm25_topk" -> ((s, d) => Retrieval.qBm25TopK(s, d)),
    "scd2_history" -> ((s, d) => Scd.qScd2History(s, d)),
    "scd2_apply" -> ((s, d) => Scd.qScd2Apply(s, d)),
    "dedup_incremental" -> ((s, d) => IncrementalDedup.qIncrementalDedup(s, d)),
    "bloom_semi_join" -> ((s, d) => Scale.qBloomSemiJoin(s, d)),
    // PQ ANN: sampled-kmeans codebooks, deterministic + cached →
    // generated full oracle twins (plus recall/compression specs)
    "sim_pq_topk" -> ((s, d) => Pq.qPqTopK(s, d)),
    "sim_ivfpq_topk" -> ((s, d) => Pq.qIvfPqTopK(s, d)),
    // persisted-index serving paths: build once per dataset (amortized
    // like a production index build), measured queries scan the codes /
    // pruned cell partitions only
    "sim_pq_serving_topk" -> ((s, d) => Pq.qPqTopKServing(s, d)),
    // IVFPQ against the persisted cell-partitioned code table: partition
    // pruning × 32× compression multiply at the scan (the 100 TB shape)
    "sim_ivfpq_serving_topk" -> ((s, d) => Pq.qIvfPqTopKServing(s, d)),
    "sim_ivf_clustered_topk" -> ((s, d) => Ivf.qIvfTopKClustered(s, d)),
    "agg_incremental_merge" -> ((s, d) => Rollup.qIncrementalRollup(s, d)),
    "text_normalize" -> ((s, d) => TextAnalysis.qTextNormalize(s, d)),
    "curation_chunks" -> ((s, d) => Passages.qChunks(s, d)),
    "curation_length_batching" -> ((s, d) => Batching.qLengthBatches(s, d)),
    "embed_quantize_stats" -> ((s, d) => Quant.qQuantizeStats(s, d)),
    "sim_quantized_topk" -> ((s, d) => Quant.qQuantizedTopK(s, d)),
    "sim_int8_topk" -> ((s, d) => Quant.qInt8TopK(s, d)),
    "text_lm_score" -> ((s, d) => TextAnalysis.qLmScore(s, d)),
    // keep-curve over the lm score: docs/token mass at every threshold
    "curation_quality_curve" -> ((s, d) => QualityCurve.qLmScoreCurve(s, d)),
    "dedup_overlap_estimate" -> ((s, d) => Overlap.qOverlapEstimate(s, d)),
    // trained BPE subword tokenizer applied corpus-wide (native expr)
    "tokenize_bpe" -> ((s, d) => Tokenize.qTokenize(s, d)),
    // changelog fold + incremental CDC merge (apply ≡ rebuild)
    "cdc_build_state" -> ((s, d) => Cdc.qCdcBuild(s, d)),
    "cdc_apply_state" -> ((s, d) => Cdc.qCdcApply(s, d)),
    // persisted inverted-index serving path (index built once per
    // dataset, amortized; shares the inline bm25 oracle)
    "bm25_serving_topk" -> ((s, d) => Retrieval.qBm25Serving(s, d)),
    // one-pass declarative data-quality contract over the events stream
    "quality_expectations" -> ((s, d) => Expectations.qExpectations(s, d)),
    // size-weighted Bernoulli sample with Horvitz-Thompson weights
    "curation_weighted_sample" -> ((s, d) => Sampling.qWeightedSample(s, d)),
    // fixed-bucket histogram drift between baseline and current windows
    "monitor_value_drift" -> ((s, d) => Monitor.qValueDrift(s, d)),
    // Misra-Gries candidates + exact recount: bounded-state exact top-k
    "text_heavy_hitters" -> ((s, d) => TextAnalysis.qHeavyHitters(s, d)),
    // leakage-aware split: contaminated train docs quarantined at split time
    "corpus_split_decontaminated" -> ((s, d) => TextAnalysis.qDecontaminatedSplit(s, d)),
    // chain-dependent per-key rate limiting (recursive-CTE twin)
    "debounce_events" -> ((s, d) => Temporal.qDebounce(s, d)),
    // real WAV decode + DFT: detected peak must equal the generated bin
    "multimodal_spectral" -> ((s, d) => Multimodal.qMultimodalSpectral(s, d)),
    // real PNG decode + deterministic NN resize to a fixed tile
    "multimodal_resize" -> ((s, d) => Multimodal.qMultimodalResize(s, d)),
    // weekly cohort retention table (first-seen cohorts × week offsets)
    "cohort_retention" -> ((s, d) => Temporal.qCohortRetention(s, d)),
    // first-view → first-purchase latency percentiles (exact interp.)
    "conversion_latency" -> ((s, d) => Temporal.qConversionLatency(s, d)),
    // crawl-front-door ops: markup boilerplate extraction (map-only) and
    // two-level domain-reputation admission (control-plane agg)
    "text_html_extract" -> ((s, d) => WebText.qHtmlExtract(s, d)),
    "curation_domain_reputation" -> ((s, d) => WebText.qDomainReputation(s, d)),
    // exact fixed-point PageRank over the purchase graph (BIGINT ranks)
    "graph_pagerank" -> ((s, d) => Graph.qPageRank(s, d)),
    // hashing-trick TF-IDF features (bounded width, integer idf)
    "text_hashed_tfidf" -> ((s, d) => Features.qHashedTfIdf(s, d)),
    // full-outer per-day placements-vs-shipments reconciliation
    "join_full_outer_recon" -> ((s, d) => Joins.qDailyReconciliation(s, d)),
    // k-means corpus clustering (generated inlined-centroid twin)
    "cluster_kmeans" -> ((s, d) => Ivf.qKmeansClusters(s, d)),
    // topic balance: per-k-means-cell caps over the frozen quantizer
    "curation_cluster_balance" -> ((s, d) => Rebalance.qClusterBalance(s, d)),
    // α=1/2 temperature rebalance by language (integer-exact quotas)
    "curation_mix_temperature" -> ((s, d) => Rebalance.qMixTemperature(s, d)),
    // the same rebalance in TOKEN space (the unit mixtures are specified in)
    "curation_mix_temperature_tokens" -> ((s, d) => Rebalance.qMixTemperatureTokens(s, d)),
    // tokenizer fertility table by language (tokens/word, chars/token)
    "text_fertility_by_lang" -> ((s, d) => Fertility.qFertilityByLang(s, d)),
    // TV distance of each source's unigram distribution vs the corpus
    "text_source_divergence" -> ((s, d) => Divergence.qSourceDivergence(s, d)),
    // pairwise source vocabulary Jaccard (redundancy map)
    "text_vocab_overlap" -> ((s, d) => Divergence.qVocabOverlap(s, d)),
    // golden-record consolidation (match → closure → survivorship)
    "entity_golden_record" -> ((s, d) => Entity.qGoldenRecords(s, d)),
    // degree-ordered triangle counting over the co-purchase graph
    "graph_triangles" -> ((s, d) => Graph.qTriangles(s, d)),
    // optimizer statistics: exact vs estimated join cardinalities
    "plan_join_cardinality" -> ((s, d) => Planning.qJoinCardinality(s, d)),
    // bounded multi-source BFS reach histogram over the purchase graph
    "graph_bfs_reach" -> ((s, d) => Graph.qBfsReach(s, d)),
    // the graph family over the build-once persisted edge projections
    // (one artifact, two layouts; results identical to the inline pair)
    "graph_pagerank_serving" -> ((s, d) => Graph.qPageRankServing(s, d)),
    "graph_bfs_reach_serving" -> ((s, d) => Graph.qBfsReachServing(s, d)),
    "graph_triangles_serving" -> ((s, d) => Graph.qTrianglesServing(s, d)),
    // exact integer covariance moments over the int8 code domain
    "embed_covariance" -> ((s, d) => Quant.qCodeCovariance(s, d)),
    // the full ANSI ranking-function family over one window
    "window_rank_variants" -> ((s, d) => Advanced.qRankVariants(s, d)),
    // PPJoin-style prefix-filtered exact Jaccard (≡ the exact operator)
    "dedup_jaccard_prefix" -> ((s, d) => Dedup.qJaccardPrefix(s, d)),
    // zero-order-hold time-weighted average, exact integer cents
    "temporal_time_weighted_avg" -> ((s, d) => Temporal.qTimeWeightedAvg(s, d)),
    // hopping (sliding) window aggregate — the batch twin of a live hop
    "window_hopping_agg" -> ((s, d) => Temporal.qHoppingAgg(s, d)),
    // suffix-dedup granularity: every duplicated ≥8-word run removed at
    // all but its first corpus occurrence (stride-1 window keys)
    "dedup_substring_spans" -> ((s, d) => Spans.qSubstringSpans(s, d)),
    // explicit shard→merge moments state (skew/kurtosis from merged sums)
    "stats_moments_merge" -> ((s, d) => Moments.qMomentsMerge(s, d)),
    // quintile RFM customer segmentation over the orders fact
    "serving_rfm" -> ((s, d) => Rfm.qRfm(s, d)),
    // positional-index consecutive-phrase search (top corpus trigram)
    "retrieval_phrase" -> ((s, d) => Phrase.qPhraseSearch(s, d)),
    // SCD2 time travel: dimension state as of a fixed instant
    "scd2_asof" -> ((s, d) => Scd.qScd2Asof(s, d)),
    // JL random-projection coarse search + exact cosine re-rank
    "sim_rp_topk" -> ((s, d) => Rp.qRpTopK(s, d)),
    // trained PCA projection (sampled covariance + Jacobi, map-only apply)
    "embed_pca_project" -> ((s, d) => Pca.qPcaProject(s, d)),
    // RAKE keyword extraction (stopword-free runs, deg/freq scoring)
    "text_rake_keywords" -> ((s, d) => Rake.qRakeKeywords(s, d)),
    // SCD2 point-in-time join via union-ordering (no inequality join)
    "scd2_pit_join" -> ((s, d) => Pit.qPitJoin(s, d)),
    // exact percentile_disc from distributed ranks (no global sort)
    "agg_quantiles_scalable" -> ((s, d) => Quantiles.qQuantilesScalable(s, d)),
    // contrastive hard negatives: nearest different-label vectors
    "sim_hard_negatives" -> ((s, d) => Pairs.qHardNegatives(s, d)),
    // deterministic per-epoch corpus shuffle (no RNG, no global sort)
    "curation_epoch_shuffle" -> ((s, d) => Pairs.qEpochShuffle(s, d)),
    // PMI-ranked collocations (integer surrogate, association not count)
    "text_pmi_bigrams" -> ((s, d) => Colloc.qPmiBigrams(s, d)),
    // content-defined chunking: shift-robust rolling-hash boundaries
    "curation_cdc_chunks" -> ((s, d) => CdcChunks.qCdcChunks(s, d)),
    // inverse-frequency class weights for loss balancing
    "curation_class_weights" -> ((s, d) => CdcChunks.qClassWeights(s, d)),
    // first-order Markov transition matrix over per-user event streams
    "temporal_transitions" -> ((s, d) => Transitions.qTransitions(s, d)),
    // Tukey fences from exact no-sort quartiles + per-type violations
    "quality_outlier_fences" -> ((s, d) => Transitions.qOutlierFences(s, d)),
    // persisted-projection RP serving: narrow coarse scan + late fetch
    "sim_rp_serving_topk" -> ((s, d) => Rp.qRpTopKServing(s, d)),
    // last-touch attribution via the union-ordering trick (no theta join)
    "temporal_attribution" -> ((s, d) => Attribution.qAttribution(s, d)),
    // perceptual image hash (aHash) over the real PNG decode path
    "multimodal_ahash" -> ((s, d) => Multimodal.qMultimodalAhash(s, d)),
    // image near-dup pairs: banded aHash join + exact Hamming verify
    "multimodal_ahash_pairs" -> ((s, d) => Multimodal.qMultimodalAhashPairs(s, d)),
    // per-type exact five-number summary (partitioned quartile ranks)
    "profile_boxplot" -> ((s, d) => Mining.qBoxplot(s, d)),
    // market-basket association rules over (user, day) baskets
    "mining_assoc_rules" -> ((s, d) => Mining.qAssocRules(s, d)),
    // daily new/active/cumulative users (running distinct for free)
    "serving_user_growth" -> ((s, d) => Growth.qUserGrowth(s, d)),
    // exact percentile-rank feature transform (no global sort)
    "feature_rank_normalize" -> ((s, d) => Growth.qRankNormalize(s, d)),
    // one-row dataset-card stats block (all exact ints / milli ratios)
    "curation_dataset_card" -> ((s, d) => DatasetCard.qDatasetCard(s, d)),
    // Heaps-law vocabulary growth (running distinct via first-bucket)
    "text_vocab_growth" -> ((s, d) => DatasetCard.qVocabGrowth(s, d)),
    // cross-table FK audit (anti-join orphan scan per relationship)
    "quality_referential" -> ((s, d) => Integrity.qReferential(s, d)),
    // per-user consecutive-day streaks (gaps and islands)
    "temporal_streaks" -> ((s, d) => Integrity.qStreaks(s, d)),
    // customer-cohort LTV triangle (first-order-year × order-year)
    "serving_cohort_ltv" -> ((s, d) => Ltv.qCohortLtv(s, d)),
    // weekly revenue with exact week-over-week delta surrogate
    "window_period_change" -> ((s, d) => Ltv.qWeeklyChange(s, d)),
    // top session-opening event paths (whole-prefix sequence counts)
    "mining_top_paths" -> ((s, d) => Paths.qTopPaths(s, d)),
    // log2-bucketed degree distribution (graph-skew diagnostic)
    "graph_degree_distribution" -> ((s, d) => Paths.qDegreeDistribution(s, d)),
    // duplicate-image group report (survivor selection's input)
    "multimodal_dup_groups" -> ((s, d) => Multimodal.qMultimodalDupGroups(s, d)),
    // supplier Pareto: exact cumulative revenue share in basis points
    "serving_supplier_pareto" -> ((s, d) => Pareto.qSupplierPareto(s, d)),
    // open-order aging buckets at a deterministic as-of instant
    "serving_order_aging" -> ((s, d) => Pareto.qOrderAging(s, d)),
    // persisted positional-index phrase serving (pruned term reads)
    "retrieval_phrase_serving" -> ((s, d) => Phrase.qPhraseSearchServing(s, d)),
    // source-interleaved deterministic training order
    "curation_interleave" -> ((s, d) => Pairs.qInterleave(s, d)),
    // trained-classifier confusion matrix vs the labeled lang column
    "classify_confusion" -> ((s, d) => Classify.qClassifyConfusion(s, d)),
    // DSIR-style importance-weighted domain selection (hashed features,
    // integer log2-bucket weights)
    "curation_dsir_select" -> ((s, d) => Dsir.qDsirSelect(s, d)),
    // mergeable integer sufficient statistics → corr/slope/intercept
    "stats_corr_regression" -> ((s, d) => Corr.qCorrRegression(s, d)),
    // pinned-schema pivot and its lossless stack round-trip
    "agg_pivot_priority" -> ((s, d) => Pivot.qOrderPriorityPivot(s, d)),
    "agg_unpivot_priority" -> ((s, d) => Pivot.qOrderPriorityUnpivot(s, d)),
    // sequential level-shift detector (integer CUSUM recurrence)
    "anomaly_cusum_hourly" -> ((s, d) => Cusum.qHourlyCusum(s, d)),
    // trained closed-form OLS (exact integer normal equations)
    "regress_order_total" -> ((s, d) => Regress.qRegressOrderTotal(s, d)),
    // runtime-pruned star join over the date-partitioned serving layout
    "serving_dpp_revenue" -> ((s, d) => Dpp.qRevenueByYearDpp(s, d)),
    // landing-format round trips gated against the parquet ground truth
    "source_csv_roundtrip" ->
      ((s, d) => graft.sources.TextFormats.qCsvRoundtrip(s, d)),
    "source_jsonl_roundtrip" ->
      ((s, d) => graft.sources.TextFormats.qJsonlRoundtrip(s, d)),
    // categorical independence test, exact cross-multiplied deviations
    "stats_chi2_weekend" -> ((s, d) => Chi2.qWeekendIndependence(s, d)),
    // diversity re-ranking over the retrieval pool (greedy MMR)
    "sim_mmr_rerank" -> ((s, d) => Mmr.qMmrRerank(s, d)),
    // item-to-item co-purchase similarity (ranked by exact cosine²)
    "mining_item_similarity" -> ((s, d) => Reco.qItemSimilarity(s, d)),
    // quantile-bucket (equi-depth) histograms per event type
    "profile_equidepth" -> ((s, d) => Profile.qEquiDepth(s, d)),
    // order→ship latency SLA rollup with exact selection-rank p50/p90
    "serving_ship_latency" -> ((s, d) => Profile.qShipLatency(s, d)),
    // reciprocal-rank fusion of BM25 and term-frequency retrieval legs
    "retrieval_hybrid_rrf" -> ((s, d) => Fusion.qHybridRrf(s, d)),
    // boundary-sweep peak concurrency (no interval self-join)
    "temporal_concurrency" -> ((s, d) => Sweep.qPeakConcurrency(s, d)),
    // seasonal-naive forecast backtest (MASE vs the naive-1 baseline)
    "forecast_backtest_mase" -> ((s, d) => Sweep.qForecastBacktest(s, d)),
    // zero-training k-NN label prediction + label-noise probe
    "classify_knn_embeddings" -> ((s, d) => Knn.qKnnPredict(s, d)),
    // day-N retention per first-seen cohort
    "serving_retention_matrix" -> ((s, d) => Retention.qRetentionMatrix(s, d)),
    // cross-source quantile normalization by exact rank selection
    "feature_quantile_normalize" -> ((s, d) => QuantNorm.qQuantileNormalize(s, d)),
    // exact weighted quartiles (weights = quantities, integer selection)
    "agg_weighted_median" -> ((s, d) => WeightedMedian.qWeightedQuartiles(s, d)),
    // per-type daily OLS trend slopes from exact paired moments
    "stats_trend_by_type" -> ((s, d) => Trend.qDailyTrend(s, d)),
    // hierarchical percent-of-parent revenue shares (region→nation)
    "agg_share_of_parent" -> ((s, d) => Trend.qShareOfParent(s, d)),
    // duplicate-aware loss weights (down-weight, don't drop)
    "curation_dup_weights" -> ((s, d) => DupWeights.qDupWeights(s, d)),
    // dedup threshold-sweep trade-off curve from one candidate pass
    "curation_dedup_curve" -> ((s, d) => DedupCurve.qThresholdCurve(s, d)),
    // Morton-curve (z-order) cell mapping — the bit interleave the
    // 2-D layout writer sorts by (layout effect spec-measured in
    // ScaleSpec; this gates the mapping arithmetic bit-for-bit)
    "zorder_map" -> ((s, d) => Zorder.qZorderMap(s, d)),
    // 2-D Pareto frontier via distributed prefix-max (no n² anti-join)
    "skyline_parts" -> ((s, d) => Skyline.qPartSkyline(s, d)),
    // brand-blocked Jaro–Winkler name variants on the native codegen'd
    // kernel (length-implication prefilter before any O(l²) scoring)
    "entity_jarowinkler" -> ((s, d) => Entity.qPartJaroWinkler(s, d)),
    // exact integer lag-polynomial EWMA baseline + spike flags
    "anomaly_ewma_daily" -> ((s, d) => Ewma.qEwmaDaily(s, d)),
    // per-cluster survivorship verdict (longest wins) over the CC map
    "dedup_canonical" -> ((s, d) => Dedup.qDedupCanonical(s, d)),
    // HITS hubs/authorities, integer L1-normalized (no sqrt/libm)
    "graph_hits" -> ((s, d) => Graph.qHits(s, d)),
    // HITS from the settled directed-edge layout, scores broadcast
    "graph_hits_serving" -> ((s, d) => Graph.qHitsServing(s, d)),
    // seed-restart PageRank on the bucketed layout (exchange-free)
    "graph_ppr_serving" -> ((s, d) => Graph.qPprServing(s, d)),
    // exact integer two-sample KS distance (distribution drift test)
    "stats_ks_value" -> ((s, d) => Ks.qKsValueByType(s, d)),
    // rank-based dominance test next to KS; U/(n1*n2) doubles as the
    // value's AUC as a cohort separator (exact doubled midranks)
    "stats_mwu_value" -> ((s, d) => Ks.qMwuValueByType(s, d)),
    // clamp to exact per-type [p05, p95] (the robust-feature TRANSFORM
    // next to the outlier FLAGS; rank selection, no float arithmetic)
    "feature_winsorize" -> ((s, d) => QuantNorm.qWinsorize(s, d)),
    // distance-2 FastSS reconciliation pairs (nation-blocked)
    "entity_edit2_pairs" -> ((s, d) => Entity.qCustomerEdit2Pairs(s, d)),
    // the same pair set served from the persisted FastSS-2 signature
    // index (key generation paid once at build; shares the brute twin)
    "entity_edit2_serving" -> ((s, d) => Entity.qCustomerEdit2PairsServing(s, d)),
    // exact ROC AUC via the Mann-Whitney rank statistic, no pair join
    "classify_auc" -> ((s, d) => Auc.qLengthAuc(s, d)),
    // per-nation Gini of customer spend (integer cents + exact ranks)
    "stats_gini_by_nation" -> ((s, d) => Gini.qGiniBySpend(s, d)),
    // grouped exact percentiles on the distributed prefix-sum machinery
    "agg_grouped_quantiles" -> ((s, d) => Quantiles.qQuantilesScalableGrouped(s, d)),
    // exact-proportion per-stratum train/val/test split (audit grain)
    "curation_exact_split" -> ((s, d) => Sampling.qExactSplit(s, d)),
    // exactly-k-per-source deterministic sample (reservoir replacement)
    "curation_exact_k_sample" -> ((s, d) => Sampling.qExactKPerGroup(s, d)),
    // precision/recall operating points from one domain-bounded pass
    "classify_pr_curve" -> ((s, d) => Auc.qLengthPrCurve(s, d)),
    // daily KMV signatures folded to the full-range distinct estimate
    "sketch_kmv_daily_merge" -> ((s, d) => Sketches.qKmvDailyMerge(s, d)),
    // per-nation top-k spenders + reconciling OTHER residual row
    "serving_topk_with_other" -> ((s, d) => Serving.qTopKWithOther(s, d)),
    // rolling 7-day distinct users read from daily KMV signatures
    "sketch_kmv_rolling_distinct" -> ((s, d) => Sketches.qKmvRollingDistinct(s, d)),
    // 5%-trimmed mean per flag (exact cents, rank-selected tails)
    "stats_trimmed_mean" -> ((s, d) => Robust.qTrimmedMean(s, d)),
    // median absolute deviation per flag (two rank-selection passes)
    "stats_mad_by_flag" -> ((s, d) => Robust.qMadByFlag(s, d)),
    // per-key group-skew report + which path the hotGroups dial picks
    "plan_group_skew" -> ((s, d) => Diagnostics.qGroupSkew(s, d)),
    // as-of join with a 30-day staleness tolerance (PIT leakage guard)
    "asof_tolerance_30d" -> ((s, d) => AsOf.qEventsAsofTolerant(s, d)),
    // padding-waste accounting: length-bucketed vs naive batching
    "curation_padding_waste" -> ((s, d) => DupWeights.qPaddingWaste(s, d)),
    // forward as-of: each event joined to the customer's NEXT order
    "asof_forward_next_order" -> ((s, d) => AsOf.qEventsAsofNextOrder(s, d)),
    // ORC landing format, gated against the parquet ground truth
    "source_orc_roundtrip" ->
      ((s, d) => graft.sources.TextFormats.qOrcRoundtrip(s, d)),
    // Benford first-digit forensics on order totals
    "quality_k_anonymity" -> ((s, d) => Diagnostics.qKAnonymity(s, d)),
    "quality_l_diversity" -> ((s, d) => Diagnostics.qLDiversity(s, d)),
    "quality_dup_rate_daily" -> ((s, d) => Diagnostics.qDupRateDaily(s, d)),
    "anomaly_burstiness" -> ((s, d) => Diagnostics.qBurstiness(s, d)),
    "stats_user_concentration" -> ((s, d) => Diagnostics.qUserConcentration(s, d)),
    "temporal_hourly_profile" -> ((s, d) => Diagnostics.qHourlyProfile(s, d)),
    "temporal_gap_histogram" -> ((s, d) => Diagnostics.qGapHistogram(s, d)),
    "quality_fd_check" -> ((s, d) => Diagnostics.qFdCheck(s, d)),
    "quality_benford_digits" -> ((s, d) => Diagnostics.qBenford(s, d)),
    // join-skew report with the integer salt recommendation
    "plan_join_skew" -> ((s, d) => Diagnostics.qJoinSkew(s, d)),
    // watermark-lateness profile from arrival-order replay
    "streaming_late_profile" -> ((s, d) => Lateness.qLatenessProfile(s, d)),
    // rendezvous-hash assignment: cheap cluster resize, measured
    "scale_rendezvous_resize" -> ((s, d) => Rendezvous.qRendezvousResize(s, d)),
    // KMV bottom-k distinct sketch — the oracle-able HLL alternative
    "sketch_kmv_distinct" -> ((s, d) => Sketches.qKmvDistinct(s, d)),
    // count-min frequency grid, point-queried at the hottest terms
    "sketch_cms_counts" -> ((s, d) => Sketches.qCmsTopTerms(s, d)),
    // prefix-dim (Matryoshka) retrieval recall vs the full-dim ranking
    "sim_matryoshka_recall" -> ((s, d) => Matryoshka.qPrefixRecall(s, d))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" -> Tpch.q1OracleSql,
    "silver_clean" -> Oracles.silverClean,
    "silver_enrich" -> Oracles.silverEnrich,
    "silver_daily_agg" -> Oracles.silverDailyAgg,
    "silver_hourly_agg" -> Oracles.silverHourlyAgg,
    "serving_latest_per_user" -> Oracles.servingLatestPerUser,
    "serving_weekly" -> Oracles.servingWeekly,
    "serving_day_night" -> Oracles.servingDayNight,
    "quality_dup_scan" -> Oracles.qualityDupScan,
    "quality_null_scan" -> Oracles.qualityNullScan,
    "stats_union" -> Oracles.statsUnion,
    "q3_shipping_priority" -> Tpch.q3OracleSql,
    "q5_local_supplier" -> Tpch.q5OracleSql,
    "join_brand_revenue" -> Joins.oBrandRevenue,
    "join_segment_sales" -> Joins.oSegmentSales,
    "join_semi_active_customers" -> Joins.oActiveCustomers,
    "join_anti_dormant_customers" -> Joins.oDormantCustomers,
    "window_top_orders_per_customer" -> Joins.oTopOrdersPerCustomer,
    "topk_orders" -> Joins.oTop10Orders,
    "text_stats" -> TextAnalysis.oTextStats,
    "text_lang_id" -> TextAnalysis.oLangId,
    "text_fingerprint" -> TextAnalysis.oFingerprint,
    "dedup_exact" -> Dedup.oDedupExact,
    "dedup_ngram_jaccard" -> Dedup.oNgramJaccard,
    // LSH is candidate-generated but exact-verified, so its output equals
    // the exact shingle-Jaccard operator's.
    "dedup_minhash_lsh" -> Dedup.oNgramJaccard,
    "sim_cosine_topk" -> Similarity.oCosineTopK,
    "sim_cosine_topk_subset" -> Similarity.oCosineTopKSubset,
    "sessionize_batch" -> Oracles.sessionizeBatch,
    "asof_events_orders" -> AsOf.oEventsAsofOrders,
    // native kernel accumulates in the same order as the composition →
    // shares its oracle bit-for-bit
    "sim_cosine_topk_native" -> Similarity.oCosineTopK,
    "sim_sparse_topk" -> SparseSim.oSparseTopK,
    "sim_sparse_serving_topk" -> SparseSim.oSparseTopKServing,
    "corpus_split_leakage_safe" -> SafeSplit.oClusterSafeSplit,
    "text_novelty_vs_train" -> Novelty.oNoveltyVsTrain,
    "forget_audit" -> Forget.oForgetAudit,
    "forget_packed_repack" -> Forget.oForgetPackedRepack,
    "forget_retrain" -> ModelAudit.oForgetRetrain,
    "sql_weekly" -> Sql.oWeeklySql,
    "subq_above_avg_parts" -> Advanced.oAboveAvgParts,
    "subq_large_orders" -> Advanced.oLargeOrders,
    "subq_not_in_unordered_parts" -> Advanced.oUnorderedParts,
    "agg_rollup_counts" -> Advanced.oRollupCounts,
    "agg_cube_stats" -> Advanced.oCubeStats,
    "pivot_daily_counts" -> Advanced.oPivotDaily,
    "dedup_embedding_cosine" -> Dedup.oEmbeddingNearDup,
    "range_join_followups" -> Ranged.oEventFollowups,
    "setop_intersect" -> Advanced.oSetIntersect,
    "setop_except" -> Advanced.oSetExcept,
    "window_event_deltas" -> Advanced.oEventDeltas,
    // the LSH paths are deterministic given the fixed seed-42 hyperplanes,
    // so their twins inline the identical plane literals and hash-match
    "sim_lsh_topk" -> Similarity.oLshTopK,
    "dedup_embedding_lsh" -> Dedup.oEmbeddingNearDupLsh,
    "q4_order_priority" -> Tpch.q4OracleSql,
    "q10_returned_items" -> Tpch.q10OracleSql,
    // cross-engine md5-derived hashes (TextFns.md5u56) make these three
    // fully oracle-checkable — blocking/sketching changes cost, not results
    "dedup_simhash_pairs" -> Dedup.oSimhashPairs,
    "text_winnowing_overlap" -> TextAnalysis.oWinnowingOverlap,
    "multimodal_features" -> Multimodal.oMultimodalFeatures,
    // real javax.imageio/javax.sound PNG+WAV round trip; the twin
    // recomputes the decoded stats from the generation formulas
    "multimodal_decode" -> Multimodal.oMultimodalDecode,
    "multimodal_frame_sample" -> Multimodal.oMultimodalFrameSample,
    "gapfill_hourly" -> Temporal.oGapFillHourly,
    "funnel_view_click_purchase" -> Temporal.oEventFunnel,
    // blocked fuzzy matching must equal the oracle's n² brute force
    "entity_edit_pairs" -> Entity.oCustomerEditPairs,
    "anomaly_rolling_z" -> Temporal.oRollingAnomalies,
    "dedup_clusters" -> Dedup.oDedupClusters,
    "text_top_ngrams" -> TextAnalysis.oTopNgrams,
    "text_top_terms" -> TextAnalysis.oTopTerms,
    "corpus_split" -> TextAnalysis.oCorpusSplit,
    "dedup_contamination" -> TextAnalysis.oContamination,
    "q6_forecast_revenue" -> Tpch.q6OracleSql,
    "q14_promo_revenue" -> Tpch.q14OracleSql,
    "q15_top_supplier" -> Tpch.q15OracleSql,
    "q19_bracket_revenue" -> Tpch.q19OracleSql,
    "q22_dormant_balance" -> Tpch.q22OracleSql,
    "q2_min_cost_supplier" -> TpchDeep.q2OracleSql,
    "q7_volume_shipping" -> TpchDeep.q7OracleSql,
    "q8_market_share" -> TpchDeep.q8OracleSql,
    "q9_product_profit" -> TpchDeep.q9OracleSql,
    "q12_late_lines" -> TpchDeep.q12OracleSql,
    "curation_pii_scrub" -> Curation.oPiiScrub,
    "curation_pii_luhn" -> Curation.oPiiLuhn,
    "curation_repetition" -> Curation.oRepetition,
    "curation_stratified_sample" -> Curation.oStratifiedSample,
    "curation_seq_pack" -> Curation.oSeqPack,
    "curation_pack_manifest" -> Curation.oPackManifest,
    "curation_filter_funnel" -> Curation.oFilterFunnel,
    "curation_source_cap" -> Curation.oSourceCap,
    "curation_source_mix" -> Curation.oSourceMix,
    "curation_mix_temperature" -> Rebalance.oMixTemperature,
    "curation_mix_temperature_tokens" -> Rebalance.oMixTemperatureTokens,
    "text_fertility_by_lang" -> Fertility.oFertilityByLang,
    "text_source_divergence" -> Divergence.oSourceDivergence,
    "text_vocab_overlap" -> Divergence.oVocabOverlap,
    "curation_source_mix_tokens" -> Curation.oSourceMixTokens,
    "curation_corpus_diff" -> Curation.oCorpusDiff,
    "curation_budget_select" -> Curation.oBudgetSelect,
    "q13_cust_dist" -> TpchMore.q13OracleSql,
    "q16_supplier_cnt" -> TpchMore.q16OracleSql,
    "q17_small_qty_revenue" -> TpchMore.q17OracleSql,
    "q18_large_orders" -> TpchMore.q18OracleSql,
    "tpch_q18_bucketed" -> TpchMore.q18OracleSql,
    "q20_qualified_suppliers" -> TpchMore.q20OracleSql,
    "q21_waiting_suppliers" -> TpchMore.q21OracleSql,
    "q11_important_stock" -> TpchMore.q11OracleSql,
    "profile_events" -> Advanced.oProfileEvents,
    "agg_percentiles" -> Advanced.oPercentiles,
    "window_range_frame" -> Advanced.oRangeFrame,
    "unpivot_daily" -> Advanced.oUnpivotDaily,
    "window_value_bounds" -> Advanced.oValueBounds,
    "agg_grouping_sets" -> Advanced.oGroupingSets,
    // LSH pairs (deterministic planes) + recursive-CTE closure + keep-min
    "dedup_semantic" -> Dedup.oSemanticDedup,
    "dedup_semantic_contamination" -> Dedup.oSemanticContamination,
    "sim_crosslingual_align" -> Bitext.oCrossLingualAlign,
    "dedup_passages" -> Passages.oPassageDedup,
    "bm25_topk" -> Retrieval.oBm25TopK,
    // the incremental apply must equal the from-scratch rebuild, so both
    // SCD2 queries share the full-log oracle
    "scd2_history" -> Scd.oScd2,
    "scd2_apply" -> Scd.oScd2,
    "dedup_incremental" -> IncrementalDedup.oIncrementalDedup,
    "bloom_semi_join" -> Scale.oBloomSemiJoin,
    // the merged rollup must equal a from-scratch recompute, so the
    // oracle recomputes over all events
    "agg_incremental_merge" -> Rollup.oIncrementalRollup,
    "text_normalize" -> TextAnalysis.oTextNormalize,
    "curation_chunks" -> Passages.oChunks,
    "curation_length_batching" -> Batching.oLengthBatches,
    "embed_quantize_stats" -> Quant.oQuantizeStats,
    "sim_quantized_topk" -> Quant.oQuantizedTopK,
    "sim_int8_topk" -> Quant.oInt8TopK,
    "text_lm_score" -> TextAnalysis.oLmScore,
    "curation_quality_curve" -> QualityCurve.oLmScoreCurve,
    "dedup_overlap_estimate" -> Overlap.oOverlapEstimate,
    // the incremental apply must equal the from-scratch fold, so both
    // CDC queries share the full-log oracle
    "cdc_build_state" -> Cdc.oCdcState,
    "cdc_apply_state" -> Cdc.oCdcState,
    "bm25_serving_topk" -> Retrieval.oBm25TopK,
    "quality_expectations" -> Expectations.oExpectations,
    "curation_weighted_sample" -> Sampling.oWeightedSample,
    "monitor_value_drift" -> Monitor.oValueDrift,
    "text_heavy_hitters" -> TextAnalysis.oHeavyHitters,
    "corpus_split_decontaminated" -> TextAnalysis.oDecontaminatedSplit,
    "debounce_events" -> Temporal.oDebounce,
    "multimodal_spectral" -> Multimodal.oMultimodalSpectral,
    "multimodal_resize" -> Multimodal.oMultimodalResize,
    "cohort_retention" -> Temporal.oCohortRetention,
    "conversion_latency" -> Temporal.oConversionLatency,
    "text_html_extract" -> WebText.oHtmlExtract,
    "curation_domain_reputation" -> WebText.oDomainReputation,
    "graph_pagerank" -> Graph.oPageRankGate,
    "text_hashed_tfidf" -> Features.oHashedTfIdf,
    "join_full_outer_recon" -> Joins.oDailyReconciliation,
    "entity_golden_record" -> Entity.oGoldenRecords,
    "graph_triangles" -> Graph.oTrianglesGate,
    "plan_join_cardinality" -> Planning.oJoinCardinality,
    "graph_bfs_reach" -> Graph.oBfsReachGate,
    // serving paths read persisted projections of the SAME edge sets —
    // the inline twins apply verbatim
    "graph_pagerank_serving" -> Graph.oPageRank,
    "graph_bfs_reach_serving" -> Graph.oBfsReach,
    "graph_triangles_serving" -> Graph.oTriangles,
    "embed_covariance" -> Quant.oCodeCovariance,
    "window_rank_variants" -> Advanced.oRankVariants,
    // prefix filtering changes candidates, never results — shares the
    // exact-Jaccard twin (the dedup_minhash_lsh precedent)
    "dedup_jaccard_prefix" -> Dedup.oNgramJaccard,
    "temporal_time_weighted_avg" -> Temporal.oTimeWeightedAvg,
    "window_hopping_agg" -> Temporal.oHoppingAgg,
    "dedup_substring_spans" -> Spans.oSubstringSpans,
    "stats_moments_merge" -> Moments.oMomentsMerge,
    "serving_rfm" -> Rfm.oRfm,
    "retrieval_phrase" -> Phrase.oPhraseSearch,
    "scd2_asof" -> Scd.oScd2Asof,
    // seed-4242 planes are fixed literals → full hash gate
    "sim_rp_topk" -> Rp.oRpTopK,
    "text_rake_keywords" -> Rake.oRakeKeywords,
    "scd2_pit_join" -> Pit.oPitJoin,
    "agg_quantiles_scalable" -> Quantiles.oQuantilesScalable,
    "sim_hard_negatives" -> Pairs.oHardNegatives,
    "curation_epoch_shuffle" -> Pairs.oEpochShuffle,
    "text_pmi_bigrams" -> Colloc.oPmiBigrams,
    "curation_cdc_chunks" -> CdcChunks.oCdcChunks,
    "curation_class_weights" -> CdcChunks.oClassWeights,
    "temporal_transitions" -> Transitions.oTransitions,
    "quality_outlier_fences" -> Transitions.oOutlierFences,
    // serving path is result-identical to the inline RP by construction
    "sim_rp_serving_topk" -> Rp.oRpTopK,
    "temporal_attribution" -> Attribution.oAttribution,
    "multimodal_ahash" -> Multimodal.oMultimodalAhash,
    "multimodal_ahash_pairs" -> Multimodal.oMultimodalAhashPairs,
    "profile_boxplot" -> Mining.oBoxplot,
    "mining_assoc_rules" -> Mining.oAssocRules,
    "serving_user_growth" -> Growth.oUserGrowth,
    "feature_rank_normalize" -> Growth.oRankNormalize,
    "curation_dataset_card" -> DatasetCard.oDatasetCard,
    "text_vocab_growth" -> DatasetCard.oVocabGrowth,
    "quality_referential" -> Integrity.oReferential,
    "temporal_streaks" -> Integrity.oStreaks,
    "serving_cohort_ltv" -> Ltv.oCohortLtv,
    "window_period_change" -> Ltv.oWeeklyChange,
    "mining_top_paths" -> Paths.oTopPaths,
    "graph_degree_distribution" -> Paths.oDegreeDistribution,
    "multimodal_dup_groups" -> Multimodal.oMultimodalDupGroups,
    "serving_supplier_pareto" -> Pareto.oSupplierPareto,
    "serving_order_aging" -> Pareto.oOrderAging,
    // index serving is result-identical to the inline phrase search
    "retrieval_phrase_serving" -> Phrase.oPhraseSearch,
    "curation_interleave" -> Pairs.oInterleave,
    "curation_dsir_select" -> Dsir.oDsirSelect,
    "stats_corr_regression" -> Corr.oCorrRegression,
    "agg_pivot_priority" -> Pivot.oOrderPriorityPivot,
    "agg_unpivot_priority" -> Pivot.oOrderPriorityUnpivot,
    "anomaly_cusum_hourly" -> Cusum.oHourlyCusum,
    "serving_dpp_revenue" -> Dpp.oRevenueByYearDpp,
    "source_csv_roundtrip" -> graft.sources.TextFormats.oRoundtrip,
    "source_jsonl_roundtrip" -> graft.sources.TextFormats.oRoundtrip,
    "stats_chi2_weekend" -> Chi2.oWeekendIndependence,
    "sim_mmr_rerank" -> Mmr.oMmrRerank,
    "mining_item_similarity" -> Reco.oItemSimilarity,
    "profile_equidepth" -> Profile.oEquiDepth,
    "serving_ship_latency" -> Profile.oShipLatency,
    "retrieval_hybrid_rrf" -> Fusion.oHybridRrf,
    "temporal_concurrency" -> Sweep.oPeakConcurrency,
    "forecast_backtest_mase" -> Sweep.oForecastBacktest,
    "classify_knn_embeddings" -> Knn.oKnnPredict,
    "serving_retention_matrix" -> Retention.oRetentionMatrix,
    "feature_quantile_normalize" -> QuantNorm.oQuantileNormalize,
    "agg_weighted_median" -> WeightedMedian.oWeightedQuartiles,
    "stats_trend_by_type" -> Trend.oDailyTrend,
    "agg_share_of_parent" -> Trend.oShareOfParent,
    "curation_dup_weights" -> DupWeights.oDupWeights,
    "curation_dedup_curve" -> DedupCurve.oThresholdCurve,
    "zorder_map" -> Zorder.oZorderMap,
    "skyline_parts" -> Skyline.oPartSkyline,
    "entity_jarowinkler" -> Entity.oPartJaroWinkler,
    "anomaly_ewma_daily" -> Ewma.oEwmaDaily,
    "dedup_canonical" -> Dedup.oDedupCanonical,
    // inline build gates run a bounded order slice (r13-item-4 pattern);
    // serving gates keep the FULL graph against the full twins
    "graph_hits" -> Graph.oHitsGate,
    "graph_hits_serving" -> Graph.oHits,
    "graph_ppr_serving" -> Graph.oPprServing,
    "stats_ks_value" -> Ks.oKsValueByType,
    "stats_mwu_value" -> Ks.oMwuValueByType,
    "feature_winsorize" -> QuantNorm.oWinsorize,
    // build-path gate is a bounded nation slice (r13 item 4); the
    // serving gate keeps the FULL pair set against the full twin
    "entity_edit2_pairs" -> Entity.oCustomerEdit2PairsGate,
    "entity_edit2_serving" -> Entity.oCustomerEdit2Pairs,
    "classify_auc" -> Auc.oLengthAuc,
    "stats_gini_by_nation" -> Gini.oGiniBySpend,
    "sketch_stats" -> Sketches.oSketchStats,
    "agg_grouped_quantiles" -> Quantiles.oQuantilesScalableGrouped,
    "curation_exact_split" -> Sampling.oExactSplit,
    "curation_exact_k_sample" -> Sampling.oExactKPerGroup,
    "classify_pr_curve" -> Auc.oLengthPrCurve,
    "sketch_kmv_daily_merge" -> Sketches.oKmvDailyMerge,
    "serving_topk_with_other" -> Serving.oTopKWithOther,
    "sketch_kmv_rolling_distinct" -> Sketches.oKmvRollingDistinct,
    "stats_trimmed_mean" -> Robust.oTrimmedMean,
    "stats_mad_by_flag" -> Robust.oMadByFlag,
    "plan_group_skew" -> Diagnostics.oGroupSkew,
    "asof_tolerance_30d" -> AsOf.oEventsAsofTolerant,
    "curation_padding_waste" -> DupWeights.oPaddingWaste,
    "asof_forward_next_order" -> AsOf.oEventsAsofNextOrder,
    "source_orc_roundtrip" -> graft.sources.TextFormats.oRoundtrip,
    "quality_k_anonymity" -> Diagnostics.oKAnonymity,
    "quality_l_diversity" -> Diagnostics.oLDiversity,
    "quality_dup_rate_daily" -> Diagnostics.oDupRateDaily,
    "anomaly_burstiness" -> Diagnostics.oBurstiness,
    "stats_user_concentration" -> Diagnostics.oUserConcentration,
    "temporal_hourly_profile" -> Diagnostics.oHourlyProfile,
    "temporal_gap_histogram" -> Diagnostics.oGapHistogram,
    "quality_fd_check" -> Diagnostics.oFdCheck,
    "quality_benford_digits" -> Diagnostics.oBenford,
    "plan_join_skew" -> Diagnostics.oJoinSkew,
    "streaming_late_profile" -> Lateness.oLatenessProfile,
    "scale_rendezvous_resize" -> Rendezvous.oRendezvousResize,
    "sketch_kmv_distinct" -> Sketches.oKmvDistinct,
    "sketch_cms_counts" -> Sketches.oCmsTopTerms,
    "sim_matryoshka_recall" -> Matryoshka.oPrefixRecall
  ) ++
    // The sampled-k-means ANN twins are GENERATED from the trained
    // centroids/codebooks (deterministic: fixed seeds, bounded
    // xxhash64-ordered samples, cached per dataset). Verify runs every
    // query before dumping oracleSql, so by dump time the caches hold
    // the literals to inline — the sign-LSH hyperplane pattern, extended
    // to trained quantizers. Empty (→ rows-only gate) if untrained.
    Ivf.oracleEntries ++ Pq.oracleEntries ++
    // cluster-balanced selection shares the IVF quantizer's literals
    Rebalance.oracleEntries ++
    // trained NB classifier: fixed-point integer model inlined the same way
    Classify.oracleEntries ++
    // trained BPE tokenizer: merge list inlined, recursive-CTE replay
    Tokenize.oracleEntries ++
    // trained PCA components inlined the same way
    Pca.oracleEntries ++
    // trained OLS coefficients (exact BigInt Cramer, micro fixed-point)
    Regress.oracleEntries ++
    // model-erasure audit: IVF centroid + PQ codebook literals reused
    ModelAudit.oracleEntries
}
