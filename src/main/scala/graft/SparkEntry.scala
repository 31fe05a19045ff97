package graft

import graft.pipeline.{Embeddings, Pipeline}
import graft.queries.{CurationQueries => CQ, EventQueries => EQ, RelationalQueries => RQ, TextQueries => TQ}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry is one operator/capability from SURVEY.md §2
  * (or a training-data-pipeline extension), deterministic by
  * construction; `oracleSql` carries the DuckDB-equivalent ANSI SQL the
  * driver hash-compares against at sf0.01. EVERY query has an oracle:
  * the approximate-index paths (LSH buckets, IVF cells) use md5-derived
  * constants and exact integer math, so the oracle replicates them
  * bit-for-bit (literal plane vectors, recursive-CTE connected
  * components, un-normalized stub features); Word2Vec exposes its exact
  * vocabulary (vectors stay invariant-tested, SURVEY.md §5).
  */
object SparkEntry {

  /** Flagship: the full reference pipeline (sessionize → candidates →
    * features → Word2Vec category embeddings attached) on sf0.001.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val enriched = Pipeline.enrichedEvents(spark, dir)
    val feats = Pipeline.features(spark, dir)
    val seqs = Embeddings.sessionSequences(enriched, "category_id")
    val vectors = Embeddings.trainWord2Vec(seqs)
    Embeddings.attachEmbeddings(feats, vectors, "category_id", dims = 16)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // — relational core (SURVEY.md §2.2–2.7) —
    "q01_pricing_summary" -> (RQ.pricingSummary _),
    "q02_filter_project" -> (RQ.filterProject _),
    "q03_join_agg" -> (RQ.joinAgg _),
    "q04_left_join_defaults" -> (RQ.leftJoinDefaults _),
    "q05_global_topk" -> (RQ.globalTopK _),
    "q06_topk_per_group" -> (RQ.topKPerGroup _),
    "q07_latest_per_key" -> (RQ.latestPerKey _),
    "q08_union_distinct" -> (RQ.unionDistinct _),
    "q09_count_distinct" -> (RQ.countDistinctAgg _),
    "q10_conditional_agg" -> (RQ.conditionalAgg _),
    "q11_two_level_agg" -> (RQ.twoLevelAgg _),
    "q12_composite_join" -> (RQ.compositeJoin _),
    "q13_describe_stats" -> (RQ.describeStats _),
    "q14_label_stats" -> (RQ.labelStats _),
    // — event-log / pipeline (SURVEY.md §2.5, §3) —
    "q15_sessionize" -> (EQ.sessionize _),
    "q16_user_session_stats" -> (EQ.userSessionStats _),
    "q17_lag_gaps" -> (EQ.lagGaps _),
    "q18_running_sums" -> (EQ.runningSums _),
    "q19_covis_pairs" -> (EQ.covisPairs _),
    "q20_prefix_stats" -> (EQ.prefixStats _),
    "q21_popularity_candidates" -> (EQ.popularityCandidates _),
    "q22_user_history" -> (EQ.userHistory _),
    "q23_candidates" -> (EQ.candidates _),
    "q24_session_item_seq" -> (EQ.sessionItemSeq _),
    "q25_scalar_functions" -> (EQ.scalarFunctions _),
    "q26_features" -> (EQ.features _),
    // — training-data pipeline extensions —
    "q27_dedup_exact" -> (TQ.dedupExact _),
    "q28_ngram_jaccard" -> (TQ.ngramJaccard _),
    "q29_minhash_bands" -> (TQ.minhashBands _),
    "q30_simhash" -> (TQ.simhash _),
    "q31_knn_cosine" -> (TQ.knnCosine _),
    "q32_lang_id" -> (TQ.langId _),
    "q33_quality_score" -> (TQ.qualityScore _),
    "q34_token_stats" -> (TQ.tokenStats _),
    "q35_fingerprints" -> (TQ.fingerprints _),
    "q39_embedding_neardup" -> (TQ.embeddingNearDup _),
    "q36_knn_lsh" -> (TQ.knnLsh _),
    "q37_word2vec_vocab" -> (TQ.word2vecVocab _),
    "q38_multimodal_features" -> (TQ.multimodalFeatures _),
    "q40_embedding_neardup_lsh" -> (TQ.embeddingNearDupLsh _),
    "q41_knn_ivf" -> (TQ.knnIvf _),
    "q42_neardup_dedup" -> (TQ.nearDupDedup _),
    // — round-2 extensions: ranking, sampling, quantiles, sketches —
    "q43_tfidf_topterms" -> (TQ.tfidfTopTerms _),
    "q44_bm25" -> (TQ.bm25 _),
    "q45_stratified_sample" -> (EQ.stratifiedSample _),
    "q46_group_quantiles" -> (RQ.groupQuantiles _),
    "q47_sketch_union" -> (TQ.sketchUnion _),
    "q48_contamination" -> (TQ.contamination _),
    "q49_simhash_pairs" -> (TQ.simhashPairs _),
    "q50_chunking" -> (TQ.chunkDocs _),
    "q51_packing" -> (TQ.packDocs _),
    "q52_frame_sample" -> (TQ.frameSample _),
    "q53_surprisal" -> (TQ.surprisal _),
    // — round-3 extensions —
    "q54_covis_weighted" -> (EQ.covisWeighted _),
    // — round-4 extensions: transitions, cohorts, vocab, centroids —
    "q55_item_transitions" -> (EQ.itemTransitions _),
    "q56_retention_cohorts" -> (EQ.retentionCohorts _),
    "q57_bigram_vocab" -> (TQ.bigramVocab _),
    "q58_label_centroids" -> (TQ.labelCentroids _),
    "q59_repetition" -> (TQ.repetitionScore _),
    "q60_funnel" -> (EQ.funnel _),
    "q61_pmi_pairs" -> (TQ.pmiPairs _),
    "q62_incremental_dedup" -> (TQ.incrementalDedup _),
    "q63_group_sample" -> (EQ.groupSample _),
    "q64_rolling_window" -> (EQ.rollingWindow _),
    "q65_skew_keys" -> (EQ.skewKeys _),
    "q66_reconcile" -> (RQ.reconcile _),
    "q67_ngram_novelty" -> (TQ.noveltyScore _),
    "q68_interval_attribution" -> (EQ.intervalAttribution _),
    "q69_exact_median" -> (RQ.exactMedian _),
    "q70_pivot_counts" -> (EQ.pivotCounts _),
    "q71_unpivot" -> (RQ.unpivotMeasures _),
    "q72_rollup" -> (RQ.rollupRevenue _),
    "q73_json_typed" -> (EQ.jsonTyped _),
    "q74_rank_functions" -> (EQ.rankFunctions _),
    "q75_array_ops" -> (TQ.arrayOps _),
    // — round-5 extensions —
    "q76_bloom_decontam" -> (TQ.bloomDecontaminate _),
    "q77_url_domain_cap" -> (TQ.urlDomainCap _),
    "q78_daily_gapfill" -> (EQ.dailyGapfill _),
    "q79_cube" -> (RQ.cubeRevenue _),
    "q80_setops" -> (RQ.setOps _),
    "q81_zipf_hist" -> (CQ.zipfHistogram _),
    "q82_shuffle_shards" -> ((s, d) => CQ.shuffleShards(s, d)),
    "q83_mixture_sample" -> (CQ.mixtureSample _),
    "q84_pii_redact" -> (CQ.piiRedact _),
    "q85_jaccard_prefix" -> (CQ.jaccardPrefixPairs _),
    "q86_curation_pipeline" -> (CQ.curationPipeline _),
    "q87_pagerank" -> (EQ.pagerank _),
    "q88_grouping_sets" -> (RQ.groupingSets _),
    "q89_line_boilerplate" -> (CQ.lineBoilerplate _),
    "q90_fuzzy_names" -> (CQ.fuzzyNames _),
    "q91_unicode_clean" -> (CQ.unicodeClean _),
    "q92_profile" -> (RQ.profileCustomers _),
    "q93_zorder" -> (RQ.zorderIndex _),
    "q94_data_quality" -> (RQ.dataQuality _),
    "q95_scd2_history" -> (EQ.scd2History _),
    "q96_session_window" -> (EQ.sessionWindowAgg _),
    "q97_negative_samples" -> (EQ.negativeSamples _),
    "q98_target_encoding" -> (EQ.targetEncoding _),
    "q99_winsorize" -> (RQ.winsorize _),
    "q100_feature_hashing" -> (TQ.featureHashing _),
    "q101_correlation" -> (RQ.correlation _),
    "q102_dup_spans" -> (TQ.dupSpans _),
    "q103_bigram_surprisal" -> (TQ.bigramSurprisalScores _),
    "q104_upsert" -> (RQ.upsertCustomers _),
    "q105_sql_subqueries" -> (RQ.sqlSubqueries _),
    "q106_logq_sketch" -> (RQ.logQuantileSketch _),
    "q107_paragraph_dedup" -> (CQ.paragraphDedup _),
    "q108_decayed_popularity" -> (EQ.decayedPopularity _),
    "q109_locf_impute" -> (EQ.locfImpute _),
    "q110_ctr_wilson" -> (EQ.ctrWilson _),
    "q111_item_cosine" -> (EQ.itemCosine _),
    "q112_hitrate_eval" -> (EQ.hitRateEval _),
    "q113_quality_survivors" -> (TQ.qualitySurvivors _),
    "q114_mad_outliers" -> (RQ.madOutliers _),
    "q115_sequence_detect" -> (EQ.sequenceDetect _),
    "q116_candidate_recall" -> (EQ.candidateRecall _),
    "q117_strategy_recall" -> (EQ.strategyRecall _),
    "q118_psi_drift" -> (EQ.psiDrift _),
    "q119_ks_drift" -> (EQ.ksDrift _),
    "q120_auc_eval" -> (EQ.aucEval _),
    "q121_bootstrap_ci" -> (EQ.bootstrapCi _),
    "q122_cross_source_dups" -> (TQ.crossSourceDups _),
    "q123_vocab_growth" -> (TQ.vocabGrowth _),
    "q124_peak_concurrency" -> (EQ.peakConcurrency _),
    "q125_visits" -> (EQ.visitsOfSessions _),
    "q126_frequent_triples" -> (EQ.frequentTriples _),
    "q127_rolling_wau" -> (EQ.rollingActiveUsers _),
    "q128_substring_repeats" -> (TQ.substringRepeats _),
    "q129_best_of_cluster" -> (TQ.bestOfClusterDedup _),
    "q130_token_budget" -> (TQ.tokenBudget _),
    "q131_leakage_split" -> (TQ.leakageSplit _),
    "q132_temperature_mix" -> (TQ.temperatureMix _),
    // — round-6 extensions: asymmetric dedup, MOSS, rank-aware eval —
    "q133_containment" -> (TQ.containmentDedup _),
    "q134_winnowing" -> (TQ.winnowingPairs _),
    "q135_mrr_eval" -> (EQ.mrrEval _),
    "q136_calibration" -> (EQ.calibrationBins _),
    "q137_triangles" -> (EQ.covisTriangles _),
    "q138_ndcg_eval" -> (EQ.ndcgEval _),
    "q139_covis_clustering" -> (EQ.covisClustering _),
    "q140_kcore" -> (EQ.covisKcore _),
    "q141_dsir_select" -> (TQ.dsirSelect _),
    "q142_semantic_dedup" -> (TQ.semanticDedup _),
    "q143_rec_coverage" -> (EQ.recCoverage _),
    "q144_chi2_terms" -> (TQ.chi2Terms _),
    "q145_transition_entropy" -> (EQ.transitionEntropy _),
    "q146_hard_negatives" -> (TQ.hardNegatives _),
    "q147_cusum_drift" -> (EQ.cusumDrift _),
    "q148_bpe_merges" -> (TQ.bpeMerges _),
    "q149_lang_id_kappa" -> (TQ.langIdKappa _),
    "q150_seq_patterns" -> (EQ.seqPatterns _),
    "q151_js_divergence" -> (TQ.jsDivergence _),
    "q152_band_join" -> (EQ.bandGapHistogram _),
    "q153_asof_join" -> (EQ.asOfClickGap _),
    "q154_ks_drift" -> (EQ.ksValueDrift _),
    "q155_knn_pq" -> (TQ.knnPq _),
    "q156_rrf_fusion" -> (EQ.rrfFusion _),
    "q157_communities" -> (EQ.covisCommunities _),
    "q158_cuped_uplift" -> (EQ.cupedUplift _),
    "q159_theil_sen" -> (EQ.theilSenTrend _),
    "q160_knn_ivfpq" -> (TQ.knnIvfPq _),
    "q161_gini_stumps" -> (EQ.giniStumps _),
    "q162_autocorrelation" -> (EQ.autocorrelation _),
    "q163_mase_forecast" -> (EQ.maseForecast _),
    "q164_cms_sketch" -> (EQ.cmsFrequency _),
    "q165_mann_whitney" -> (EQ.mannWhitneyU _),
    "q166_ips_ctr" -> (EQ.ipsCtr _),
    "q167_woe_binning" -> (EQ.woeBinning _),
    "q168_top_paths" -> (EQ.topSessionPaths _),
    "q169_burst_days" -> (EQ.burstDays _),
    "q170_kruskal_wallis" -> (EQ.kruskalWallis _),
    "q171_mad_cents" -> (EQ.madCents _),
    "q172_trimmed_mean" -> (EQ.trimmedMean _),
    "q173_hits" -> (EQ.hitsTransitions _),
    "q174_cramers_v" -> (EQ.contingencyCramersV _),
    "q175_kendall_tau" -> (EQ.kendallDaily _),
    "q176_link_prediction" -> (EQ.covisLinkPrediction _),
    "q177_assortativity" -> (EQ.covisAssortativity _),
    "q178_reciprocity" -> (EQ.transitionReciprocity _),
    "q179_short_repeats" -> (TQ.shortRepeats _),
    "q180_personalized_pagerank" -> (EQ.personalizedPagerankAnchor _),
    "q181_random_walks" -> (EQ.transitionWalks _),
    "q182_spearman_rho" -> (EQ.spearmanDaily _),
    "q183_welch_ttest" -> (EQ.welchValues _),
    "q184_harmonic_centrality" -> (EQ.harmonicCentrality _),
    "q185_mcnemar" -> (EQ.mcnemarStrategies _),
    "q186_rake_keyphrases" -> (TQ.rakeKeyphrases _),
    "q187_cdc_chunks" -> (TQ.cdcChunks _),
    "q188_seasonal_decomp" -> (EQ.seasonalDecomposition _),
    "q189_exposure_gini" -> (EQ.exposureGini _),
    "q190_benford" -> (EQ.benfordDigits _),
    "q191_map_eval" -> (EQ.mapEval _),
    "q192_dispersion" -> (EQ.dailyDispersion _),
    "q193_ktruss" -> (EQ.covisKTruss _),
    "q194_fleiss_kappa" -> (TQ.fleissKappa _),
    "q195_did_uplift" -> (EQ.didUplift _),
    "q196_sprt" -> (EQ.sprtMonitor _),
    "q197_anderson_darling" -> (EQ.andersonDarlingValues _),
    "q198_churn_hazard" -> (EQ.churnHazard _),
    "q199_random_projection" -> (TQ.randomProjection _),
    "q200_ols_trend" -> (EQ.olsDailyRevenue _),
    "q201_levene" -> (EQ.leveneValues _),
    "q202_friedman" -> (EQ.friedmanDailyTypes _),
    "q203_cochran_armitage" -> (EQ.trendPriceBands _),
    "q204_durbin_watson" -> (EQ.durbinWatsonDaily _),
    "q205_cronbach_alpha" -> (EQ.cronbachEngagement _),
    "q206_daily_hhi" -> (EQ.dailyCategoryHhi _),
    "q207_hill_tail" -> (EQ.hillPopularityTail _),
    "q208_textrank" -> (TQ.textrankKeywords _),
    "q209_kaplan_meier" -> (EQ.kaplanMeierReturns _),
    "q210_isotonic" -> (EQ.isotonicPriceCalibration _),
    "q211_salsa" -> (EQ.salsaTransitions _),
    "q212_intra_list_diversity" -> (EQ.intraListDiversity _),
    "q213_qq_deciles" -> (EQ.qqDeciles _),
    "q214_tukey_outliers" -> (EQ.tukeyOutliers _),
    "q215_community_purity" -> (EQ.communityPurity _),
    "q216_pacf" -> (EQ.pacfLag2 _),
    "q217_rec_novelty" -> (EQ.recNovelty _),
    "q218_weighted_sample" -> (EQ.weightedItemSample _),
    "q219_two_prop_z" -> (EQ.weekendPurchaseZ _),
    "q220_mann_kendall" -> (EQ.mannKendallDaily _),
    "q221_runs_test" -> (EQ.runsTestDaily _),
    "q222_bradley_terry" -> (EQ.bradleyTerryItems _),
    "q223_anova_f" -> (EQ.anovaDowVolume _),
    "q224_capture_recapture" -> (EQ.captureRecapture _),
    "q225_jackknife" -> (EQ.jackknifeDailyMean _),
    "q226_entropy_rate" -> (EQ.entropyRate _),
    "q227_community_nmi" -> (EQ.communityNmi _),
    "q228_ips_ess" -> (EQ.ipsEffectiveSampleSize _),
    "q229_ses_forecast" -> (EQ.sesForecast _),
    "q230_srm_check" -> (EQ.srmCheck _),
    "q231_neyman_allocation" -> (EQ.neymanAllocation _),
    "q232_ab_power" -> (EQ.abPowerSampleSize _),
    "q233_fk_orphans" -> (RQ.fkOrphans _),
    "q234_pareto_revenue" -> (RQ.paretoRevenue _),
    "q235_rfm_segments" -> (RQ.rfmSegments _),
    "q236_dup_cluster_stats" -> (TQ.dupClusterStats _),
    "q237_profile_drift" -> (EQ.profileDrift _),
    "q238_association_lift" -> (EQ.associationLift _),
    "q239_cohort_ltv" -> (EQ.cohortLtv _),
    "q240_stickiness" -> (EQ.dauMauStickiness _),
    "q241_price_elasticity" -> (EQ.priceElasticity _),
    "q242_new_vs_returning" -> (EQ.newVsReturningRevenue _),
    "q243_conversion_lag" -> (EQ.conversionLag _),
    "q244_k_anonymity" -> (RQ.kAnonymityAudit _),
    "q245_l_diversity" -> (RQ.lDiversityAudit _),
    "q246_holt_forecast" -> (EQ.holtForecast _),
    "q247_flesch" -> (TQ.fleschReadability _),
    "q248_oov_rate" -> (TQ.oovRate _),
    "q249_good_turing" -> (TQ.goodTuringFreqs _),
    "q250_distinct_n" -> (TQ.distinctNgramDiversity _),
    "q251_source_overlap" -> (TQ.sourceOverlap _),
    "q252_spike_days" -> (EQ.spikeDays _),
    "q253_seasonality_strength" -> (EQ.seasonalityStrength _),
    "q254_silhouette" -> (TQ.silhouette _),
    "q255_stratified_kfold" -> ((s, dir) => TQ.stratifiedKfold(s, dir)),
    "q256_power_iteration" -> (TQ.powerIteration _),
    "q257_conformal_coverage" -> (TQ.conformalCoverage _),
    "q258_matryoshka_fidelity" -> (TQ.matryoshkaFidelity _),
    "q259_attribution_credit" -> (EQ.attributionCredit _),
    "q260_label_noise" -> (TQ.labelNoise _),
    "q261_centroid_drift" -> (TQ.embeddingDrift _),
    "q262_user_segments" -> (EQ.userEmbeddingSegments _),
    "q263_embargo_split" -> (EQ.embargoSplit _),
    "q264_leave_last_out" -> (EQ.leaveLastOut _),
    "q265_implicit_matrix" -> (EQ.implicitMatrix _),
    "q266_int8_quant" -> (TQ.int8Quant _),
    "q267_token_allocation" -> ((s, dir) => CQ.temperatureMixture(s, dir)),
    "q268_coverage_select" -> ((s, dir) => CQ.greedyCoverage(s, dir)),
    "q269_kcenter_coreset" -> (TQ.kcenterCoreset _),
    "q270_mutual_knn" -> (TQ.mutualKnnPairs _),
    "q271_hard_negatives_lsh" -> (TQ.hardNegativesLsh _),
    "q272_rare_token_docs" -> ((s, dir) => CQ.rareTokenDocs(s, dir)),
    "q273_t_closeness" -> (RQ.tClosenessAudit _),
    "q274_embedding_anova" -> (TQ.embeddingAnova _),
    "q275_curriculum" -> ((s, dir) => CQ.curriculumSchedule(s, dir)),
    "q276_semantic_decontam" -> (TQ.semanticDecontam _),
    "q277_knn_outliers" -> (TQ.knnOutliers _),
    "q278_dedup_by_source" -> (CQ.dedupBySource _),
    "q279_blocking_quality" -> (CQ.blockingQuality _),
    "q280_ivf_recall" -> (TQ.ivfRecallAudit _),
    // — round-9 continuation: classifier head, media dedup, crawl keys,
    //   tokenizer budgeting, record linkage —
    "q281_naive_bayes" -> (TQ.naiveBayesConfusion _),
    "q282_frame_neardup" -> (TQ.frameNearDup _),
    "q283_url_canonical" -> (TQ.urlCanonicalDedup _),
    "q284_tokenizer_fertility" -> (TQ.tokenizerFertility _),
    "q285_record_linkage" -> (CQ.recordLinkage _),
    "q286_fd_violations" -> (RQ.fdViolationsAudit _),
    "q287_modularity" -> (EQ.covisModularity _),
    "q288_bpe_compression" -> (TQ.bpeCompression _),
    "q289_column_mi" -> (RQ.columnAssociations _),
    "q290_dataset_card" -> (CQ.datasetCard _),
    "q291_weighted_negatives" -> (EQ.weightedNegatives _),
    "q292_f1_threshold" -> (EQ.f1ThresholdSweep _),
    "q293_isotropy" -> (TQ.embeddingIsotropy _),
    "q294_pinball" -> (EQ.pinballEval _),
    "q295_rbo" -> (EQ.rboRankings _),
    "q296_rendezvous" -> (RQ.rendezvousShards _),
    "q297_sketch_audit" -> (RQ.sketchQuantileAudit _),
    "q298_feature_signal" -> (CQ.featureSignalScreen _),
    "q299_ranking_eval" -> (EQ.rankingEval _),
    "q300_calibration" -> (CQ.calibrationAudit _),
    "q301_mad_sketch" -> (EQ.madCentsSketch _),
    "q302_tukey_sketch" -> (EQ.tukeyOutliersSketch _),
    "q303_stream_wcounts" -> (EQ.streamWindowCounts _),
    "q304_stream_attrib" -> (EQ.streamClickAttribution _),
    "q305_stream_enrich" -> (EQ.streamEnrichedCounts _),
    "q306_accuracy_at1" -> (EQ.nextCategoryAccuracy _),
    "q307_stream_merge_sessions" -> (EQ.streamMergedSessions _),
    "q308_approx_distinct_audit" -> (EQ.approxDistinctAudit _),
    "q309_unattributed_purchases" -> (EQ.streamUnattributedPurchases _),
    "q310_attribution_ledger" -> (EQ.streamAttributionLedger _),
    "q311_rank_sketch" -> (EQ.rankSketchQuantiles _),
    "q312_phash_neardup" -> (TQ.phashNearDup _),
    "q313_kmeans" -> (TQ.kmeansClusters _),
    "q314_longest_repeat" -> (TQ.longestRepeat _))

  // ——— shared oracle-SQL fragments ———

  /** Sessionized + item/category-enriched events (mirrors
    * graft.ops.Windows.sessionize + graft.pipeline.Pipeline).
    */
  private val sessCte =
    """e AS (
      |  SELECT event_id, user_id, event_type, value,
      |         CAST(floor(extract(epoch FROM ts)) AS BIGINT) AS epoch_s,
      |         TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS item_id
      |  FROM events
      |), lagged AS (
      |  SELECT *, lag(epoch_s) OVER (PARTITION BY user_id ORDER BY epoch_s, event_id) AS prev_s
      |  FROM e
      |), flagged AS (
      |  SELECT *, CASE WHEN prev_s IS NULL OR epoch_s - prev_s > 1800 THEN 1 ELSE 0 END AS is_new
      |  FROM lagged
      |), sess AS (
      |  SELECT *,
      |    CAST(user_id AS VARCHAR) || '_' ||
      |      CAST(CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY epoch_s, event_id) AS BIGINT) AS VARCHAR)
      |      AS session_id,
      |    item_id % 20 AS category_id
      |  FROM flagged
      |), enr AS (
      |  SELECT * FROM sess WHERE item_id IS NOT NULL
      |), anchors AS (
      |  SELECT event_id AS anchor_id, session_id, user_id,
      |         epoch_s AS anchor_epoch_s, item_id, category_id
      |  FROM enr WHERE event_type = 'purchase'
      |)""".stripMargin

  /** Shared value-support scaffold of the two-sample statistics family
    * (q154 KS, q165 MWU — EventQueries.purchaseViewSupport on the
    * engine side): per distinct `value`, purchase and view counts in
    * `counts(value, ca, cb)`.
    */
  private val pvSupportCte =
    """e AS (
      |  SELECT event_type, value FROM events WHERE event_type IN ('purchase', 'view')
      |), counts AS (
      |  SELECT value,
      |    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS ca,
      |    SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS cb
      |  FROM e GROUP BY 1
      |)""".stripMargin

  /** Session item-transition edges (mirrors Windows.transitionCounts on
    * the enriched stream): `trans(item_a, item_b, transition_count)`.
    * Must follow `$sessCte`. Shared by the transition-graph family
    * (q55/q87/q112/q135/q138/q173/q178/q180) so the edge definition
    * cannot drift between them.
    */
  private val transCte =
    """led AS (
      |  SELECT session_id, item_id,
      |         lead(item_id) OVER (PARTITION BY session_id ORDER BY epoch_s, event_id) AS next_item
      |  FROM enr
      |), trans AS (
      |  SELECT item_id AS item_a, next_item AS item_b, CAST(COUNT(*) AS BIGINT) AS transition_count
      |  FROM led WHERE next_item IS NOT NULL GROUP BY 1, 2
      |)""".stripMargin

  /** Hub-capped (≤ 200 items/session) distinct session→item incidence:
    * `di`, `small`, `dik(session_id, item_id)`. Must follow `$sessCte`.
    */
  private val covisDikCte =
    """di AS (
      |  SELECT DISTINCT session_id, item_id FROM enr
      |), small AS (
      |  SELECT session_id FROM di GROUP BY session_id HAVING COUNT(*) <= 200
      |), dik AS (
      |  SELECT di.* FROM di JOIN small USING (session_id)
      |)""".stripMargin

  /** Co-visitation pairs with min-support 2:
    * `pairs(item_a, item_b, pair_count)` (canonical a<b). Shared by the
    * covis-recommendation family (q19/q111/q112/q135/q138/q143).
    */
  private val covisPairsCte =
    s"""$covisDikCte, pairs AS (
       |  SELECT a.item_id AS item_a, b.item_id AS item_b, COUNT(*) AS pair_count
       |  FROM dik a JOIN dik b ON a.session_id = b.session_id AND a.item_id < b.item_id
       |  GROUP BY 1, 2 HAVING COUNT(*) >= 2
       |)""".stripMargin

  /** Distinct co-visitation edge set (no support floor):
    * `pairs(item_a, item_b)` (canonical a<b). Shared by the covis
    * graph-structure family (q137/q139/q140/q176/q177).
    */
  private val covisEdgesCte =
    s"""$covisDikCte, pairs AS (
       |  SELECT a.item_id AS item_a, b.item_id AS item_b
       |  FROM dik a JOIN dik b ON a.session_id = b.session_id AND a.item_id < b.item_id
       |  GROUP BY 1, 2
       |)""".stripMargin

  /** Both directions of `pairs`: `directed(src, dst, pair_count)`. */
  private val covisDirectedCte =
    """directed AS (
      |  SELECT item_a AS src, item_b AS dst, pair_count FROM pairs
      |  UNION ALL
      |  SELECT item_b AS src, item_a AS dst, pair_count FROM pairs
      |)""".stripMargin

  /** Top-`k` covis recommendations per source off `directed`, CTE named
    * `name`; `withRn` keeps the 1-based rank column for MRR/nDCG.
    */
  private def covisTopSql(name: String, k: Int, withRn: Boolean): String =
    s"""$name AS (
       |  SELECT src, dst${if (withRn) ", CAST(rn AS BIGINT) AS rn" else ""} FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY src
       |                ORDER BY pair_count DESC, dst ASC) AS rn
       |    FROM directed) WHERE rn <= $k
       |)""".stripMargin

  /** `iters` unrolled exact-integer PageRank iterations over `trans`
    * (damping 850000 ppm, floor division at both steps — mirrors
    * [[graft.ops.Graph.pagerankMicro]] / `personalizedPagerankMicro`):
    * `nodes(id, is_seed)`, `p0..p$iters(id, pr)`. `seedPredicate`
    * concentrates the teleport mass (q180); None is uniform PageRank
    * (q87, every node is a seed). Must follow `$transCte`.
    */
  private def pagerankUnrollSql(iters: Int, seedPredicate: Option[String]): String = {
    val seedExpr =
      seedPredicate.map(p => s"CASE WHEN $p THEN 1 ELSE 0 END").getOrElse("1")
    val head =
      s"""outw AS (
         |  SELECT item_a AS src, CAST(SUM(transition_count) AS BIGINT) AS out_w
         |  FROM trans GROUP BY 1
         |), ew AS (
         |  SELECT t.item_a AS src, t.item_b AS dst, t.transition_count AS w, o.out_w
         |  FROM trans t JOIN outw o ON t.item_a = o.src
         |), nodes AS (
         |  SELECT id, CAST($seedExpr AS BIGINT) AS is_seed FROM (
         |    SELECT item_a AS id FROM trans UNION SELECT item_b FROM trans)
         |), p0 AS (
         |  SELECT id, CAST(is_seed * 1000000 AS BIGINT) AS pr FROM nodes
         |)""".stripMargin
    val iterations = (1 to iters).map { i =>
      s"""c$i AS (
         |  SELECT ew.dst AS id, CAST(SUM((p.pr * ew.w) // ew.out_w) AS BIGINT) AS inc
         |  FROM ew JOIN p${i - 1} p ON ew.src = p.id GROUP BY 1
         |), p$i AS (
         |  SELECT n.id, CAST(n.is_seed * 150000 + (850000 * COALESCE(c.inc, 0)) // 1000000 AS BIGINT) AS pr
         |  FROM nodes n LEFT JOIN c$i c USING (id)
         |)""".stripMargin
    }
    (head +: iterations).mkString(", ")
  }

  /** `iters` unrolled SALSA alternations over `trans` — the SQL mirror
    * of [[graft.ops.Graph.salsaMicro]]: per half-step a local floor
    * division by the SENDER's degree (out_w for hub→authority, in_w
    * for authority→hub), no global normalizer. Ends in
    * `a$iters(id, a)` / `h$iters(id, h)` plus `nodes(id)`. Must follow
    * `$transCte`.
    */
  private def salsaUnrollSql(iters: Int): String = {
    val head =
      """outw AS (
        |  SELECT item_a AS src, CAST(SUM(transition_count) AS BIGINT) AS out_w
        |  FROM trans GROUP BY 1
        |), inw AS (
        |  SELECT item_b AS dst, CAST(SUM(transition_count) AS BIGINT) AS in_w
        |  FROM trans GROUP BY 1
        |), ew AS (
        |  SELECT t.item_a AS src, t.item_b AS dst, t.transition_count AS w,
        |    o.out_w, i.in_w
        |  FROM trans t JOIN outw o ON t.item_a = o.src JOIN inw i ON t.item_b = i.dst
        |), nodes AS (
        |  SELECT item_a AS id FROM trans UNION SELECT item_b FROM trans
        |), h0 AS (
        |  SELECT id, CAST(1000000 AS BIGINT) AS h FROM nodes
        |)""".stripMargin
    val iterations = (1 to iters).map { i =>
      s"""a$i AS (
         |  SELECT n.id, CAST(COALESCE(x.a, 0) AS BIGINT) AS a FROM nodes n LEFT JOIN (
         |    SELECT ew.dst AS id, CAST(SUM((h.h * ew.w) // ew.out_w) AS BIGINT) AS a
         |    FROM ew JOIN h${i - 1} h ON ew.src = h.id GROUP BY 1) x USING (id)
         |), h$i AS (
         |  SELECT n.id, CAST(COALESCE(x.h, 0) AS BIGINT) AS h FROM nodes n LEFT JOIN (
         |    SELECT ew.src AS id, CAST(SUM((a.a * ew.w) // ew.in_w) AS BIGINT) AS h
         |    FROM ew JOIN a$i a ON ew.dst = a.id GROUP BY 1) x USING (id)
         |)""".stripMargin
    }
    (head +: iterations).mkString(", ")
  }

  /** The 4-strategy candidate union (q23's oracle body) as a reusable
    * fragment ending in `cands(anchor_id, category_id)`. Must follow
    * `$sessCte` in the WITH chain (uses enr/anchors).
    */
  private val candidatesCte: String =
    """prefix_cand AS (
      |  SELECT DISTINCT a.anchor_id, e.category_id
      |  FROM anchors a JOIN enr e ON a.session_id = e.session_id AND e.epoch_s < a.anchor_epoch_s
      |), di AS (
      |  SELECT DISTINCT session_id, category_id FROM enr
      |), pairs AS (
      |  SELECT a.category_id AS item_a, b.category_id AS item_b, COUNT(*) AS pair_count
      |  FROM di a JOIN di b ON a.session_id = b.session_id AND a.category_id < b.category_id
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 2
      |), directed AS (
      |  SELECT item_a AS src, item_b AS dst, pair_count FROM pairs
      |  UNION ALL
      |  SELECT item_b AS src, item_a AS dst, pair_count FROM pairs
      |), top_directed AS (
      |  SELECT src, dst FROM (
      |    SELECT *, ROW_NUMBER() OVER (PARTITION BY src ORDER BY pair_count DESC, dst ASC) AS rn
      |    FROM directed
      |  ) WHERE rn <= 10
      |), covis_cand AS (
      |  SELECT DISTINCT p.anchor_id, t.dst AS category_id
      |  FROM prefix_cand p JOIN top_directed t ON p.category_id = t.src
      |), top_pop AS (
      |  SELECT category_id FROM enr GROUP BY category_id
      |  ORDER BY CAST(COUNT(DISTINCT session_id) AS BIGINT) DESC, category_id ASC LIMIT 5
      |), pop_cand AS (
      |  SELECT anchors.anchor_id, top_pop.category_id FROM anchors CROSS JOIN top_pop
      |), last_seen AS (
      |  SELECT user_id, category_id, MAX(epoch_s) AS last_seen FROM enr GROUP BY 1, 2
      |), hist_cand AS (
      |  SELECT anchor_id, category_id FROM (
      |    SELECT a.anchor_id, l.category_id,
      |      ROW_NUMBER() OVER (PARTITION BY a.anchor_id ORDER BY l.last_seen DESC, l.category_id ASC) AS rn
      |    FROM anchors a JOIN last_seen l ON a.user_id = l.user_id AND l.last_seen < a.anchor_epoch_s
      |  ) WHERE rn <= 10
      |), cands AS (
      |  SELECT DISTINCT anchor_id, category_id FROM (
      |    SELECT * FROM prefix_cand
      |    UNION ALL SELECT * FROM covis_cand
      |    UNION ALL SELECT * FROM pop_cand
      |    UNION ALL SELECT * FROM hist_cand
      |  )
      |)""".stripMargin

  /** Whitespace tokens + word n-gram shingles over documents. */
  private def shingleCte(n: Int): String =
    s"""docs AS (
       |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks FROM documents
       |), sh AS (
       |  SELECT DISTINCT doc_id, array_to_string(toks[i:i+${n - 1}], ' ') AS shingle
       |  FROM docs, unnest(generate_series(1, len(toks) - ${n - 1})) AS t(i)
       |)""".stripMargin

  /** The q42 near-dup machinery as a reusable CTE chain (must follow a
    * `WITH RECURSIVE`): 4-gram shingles → 16-lane MinHash → 4-band LSH
    * (bucket cap 100) → exact Jaccard verify ≥ 0.5 → recursive-CTE
    * connected components ending in `comp(id, component)`.
    */
  private val neardupComponentsCte: String = {
    val sigCols = (0 until 16).map(i => s"    min(md5('s$i|' || shingle)) AS h$i").mkString(",\n")
    val bandSelects = (0 until 4)
      .map { b =>
        val key = (0 until 4).map(r => s"h${4 * b + r}").mkString(" || '|' || ")
        s"SELECT doc_id, $b AS band_idx, md5($key) AS band_key FROM sig"
      }
      .mkString("\nUNION ALL\n")
    s"""${shingleCte(4)}, sizes AS (
       |  SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
       |), sig AS (
       |  SELECT doc_id,
       |$sigCols
       |  FROM sh GROUP BY doc_id
       |), bands AS (
       |$bandSelects
       |), ok AS (
       |  SELECT band_idx, band_key FROM bands GROUP BY band_idx, band_key HAVING COUNT(*) <= 100
       |), keptb AS (
       |  SELECT b.* FROM bands b JOIN ok USING (band_idx, band_key)
       |), pairs AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM keptb a JOIN keptb b
       |    ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.doc_id < b.doc_id
       |), inter AS (
       |  SELECT p.id_a, p.id_b, COUNT(*) AS inter_count
       |  FROM pairs p
       |  JOIN sh sa ON sa.doc_id = p.id_a
       |  JOIN sh sb ON sb.doc_id = p.id_b AND sb.shingle = sa.shingle
       |  GROUP BY p.id_a, p.id_b
       |), verified AS (
       |  SELECT i.id_a, i.id_b FROM inter i
       |  JOIN sizes za ON za.doc_id = i.id_a
       |  JOIN sizes zb ON zb.doc_id = i.id_b
       |  WHERE floor(i.inter_count * 1000000 / (za.n + zb.n - i.inter_count)) >= 500000
       |), edges AS (
       |  SELECT id_a AS src, id_b AS dst FROM verified
       |  UNION ALL
       |  SELECT id_b AS src, id_a AS dst FROM verified
       |), reach(id, peer) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT r.id, e.dst FROM reach r JOIN edges e ON r.peer = e.src
       |), comp AS (
       |  SELECT id, MIN(peer) AS component FROM reach GROUP BY id
       |)""".stripMargin
  }

  /** Quantized-embedding CTE body: vec_id + round(x*10000) BIGINT list. */
  private val quantCte =
    """qv AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS v
      |  FROM embeddings
      |)""".stripMargin

  private def dotSql(a: String, b: String, dim: Int): String =
    s"list_sum(list_transform(generate_series(1, $dim), i -> $a[i] * $b[i]))"

  private def norm2Sql(a: String): String =
    s"list_sum(list_transform($a, x -> x * x))"

  private def cosineSql(a: String, b: String, dim: Int): String =
    s"""CAST(${dotSql(a, b, dim)} AS DOUBLE) /
       |      sqrt(CAST(${norm2Sql(a)} AS DOUBLE)) / sqrt(CAST(${norm2Sql(b)} AS DOUBLE))""".stripMargin

  /** The same md5-derived hyperplane constants as Similarity.lshBucket,
    * embedded as literal plane vectors; bucket = packed sign bits.
    */
  private def bucketSql(v: String, planes: Int, dim: Int, planeOffset: Int = 0): String = {
    import graft.similarity.Similarity.planeComponent
    (0 until planes)
      .map { p =>
        val plane =
          (0 until dim).map(i => planeComponent(planeOffset + p, i)).mkString("[", ",", "]")
        s"(CASE WHEN ${dotSql(v, s"($plane)", dim)} > 0 THEN ${1L << p} ELSE 0 END)"
      }
      .mkString("(", " +\n      ", ")")
  }

  /** Integer-L2 cell assignment: rn over (2·v·c − ||c||²) DESC, cid ASC. */
  private def assignSql(vecs: String, cents: String, idC: String, dim: Int): String =
    s"""SELECT $idC, v, cid FROM (
       |  SELECT q.vec_id AS $idC, q.v, s.cid,
       |    ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
       |      2 * ${dotSql("q.v", "s.cq", dim)} - ${norm2Sql("s.cq")} DESC, s.cid ASC) AS rn
       |  FROM $vecs q CROSS JOIN $cents s
       |)""".stripMargin

  /** Per-doc 32-bit SimHash (majority vote of md5-derived token-hash
    * bits, frequency-weighted) — ends with table `simhashed(doc_id,
    * simhash)`.
    */
  private val simhashCte: String =
    s"""toks AS (
       |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok FROM documents
       |), w AS (
       |  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS w,
       |         CAST(('0x' || substring(md5(tok), 1, 8)) AS BIGINT) AS h
       |  FROM toks GROUP BY doc_id, tok
       |), v AS (
       |  SELECT doc_id,
       |${(0 until 32)
        .map(b => s"    SUM(CASE WHEN (h >> $b) & 1 = 1 THEN w ELSE -w END) AS v$b")
        .mkString(",\n")}
       |  FROM w GROUP BY doc_id
       |), simhashed AS (
       |  SELECT doc_id,
       |    CAST(${(0 until 32)
        .map(b => s"(CASE WHEN v$b > 0 THEN ${1L << b} ELSE 0 END)")
        .mkString(" + ")} AS BIGINT) AS simhash
       |  FROM v
       |)""".stripMargin

  private def substrCountSql(padded: String, needle: String): String =
    s"CAST((length($padded) - length(replace($padded, '$needle', ''))) / ${needle.length} AS BIGINT)"

  /** `rounds` rounds of k-core peeling over `e0(src, dst)` — each round
    * keeps vertices with degree ≥ k, then edges with both endpoints
    * alive. Ends in edge table `e<rounds>` (mirrors Graph.kCorePeel).
    */
  private def kcorePeelCte(k: Int, rounds: Int): String =
    (1 to rounds)
      .map { r =>
        s"""d$r AS (
           |  SELECT id FROM (
           |    SELECT src AS id FROM e${r - 1} UNION ALL SELECT dst FROM e${r - 1}
           |  ) GROUP BY id HAVING COUNT(*) >= $k
           |), e$r AS (
           |  SELECT e.src, e.dst FROM e${r - 1} e
           |  JOIN d$r x ON e.src = x.id JOIN d$r y ON e.dst = y.id
           |)""".stripMargin
      }
      .mkString(", ")

  /** One BPE round over `s<r-1>(wc, seq)` — pair counts from the
    * double-separator symbol encoding, lexicographic-tie argmax, greedy
    * left-to-right merge rewrite. Ends in tables `b<r>` (the winning
    * merge) and `s<r>` (rewritten sequences). Mirrors Bpe.learnMerges.
    */
  private def bpeRoundCte(r: Int): String =
    s"""p$r AS (
       |  SELECT s[i] AS a, s[i + 1] AS b, SUM(wc) AS c
       |  FROM (SELECT wc, string_split(trim(seq), '  ') AS s FROM s${r - 1}),
       |       unnest(generate_series(1, len(s) - 1)) AS t(i)
       |  GROUP BY 1, 2
       |), b$r AS (
       |  SELECT a, b, c FROM p$r ORDER BY c DESC, a ASC, b ASC LIMIT 1
       |), s$r AS (
       |  SELECT wc, replace(seq, (SELECT ' ' || a || '  ' || b || ' ' FROM b$r),
       |                          (SELECT ' ' || a || b || ' ' FROM b$r)) AS seq
       |  FROM s${r - 1}
       |)""".stripMargin

  /** One BPE round like [[bpeRoundCte]] but carrying the WORD key
    * through every rewrite — the encode path (q288) joins the final
    * sequences back to the corpus, so `w` must survive all rounds.
    */
  private def bpeEncodeRoundCte(r: Int): String =
    s"""p$r AS (
       |  SELECT s[i] AS a, s[i + 1] AS b, SUM(wc) AS c
       |  FROM (SELECT wc, string_split(trim(seq), '  ') AS s FROM s${r - 1}),
       |       unnest(generate_series(1, len(s) - 1)) AS t(i)
       |  GROUP BY 1, 2
       |), b$r AS (
       |  SELECT a, b FROM p$r ORDER BY c DESC, a ASC, b ASC LIMIT 1
       |), s$r AS (
       |  SELECT w, wc, replace(seq, (SELECT ' ' || a || '  ' || b || ' ' FROM b$r),
       |                             (SELECT ' ' || a || b || ' ' FROM b$r)) AS seq
       |  FROM s${r - 1}
       |)""".stripMargin

  /** One FD's g3-style violation stats (q286): per-lhs majority rhs
    * (ties to smallest rhs) joined to per-lhs totals. Mirrors
    * graft.ops.Profile.fdViolations.
    */
  private def fdAuditSql(tag: String, table: String, lhs: String, rhs: String): String =
    s"""SELECT '$tag' AS fd,
       |  CAST(SUM(t.n_l) AS BIGINT) AS n_rows,
       |  CAST(COUNT(*) AS BIGINT) AS n_lhs,
       |  CAST(SUM(m.n) AS BIGINT) AS n_majority
       |FROM (
       |  SELECT l, n, ROW_NUMBER() OVER (PARTITION BY l ORDER BY n DESC, r ASC) AS rn
       |  FROM (SELECT $lhs AS l, CAST($rhs AS VARCHAR) AS r, COUNT(*) AS n
       |        FROM $table WHERE $lhs IS NOT NULL AND $rhs IS NOT NULL GROUP BY 1, 2)
       |) m JOIN (
       |  SELECT $lhs AS l, COUNT(*) AS n_l FROM $table
       |  WHERE $lhs IS NOT NULL AND $rhs IS NOT NULL GROUP BY 1
       |) t USING (l) WHERE m.rn = 1""".stripMargin

  /** One column pair's MI/entropy block (q289), CTE names suffixed by
    * `i` so two pairs coexist in one WITH. Mirrors
    * graft.ops.Stats.mutualInfoNano (the q227 rounding conventions).
    */
  private def miPairSql(i: Int, tag: String, table: String, x: String, y: String): String =
    s"""cells$i AS (
       |  SELECT CAST($x AS VARCHAR) AS x, CAST($y AS VARCHAR) AS y,
       |    CAST(COUNT(*) AS BIGINT) AS nij
       |  FROM $table WHERE $x IS NOT NULL AND $y IS NOT NULL GROUP BY 1, 2
       |), nt$i AS (SELECT CAST(SUM(nij) AS BIGINT) AS n FROM cells$i),
       |rws$i AS (SELECT x, CAST(SUM(nij) AS BIGINT) AS ni FROM cells$i GROUP BY 1),
       |cls$i AS (SELECT y, CAST(SUM(nij) AS BIGINT) AS nj FROM cells$i GROUP BY 1),
       |mi$i AS (
       |  SELECT CAST(SUM(CAST(round(CAST(nij AS DOUBLE) / CAST(n AS DOUBLE)
       |    * ln(CAST(n AS DOUBLE) * CAST(nij AS DOUBLE)
       |         / (CAST(ni AS DOUBLE) * CAST(nj AS DOUBLE)))
       |    * 1000000000) AS BIGINT)) AS BIGINT) AS mi_nano
       |  FROM cells$i JOIN rws$i USING (x) JOIN cls$i USING (y) CROSS JOIN nt$i
       |), hx$i AS (
       |  SELECT CAST(SUM(CAST(round(CAST(ni AS DOUBLE) / CAST(n AS DOUBLE)
       |    * ln(CAST(n AS DOUBLE) / CAST(ni AS DOUBLE))
       |    * 1000000000) AS BIGINT)) AS BIGINT) AS h_x_nano
       |  FROM rws$i CROSS JOIN nt$i
       |), hy$i AS (
       |  SELECT CAST(SUM(CAST(round(CAST(nj AS DOUBLE) / CAST(n AS DOUBLE)
       |    * ln(CAST(n AS DOUBLE) / CAST(nj AS DOUBLE))
       |    * 1000000000) AS BIGINT)) AS BIGINT) AS h_y_nano
       |  FROM cls$i CROSS JOIN nt$i
       |), out$i AS (
       |  SELECT '$tag' AS pair, nt$i.n, mi_nano, h_x_nano, h_y_nano,
       |    CASE WHEN h_x_nano + h_y_nano = 0 THEN NULL
       |     ELSE CAST(round(2.0 * CAST(mi_nano AS DOUBLE)
       |       / CAST(h_x_nano + h_y_nano AS DOUBLE) * 1000000) AS BIGINT) END AS nmi_micro
       |  FROM nt$i CROSS JOIN mi$i CROSS JOIN hx$i CROSS JOIN hy$i
       |)""".stripMargin

  private def langScoreSql(markers: Seq[String]): String =
    markers
      .map(m => substrCountSql("(' ' || text || ' ')", s" $m "))
      .mkString("(", " + ", ")")

  /** DuckDB INLINES chained CTEs by default: in an iterative oracle
    * (k-truss peel rounds, label-propagation rounds) every round's CTE
    * re-expands its whole upstream chain per reference, so the events
    * scan + sessionize re-run ~refs^rounds times — q193 measured
    * 101 s inlined vs 0.1 s materialized at sf0.01, bit-identical
    * rows (and the oriented-rewrite attempt hit EMFILE from ~33^3
    * expanded scans before this was diagnosed). `AS MATERIALIZED`
    * pins each CTE to one evaluation. Applied ONLY to the verified
    * iterative cohort: recursive CTEs can't take the keyword, and the
    * flat single-pass oracles gain nothing.
    */
  private val materializedCteOracles: Set[String] = Set(
    "q140_kcore", "q157_communities", "q173_hits", "q193_ktruss",
    "q215_community_purity", "q227_community_nmi", "q270_mutual_knn",
    "q277_knn_outliers", "q287_modularity", "q313_kmeans")

  private[graft] def materializeCtes(sql: String): String = {
    // A real WITH-chain walk, not a regex: the previous `),\s*\w+ AS (`
    // anchor still matched the 2nd+ definitions of a multi-definition
    // WINDOW clause (`WINDOW a AS (...), b AS (...)` — q74's oracle has
    // the shape), which would silently produce invalid DuckDB SQL if
    // such an oracle joined the cohort (ADVICE r15, completed r16).
    // Walk: after WITH, rewrite `name AS (`, skip the balanced-paren
    // body, continue while the next token is `,`. WINDOW clauses live
    // inside CTE bodies or after the chain's final SELECT — never at a
    // chain position — so the walk cannot touch them. Parse failure
    // throws: a silently-unrewritten cohort oracle re-inlines its CTE
    // chain refs^rounds times (the q193 101 s pathology).
    val s = sql
    def skipWs(i0: Int): Int = {
      var i = i0; while (i < s.length && s(i).isWhitespace) i += 1; i
    }
    require(s.startsWith("WITH"),
      s"materializeCtes: cohort oracle must start with WITH: ${s.take(40)}")
    val out = new StringBuilder
    var prev = 0            // copied-through watermark
    var i = skipWs(4)       // after "WITH"
    var more = true
    while (more) {
      val nameStart = i
      while (i < s.length && (s(i).isLetterOrDigit || s(i) == '_')) i += 1
      require(i > nameStart, s"materializeCtes: expected CTE name at $nameStart")
      i = skipWs(i)
      require(s.regionMatches(true, i, "AS", 0, 2),
        s"materializeCtes: expected AS after CTE name at $i")
      i = skipWs(i + 2)
      require(i < s.length && s(i) == '(',
        s"materializeCtes: expected ( after AS at $i")
      out.append(s.substring(prev, i)).append("MATERIALIZED ")
      prev = i
      var depth = 0
      do {                  // skip the balanced-paren CTE body
        s(i) match {
          case '(' => depth += 1
          case ')' => depth -= 1
          case '\'' =>      // string literal: parens inside don't count
            i += 1
            while (i < s.length && s(i) != '\'') i += 1
            require(i < s.length, "materializeCtes: unterminated literal")
          case _ =>
        }
        i += 1
        require(i <= s.length, "materializeCtes: unbalanced parens")
      } while (depth > 0)
      i = skipWs(i)
      if (i < s.length && s(i) == ',') { i = skipWs(i + 1) } else more = false
    }
    out.append(s.substring(prev)).toString
  }

  def oracleSql: Map[String, String] = rawOracleSql.map { case (k, v) =>
    (k, if (materializedCteOracles(k)) materializeCtes(v) else v)
  }

  private def rawOracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  COUNT(*) AS n_rows,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS sum_price,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
        |           (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DECIMAL(30,4)) AS DOUBLE)
        |    AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_filter_project" ->
      """SELECT l_orderkey AS orderkey,
        |  CAST(l_linenumber AS BIGINT) AS linenumber,
        |  l_partkey AS partkey,
        |  CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents,
        |  CAST(l_shipdate AS DATE) AS shipdate
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |ORDER BY orderkey, linenumber""".stripMargin,
    "q03_join_agg" ->
      """SELECT c_mktsegment, o_orderpriority,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment, o_orderpriority
        |ORDER BY c_mktsegment, o_orderpriority""".stripMargin,
    "q04_left_join_defaults" ->
      """WITH per_cust AS (
        |  SELECT o_custkey, COUNT(*) AS n_orders,
        |         CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE) AS total_spent
        |  FROM orders GROUP BY o_custkey
        |)
        |SELECT c_custkey,
        |  COALESCE(n_orders, 0) AS n_orders,
        |  COALESCE(total_spent, 0.0) AS total_spent
        |FROM customer LEFT JOIN per_cust ON c_custkey = o_custkey
        |ORDER BY c_custkey""".stripMargin,
    "q05_global_topk" ->
      """SELECT l_partkey, COUNT(*) AS cnt FROM lineitem
        |GROUP BY l_partkey ORDER BY cnt DESC, l_partkey ASC LIMIT 20""".stripMargin,
    "q06_topk_per_group" ->
      """WITH rev AS (
        |  SELECT l_suppkey, l_partkey,
        |         CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS revenue
        |  FROM lineitem GROUP BY l_suppkey, l_partkey
        |), r AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY l_suppkey ORDER BY revenue DESC, l_partkey ASC) AS rn
        |  FROM rev
        |)
        |SELECT l_suppkey, l_partkey, revenue, CAST(rn AS BIGINT) AS rn
        |FROM r WHERE rn <= 3 ORDER BY l_suppkey, rn""".stripMargin,
    "q07_latest_per_key" ->
      """WITH r AS (
        |  SELECT o_custkey, o_orderkey, o_orderdate,
        |         ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey ASC) AS rn
        |  FROM orders
        |)
        |SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS orderdate
        |FROM r WHERE rn = 1 ORDER BY o_custkey""".stripMargin,
    "q08_union_distinct" ->
      """SELECT DISTINCT custkey FROM (
        |  SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |  UNION ALL
        |  SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 100000.0
        |) ORDER BY custkey""".stripMargin,
    "q09_count_distinct" ->
      """SELECT c_mktsegment,
        |  CAST(COUNT(DISTINCT c_nationkey) AS BIGINT) AS n_nations,
        |  COUNT(*) AS n_cust
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q10_conditional_agg" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_high_disc,
        |  MAX(CASE WHEN l_discount > 0.05 THEN l_quantity END) AS max_qty_high_disc,
        |  CAST(SUM(CASE WHEN l_tax > 0.04 THEN 1 ELSE 0 END) AS BIGINT) AS n_high_tax
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q11_two_level_agg" ->
      """WITH per_cust AS (
        |  SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey
        |)
        |SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
        |  COUNT(*) AS n_cust,
        |  AVG(n_orders) AS avg_orders
        |FROM customer JOIN per_cust ON c_custkey = o_custkey
        |GROUP BY nationkey ORDER BY nationkey""".stripMargin,
    "q12_composite_join" ->
      """WITH agg AS (
        |  SELECT l_orderkey AS orderkey, l_partkey AS partkey,
        |         COUNT(*) AS n_lines,
        |         CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS grp_qty
        |  FROM lineitem GROUP BY 1, 2
        |)
        |SELECT li.l_orderkey AS orderkey, li.l_partkey AS partkey,
        |  CAST(li.l_linenumber AS BIGINT) AS linenumber, agg.n_lines, agg.grp_qty
        |FROM lineitem li JOIN agg ON li.l_orderkey = agg.orderkey AND li.l_partkey = agg.partkey
        |WHERE agg.n_lines >= 2
        |ORDER BY orderkey, partkey, linenumber""".stripMargin,
    "q13_describe_stats" ->
      """SELECT COUNT(*) AS n_rows,
        |  CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
        |  MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sum_qty,
        |  CAST(MIN(l_shipdate) AS DATE) AS min_shipdate,
        |  CAST(MAX(l_shipdate) AS DATE) AS max_shipdate
        |FROM lineitem""".stripMargin,
    "q14_label_stats" ->
      """SELECT CAST(label AS BIGINT) AS label, COUNT(*) AS n
        |FROM embeddings GROUP BY label ORDER BY label""".stripMargin,
    "q15_sessionize" ->
      s"""WITH $sessCte
         |SELECT session_id, user_id,
         |  COUNT(*) AS n_events,
         |  MIN(epoch_s) AS session_start_s,
         |  MAX(epoch_s) AS session_end_s,
         |  MAX(epoch_s) - MIN(epoch_s) AS session_dur_s
         |FROM sess
         |GROUP BY session_id, user_id
         |ORDER BY user_id, session_start_s, session_id""".stripMargin,
    "q16_user_session_stats" ->
      s"""WITH $sessCte, per_session AS (
         |  SELECT session_id, user_id, COUNT(*) AS n_events,
         |         MAX(epoch_s) - MIN(epoch_s) AS session_dur_s
         |  FROM sess GROUP BY session_id, user_id
         |)
         |SELECT user_id,
         |  CAST(COUNT(DISTINCT session_id) AS BIGINT) AS n_sessions,
         |  CAST(SUM(n_events) AS BIGINT) AS n_events,
         |  AVG(session_dur_s) AS avg_session_dur_s,
         |  MAX(session_dur_s) AS max_session_dur_s
         |FROM per_session GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q17_lag_gaps" ->
      s"""WITH $sessCte
         |SELECT event_id, user_id,
         |  epoch_s - prev_s AS gap_s,
         |  CAST(is_new AS BIGINT) AS is_new_session
         |FROM sess ORDER BY event_id""".stripMargin,
    "q18_running_sums" ->
      """WITH e AS (
        |  SELECT event_id, user_id,
        |         CAST(floor(extract(epoch FROM ts)) AS BIGINT) AS epoch_s,
        |         CAST(round(value * 100) AS BIGINT) AS value_cents
        |  FROM events
        |)
        |SELECT event_id, user_id,
        |  CAST(SUM(value_cents) OVER w AS BIGINT) AS cum_value_cents,
        |  COUNT(*) OVER w AS cum_events
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_s, event_id ROWS UNBOUNDED PRECEDING)
        |ORDER BY event_id""".stripMargin,
    "q19_covis_pairs" ->
      s"""WITH $sessCte, $covisPairsCte
         |SELECT item_a, item_b, pair_count FROM pairs
         |ORDER BY item_a, item_b""".stripMargin,
    "q20_prefix_stats" ->
      s"""WITH $sessCte
         |SELECT a.anchor_id,
         |  COUNT(*) AS n_prefix_events,
         |  CAST(COUNT(DISTINCT e.item_id) AS BIGINT) AS n_prefix_items,
         |  MAX(e.epoch_s) AS last_prefix_epoch_s
         |FROM anchors a JOIN enr e ON a.session_id = e.session_id AND e.epoch_s < a.anchor_epoch_s
         |GROUP BY a.anchor_id ORDER BY a.anchor_id""".stripMargin,
    "q21_popularity_candidates" ->
      s"""WITH $sessCte, top AS (
         |  SELECT category_id FROM enr GROUP BY category_id
         |  ORDER BY CAST(COUNT(DISTINCT session_id) AS BIGINT) DESC, category_id ASC LIMIT 5
         |)
         |SELECT anchors.anchor_id, top.category_id FROM anchors CROSS JOIN top
         |ORDER BY anchors.anchor_id, top.category_id""".stripMargin,
    "q22_user_history" ->
      s"""WITH $sessCte, last_seen AS (
         |  SELECT user_id, category_id, MAX(epoch_s) AS last_seen FROM enr GROUP BY 1, 2
         |), j AS (
         |  SELECT a.anchor_id, l.category_id, l.last_seen,
         |    ROW_NUMBER() OVER (PARTITION BY a.anchor_id ORDER BY l.last_seen DESC, l.category_id ASC) AS rn
         |  FROM anchors a JOIN last_seen l ON a.user_id = l.user_id AND l.last_seen < a.anchor_epoch_s
         |)
         |SELECT anchor_id, category_id FROM j WHERE rn <= 10
         |ORDER BY anchor_id, category_id""".stripMargin,
    "q23_candidates" ->
      s"""WITH $sessCte, $candidatesCte
         |SELECT anchor_id, category_id FROM cands
         |ORDER BY anchor_id, category_id""".stripMargin,
    "q24_session_item_seq" ->
      s"""WITH $sessCte
         |SELECT session_id,
         |  COALESCE(string_agg(CAST(item_id AS VARCHAR), ',' ORDER BY epoch_s, event_id), '') AS item_seq,
         |  COUNT(*) AS n_events
         |FROM sess GROUP BY session_id ORDER BY session_id""".stripMargin,
    "q25_scalar_functions" ->
      """SELECT event_id,
        |  CAST(floor(extract(epoch FROM ts)) AS BIGINT) AS epoch_s,
        |  CAST(hour(ts) AS BIGINT) AS hour_of_day,
        |  CAST(dayofweek(ts) + 1 AS BIGINT) AS day_of_week,
        |  CASE WHEN dayofweek(ts) IN (0, 6) THEN CAST(1 AS BIGINT) ELSE 0 END AS is_weekend,
        |  round(ln(1 + value), 6) AS log1p_value,
        |  greatest(value, 50.0) AS value_floor50,
        |  CAST(user_id AS VARCHAR) || '_' || event_type AS user_event,
        |  TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS item_id,
        |  COALESCE(TRY_CAST(json_extract_string(props, '$.missing') AS BIGINT), -1) AS missing_default
        |FROM events ORDER BY event_id""".stripMargin,
    "q26_features" ->
      s"""WITH $sessCte, prefix AS (
         |  SELECT a.anchor_id, a.anchor_epoch_s, e.epoch_s, e.item_id, e.category_id AS pcat
         |  FROM anchors a JOIN enr e ON a.session_id = e.session_id AND e.epoch_s < a.anchor_epoch_s
         |), prefix_cand AS (
         |  SELECT DISTINCT anchor_id, pcat AS category_id FROM prefix
         |), di AS (
         |  SELECT DISTINCT session_id, category_id FROM enr
         |), pairs AS (
         |  SELECT a.category_id AS item_a, b.category_id AS item_b, COUNT(*) AS pair_count
         |  FROM di a JOIN di b ON a.session_id = b.session_id AND a.category_id < b.category_id
         |  GROUP BY 1, 2 HAVING COUNT(*) >= 2
         |), directed AS (
         |  SELECT item_a AS src, item_b AS dst, pair_count FROM pairs
         |  UNION ALL
         |  SELECT item_b AS src, item_a AS dst, pair_count FROM pairs
         |), top_directed AS (
         |  SELECT src, dst FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY src ORDER BY pair_count DESC, dst ASC) AS rn
         |    FROM directed
         |  ) WHERE rn <= 10
         |), covis_cand AS (
         |  SELECT DISTINCT p.anchor_id, t.dst AS category_id
         |  FROM prefix_cand p JOIN top_directed t ON p.category_id = t.src
         |), top_pop AS (
         |  SELECT category_id FROM enr GROUP BY category_id
         |  ORDER BY CAST(COUNT(DISTINCT session_id) AS BIGINT) DESC, category_id ASC LIMIT 5
         |), pop_cand AS (
         |  SELECT anchors.anchor_id, top_pop.category_id FROM anchors CROSS JOIN top_pop
         |), last_seen AS (
         |  SELECT user_id, category_id, MAX(epoch_s) AS last_seen FROM enr GROUP BY 1, 2
         |), hist_cand AS (
         |  SELECT anchor_id, category_id FROM (
         |    SELECT a.anchor_id, l.category_id,
         |      ROW_NUMBER() OVER (PARTITION BY a.anchor_id ORDER BY l.last_seen DESC, l.category_id ASC) AS rn
         |    FROM anchors a JOIN last_seen l ON a.user_id = l.user_id AND l.last_seen < a.anchor_epoch_s
         |  ) WHERE rn <= 10
         |), cand AS (
         |  SELECT DISTINCT anchor_id, category_id FROM (
         |    SELECT * FROM prefix_cand
         |    UNION ALL SELECT * FROM covis_cand
         |    UNION ALL SELECT * FROM pop_cand
         |    UNION ALL SELECT * FROM hist_cand
         |  )
         |), base AS (
         |  SELECT c.anchor_id, c.category_id, a.session_id, a.user_id,
         |         a.anchor_epoch_s, a.category_id AS true_category
         |  FROM cand c JOIN anchors a ON c.anchor_id = a.anchor_id
         |), prefix_stats AS (
         |  SELECT anchor_id,
         |    CAST(COUNT(DISTINCT item_id) AS BIGINT) AS n_prefix_items,
         |    COUNT(*) AS n_prefix_events,
         |    MAX(epoch_s) AS last_prefix_epoch_s
         |  FROM prefix GROUP BY anchor_id
         |), prefix_cat_stats AS (
         |  SELECT anchor_id, pcat AS category_id,
         |    COUNT(*) AS cat_count_in_prefix,
         |    MAX(epoch_s) AS cat_last_epoch_s
         |  FROM prefix GROUP BY 1, 2
         |), cat_pop AS (
         |  SELECT category_id, CAST(COUNT(DISTINCT session_id) AS BIGINT) AS cat_pop
         |  FROM enr GROUP BY category_id
         |), user_cat_aff AS (
         |  SELECT user_id, category_id, CAST(COUNT(DISTINCT session_id) AS BIGINT) AS user_cat_sessions
         |  FROM enr GROUP BY 1, 2
         |), per_session AS (
         |  SELECT user_id, session_id, MAX(epoch_s) - MIN(epoch_s) AS session_dur_s
         |  FROM enr GROUP BY 1, 2
         |), user_stats AS (
         |  SELECT user_id,
         |    CAST(COUNT(DISTINCT session_id) AS BIGINT) AS user_n_sessions,
         |    CAST(SUM(session_dur_s) AS DOUBLE) / COUNT(*) AS user_avg_session_dur
         |  FROM per_session GROUP BY user_id
         |)
         |SELECT b.anchor_id, b.category_id, b.user_id, b.session_id,
         |  COALESCE(ps.n_prefix_items, 0) AS n_prefix_items,
         |  COALESCE(ps.n_prefix_events, 0) AS n_prefix_events,
         |  COALESCE(pcs.cat_count_in_prefix, 0) AS cat_count_in_prefix,
         |  CAST(COALESCE(pcs.cat_count_in_prefix, 0) AS DOUBLE) /
         |    greatest(COALESCE(ps.n_prefix_events, 0), 1) AS cat_share_in_prefix,
         |  COALESCE(b.anchor_epoch_s - pcs.cat_last_epoch_s, -1) AS recency_s,
         |  COALESCE(cp.cat_pop, 0) AS cat_pop,
         |  round(ln(1 + COALESCE(cp.cat_pop, 0)), 6) AS log_cat_pop,
         |  COALESCE(uca.user_cat_sessions, 0) AS user_cat_sessions,
         |  COALESCE(us.user_n_sessions, 0) AS user_n_sessions,
         |  COALESCE(us.user_avg_session_dur, 0.0) AS user_avg_session_dur,
         |  CAST(hour(make_timestamp(b.anchor_epoch_s * 1000000)) AS BIGINT) AS hour_of_day,
         |  CAST(dayofweek(make_timestamp(b.anchor_epoch_s * 1000000)) + 1 AS BIGINT) AS day_of_week,
         |  CASE WHEN dayofweek(make_timestamp(b.anchor_epoch_s * 1000000)) IN (0, 6)
         |       THEN CAST(1 AS BIGINT) ELSE 0 END AS is_weekend,
         |  CASE WHEN b.category_id = b.true_category THEN CAST(1 AS BIGINT) ELSE 0 END AS y
         |FROM base b
         |LEFT JOIN prefix_stats ps ON b.anchor_id = ps.anchor_id
         |LEFT JOIN prefix_cat_stats pcs ON b.anchor_id = pcs.anchor_id AND b.category_id = pcs.category_id
         |LEFT JOIN cat_pop cp ON b.category_id = cp.category_id
         |LEFT JOIN user_cat_aff uca ON b.user_id = uca.user_id AND b.category_id = uca.category_id
         |LEFT JOIN user_stats us ON b.user_id = us.user_id
         |ORDER BY b.anchor_id, b.category_id""".stripMargin,
    "q27_dedup_exact" ->
      """SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
        |  MIN(doc_id) AS survivor_id, COUNT(*) AS dup_count
        |FROM documents GROUP BY fp ORDER BY fp""".stripMargin,
    "q28_ngram_jaccard" ->
      s"""WITH ${shingleCte(4)}, sizes AS (
         |  SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
         |), cand AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter_count
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2
         |)
         |SELECT id_a, id_b, inter_count,
         |  sa.n + sb.n - inter_count AS union_count,
         |  CAST(floor(inter_count * 1000000 / (sa.n + sb.n - inter_count)) AS BIGINT) AS jaccard_ppm
         |FROM cand
         |JOIN sizes sa ON id_a = sa.doc_id
         |JOIN sizes sb ON id_b = sb.doc_id
         |ORDER BY jaccard_ppm DESC, id_a, id_b LIMIT 50""".stripMargin,
    "q29_minhash_bands" ->
      s"""WITH ${shingleCte(3)}, sig AS (
         |  SELECT doc_id,
         |${(0 until 8).map(i => s"    min(md5('s$i|' || shingle)) AS h$i").mkString(",\n")}
         |  FROM sh GROUP BY doc_id
         |)
         |${(0 until 4)
          .map(b =>
            s"SELECT doc_id, CAST($b AS BIGINT) AS band_idx, md5(h${2 * b} || '|' || h${2 * b + 1}) AS band_key FROM sig")
          .mkString("", "\nUNION ALL\n", "")}
         |ORDER BY doc_id, band_idx""".stripMargin,
    "q30_simhash" ->
      s"""WITH $simhashCte
         |SELECT doc_id, simhash FROM simhashed ORDER BY doc_id""".stripMargin,
    "q31_knn_cosine" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id,
        |         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS qv
        |  FROM embeddings WHERE vec_id < 8
        |), c AS (
        |  SELECT vec_id AS neighbor_id,
        |         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS cv
        |  FROM embeddings
        |), scored AS (
        |  SELECT query_id, neighbor_id,
        |    CAST(list_sum(list_transform(generate_series(1, 64), i -> qv[i] * cv[i])) AS DOUBLE) /
        |      sqrt(CAST(list_sum(list_transform(qv, x -> x * x)) AS DOUBLE)) /
        |      sqrt(CAST(list_sum(list_transform(cv, x -> x * x)) AS DOUBLE)) AS cosine_sim
        |  FROM c CROSS JOIN q WHERE neighbor_id <> query_id
        |), r AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id ASC) AS rn
        |  FROM scored
        |)
        |SELECT query_id, neighbor_id, cosine_sim, CAST(rn AS BIGINT) AS rn
        |FROM r WHERE rn <= 5 ORDER BY query_id, rn""".stripMargin,
    "q32_lang_id" -> {
      val best = TQ.langMarkers.map { case (l, _) => s"s_$l" }.mkString("greatest(", ", ", ")")
      s"""WITH scored AS (
         |  SELECT doc_id,
         |${TQ.langMarkers
          .map { case (l, ms) => s"    ${langScoreSql(ms)} AS s_$l" }
          .mkString(",\n")}
         |  FROM documents
         |)
         |SELECT doc_id,
         |  CASE ${TQ.langMarkers
          .map { case (l, _) => s"WHEN s_$l = $best AND $best > 0 THEN '$l'" }
          .mkString(" ")} ELSE 'und' END AS pred_lang,
         |  s_en AS en_score
         |FROM scored ORDER BY doc_id""".stripMargin
    },
    "q33_quality_score" -> {
      val stop = langScoreSql(Seq("the", "a", "and", "of"))
      s"""WITH t AS (
         |  SELECT doc_id, text,
         |    CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
         |    $stop AS n_stop
         |  FROM documents
         |)
         |SELECT doc_id,
         |  CAST(length(text) AS BIGINT) AS n_chars,
         |  n_tokens,
         |  CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS BIGINT) AS n_punct,
         |  CAST(floor(length(regexp_replace(trim(text), '\\s+', '', 'g')) * 1000 / n_tokens) AS BIGINT)
         |    AS mean_token_len_milli,
         |  n_stop AS n_stopwords,
         |  CAST(floor(n_stop * 1000000 / n_tokens) AS BIGINT) AS stopword_ppm
         |FROM t ORDER BY doc_id""".stripMargin
    },
    "q34_token_stats" ->
      """SELECT doc_id,
        |  CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-z]+')) AS BIGINT) AS n_alpha_tokens,
        |  CAST(len(regexp_extract_all(lower(text), '''[a-z]+|[a-z]+|[0-9]+|[^a-z0-9\s]+')) AS BIGINT)
        |    AS n_bpeish_tokens,
        |  CAST(len(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS n_distinct_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q39_embedding_neardup" ->
      """WITH q AS (
        |  SELECT vec_id,
        |         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS v
        |  FROM embeddings WHERE vec_id < 300
        |), scored AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    CAST(list_sum(list_transform(generate_series(1, 64), i -> a.v[i] * b.v[i])) AS DOUBLE) /
        |      sqrt(CAST(list_sum(list_transform(a.v, x -> x * x)) AS DOUBLE)) /
        |      sqrt(CAST(list_sum(list_transform(b.v, x -> x * x)) AS DOUBLE)) AS cosine_sim
        |  FROM q a JOIN q b ON a.vec_id < b.vec_id
        |)
        |SELECT id_a, id_b, cosine_sim FROM scored
        |WHERE cosine_sim >= 0.4 ORDER BY id_a, id_b""".stripMargin,
    "q35_fingerprints" ->
      """WITH t AS (
        |  SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp FROM documents
        |)
        |SELECT doc_id, fp, CAST(('0x' || substring(fp, 1, 8)) AS BIGINT) AS fp32
        |FROM t ORDER BY doc_id""".stripMargin,
    // multi-table LSH (8 tables x 3 planes, global plane indices 0-23):
    // same literal hyperplanes, candidate union, exact rerank
    "q36_knn_lsh" ->
      s"""WITH $quantCte, b AS (
         |${(0 until 8)
          .map(t =>
            s"  SELECT vec_id, v, $t AS tbl, CAST(${bucketSql("v", 3, 64, t * 3)} AS BIGINT) AS bucket FROM qv")
          .mkString(" UNION ALL\n")}
         |), qb AS (
         |  SELECT vec_id, tbl, bucket FROM b WHERE vec_id < 64
         |  UNION ALL SELECT vec_id, tbl, CAST(xor(bucket, 1) AS BIGINT) AS bucket FROM b WHERE vec_id < 64
         |  UNION ALL SELECT vec_id, tbl, CAST(xor(bucket, 2) AS BIGINT) AS bucket FROM b WHERE vec_id < 64
         |), cand AS (
         |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
         |  FROM qb q JOIN b c ON q.tbl = c.tbl AND q.bucket = c.bucket AND c.vec_id <> q.vec_id
         |), scored AS (
         |  SELECT cand.query_id, cand.neighbor_id,
         |    ${cosineSql("qq.v", "cc.v", 64)} AS cosine_sim
         |  FROM cand
         |  JOIN qv qq ON qq.vec_id = cand.query_id
         |  JOIN qv cc ON cc.vec_id = cand.neighbor_id
         |), r AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id ASC) AS rn
         |  FROM scored
         |)
         |SELECT query_id, neighbor_id, cosine_sim FROM r WHERE rn <= 5
         |ORDER BY query_id, cosine_sim DESC, neighbor_id""".stripMargin,
    "q37_word2vec_vocab" ->
      s"""WITH $sessCte
         |SELECT category_id, CAST(16 AS BIGINT) AS dims
         |FROM enr GROUP BY category_id HAVING COUNT(*) >= 3
         |ORDER BY category_id""".stripMargin,
    "q38_multimodal_features" ->
      """SELECT doc_id,
        |  CAST(length(text) AS BIGINT) AS n_bytes,
        |  CAST(8 AS BIGINT) AS n_dims,
        |  CAST(len(list_filter(list_transform(generate_series(1, length(text)),
        |         i -> unicode(text[i])), c -> c % 8 = 0)) AS BIGINT) AS f0_count
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q40_embedding_neardup_lsh" ->
      s"""WITH $quantCte, b AS (
         |  SELECT vec_id, v, CAST(${bucketSql("v", 6, 64)} AS BIGINT) AS bucket FROM qv
         |), pairs AS (
         |  SELECT a.vec_id AS id_a, b2.vec_id AS id_b,
         |    ${cosineSql("a.v", "b2.v", 64)} AS cosine_sim
         |  FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
         |)
         |SELECT DISTINCT id_a, id_b, cosine_sim FROM pairs WHERE cosine_sim >= 0.4
         |ORDER BY id_a, id_b""".stripMargin,
    // 16 seeds, 6 probes, 2-cell spill lists (assigned rn <= 2) with a
    // DISTINCT pair collapse before ranking — mirrors nAssign = 2
    "q41_knn_ivf" ->
      s"""WITH $quantCte, ranked AS (
         |  SELECT vec_id, v, ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS srn
         |  FROM qv
         |), seeds AS (
         |  SELECT CAST(srn - 1 AS BIGINT) AS cid, v AS cq FROM ranked WHERE srn <= 16
         |), a0 AS (
         |  ${assignSql("qv", "seeds", "vid", 64)} WHERE rn = 1
         |), centd AS (
         |  SELECT cid, i, CAST(floor(CAST(SUM(v[i]) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cv
         |  FROM a0, unnest(generate_series(1, 64)) AS t(i)
         |  GROUP BY cid, i
         |), cent AS (
         |  SELECT cid, list(cv ORDER BY i) AS cq FROM centd GROUP BY cid
         |), assigned AS (
         |  ${assignSql("qv", "cent", "vid", 64)} WHERE rn <= 2
         |), queries AS (
         |  SELECT vec_id, v FROM qv WHERE vec_id < 64
         |), probes AS (
         |  ${assignSql("queries", "cent", "query_id", 64)} WHERE rn <= 6
         |), scored AS (
         |  SELECT DISTINCT p.query_id, a.vid AS neighbor_id,
         |    ${cosineSql("p.v", "a.v", 64)} AS cosine_sim
         |  FROM probes p JOIN assigned a ON p.cid = a.cid AND a.vid <> p.query_id
         |), r AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id ASC) AS rn
         |  FROM scored
         |)
         |SELECT query_id, neighbor_id, cosine_sim FROM r WHERE rn <= 5
         |ORDER BY query_id, cosine_sim DESC, neighbor_id""".stripMargin,
    "q42_neardup_dedup" ->
      s"""WITH RECURSIVE $neardupComponentsCte
         |SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS component,
         |  (COALESCE(c.component, d.doc_id) = d.doc_id) AS is_survivor
         |FROM documents d LEFT JOIN comp c ON d.doc_id = c.id
         |ORDER BY d.doc_id""".stripMargin,
    "q43_tfidf_topterms" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS term FROM documents
        |), tf AS (
        |  SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
        |), dfq AS (
        |  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
        |), n AS (
        |  SELECT COUNT(*) AS n_docs FROM documents
        |), scored AS (
        |  SELECT tf.doc_id, tf.term, tf.tf,
        |    CAST(round(tf.tf * (ln((n.n_docs + 1.0) / (dfq.df + 1.0)) + 1.0) * 1000000) AS BIGINT)
        |      AS score_micro
        |  FROM tf JOIN dfq ON tf.term = dfq.term CROSS JOIN n
        |), r AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score_micro DESC, term ASC) AS rn
        |  FROM scored
        |)
        |SELECT doc_id, term, tf, score_micro, CAST(rn AS BIGINT) AS rn
        |FROM r WHERE rn <= 5 ORDER BY doc_id, rn""".stripMargin,
    "q44_bm25" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS dl,
        |    regexp_split_to_array(trim(text), '\s+') AS toks
        |  FROM documents
        |), toks AS (
        |  SELECT doc_id, unnest(toks) AS term FROM base
        |), tf AS (
        |  SELECT doc_id, term, COUNT(*) AS tf FROM toks
        |  WHERE term IN ('table', 'scan', 'fast', 'key') GROUP BY doc_id, term
        |), dfq AS (
        |  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
        |), stats AS (
        |  SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM base
        |), contrib AS (
        |  SELECT tf.doc_id,
        |    CAST(round(
        |      ln(1.0 + (stats.n_docs - dfq.df + 0.5) / (dfq.df + 0.5)) *
        |      (tf.tf * 2.2) /
        |      (tf.tf + 1.2 * (0.25 + 0.75 * b.dl / stats.avgdl)) *
        |      1000000) AS BIGINT) AS contrib_micro
        |  FROM tf
        |  JOIN dfq ON tf.term = dfq.term
        |  JOIN base b ON tf.doc_id = b.doc_id
        |  CROSS JOIN stats
        |), per_doc AS (
        |  SELECT doc_id, COUNT(*) AS n_matched, CAST(SUM(contrib_micro) AS BIGINT) AS score_micro
        |  FROM contrib GROUP BY doc_id
        |)
        |SELECT base.doc_id,
        |  COALESCE(n_matched, 0) AS n_matched,
        |  COALESCE(score_micro, 0) AS score_micro
        |FROM base LEFT JOIN per_doc ON base.doc_id = per_doc.doc_id
        |ORDER BY base.doc_id""".stripMargin,
    "q45_stratified_sample" ->
      """SELECT event_id, user_id, event_type,
        |  CAST(('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000 AS bucket
        |FROM events
        |WHERE CAST(('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000 <
        |  CASE event_type WHEN 'purchase' THEN 1000 WHEN 'view' THEN 100
        |                  WHEN 'click' THEN 250 WHEN 'error' THEN 50 ELSE 500 END
        |ORDER BY event_id""".stripMargin,
    "q46_group_quantiles" ->
      """WITH rkd AS (
        |  SELECT l_returnflag, l_quantity,
        |    ROW_NUMBER() OVER (PARTITION BY l_returnflag
        |                       ORDER BY l_quantity, l_orderkey, l_linenumber) AS rn,
        |    COUNT(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM lineitem
        |)
        |SELECT l_returnflag,
        |  COUNT(*) AS n_rows,
        |  MAX(CASE WHEN rn = floor(0.5 * (n - 1)) + 1 THEN l_quantity END) AS p50_qty,
        |  MAX(CASE WHEN rn = floor(0.9 * (n - 1)) + 1 THEN l_quantity END) AS p90_qty
        |FROM rkd GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q47_sketch_union" ->
      s"""WITH ${shingleCte(3)}
         |SELECT doc_id % 10 AS grp,
         |${(0 until 8).map(i => s"  min(md5('s$i|' || shingle)) AS h$i").mkString(",\n")}
         |FROM sh GROUP BY grp ORDER BY grp""".stripMargin,
    "q48_contamination" ->
      s"""WITH ${shingleCte(8)}, bench AS (
         |  SELECT doc_id AS bench_id, shingle FROM sh WHERE doc_id % 7 = 3
         |), train AS (
         |  SELECT doc_id, shingle FROM sh WHERE doc_id % 7 <> 3
         |)
         |SELECT t.doc_id,
         |  COUNT(*) AS n_shared_shingles,
         |  CAST(COUNT(DISTINCT b.bench_id) AS BIGINT) AS n_bench_docs
         |FROM train t JOIN bench b ON t.shingle = b.shingle
         |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin,
    "q49_simhash_pairs" ->
      s"""WITH $simhashCte
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
         |FROM simhashed a JOIN simhashed b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
         |ORDER BY id_a, id_b""".stripMargin,
    "q50_chunking" ->
      """WITH docs AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents
        |)
        |SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
        |  array_to_string(toks[i*16+1 : i*16+16], ' ') AS chunk_text,
        |  CAST(least(len(toks) - i*16, 16) AS BIGINT) AS n_tokens
        |FROM docs, unnest(generate_series(0, CAST(floor((len(toks) - 1.0) / 16) AS BIGINT))) AS t(i)
        |ORDER BY doc_id, chunk_idx""".stripMargin,
    "q51_packing" ->
      """WITH t AS (
        |  SELECT doc_id, doc_id % 8 AS shard,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens
        |  FROM documents
        |), c AS (
        |  SELECT *, COALESCE(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
        |  FROM t
        |)
        |SELECT shard, doc_id, n_tokens,
        |  CAST(floor(CAST(cum_before AS DOUBLE) / 256) AS BIGINT) AS bin_idx
        |FROM c ORDER BY doc_id""".stripMargin,
    "q52_frame_sample" ->
      """SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
        |  CAST(32 AS BIGINT) AS n_bytes,
        |  md5(substring(text, CAST(i * 32 + 1 AS INT), 32)) AS frame_md5
        |FROM documents,
        |  unnest(generate_series(0, CAST(floor(length(text) / 32.0) AS BIGINT) - 1, 2)) AS t(i)
        |ORDER BY doc_id, frame_idx""".stripMargin,
    "q53_surprisal" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS term FROM documents
        |), tf AS (
        |  SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
        |), corpus AS (
        |  SELECT term, COUNT(*) AS ct FROM toks GROUP BY term
        |), tot AS (
        |  SELECT COUNT(*) AS total FROM toks
        |), per_term AS (
        |  SELECT term, CAST(round(-ln(CAST(ct AS DOUBLE) / total) * 1000000) AS BIGINT) AS s_micro
        |  FROM corpus CROSS JOIN tot
        |)
        |SELECT tf.doc_id,
        |  CAST(SUM(tf.tf) AS BIGINT) AS dl,
        |  CAST(floor(CAST(SUM(p.s_micro * tf.tf) AS DOUBLE) / SUM(tf.tf)) AS BIGINT) AS surprisal_micro
        |FROM tf JOIN per_term p ON tf.term = p.term
        |GROUP BY tf.doc_id ORDER BY tf.doc_id""".stripMargin,
    // The oracle enumerates RAW event pairs; the engine pre-aggregates
    // per-user counts and sums cnt_a*cnt_b — must hash-match.
    "q54_covis_weighted" ->
      """WITH ev AS (
        |  SELECT user_id, TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS item_id
        |  FROM events WHERE TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL
        |), small AS (
        |  SELECT user_id FROM ev GROUP BY user_id HAVING COUNT(DISTINCT item_id) <= 200
        |), evk AS (
        |  SELECT ev.* FROM ev JOIN small USING (user_id)
        |)
        |SELECT a.item_id AS item_a, b.item_id AS item_b, COUNT(*) AS pair_count
        |FROM evk a JOIN evk b ON a.user_id = b.user_id AND a.item_id < b.item_id
        |GROUP BY 1, 2 HAVING COUNT(*) >= 3
        |ORDER BY item_a, item_b""".stripMargin,
    "q55_item_transitions" ->
      s"""WITH $sessCte, $transCte
         |SELECT item_a, item_b, transition_count FROM trans
         |ORDER BY item_a, item_b""".stripMargin,
    "q56_retention_cohorts" ->
      """WITH w AS (
        |  SELECT user_id, CAST(floor(extract(epoch FROM ts)) AS BIGINT) // 604800 AS week
        |  FROM events
        |), uw AS (
        |  SELECT DISTINCT user_id, week FROM w
        |), f AS (
        |  SELECT user_id, MIN(week) AS cohort FROM uw GROUP BY 1
        |)
        |SELECT f.cohort, uw.week - f.cohort AS week_offset, CAST(COUNT(*) AS BIGINT) AS active_users
        |FROM uw JOIN f USING (user_id)
        |GROUP BY 1, 2 ORDER BY cohort, week_offset""".stripMargin,
    "q57_bigram_vocab" ->
      """WITH docs AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents
        |), bg AS (
        |  SELECT array_to_string(toks[i:i+1], ' ') AS bigram
        |  FROM docs, unnest(generate_series(1, len(toks) - 1)) AS t(i)
        |)
        |SELECT bigram, CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM bg GROUP BY 1 ORDER BY cnt DESC, bigram LIMIT 200""".stripMargin,
    // same exact-integer floor(sum/count) as the engine's Lloyd step —
    // the centroid lists must hash-match element-for-element
    "q58_label_centroids" ->
      """WITH q AS (
        |  SELECT label, list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS v
        |  FROM embeddings
        |), ex AS (
        |  SELECT label, i AS pos, v[i] AS val
        |  FROM q, unnest(generate_series(1, len(v))) AS t(i)
        |), cm AS (
        |  SELECT label, pos,
        |         CAST(floor(CAST(SUM(val) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cv,
        |         CAST(COUNT(*) AS BIGINT) AS n
        |  FROM ex GROUP BY 1, 2
        |)
        |SELECT CAST(label AS BIGINT) AS label,
        |       array_to_string(list(cv ORDER BY pos), ',') AS centroid,
        |       MAX(n) AS n_vectors
        |FROM cm GROUP BY label ORDER BY label""".stripMargin,
    // integer micro-ratios (x * 1e6 // denom) — no float division on
    // either side, so the repetition scores hash-match exactly
    "q59_repetition" ->
      """WITH docs AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents
        |), base AS (
        |  SELECT doc_id, len(toks) AS n_tokens, len(list_distinct(toks)) AS n_distinct, toks
        |  FROM docs WHERE len(toks) >= 2
        |), bg AS (
        |  SELECT doc_id, array_to_string(toks[i:i+1], ' ') AS bigram
        |  FROM base, unnest(generate_series(1, len(toks) - 1)) AS t(i)
        |), bc AS (
        |  SELECT doc_id, bigram, COUNT(*) AS c FROM bg GROUP BY 1, 2
        |), top AS (
        |  SELECT doc_id, MAX(c) AS top_c FROM bc GROUP BY 1
        |)
        |SELECT b.doc_id, CAST(b.n_tokens AS BIGINT) AS n_tokens,
        |  CAST((b.n_tokens - b.n_distinct) * 1000000 // b.n_tokens AS BIGINT) AS dup_token_micro,
        |  CAST(t.top_c * 1000000 // (b.n_tokens - 1) AS BIGINT) AS top_bigram_micro
        |FROM base b JOIN top t USING (doc_id) ORDER BY doc_id""".stripMargin,
    "q60_funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_type, CAST(floor(extract(epoch FROM ts)) AS BIGINT) AS epoch_s
        |  FROM events
        |), s1 AS (
        |  SELECT user_id, MIN(epoch_s) AS t FROM e WHERE event_type = 'view' GROUP BY 1
        |), s2 AS (
        |  SELECT e.user_id, MIN(e.epoch_s) AS t FROM e JOIN s1 USING (user_id)
        |  WHERE e.event_type = 'click' AND e.epoch_s > s1.t GROUP BY 1
        |), s3 AS (
        |  SELECT e.user_id, MIN(e.epoch_s) AS t FROM e JOIN s2 USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.epoch_s > s2.t GROUP BY 1
        |)
        |SELECT * FROM (
        |  SELECT CAST(1 AS BIGINT) AS stage, 'view' AS stage_name,
        |         (SELECT COUNT(*) FROM s1) AS n_users
        |  UNION ALL SELECT 2, 'click', (SELECT COUNT(*) FROM s2)
        |  UNION ALL SELECT 3, 'purchase', (SELECT COUNT(*) FROM s3)
        |) ORDER BY stage""".stripMargin,
    // doc-level PMI: ln is micro-quantized on BOTH sides (the q53
    // pattern), all other arithmetic is exact integer
    "q61_pmi_pairs" ->
      """WITH docs AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents
        |), td AS (
        |  SELECT DISTINCT doc_id, unnest(toks) AS term FROM docs
        |), n AS (
        |  SELECT COUNT(DISTINCT doc_id) AS n_docs FROM td
        |), dft AS (
        |  SELECT term, COUNT(*) AS df FROM td GROUP BY 1
        |), pairs AS (
        |  SELECT a.term AS term_a, b.term AS term_b, COUNT(*) AS co_docs
        |  FROM td a JOIN td b ON a.doc_id = b.doc_id AND a.term < b.term
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 5
        |)
        |SELECT p.term_a, p.term_b, CAST(p.co_docs AS BIGINT) AS co_docs,
        |  CAST(round(ln(CAST(p.co_docs AS DOUBLE) * n.n_docs / (da.df * db.df)) * 1000000) AS BIGINT) AS pmi_micro
        |FROM pairs p, n, dft da, dft db
        |WHERE da.term = p.term_a AND db.term = p.term_b
        |ORDER BY term_a, term_b""".stripMargin,
    "q62_incremental_dedup" ->
      """WITH nf AS (
        |  SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
        |         MIN(doc_id) AS survivor_id, CAST(COUNT(*) AS BIGINT) AS batch_dup_count
        |  FROM documents WHERE source IN ('src0', 'src1', 'src2') GROUP BY 1
        |), seen AS (
        |  SELECT DISTINCT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        |  FROM documents WHERE source NOT IN ('src0', 'src1', 'src2')
        |)
        |SELECT nf.fp, nf.survivor_id, nf.batch_dup_count
        |FROM nf ANTI JOIN seen USING (fp) ORDER BY fp""".stripMargin,
    "q63_group_sample" ->
      """SELECT event_type, event_id, rn FROM (
        |  SELECT event_type, event_id,
        |    ROW_NUMBER() OVER (PARTITION BY event_type
        |      ORDER BY md5(CAST(event_id AS VARCHAR)), event_id) AS rn
        |  FROM events
        |) WHERE rn <= 20 ORDER BY event_type, rn""".stripMargin,
    // RANGE framing needs no tie-break: equal-epoch rows share a frame
    "q64_rolling_window" ->
      """SELECT event_id, user_id, epoch_s,
        |  CAST(SUM(value_cents) OVER w AS BIGINT) AS win7d_cents,
        |  COUNT(*) OVER w AS win7d_events
        |FROM (
        |  SELECT event_id, user_id,
        |    CAST(floor(extract(epoch FROM ts)) AS BIGINT) AS epoch_s,
        |    CAST(round(value * 100) AS BIGINT) AS value_cents
        |  FROM events
        |)
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_s
        |             RANGE BETWEEN 604799 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "q65_skew_keys" ->
      """WITH counts AS (
        |  SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY 1
        |), totals AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_keys, CAST(SUM(cnt) AS BIGINT) AS n_rows
        |  FROM counts
        |)
        |SELECT c.user_id, CAST(c.cnt AS BIGINT) AS cnt,
        |       CAST(c.cnt * t.n_keys * 1000000 // t.n_rows AS BIGINT) AS skew_micro
        |FROM counts c, totals t
        |ORDER BY c.cnt DESC, c.user_id ASC LIMIT 10""".stripMargin,
    "q66_reconcile" ->
      """WITH li AS (
        |  SELECT l_orderkey, COUNT(*) AS n_lines,
        |         CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS li_total
        |  FROM lineitem GROUP BY 1
        |)
        |SELECT COALESCE(li.l_orderkey, o.o_orderkey) AS order_key,
        |  COALESCE(li.n_lines, 0) AS n_lines,
        |  round(COALESCE(li.li_total, -1.0), 2) AS li_total,
        |  round(COALESCE(o.o_totalprice, -1.0), 2) AS o_total,
        |  CASE WHEN li.l_orderkey IS NULL THEN 'no_lineitems'
        |       WHEN o.o_orderkey IS NULL THEN 'no_order' ELSE 'both' END AS status
        |FROM li FULL OUTER JOIN orders o ON li.l_orderkey = o.o_orderkey
        |ORDER BY order_key""".stripMargin,
    "q67_ngram_novelty" ->
      s"""WITH ${shingleCte(4)}, dfreq AS (
         |  SELECT shingle, COUNT(*) AS df FROM sh GROUP BY 1
         |)
         |SELECT sh.doc_id,
         |  CAST(COUNT(*) AS BIGINT) AS n_distinct_ngrams,
         |  CAST(SUM(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT) AS novelty_ppm
         |FROM sh JOIN dfreq d USING (shingle)
         |GROUP BY sh.doc_id ORDER BY sh.doc_id""".stripMargin,
    // sessions built from NON-error activity; errors attributed to the
    // containing [start, end] window by interval join
    "q68_interval_attribution" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type,
        |         CAST(floor(extract(epoch FROM ts)) AS BIGINT) AS epoch_s
        |  FROM events
        |), ne AS (
        |  SELECT * FROM e WHERE event_type <> 'error'
        |), lagged AS (
        |  SELECT *, lag(epoch_s) OVER (PARTITION BY user_id ORDER BY epoch_s, event_id) AS prev_s
        |  FROM ne
        |), flagged AS (
        |  SELECT *, CASE WHEN prev_s IS NULL OR epoch_s - prev_s > 1800 THEN 1 ELSE 0 END AS is_new
        |  FROM lagged
        |), sess AS (
        |  SELECT *,
        |    CAST(user_id AS VARCHAR) || '_' ||
        |      CAST(CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY epoch_s, event_id) AS BIGINT) AS VARCHAR)
        |      AS session_id
        |  FROM flagged
        |), intervals AS (
        |  SELECT session_id, user_id, MIN(epoch_s) AS session_start_s,
        |         MAX(epoch_s) + 1800 AS session_open_until_s
        |  FROM sess GROUP BY 1, 2
        |), err AS (
        |  SELECT event_id, user_id, epoch_s FROM e WHERE event_type = 'error'
        |)
        |SELECT err.event_id, err.user_id, i.session_id, err.epoch_s - i.session_start_s AS offset_s
        |FROM err JOIN intervals i ON err.user_id = i.user_id
        |  AND err.epoch_s >= i.session_start_s AND err.epoch_s <= i.session_open_until_s
        |ORDER BY err.event_id, i.session_id""".stripMargin,
    // type-1 (lower-middle, actual-data-point) median — the engine
    // computes it in two bounded aggregation passes, no global sort
    "q69_exact_median" ->
      """WITH t AS (
        |  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents FROM lineitem
        |), r AS (
        |  SELECT cents, ROW_NUMBER() OVER (ORDER BY cents) AS rn, COUNT(*) OVER () AS n
        |  FROM t
        |)
        |SELECT CAST(MAX(n) AS BIGINT) AS n_rows,
        |       CAST(MAX(CASE WHEN rn = (n - 1) // 2 + 1 THEN cents END) AS BIGINT) AS median_cents
        |FROM r""".stripMargin,
    "q70_pivot_counts" ->
      """SELECT user_id,
        |  CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
        |  CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
        |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
        |  CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
        |  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q71_unpivot" ->
      """WITH t AS (
        |  SELECT l_orderkey AS orderkey, CAST(l_linenumber AS BIGINT) AS linenumber,
        |    CAST(round(l_quantity * 100) AS BIGINT) AS quantity_c,
        |    CAST(round(l_discount * 10000) AS BIGINT) AS discount_bp,
        |    CAST(round(l_tax * 10000) AS BIGINT) AS tax_bp
        |  FROM lineitem
        |)
        |SELECT orderkey, linenumber, 'quantity_c' AS metric, quantity_c AS value FROM t
        |UNION ALL SELECT orderkey, linenumber, 'discount_bp', discount_bp FROM t
        |UNION ALL SELECT orderkey, linenumber, 'tax_bp', tax_bp FROM t
        |ORDER BY orderkey, linenumber, metric""".stripMargin,
    "q72_rollup" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
        |  COALESCE(l_linestatus, 'ALL') AS linestatus,
        |  CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
        |  CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
        |  COUNT(*) AS n_rows,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS revenue
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY g_flag, g_status, returnflag, linestatus""".stripMargin,
    "q73_json_typed" ->
      """SELECT event_id,
        |  TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS item_id,
        |  CAST(len(json_keys(props)) AS BIGINT) AS n_keys
        |FROM events ORDER BY event_id""".stripMargin,
    "q74_rank_functions" ->
      """WITH t AS (
        |  SELECT event_id, user_id, CAST(round(value * 100) AS BIGINT) AS value_cents
        |  FROM events
        |)
        |SELECT event_id, user_id,
        |  CAST(RANK() OVER tv AS BIGINT) AS rnk,
        |  CAST(DENSE_RANK() OVER tv AS BIGINT) AS drnk,
        |  CAST(NTILE(4) OVER bv AS BIGINT) AS quartile,
        |  CASE WHEN COUNT(*) OVER (PARTITION BY user_id) > 1
        |       THEN (RANK() OVER tv - 1) * 1000000 // (COUNT(*) OVER (PARTITION BY user_id) - 1)
        |       ELSE 0 END AS pct_rank_micro
        |FROM t
        |WINDOW tv AS (PARTITION BY user_id ORDER BY value_cents),
        |       bv AS (PARTITION BY user_id ORDER BY value_cents, event_id)
        |ORDER BY event_id""".stripMargin,
    "q75_array_ops" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents
        |)
        |SELECT doc_id,
        |  CAST(len(list_filter(toks, x -> length(x) > 3)) AS BIGINT) AS n_long_tokens,
        |  CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT) AS sum_token_len,
        |  array_to_string(list_transform(list_sort(toks)[1:3], x -> upper(x)), '|')
        |    AS first3_sorted_upper
        |FROM t ORDER BY doc_id""".stripMargin,
    "q76_bloom_decontam" ->
      s"""WITH ${shingleCte(8)}, bench AS (
         |  SELECT DISTINCT shingle FROM sh WHERE doc_id % 7 = 3
         |), contaminated AS (
         |  SELECT DISTINCT t.doc_id FROM sh t JOIN bench b ON t.shingle = b.shingle
         |  WHERE t.doc_id % 7 <> 3
         |)
         |SELECT d.doc_id, d.lang, d.source, d.n_chars FROM documents d
         |WHERE d.doc_id % 7 <> 3
         |  AND d.doc_id NOT IN (SELECT doc_id FROM contaminated)
         |ORDER BY d.doc_id""".stripMargin,
    "q77_url_domain_cap" ->
      """WITH u AS (
        |  SELECT doc_id, n_chars,
        |    'https://www.' || source || '-site.com/' || lang || '/doc-' || doc_id
        |      || '?ref=r' || (doc_id % 5) || '&page=' || (doc_id % 3) AS url
        |  FROM documents
        |), p AS (
        |  SELECT doc_id, n_chars, url,
        |    regexp_extract(url, 'https://([^/]+)', 1) AS host,
        |    regexp_extract(url, 'https://[^/]+([^?]*)', 1) AS path,
        |    regexp_extract(url, '[?&]ref=([^&]*)', 1) AS ref
        |  FROM u
        |), r AS (
        |  SELECT *,
        |    regexp_extract(host, '([^.]+[.][^.]+)$', 1) AS domain,
        |    ROW_NUMBER() OVER (
        |      PARTITION BY regexp_extract(host, '([^.]+[.][^.]+)$', 1)
        |      ORDER BY n_chars DESC, doc_id ASC) AS rn
        |  FROM p
        |)
        |SELECT doc_id, host, domain, path, ref, n_chars, CAST(rn AS BIGINT) AS rn
        |FROM r WHERE rn <= 5 ORDER BY doc_id""".stripMargin,
    "q78_daily_gapfill" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(floor(extract(epoch FROM ts) / 86400) AS BIGINT) AS day_num,
        |         CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2
        |), span AS (
        |  SELECT user_id, MIN(day_num) AS d0, MAX(day_num) AS d1 FROM daily GROUP BY 1
        |), cal AS (
        |  SELECT user_id, unnest(generate_series(d0, d1)) AS day_num FROM span
        |)
        |SELECT c.user_id, c.day_num, COALESCE(d.n, 0) AS n_events
        |FROM cal c LEFT JOIN daily d USING (user_id, day_num)
        |ORDER BY user_id, day_num""".stripMargin,
    "q79_cube" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
        |  COALESCE(l_linestatus, 'ALL') AS linestatus,
        |  CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
        |  CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
        |  COUNT(*) AS n_rows,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS revenue
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY g_flag, g_status, returnflag, linestatus""".stripMargin,
    "q80_setops" ->
      """WITH f AS (SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'),
        |o AS (SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O')
        |SELECT 'both' AS tag, custkey FROM (SELECT custkey FROM f INTERSECT SELECT custkey FROM o)
        |UNION ALL
        |SELECT 'f_only' AS tag, custkey FROM (SELECT custkey FROM f EXCEPT SELECT custkey FROM o)
        |UNION ALL
        |SELECT 'o_only' AS tag, custkey FROM (SELECT custkey FROM o EXCEPT SELECT custkey FROM f)
        |ORDER BY tag, custkey""".stripMargin,
    "q81_zipf_hist" ->
      """WITH toks AS (
        |  SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS tok FROM documents
        |), c AS (
        |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt FROM toks GROUP BY 1
        |)
        |SELECT CAST(length(CAST(cnt AS VARCHAR)) AS BIGINT) AS magnitude,
        |  CAST(COUNT(*) AS BIGINT) AS n_distinct_tokens,
        |  CAST(SUM(cnt) AS BIGINT) AS total_occurrences,
        |  MIN(cnt) AS min_cnt,
        |  MAX(cnt) AS max_cnt
        |FROM c GROUP BY 1 ORDER BY magnitude""".stripMargin,
    "q82_shuffle_shards" ->
      """WITH t AS (
        |  SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS k FROM documents
        |), s AS (
        |  SELECT doc_id, k,
        |    CAST(('0x' || substring(k, 1, 8)) AS BIGINT) % 32 AS shard
        |  FROM t
        |)
        |SELECT doc_id, shard,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY k, doc_id) AS BIGINT) AS pos
        |FROM s ORDER BY shard, pos""".stripMargin,
    "q83_mixture_sample" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    (CAST(substring(source, 4) AS BIGINT) % 4 + 1) * 125 AS rate_permille,
        |    CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000 AS bucket
        |  FROM documents
        |)
        |SELECT doc_id, source, rate_permille, bucket
        |FROM t WHERE bucket < rate_permille ORDER BY doc_id""".stripMargin,
    "q84_pii_redact" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    substring(text, 1, 40) || ' contact user' || doc_id || '@example.com from 10.'
        |      || (doc_id % 200) || '.0.7 call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |      AS synth
        |  FROM documents
        |)
        |SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(synth,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        |    '\b\d{1,3}(\.\d{1,3}){3}\b', '[IP]', 'g'),
        |    '\b\d{3}-\d{4}\b', '[PHONE]', 'g') AS redacted,
        |  CAST(len(regexp_extract_all(synth, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(synth, '\b\d{1,3}(\.\d{1,3}){3}\b')) AS BIGINT) AS n_ips,
        |  CAST(len(regexp_extract_all(synth, '\b\d{3}-\d{4}\b')) AS BIGINT) AS n_phones
        |FROM s ORDER BY doc_id""".stripMargin,
    // set elements are 60-bit integer shingle fingerprints (hex-cast
    // md5 prefix) — the operator's documented semantics; values match
    // string-shingle Jaccard absent a 2^-60 collision
    "q85_jaccard_prefix" ->
      s"""WITH ${shingleCte(4)}, fsh AS (
         |  SELECT DISTINCT doc_id, CAST(('0x' || substring(md5(shingle), 1, 15)) AS BIGINT) AS shingle FROM sh
         |), sizes AS (
         |  SELECT doc_id, COUNT(*) AS n FROM fsh GROUP BY doc_id
         |), cand AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter_count
         |  FROM fsh a JOIN fsh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2
         |)
         |SELECT id_a, id_b, inter_count,
         |  sa.n + sb.n - inter_count AS union_count,
         |  CAST(floor(inter_count * 1000000 / (sa.n + sb.n - inter_count)) AS BIGINT) AS jaccard_ppm
         |FROM cand
         |JOIN sizes sa ON id_a = sa.doc_id
         |JOIN sizes sb ON id_b = sb.doc_id
         |WHERE floor(inter_count * 1000000 / (sa.n + sb.n - inter_count)) >= 500000
         |ORDER BY id_a, id_b""".stripMargin,
    "q86_curation_pipeline" -> {
      val best = TQ.langMarkers.map { case (l, _) => s"s_$l" }.mkString("greatest(", ", ", ")")
      s"""WITH train AS (
         |  SELECT * FROM documents WHERE doc_id % 7 <> 3
         |), scored AS (
         |  SELECT doc_id, text,
         |    CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
         |${TQ.langMarkers
          .map { case (l, ms) => s"    ${langScoreSql(ms)} AS s_$l" }
          .mkString(",\n")}
         |  FROM train
         |), kept AS (
         |  SELECT doc_id, n_tokens FROM scored
         |  WHERE n_tokens >= 40
         |    AND s_en = $best AND s_en > 0
         |), survivors AS (
         |  SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
         |    MIN(doc_id) AS doc_id, COUNT(*) AS dup_count
         |  FROM train GROUP BY fp
         |), tsh AS (
         |  SELECT DISTINCT t.doc_id,
         |    array_to_string((regexp_split_to_array(trim(t.text), '\\s+'))[i:i+7], ' ') AS shingle
         |  FROM train t, unnest(generate_series(1, len(regexp_split_to_array(trim(t.text), '\\s+')) - 7)) AS g(i)
         |), bsh AS (
         |  SELECT DISTINCT array_to_string((regexp_split_to_array(trim(b.text), '\\s+'))[i:i+7], ' ') AS shingle
         |  FROM documents b, unnest(generate_series(1, len(regexp_split_to_array(trim(b.text), '\\s+')) - 7)) AS g(i)
         |  WHERE b.doc_id % 7 = 3
         |), contaminated AS (
         |  SELECT DISTINCT t.doc_id FROM tsh t JOIN bsh USING (shingle)
         |)
         |SELECT k.doc_id, k.n_tokens, s.dup_count
         |FROM kept k
         |JOIN survivors s USING (doc_id)
         |WHERE k.doc_id NOT IN (SELECT doc_id FROM contaminated)
         |ORDER BY k.doc_id""".stripMargin
    },
    // three exact-integer iterations unrolled as CTEs — floor division
    // at both steps matches the engine's `div`; SUMs cast back to
    // BIGINT (DuckDB SUM(BIGINT) widens to DECIMAL)
    "q87_pagerank" ->
      s"""WITH $sessCte, $transCte, ${pagerankUnrollSql(3, None)}
         |SELECT id AS item_id, pr AS pr_micro FROM p3 ORDER BY item_id""".stripMargin,
    "q88_grouping_sets" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
        |  COALESCE(l_linestatus, 'ALL') AS linestatus,
        |  CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
        |  CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
        |  COUNT(*) AS n_rows,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS revenue
        |FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY g_flag, g_status, returnflag, linestatus""".stripMargin,
    // planted multi-line corpus: per-source nav header + global
    // copyright footer above two unique content lines; parallel
    // unnests zip (line, position)
    "q89_line_boilerplate" ->
      """WITH lined AS (
        |  SELECT doc_id,
        |    'NAV ' || source || ' HOME' || chr(10) ||
        |    '(c) retail corp all rights reserved' || chr(10) ||
        |    substring(text, 1, 80) || chr(10) || substring(text, 81, 80) AS text
        |  FROM documents
        |), lns AS (
        |  SELECT doc_id,
        |    unnest(string_split(text, chr(10))) AS line,
        |    unnest(range(1, len(string_split(text, chr(10))) + 1)) AS pos
        |  FROM lined
        |), boiler AS (
        |  SELECT line FROM lns GROUP BY line HAVING COUNT(DISTINCT doc_id) >= 20
        |), kept AS (
        |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_lines_kept,
        |         string_agg(line, chr(10) ORDER BY pos) AS clean_text
        |  FROM lns WHERE line NOT IN (SELECT line FROM boiler)
        |  GROUP BY doc_id
        |)
        |SELECT l.doc_id,
        |  COALESCE(k.n_lines_kept, 0) AS n_lines_kept,
        |  CAST(len(string_split(l.text, chr(10))) AS BIGINT) - COALESCE(k.n_lines_kept, 0) AS n_lines_removed,
        |  COALESCE(k.clean_text, '') AS clean_text
        |FROM lined l LEFT JOIN kept k USING (doc_id)
        |ORDER BY l.doc_id""".stripMargin,
    "q90_fuzzy_names" ->
      """WITH nm AS (
        |  SELECT p_name AS name FROM part
        |  UNION ALL
        |  SELECT 'x' || substring(p_name, 2, 1000) FROM part WHERE p_partkey % 40 = 0
        |), dn AS (
        |  SELECT DISTINCT name, split_part(name, ' ', 2) AS block FROM nm
        |)
        |SELECT a.name AS name_a, b.name AS name_b,
        |  CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist
        |FROM dn a JOIN dn b ON a.block = b.block AND a.name < b.name
        |WHERE levenshtein(a.name, b.name) <= 2
        |ORDER BY name_a, name_b""".stripMargin,
    // chr(769)/chr(776) are the combining acute/diaeresis the engine
    // plants as ́/̈; nfc_normalize is DuckDB's NFC
    "q91_unicode_clean" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    substring(text, 1, 30) || ' cafe' || chr(769) || ' nai' || chr(776) || 've '
        |      || chr(7) || 'bell' || chr(27) || 'esc ' || doc_id AS synth
        |  FROM documents
        |)
        |SELECT doc_id,
        |  CAST(length(synth) - length(regexp_replace(synth, '[\x00-\x08\x0B-\x1F\x7F]', '', 'g')) AS BIGINT) AS n_control,
        |  CAST(length(synth) - length(nfc_normalize(synth)) AS BIGINT) AS n_composed,
        |  regexp_replace(nfc_normalize(synth), '[\x00-\x08\x0B-\x1F\x7F]', '', 'g') AS clean_text
        |FROM s ORDER BY doc_id""".stripMargin,
    // the UNION ALL mirrors the engine's stack() unpivot; acctbal is
    // decimal-cast before MIN/MAX so the string render matches
    "q92_profile" ->
      """WITH c AS (
        |  SELECT c_custkey, c_name, c_nationkey,
        |         CAST(c_acctbal AS DECIMAL(18,2)) AS c_acctbal, c_mktsegment
        |  FROM customer
        |)
        |SELECT 'c_custkey' AS "column", CAST(COUNT(c_custkey) AS BIGINT) AS n_nonnull,
        |  CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_distinct,
        |  CAST(MIN(c_custkey) AS VARCHAR) AS min_value, CAST(MAX(c_custkey) AS VARCHAR) AS max_value FROM c
        |UNION ALL
        |SELECT 'c_name', CAST(COUNT(c_name) AS BIGINT), CAST(COUNT(DISTINCT c_name) AS BIGINT),
        |  CAST(MIN(c_name) AS VARCHAR), CAST(MAX(c_name) AS VARCHAR) FROM c
        |UNION ALL
        |SELECT 'c_nationkey', CAST(COUNT(c_nationkey) AS BIGINT), CAST(COUNT(DISTINCT c_nationkey) AS BIGINT),
        |  CAST(MIN(c_nationkey) AS VARCHAR), CAST(MAX(c_nationkey) AS VARCHAR) FROM c
        |UNION ALL
        |SELECT 'c_acctbal', CAST(COUNT(c_acctbal) AS BIGINT), CAST(COUNT(DISTINCT c_acctbal) AS BIGINT),
        |  CAST(MIN(c_acctbal) AS VARCHAR), CAST(MAX(c_acctbal) AS VARCHAR) FROM c
        |UNION ALL
        |SELECT 'c_mktsegment', CAST(COUNT(c_mktsegment) AS BIGINT), CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT),
        |  CAST(MIN(c_mktsegment) AS VARCHAR), CAST(MAX(c_mktsegment) AS VARCHAR) FROM c
        |ORDER BY "column"""".stripMargin,
    // the SQL mirror of the Morton interleave: unrolled shift-mask sum
    "q93_zorder" -> {
      val terms = (0 until 16)
        .flatMap(i => Seq(
          s"(((o_custkey >> $i) & 1) << ${2 * i})",
          s"(((day_num >> $i) & 1) << ${2 * i + 1})"))
        .mkString(" + ")
      s"""WITH o AS (
         |  SELECT o_orderkey, o_custkey,
         |    CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS day_num
         |  FROM orders
         |)
         |SELECT o_orderkey, CAST($terms AS BIGINT) AS z
         |FROM o ORDER BY o_orderkey""".stripMargin
    },
    "q94_data_quality" ->
      """SELECT 'lineitem_orderkey_in_orders' AS "constraint", CAST(COUNT(*) AS BIGINT) AS n_violations
        |  FROM lineitem WHERE l_orderkey IS NOT NULL
        |    AND l_orderkey NOT IN (SELECT o_orderkey FROM orders WHERE o_orderkey IS NOT NULL)
        |UNION ALL
        |SELECT 'lineitem_quantity_range', CAST(COUNT(*) AS BIGINT)
        |  FROM lineitem WHERE l_quantity IS NOT NULL AND (l_quantity < 1 OR l_quantity > 50)
        |UNION ALL
        |SELECT 'orders_custkey_in_customer', CAST(COUNT(*) AS BIGINT)
        |  FROM orders WHERE o_custkey IS NOT NULL
        |    AND o_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_custkey IS NOT NULL)
        |UNION ALL
        |SELECT 'orders_custkey_not_null', CAST(COUNT(*) AS BIGINT)
        |  FROM orders WHERE o_custkey IS NULL
        |UNION ALL
        |SELECT 'orders_orderkey_unique', CAST(COUNT(*) AS BIGINT)
        |  FROM (SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING COUNT(*) > 1)
        |UNION ALL
        |SELECT 'orders_status_accepted', CAST(COUNT(*) AS BIGINT)
        |  FROM orders WHERE o_orderstatus IS NOT NULL AND o_orderstatus NOT IN ('F', 'O', 'P')
        |ORDER BY "constraint"""".stripMargin,
    // run-length compression: first-row rule + null-safe change test
    // (IS DISTINCT FROM), intervals closed by the next run's start
    "q95_scd2_history" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type,
        |         CAST(floor(extract(epoch FROM ts)) AS BIGINT) AS epoch_s
        |  FROM events
        |), flagged AS (
        |  SELECT user_id, event_type, epoch_s, event_id,
        |    (row_number() OVER w = 1
        |      OR lag(event_type) OVER w IS DISTINCT FROM event_type) AS changed
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY epoch_s, event_id)
        |), runs AS (
        |  SELECT user_id, event_type, epoch_s AS valid_from,
        |    lead(epoch_s) OVER w2 AS valid_to,
        |    CAST(row_number() OVER w2 AS BIGINT) AS run_seq
        |  FROM flagged WHERE changed
        |  WINDOW w2 AS (PARTITION BY user_id ORDER BY epoch_s, event_id)
        |)
        |SELECT user_id, run_seq, event_type, valid_from, valid_to
        |FROM runs ORDER BY user_id, run_seq""".stripMargin,
    // Mirrors Spark's session_window merge rule (pinned by
    // FeatureEngSpec): split strictly when gap > 1800 s; window end =
    // last event + gap. Micros = nanos div 1000 (Tables.events).
    "q96_session_window" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_ns(ts) // 1000 AS us FROM events
        |), lagged AS (
        |  SELECT user_id, us,
        |         lag(us) OVER (PARTITION BY user_id ORDER BY us) AS prev_us
        |  FROM ev
        |), flagged AS (
        |  SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
        |                 THEN 1 ELSE 0 END AS is_new
        |  FROM lagged
        |), sess AS (
        |  SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY us
        |                              ROWS UNBOUNDED PRECEDING) AS sn
        |  FROM flagged
        |)
        |SELECT user_id, MIN(us) AS w_start_us,
        |  MAX(us) + 1800000000 AS w_end_us,
        |  CAST(COUNT(*) AS BIGINT) AS n_events
        |FROM sess GROUP BY user_id, sn
        |ORDER BY user_id, w_start_us""".stripMargin,
    "q97_negative_samples" ->
      s"""WITH $sessCte, pool AS (
         |  SELECT category_id, COUNT(*) AS cat_events FROM enr
         |  GROUP BY category_id ORDER BY cat_events DESC, category_id LIMIT 10
         |), fs AS (
         |  SELECT user_id, category_id, MIN(epoch_s) AS first_seen_s
         |  FROM enr GROUP BY user_id, category_id
         |), cand AS (
         |  SELECT a.anchor_id, p.category_id, p.cat_events
         |  FROM anchors a CROSS JOIN pool p
         |  LEFT JOIN fs ON fs.user_id = a.user_id AND fs.category_id = p.category_id
         |  WHERE fs.first_seen_s IS NULL OR fs.first_seen_s >= a.anchor_epoch_s
         |), ranked AS (
         |  SELECT anchor_id, category_id,
         |    row_number() OVER (PARTITION BY anchor_id
         |                       ORDER BY cat_events DESC, category_id) AS neg_rank
         |  FROM cand
         |)
         |SELECT anchor_id, category_id, CAST(neg_rank AS INT) AS neg_rank
         |FROM ranked WHERE neg_rank <= 5
         |ORDER BY anchor_id, neg_rank""".stripMargin,
    // All te inputs are counts < 2^53, so the double arithmetic (same
    // expression shape both sides) reproduces bit-for-bit.
    "q98_target_encoding" ->
      """WITH ev AS (
        |  SELECT TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) % 20 AS category_id,
        |         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |  FROM events
        |  WHERE TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL
        |), g AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS g_n, CAST(SUM(y) AS BIGINT) AS g_pos FROM ev
        |), per AS (
        |  SELECT category_id, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |         CAST(SUM(y) AS BIGINT) AS pos
        |  FROM ev GROUP BY category_id
        |)
        |SELECT category_id, n_rows,
        |  CAST(floor(1000000.0 *
        |    ((CAST(pos AS DOUBLE) + 20.0 * (CAST(g_pos AS DOUBLE) / CAST(g_n AS DOUBLE)))
        |     / (CAST(n_rows AS DOUBLE) + 20.0))) AS BIGINT) AS te_micro
        |FROM per CROSS JOIN g ORDER BY category_id""".stripMargin,
    // k-th order statistic (k = max(1, ceil(ppm*n/1e6)) in pure integer
    // math — float ceil flips at exact multiples) is tie-independent;
    // clipped mean = exact decimal sum / count, micro-quantized.
    "q99_winsorize" ->
      """WITH ranked AS (
        |  SELECT l_returnflag, l_extendedprice,
        |    row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn,
        |    COUNT(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM lineitem
        |), th AS (
        |  SELECT l_returnflag,
        |    MAX(CASE WHEN rn = greatest((n * 50000 + 999999) // 1000000, 1) THEN l_extendedprice END) AS p_lo,
        |    MAX(CASE WHEN rn = greatest((n * 950000 + 999999) // 1000000, 1) THEN l_extendedprice END) AS p_hi
        |  FROM ranked GROUP BY l_returnflag
        |)
        |SELECT l.l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  MAX(t.p_lo) AS p_lo, MAX(t.p_hi) AS p_hi,
        |  CAST(floor(1000000.0 *
        |    CAST(SUM(CAST(least(greatest(l.l_extendedprice, t.p_lo), t.p_hi) AS DECIMAL(28,4))) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE)) AS BIGINT) AS avg_clip_micro
        |FROM lineitem l JOIN th t ON l.l_returnflag = t.l_returnflag
        |GROUP BY l.l_returnflag ORDER BY l.l_returnflag""".stripMargin,
    "q100_feature_hashing" ->
      """WITH toks AS (
        |  SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS tok FROM documents
        |), t AS (
        |  SELECT tok,
        |    CAST(('0x' || substring(md5(tok), 1, 8)) AS BIGINT) % 64 AS bucket,
        |    CASE WHEN CAST(('0x' || substring(md5(tok), 9, 1)) AS BIGINT) % 2 = 0
        |         THEN 1 ELSE -1 END AS sign
        |  FROM toks WHERE length(tok) > 0
        |)
        |SELECT bucket, CAST(SUM(sign) AS BIGINT) AS signed_sum,
        |  CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |  CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_terms
        |FROM t GROUP BY bucket ORDER BY bucket""".stripMargin,
    // Per-row products of ≤2-decimal doubles are exact, so the decimal
    // sums are order-independent; the final formula is identical IEEE
    // double arithmetic on both sides.
    "q101_correlation" ->
      """WITH sums AS (
        |  SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sx_qp,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS sy_qp,
        |    CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sxx_qp,
        |    CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS syy_qp,
        |    CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS sxy_qp,
        |    CAST(SUM(CAST(l_discount AS DECIMAL(28,4))) AS DOUBLE) AS sy_pd,
        |    CAST(SUM(CAST(l_discount * l_discount AS DECIMAL(28,4))) AS DOUBLE) AS syy_pd,
        |    CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(28,4))) AS DOUBLE) AS sxy_pd
        |  FROM lineitem GROUP BY l_returnflag
        |)
        |SELECT l_returnflag, n_rows,
        |  CASE WHEN sqrt((CAST(n_rows AS DOUBLE) * sxx_qp - sx_qp * sx_qp)
        |               * (CAST(n_rows AS DOUBLE) * syy_qp - sy_qp * sy_qp)) = 0.0 THEN NULL
        |       ELSE CAST(floor(1000000.0 * (CAST(n_rows AS DOUBLE) * sxy_qp - sx_qp * sy_qp)
        |         / sqrt((CAST(n_rows AS DOUBLE) * sxx_qp - sx_qp * sx_qp)
        |              * (CAST(n_rows AS DOUBLE) * syy_qp - sy_qp * sy_qp))) AS BIGINT)
        |  END AS corr_qty_price_micro,
        |  CASE WHEN sqrt((CAST(n_rows AS DOUBLE) * syy_qp - sy_qp * sy_qp)
        |               * (CAST(n_rows AS DOUBLE) * syy_pd - sy_pd * sy_pd)) = 0.0 THEN NULL
        |       ELSE CAST(floor(1000000.0 * (CAST(n_rows AS DOUBLE) * sxy_pd - sy_qp * sy_pd)
        |         / sqrt((CAST(n_rows AS DOUBLE) * syy_qp - sy_qp * sy_qp)
        |              * (CAST(n_rows AS DOUBLE) * syy_pd - sy_pd * sy_pd))) AS BIGINT)
        |  END AS corr_price_disc_micro
        |FROM sums ORDER BY l_returnflag""".stripMargin,
    "q102_dup_spans" ->
      """WITH spans AS (
        |  SELECT doc_id, md5(substring(text, CAST(i * 32 + 1 AS INT), 64)) AS fp
        |  FROM documents, unnest(generate_series(0, (length(text) - 64) // 32)) AS t(i)
        |  WHERE length(text) >= 64
        |), counted AS (
        |  SELECT doc_id, COUNT(*) OVER (PARTITION BY fp) AS occ FROM spans
        |)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
        |  CAST(SUM(CASE WHEN occ >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans,
        |  CAST(SUM(CASE WHEN occ >= 2 THEN 1 ELSE 0 END) * 1000000
        |       // COUNT(*) AS BIGINT) AS dup_ppm
        |FROM counted GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q103_bigram_surprisal" ->
      """WITH toked AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents
        |), bg_all AS (
        |  SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
        |  FROM toked, unnest(generate_series(1, len(toks) - 1)) AS t(i)
        |  WHERE len(toks) >= 2
        |), train AS (
        |  SELECT * FROM bg_all WHERE doc_id % 2 = 0
        |), score AS (
        |  SELECT * FROM bg_all WHERE doc_id % 2 = 1
        |), bg AS (
        |  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12 FROM train GROUP BY w1, w2
        |), heads AS (
        |  SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM bg GROUP BY w1
        |), vocab AS (
        |  SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS v FROM (
        |    SELECT w1 AS w FROM train UNION ALL SELECT w2 AS w FROM train)
        |), scored AS (
        |  SELECT s.doc_id,
        |    CAST(round(-ln((CAST(COALESCE(bg.c12, 0) AS DOUBLE) + 1.0) /
        |      (CAST(COALESCE(h.c1, 0) AS DOUBLE) + CAST(v.v AS DOUBLE))) * 1000000) AS BIGINT) AS s_micro
        |  FROM score s
        |  LEFT JOIN bg ON s.w1 = bg.w1 AND s.w2 = bg.w2
        |  LEFT JOIN heads h ON s.w1 = h.w1
        |  CROSS JOIN vocab v
        |)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        |  CAST(floor(CAST(SUM(s_micro) AS DOUBLE) / COUNT(*)) AS BIGINT) AS surprisal_micro
        |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q104_upsert" ->
      """WITH base AS (
        |  SELECT c_custkey, c_name, c_nationkey, c_mktsegment,
        |         CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_cents
        |  FROM customer
        |), upd AS (
        |  SELECT o_custkey AS c_custkey,
        |         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS acctbal_cents,
        |         'ACTIVE' AS c_mktsegment
        |  FROM orders GROUP BY o_custkey
        |  UNION ALL
        |  SELECT 10000000 + o_orderkey,
        |         CAST(round(o_totalprice * 100) AS BIGINT), 'NEW'
        |  FROM orders WHERE o_orderkey % 1000 = 0
        |)
        |SELECT COALESCE(b.c_custkey, u.c_custkey) AS c_custkey,
        |  b.c_name AS c_name, b.c_nationkey AS c_nationkey,
        |  COALESCE(u.c_mktsegment, b.c_mktsegment) AS c_mktsegment,
        |  COALESCE(u.acctbal_cents, b.acctbal_cents) AS acctbal_cents
        |FROM base b FULL OUTER JOIN upd u ON b.c_custkey = u.c_custkey
        |ORDER BY c_custkey""".stripMargin,
    // Same statement Spark executes via spark.sql — both engines'
    // planners decorrelate it; results must agree exactly.
    "q105_sql_subqueries" ->
      """SELECT c.c_custkey, c.c_mktsegment,
        |  CAST((SELECT COUNT(*) FROM orders o
        |        WHERE o.o_custkey = c.c_custkey) AS BIGINT) AS n_orders
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
        |  AND c.c_custkey NOT IN (SELECT o_custkey FROM orders
        |                          WHERE o_orderpriority = '1-URGENT')
        |ORDER BY c.c_custkey""".stripMargin,
    // bin() (exact floor-log2 via string length — no float log at
    // bucket boundaries) matches Spark's bin(); all rank math in ppm
    // integers.
    "q106_logq_sketch" ->
      """WITH v AS (
        |  SELECT l_returnflag, CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
        |  FROM lineitem
        |), b AS (
        |  SELECT l_returnflag,
        |    CASE WHEN cents < 16 THEN cents
        |         ELSE CAST(length(bin(cents)) - 1 AS BIGINT) * 16
        |            + (cents // (CAST(1 AS BIGINT) << (length(bin(cents)) - 5))) - 16
        |    END AS bucket
        |  FROM v
        |), c AS (
        |  SELECT l_returnflag, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM b GROUP BY l_returnflag, bucket
        |), w AS (
        |  SELECT l_returnflag, bucket,
        |    CAST(SUM(cnt) OVER (PARTITION BY l_returnflag ORDER BY bucket
        |                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
        |    CAST(SUM(cnt) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n
        |  FROM c
        |), picked AS (
        |  SELECT l_returnflag, MAX(n) AS n_rows,
        |    MIN(CASE WHEN cum >= greatest((n * 500000 + 999999) // 1000000, 1) THEN bucket END) AS b50,
        |    MIN(CASE WHEN cum >= greatest((n * 950000 + 999999) // 1000000, 1) THEN bucket END) AS b95,
        |    MIN(CASE WHEN cum >= greatest((n * 990000 + 999999) // 1000000, 1) THEN bucket END) AS b99
        |  FROM w GROUP BY l_returnflag
        |)
        |SELECT l_returnflag, n_rows,
        |  CASE WHEN b50 < 16 THEN b50 ELSE (b50 % 16 + 16) << (b50 // 16 - 4) END AS p50_lb,
        |  CASE WHEN b95 < 16 THEN b95 ELSE (b95 % 16 + 16) << (b95 // 16 - 4) END AS p95_lb,
        |  CASE WHEN b99 < 16 THEN b99 ELSE (b99 % 16 + 16) << (b99 // 16 - 4) END AS p99_lb
        |FROM picked ORDER BY l_returnflag""".stripMargin,
    // first-occurrence-wins paragraph dedup over the synthesized
    // banner+content corpus (parallel unnests zip para/pos; 1- vs
    // 0-based pos is order-equivalent)
    "q107_paragraph_dedup" ->
      """WITH paraed AS (
        |  SELECT doc_id,
        |    'SOURCE ' || source || ' BANNER' || chr(10) || chr(10) ||
        |    substring(text, 1, 100) || chr(10) || chr(10) ||
        |    substring(text, 101, 100) AS text
        |  FROM documents
        |), paras AS (
        |  SELECT doc_id,
        |    unnest(string_split(text, chr(10) || chr(10))) AS para,
        |    unnest(range(1, len(string_split(text, chr(10) || chr(10))) + 1)) AS pos
        |  FROM paraed
        |), pf AS (
        |  SELECT * FROM paras WHERE length(trim(para)) > 0
        |), owned AS (
        |  SELECT doc_id, pos, para,
        |    row_number() OVER (PARTITION BY md5(para) ORDER BY doc_id, pos) AS rn
        |  FROM pf
        |), kept AS (
        |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
        |         string_agg(para, chr(10) || chr(10) ORDER BY pos) AS text_dedup
        |  FROM owned WHERE rn = 1 GROUP BY doc_id
        |), totals AS (
        |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_paras FROM pf GROUP BY doc_id
        |)
        |SELECT p.doc_id,
        |  COALESCE(t.n_paras, 0) AS n_paras,
        |  COALESCE(k.n_kept, 0) AS n_kept,
        |  COALESCE(k.text_dedup, '') AS text_dedup
        |FROM paraed p
        |LEFT JOIN totals t USING (doc_id)
        |LEFT JOIN kept k USING (doc_id)
        |ORDER BY p.doc_id""".stripMargin,
    // exp micro-quantized per event BEFORE the sum (probe-verified JVM
    // and DuckDB exp agree post-rounding on this data, same as the ln
    // rule); the aggregate is an exact integer sum
    "q108_decayed_popularity" ->
      """WITH ev AS (
        |  SELECT TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) % 20 AS category_id,
        |         CAST(floor(extract(epoch FROM ts)) AS BIGINT) AS s
        |  FROM events
        |  WHERE TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL
        |), mx AS (
        |  SELECT MAX(s) AS t_max FROM ev
        |)
        |SELECT category_id, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(SUM(CAST(round(exp(CAST(t_max - s AS DOUBLE) / -604800.0) * 1000000) AS BIGINT)) AS BIGINT) AS decayed_pop_micro
        |FROM ev CROSS JOIN mx
        |GROUP BY category_id ORDER BY category_id""".stripMargin,
    "q109_locf_impute" ->
      """WITH daily AS (
        |  SELECT user_id,
        |    CAST(floor(extract(epoch FROM ts)) AS BIGINT) // 86400 AS day_num,
        |    CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS day_cents
        |  FROM events GROUP BY user_id, day_num
        |), spans AS (
        |  SELECT user_id, MIN(day_num) AS mn, MAX(day_num) AS mx FROM daily GROUP BY user_id
        |), grid AS (
        |  SELECT user_id, unnest(range(mn, mx + 1)) AS day_num FROM spans
        |), joined AS (
        |  SELECT g.user_id, g.day_num, d.day_cents
        |  FROM grid g LEFT JOIN daily d
        |    ON g.user_id = d.user_id AND g.day_num = d.day_num
        |)
        |SELECT user_id, day_num, day_cents,
        |  last_value(day_cents IGNORE NULLS) OVER (
        |    PARTITION BY user_id ORDER BY day_num
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_cents,
        |  CASE WHEN day_cents IS NULL THEN 1 ELSE 0 END AS is_imputed
        |FROM joined ORDER BY user_id, day_num""".stripMargin,
    // Wilson lower bound: sqrt/division are correctly rounded IEEE, so
    // identical expression shape reproduces bit-for-bit from exact
    // counts — only the final micro floor quantizes.
    "q110_ctr_wilson" ->
      """WITH ev AS (
        |  SELECT TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) % 20 AS category_id,
        |         event_type
        |  FROM events
        |  WHERE TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL
        |), agg AS (
        |  SELECT category_id,
        |    CAST(COUNT(*) AS BIGINT) AS n_events,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchases
        |  FROM ev GROUP BY category_id
        |), f AS (
        |  SELECT *, CAST(n_events AS DOUBLE) AS nd,
        |         CAST(purchases AS DOUBLE) / CAST(n_events AS DOUBLE) AS p,
        |         CAST(1.96 AS DOUBLE) AS z
        |  FROM agg WHERE n_events > 0
        |)
        |SELECT category_id, n_events, purchases,
        |  CAST(floor(1000000.0 * p) AS BIGINT) AS ctr_micro,
        |  CAST(floor(1000000.0 * (((p + z * z / (2.0 * nd))
        |    - z * sqrt((p * (1.0 - p) + z * z / (4.0 * nd * nd)) / nd))
        |    / (1.0 + z * z / nd))) AS BIGINT) AS wilson_lo_micro
        |FROM f ORDER BY category_id""".stripMargin,
    "q111_item_cosine" ->
      s"""WITH $sessCte, $covisPairsCte, base AS (
         |  SELECT item_id, CAST(COUNT(*) AS BIGINT) AS c FROM dik GROUP BY item_id
         |)
         |SELECT p.item_a, p.item_b, p.pair_count,
         |  CAST(floor(1000000.0 * CAST(p.pair_count AS DOUBLE) /
         |       sqrt(CAST(ca.c AS DOUBLE) * CAST(cb.c AS DOUBLE))) AS BIGINT) AS cosine_micro
         |FROM pairs p
         |JOIN base ca ON p.item_a = ca.item_id
         |JOIN base cb ON p.item_b = cb.item_id
         |ORDER BY item_a, item_b""".stripMargin,
    "q112_hitrate_eval" ->
      s"""WITH $sessCte, $transCte, $covisPairsCte, $covisDirectedCte, ${covisTopSql("top3", 3, withRn = false)}
         |SELECT CAST(SUM(t.transition_count) AS BIGINT) AS n_transitions,
         |  CAST(SUM(CASE WHEN h.dst IS NOT NULL THEN t.transition_count ELSE 0 END) AS BIGINT) AS n_hits,
         |  CAST(SUM(CASE WHEN h.dst IS NOT NULL THEN t.transition_count ELSE 0 END) * 1000000
         |       // SUM(t.transition_count) AS BIGINT) AS hit_ppm
         |FROM trans t
         |LEFT JOIN top3 h ON t.item_a = h.src AND t.item_b = h.dst""".stripMargin,
    "q113_quality_survivors" ->
      s"""WITH RECURSIVE $neardupComponentsCte
         |SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS component, d.n_chars,
         |  (row_number() OVER (PARTITION BY COALESCE(c.component, d.doc_id)
         |                      ORDER BY d.n_chars DESC, d.doc_id ASC) = 1) AS keep
         |FROM documents d LEFT JOIN comp c ON d.doc_id = c.id
         |ORDER BY d.doc_id""".stripMargin,
    // integer-exact robust stats: lower-median rank (n+1)//2 on cents
    "q114_mad_outliers" ->
      """WITH v AS (
        |  SELECT l_returnflag, CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
        |         l_orderkey, l_linenumber
        |  FROM lineitem
        |), r1 AS (
        |  SELECT *, row_number() OVER (PARTITION BY l_returnflag
        |              ORDER BY cents, l_orderkey, l_linenumber) AS rn,
        |         COUNT(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM v
        |), med AS (
        |  SELECT l_returnflag, MAX(CASE WHEN rn = (n + 1) // 2 THEN cents END) AS med
        |  FROM r1 GROUP BY l_returnflag
        |), dev AS (
        |  SELECT v.*, m.med, abs(v.cents - m.med) AS dev
        |  FROM v JOIN med m USING (l_returnflag)
        |), r2 AS (
        |  SELECT *, row_number() OVER (PARTITION BY l_returnflag
        |              ORDER BY dev, l_orderkey, l_linenumber) AS rn,
        |         COUNT(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM dev
        |), mad AS (
        |  SELECT l_returnflag, MAX(CASE WHEN rn = (n + 1) // 2 THEN dev END) AS mad
        |  FROM r2 GROUP BY l_returnflag
        |)
        |SELECT d.l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  MAX(d.med) AS median_cents, MAX(ma.mad) AS mad_cents,
        |  CAST(SUM(CASE WHEN d.dev > 3 * ma.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM dev d JOIN mad ma USING (l_returnflag)
        |GROUP BY d.l_returnflag ORDER BY d.l_returnflag""".stripMargin,
    // running-window MATCH_RECOGNIZE shape: qualified-click running max
    "q115_sequence_detect" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type,
        |         CAST(floor(extract(epoch FROM ts)) AS BIGINT) AS epoch_s
        |  FROM events
        |), rv AS (
        |  SELECT *, MAX(CASE WHEN event_type = 'view' THEN epoch_s END)
        |    OVER w AS run_view
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY epoch_s, event_id
        |                      ROWS UNBOUNDED PRECEDING)
        |), qc AS (
        |  SELECT *, CASE WHEN event_type = 'click' AND run_view >= epoch_s - 3600
        |                 THEN epoch_s END AS qual_click
        |  FROM rv
        |), rq AS (
        |  SELECT *, MAX(qual_click) OVER w2 AS run_qclick
        |  FROM qc WINDOW w2 AS (PARTITION BY user_id ORDER BY epoch_s, event_id
        |                        ROWS UNBOUNDED PRECEDING)
        |)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_purchases,
        |  CAST(SUM(CASE WHEN run_qclick >= epoch_s - 3600 THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
        |  CAST(SUM(CASE WHEN run_qclick >= epoch_s - 3600 THEN 1 ELSE 0 END) * 1000000
        |       // COUNT(*) AS BIGINT) AS match_ppm
        |FROM rq WHERE event_type = 'purchase'""".stripMargin,
    // the reference's own offline metric: is the anchor's true category
    // inside its 4-strategy candidate set (label y=1 rows)?
    "q116_candidate_recall" ->
      s"""WITH $sessCte, $candidatesCte, hit AS (
         |  SELECT a.anchor_id FROM anchors a JOIN cands c
         |    ON a.anchor_id = c.anchor_id AND a.category_id = c.category_id
         |)
         |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM anchors) AS n_anchors,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM hit) AS n_hit,
         |  CAST((SELECT COUNT(*) FROM hit) * 1000000
         |       // (SELECT COUNT(*) FROM anchors) AS BIGINT) AS recall_ppm""".stripMargin,
    "q117_strategy_recall" ->
      s"""WITH $sessCte, $candidatesCte, na AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n_anchors FROM anchors
         |), hits AS (
         |  SELECT 'prefix' AS strategy, CAST(COUNT(*) AS BIGINT) AS n_hit
         |  FROM anchors a JOIN prefix_cand c
         |    ON a.anchor_id = c.anchor_id AND a.category_id = c.category_id
         |  UNION ALL
         |  SELECT 'covis', CAST(COUNT(*) AS BIGINT)
         |  FROM anchors a JOIN covis_cand c
         |    ON a.anchor_id = c.anchor_id AND a.category_id = c.category_id
         |  UNION ALL
         |  SELECT 'popularity', CAST(COUNT(*) AS BIGINT)
         |  FROM anchors a JOIN pop_cand c
         |    ON a.anchor_id = c.anchor_id AND a.category_id = c.category_id
         |  UNION ALL
         |  SELECT 'history', CAST(COUNT(*) AS BIGINT)
         |  FROM anchors a JOIN hist_cand c
         |    ON a.anchor_id = c.anchor_id AND a.category_id = c.category_id
         |)
         |SELECT h.strategy, na.n_anchors, h.n_hit,
         |  CAST(h.n_hit * 1000000 // na.n_anchors AS BIGINT) AS recall_ppm
         |FROM hits h CROSS JOIN na ORDER BY h.strategy""".stripMargin,
    // per-bin (p-q)*ln(p/q) micro-quantized; Laplace +1 dense bins
    "q118_psi_drift" ->
      """WITH b AS (
        |  SELECT CAST(floor(extract(epoch FROM ts)) AS BIGINT) // 86400 % 2 AS split,
        |    CAST(least(greatest(floor(value / 50.0), 0.0), 9.0) AS BIGINT) AS bin
        |  FROM events
        |), counts AS (
        |  SELECT bin,
        |    CAST(SUM(CASE WHEN split = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c_ref,
        |    CAST(SUM(CASE WHEN split = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c_cur
        |  FROM b GROUP BY bin
        |), dense AS (
        |  SELECT g.bin, COALESCE(c.c_ref, 0) + 1 AS n_ref, COALESCE(c.c_cur, 0) + 1 AS n_cur
        |  FROM (SELECT unnest(range(0, 10)) AS bin) g LEFT JOIN counts c ON g.bin = c.bin
        |), t AS (
        |  SELECT CAST(SUM(n_ref) AS BIGINT) AS t_ref, CAST(SUM(n_cur) AS BIGINT) AS t_cur FROM dense
        |)
        |SELECT bin, CAST(n_ref AS BIGINT) AS n_ref, CAST(n_cur AS BIGINT) AS n_cur,
        |  CAST(round(1000000.0 *
        |    (CAST(n_ref AS DOUBLE) / CAST(t_ref AS DOUBLE) - CAST(n_cur AS DOUBLE) / CAST(t_cur AS DOUBLE)) *
        |    ln((CAST(n_ref AS DOUBLE) / CAST(t_ref AS DOUBLE)) / (CAST(n_cur AS DOUBLE) / CAST(t_cur AS DOUBLE)))) AS BIGINT)
        |    AS psi_contrib_micro
        |FROM dense CROSS JOIN t ORDER BY bin""".stripMargin,
    // exact KS: integer |cum_ref*n_cur - cum_cur*n_ref| maximized in
    // decimal; the only float is the final micro division
    "q119_ks_drift" ->
      """WITH b AS (
        |  SELECT (CAST(floor(extract(epoch FROM ts)) AS BIGINT) // 86400) % 2 AS split,
        |         CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events
        |), c AS (
        |  SELECT cents,
        |    CAST(SUM(CASE WHEN split = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c_ref,
        |    CAST(SUM(CASE WHEN split = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c_cur
        |  FROM b GROUP BY cents
        |), w AS (
        |  SELECT *,
        |    CAST(SUM(c_ref) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_ref,
        |    CAST(SUM(c_cur) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cur
        |  FROM c
        |), t AS (
        |  SELECT CAST(SUM(c_ref) AS BIGINT) AS n_ref, CAST(SUM(c_cur) AS BIGINT) AS n_cur FROM c
        |), dmax AS (
        |  SELECT MAX(abs(CAST(w.cum_ref AS DECIMAL(19,0)) * CAST(t.n_cur AS DECIMAL(19,0))
        |              - CAST(w.cum_cur AS DECIMAL(19,0)) * CAST(t.n_ref AS DECIMAL(19,0)))) AS d_num
        |  FROM w CROSS JOIN t
        |)
        |SELECT t.n_ref, t.n_cur,
        |  CAST(floor(1000000.0 * CAST(d.d_num AS DOUBLE)
        |       / (CAST(t.n_ref AS DOUBLE) * CAST(t.n_cur AS DOUBLE))) AS BIGINT) AS ks_micro
        |FROM t CROSS JOIN dmax d""".stripMargin,
    // exact Mann-Whitney AUC: integer concordant/tied pair counts via
    // the global CDF; only the final micro division is float
    "q120_auc_eval" ->
      """WITH c AS (
        |  SELECT CAST(round(value * 100) AS BIGINT) AS cents,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_pos_c,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END) AS BIGINT) AS n_neg_c
        |  FROM events GROUP BY cents
        |), w AS (
        |  SELECT *,
        |    CAST(SUM(n_neg_c) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |      - n_neg_c AS neg_below
        |  FROM c
        |), agg AS (
        |  SELECT CAST(SUM(n_pos_c) AS BIGINT) AS n_pos,
        |    CAST(SUM(n_neg_c) AS BIGINT) AS n_neg,
        |    SUM(CAST(n_pos_c AS DECIMAL(19,0)) * CAST(neg_below AS DECIMAL(19,0))) AS concordant,
        |    SUM(CAST(n_pos_c AS DECIMAL(19,0)) * CAST(n_neg_c AS DECIMAL(19,0))) AS tied
        |  FROM w
        |)
        |SELECT n_pos, n_neg,
        |  CAST(floor(1000000.0 *
        |    (2.0 * CAST(concordant AS DOUBLE) + CAST(tied AS DOUBLE)) /
        |    (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE))) AS BIGINT) AS auc_micro
        |FROM agg""".stripMargin,
    // per-(row, replicate) md5 multiplicity ~ Poisson(1); exact integer
    // weighted means per replicate
    "q121_bootstrap_ci" ->
      """WITH fan AS (
        |  SELECT CAST(event_id AS VARCHAR) AS id,
        |         CAST(round(value * 100) AS BIGINT) AS v,
        |         b AS replicate
        |  FROM events, unnest(range(0, 32)) AS t(b)
        |), wgt AS (
        |  SELECT replicate, v,
        |    CASE WHEN u < 368 THEN 0 WHEN u < 736 THEN 1
        |         WHEN u < 920 THEN 2 ELSE 3 END AS w
        |  FROM (
        |    SELECT *, CAST(('0x' || substring(md5(id || '|' || CAST(replicate AS VARCHAR)), 1, 8)) AS BIGINT) % 1000 AS u
        |    FROM fan)
        |)
        |SELECT replicate, CAST(SUM(w) AS BIGINT) AS n_eff,
        |  CAST(SUM(w * v) AS BIGINT) * 1000000 // CAST(SUM(w) AS BIGINT) AS mean_micro
        |FROM wgt GROUP BY replicate HAVING SUM(w) > 0 ORDER BY replicate""".stripMargin,
    "q122_cross_source_dups" ->
      s"""WITH ${shingleCte(4)}, fsh AS (
         |  SELECT DISTINCT doc_id, CAST(('0x' || substring(md5(shingle), 1, 15)) AS BIGINT) AS shingle FROM sh
         |), sizes AS (
         |  SELECT doc_id, COUNT(*) AS n FROM fsh GROUP BY doc_id
         |), cand AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter_count
         |  FROM fsh a JOIN fsh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2
         |), vp AS (
         |  SELECT id_a, id_b FROM cand
         |  JOIN sizes sa ON id_a = sa.doc_id
         |  JOIN sizes sb ON id_b = sb.doc_id
         |  WHERE floor(inter_count * 1000000 / (sa.n + sb.n - inter_count)) >= 500000
         |)
         |SELECT least(da.source, db.source) AS source_a,
         |  greatest(da.source, db.source) AS source_b,
         |  CAST(COUNT(*) AS BIGINT) AS n_dup_pairs
         |FROM vp
         |JOIN documents da ON vp.id_a = da.doc_id
         |JOIN documents db ON vp.id_b = db.doc_id
         |GROUP BY 1, 2 ORDER BY source_a, source_b""".stripMargin,
    "q123_vocab_growth" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS term
        |  FROM documents
        |), fs AS (
        |  SELECT MIN(doc_id) AS doc_id FROM toks GROUP BY term
        |), nn AS (
        |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_new_terms FROM fs GROUP BY doc_id
        |), per AS (
        |  SELECT d.doc_id,
        |    CAST(len(regexp_split_to_array(trim(d.text), '\s+')) AS BIGINT) AS n_tokens,
        |    COALESCE(n.n_new_terms, 0) AS n_new_terms
        |  FROM documents d LEFT JOIN nn n ON d.doc_id = n.doc_id
        |)
        |SELECT doc_id,
        |  CAST(SUM(n_tokens) OVER w AS BIGINT) AS cum_tokens,
        |  CAST(SUM(n_new_terms) OVER w AS BIGINT) AS cum_vocab
        |FROM per WINDOW w AS (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
        |ORDER BY doc_id""".stripMargin,
    "q124_peak_concurrency" ->
      s"""WITH $sessCte, sp AS (
         |  SELECT session_id, MIN(epoch_s) AS start_s, MAX(epoch_s) AS end_s
         |  FROM sess GROUP BY session_id
         |), deltas AS (
         |  SELECT t, CAST(SUM(d) AS BIGINT) AS net FROM (
         |    SELECT start_s AS t, 1 AS d FROM sp
         |    UNION ALL
         |    SELECT end_s + 1 AS t, -1 AS d FROM sp
         |  ) GROUP BY t
         |), conc AS (
         |  SELECT t, CAST(SUM(net) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS BIGINT) AS concurrency
         |  FROM deltas
         |), peak AS (
         |  SELECT MAX(concurrency) AS peak_concurrency FROM conc
         |)
         |SELECT p.peak_concurrency, MIN(c.t) AS first_peak_s
         |FROM conc c JOIN peak p ON c.concurrency = p.peak_concurrency
         |GROUP BY p.peak_concurrency""".stripMargin,
    "q125_visits" ->
      s"""WITH $sessCte, sp AS (
         |  SELECT user_id, session_id, MIN(epoch_s) AS start_s, MAX(epoch_s) AS end_s,
         |         CAST(COUNT(*) AS BIGINT) AS n_events
         |  FROM sess GROUP BY user_id, session_id
         |), lag2 AS (
         |  SELECT *, lag(end_s) OVER w AS prev_end
         |  FROM sp WINDOW w AS (PARTITION BY user_id ORDER BY start_s, session_id)
         |), flag2 AS (
         |  SELECT *, CASE WHEN prev_end IS NULL OR start_s - prev_end > 604800
         |                 THEN 1 ELSE 0 END AS is_new
         |  FROM lag2
         |), vis AS (
         |  SELECT *, CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY start_s, session_id
         |                                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS visit_num
         |  FROM flag2
         |)
         |SELECT user_id, visit_num, CAST(COUNT(*) AS BIGINT) AS n_sessions,
         |  CAST(SUM(n_events) AS BIGINT) AS n_events,
         |  MIN(start_s) AS visit_start_s, MAX(end_s) AS visit_end_s
         |FROM vis GROUP BY user_id, visit_num
         |ORDER BY user_id, visit_num""".stripMargin,
    // brute-force triple enumeration; the engine's apriori pruning is
    // lossless so the sets must match exactly
    "q126_frequent_triples" ->
      """WITH di AS (
        |  SELECT DISTINCT
        |    CAST(user_id AS VARCHAR) || '_' ||
        |      CAST(CAST(floor(extract(epoch FROM ts)) AS BIGINT) // 86400 AS VARCHAR) AS basket,
        |    TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS item_id
        |  FROM events
        |  WHERE TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL
        |), small AS (
        |  SELECT basket FROM di GROUP BY basket HAVING COUNT(*) <= 200
        |), dik AS (
        |  SELECT di.* FROM di JOIN small USING (basket)
        |)
        |SELECT a.item_id AS item_a, b.item_id AS item_b, c.item_id AS item_c,
        |  CAST(COUNT(*) AS BIGINT) AS triple_count
        |FROM dik a
        |JOIN dik b ON a.basket = b.basket AND a.item_id < b.item_id
        |JOIN dik c ON a.basket = c.basket AND c.item_id > b.item_id
        |GROUP BY 1, 2, 3 HAVING COUNT(*) >= 2
        |ORDER BY item_a, item_b, item_c""".stripMargin,
    "q127_rolling_wau" ->
      """WITH du AS (
        |  SELECT DISTINCT user_id,
        |    CAST(floor(extract(epoch FROM ts)) AS BIGINT) // 86400 AS day
        |  FROM events
        |), contrib AS (
        |  SELECT DISTINCT user_id, w_day
        |  FROM du, unnest(generate_series(day, day + 6)) AS t(w_day)
        |)
        |SELECT w_day, CAST(COUNT(*) AS BIGINT) AS wau
        |FROM contrib GROUP BY w_day ORDER BY w_day""".stripMargin,
    // stride-1 48-char window fingerprints; occ>=2 positions merged into
    // maximal ranges (equal-length intervals: break when gap > 48)
    "q128_substring_repeats" -> substringRepeatsSql(48),
    // q42's clusters + q33's stopword-ppm quality; survivor = best copy
    // per component (quality DESC, doc_id ASC)
    "q129_best_of_cluster" -> {
      val stop = langScoreSql(Seq("the", "a", "and", "of"))
      s"""WITH RECURSIVE $neardupComponentsCte, q AS (
         |  SELECT doc_id,
         |    CAST(floor($stop * 1000000 /
         |      len(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT) AS quality_ppm
         |  FROM documents
         |), labeled AS (
         |  SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS component, q.quality_ppm
         |  FROM documents d
         |  LEFT JOIN comp c ON d.doc_id = c.id
         |  JOIN q ON q.doc_id = d.doc_id
         |), r AS (
         |  SELECT *, ROW_NUMBER() OVER (
         |    PARTITION BY component ORDER BY quality_ppm DESC, doc_id ASC) AS rn
         |  FROM labeled
         |)
         |SELECT doc_id, component, quality_ppm, (rn = 1) AS is_survivor
         |FROM r ORDER BY doc_id""".stripMargin
    },
    // greedy longest-first prefix per source under a 3000-token budget
    "q130_token_budget" ->
      s"""WITH t AS (
         |  SELECT doc_id, source,
         |    CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens
         |  FROM documents
         |), c AS (
         |  SELECT doc_id, source, n_tokens,
         |    SUM(n_tokens) OVER (PARTITION BY source ORDER BY n_tokens DESC, doc_id ASC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
         |  FROM t
         |)
         |SELECT doc_id, source, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens,
         |  CAST(CASE WHEN cum_tokens <= 3000 THEN 1 ELSE 0 END AS BIGINT) AS kept
         |FROM c ORDER BY doc_id""".stripMargin,
    // whole near-dup components hashed to splits — no straddling pair
    "q131_leakage_split" ->
      s"""WITH RECURSIVE $neardupComponentsCte, labeled AS (
         |  SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS component
         |  FROM documents d LEFT JOIN comp c ON d.doc_id = c.id
         |)
         |SELECT doc_id, component,
         |  CASE WHEN CAST(('0x' || substring(md5(CAST(component AS VARCHAR)), 1, 8)) AS BIGINT) % 1000 < 200
         |       THEN 'valid' ELSE 'train' END AS split
         |FROM labeled ORDER BY doc_id""".stripMargin,
    // per-source keep rate = floor(1000*sqrt(min_tokens/src_tokens));
    // sqrt/div are correctly-rounded IEEE -> bit-identical cross-engine
    "q132_temperature_mix" ->
      s"""WITH t AS (
         |  SELECT doc_id, source,
         |    CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens
         |  FROM documents
         |), sz AS (
         |  SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS src_tokens FROM t GROUP BY source
         |), m AS (
         |  SELECT MIN(src_tokens) AS min_tokens FROM sz
         |), r AS (
         |  SELECT source,
         |    CAST(floor(1000 * sqrt(CAST(min_tokens AS DOUBLE) / CAST(src_tokens AS DOUBLE))) AS BIGINT)
         |      AS keep_permille
         |  FROM sz CROSS JOIN m
         |)
         |SELECT t.doc_id, t.source, t.n_tokens, r.keep_permille
         |FROM t JOIN r USING (source)
         |WHERE CAST(('0x' || substring(md5(CAST(t.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000 < r.keep_permille
         |ORDER BY t.doc_id""".stripMargin,
    // asymmetric containment: both directions of each canonical pair
    "q133_containment" ->
      s"""WITH ${shingleCte(4)}, sizes AS (
         |  SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
         |), cand AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter_count
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2
         |), dirs AS (
         |  SELECT c.id_a AS doc_id, c.id_b AS contained_in, c.inter_count, sa.n AS n_id
         |  FROM cand c JOIN sizes sa ON c.id_a = sa.doc_id
         |  UNION ALL
         |  SELECT c.id_b AS doc_id, c.id_a AS contained_in, c.inter_count, sb.n AS n_id
         |  FROM cand c JOIN sizes sb ON c.id_b = sb.doc_id
         |)
         |SELECT doc_id, contained_in,
         |  CAST(inter_count AS BIGINT) AS inter_count,
         |  CAST(n_id AS BIGINT) AS n_id,
         |  CAST(floor(inter_count * 1000000 / n_id) AS BIGINT) AS containment_ppm
         |FROM dirs
         |WHERE n_id >= 5 AND floor(inter_count * 1000000 / n_id) >= 600000
         |ORDER BY containment_ppm DESC, doc_id, contained_in LIMIT 100""".stripMargin,
    // winnowing: positional 3-gram 60-bit hashes, window-4 minima;
    // the pair overlap uses the fp SET, so the rightmost-tie rule
    // (positions) cannot affect this contract
    "q134_winnowing" ->
      s"""WITH docs AS (
         |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks FROM documents
         |), ph AS (
         |  SELECT doc_id, i AS pos,
         |    CAST(('0x' || substring(md5(array_to_string(toks[i:i+2], ' ')), 1, 15)) AS BIGINT) AS h
         |  FROM docs, unnest(generate_series(1, len(toks) - 2)) AS t(i)
         |), starts AS (
         |  SELECT doc_id,
         |    min(h) OVER (PARTITION BY doc_id ORDER BY pos
         |                 ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS mn,
         |    count(*) OVER (PARTITION BY doc_id ORDER BY pos
         |                   ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS cnt
         |  FROM ph
         |), fps AS (
         |  SELECT DISTINCT doc_id, mn AS fp FROM starts WHERE cnt = 4
         |), pairs AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared_fps
         |  FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2
         |)
         |SELECT id_a, id_b, CAST(shared_fps AS BIGINT) AS shared_fps
         |FROM pairs WHERE shared_fps >= 2
         |ORDER BY shared_fps DESC, id_a, id_b LIMIT 50""".stripMargin,
    // rank-aware covis eval: q112's CTE chain with rank kept to 10
    "q135_mrr_eval" ->
      s"""WITH $sessCte, $transCte, $covisPairsCte, $covisDirectedCte, ${covisTopSql("top10", 10, withRn = true)}
         |SELECT CAST(SUM(t.transition_count) AS BIGINT) AS n_transitions,
         |  CAST(SUM(CASE WHEN h.rn IS NOT NULL THEN t.transition_count ELSE 0 END) AS BIGINT) AS n_hits10,
         |  CAST(SUM(CASE WHEN h.rn IS NOT NULL THEN t.transition_count * (1000000 // h.rn) ELSE 0 END)
         |       // SUM(t.transition_count) AS BIGINT) AS mrr_micro
         |FROM trans t
         |LEFT JOIN top10 h ON t.item_a = h.src AND t.item_b = h.dst""".stripMargin,
    // reliability bins: train-half category rates scored on eval half
    "q136_calibration" ->
      """WITH e AS (
        |  SELECT event_id,
        |    TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) % 20 AS category_id,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |  FROM events
        |  WHERE TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL
        |), pred AS (
        |  SELECT category_id, CAST(SUM(y) * 1000000 // COUNT(*) AS BIGINT) AS pred_ppm
        |  FROM e WHERE event_id % 2 = 0 GROUP BY category_id
        |)
        |SELECT CAST(least(pred_ppm * 10 // 1000000, 9) AS BIGINT) AS bin,
        |  CAST(COUNT(*) AS BIGINT) AS n_eval,
        |  CAST(SUM(pred_ppm) // COUNT(*) AS BIGINT) AS mean_pred_ppm,
        |  CAST(SUM(y) * 1000000 // COUNT(*) AS BIGINT) AS emp_ppm
        |FROM e JOIN pred USING (category_id)
        |WHERE event_id % 2 = 1
        |GROUP BY 1 ORDER BY bin""".stripMargin,
    // exact triangle census of the covis graph (a<b<c enumeration)
    "q137_triangles" ->
      s"""WITH $sessCte, $covisEdgesCte, tri AS (
         |  SELECT ab.item_a AS a, ab.item_b AS b, bc.item_b AS c
         |  FROM pairs ab
         |  JOIN pairs bc ON ab.item_b = bc.item_a
         |  JOIN pairs ac ON ac.item_a = ab.item_a AND ac.item_b = bc.item_b
         |), v AS (
         |  SELECT a AS item_id FROM tri
         |  UNION ALL SELECT b FROM tri
         |  UNION ALL SELECT c FROM tri
         |)
         |SELECT item_id, CAST(COUNT(*) AS BIGINT) AS tri_count
         |FROM v GROUP BY item_id
         |ORDER BY tri_count DESC, item_id ASC LIMIT 10""".stripMargin,
    // nDCG@10: q135's CTE chain, discount = floor(1e6/log2(rn+1)) as
    // integer literals (identical constants on the Spark side — no
    // runtime transcendental in either engine)
    "q138_ndcg_eval" ->
      s"""WITH $sessCte, $transCte, $covisPairsCte, $covisDirectedCte, ${covisTopSql("top10", 10, withRn = true)}, scored AS (
         |  SELECT t.transition_count,
         |    CASE h.rn WHEN 1 THEN 1000000 WHEN 2 THEN 630929 WHEN 3 THEN 500000
         |     WHEN 4 THEN 430676 WHEN 5 THEN 386852 WHEN 6 THEN 356207
         |     WHEN 7 THEN 333333 WHEN 8 THEN 315464 WHEN 9 THEN 301029
         |     WHEN 10 THEN 289064 ELSE 0 END AS disc
         |  FROM trans t
         |  LEFT JOIN top10 h ON t.item_a = h.src AND t.item_b = h.dst
         |)
         |SELECT CAST(SUM(transition_count) AS BIGINT) AS n_transitions,
         |  CAST(SUM(transition_count * disc) AS BIGINT) AS dcg_sum_micro,
         |  CAST(SUM(transition_count * disc) // SUM(transition_count) AS BIGINT) AS ndcg_micro
         |FROM scored""".stripMargin,
    // local clustering coefficient: q137's triangle CTEs + degree scan
    "q139_covis_clustering" ->
      s"""WITH $sessCte, $covisEdgesCte, tri AS (
         |  SELECT ab.item_a AS a, ab.item_b AS b, bc.item_b AS c
         |  FROM pairs ab
         |  JOIN pairs bc ON ab.item_b = bc.item_a
         |  JOIN pairs ac ON ac.item_a = ab.item_a AND ac.item_b = bc.item_b
         |), tc AS (
         |  SELECT item_id, COUNT(*) AS tri_count FROM (
         |    SELECT a AS item_id FROM tri
         |    UNION ALL SELECT b FROM tri
         |    UNION ALL SELECT c FROM tri
         |  ) GROUP BY item_id
         |), deg AS (
         |  SELECT item_id, COUNT(*) AS degree FROM (
         |    SELECT item_a AS item_id FROM pairs
         |    UNION ALL SELECT item_b FROM pairs
         |  ) GROUP BY item_id
         |)
         |SELECT d.item_id, CAST(d.degree AS BIGINT) AS degree,
         |  CAST(COALESCE(tc.tri_count, 0) AS BIGINT) AS tri_count,
         |  CAST(2 * COALESCE(tc.tri_count, 0) * 1000000 // (d.degree * (d.degree - 1)) AS BIGINT) AS cc_ppm
         |FROM deg d LEFT JOIN tc USING (item_id)
         |WHERE d.degree >= 2
         |ORDER BY cc_ppm DESC, degree DESC, d.item_id ASC LIMIT 20""".stripMargin,
    // 3-core via 3 bounded peeling rounds (q137's covis edge CTEs + the
    // generated peel chain; mirrors Graph.kCorePeel exactly)
    "q140_kcore" ->
      s"""WITH $sessCte, $covisEdgesCte, e0 AS (
         |  SELECT item_a AS src, item_b AS dst FROM pairs
         |), ${kcorePeelCte(3, 3)}
         |SELECT id AS item_id, CAST(COUNT(*) AS BIGINT) AS degree
         |FROM (SELECT src AS id FROM e3 UNION ALL SELECT dst FROM e3)
         |GROUP BY id ORDER BY degree DESC, item_id ASC""".stripMargin,
    // DSIR importance log-weights toward the lang='en' target
    // distribution: Laplace-smoothed unigram log-ratios, micro-quantized
    // per term before the per-doc sum (mirrors TextRanking.dsirLogWeights)
    "q141_dsir_select" ->
      """WITH toks AS (
        |  SELECT doc_id, (lang = 'en') AS is_target,
        |         unnest(regexp_split_to_array(trim(text), '\s+')) AS term
        |  FROM documents
        |), tf AS (
        |  SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
        |), by_term AS (
        |  SELECT term, COUNT(*) AS c_r,
        |         SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS c_t
        |  FROM toks GROUP BY term
        |), totals AS (
        |  SELECT COUNT(*) AS n_r,
        |         SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS n_t,
        |         COUNT(DISTINCT term) AS v
        |  FROM toks
        |), per_term AS (
        |  SELECT term,
        |    CAST(round(ln(((c_t + 1.0) / (n_t + v)) / ((c_r + 1.0) / (n_r + v))) * 1000000)
        |      AS BIGINT) AS lr_micro
        |  FROM by_term CROSS JOIN totals
        |)
        |SELECT tf.doc_id, CAST(SUM(tf.tf) AS BIGINT) AS n_tokens,
        |  CAST(SUM(tf.tf * per_term.lr_micro) AS BIGINT) AS logweight_micro
        |FROM tf JOIN per_term USING (term)
        |GROUP BY tf.doc_id
        |ORDER BY logweight_micro DESC, doc_id ASC LIMIT 50""".stripMargin,
    // SemDeDup: q41's deterministic quantizer (16 seeds, one exact Lloyd
    // step, rn=1 assignment), within-cell cosine >= 0.5 pairs, lower-id
    // survivor wins (mirrors Similarity.semanticDedup)
    "q142_semantic_dedup" ->
      s"""WITH $quantCte, ranked AS (
         |  SELECT vec_id, v, ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS srn
         |  FROM qv
         |), seeds AS (
         |  SELECT CAST(srn - 1 AS BIGINT) AS cid, v AS cq FROM ranked WHERE srn <= 16
         |), a0 AS (
         |  ${assignSql("qv", "seeds", "vid", 64)} WHERE rn = 1
         |), centd AS (
         |  SELECT cid, i, CAST(floor(CAST(SUM(v[i]) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cv
         |  FROM a0, unnest(generate_series(1, 64)) AS t(i)
         |  GROUP BY cid, i
         |), cent AS (
         |  SELECT cid, list(cv ORDER BY i) AS cq FROM centd GROUP BY cid
         |), assigned AS (
         |  ${assignSql("qv", "cent", "vid", 64)} WHERE rn = 1
         |), dropped AS (
         |  SELECT DISTINCT b.vid AS vec_id
         |  FROM assigned a JOIN assigned b ON a.cid = b.cid AND a.vid < b.vid
         |  WHERE ${cosineSql("a.v", "b.v", 64)} >= 0.4
         |)
         |SELECT s.vid AS vec_id, s.cid AS cell_id, (d.vec_id IS NULL) AS is_kept
         |FROM assigned s LEFT JOIN dropped d ON s.vid = d.vec_id
         |ORDER BY vec_id""".stripMargin,
    // aggregate diversity of the covis top-10 lists: catalog coverage +
    // exact integer Gini over per-item recommendation frequency
    // (zeros included; rank ties are permutation-invariant in S i*x_i)
    "q143_rec_coverage" ->
      s"""WITH $sessCte, $covisPairsCte, $covisDirectedCte,
         |${covisTopSql("top10", 10, withRn = false)}, catalog AS (
         |  SELECT DISTINCT item_id FROM enr
         |), freq AS (
         |  SELECT c.item_id, COALESCE(f.f, 0) AS f
         |  FROM catalog c LEFT JOIN (
         |    SELECT dst AS item_id, COUNT(*) AS f FROM top10 GROUP BY dst) f
         |  USING (item_id)
         |), ranked AS (
         |  SELECT f, ROW_NUMBER() OVER (ORDER BY f, item_id) AS i FROM freq
         |)
         |SELECT CAST(COUNT(*) AS BIGINT) AS catalog_size,
         |  CAST(SUM(CASE WHEN f > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_recommended,
         |  CAST(SUM(CASE WHEN f > 0 THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT)
         |    AS coverage_ppm,
         |  CAST((2 * SUM(i * f) - (COUNT(*) + 1) * SUM(f)) * 1000000
         |    // (COUNT(*) * SUM(f)) AS BIGINT) AS gini_ppm
         |FROM ranked""".stripMargin,
    // chi-squared term-language association over document-level
    // incidence; HUGEINT numerator mirrors the Spark DECIMAL(38,0) path
    "q144_chi2_terms" ->
      """WITH toks AS (
        |  SELECT doc_id, lang,
        |         unnest(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS term
        |  FROM documents
        |), term_lang AS (
        |  SELECT term, lang, COUNT(*) AS a FROM toks GROUP BY 1, 2
        |), term_total AS (
        |  SELECT term, SUM(a) AS df FROM term_lang GROUP BY 1 HAVING SUM(a) >= 5
        |), by_lang AS (
        |  SELECT lang, COUNT(*) AS n_lang FROM documents GROUP BY 1
        |), n AS (
        |  SELECT COUNT(*) AS n_docs FROM documents
        |), cells AS (
        |  SELECT lang, term, a, df, n_lang, n_docs,
        |         df - a AS b, n_lang - a AS c, n_docs - df - (n_lang - a) AS dd
        |  FROM term_lang JOIN term_total USING (term)
        |  JOIN by_lang USING (lang) CROSS JOIN n
        |  WHERE df < n_docs
        |), chi AS (
        |  SELECT lang, term, a, df,
        |    CAST((CAST(a AS HUGEINT) * dd - CAST(b AS HUGEINT) * c)
        |       * (CAST(a AS HUGEINT) * dd - CAST(b AS HUGEINT) * c)
        |       * n_docs * 1000000
        |      // (CAST(df AS HUGEINT) * (n_docs - df) * n_lang * (n_docs - n_lang))
        |      AS BIGINT) AS chi2_micro
        |  FROM cells
        |), r AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY lang
        |            ORDER BY chi2_micro DESC, term ASC) AS rn
        |  FROM chi
        |)
        |SELECT lang, term, CAST(a AS BIGINT) AS n_docs_in_lang,
        |  CAST(df AS BIGINT) AS df, chi2_micro, CAST(rn AS BIGINT) AS rn
        |FROM r WHERE rn <= 5 ORDER BY lang, rn""".stripMargin,
    // per-item outgoing-transition Shannon entropy (micro-nats;
    // surprisal quantized per destination before the weighted sum)
    "q145_transition_entropy" ->
      s"""WITH $sessCte, $transCte, totals AS (
         |  SELECT item_a, SUM(transition_count) AS total_out, COUNT(*) AS n_out
         |  FROM trans GROUP BY 1 HAVING SUM(transition_count) >= 5
         |), s AS (
         |  SELECT t.item_a, tt.total_out, tt.n_out, t.transition_count AS c,
         |    CAST(round(-ln(CAST(t.transition_count AS DOUBLE) / tt.total_out) * 1000000) AS BIGINT) AS s_micro
         |  FROM trans t JOIN totals tt USING (item_a)
         |)
         |SELECT item_a AS item_id, CAST(n_out AS BIGINT) AS n_out,
         |  CAST(total_out AS BIGINT) AS total_out,
         |  CAST(SUM(c * s_micro) // total_out AS BIGINT) AS entropy_micro
         |FROM s GROUP BY item_a, total_out, n_out
         |ORDER BY entropy_micro DESC, n_out DESC, item_id ASC LIMIT 100""".stripMargin,
    // hard negatives: brute-force cosine top-5 restricted to
    // different-label corpus vectors (quantized-integer cosine)
    "q146_hard_negatives" ->
      """WITH qv AS (
        |  SELECT vec_id, label,
        |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS v
        |  FROM embeddings
        |), q AS (
        |  SELECT * FROM qv WHERE vec_id < 32
        |), scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    CAST(list_sum(list_transform(generate_series(1, 64), i -> q.v[i] * c.v[i])) AS DOUBLE) /
        |      sqrt(CAST(list_sum(list_transform(q.v, x -> x * x)) AS DOUBLE)) /
        |      sqrt(CAST(list_sum(list_transform(c.v, x -> x * x)) AS DOUBLE)) AS cosine_sim
        |  FROM q JOIN qv c ON q.label <> c.label
        |), r AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        |            ORDER BY cosine_sim DESC, neighbor_id ASC) AS rn
        |  FROM scored
        |)
        |SELECT query_id, neighbor_id, cosine_sim FROM r WHERE rn <= 5
        |ORDER BY query_id, cosine_sim DESC, neighbor_id""".stripMargin,
    // CUSUM level-shift scan over daily event counts: deviations scaled
    // by the day count (c*D - T) so the running sum is exact integers
    "q147_cusum_drift" ->
      """WITH daily AS (
        |  SELECT CAST(floor(extract(epoch FROM ts)) AS BIGINT) // 86400 AS day_num,
        |         CAST(COUNT(*) AS BIGINT) AS n_events
        |  FROM events GROUP BY 1
        |), tot AS (
        |  SELECT SUM(n_events) AS t, COUNT(*) AS d_days FROM daily
        |), cusum AS (
        |  SELECT day_num, n_events,
        |    SUM(n_events * d_days - t) OVER (ORDER BY day_num
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cusum_scaled
        |  FROM daily CROSS JOIN tot
        |), peak AS (
        |  SELECT MAX(abs(cusum_scaled)) AS p FROM cusum
        |)
        |SELECT day_num, n_events, CAST(cusum_scaled AS BIGINT) AS cusum_scaled,
        |  (abs(cusum_scaled) = p) AS is_peak
        |FROM cusum CROSS JOIN peak ORDER BY day_num""".stripMargin,
    // first 4 BPE merges: vocabulary word counts -> double-separator
    // char sequences -> per-round pair-count argmax + greedy rewrite
    "q148_bpe_merges" ->
      s"""WITH w0 AS (
         |  SELECT w, COUNT(*) AS wc FROM (
         |    SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS w FROM documents)
         |  WHERE length(w) >= 2 GROUP BY w
         |), s0 AS (
         |  SELECT wc,
         |    ' ' || array_to_string(list_transform(generate_series(1, length(w)), i -> w[i]), '  ') || ' ' AS seq
         |  FROM w0
         |), ${bpeRoundCte(1)}, ${bpeRoundCte(2)}, ${bpeRoundCte(3)}, ${bpeRoundCte(4)}
         |SELECT CAST(1 AS BIGINT) AS round, a AS pair_a, b AS pair_b,
         |  a || b AS merged, CAST(c AS BIGINT) AS pair_count FROM b1
         |UNION ALL SELECT CAST(2 AS BIGINT), a, b, a || b, CAST(c AS BIGINT) FROM b2
         |UNION ALL SELECT CAST(3 AS BIGINT), a, b, a || b, CAST(c AS BIGINT) FROM b3
         |UNION ALL SELECT CAST(4 AS BIGINT), a, b, a || b, CAST(c AS BIGINT) FROM b4
         |ORDER BY round""".stripMargin,
    // Cohen's kappa of the q32 lang-id vs the gold label; DuckDB's
    // integer // TRUNCATES toward zero exactly like Spark's div, so a
    // negative kappa needs no floor emulation on either side
    "q149_lang_id_kappa" -> {
      val best = TQ.langMarkers.map { case (l, _) => s"s_$l" }.mkString("greatest(", ", ", ")")
      s"""WITH scored AS (
         |  SELECT doc_id, lang,
         |${TQ.langMarkers
          .map { case (l, ms) => s"    ${langScoreSql(ms)} AS s_$l" }
          .mkString(",\n")}
         |  FROM documents
         |), p AS (
         |  SELECT lang,
         |    CASE ${TQ.langMarkers
          .map { case (l, _) => s"WHEN s_$l = $best AND $best > 0 THEN '$l'" }
          .mkString(" ")} ELSE 'und' END AS pred_lang
         |  FROM scored
         |), t AS (
         |  SELECT COUNT(*) AS n, SUM(CASE WHEN lang = pred_lang THEN 1 ELSE 0 END) AS a FROM p
         |), r AS (
         |  SELECT lang AS lbl, COUNT(*) AS rc FROM p GROUP BY 1
         |), c AS (
         |  SELECT pred_lang AS lbl, COUNT(*) AS cc FROM p GROUP BY 1
         |), sm AS (
         |  SELECT COALESCE(SUM(rc * cc), 0) AS s FROM r JOIN c USING (lbl)
         |)
         |SELECT CAST(n AS BIGINT) AS n_docs, CAST(a AS BIGINT) AS n_agree,
         |  CAST(s AS BIGINT) AS marginal_product_sum,
         |  CAST((a * n - s) * 1000000 // (n * n - s) AS BIGINT) AS kappa_ppm
         |FROM t CROSS JOIN sm""".stripMargin
    },
    // directed "a then eventually b" support over sessions (first
    // occurrences from a per-session row_number; 200-item group cap)
    "q150_seq_patterns" ->
      s"""WITH $sessCte, pos AS (
         |  SELECT session_id, item_id,
         |         ROW_NUMBER() OVER (PARTITION BY session_id ORDER BY epoch_s, event_id) AS pos
         |  FROM enr
         |), fi AS (
         |  SELECT session_id, item_id, MIN(pos) AS first_pos FROM pos GROUP BY 1, 2
         |), small AS (
         |  SELECT session_id FROM fi GROUP BY session_id HAVING COUNT(*) <= 200
         |), fik AS (
         |  SELECT fi.* FROM fi JOIN small USING (session_id)
         |), pairs AS (
         |  SELECT a.item_id AS item_a, b.item_id AS item_b, COUNT(*) AS n_sessions
         |  FROM fik a JOIN fik b
         |    ON a.session_id = b.session_id AND a.first_pos < b.first_pos
         |  GROUP BY 1, 2 HAVING COUNT(*) >= 2
         |), rr AS (
         |  SELECT *, ROW_NUMBER() OVER (ORDER BY n_sessions DESC, item_a, item_b) AS rn
         |  FROM pairs
         |)
         |SELECT item_a, item_b, CAST(n_sessions AS BIGINT) AS n_sessions
         |FROM rr WHERE rn <= 50
         |ORDER BY n_sessions DESC, item_a, item_b""".stripMargin,
    // per-source Jensen-Shannon divergence vs the rest of the corpus
    // (full source x pruned-term grid; nano-quantized contributions)
    "q151_js_divergence" ->
      """WITH toks AS (
        |  SELECT source, unnest(regexp_split_to_array(trim(text), '\s+')) AS term
        |  FROM documents
        |), by_src AS (
        |  SELECT source, term, COUNT(*) AS c_s FROM toks GROUP BY 1, 2
        |), corpus AS (
        |  SELECT term, COUNT(*) AS c_all FROM toks GROUP BY 1 HAVING COUNT(*) >= 5
        |), src_totals AS (
        |  SELECT source, COUNT(*) AS n_s FROM toks GROUP BY 1
        |), all_total AS (
        |  SELECT COUNT(*) AS n_all FROM toks
        |), cells AS (
        |  SELECT st.source, c.term,
        |    CAST(COALESCE(b.c_s, 0) AS DOUBLE) AS cs,
        |    CAST(c.c_all - COALESCE(b.c_s, 0) AS DOUBLE) AS cr,
        |    CAST(st.n_s AS DOUBLE) AS ns,
        |    CAST(a.n_all - st.n_s AS DOUBLE) AS nr
        |  FROM corpus c CROSS JOIN src_totals st
        |  LEFT JOIN by_src b ON b.source = st.source AND b.term = c.term
        |  CROSS JOIN all_total a
        |), contrib AS (
        |  SELECT source, cs,
        |    CAST(round((
        |      CASE WHEN cs / ns > 0
        |        THEN (cs / ns) * ln((cs / ns) / ((cs / ns + cr / nr) / 2.0)) ELSE 0.0 END +
        |      CASE WHEN cr / nr > 0
        |        THEN (cr / nr) * ln((cr / nr) / ((cs / ns + cr / nr) / 2.0)) ELSE 0.0 END
        |      ) * 500000000) AS BIGINT) AS contrib_nano
        |  FROM cells
        |)
        |SELECT source, CAST(SUM(CASE WHEN cs > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_terms,
        |  CAST(SUM(contrib_nano) AS BIGINT) AS jsd_nano
        |FROM contrib GROUP BY source ORDER BY source""".stripMargin,
    // purchase<->view coincidence pairs within +-30 s (custom band
    // join on the engine side; DuckDB plans BETWEEN as an IEJoin),
    // binned into 10-s signed-gap buckets — all-integer
    "q152_band_join" ->
      """WITH e AS (
        |  SELECT event_type, CAST(floor(extract(epoch FROM ts)) AS BIGINT) AS epoch_s
        |  FROM events
        |), p AS (SELECT epoch_s AS p_s FROM e WHERE event_type = 'purchase'),
        |v AS (SELECT epoch_s AS v_s FROM e WHERE event_type = 'view')
        |SELECT CAST((v_s - p_s + 30) // 10 AS BIGINT) AS gap_bin,
        |  CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |  CAST(SUM(v_s - p_s) AS BIGINT) AS sum_gap_s
        |FROM p JOIN v ON v_s BETWEEN p_s - 30 AND p_s + 30
        |GROUP BY 1 ORDER BY gap_bin""".stripMargin,
    // nearest preceding click per purchase (DuckDB native ASOF LEFT
    // JOIN; engine side is the union+carry-forward window operator),
    // 10-min latency buckets, -1 = never clicked
    "q153_asof_join" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type,
        |         CAST(floor(extract(epoch FROM ts)) AS BIGINT) AS epoch_s
        |  FROM events
        |), p AS (SELECT user_id, epoch_s AS p_s FROM e WHERE event_type = 'purchase'),
        |c0 AS (
        |  SELECT user_id, epoch_s AS c_s,
        |         row_number() OVER (PARTITION BY user_id, epoch_s ORDER BY event_id DESC) AS rn
        |  FROM e WHERE event_type = 'click'
        |), c AS (SELECT user_id, c_s FROM c0 WHERE rn = 1)
        |SELECT CAST(COALESCE((p_s - c_s) // 600, -1) AS BIGINT) AS gap_bin,
        |  CAST(COUNT(*) AS BIGINT) AS n_purchases,
        |  CAST(COUNT(DISTINCT p.user_id) AS BIGINT) AS n_users
        |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.p_s >= c.c_s
        |GROUP BY 1 ORDER BY gap_bin""".stripMargin,
    // exact two-sample KS: D = max|C1*n2 - C2*n1| over the merged
    // sorted support; division only at the final ppm emit
    "q154_ks_drift" ->
      s"""WITH $pvSupportCte, cums AS (
        |  SELECT SUM(ca) OVER (ORDER BY value) AS cum_a,
        |         SUM(cb) OVER (ORDER BY value) AS cum_b
        |  FROM counts
        |), t AS (SELECT SUM(ca) AS n_a, SUM(cb) AS n_b FROM counts)
        |SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
        |  CAST(MAX(abs(cum_a * n_b - cum_b * n_a)) AS BIGINT) AS ks_num,
        |  CAST(MAX(abs(cum_a * n_b - cum_b * n_a)) * 1000000 // (n_a * n_b) AS BIGINT) AS ks_ppm
        |FROM cums CROSS JOIN t GROUP BY n_a, n_b""".stripMargin,
    // product-quantization ANN: 32 md5-rank seed vectors sliced into
    // 16 4-dim sub-codebooks, one exact-integer Lloyd step per
    // subspace, ADC candidate scan (gathered approximate dot / exact
    // corpus norm), exact-cosine rerank of the top 32 — mirrors
    // Similarity.pqTopK(m=16, ksub=32, rerank=32)
    "q155_knn_pq" ->
      s"""WITH $quantCte, ranked AS (
         |  SELECT vec_id, v, ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS srn
         |  FROM qv
         |), seedcb AS (
         |  SELECT CAST(srn - 1 AS BIGINT) AS cid, j, v[(j*4+1):(j*4+4)] AS cq
         |  FROM ranked, unnest(generate_series(0, 15)) AS tj(j) WHERE srn <= 32
         |), csub AS (
         |  SELECT vec_id, j, v[(j*4+1):(j*4+4)] AS sv
         |  FROM qv, unnest(generate_series(0, 15)) AS tj(j)
         |), a0 AS (
         |  SELECT vec_id, j, sv, cid FROM (
         |    SELECT c.vec_id, c.j, c.sv, s.cid,
         |      ROW_NUMBER() OVER (PARTITION BY c.vec_id, c.j ORDER BY
         |        2 * ${dotSql("c.sv", "s.cq", 4)} - ${norm2Sql("s.cq")} DESC, s.cid ASC) AS rn
         |    FROM csub c JOIN seedcb s ON c.j = s.j
         |  ) WHERE rn = 1
         |), centd AS (
         |  SELECT j, cid, i, CAST(floor(CAST(SUM(sv[i]) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cv
         |  FROM a0, unnest(generate_series(1, 4)) AS ti(i)
         |  GROUP BY j, cid, i
         |), cent AS (
         |  SELECT j, cid, list(cv ORDER BY i) AS cq FROM centd GROUP BY j, cid
         |), enc AS (
         |  SELECT vec_id, j, cid FROM (
         |    SELECT c.vec_id, c.j, s.cid,
         |      ROW_NUMBER() OVER (PARTITION BY c.vec_id, c.j ORDER BY
         |        2 * ${dotSql("c.sv", "s.cq", 4)} - ${norm2Sql("s.cq")} DESC, s.cid ASC) AS rn
         |    FROM csub c JOIN cent s ON c.j = s.j
         |  ) WHERE rn = 1
         |), qsub AS (
         |  SELECT vec_id AS query_id, j, sv FROM csub WHERE vec_id < 64
         |), lut AS (
         |  SELECT q.query_id, s.j, s.cid, ${dotSql("q.sv", "s.cq", 4)} AS part
         |  FROM qsub q JOIN cent s ON q.j = s.j
         |), scored AS (
         |  SELECT l.query_id, e.vec_id AS neighbor_id, CAST(SUM(l.part) AS BIGINT) AS adc_dot
         |  FROM enc e JOIN lut l ON l.j = e.j AND l.cid = e.cid
         |  WHERE e.vec_id <> l.query_id
         |  GROUP BY l.query_id, e.vec_id
         |), cand AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT s.query_id, s.neighbor_id,
         |      ROW_NUMBER() OVER (PARTITION BY s.query_id ORDER BY
         |        CAST(s.adc_dot AS DOUBLE) / sqrt(CAST(${norm2Sql("nn.v")} AS DOUBLE)) DESC,
         |        s.neighbor_id ASC) AS rn
         |    FROM scored s JOIN qv nn ON nn.vec_id = s.neighbor_id
         |  ) WHERE rn <= 32
         |), rr AS (
         |  SELECT cand.query_id, cand.neighbor_id,
         |    ${cosineSql("qq.v", "nn.v", 64)} AS cosine_sim
         |  FROM cand
         |  JOIN qv qq ON qq.vec_id = cand.query_id
         |  JOIN qv nn ON nn.vec_id = cand.neighbor_id
         |), fin AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY cosine_sim DESC, neighbor_id ASC) AS rn FROM rr
         |)
         |SELECT query_id, neighbor_id, cosine_sim FROM fin WHERE rn <= 5
         |ORDER BY query_id, cosine_sim DESC, neighbor_id""".stripMargin,
    // reciprocal-rank fusion of covis top-10 and transition top-10 per
    // anchor: score = sum of floor(1e6/(60+rank)) over the lists the
    // candidate appears in; top 5 fused
    "q156_rrf_fusion" ->
      s"""WITH $sessCte, $transCte, ttop AS (
         |  SELECT item_a, item_b, CAST(rn AS BIGINT) AS rank_t FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY item_a
         |                ORDER BY transition_count DESC, item_b ASC) AS rn
         |    FROM trans) WHERE rn <= 10
         |), $covisPairsCte, $covisDirectedCte, ctop AS (
         |  SELECT src, dst, CAST(rn AS BIGINT) AS rank_c FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY src
         |                ORDER BY pair_count DESC, dst ASC) AS rn
         |    FROM directed) WHERE rn <= 10
         |), fused AS (
         |  SELECT COALESCE(c.src, t.item_a) AS item_a,
         |         COALESCE(c.dst, t.item_b) AS item_b,
         |         COALESCE(1000000 // (60 + c.rank_c), 0) +
         |         COALESCE(1000000 // (60 + t.rank_t), 0) AS rrf_micro
         |  FROM ctop c FULL JOIN ttop t ON c.src = t.item_a AND c.dst = t.item_b
         |), r AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY item_a
         |            ORDER BY rrf_micro DESC, item_b ASC) AS rn
         |  FROM fused
         |)
         |SELECT item_a, item_b, CAST(rrf_micro AS BIGINT) AS rrf_micro, CAST(rn AS BIGINT) AS rn
         |FROM r WHERE rn <= 5 ORDER BY item_a, rn""".stripMargin,
    // 4 unrolled synchronized LPA rounds (most-frequent neighbor
    // label, tie -> min label), then community sizes
    "q157_communities" ->
      s"""WITH $sessCte, $covisPairsCte, und AS (
         |  SELECT item_a AS src, item_b AS dst FROM pairs
         |  UNION ALL
         |  SELECT item_b AS src, item_a AS dst FROM pairs
         |), l0 AS (
         |  SELECT DISTINCT src AS id, src AS label FROM und
         |), ${lpaRoundsSql(4)},
         |sizes AS (
         |  SELECT label, CAST(COUNT(*) AS BIGINT) AS community_size FROM l4 GROUP BY 1
         |)
         |SELECT l4.id AS item_id, l4.label AS community, sizes.community_size
         |FROM l4 JOIN sizes USING (label) ORDER BY item_id""".stripMargin,
    // CUPED: md5-parity variants, pre/post split at the mid epoch-day,
    // exact integer cent moments (HUGEINT-widened N/D), one double
    // division chain written identically to the engine side
    "q158_cuped_uplift" ->
      """WITH e AS (
        |  SELECT user_id,
        |    CAST(floor(extract(epoch FROM ts)) AS BIGINT) // 86400 AS day,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events
        |), mid AS (
        |  SELECT (MIN(day) + MAX(day) + 1) // 2 AS mid FROM e
        |), pu AS (
        |  SELECT user_id,
        |    SUM(CASE WHEN day < mid THEN cents ELSE 0 END) AS x,
        |    SUM(CASE WHEN day >= mid THEN cents ELSE 0 END) AS y,
        |    CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) % 2 AS variant
        |  FROM e CROSS JOIN mid GROUP BY 1
        |), mo AS (
        |  SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
        |    SUM(x * y) AS sxy, SUM(x * x) AS sxx,
        |    SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS n_a,
        |    SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS n_b,
        |    SUM(CASE WHEN variant = 0 THEN x ELSE 0 END) AS sx_a,
        |    SUM(CASE WHEN variant = 1 THEN x ELSE 0 END) AS sx_b,
        |    SUM(CASE WHEN variant = 0 THEN y ELSE 0 END) AS sy_a,
        |    SUM(CASE WHEN variant = 1 THEN y ELSE 0 END) AS sy_b
        |  FROM pu
        |), th AS (
        |  SELECT *,
        |    CAST(CAST(n AS HUGEINT) * CAST(sxy AS HUGEINT)
        |         - CAST(sx AS HUGEINT) * CAST(sy AS HUGEINT) AS DOUBLE) /
        |    CAST(CAST(n AS HUGEINT) * CAST(sxx AS HUGEINT)
        |         - CAST(sx AS HUGEINT) * CAST(sx AS HUGEINT) AS DOUBLE) AS theta
        |  FROM mo
        |)
        |SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b, theta,
        |  (CAST(sy_b AS DOUBLE) / CAST(n_b AS DOUBLE))
        |   - (CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE)) AS raw_uplift,
        |  (CAST(sy_b AS DOUBLE) / CAST(n_b AS DOUBLE)
        |    - theta * (CAST(sx_b AS DOUBLE) / CAST(n_b AS DOUBLE)))
        |   - (CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE)
        |    - theta * (CAST(sx_a AS DOUBLE) / CAST(n_a AS DOUBLE))) AS cuped_uplift
        |FROM th""".stripMargin,
    // Theil-Sen: median pairwise slope of the daily count series per
    // event type; exact-int dy/dx compared as correctly-rounded
    // doubles, q46 floor-rank median
    "q159_theil_sen" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    CAST(floor(extract(epoch FROM ts)) AS BIGINT) // 86400 AS day,
        |    CAST(COUNT(*) AS BIGINT) AS n_events
        |  FROM events GROUP BY 1, 2
        |), slopes AS (
        |  SELECT a.event_type, b.n_events - a.n_events AS dy, b.day - a.day AS dx,
        |    CAST(b.n_events - a.n_events AS DOUBLE) / CAST(b.day - a.day AS DOUBLE) AS slope
        |  FROM daily a JOIN daily b ON a.event_type = b.event_type AND a.day < b.day
        |), r AS (
        |  SELECT *,
        |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY slope ASC, dy ASC, dx ASC) AS rn,
        |    COUNT(*) OVER (PARTITION BY event_type) AS n_pairs
        |  FROM slopes
        |)
        |SELECT event_type, CAST(n_pairs AS BIGINT) AS n_pairs,
        |  dy AS med_dy, dx AS med_dx, slope
        |FROM r WHERE rn = CAST(floor(0.5 * (n_pairs - 1)) AS BIGINT) + 1
        |ORDER BY event_type""".stripMargin,
    // IVFPQ: the q41 coarse-cell chain (16 seeds, 1 Lloyd step,
    // 3-cell spill lists, 6 probes) prunes candidates; the q155 PQ
    // chain (32 seeds x 16 subspaces) ADC-scores them; exact-cosine
    // rerank of the top 32
    "q160_knn_ivfpq" ->
      s"""WITH $quantCte, ranked AS (
         |  SELECT vec_id, v, ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS srn
         |  FROM qv
         |), seeds AS (
         |  SELECT CAST(srn - 1 AS BIGINT) AS cid, v AS cq FROM ranked WHERE srn <= 16
         |), a0 AS (
         |  ${assignSql("qv", "seeds", "vid", 64)} WHERE rn = 1
         |), centd AS (
         |  SELECT cid, i, CAST(floor(CAST(SUM(v[i]) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cv
         |  FROM a0, unnest(generate_series(1, 64)) AS t(i)
         |  GROUP BY cid, i
         |), cent AS (
         |  SELECT cid, list(cv ORDER BY i) AS cq FROM centd GROUP BY cid
         |), assigned AS (
         |  ${assignSql("qv", "cent", "vid", 64)} WHERE rn <= 3
         |), queries AS (
         |  SELECT vec_id, v FROM qv WHERE vec_id < 64
         |), probes AS (
         |  ${assignSql("queries", "cent", "query_id", 64)} WHERE rn <= 6
         |), pqseed AS (
         |  SELECT CAST(srn - 1 AS BIGINT) AS cid, j, v[(j*4+1):(j*4+4)] AS cq
         |  FROM ranked, unnest(generate_series(0, 15)) AS tj(j) WHERE srn <= 32
         |), csub AS (
         |  SELECT vec_id, j, v[(j*4+1):(j*4+4)] AS sv
         |  FROM qv, unnest(generate_series(0, 15)) AS tj(j)
         |), pqa0 AS (
         |  SELECT vec_id, j, sv, cid FROM (
         |    SELECT c.vec_id, c.j, c.sv, s.cid,
         |      ROW_NUMBER() OVER (PARTITION BY c.vec_id, c.j ORDER BY
         |        2 * ${dotSql("c.sv", "s.cq", 4)} - ${norm2Sql("s.cq")} DESC, s.cid ASC) AS rn
         |    FROM csub c JOIN pqseed s ON c.j = s.j
         |  ) WHERE rn = 1
         |), pqcentd AS (
         |  SELECT j, cid, i, CAST(floor(CAST(SUM(sv[i]) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cv
         |  FROM pqa0, unnest(generate_series(1, 4)) AS ti(i)
         |  GROUP BY j, cid, i
         |), pqcent AS (
         |  SELECT j, cid, list(cv ORDER BY i) AS cq FROM pqcentd GROUP BY j, cid
         |), enc AS (
         |  SELECT vec_id, j, cid FROM (
         |    SELECT c.vec_id, c.j, s.cid,
         |      ROW_NUMBER() OVER (PARTITION BY c.vec_id, c.j ORDER BY
         |        2 * ${dotSql("c.sv", "s.cq", 4)} - ${norm2Sql("s.cq")} DESC, s.cid ASC) AS rn
         |    FROM csub c JOIN pqcent s ON c.j = s.j
         |  ) WHERE rn = 1
         |), qsub AS (
         |  SELECT vec_id AS query_id, j, sv FROM csub WHERE vec_id < 64
         |), lut AS (
         |  SELECT q.query_id, s.j, s.cid, ${dotSql("q.sv", "s.cq", 4)} AS part
         |  FROM qsub q JOIN pqcent s ON q.j = s.j
         |), cpair AS (
         |  SELECT DISTINCT p.query_id, a.vid AS neighbor_id
         |  FROM probes p JOIN assigned a ON p.cid = a.cid AND a.vid <> p.query_id
         |), scored AS (
         |  SELECT cp.query_id, cp.neighbor_id, CAST(SUM(l.part) AS BIGINT) AS adc_dot
         |  FROM cpair cp
         |  JOIN enc e ON e.vec_id = cp.neighbor_id
         |  JOIN lut l ON l.query_id = cp.query_id AND l.j = e.j AND l.cid = e.cid
         |  GROUP BY cp.query_id, cp.neighbor_id
         |), cand AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT s.query_id, s.neighbor_id,
         |      ROW_NUMBER() OVER (PARTITION BY s.query_id ORDER BY
         |        CAST(s.adc_dot AS DOUBLE) / sqrt(CAST(${norm2Sql("nn.v")} AS DOUBLE)) DESC,
         |        s.neighbor_id ASC) AS rn
         |    FROM scored s JOIN qv nn ON nn.vec_id = s.neighbor_id
         |  ) WHERE rn <= 32
         |), rr AS (
         |  SELECT cand.query_id, cand.neighbor_id,
         |    ${cosineSql("qq.v", "nn.v", 64)} AS cosine_sim
         |  FROM cand
         |  JOIN qv qq ON qq.vec_id = cand.query_id
         |  JOIN qv nn ON nn.vec_id = cand.neighbor_id
         |), fin AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY cosine_sim DESC, neighbor_id ASC) AS rn FROM rr
         |)
         |SELECT query_id, neighbor_id, cosine_sim FROM fin WHERE rn <= 5
         |ORDER BY query_id, cosine_sim DESC, neighbor_id""".stripMargin,
    // per-feature best Gini split: purity score = two double divisions
    // on exact integer prefix counts, ties -> min threshold
    "q161_gini_stumps" ->
      """WITH e AS (
        |  SELECT CAST(hour(ts) AS BIGINT) AS hour,
        |    CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
        |    CAST(round(value * 100) AS BIGINT) // 1000 AS vb,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |  FROM events
        |), lng AS (
        |  SELECT 'hour' AS feature, hour AS fval, y FROM e
        |  UNION ALL SELECT 'dow', dow, y FROM e
        |  UNION ALL SELECT 'value_bucket', vb, y FROM e
        |), grp AS (
        |  SELECT feature, fval, CAST(SUM(y) AS BIGINT) AS pos, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM lng GROUP BY 1, 2
        |), cum AS (
        |  SELECT *,
        |    CAST(SUM(pos) OVER (PARTITION BY feature ORDER BY fval
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cp,
        |    CAST(SUM(n) OVER (PARTITION BY feature ORDER BY fval
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cn,
        |    CAST(SUM(pos) OVER (PARTITION BY feature) AS BIGINT) AS tp,
        |    CAST(SUM(n) OVER (PARTITION BY feature) AS BIGINT) AS tn
        |  FROM grp
        |), sc AS (
        |  SELECT *,
        |    CAST(cp * cp + (cn - cp) * (cn - cp) AS DOUBLE) / CAST(cn AS DOUBLE)
        |     + CAST((tp - cp) * (tp - cp) + ((tn - cn) - (tp - cp)) * ((tn - cn) - (tp - cp)) AS DOUBLE)
        |       / CAST(tn - cn AS DOUBLE) AS score
        |  FROM cum WHERE cn < tn
        |), r AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY feature ORDER BY score DESC, fval ASC) AS rn
        |  FROM sc
        |)
        |SELECT feature, fval AS threshold, cn AS n_left, tn - cn AS n_right,
        |  cp AS pos_left, tp - cp AS pos_right, score
        |FROM r WHERE rn = 1 ORDER BY feature""".stripMargin,
    // sample ACF at lags 1..7, estimator multiplied through by n^2 so
    // num/den are exact integers; one double division per lag
    "q162_autocorrelation" ->
      """WITH daily AS (
        |  SELECT CAST(floor(extract(epoch FROM ts)) AS BIGINT) // 86400 AS day,
        |    CAST(COUNT(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1
        |), totals AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx FROM daily
        |), den AS (
        |  SELECT CAST(SUM((n * x - sx) * (n * x - sx)) AS BIGINT) AS den
        |  FROM daily CROSS JOIN totals
        |), lags AS (
        |  SELECT CAST(lag AS BIGINT) AS lag FROM unnest(generate_series(1, 7)) AS t(lag)
        |), pr AS (
        |  SELECT l.lag, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |    CAST(SUM((t.n * a.x - t.sx) * (t.n * b.x - t.sx)) AS BIGINT) AS num
        |  FROM daily a
        |  JOIN lags l ON TRUE
        |  JOIN daily b ON b.day = a.day + l.lag
        |  CROSS JOIN totals t
        |  GROUP BY 1
        |)
        |SELECT pr.lag, pr.n_pairs, pr.num, den.den,
        |  CAST(pr.num AS DOUBLE) / CAST(den.den AS DOUBLE) AS acf
        |FROM pr CROSS JOIN den ORDER BY lag""".stripMargin,
    // seasonal-naive (lag-7) MAE scaled by one-step-naive (lag-1) MAE
    "q163_mase_forecast" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    CAST(floor(extract(epoch FROM ts)) AS BIGINT) // 86400 AS day,
        |    CAST(COUNT(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2
        |), l7 AS (
        |  SELECT a.event_type, CAST(COUNT(*) AS BIGINT) AS n7,
        |    CAST(SUM(abs(b.x - a.x)) AS BIGINT) AS sae7
        |  FROM daily a JOIN daily b ON a.event_type = b.event_type AND b.day = a.day + 7
        |  GROUP BY 1
        |), l1 AS (
        |  SELECT a.event_type, CAST(COUNT(*) AS BIGINT) AS n1,
        |    CAST(SUM(abs(b.x - a.x)) AS BIGINT) AS sae1
        |  FROM daily a JOIN daily b ON a.event_type = b.event_type AND b.day = a.day + 1
        |  GROUP BY 1
        |)
        |SELECT l7.event_type, n7, n1, sae7, sae1,
        |  (CAST(sae7 AS DOUBLE) / CAST(n7 AS DOUBLE))
        |   / (CAST(sae1 AS DOUBLE) / CAST(n1 AS DOUBLE)) AS mase
        |FROM l7 JOIN l1 ON l7.event_type = l1.event_type
        |ORDER BY l7.event_type""".stripMargin,
    // 4x64 count-min sketch over item ids, probed for the top-10 items:
    // est = min over rows of the md5-bucketed cell; overcount >= 0 is
    // the sketch's own never-undercount guarantee, carried as output
    "q164_cms_sketch" ->
      """WITH it AS (
        |  SELECT TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
        |  FROM events
        |  WHERE TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL
        |), cms AS (
        |  SELECT CAST(r AS BIGINT) AS r,
        |    CAST(('0x' || substring(md5('r' || CAST(r AS VARCHAR) || '|' || CAST(item AS VARCHAR)), 1, 8)) AS BIGINT) % 64 AS bucket,
        |    CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM it, unnest(generate_series(0, 3)) AS t(r)
        |  GROUP BY 1, 2
        |), top AS (
        |  SELECT item, CAST(COUNT(*) AS BIGINT) AS true_cnt
        |  FROM it GROUP BY 1 ORDER BY true_cnt DESC, item ASC LIMIT 10
        |), probes AS (
        |  SELECT top.item, top.true_cnt, CAST(r AS BIGINT) AS r,
        |    CAST(('0x' || substring(md5('r' || CAST(r AS VARCHAR) || '|' || CAST(item AS VARCHAR)), 1, 8)) AS BIGINT) % 64 AS bucket
        |  FROM top, unnest(generate_series(0, 3)) AS t(r)
        |), est AS (
        |  SELECT p.item, p.true_cnt, MIN(COALESCE(c.cnt, 0)) AS est
        |  FROM probes p LEFT JOIN cms c ON c.r = p.r AND c.bucket = p.bucket
        |  GROUP BY 1, 2
        |)
        |SELECT item, true_cnt, CAST(est AS BIGINT) AS est,
        |  CAST(est - true_cnt AS BIGINT) AS overcount
        |FROM est ORDER BY item""".stripMargin,
    // tie-corrected Mann-Whitney U via doubled midranks (2c + t + 1),
    // all-integer; effect size in ppm
    "q165_mann_whitney" ->
      s"""WITH $pvSupportCte, cums AS (
        |  SELECT ca, cb,
        |    COALESCE(SUM(ca + cb) OVER (ORDER BY value
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS c_before
        |  FROM counts
        |), t AS (
        |  SELECT CAST(SUM(ca) AS BIGINT) AS n1, CAST(SUM(cb) AS BIGINT) AS n2,
        |    CAST(SUM(ca * (c_before * 2 + ca + cb + 1)) AS BIGINT) AS r1_x2
        |  FROM cums
        |)
        |SELECT n1, n2,
        |  CAST(r1_x2 - n1 * (n1 + 1) AS BIGINT) AS u1_x2,
        |  CAST(n1 * n2 * 2 - (r1_x2 - n1 * (n1 + 1)) AS BIGINT) AS u2_x2,
        |  CAST((r1_x2 - n1 * (n1 + 1)) * 1000000 // (2 * n1 * n2) AS BIGINT) AS cles_ppm
        |FROM t""".stripMargin,
    // 1/pos examination model (capped at 10): click at session position
    // p carries weight p; all-integer ppm
    "q166_ips_ctr" ->
      s"""WITH $sessCte, vc AS (
         |  SELECT session_id, item_id, event_type, epoch_s, event_id
         |  FROM enr WHERE event_type IN ('view', 'click')
         |), posd AS (
         |  SELECT item_id, event_type,
         |    least(ROW_NUMBER() OVER (PARTITION BY session_id ORDER BY epoch_s, event_id), 10) AS pos
         |  FROM vc
         |), agg AS (
         |  SELECT item_id,
         |    CAST(COUNT(*) AS BIGINT) AS n_impressions,
         |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_clicks,
         |    CAST(SUM(CASE WHEN event_type = 'click' THEN pos ELSE 0 END) AS BIGINT) AS ips_num
         |  FROM posd GROUP BY 1
         |)
         |SELECT item_id, n_impressions, n_clicks,
         |  CAST(n_clicks * 1000000 // n_impressions AS BIGINT) AS raw_ctr_ppm,
         |  ips_num,
         |  CAST(ips_num * 1000000 // n_impressions AS BIGINT) AS ips_ctr_ppm
         |FROM agg WHERE n_impressions >= 20 ORDER BY item_id""".stripMargin,
    // rank deciles over the distinct cent support (ties share a bin),
    // per-bin WOE = micro-rounded ln odds ratio (q43 ln discipline)
    "q167_woe_binning" ->
      """WITH c0 AS (
        |  SELECT CAST(round(value * 100) AS BIGINT) AS cents,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |  FROM events
        |), counts AS (
        |  SELECT cents, CAST(SUM(y) AS BIGINT) AS ca, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM c0 GROUP BY 1
        |), tot AS (
        |  SELECT CAST(SUM(ca) AS BIGINT) AS pos_tot, CAST(SUM(n) AS BIGINT) AS n_tot FROM counts
        |), cums AS (
        |  SELECT cents, ca, n,
        |    COALESCE(SUM(n) OVER (ORDER BY cents
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS c_before
        |  FROM counts
        |), binned AS (
        |  SELECT CAST(c_before * 10 // n_tot + 1 AS BIGINT) AS bin, ca, n
        |  FROM cums CROSS JOIN tot
        |), agg AS (
        |  SELECT bin, CAST(SUM(n) AS BIGINT) AS n_b, CAST(SUM(ca) AS BIGINT) AS pos_b,
        |    CAST(SUM(n) - SUM(ca) AS BIGINT) AS neg_b
        |  FROM binned GROUP BY 1
        |)
        |SELECT bin, n_b, pos_b, neg_b,
        |  CAST(round(ln(CAST(pos_b * (n_tot - pos_tot) AS DOUBLE)
        |                / CAST(neg_b * pos_tot AS DOUBLE)) * 1000000) AS BIGINT) AS woe_micro
        |FROM agg CROSS JOIN tot ORDER BY bin""".stripMargin,
    // run-length-collapsed session paths, top 20 by frequency
    "q168_top_paths" ->
      s"""WITH $sessCte, lagged2 AS (
         |  SELECT session_id, item_id, epoch_s, event_id,
         |    lag(item_id) OVER (PARTITION BY session_id ORDER BY epoch_s, event_id) AS prev
         |  FROM enr
         |), kept AS (
         |  SELECT * FROM lagged2 WHERE prev IS NULL OR prev <> item_id
         |), paths AS (
         |  SELECT session_id,
         |    string_agg(CAST(item_id AS VARCHAR), '->' ORDER BY epoch_s, event_id) AS path,
         |    CAST(COUNT(*) AS BIGINT) AS path_len
         |  FROM kept GROUP BY 1
         |), agg AS (
         |  SELECT path, path_len, CAST(COUNT(*) AS BIGINT) AS n_sessions
         |  FROM paths GROUP BY 1, 2
         |)
         |SELECT path, path_len, n_sessions FROM agg
         |ORDER BY n_sessions DESC, path ASC LIMIT 20""".stripMargin,
    // 2-sigma burst days with the z comparison cross-multiplied into
    // integers: (x*n - Sx)^2 > 4*(n*Sxx - Sx^2), positive side only
    "q169_burst_days" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    CAST(floor(extract(epoch FROM ts)) AS BIGINT) // 86400 AS day,
        |    CAST(COUNT(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2
        |), stats AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(x * x) AS BIGINT) AS sxx
        |  FROM daily GROUP BY 1
        |)
        |SELECT d.event_type, d.day, d.x AS n_events, s.n AS n_days,
        |  CAST(d.x * s.n - s.sx AS BIGINT) AS dev_n,
        |  CAST(s.n * s.sxx - s.sx * s.sx AS BIGINT) AS var_n2
        |FROM daily d JOIN stats s ON d.event_type = s.event_type
        |WHERE d.x * s.n - s.sx > 0
        |  AND (d.x * s.n - s.sx) * (d.x * s.n - s.sx) > 4 * (s.n * s.sxx - s.sx * s.sx)
        |ORDER BY d.event_type, d.day""".stripMargin,
    // Kruskal-Wallis across view/click/purchase: doubled tie-corrected
    // midranks (exact ints), H via the generated twin expression
    "q170_kruskal_wallis" ->
      s"""WITH e AS (
         |  SELECT event_type, value FROM events
         |  WHERE event_type IN ('view', 'click', 'purchase')
         |), counts AS (
         |  SELECT value,
         |    SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS c0,
         |    SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c1,
         |    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c2,
         |    COUNT(*) AS t
         |  FROM e GROUP BY 1
         |), m AS (
         |  SELECT c0, c1, c2, t,
         |    (SUM(t) OVER (ORDER BY value) - t) * 2 + t + 1 AS mid2
         |  FROM counts
         |), aggd AS (
         |  SELECT CAST(SUM(c0) AS BIGINT) AS n1, CAST(SUM(c1) AS BIGINT) AS n2,
         |    CAST(SUM(c2) AS BIGINT) AS n3,
         |    CAST(SUM(c0 * mid2) AS BIGINT) AS r1_x2,
         |    CAST(SUM(c1 * mid2) AS BIGINT) AS r2_x2,
         |    CAST(SUM(c2 * mid2) AS BIGINT) AS r3_x2,
         |    CAST(SUM(t * t * t - t) AS BIGINT) AS ties3
         |  FROM m
         |)
         |SELECT n1, n2, n3, r1_x2, r2_x2, r3_x2, ties3,
         |  ${graft.ops.Stats.kruskalWallisHSql(3)} AS h_micro
         |FROM aggd""".stripMargin,
    // two chained type-1 medians over cent supports (median, then
    // median absolute deviation); rank (n+1)//2, min value at-or-past it
    "q171_mad_cents" ->
      """WITH c0 AS (
        |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents FROM events
        |), counts AS (
        |  SELECT event_type, cents, CAST(COUNT(*) AS BIGINT) AS n FROM c0 GROUP BY 1, 2
        |), tot AS (
        |  SELECT event_type, CAST(SUM(n) AS BIGINT) AS n_total FROM counts GROUP BY 1
        |), cums AS (
        |  SELECT event_type, cents, n,
        |    SUM(n) OVER (PARTITION BY event_type ORDER BY cents) AS cum_n
        |  FROM counts
        |), med AS (
        |  SELECT c.event_type, t.n_total, CAST(MIN(c.cents) AS BIGINT) AS median_cents
        |  FROM cums c JOIN tot t USING (event_type)
        |  WHERE c.cum_n >= (t.n_total + 1) // 2 GROUP BY 1, 2
        |), devc AS (
        |  SELECT c.event_type, abs(c.cents - m.median_cents) AS dev,
        |    CAST(SUM(c.n) AS BIGINT) AS n
        |  FROM counts c JOIN med m USING (event_type) GROUP BY 1, 2
        |), dtot AS (
        |  SELECT event_type, CAST(SUM(n) AS BIGINT) AS n_total FROM devc GROUP BY 1
        |), dcums AS (
        |  SELECT event_type, dev, n,
        |    SUM(n) OVER (PARTITION BY event_type ORDER BY dev) AS cum_n
        |  FROM devc
        |), mad AS (
        |  SELECT c.event_type, t.n_total, CAST(MIN(c.dev) AS BIGINT) AS mad_cents
        |  FROM dcums c JOIN dtot t USING (event_type)
        |  WHERE c.cum_n >= (t.n_total + 1) // 2 GROUP BY 1, 2
        |)
        |SELECT d.event_type, d.n_total, m.median_cents, d.mad_cents
        |FROM mad d JOIN med m USING (event_type) ORDER BY d.event_type""".stripMargin,
    // 5-95% trimmed mean: kept mass of a tied cent block = overlap with
    // rank interval [lo+1, n-lo]; mean in integer micro-cents
    "q172_trimmed_mean" ->
      """WITH c0 AS (
        |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents FROM events
        |), counts AS (
        |  SELECT event_type, cents, CAST(COUNT(*) AS BIGINT) AS n FROM c0 GROUP BY 1, 2
        |), tot AS (
        |  SELECT event_type, CAST(SUM(n) AS BIGINT) AS n_total FROM counts GROUP BY 1
        |), cums AS (
        |  SELECT event_type, cents, n,
        |    SUM(n) OVER (PARTITION BY event_type ORDER BY cents) AS cum_n
        |  FROM counts
        |), kept AS (
        |  SELECT c.event_type, t.n_total, c.cents,
        |    greatest(0, least(c.cum_n, t.n_total - (t.n_total * 50000 // 1000000))
        |      - greatest(c.cum_n - c.n, t.n_total * 50000 // 1000000)) AS k
        |  FROM cums c JOIN tot t USING (event_type)
        |)
        |SELECT event_type, n_total, CAST(SUM(k) AS BIGINT) AS n_kept,
        |  CAST(SUM(k * cents) AS BIGINT) AS kept_sum,
        |  CAST(SUM(k * cents) * 1000000 // SUM(k) AS BIGINT) AS trimmed_mean_micro
        |FROM kept GROUP BY 1, 2 ORDER BY event_type""".stripMargin,
    // HITS, 2 exact-integer alternations: contributions h*w / a*w keyed
    // by the receiving vertex, each half-step renormalized to total
    // mass 1e6 by floor division — mirrors Graph.hitsMicro exactly
    "q173_hits" ->
      s"""WITH $sessCte, $transCte, ew AS (
         |  SELECT item_a AS src, item_b AS dst, transition_count AS w FROM trans
         |), nodes AS (
         |  SELECT src AS id FROM ew UNION SELECT dst FROM ew
         |), h0 AS (
         |  SELECT id, CAST(1000000 AS BIGINT) AS h FROM nodes
         |), a1r AS (
         |  SELECT ew.dst AS id, CAST(SUM(h.h * ew.w) AS BIGINT) AS a
         |  FROM ew JOIN h0 h ON ew.src = h.id GROUP BY 1
         |), a1 AS (
         |  SELECT n.id,
         |    CAST(COALESCE(r.a, 0) * 1000000 // (SELECT SUM(a) FROM a1r) AS BIGINT) AS a
         |  FROM nodes n LEFT JOIN a1r r USING (id)
         |), h1r AS (
         |  SELECT ew.src AS id, CAST(SUM(a.a * ew.w) AS BIGINT) AS h
         |  FROM ew JOIN a1 a ON ew.dst = a.id GROUP BY 1
         |), h1 AS (
         |  SELECT n.id,
         |    CAST(COALESCE(r.h, 0) * 1000000 // (SELECT SUM(h) FROM h1r) AS BIGINT) AS h
         |  FROM nodes n LEFT JOIN h1r r USING (id)
         |), a2r AS (
         |  SELECT ew.dst AS id, CAST(SUM(h.h * ew.w) AS BIGINT) AS a
         |  FROM ew JOIN h1 h ON ew.src = h.id GROUP BY 1
         |), a2 AS (
         |  SELECT n.id,
         |    CAST(COALESCE(r.a, 0) * 1000000 // (SELECT SUM(a) FROM a2r) AS BIGINT) AS a
         |  FROM nodes n LEFT JOIN a2r r USING (id)
         |), h2r AS (
         |  SELECT ew.src AS id, CAST(SUM(a.a * ew.w) AS BIGINT) AS h
         |  FROM ew JOIN a2 a ON ew.dst = a.id GROUP BY 1
         |), h2 AS (
         |  SELECT n.id,
         |    CAST(COALESCE(r.h, 0) * 1000000 // (SELECT SUM(h) FROM h2r) AS BIGINT) AS h
         |  FROM nodes n LEFT JOIN h2r r USING (id)
         |)
         |SELECT n.id AS item_id, h2.h AS hub_micro, a2.a AS auth_micro
         |FROM nodes n JOIN h2 USING (id) JOIN a2 USING (id)
         |ORDER BY a2.a DESC, h2.h DESC, n.id ASC LIMIT 20""".stripMargin,
    // hour x type contingency: per-cell chi2 contributions micro-
    // quantized BEFORE the sum (exact integer chi2), V = one sqrt chain
    "q174_cramers_v" ->
      """WITH obs AS (
        |  SELECT CAST(hour(ts) AS BIGINT) AS hr, event_type,
        |    CAST(COUNT(*) AS BIGINT) AS obs
        |  FROM events GROUP BY 1, 2
        |), r AS (SELECT hr, CAST(SUM(obs) AS BIGINT) AS rt FROM obs GROUP BY 1),
        |c AS (SELECT event_type, CAST(SUM(obs) AS BIGINT) AS ct FROM obs GROUP BY 1),
        |t AS (
        |  SELECT CAST(SUM(obs) AS BIGINT) AS n_events,
        |    CAST(COUNT(DISTINCT hr) AS BIGINT) AS n_rows,
        |    CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_cols
        |  FROM obs
        |), cells AS (
        |  SELECT n_events, n_rows, n_cols,
        |    CAST(round(CAST(n_events * obs - rt * ct AS DOUBLE)
        |     * CAST(n_events * obs - rt * ct AS DOUBLE)
        |     / (CAST(n_events AS DOUBLE) * CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE))
        |     * 1000000) AS BIGINT) AS cell_micro
        |  FROM obs JOIN r USING (hr) JOIN c USING (event_type) CROSS JOIN t
        |), agg AS (
        |  SELECT n_events, n_rows, n_cols, CAST(SUM(cell_micro) AS BIGINT) AS chi2_micro
        |  FROM cells GROUP BY 1, 2, 3
        |)
        |SELECT n_events, n_rows, n_cols, chi2_micro,
        |  CAST(round(sqrt(CAST(chi2_micro AS DOUBLE) / 1000000.0
        | / CAST(n_events AS DOUBLE)
        | / CAST(least(n_rows, n_cols) - 1 AS DOUBLE)) * 1000000) AS BIGINT) AS cramers_v_micro
        |FROM agg""".stripMargin,
    // Kendall tau-b between the daily view and purchase series: exact
    // integer pair counts over day pairs, one micro-rounded sqrt chain
    "q175_kendall_tau" ->
      """WITH daily AS (
        |  SELECT CAST(floor(extract(epoch FROM ts)) AS BIGINT) // 86400 AS day,
        |    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS x,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS y
        |  FROM events GROUP BY 1
        |), p AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n0,
        |    CAST(SUM(CASE WHEN (a.x - b.x) * (a.y - b.y) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
        |    CAST(SUM(CASE WHEN (a.x - b.x) * (a.y - b.y) < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_d,
        |    CAST(SUM(CASE WHEN a.x = b.x THEN 1 ELSE 0 END) AS BIGINT) AS ties_x,
        |    CAST(SUM(CASE WHEN a.y = b.y THEN 1 ELSE 0 END) AS BIGINT) AS ties_y
        |  FROM daily a JOIN daily b ON a.day < b.day
        |)
        |SELECT n0, n_c, n_d, ties_x, ties_y,
        |  CAST(round(CAST(n_c - n_d AS DOUBLE)
        | / sqrt(CAST(n0 - ties_x AS DOUBLE) * CAST(n0 - ties_y AS DOUBLE))
        | * 1000000) AS BIGINT) AS tau_b_micro
        |FROM p""".stripMargin,
    // common-neighbor link prediction: wedge join through the shared
    // neighbor, RA = sum of 1e6 // deg(z) (integer — no ln), anti-join
    // against existing edges, neighborhood Jaccard in ppm
    "q176_link_prediction" ->
      s"""WITH $sessCte, $covisEdgesCte, und AS (
         |  SELECT item_a AS z, item_b AS n FROM pairs
         |  UNION ALL SELECT item_b AS z, item_a AS n FROM pairs
         |), deg AS (
         |  SELECT z AS id, CAST(COUNT(*) AS BIGINT) AS deg FROM und GROUP BY 1
         |), undd AS (
         |  SELECT u.z, u.n, d.deg FROM und u JOIN deg d ON u.z = d.id
         |), wed AS (
         |  SELECT l.n AS u, r.n AS v, 1000000 // l.deg AS ra_c
         |  FROM undd l JOIN und r ON l.z = r.z AND l.n < r.n
         |), cand AS (
         |  SELECT u, v, CAST(COUNT(*) AS BIGINT) AS cn,
         |    CAST(SUM(ra_c) AS BIGINT) AS ra_micro
         |  FROM wed GROUP BY 1, 2
         |), nonadj AS (
         |  SELECT c.* FROM cand c
         |  LEFT JOIN pairs p ON c.u = p.item_a AND c.v = p.item_b
         |  WHERE p.item_a IS NULL
         |)
         |SELECT n.u AS item_a, n.v AS item_b, n.cn, n.ra_micro,
         |  CAST(n.cn * 1000000 // (du.deg + dv.deg - n.cn) AS BIGINT) AS jaccard_ppm
         |FROM nonadj n JOIN deg du ON n.u = du.id JOIN deg dv ON n.v = dv.id
         |ORDER BY n.ra_micro DESC, n.cn DESC, n.u ASC, n.v ASC LIMIT 20""".stripMargin,
    // degree assortativity: exact integer degree moments over the 2|E|
    // directed edge stubs, one micro-rounded Pearson chain
    "q177_assortativity" ->
      s"""WITH $sessCte, $covisEdgesCte, deg AS (
         |  SELECT id, CAST(COUNT(*) AS BIGINT) AS deg FROM (
         |    SELECT item_a AS id FROM pairs UNION ALL SELECT item_b FROM pairs
         |  ) GROUP BY 1
         |), stubs AS (
         |  SELECT item_a AS x_id, item_b AS y_id FROM pairs
         |  UNION ALL SELECT item_b AS x_id, item_a AS y_id FROM pairs
         |), m AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(dx.deg) AS BIGINT) AS sx,
         |    CAST(SUM(dy.deg) AS BIGINT) AS sy,
         |    CAST(SUM(dx.deg * dy.deg) AS BIGINT) AS sxy,
         |    CAST(SUM(dx.deg * dx.deg) AS BIGINT) AS sx2,
         |    CAST(SUM(dy.deg * dy.deg) AS BIGINT) AS sy2
         |  FROM stubs s JOIN deg dx ON s.x_id = dx.id JOIN deg dy ON s.y_id = dy.id
         |)
         |SELECT n, sx, sy, sxy, sx2, sy2,
         |  ${graft.ops.Graph.pearsonMicroSql} AS r_micro
         |FROM m""".stripMargin,
    // directed-transition reciprocity per source category: left join
    // against the DISTINCT reversed pair set, integer ppm
    "q178_reciprocity" ->
      s"""WITH $sessCte, $transCte, ew AS (
         |  SELECT item_a AS src, item_b AS dst FROM trans
         |), rev AS (
         |  SELECT DISTINCT dst AS src, src AS dst FROM ew
         |)
         |SELECT e.src % 20 AS src_category, CAST(COUNT(*) AS BIGINT) AS n_edges,
         |  CAST(SUM(CASE WHEN r.src IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_recip,
         |  CAST(SUM(CASE WHEN r.src IS NOT NULL THEN 1 ELSE 0 END) * 1000000
         |       // COUNT(*) AS BIGINT) AS recip_ppm
         |FROM ew e LEFT JOIN rev r ON e.src = r.src AND e.dst = r.dst
         |GROUP BY 1 ORDER BY src_category""".stripMargin,
    // the 16-47 short-repeat band q102/q128 both miss: same stride-1
    // machinery as q128, floor dropped to 16
    "q179_short_repeats" -> substringRepeatsSql(16),
    // q87's unrolled integer iterations with the teleport mass
    // concentrated on the anchor slice id % 97 = 3 (is_seed gates both
    // the init mass and the per-iteration base term); unreachable
    // items stay exactly 0
    "q180_personalized_pagerank" ->
      s"""WITH $sessCte, $transCte, ${pagerankUnrollSql(3, Some("id % 97 = 3"))}
         |SELECT id AS item_id, pr AS ppr_micro FROM p3 ORDER BY item_id""".stripMargin,
    // 4 unrolled deterministic walk hops: the md5(walk_id||'_'||step)
    // 60-bit hash mod out-weight picks the unique out-edge whose
    // cumulative-weight interval contains it (mirrors Graph.randomWalks)
    "q181_random_walks" ->
      s"""WITH $sessCte, $transCte, ew AS (
         |  SELECT item_a AS src, item_b AS dst, transition_count AS w,
         |    CAST(SUM(transition_count) OVER (PARTITION BY item_a ORDER BY item_b
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_w,
         |    CAST(SUM(transition_count) OVER (PARTITION BY item_a) AS BIGINT) AS out_w
         |  FROM trans
         |), s0 AS (
         |  SELECT DISTINCT item_id AS walk_id, item_id AS node, CAST(0 AS BIGINT) AS step
         |  FROM enr WHERE item_id % 11 = 3
         |), ${randomWalkStepsSql(4)}
         |SELECT walk_id, step, node FROM (
         |  SELECT * FROM s0 UNION ALL SELECT * FROM s1 UNION ALL SELECT * FROM s2
         |  UNION ALL SELECT * FROM s3 UNION ALL SELECT * FROM s4)
         |ORDER BY walk_id, step""".stripMargin,
    // Spearman rho on the q175 daily series: doubled tie-averaged
    // midranks (2*c_before + t + 1) keep every rank moment exact
    // integer; the shared Pearson template is the one double chain
    "q182_spearman_rho" ->
      s"""WITH daily AS (
         |  SELECT CAST(floor(extract(epoch FROM ts)) AS BIGINT) // 86400 AS day,
         |    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS x,
         |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS y
         |  FROM events GROUP BY 1
         |), joint AS (
         |  SELECT x, y, CAST(COUNT(*) AS BIGINT) AS cnt FROM daily GROUP BY 1, 2
         |), rx AS (
         |  SELECT x, 2 * (cum_t - t) + t + 1 AS mid2x FROM (
         |    SELECT x, t, CAST(SUM(t) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_t
         |    FROM (SELECT x, CAST(COUNT(*) AS BIGINT) AS t FROM daily GROUP BY 1))
         |), ry AS (
         |  SELECT y, 2 * (cum_t - t) + t + 1 AS mid2y FROM (
         |    SELECT y, t, CAST(SUM(t) OVER (ORDER BY y ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_t
         |    FROM (SELECT y, CAST(COUNT(*) AS BIGINT) AS t FROM daily GROUP BY 1))
         |), m AS (
         |  SELECT CAST(SUM(cnt) AS BIGINT) AS n,
         |    CAST(SUM(cnt * mid2x) AS BIGINT) AS sx,
         |    CAST(SUM(cnt * mid2y) AS BIGINT) AS sy,
         |    CAST(SUM(cnt * mid2x * mid2y) AS BIGINT) AS sxy,
         |    CAST(SUM(cnt * mid2x * mid2x) AS BIGINT) AS sx2,
         |    CAST(SUM(cnt * mid2y * mid2y) AS BIGINT) AS sy2
         |  FROM joint JOIN rx USING (x) JOIN ry USING (y)
         |)
         |SELECT n, sx, sy, sxy, sx2, sy2,
         |  ${graft.ops.Graph.pearsonMicroSql} AS rho_micro
         |FROM m""".stripMargin,
    // Welch t on the q154/q165 value support regrouped to integer
    // cents: exact integer moments, the shared welch templates are the
    // only double chains
    "q183_welch_ttest" ->
      s"""WITH $pvSupportCte, cc AS (
         |  SELECT CAST(round(value * 100) AS BIGINT) AS cents,
         |    CAST(SUM(ca) AS BIGINT) AS ca, CAST(SUM(cb) AS BIGINT) AS cb
         |  FROM counts GROUP BY 1
         |), m AS (
         |  SELECT CAST(SUM(ca) AS BIGINT) AS na,
         |    CAST(SUM(ca * cents) AS BIGINT) AS sa,
         |    CAST(SUM(ca * cents * cents) AS BIGINT) AS ssa,
         |    CAST(SUM(cb) AS BIGINT) AS nb,
         |    CAST(SUM(cb * cents) AS BIGINT) AS sb,
         |    CAST(SUM(cb * cents * cents) AS BIGINT) AS ssb
         |  FROM cc
         |)
         |SELECT na, sa, ssa, nb, sb, ssb,
         |  ${graft.ops.Stats.welchTSql} AS t_micro,
         |  ${graft.ops.Stats.welchDofSql} AS dof_micro
         |FROM m""".stripMargin,
    // 3 unrolled BFS hops from the q181 anchor slice; exact integer
    // 1e6 // dist over min hop distances
    "q184_harmonic_centrality" ->
      s"""WITH $sessCte, $transCte, ew AS (
         |  SELECT DISTINCT item_a AS src, item_b AS dst FROM trans
         |), f0 AS (
         |  SELECT DISTINCT item_id AS seed, item_id AS node FROM enr WHERE item_id % 11 = 3
         |), f1 AS (
         |  SELECT DISTINCT f.seed, e.dst AS node FROM f0 f JOIN ew e ON f.node = e.src
         |), f2 AS (
         |  SELECT DISTINCT f.seed, e.dst AS node FROM f1 f JOIN ew e ON f.node = e.src
         |), f3 AS (
         |  SELECT DISTINCT f.seed, e.dst AS node FROM f2 f JOIN ew e ON f.node = e.src
         |), reach AS (
         |  SELECT seed, node, MIN(step) AS dist FROM (
         |    SELECT seed, node, 0 AS step FROM f0
         |    UNION ALL SELECT seed, node, 1 FROM f1
         |    UNION ALL SELECT seed, node, 2 FROM f2
         |    UNION ALL SELECT seed, node, 3 FROM f3)
         |  GROUP BY 1, 2
         |)
         |SELECT seed AS item_id, CAST(COUNT(*) AS BIGINT) AS n_reached,
         |  CAST(SUM(1000000 // dist) AS BIGINT) AS harmonic_micro
         |FROM reach WHERE dist > 0 GROUP BY 1 ORDER BY item_id""".stripMargin,
    // McNemar on paired per-anchor hit flags of the covis vs history
    // strategies (the q117 candidate sets) — pure integer statistic
    "q185_mcnemar" ->
      s"""WITH $sessCte, $candidatesCte, ha AS (
         |  SELECT DISTINCT a.anchor_id FROM anchors a JOIN covis_cand c
         |    ON a.anchor_id = c.anchor_id AND a.category_id = c.category_id
         |), hb AS (
         |  SELECT DISTINCT a.anchor_id FROM anchors a JOIN hist_cand c
         |    ON a.anchor_id = c.anchor_id AND a.category_id = c.category_id
         |), f AS (
         |  SELECT a.anchor_id,
         |    CASE WHEN ha.anchor_id IS NOT NULL THEN 1 ELSE 0 END AS hit_a,
         |    CASE WHEN hb.anchor_id IS NOT NULL THEN 1 ELSE 0 END AS hit_b
         |  FROM anchors a LEFT JOIN ha ON a.anchor_id = ha.anchor_id
         |                 LEFT JOIN hb ON a.anchor_id = hb.anchor_id
         |), agg AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(hit_a * hit_b) AS BIGINT) AS n11,
         |    CAST(SUM(hit_a * (1 - hit_b)) AS BIGINT) AS n10,
         |    CAST(SUM((1 - hit_a) * hit_b) AS BIGINT) AS n01,
         |    CAST(SUM((1 - hit_a) * (1 - hit_b)) AS BIGINT) AS n00
         |  FROM f
         |)
         |SELECT n, n11, n10, n01, n00,
         |  CASE WHEN n10 + n01 = 0 THEN NULL
         |       ELSE CAST((n10 - n01) * (n10 - n01) * 1000000 // (n10 + n01) AS BIGINT)
         |  END AS chi2_micro
         |FROM agg""".stripMargin,
    // RAKE: stopword-bounded phrase islands (doc-partitioned windows),
    // integer deg*1e6 // freq word scores, exact phrase-score sums
    "q186_rake_keyphrases" ->
      """WITH toks AS (
        |  SELECT doc_id, i AS pos, toks[i] AS tok
        |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
        |       unnest(generate_series(1, len(toks))) AS t(i)
        |), flags AS (
        |  SELECT doc_id, pos, tok,
        |    CASE WHEN regexp_matches(tok, '^[a-z]+$')
        |          AND tok NOT IN ('the', 'a', 'and', 'of') THEN 1 ELSE 0 END AS is_word
        |  FROM toks
        |), grps AS (
        |  SELECT doc_id, pos, tok, is_word,
        |    CAST(SUM(1 - is_word) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS grp
        |  FROM flags
        |), words AS (
        |  SELECT doc_id, grp, pos, tok,
        |    COUNT(*) OVER (PARTITION BY doc_id, grp) AS phrase_len
        |  FROM grps WHERE is_word = 1
        |), capped AS (
        |  SELECT * FROM words WHERE phrase_len <= 4
        |), scores AS (
        |  SELECT tok, CAST(SUM(phrase_len) * 1000000 // COUNT(*) AS BIGINT) AS score_micro
        |  FROM capped GROUP BY 1
        |), ph AS (
        |  SELECT c.doc_id, c.grp,
        |    string_agg(c.tok, ' ' ORDER BY c.pos) AS phrase,
        |    CAST(MAX(c.phrase_len) AS BIGINT) AS n_words,
        |    CAST(SUM(s.score_micro) AS BIGINT) AS psc
        |  FROM capped c JOIN scores s USING (tok) GROUP BY 1, 2
        |)
        |SELECT phrase, MAX(n_words) AS n_words, CAST(COUNT(*) AS BIGINT) AS n_occ,
        |  MAX(psc) AS score_micro
        |FROM ph GROUP BY 1 ORDER BY score_micro DESC, phrase ASC LIMIT 25""".stripMargin,
    // content-defined chunking: cut where the 16-char window fp ending
    // there is 0 mod 64 (the q128 60-bit md5 fingerprint), chunks
    // re-hashed, corpus occ attached per chunk fp
    "q187_cdc_chunks" ->
      """WITH base AS (
        |  SELECT doc_id, text, CAST(length(text) AS BIGINT) AS len FROM documents
        |), cuts AS (
        |  SELECT doc_id, i + 16 AS b
        |  FROM base, unnest(generate_series(0, len - 17)) AS t(i)
        |  WHERE len > 16
        |    AND CAST(('0x' || substring(md5(substr(text, CAST(i + 1 AS INT), 16)), 1, 15)) AS BIGINT) % 64 = 0
        |), bounds AS (
        |  SELECT doc_id, b FROM cuts UNION ALL SELECT doc_id, len AS b FROM base
        |), chunks AS (
        |  SELECT doc_id,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY b) - 1 AS BIGINT) AS chunk_idx,
        |    CAST(COALESCE(lag(b) OVER (PARTITION BY doc_id ORDER BY b), 0) AS BIGINT) AS start_pos,
        |    CAST(b AS BIGINT) AS end_pos
        |  FROM bounds
        |), wf AS (
        |  SELECT c.doc_id, c.chunk_idx, c.start_pos, c.end_pos,
        |    c.end_pos - c.start_pos AS chunk_len,
        |    CAST(('0x' || substring(md5(substr(t.text, CAST(c.start_pos + 1 AS INT),
        |      CAST(c.end_pos - c.start_pos AS INT))), 1, 15)) AS BIGINT) AS chunk_fp
        |  FROM chunks c JOIN base t USING (doc_id)
        |)
        |SELECT doc_id, chunk_idx, start_pos, end_pos, chunk_len, chunk_fp,
        |  CAST(COUNT(*) OVER (PARTITION BY chunk_fp) AS BIGINT) AS occ
        |FROM wf ORDER BY doc_id, chunk_idx""".stripMargin,
    // additive seasonal decomposition: 7-day centered MA trend via a
    // days-sized self-join, dow means of the detrended series
    // (offset-shifted before the floor division so Spark div and
    // DuckDB // agree on negatives)
    "q188_seasonal_decomp" ->
      """WITH daily AS (
        |  SELECT CAST(floor(extract(epoch FROM ts)) AS BIGINT) // 86400 AS day,
        |    CAST(COUNT(*) AS BIGINT) AS n_events
        |  FROM events GROUP BY 1
        |), tr AS (
        |  SELECT a.day, a.n_events, COUNT(*) AS n7, CAST(SUM(b.n_events) AS BIGINT) AS sum7
        |  FROM daily a JOIN daily b ON b.day BETWEEN a.day - 3 AND a.day + 3
        |  GROUP BY 1, 2
        |), t2 AS (
        |  SELECT day, n_events, sum7 * 1000000 // 7 AS trend_micro,
        |    n_events * 1000000 - sum7 * 1000000 // 7 AS detr_micro, day % 7 AS dow
        |  FROM tr WHERE n7 = 7
        |), seas AS (
        |  SELECT dow,
        |    (CAST(SUM(detr_micro) AS BIGINT) + CAST(COUNT(*) AS BIGINT) * 1000000000000)
        |      // CAST(COUNT(*) AS BIGINT) - 1000000000000 AS seasonal_micro
        |  FROM t2 GROUP BY 1
        |)
        |SELECT t2.day, t2.n_events, CAST(t2.trend_micro AS BIGINT) AS trend_micro,
        |  CAST(seas.seasonal_micro AS BIGINT) AS seasonal_micro,
        |  CAST(t2.detr_micro - seas.seasonal_micro AS BIGINT) AS resid_micro
        |FROM t2 JOIN seas USING (dow) ORDER BY t2.day""".stripMargin,
    // exposure Gini over the covis top-10 lists: rank-block integer
    // identity on the count-compressed exposure support
    "q189_exposure_gini" ->
      s"""WITH $sessCte, $covisPairsCte, $covisDirectedCte, ${covisTopSql("top10", 10, withRn = false)}, sup AS (
         |  SELECT e, CAST(COUNT(*) AS BIGINT) AS t FROM (
         |    SELECT dst, CAST(COUNT(*) AS BIGINT) AS e FROM top10 GROUP BY 1)
         |  GROUP BY 1
         |), cums AS (
         |  SELECT e, t, CAST(SUM(t) OVER (ORDER BY e ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_t
         |  FROM sup
         |), m AS (
         |  SELECT CAST(SUM(t) AS BIGINT) AS n, CAST(SUM(e * t) AS BIGINT) AS total,
         |    CAST(SUM(e * ((cum_t - t) * t + (t * (t + 1)) // 2)) AS BIGINT) AS s_rank
         |  FROM cums
         |)
         |SELECT n AS n_items, total AS total_exposure,
         |  CASE WHEN n = 0 OR total = 0 THEN NULL
         |       ELSE (2 * s_rank - (n + 1) * total) * 1000000 // (n * total) END AS gini_micro
         |FROM m""".stripMargin,
    // Benford first-digit audit: expected ppm are shared integer
    // literals, each chi2 cell is the one shared double chain
    "q190_benford" ->
      s"""WITH exp_t(digit, exp_ppm) AS (VALUES
         |  ${graft.ops.Stats.benfordPpm.map { case (d, p) => s"($d, $p)" }.mkString(", ")}
         |), obs_t AS (
         |  SELECT CAST(substring(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit,
         |    CAST(COUNT(*) AS BIGINT) AS obs
         |  FROM (SELECT CAST(round(value * 100) AS BIGINT) AS cents FROM events)
         |  WHERE cents > 0 GROUP BY 1
         |), tot AS (
         |  SELECT CAST(SUM(obs) AS BIGINT) AS n_values FROM obs_t
         |), cells AS (
         |  SELECT e.digit, COALESCE(o.obs, 0) AS obs, CAST(e.exp_ppm AS BIGINT) AS exp_ppm, t.n_values
         |  FROM exp_t e LEFT JOIN obs_t o ON e.digit = o.digit CROSS JOIN tot t
         |)
         |SELECT CAST(digit AS BIGINT) AS digit, CAST(obs AS BIGINT) AS obs, exp_ppm,
         |  ${graft.ops.Stats.benfordCellSql} AS cell_micro
         |FROM cells ORDER BY digit""".stripMargin,
    // MAP@10: per-source AP against the full next-item set, floor
    // divisions end-to-end
    "q191_map_eval" ->
      s"""WITH $sessCte, $transCte, $covisPairsCte, $covisDirectedCte, ${covisTopSql("cand", 10, withRn = true)}, rel AS (
         |  SELECT c.src, c.dst, c.rn, CASE WHEN t.item_a IS NOT NULL THEN 1 ELSE 0 END AS rel
         |  FROM cand c LEFT JOIN (SELECT DISTINCT item_a, item_b FROM trans) t
         |    ON c.src = t.item_a AND c.dst = t.item_b
         |), hits AS (
         |  SELECT src, rn, rel,
         |    CAST(SUM(rel) OVER (PARTITION BY src ORDER BY rn ROWS UNBOUNDED PRECEDING) AS BIGINT) AS hits
         |  FROM rel
         |), ap AS (
         |  SELECT src, CAST(SUM(hits * 1000000 // rn) AS BIGINT) AS sum_p_micro
         |  FROM hits WHERE rel = 1 GROUP BY 1
         |), nrel AS (
         |  SELECT item_a AS src, CAST(COUNT(DISTINCT item_b) AS BIGINT) AS n_rel
         |  FROM trans GROUP BY 1
         |), perq AS (
         |  SELECT CASE WHEN a.src IS NOT NULL THEN 1 ELSE 0 END AS scored,
         |    COALESCE(a.sum_p_micro // least(10, r.n_rel), 0) AS ap_micro
         |  FROM nrel r LEFT JOIN ap a ON r.src = a.src
         |)
         |SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
         |  CAST(SUM(scored) AS BIGINT) AS n_scored,
         |  CAST(SUM(ap_micro) // COUNT(*) AS BIGINT) AS map_micro
         |FROM perq""".stripMargin,
    // variance-to-mean ratio of the daily series per event type:
    // exact integer moments, one shared micro-rounded chain
    "q192_dispersion" ->
      s"""WITH dc AS (
         |  SELECT event_type, CAST(floor(extract(epoch FROM ts)) AS BIGINT) // 86400 AS day,
         |    CAST(COUNT(*) AS BIGINT) AS c
         |  FROM events GROUP BY 1, 2
         |), m AS (
         |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS s,
         |    CAST(SUM(c * c) AS BIGINT) AS ss
         |  FROM dc GROUP BY 1
         |)
         |SELECT event_type, n, s, ss,
         |  ${graft.ops.Stats.vmrMicroSql} AS vmr_micro
         |FROM m ORDER BY event_type""".stripMargin,
    // 4-truss, 3 unrolled peel rounds over the q137 covis edges: each
    // round recounts per-edge triangle support and drops support < 2
    "q193_ktruss" ->
      s"""WITH $sessCte, $covisEdgesCte, e0 AS (
         |  SELECT item_a AS a, item_b AS b FROM pairs
         |), ${trussRoundsSql(4, 3)}
         |SELECT a AS item_a, b AS item_b, support
         |FROM sup3 ORDER BY item_a, item_b""".stripMargin,
    // Fleiss kappa across the three lang-id raters: exact integer
    // agreement aggregates, one shared kappa chain
    "q194_fleiss_kappa" ->
      s"""WITH p1 AS (${langPredSql(TQ.raterMarkers(0))}
         |), p2 AS (${langPredSql(TQ.raterMarkers(1))}
         |), p3 AS (${langPredSql(TQ.raterMarkers(2))}
         |), nij AS (
         |  SELECT doc_id, cat, CAST(COUNT(*) AS BIGINT) AS nij FROM (
         |    SELECT * FROM p1 UNION ALL SELECT * FROM p2 UNION ALL SELECT * FROM p3)
         |  GROUP BY 1, 2
         |), dm AS (
         |  SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
         |    CAST(SUM(nij * nij) AS BIGINT) AS s2
         |  FROM nij
         |), cm AS (
         |  SELECT CAST(SUM(cj * cj) AS BIGINT) AS sc2 FROM (
         |    SELECT cat, CAST(SUM(nij) AS BIGINT) AS cj FROM nij GROUP BY 1)
         |)
         |SELECT n_docs, s2, sc2,
         |  ${graft.ops.Stats.fleissKappaSql(3)} AS kappa_micro
         |FROM dm CROSS JOIN cm""".stripMargin,
    // difference-in-differences on purchase cents, treated = odd
    // items, pre/post split at the midpoint day; 8 exact cell moments
    "q195_did_uplift" ->
      s"""WITH ev AS (
         |  SELECT CAST(floor(extract(epoch FROM ts)) AS BIGINT) // 86400 AS day,
         |    CAST(round(value * 100) AS BIGINT) AS cents,
         |    TRY_CAST(json_extract_string(props, '$$.k') AS BIGINT) % 2 AS grp
         |  FROM events WHERE event_type = 'purchase'
         |), evf AS (
         |  SELECT * FROM ev WHERE grp IS NOT NULL
         |), sp AS (
         |  SELECT (MIN(day) + MAX(day) + 1) // 2 AS split_day FROM evf
         |), m AS (
         |  SELECT
         |    CAST(SUM(CASE WHEN grp = 1 AND day < split_day THEN 1 ELSE 0 END) AS BIGINT) AS n_t1,
         |    CAST(SUM(CASE WHEN grp = 1 AND day < split_day THEN cents ELSE 0 END) AS BIGINT) AS s_t1,
         |    CAST(SUM(CASE WHEN grp = 1 AND day >= split_day THEN 1 ELSE 0 END) AS BIGINT) AS n_t2,
         |    CAST(SUM(CASE WHEN grp = 1 AND day >= split_day THEN cents ELSE 0 END) AS BIGINT) AS s_t2,
         |    CAST(SUM(CASE WHEN grp = 0 AND day < split_day THEN 1 ELSE 0 END) AS BIGINT) AS n_c1,
         |    CAST(SUM(CASE WHEN grp = 0 AND day < split_day THEN cents ELSE 0 END) AS BIGINT) AS s_c1,
         |    CAST(SUM(CASE WHEN grp = 0 AND day >= split_day THEN 1 ELSE 0 END) AS BIGINT) AS n_c2,
         |    CAST(SUM(CASE WHEN grp = 0 AND day >= split_day THEN cents ELSE 0 END) AS BIGINT) AS s_c2
         |  FROM evf CROSS JOIN sp
         |)
         |SELECT n_t1, s_t1, n_t2, s_t2, n_c1, s_c1, n_c2, s_c2,
         |  ${graft.ops.Stats.didMicroSql} AS did_micro
         |FROM m""".stripMargin,
    // Wald SPRT on the daily purchase rate: precomputed micro LLR
    // literals, exact integer running sum, CASE decision per day
    "q196_sprt" ->
      s"""WITH daily AS (
         |  SELECT CAST(floor(extract(epoch FROM ts)) AS BIGINT) // 86400 AS day,
         |    CAST(COUNT(*) AS BIGINT) AS n_events,
         |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_success
         |  FROM events GROUP BY 1
         |), l AS (
         |  SELECT *, n_success * ${graft.ops.Stats.SprtLlrSuccessMicro}
         |    + (n_events - n_success) * (${graft.ops.Stats.SprtLlrFailMicro}) AS llr_micro
         |  FROM daily
         |), c AS (
         |  SELECT *, CAST(SUM(llr_micro) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT)
         |    AS cum_llr_micro
         |  FROM l
         |)
         |SELECT day, n_events, n_success, CAST(llr_micro AS BIGINT) AS llr_micro, cum_llr_micro,
         |  CASE WHEN cum_llr_micro >= ${graft.ops.Stats.SprtBoundMicro} THEN 'accept_h1'
         |       WHEN cum_llr_micro <= ${-graft.ops.Stats.SprtBoundMicro} THEN 'accept_h0'
         |       ELSE 'continue' END AS decision
         |FROM c ORDER BY day""".stripMargin,
    // two-sample Anderson-Darling (Scholz-Stephens midrank form) on
    // the q154/q165 value support: doubled midrank cumulatives keep
    // every block exact integer, each cell is the one shared chain
    "q197_anderson_darling" ->
      s"""WITH $pvSupportCte, base AS (
         |  SELECT value, CAST(ca AS BIGINT) AS ca, CAST(cb AS BIGINT) AS cb,
         |    CAST(ca + cb AS BIGINT) AS tb
         |  FROM counts
         |), cums AS (
         |  SELECT *,
         |    CAST(SUM(ca) OVER w AS BIGINT) AS cum_ca,
         |    CAST(SUM(cb) OVER w AS BIGINT) AS cum_cb,
         |    CAST(SUM(tb) OVER w AS BIGINT) AS cum_tb
         |  FROM base WINDOW w AS (ORDER BY value ROWS UNBOUNDED PRECEDING)
         |), tot AS (
         |  SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb FROM base
         |), blocks AS (
         |  SELECT *, na + nb AS n_total,
         |    cum_tb * 2 - tb AS b2, cum_ca * 2 - ca AS m2a, cum_cb * 2 - cb AS m2b
         |  FROM cums CROSS JOIN tot
         |), cells AS (
         |  SELECT *,
         |    ${graft.ops.Stats.adCellSql("a")} AS cell_a,
         |    ${graft.ops.Stats.adCellSql("b")} AS cell_b
         |  FROM (SELECT *, b2 * (n_total * 2 - b2) - n_total * tb AS denom FROM blocks)
         |  WHERE denom > 0
         |)
         |SELECT na, nb, CAST(COUNT(*) AS BIGINT) AS n_blocks,
         |  CAST(SUM(cell_a + cell_b) AS BIGINT) AS a2_micro
         |FROM cells GROUP BY na, nb""".stripMargin,
    // discrete-time churn hazard over between-session gaps: at-risk
    // counts from the reversed cumulative of the gap-day support
    "q198_churn_hazard" ->
      s"""WITH $sessCte, starts AS (
         |  SELECT user_id, session_id, MIN(epoch_s) AS start_s
         |  FROM sess GROUP BY 1, 2
         |), gaps AS (
         |  SELECT (next_s - start_s) // 86400 AS gap_days FROM (
         |    SELECT start_s, lead(start_s) OVER (PARTITION BY user_id
         |      ORDER BY start_s, session_id) AS next_s
         |    FROM starts)
         |  WHERE next_s IS NOT NULL
         |), sup AS (
         |  SELECT gap_days, CAST(COUNT(*) AS BIGINT) AS c FROM gaps GROUP BY 1
         |), cums AS (
         |  SELECT *, CAST(SUM(c) OVER (ORDER BY gap_days ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_c
         |  FROM sup
         |), tot AS (
         |  SELECT CAST(SUM(c) AS BIGINT) AS n_total FROM sup
         |)
         |SELECT gap_days, c AS n_ended, n_total - (cum_c - c) AS n_at_risk,
         |  CAST(c * 1000000 // (n_total - (cum_c - c)) AS BIGINT) AS hazard_ppm
         |FROM cums CROSS JOIN tot
         |WHERE gap_days <= 30 ORDER BY gap_days""".stripMargin,
    // deterministic JL +-1 projection: md5-parity sign matrix, exact
    // integer dot products, q58-style serialized contract boundary
    "q199_random_projection" ->
      """WITH q AS (
        |  SELECT vec_id, i - 1 AS i,
        |    CAST(round(CAST(embedding[i] AS DOUBLE) * 10000) AS BIGINT) AS qv
        |  FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)
        |), dd AS (
        |  SELECT MAX(len(embedding)) AS d FROM embeddings
        |), signs AS (
        |  SELECT i, j, 1 - 2 * (CAST(('0x' || substring(md5(CAST(j AS VARCHAR) || '_' || CAST(i AS VARCHAR)), 1, 1)) AS BIGINT) % 2) AS sgn
        |  FROM (SELECT unnest(generate_series(0, d - 1)) AS i FROM dd),
        |       (SELECT unnest(generate_series(0, 15)) AS j)
        |), p AS (
        |  SELECT q.vec_id, s.j, CAST(SUM(s.sgn * q.qv) AS BIGINT) AS p
        |  FROM q JOIN signs s ON q.i = s.i GROUP BY 1, 2
        |)
        |SELECT vec_id, array_to_string(list(p ORDER BY j), ',') AS proj,
        |  CAST(SUM(p * p) AS BIGINT) AS norm2
        |FROM p GROUP BY vec_id ORDER BY vec_id""".stripMargin,
    // OLS daily-revenue trend: exact integer moments over day-indexed
    // daily purchase cents, shared slope/intercept/r2 double chains
    "q200_ols_trend" ->
      s"""WITH daily AS (
         |  SELECT CAST(floor(extract(epoch FROM ts)) AS BIGINT) // 86400 AS day,
         |    CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
         |  FROM events WHERE event_type = 'purchase' GROUP BY 1
         |), xs AS (
         |  SELECT day - (SELECT MIN(day) FROM daily) AS x, y FROM daily
         |), m AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx,
         |    CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(x * y) AS BIGINT) AS sxy,
         |    CAST(SUM(x * x) AS BIGINT) AS sx2, CAST(SUM(y * y) AS BIGINT) AS sy2
         |  FROM xs
         |)
         |SELECT n, sx, sy, sxy, sx2, sy2,
         |  ${graft.ops.Stats.olsSlopeSql} AS slope_micro,
         |  ${graft.ops.Stats.olsInterceptSql} AS intercept_micro,
         |  ${graft.ops.Stats.olsR2Sql} AS r2_micro
         |FROM m""".stripMargin,
    // Brown-Forsythe: group medians off the per-type value support,
    // per-class micro cells summed exactly, shared W chain
    "q201_levene" ->
      s"""WITH support AS (
         |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents,
         |    CAST(COUNT(*) AS BIGINT) AS c
         |  FROM events GROUP BY 1, 2
         |), cums AS (
         |  SELECT *, CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY cents
         |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_c
         |  FROM support
         |), tot AS (
         |  SELECT event_type, CAST(SUM(c) AS BIGINT) AS n_total
         |  FROM support GROUP BY 1
         |), med AS (
         |  SELECT c.event_type, MIN(c.cents) AS med
         |  FROM cums c JOIN tot t ON c.event_type = t.event_type
         |  WHERE c.cum_c >= (t.n_total + 1) // 2
         |  GROUP BY 1
         |), z AS (
         |  SELECT s.event_type, abs(s.cents - m.med) AS z, s.c
         |  FROM support s JOIN med m ON s.event_type = m.event_type
         |), per_class AS (
         |  SELECT event_type, CAST(SUM(c) AS BIGINT) AS ni,
         |    CAST(SUM(z * c) AS BIGINT) AS si, CAST(SUM(z * z * c) AS BIGINT) AS ssi
         |  FROM z GROUP BY 1
         |), g AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(ni) AS BIGINT) AS n_total,
         |    CAST(SUM(si) AS BIGINT) AS s_total
         |  FROM per_class
         |), cells AS (
         |  SELECT k, n_total,
         |    ${graft.ops.Stats.bfCellNumSql} AS cell_num,
         |    ${graft.ops.Stats.bfCellDenSql} AS cell_den
         |  FROM per_class CROSS JOIN g
         |), agg AS (
         |  SELECT k, n_total, CAST(SUM(cell_num) AS BIGINT) AS num_micro,
         |    CAST(SUM(cell_den) AS BIGINT) AS den_micro
         |  FROM cells GROUP BY 1, 2
         |)
         |SELECT k, n_total, num_micro, den_micro,
         |  ${graft.ops.Stats.bfWSql} AS w_micro
         |FROM agg""".stripMargin,
    // Friedman: doubled midranks within complete day blocks, Conover
    // tie-corrected chi2 as one exact integer floor division
    "q202_friedman" ->
      """WITH daily AS (
        |  SELECT CAST(floor(extract(epoch FROM ts)) AS BIGINT) // 86400 AS day,
        |    event_type, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2
        |), kt AS (
        |  SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS k FROM daily
        |), sized AS (
        |  SELECT *, COUNT(*) OVER (PARTITION BY day) AS bsz FROM daily
        |), complete AS (
        |  SELECT s.day, s.event_type, s.c, kt.k FROM sized s CROSS JOIN kt
        |  WHERE s.bsz = kt.k
        |), ranked AS (
        |  SELECT *, (rank() OVER (PARTITION BY day ORDER BY c) - 1) * 2
        |    + COUNT(*) OVER (PARTITION BY day, c) + 1 AS mid2
        |  FROM complete
        |), per_treat AS (
        |  SELECT k, event_type, CAST(COUNT(*) AS BIGINT) AS n_blocks,
        |    CAST(SUM(mid2) AS BIGINT) AS r2j,
        |    CAST(SUM(mid2 * mid2) AS BIGINT) AS a2j
        |  FROM ranked GROUP BY 1, 2
        |), agg AS (
        |  SELECT k, n_blocks, CAST(SUM(a2j) AS BIGINT) AS a2,
        |    CAST(SUM((r2j - n_blocks * (k + 1)) * (r2j - n_blocks * (k + 1))) AS BIGINT) AS num_sq
        |  FROM per_treat GROUP BY 1, 2
        |)
        |SELECT k, n_blocks, a2, num_sq,
        |  CASE WHEN a2 - n_blocks * k * (k + 1) * (k + 1) = 0 THEN NULL
        |   ELSE CAST((k - 1) * num_sq * 1000000
        |     // (a2 - n_blocks * k * (k + 1) * (k + 1)) AS BIGINT) END AS chi2_micro
        |FROM agg""".stripMargin,
    // Cochran-Armitage: purchase-rate trend over $50 price bands,
    // five integer moments + the shared z chain
    "q203_cochran_armitage" ->
      s"""WITH ev AS (
         |  SELECT LEAST(CAST(round(value * 100) AS BIGINT) // 5000, 9) AS band,
         |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS succ
         |  FROM events WHERE event_type IN ('purchase', 'view')
         |), sup AS (
         |  SELECT band, CAST(COUNT(*) AS BIGINT) AS n_i, CAST(SUM(succ) AS BIGINT) AS r_i
         |  FROM ev GROUP BY 1
         |), m AS (
         |  SELECT CAST(SUM(n_i) AS BIGINT) AS n, CAST(SUM(r_i) AS BIGINT) AS r,
         |    CAST(SUM(band * n_i) AS BIGINT) AS swn,
         |    CAST(SUM(band * r_i) AS BIGINT) AS swr,
         |    CAST(SUM(band * band * n_i) AS BIGINT) AS sw2n
         |  FROM sup
         |)
         |SELECT n, r, swn, swr, sw2n,
         |  ${graft.ops.Stats.caZSql} AS z_micro
         |FROM m""".stripMargin,
    // Durbin-Watson per type on daily counts: mean cancels in the
    // lag-1 differences, one exact integer floor division
    "q204_durbin_watson" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(floor(extract(epoch FROM ts)) AS BIGINT) // 86400 AS day,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2
        |), lagd AS (
        |  SELECT *, c - lag(c) OVER (PARTITION BY event_type ORDER BY day) AS dd
        |  FROM daily
        |), m AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS s,
        |    CAST(SUM(c * c) AS BIGINT) AS ss,
        |    CAST(COALESCE(SUM(dd * dd), 0) AS BIGINT) AS sd2
        |  FROM lagd GROUP BY 1
        |)
        |SELECT event_type, n, s, ss, sd2,
        |  CASE WHEN n < 2 OR n * ss - s * s = 0 THEN NULL
        |   ELSE CAST(n * sd2 * 1000000 // (n * ss - s * s) AS BIGINT) END AS dw_micro
        |FROM m ORDER BY event_type""".stripMargin,
    // Cronbach alpha: item/total variance masses as exact integers
    // ((N-1)N denominators cancel), one shared double chain
    "q205_cronbach_alpha" ->
      s"""WITH cells AS (
         |  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM events GROUP BY 1, 2
         |), per_item AS (
         |  SELECT event_type, CAST(SUM(c) AS BIGINT) AS si, CAST(SUM(c * c) AS BIGINT) AS ssi
         |  FROM cells GROUP BY 1
         |), per_subj AS (
         |  SELECT user_id, CAST(SUM(c) AS BIGINT) AS t FROM cells GROUP BY 1
         |), tot AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n_subjects, CAST(SUM(t) AS BIGINT) AS st,
         |    CAST(SUM(t * t) AS BIGINT) AS sst
         |  FROM per_subj
         |), agg AS (
         |  SELECT n_subjects, st, sst, CAST(COUNT(*) AS BIGINT) AS k,
         |    CAST(SUM(n_subjects * ssi - si * si) AS BIGINT) AS item_var_mass
         |  FROM per_item CROSS JOIN tot GROUP BY 1, 2, 3
         |), agg2 AS (
         |  SELECT k, n_subjects, item_var_mass,
         |    CAST(n_subjects * sst - st * st AS BIGINT) AS total_var_mass
         |  FROM agg
         |)
         |SELECT k, n_subjects, item_var_mass, total_var_mass,
         |  ${graft.ops.Stats.cronbachAlphaSql} AS alpha_micro
         |FROM agg2""".stripMargin,
    // daily category HHI: exact integer share-square mass per day
    "q206_daily_hhi" ->
      s"""WITH $sessCte, per_cat AS (
         |  SELECT epoch_s // 86400 AS day, category_id, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM enr GROUP BY 1, 2
         |), m AS (
         |  SELECT day, CAST(COUNT(*) AS BIGINT) AS n_categories,
         |    CAST(SUM(c) AS BIGINT) AS total, CAST(SUM(c * c) AS BIGINT) AS sum_sq
         |  FROM per_cat GROUP BY 1
         |)
         |SELECT day, n_categories, total, sum_sq,
         |  CAST(sum_sq * 1000000 // (total * total) AS BIGINT) AS hhi_ppm
         |FROM m ORDER BY day""".stripMargin,
    // Hill tail index: top-201 order statistics, nano-quantized ln
    // contributions (ties at x_min contribute exactly 0), integer alpha
    "q207_hill_tail" ->
      s"""WITH $sessCte, pop AS (
         |  SELECT item_id AS id, CAST(COUNT(*) AS BIGINT) AS c FROM enr GROUP BY 1
         |), top AS (
         |  SELECT id, c FROM pop ORDER BY c DESC, id ASC LIMIT 201
         |), xm AS (
         |  SELECT CAST(MIN(c) AS BIGINT) AS x_min FROM top
         |), lns AS (
         |  SELECT t.c, xm.x_min,
         |    CAST(round(ln(CAST(t.c AS DOUBLE) / CAST(xm.x_min AS DOUBLE)) * 1000000000) AS BIGINT) AS ln_nano
         |  FROM top t CROSS JOIN xm
         |), agg AS (
         |  SELECT x_min, CAST(COUNT(*) - 1 AS BIGINT) AS n_tail,
         |    CAST(SUM(ln_nano) AS BIGINT) AS sum_ln_nano
         |  FROM lns GROUP BY 1
         |)
         |SELECT n_tail, x_min, sum_ln_nano,
         |  CASE WHEN sum_ln_nano = 0 THEN NULL
         |   ELSE CAST(1000000 + n_tail * 1000000000000000 // sum_ln_nano AS BIGINT) END AS alpha_micro
         |FROM agg""".stripMargin,
    // TextRank: PageRank over the adjacent-token graph (>=5-occurrence
    // vocabulary, both directions), q87's exact-integer unroll
    "q208_textrank" ->
      s"""WITH toks AS (
         |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents
         |), sq AS (
         |  SELECT t[i] AS tok, t[i + 1] AS nxt
         |  FROM toks, unnest(generate_series(1, len(t) - 1)) AS g(i)
         |), vocab AS (
         |  SELECT tok FROM (SELECT unnest(t) AS tok FROM toks) GROUP BY tok
         |  HAVING COUNT(*) >= 5
         |), und AS (
         |  SELECT LEAST(tok, nxt) AS wa, GREATEST(tok, nxt) AS wb,
         |    CAST(COUNT(*) AS BIGINT) AS cw
         |  FROM sq
         |  WHERE tok <> nxt AND tok IN (SELECT tok FROM vocab)
         |    AND nxt IN (SELECT tok FROM vocab)
         |  GROUP BY 1, 2
         |), trans AS (
         |  SELECT wa AS item_a, wb AS item_b, cw AS transition_count FROM und
         |  UNION ALL
         |  SELECT wb, wa, cw FROM und
         |), ${pagerankUnrollSql(2, None)}
         |SELECT id AS term, pr AS pr_micro FROM p2
         |ORDER BY pr_micro DESC, term ASC LIMIT 20""".stripMargin,
    // Kaplan-Meier weekly return survival: chained exact ppm floor
    // divisions over the 5-bucket risk table
    "q209_kaplan_meier" ->
      s"""WITH $sessCte, starts AS (
         |  SELECT user_id, session_id, MIN(epoch_s) AS start_s
         |  FROM sess GROUP BY 1, 2
         |), wks AS (
         |  SELECT (next_s - start_s) // 86400 // 7 AS wk FROM (
         |    SELECT start_s, lead(start_s) OVER (PARTITION BY user_id
         |      ORDER BY start_s, session_id) AS next_s
         |    FROM starts)
         |  WHERE next_s IS NOT NULL
         |), m AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
         |    CAST(SUM(CASE WHEN wk = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d0,
         |    CAST(SUM(CASE WHEN wk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS d1,
         |    CAST(SUM(CASE WHEN wk = 2 THEN 1 ELSE 0 END) AS BIGINT) AS d2,
         |    CAST(SUM(CASE WHEN wk = 3 THEN 1 ELSE 0 END) AS BIGINT) AS d3,
         |    CAST(SUM(CASE WHEN wk = 4 THEN 1 ELSE 0 END) AS BIGINT) AS d4
         |  FROM wks
         |), r AS (
         |  SELECT *, n_total AS n0, n_total - d0 AS n1, n_total - d0 - d1 AS n2,
         |    n_total - d0 - d1 - d2 AS n3, n_total - d0 - d1 - d2 - d3 AS n4
         |  FROM m
         |), v0 AS (
         |  SELECT *, CASE WHEN n0 = 0 THEN NULL ELSE 1000000 * (n0 - d0) // n0 END AS s0 FROM r
         |), v1 AS (
         |  SELECT *, CASE WHEN n1 = 0 THEN NULL ELSE s0 * (n1 - d1) // n1 END AS s1 FROM v0
         |), v2 AS (
         |  SELECT *, CASE WHEN n2 = 0 THEN NULL ELSE s1 * (n2 - d2) // n2 END AS s2 FROM v1
         |), v3 AS (
         |  SELECT *, CASE WHEN n3 = 0 THEN NULL ELSE s2 * (n3 - d3) // n3 END AS s3 FROM v2
         |), v4 AS (
         |  SELECT *, CASE WHEN n4 = 0 THEN NULL ELSE s3 * (n4 - d4) // n4 END AS s4 FROM v3
         |)
         |SELECT CAST(0 AS BIGINT) AS week, n0 AS n_at_risk, d0 AS n_died, CAST(s0 AS BIGINT) AS surv_ppm FROM v4
         |UNION ALL SELECT CAST(1 AS BIGINT), n1, d1, CAST(s1 AS BIGINT) FROM v4
         |UNION ALL SELECT CAST(2 AS BIGINT), n2, d2, CAST(s2 AS BIGINT) FROM v4
         |UNION ALL SELECT CAST(3 AS BIGINT), n3, d3, CAST(s3 AS BIGINT) FROM v4
         |UNION ALL SELECT CAST(4 AS BIGINT), n4, d4, CAST(s4 AS BIGINT) FROM v4
         |ORDER BY week""".stripMargin,
    // isotonic calibration: minimax interval form of PAVA, pure
    // integer ppm rates over the bounded band support
    "q210_isotonic" ->
      """WITH ev AS (
        |  SELECT LEAST(CAST(round(value * 100) AS BIGINT) // 5000, 9) AS band,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS succ
        |  FROM events WHERE event_type IN ('purchase', 'view')
        |), sup AS (
        |  SELECT band, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(succ) AS BIGINT) AS s
        |  FROM ev GROUP BY 1
        |), cums AS (
        |  SELECT *, CAST(SUM(n) OVER w AS BIGINT) AS cum_n,
        |    CAST(SUM(s) OVER w AS BIGINT) AS cum_s
        |  FROM sup WINDOW w AS (ORDER BY band ROWS UNBOUNDED PRECEDING)
        |), iv AS (
        |  SELECT j.band AS jb, k.band AS kb,
        |    CAST((k.cum_s - (j.cum_s - j.s)) * 1000000
        |      // (k.cum_n - (j.cum_n - j.n)) AS BIGINT) AS rate_ppm
        |  FROM cums j JOIN cums k ON j.band <= k.band
        |), mn AS (
        |  SELECT b.band, iv.jb, MIN(iv.rate_ppm) AS mnr
        |  FROM cums b JOIN iv ON iv.jb <= b.band AND b.band <= iv.kb
        |  GROUP BY 1, 2
        |), fit AS (
        |  SELECT band, CAST(MAX(mnr) AS BIGINT) AS iso_ppm FROM mn GROUP BY 1
        |)
        |SELECT c.band, c.n, c.s, CAST(c.s * 1000000 // c.n AS BIGINT) AS raw_ppm,
        |  f.iso_ppm
        |FROM cums c JOIN fit f USING (band) ORDER BY band""".stripMargin,
    // SALSA: degree-normalized HITS, 2 unrolled alternations of local
    // integer floor divisions (no global normalizer)
    "q211_salsa" ->
      s"""WITH $sessCte, $transCte, ${salsaUnrollSql(2)}
         |SELECT n.id AS item_id, h2.h AS hub_micro, a2.a AS auth_micro
         |FROM nodes n JOIN h2 USING (id) JOIN a2 USING (id)
         |ORDER BY auth_micro DESC, hub_micro DESC, item_id ASC LIMIT 20""".stripMargin,
    // intra-list diversity of the top-10 covis lists: cross-category
    // pair fraction from per-category multiplicities (no pair join)
    "q212_intra_list_diversity" ->
      s"""WITH $sessCte, $covisPairsCte, $covisDirectedCte, ${covisTopSql("recs", 10, withRn = false)}, bycat AS (
         |  SELECT src, dst % 20 AS cat, CAST(COUNT(*) AS BIGINT) AS m
         |  FROM recs GROUP BY 1, 2
         |), agg AS (
         |  SELECT src, CAST(SUM(m) AS BIGINT) AS n_recs,
         |    CAST(SUM(m * (m - 1) // 2) AS BIGINT) AS same_pairs
         |  FROM bycat GROUP BY 1
         |)
         |SELECT src, n_recs, same_pairs,
         |  CAST((n_recs * (n_recs - 1) // 2 - same_pairs) * 1000000
         |    // (n_recs * (n_recs - 1) // 2) AS BIGINT) AS ild_ppm
         |FROM agg WHERE n_recs >= 2 ORDER BY src""".stripMargin,
    // two-sample Q-Q deciles: integer ppm order-statistic ranks over
    // the shared purchase/view value support
    "q213_qq_deciles" ->
      s"""WITH $pvSupportCte, base AS (
         |  SELECT value, CAST(round(value * 100) AS BIGINT) AS cents, ca, cb FROM counts
         |), cums AS (
         |  SELECT cents,
         |    CAST(SUM(ca) OVER w AS BIGINT) AS cum_ca,
         |    CAST(SUM(cb) OVER w AS BIGINT) AS cum_cb
         |  FROM base WINDOW w AS (ORDER BY value ROWS UNBOUNDED PRECEDING)
         |), tot AS (
         |  SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb FROM counts
         |), ranks AS (
         |  SELECT CAST(i * 100000 AS BIGINT) AS ppm,
         |    (na * i * 100000 + 999999) // 1000000 AS rank_a,
         |    (nb * i * 100000 + 999999) // 1000000 AS rank_b
         |  FROM tot, unnest(generate_series(1, 9)) AS g(i)
         |), qa AS (
         |  SELECT r.ppm, CAST(MIN(c.cents) AS BIGINT) AS purchase_cents
         |  FROM cums c JOIN ranks r ON c.cum_ca >= r.rank_a GROUP BY 1
         |), qb AS (
         |  SELECT r.ppm, CAST(MIN(c.cents) AS BIGINT) AS view_cents
         |  FROM cums c JOIN ranks r ON c.cum_cb >= r.rank_b GROUP BY 1
         |)
         |SELECT ppm, purchase_cents, view_cents,
         |  purchase_cents - view_cents AS gap_cents
         |FROM qa JOIN qb USING (ppm) ORDER BY ppm""".stripMargin,
    // Tukey fences per type: integer ppm Q1/Q3, doubled fences, tail
    // mass by weighted conditional sums over the support
    "q214_tukey_outliers" ->
      """WITH sup AS (
        |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2
        |), cums AS (
        |  SELECT *, CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY cents
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_c
        |  FROM sup
        |), tot AS (
        |  SELECT event_type, CAST(SUM(c) AS BIGINT) AS n FROM sup GROUP BY 1
        |), j AS (
        |  SELECT c.*, t.n FROM cums c JOIN tot t USING (event_type)
        |), q1 AS (
        |  SELECT event_type, n, MIN(cents) AS q1_cents FROM j
        |  WHERE cum_c >= (n * 250000 + 999999) // 1000000 GROUP BY 1, 2
        |), q3 AS (
        |  SELECT event_type, n, MIN(cents) AS q3_cents FROM j
        |  WHERE cum_c >= (n * 750000 + 999999) // 1000000 GROUP BY 1, 2
        |), fences AS (
        |  SELECT q1.event_type, q1.n, q1_cents, q3_cents,
        |    q1_cents * 2 - (q3_cents - q1_cents) * 3 AS lo2,
        |    q3_cents * 2 + (q3_cents - q1_cents) * 3 AS hi2
        |  FROM q1 JOIN q3 USING (event_type, n)
        |)
        |SELECT s.event_type, f.n, f.q1_cents, f.q3_cents,
        |  CAST(SUM(CASE WHEN s.cents * 2 < f.lo2 THEN s.c ELSE 0 END) AS BIGINT) AS n_low,
        |  CAST(SUM(CASE WHEN s.cents * 2 > f.hi2 THEN s.c ELSE 0 END) AS BIGINT) AS n_high
        |FROM sup s JOIN fences f USING (event_type)
        |GROUP BY 1, 2, 3, 4 ORDER BY event_type""".stripMargin,
    // community purity: LPA labels (q157 unroll) vs category cells,
    // max over exact integer counts -- no transcendentals
    "q215_community_purity" ->
      s"""WITH $sessCte, $covisPairsCte, und AS (
         |  SELECT item_a AS src, item_b AS dst FROM pairs
         |  UNION ALL
         |  SELECT item_b AS src, item_a AS dst FROM pairs
         |), l0 AS (
         |  SELECT DISTINCT src AS id, src AS label FROM und
         |), ${lpaRoundsSql(4)},
         |cells AS (
         |  SELECT label, id % 20 AS cat, CAST(COUNT(*) AS BIGINT) AS m
         |  FROM l4 GROUP BY 1, 2
         |), per_comm AS (
         |  SELECT label, CAST(SUM(m) AS BIGINT) AS sz, CAST(MAX(m) AS BIGINT) AS top
         |  FROM cells GROUP BY 1
         |), agg AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n_communities,
         |    CAST(SUM(sz) AS BIGINT) AS n_items, CAST(SUM(top) AS BIGINT) AS top_mass
         |  FROM per_comm
         |)
         |SELECT n_communities, n_items, top_mass,
         |  CAST(top_mass * 1000000 // n_items AS BIGINT) AS purity_ppm
         |FROM agg""".stripMargin,
    // PACF lag 2: Durbin-Levinson phi22 from the q162 exact integer
    // moments, ratio chain in doubles (den^2 would overflow int64)
    "q216_pacf" ->
      """WITH daily AS (
        |  SELECT CAST(floor(extract(epoch FROM ts)) AS BIGINT) // 86400 AS day,
        |    CAST(COUNT(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1
        |), tot AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx FROM daily
        |), dn AS (
        |  SELECT CAST(SUM((n * x - sx) * (n * x - sx)) AS BIGINT) AS den
        |  FROM daily CROSS JOIN tot
        |), n1 AS (
        |  SELECT CAST(SUM((n * a.x - sx) * (n * b.x - sx)) AS BIGINT) AS num1
        |  FROM daily a CROSS JOIN tot JOIN daily b ON b.day = a.day + 1
        |), n2 AS (
        |  SELECT CAST(SUM((n * a.x - sx) * (n * b.x - sx)) AS BIGINT) AS num2
        |  FROM daily a CROSS JOIN tot JOIN daily b ON b.day = a.day + 2
        |)
        |SELECT n, num1, num2, den,
        |  CASE WHEN den = 0
        |     OR cast(num1 as double) * cast(num1 as double)
        |        = cast(den as double) * cast(den as double) THEN NULL
        |   ELSE CAST(round(
        |     (cast(num2 as double) / cast(den as double)
        |      - (cast(num1 as double) / cast(den as double))
        |        * (cast(num1 as double) / cast(den as double)))
        |     / (1.0 - (cast(num1 as double) / cast(den as double))
        |        * (cast(num1 as double) / cast(den as double)))
        |     * 1000000) AS BIGINT) END AS pacf2_micro
        |FROM tot CROSS JOIN n1 CROSS JOIN n2 CROSS JOIN dn""".stripMargin,
    // novelty: nano-quantized self-information of each top-10 list
    "q217_rec_novelty" ->
      s"""WITH $sessCte, $covisPairsCte, $covisDirectedCte, ${covisTopSql("recs", 10, withRn = false)}, pop AS (
         |  SELECT item_id, CAST(COUNT(*) AS BIGINT) AS c FROM enr GROUP BY 1
         |), tot AS (
         |  SELECT CAST(SUM(c) AS BIGINT) AS n_tot FROM pop
         |), info AS (
         |  SELECT item_id AS dst,
         |    CAST(round(ln(CAST(n_tot AS DOUBLE) / CAST(c AS DOUBLE)) * 1000000000) AS BIGINT) AS info_nano
         |  FROM pop CROSS JOIN tot
         |), agg AS (
         |  SELECT src, CAST(COUNT(*) AS BIGINT) AS n_recs,
         |    CAST(SUM(info_nano) AS BIGINT) AS info_sum_nano
         |  FROM recs JOIN info USING (dst) GROUP BY 1
         |)
         |SELECT src, n_recs, info_sum_nano,
         |  CAST(info_sum_nano // n_recs AS BIGINT) AS novelty_nano
         |FROM agg ORDER BY src""".stripMargin,
    // A-ES weighted sample: md5-uniform u, nano -ln(u) div weight,
    // 100 smallest priorities
    "q218_weighted_sample" ->
      s"""WITH $sessCte, pop AS (
         |  SELECT item_id, CAST(COUNT(*) AS BIGINT) AS weight FROM enr GROUP BY 1
         |), keyed AS (
         |  SELECT item_id, weight,
         |    CAST(('0x' || substring(md5(CAST(item_id AS VARCHAR) || '_ws'), 1, 15)) AS BIGINT) AS h
         |  FROM pop
         |), pr AS (
         |  SELECT item_id, weight,
         |    CAST(round(-ln((CAST(h AS DOUBLE) + 1) / 1152921504606846976.0)
         |      * 1000000000) AS BIGINT) // weight AS priority
         |  FROM keyed
         |)
         |SELECT item_id, weight, priority FROM pr
         |ORDER BY priority ASC, item_id ASC LIMIT 100""".stripMargin,
    // two-proportion z: weekend vs weekday purchase rate, four exact
    // integer cells + the shared pooled-variance chain
    "q219_two_prop_z" ->
      s"""WITH e AS (
         |  SELECT CASE WHEN (CAST(floor(extract(epoch FROM ts)) AS BIGINT) // 86400 + 3) % 7 >= 5
         |      THEN 1 ELSE 0 END AS wknd,
         |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS succ
         |  FROM events WHERE event_type IN ('purchase', 'view')
         |), m AS (
         |  SELECT CAST(SUM(wknd) AS BIGINT) AS n1,
         |    CAST(SUM(wknd * succ) AS BIGINT) AS r1,
         |    CAST(SUM(1 - wknd) AS BIGINT) AS n2,
         |    CAST(SUM((1 - wknd) * succ) AS BIGINT) AS r2
         |  FROM e
         |)
         |SELECT n1, r1, n2, r2,
         |  ${graft.ops.Stats.twoPropZSql} AS z_micro
         |FROM m""".stripMargin,
    // Mann-Kendall: exact integer S and tie term off the bounded daily
    // series, shared continuity-corrected z chain
    "q220_mann_kendall" ->
      s"""WITH daily AS (
         |  SELECT CAST(floor(extract(epoch FROM ts)) AS BIGINT) // 86400 AS day,
         |    CAST(COUNT(*) AS BIGINT) AS x
         |  FROM events WHERE event_type = 'purchase' GROUP BY 1
         |), sp AS (
         |  SELECT CAST(SUM(CASE WHEN b.x > a.x THEN 1 WHEN b.x < a.x THEN -1 ELSE 0 END) AS BIGINT) AS s
         |  FROM daily a JOIN daily b ON a.day < b.day
         |), t AS (
         |  SELECT CAST(SUM(t) AS BIGINT) AS n,
         |    CAST(SUM(t * (t - 1) * (t * 2 + 5)) AS BIGINT) AS ties_term
         |  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM daily GROUP BY x)
         |)
         |SELECT n, s, ties_term,
         |  ${graft.ops.Stats.mkZSql} AS z_micro
         |FROM t CROSS JOIN sp""".stripMargin,
    // runs test: median-sign sequence, rank+1 self-join adjacency,
    // shared mu/sigma chain
    "q221_runs_test" ->
      s"""WITH daily AS (
         |  SELECT CAST(floor(extract(epoch FROM ts)) AS BIGINT) // 86400 AS day,
         |    CAST(COUNT(*) AS BIGINT) AS x
         |  FROM events GROUP BY 1
         |), sup AS (
         |  SELECT x, CAST(COUNT(*) AS BIGINT) AS c FROM daily GROUP BY 1
         |), cums AS (
         |  SELECT *, CAST(SUM(c) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_c
         |  FROM sup
         |), tot AS (
         |  SELECT CAST(SUM(c) AS BIGINT) AS n_total FROM sup
         |), med AS (
         |  SELECT MIN(x) AS med FROM cums CROSS JOIN tot
         |  WHERE cum_c >= (n_total + 1) // 2
         |), signed AS (
         |  SELECT day, CASE WHEN x > med THEN 1 ELSE 0 END AS sgn
         |  FROM daily CROSS JOIN med WHERE x <> med
         |), ranked AS (
         |  SELECT ROW_NUMBER() OVER (ORDER BY day) AS rk, sgn FROM signed
         |), chg AS (
         |  SELECT CAST(COALESCE(SUM(CASE WHEN a.sgn <> b.sgn THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_changes
         |  FROM ranked a JOIN ranked b ON b.rk = a.rk + 1
         |), cnt AS (
         |  SELECT CAST(SUM(sgn) AS BIGINT) AS n_above,
         |    CAST(SUM(1 - sgn) AS BIGINT) AS n_below
         |  FROM signed
         |)
         |SELECT n_above, n_below, CAST(n_changes + 1 AS BIGINT) AS n_runs,
         |  ${graft.ops.Stats.runsZSql} AS z_micro
         |FROM cnt CROSS JOIN chg""".stripMargin,
    // Bradley-Terry: 2 unrolled MM iterations at pico precision over
    // the symmetric game table (transitions read as preferences)
    "q222_bradley_terry" ->
      s"""WITH $sessCte, $transCte, nsl AS (
         |  SELECT item_a, item_b, transition_count FROM trans WHERE item_a <> item_b
         |), games AS (
         |  SELECT a, b, CAST(SUM(nw) AS BIGINT) AS m FROM (
         |    SELECT item_b AS a, item_a AS b, transition_count AS nw FROM nsl
         |    UNION ALL
         |    SELECT item_a AS a, item_b AS b, transition_count AS nw FROM nsl
         |  ) GROUP BY 1, 2
         |), totw AS (
         |  SELECT item_b AS id, CAST(SUM(transition_count) AS BIGINT) AS w_total
         |  FROM nsl GROUP BY 1
         |), nodes AS (
         |  SELECT g.a AS id, CAST(COALESCE(t.w_total, 0) AS BIGINT) AS w_total
         |  FROM (SELECT DISTINCT a FROM games) g LEFT JOIN totw t ON g.a = t.id
         |), s0 AS (
         |  SELECT id, CAST(1000000 AS BIGINT) AS s_micro FROM nodes
         |), d1 AS (
         |  SELECT g.a AS id, CAST(SUM(CASE WHEN sa.s_micro + sb.s_micro = 0 THEN 0
         |    ELSE g.m * 1000000000000 // (sa.s_micro + sb.s_micro) END) AS BIGINT) AS d_pico
         |  FROM games g JOIN s0 sa ON g.a = sa.id JOIN s0 sb ON g.b = sb.id GROUP BY 1
         |), s1 AS (
         |  SELECT n.id, CAST(CASE WHEN d.d_pico IS NULL OR d.d_pico = 0 THEN 0
         |    ELSE n.w_total * 1000000000000 // d.d_pico END AS BIGINT) AS s_micro
         |  FROM nodes n LEFT JOIN d1 d USING (id)
         |), d2 AS (
         |  SELECT g.a AS id, CAST(SUM(CASE WHEN sa.s_micro + sb.s_micro = 0 THEN 0
         |    ELSE g.m * 1000000000000 // (sa.s_micro + sb.s_micro) END) AS BIGINT) AS d_pico
         |  FROM games g JOIN s1 sa ON g.a = sa.id JOIN s1 sb ON g.b = sb.id GROUP BY 1
         |), s2 AS (
         |  SELECT n.id, CAST(CASE WHEN d.d_pico IS NULL OR d.d_pico = 0 THEN 0
         |    ELSE n.w_total * 1000000000000 // d.d_pico END AS BIGINT) AS s_micro
         |  FROM nodes n LEFT JOIN d2 d USING (id)
         |)
         |SELECT id AS item_id, s_micro FROM s2
         |ORDER BY s_micro DESC, item_id ASC LIMIT 20""".stripMargin,
    // one-way ANOVA F across day-of-week groups: the q201 cell
    // templates on raw values (BF is this statistic on |x - median|)
    "q223_anova_f" ->
      s"""WITH daily AS (
         |  SELECT CAST(floor(extract(epoch FROM ts)) AS BIGINT) // 86400 AS day,
         |    CAST(COUNT(*) AS BIGINT) AS x
         |  FROM events GROUP BY 1
         |), g AS (
         |  SELECT (day + 3) % 7 AS dow, x FROM daily
         |), per_class AS (
         |  SELECT dow, CAST(COUNT(*) AS BIGINT) AS ni, CAST(SUM(x) AS BIGINT) AS si,
         |    CAST(SUM(x * x) AS BIGINT) AS ssi
         |  FROM g GROUP BY 1
         |), t AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(ni) AS BIGINT) AS n_total,
         |    CAST(SUM(si) AS BIGINT) AS s_total
         |  FROM per_class
         |), cells AS (
         |  SELECT k, n_total,
         |    ${graft.ops.Stats.bfCellNumSql} AS cell_num,
         |    ${graft.ops.Stats.bfCellDenSql} AS cell_den
         |  FROM per_class CROSS JOIN t
         |), agg AS (
         |  SELECT k, n_total, CAST(SUM(cell_num) AS BIGINT) AS num_micro,
         |    CAST(SUM(cell_den) AS BIGINT) AS den_micro
         |  FROM cells GROUP BY 1, 2
         |)
         |SELECT k, n_total, num_micro, den_micro,
         |  ${graft.ops.Stats.bfWSql} AS f_micro
         |FROM agg""".stripMargin,
    // Chapman capture-recapture: first/second half item captures,
    // pure integer estimator
    "q224_capture_recapture" ->
      s"""WITH $sessCte, it AS (
         |  SELECT item_id, epoch_s // 86400 AS day FROM enr
         |), mid AS (
         |  SELECT (MIN(day) + MAX(day) + 1) // 2 AS mid FROM it
         |), per_item AS (
         |  SELECT item_id,
         |    MAX(CASE WHEN day < mid THEN 1 ELSE 0 END) AS in1,
         |    MAX(CASE WHEN day >= mid THEN 1 ELSE 0 END) AS in2
         |  FROM it CROSS JOIN mid GROUP BY 1
         |), mm AS (
         |  SELECT CAST(SUM(in1) AS BIGINT) AS n1, CAST(SUM(in2) AS BIGINT) AS n2,
         |    CAST(SUM(in1 * in2) AS BIGINT) AS m
         |  FROM per_item
         |)
         |SELECT n1, n2, m,
         |  CAST((n1 + 1) * (n2 + 1) // (m + 1) - 1 AS BIGINT) AS n_hat
         |FROM mm""".stripMargin,
    // jackknife over day blocks: micro-quantized leave-one-out
    // pseudo-estimates, exact integer variance
    "q225_jackknife" ->
      """WITH daily AS (
        |  SELECT day, CAST(COUNT(*) AS BIGINT) AS ni, CAST(SUM(cents) AS BIGINT) AS si
        |  FROM (SELECT CAST(floor(extract(epoch FROM ts)) AS BIGINT) // 86400 AS day,
        |          CAST(round(value * 100) AS BIGINT) AS cents
        |        FROM events WHERE event_type = 'purchase')
        |  GROUP BY 1
        |), tot AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_days, CAST(SUM(ni) AS BIGINT) AS nn,
        |    CAST(SUM(si) AS BIGINT) AS ss
        |  FROM daily
        |), th AS (
        |  SELECT n_days, nn, ss,
        |    CAST(round(CAST(ss - si AS DOUBLE) / CAST(nn - ni AS DOUBLE)
        |      * 1000000) AS BIGINT) AS theta_i
        |  FROM daily CROSS JOIN tot WHERE nn > ni
        |), mb AS (
        |  SELECT CAST(SUM(theta_i) AS BIGINT) // COUNT(*) AS theta_bar FROM th
        |), agg AS (
        |  SELECT n_days, nn, ss,
        |    CAST(SUM((theta_i - theta_bar) * (theta_i - theta_bar)) AS BIGINT) AS sdev2
        |  FROM th CROSS JOIN mb GROUP BY 1, 2, 3
        |)
        |SELECT n_days, CAST(ss * 1000000 // nn AS BIGINT) AS theta_micro,
        |  CAST((n_days - 1) * sdev2 // n_days AS BIGINT) AS var_jack_micro2,
        |  CAST(round(sqrt(CAST((n_days - 1) * sdev2 // n_days AS DOUBLE))) AS BIGINT) AS se_micro
        |FROM agg""".stripMargin,
    // entropy rate: damped-stationary (q87 unroll) weighted per-state
    // transition entropies, micro cells, one integer division
    "q226_entropy_rate" ->
      s"""WITH $sessCte, $transCte, ${pagerankUnrollSql(2, None)}, outw2 AS (
         |  SELECT item_a AS id, CAST(SUM(transition_count) AS BIGINT) AS out_w
         |  FROM trans GROUP BY 1
         |), hh AS (
         |  SELECT t.item_a AS id, CAST(SUM(CAST(round(
         |    CAST(t.transition_count AS DOUBLE) / CAST(o.out_w AS DOUBLE)
         |    * ln(CAST(o.out_w AS DOUBLE) / CAST(t.transition_count AS DOUBLE))
         |    * 1000000) AS BIGINT)) AS BIGINT) AS h_micro
         |  FROM trans t JOIN outw2 o ON t.item_a = o.id GROUP BY 1
         |), agg AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n_states, CAST(SUM(p.pr) AS BIGINT) AS pr_total,
         |    CAST(SUM(p.pr * COALESCE(h.h_micro, 0)) AS BIGINT) AS wh
         |  FROM p2 p LEFT JOIN hh h USING (id)
         |)
         |SELECT n_states, pr_total, CAST(wh // pr_total AS BIGINT) AS rate_micro
         |FROM agg""".stripMargin,
    // NMI of LPA communities vs categories: nano MI / entropy cells
    // (the q215 purity's shattering-penalized sibling)
    "q227_community_nmi" ->
      s"""WITH $sessCte, $covisPairsCte, und AS (
         |  SELECT item_a AS src, item_b AS dst FROM pairs
         |  UNION ALL
         |  SELECT item_b AS src, item_a AS dst FROM pairs
         |), l0 AS (
         |  SELECT DISTINCT src AS id, src AS label FROM und
         |), ${lpaRoundsSql(4)},
         |cells AS (
         |  SELECT label, id % 20 AS cat, CAST(COUNT(*) AS BIGINT) AS nij
         |  FROM l4 GROUP BY 1, 2
         |), nt AS (
         |  SELECT CAST(SUM(nij) AS BIGINT) AS n FROM cells
         |), rws AS (
         |  SELECT label, CAST(SUM(nij) AS BIGINT) AS ni FROM cells GROUP BY 1
         |), cls AS (
         |  SELECT cat, CAST(SUM(nij) AS BIGINT) AS nj FROM cells GROUP BY 1
         |), mi AS (
         |  SELECT CAST(SUM(CAST(round(CAST(nij AS DOUBLE) / CAST(n AS DOUBLE)
         |    * ln(CAST(n AS DOUBLE) * CAST(nij AS DOUBLE)
         |         / (CAST(ni AS DOUBLE) * CAST(nj AS DOUBLE)))
         |    * 1000000000) AS BIGINT)) AS BIGINT) AS mi_nano
         |  FROM cells JOIN rws USING (label) JOIN cls USING (cat) CROSS JOIN nt
         |), hc AS (
         |  SELECT CAST(SUM(CAST(round(CAST(ni AS DOUBLE) / CAST(n AS DOUBLE)
         |    * ln(CAST(n AS DOUBLE) / CAST(ni AS DOUBLE))
         |    * 1000000000) AS BIGINT)) AS BIGINT) AS h_comm_nano
         |  FROM rws CROSS JOIN nt
         |), ht AS (
         |  SELECT CAST(SUM(CAST(round(CAST(nj AS DOUBLE) / CAST(n AS DOUBLE)
         |    * ln(CAST(n AS DOUBLE) / CAST(nj AS DOUBLE))
         |    * 1000000000) AS BIGINT)) AS BIGINT) AS h_cat_nano
         |  FROM cls CROSS JOIN nt
         |)
         |SELECT nt.n AS n_items, mi_nano, h_comm_nano, h_cat_nano,
         |  CASE WHEN h_comm_nano + h_cat_nano = 0 THEN NULL
         |   ELSE CAST(round(2.0 * CAST(mi_nano AS DOUBLE)
         |     / CAST(h_comm_nano + h_cat_nano AS DOUBLE) * 1000000) AS BIGINT) END AS nmi_micro
         |FROM nt CROSS JOIN mi CROSS JOIN hc CROSS JOIN ht""".stripMargin,
    // ESS of the q166 IPS click weights: (sum w)^2 / sum w^2
    "q228_ips_ess" ->
      s"""WITH $sessCte, vc AS (
         |  SELECT session_id, event_type, epoch_s, event_id FROM enr
         |  WHERE event_type IN ('view', 'click')
         |), posd AS (
         |  SELECT event_type, LEAST(ROW_NUMBER() OVER (PARTITION BY session_id
         |    ORDER BY epoch_s, event_id), 10) AS pos
         |  FROM vc
         |), m AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(pos) AS BIGINT) AS sw,
         |    CAST(SUM(pos * pos) AS BIGINT) AS sw2
         |  FROM posd WHERE event_type = 'click'
         |)
         |SELECT n, sw, sw2, CAST(sw * sw // sw2 AS BIGINT) AS ess,
         |  CAST(round(CAST(sw * sw AS DOUBLE) / CAST(sw2 AS DOUBLE)
         |    / CAST(n AS DOUBLE) * 1000000) AS BIGINT) AS ess_ratio_micro
         |FROM m""".stripMargin,
    // SES one-step forecast: precomputed nano weight literals joined
    // by lag, normalized by the included weight mass
    "q229_ses_forecast" ->
      s"""WITH daily AS (
         |  SELECT CAST(floor(extract(epoch FROM ts)) AS BIGINT) // 86400 AS day,
         |    CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
         |  FROM events WHERE event_type = 'purchase' GROUP BY 1
         |), tm AS (
         |  SELECT CAST(MAX(day) AS BIGINT) AS tmax FROM daily
         |), wt(lag_d, w_nano) AS (
         |  VALUES ${graft.ops.Stats.sesWeightsNano().map { case (i, w) => s"($i, $w)" }.mkString(", ")}
         |), m AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n_terms,
         |    CAST(SUM(w.w_nano * d.y) AS BIGINT) AS wsum_nano,
         |    CAST(SUM(w.w_nano) AS BIGINT) AS w_mass_nano
         |  FROM daily d CROSS JOIN tm JOIN wt w ON tm.tmax - d.day = w.lag_d
         |)
         |SELECT n_terms, wsum_nano, w_mass_nano,
         |  CAST(wsum_nano // w_mass_nano AS BIGINT) AS forecast_cents
         |FROM m""".stripMargin,
    // SRM: md5 variant split chi2 vs 50/50, integer end-to-end
    "q230_srm_check" ->
      """WITH u AS (
        |  SELECT DISTINCT user_id FROM events
        |), v AS (
        |  SELECT CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) % 2 AS variant
        |  FROM u
        |), m AS (
        |  SELECT CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
        |    CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
        |  FROM v
        |)
        |SELECT n0, n1,
        |  CAST((n0 - n1) * (n0 - n1) * 1000000 // (n0 + n1) AS BIGINT) AS chi2_micro,
        |  CAST(CASE WHEN (n0 - n1) * (n0 - n1) * 1000000 // (n0 + n1) > 3841459
        |    THEN 1 ELSE 0 END AS BIGINT) AS srm_flag
        |FROM m""".stripMargin,
    // Neyman allocation: stratum mass N_h * sd_cents, one floor
    // division per stratum
    "q231_neyman_allocation" ->
      """WITH per AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_h,
        |    CAST(SUM(cents) AS BIGINT) AS s_h, CAST(SUM(cents * cents) AS BIGINT) AS ss_h
        |  FROM (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents FROM events)
        |  GROUP BY 1
        |), sd AS (
        |  SELECT *, CASE WHEN n_h < 2 THEN 0 ELSE CAST(round(sqrt(
        |    (CAST(ss_h AS DOUBLE) - CAST(s_h AS DOUBLE) * CAST(s_h AS DOUBLE) / CAST(n_h AS DOUBLE))
        |    / CAST(n_h - 1 AS DOUBLE))) AS BIGINT) END AS sd_cents
        |  FROM per
        |), ms AS (
        |  SELECT *, n_h * sd_cents AS mass FROM sd
        |), tot AS (
        |  SELECT CAST(SUM(mass) AS BIGINT) AS mass_total FROM ms
        |)
        |SELECT event_type, n_h, sd_cents,
        |  CAST(CASE WHEN mass_total = 0 THEN 0 ELSE mass * 10000 // mass_total END AS BIGINT) AS alloc_10k
        |FROM ms CROSS JOIN tot ORDER BY event_type""".stripMargin,
    // A/B power: z constants as literals, observed pooled rate
    "q232_ab_power" ->
      """WITH m AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS r
        |  FROM events WHERE event_type IN ('purchase', 'view')
        |)
        |SELECT n, r, CAST(r * 1000000 // n AS BIGINT) AS p_ppm,
        |  CASE WHEN r = 0 OR r = n THEN NULL
        |   ELSE CAST(round(2.801585 * 2.801585 * 2.0
        |     * (CAST(r AS DOUBLE) / CAST(n AS DOUBLE))
        |     * (1.0 - CAST(r AS DOUBLE) / CAST(n AS DOUBLE))
        |     / (0.01 * 0.01)) AS BIGINT) END AS n_per_arm
        |FROM m""".stripMargin,
    // FK orphan audit: one anti-join count per relationship
    "q233_fk_orphans" ->
      """SELECT 'lineitem_orders' AS relationship,
        |  CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT) AS n_child,
        |  CAST((SELECT COUNT(*) FROM lineitem l LEFT JOIN orders o
        |        ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL) AS BIGINT) AS n_orphans
        |UNION ALL
        |SELECT 'lineitem_part',
        |  CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT),
        |  CAST((SELECT COUNT(*) FROM lineitem l LEFT JOIN part p
        |        ON l.l_partkey = p.p_partkey WHERE p.p_partkey IS NULL) AS BIGINT)
        |UNION ALL
        |SELECT 'lineitem_supplier',
        |  CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT),
        |  CAST((SELECT COUNT(*) FROM lineitem l LEFT JOIN supplier s
        |        ON l.l_suppkey = s.s_suppkey WHERE s.s_suppkey IS NULL) AS BIGINT)
        |UNION ALL
        |SELECT 'orders_customer',
        |  CAST((SELECT COUNT(*) FROM orders) AS BIGINT),
        |  CAST((SELECT COUNT(*) FROM orders o LEFT JOIN customer c
        |        ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL) AS BIGINT)
        |ORDER BY relationship""".stripMargin,
    // Pareto concentration: descending revenue-support cumulative,
    // ceil-ppm threshold, exact partial-block pick
    "q234_pareto_revenue" ->
      """WITH per_cust AS (
        |  SELECT o_custkey, CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders GROUP BY 1
        |), sup AS (
        |  SELECT cents, CAST(COUNT(*) AS BIGINT) AS m,
        |    CAST(cents * COUNT(*) AS BIGINT) AS block_rev
        |  FROM per_cust WHERE cents > 0 GROUP BY cents
        |), cums AS (
        |  SELECT *, CAST(SUM(block_rev) OVER (ORDER BY cents DESC
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_block_rev
        |  FROM sup
        |), tot AS (
        |  SELECT CAST(SUM(m) AS BIGINT) AS n_customers,
        |    CAST(SUM(block_rev) AS BIGINT) AS total_cents
        |  FROM sup
        |), t2 AS (
        |  SELECT *, (total_cents * 800000 + 999999) // 1000000 AS thresh FROM tot
        |), agg AS (
        |  SELECT n_customers, total_cents,
        |    CAST(SUM(CASE WHEN cum_block_rev < thresh THEN m ELSE 0 END) AS BIGINT) AS full_blocks,
        |    CAST(SUM(CASE WHEN cum_block_rev >= thresh AND cum_block_rev - block_rev < thresh
        |      THEN (thresh - (cum_block_rev - block_rev) + cents - 1) // cents
        |      ELSE 0 END) AS BIGINT) AS partial
        |  FROM cums CROSS JOIN t2 GROUP BY 1, 2
        |)
        |SELECT n_customers, total_cents,
        |  CAST(full_blocks + partial AS BIGINT) AS customers_for_80pct,
        |  CAST((full_blocks + partial) * 1000000 // n_customers AS BIGINT) AS share_of_customers_ppm
        |FROM agg""".stripMargin,
    // RFM: ties-together quintiles per dimension (the q167 decile
    // rule), 5x5x5 segment census
    "q235_rfm_segments" ->
      """WITH o AS (
        |  SELECT o_custkey,
        |    CAST(floor(extract(epoch FROM o_orderdate)) AS BIGINT) // 86400 AS day,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders
        |), md AS (
        |  SELECT CAST(MAX(day) AS BIGINT) AS max_day FROM o
        |), rfm AS (
        |  SELECT o_custkey, CAST(MIN(max_day - day) AS BIGINT) AS r_days,
        |    CAST(COUNT(*) AS BIGINT) AS f_orders, CAST(SUM(cents) AS BIGINT) AS m_cents
        |  FROM o CROSS JOIN md GROUP BY 1
        |), nn AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM rfm
        |), qr AS (
        |  SELECT r_days, 5 * (CAST(SUM(c) OVER (ORDER BY r_days ROWS UNBOUNDED PRECEDING) AS BIGINT) - c) // n + 1 AS q
        |  FROM (SELECT r_days, CAST(COUNT(*) AS BIGINT) AS c FROM rfm GROUP BY 1) CROSS JOIN nn
        |), qf AS (
        |  SELECT f_orders, 5 * (CAST(SUM(c) OVER (ORDER BY f_orders ROWS UNBOUNDED PRECEDING) AS BIGINT) - c) // n + 1 AS q
        |  FROM (SELECT f_orders, CAST(COUNT(*) AS BIGINT) AS c FROM rfm GROUP BY 1) CROSS JOIN nn
        |), qm AS (
        |  SELECT m_cents, 5 * (CAST(SUM(c) OVER (ORDER BY m_cents ROWS UNBOUNDED PRECEDING) AS BIGINT) - c) // n + 1 AS q
        |  FROM (SELECT m_cents, CAST(COUNT(*) AS BIGINT) AS c FROM rfm GROUP BY 1) CROSS JOIN nn
        |)
        |SELECT qr.q AS r_q, qf.q AS f_q, qm.q AS m_q,
        |  CAST(COUNT(*) AS BIGINT) AS n_customers
        |FROM rfm JOIN qr USING (r_days) JOIN qf USING (f_orders) JOIN qm USING (m_cents)
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    // dup-cluster census: size histogram over the q42 components
    "q236_dup_cluster_stats" ->
      s"""WITH RECURSIVE $neardupComponentsCte, fullc AS (
         |  SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS component
         |  FROM documents d LEFT JOIN comp c ON d.doc_id = c.id
         |), csize AS (
         |  SELECT component, CAST(COUNT(*) AS BIGINT) AS cluster_size
         |  FROM fullc GROUP BY 1
         |)
         |SELECT cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters,
         |  CAST(SUM(cluster_size) AS BIGINT) AS n_docs
         |FROM csize GROUP BY 1 ORDER BY cluster_size""".stripMargin,
    // profile drift: half-vs-half conditional aggregates, unpivoted
    "q237_profile_drift" ->
      """WITH e AS (
        |  SELECT CAST(floor(extract(epoch FROM ts)) AS BIGINT) // 86400 AS day, user_id,
        |    TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS item_id,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events
        |), mid AS (
        |  SELECT (MIN(day) + MAX(day) + 1) // 2 AS mid FROM e
        |), m AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN day < mid THEN 1 ELSE 0 END) AS BIGINT) AS n_rows_a,
        |    CAST(COUNT(DISTINCT CASE WHEN day < mid THEN user_id END) AS BIGINT) AS n_users_a,
        |    CAST(COUNT(DISTINCT CASE WHEN day < mid THEN item_id END) AS BIGINT) AS n_items_a,
        |    CAST(SUM(CASE WHEN day < mid AND item_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_a,
        |    CAST(SUM(CASE WHEN day < mid THEN cents ELSE 0 END) AS BIGINT) AS s_cents_a,
        |    CAST(SUM(CASE WHEN day >= mid THEN 1 ELSE 0 END) AS BIGINT) AS n_rows_b,
        |    CAST(COUNT(DISTINCT CASE WHEN day >= mid THEN user_id END) AS BIGINT) AS n_users_b,
        |    CAST(COUNT(DISTINCT CASE WHEN day >= mid THEN item_id END) AS BIGINT) AS n_items_b,
        |    CAST(SUM(CASE WHEN day >= mid AND item_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_b,
        |    CAST(SUM(CASE WHEN day >= mid THEN cents ELSE 0 END) AS BIGINT) AS s_cents_b
        |  FROM e CROSS JOIN mid
        |)
        |SELECT 'mean_cents' AS metric, CAST(s_cents_a // n_rows_a AS BIGINT) AS first_half,
        |  CAST(s_cents_b // n_rows_b AS BIGINT) AS second_half FROM m
        |UNION ALL SELECT 'n_items', n_items_a, n_items_b FROM m
        |UNION ALL SELECT 'n_rows', n_rows_a, n_rows_b FROM m
        |UNION ALL SELECT 'n_users', n_users_a, n_users_b FROM m
        |UNION ALL SELECT 'null_item_ppm', CAST(n_null_a * 1000000 // n_rows_a AS BIGINT),
        |  CAST(n_null_b * 1000000 // n_rows_b AS BIGINT) FROM m
        |ORDER BY metric""".stripMargin,
    // association lift over the q19 basket contract: per-item basket
    // counts + pair supports, exact ppm lift/confidence
    "q238_association_lift" ->
      s"""WITH $sessCte, $covisPairsCte, ca AS (
         |  SELECT item_id, CAST(COUNT(*) AS BIGINT) AS c FROM dik GROUP BY 1
         |), nb AS (
         |  SELECT CAST(COUNT(DISTINCT session_id) AS BIGINT) AS n_baskets FROM dik
         |), j AS (
         |  SELECT p.item_a, p.item_b, CAST(p.pair_count AS BIGINT) AS pair_count,
         |    a.c AS c_a, b.c AS c_b, nb.n_baskets
         |  FROM pairs p JOIN ca a ON p.item_a = a.item_id
         |  JOIN ca b ON p.item_b = b.item_id CROSS JOIN nb
         |)
         |SELECT item_a, item_b, pair_count, c_a, c_b,
         |  CAST(pair_count * n_baskets * 1000000 // (c_a * c_b) AS BIGINT) AS lift_ppm,
         |  CAST(pair_count * 1000000 // c_a AS BIGINT) AS conf_ab_ppm,
         |  CAST(pair_count * 1000000 // c_b AS BIGINT) AS conf_ba_ppm
         |FROM j ORDER BY lift_ppm DESC, item_a ASC, item_b ASC LIMIT 20""".stripMargin,
    // cohort LTV triangle: first-seen-week cohorts, per-cohort
    // cumulative purchase cents by week offset
    "q239_cohort_ltv" ->
      """WITH uw AS (
        |  SELECT user_id, CAST(floor(extract(epoch FROM ts)) AS BIGINT) // 604800 AS week,
        |    CAST(SUM(CASE WHEN event_type = 'purchase'
        |      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS cents
        |  FROM events GROUP BY 1, 2
        |), ch AS (
        |  SELECT user_id, CAST(MIN(week) AS BIGINT) AS cohort FROM uw GROUP BY 1
        |), sized AS (
        |  SELECT cohort, CAST(COUNT(*) AS BIGINT) AS cohort_users FROM ch GROUP BY 1
        |), rev AS (
        |  SELECT c.cohort, u.week - c.cohort AS week_offset,
        |    CAST(SUM(u.cents) AS BIGINT) AS cents
        |  FROM uw u JOIN ch c USING (user_id) GROUP BY 1, 2
        |), cum AS (
        |  SELECT cohort, week_offset,
        |    CAST(SUM(cents) OVER (PARTITION BY cohort ORDER BY week_offset
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents
        |  FROM rev
        |)
        |SELECT c.cohort, c.week_offset, s.cohort_users, c.cum_cents
        |FROM cum c JOIN sized s USING (cohort)
        |ORDER BY cohort, week_offset""".stripMargin,
    // DAU/MAU: rolling-30 distinct via window-membership explode (the
    // q127 shape), one ppm division
    "q240_stickiness" ->
      """WITH du AS (
        |  SELECT DISTINCT user_id,
        |    CAST(floor(extract(epoch FROM ts)) AS BIGINT) // 86400 AS day
        |  FROM events
        |), dau AS (
        |  SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM du GROUP BY 1
        |), contrib AS (
        |  SELECT DISTINCT user_id, w_day
        |  FROM du, unnest(generate_series(day, day + 29)) AS t(w_day)
        |), mau AS (
        |  SELECT w_day, CAST(COUNT(*) AS BIGINT) AS mau FROM contrib GROUP BY 1
        |)
        |SELECT d.day, d.dau, m.mau,
        |  CAST(d.dau * 1000000 // m.mau AS BIGINT) AS stickiness_ppm
        |FROM dau d JOIN mau m ON d.day = m.w_day ORDER BY d.day""".stripMargin,
    // log-log demand curve over $20 bands, nano logs into the shared
    // OLS chains (slope = elasticity)
    "q241_price_elasticity" ->
      s"""WITH bands AS (
         |  SELECT CAST(round(value * 100) AS BIGINT) // 2000 AS band,
         |    CAST(COUNT(*) AS BIGINT) AS q
         |  FROM events WHERE event_type = 'purchase' GROUP BY 1
         |), xy AS (
         |  SELECT
         |    CAST(round(ln(CAST(band * 2000 + 1000 AS DOUBLE)) * 1000000) AS BIGINT) AS x,
         |    CAST(round(ln(CAST(q AS DOUBLE)) * 1000000) AS BIGINT) AS y
         |  FROM bands WHERE band >= 0
         |), m AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx,
         |    CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(x * y) AS BIGINT) AS sxy,
         |    CAST(SUM(x * x) AS BIGINT) AS sx2, CAST(SUM(y * y) AS BIGINT) AS sy2
         |  FROM xy
         |)
         |SELECT n, sx, sy, sxy, sx2, sy2,
         |  ${graft.ops.Stats.olsSlopeSql} AS slope_micro,
         |  ${graft.ops.Stats.olsInterceptSql} AS intercept_micro,
         |  ${graft.ops.Stats.olsR2Sql} AS r2_micro
         |FROM m""".stripMargin,
    // new vs returning revenue: first-seen day per user, conditional
    // split per day
    "q242_new_vs_returning" ->
      """WITH e AS (
        |  SELECT user_id, CAST(floor(extract(epoch FROM ts)) AS BIGINT) // 86400 AS day,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events
        |), fd AS (
        |  SELECT user_id, CAST(MIN(day) AS BIGINT) AS first_day FROM e GROUP BY 1
        |), m AS (
        |  SELECT e.day,
        |    CAST(SUM(CASE WHEN e.day = f.first_day THEN 1 ELSE 0 END) AS BIGINT) AS new_events,
        |    CAST(SUM(CASE WHEN e.day = f.first_day THEN e.cents ELSE 0 END) AS BIGINT) AS new_cents,
        |    CAST(SUM(CASE WHEN e.day <> f.first_day THEN e.cents ELSE 0 END) AS BIGINT) AS returning_cents
        |  FROM e JOIN fd f USING (user_id) GROUP BY 1
        |)
        |SELECT day, new_events, new_cents, returning_cents,
        |  CASE WHEN new_cents + returning_cents = 0 THEN NULL
        |   ELSE CAST(new_cents * 1000000 // (new_cents + returning_cents) AS BIGINT) END AS new_share_ppm
        |FROM m ORDER BY day""".stripMargin,
    // first-view -> first-subsequent-purchase lag histogram per
    // (user, item)
    "q243_conversion_lag" ->
      s"""WITH $sessCte, ui AS (
         |  SELECT user_id, item_id, event_type, CAST(MIN(epoch_s) AS BIGINT) AS first_s
         |  FROM enr WHERE event_type IN ('view', 'purchase')
         |  GROUP BY 1, 2, 3
         |), v AS (
         |  SELECT user_id, item_id, first_s AS view_s FROM ui WHERE event_type = 'view'
         |), b AS (
         |  SELECT user_id, item_id, first_s AS buy_s FROM ui WHERE event_type = 'purchase'
         |)
         |SELECT (buy_s - view_s) // 86400 AS lag_days,
         |  CAST(COUNT(*) AS BIGINT) AS n_conversions
         |FROM v JOIN b USING (user_id, item_id)
         |WHERE buy_s >= view_s
         |GROUP BY 1 ORDER BY lag_days""".stripMargin,
    // k-anonymity release gate: class sizes over the QI combination
    "q244_k_anonymity" ->
      """WITH cls AS (
        |  SELECT c_nationkey, c_mktsegment,
        |    CAST(floor(c_acctbal / 500) AS BIGINT) AS band, COUNT(*) AS sz
        |  FROM customer GROUP BY 1, 2, 3
        |)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
        |  CAST(MIN(sz) AS BIGINT) AS min_class_size,
        |  CAST(COALESCE(SUM(CASE WHEN sz < 5 THEN sz END), 0) AS BIGINT) AS rows_below_k,
        |  CAST(COALESCE(SUM(CASE WHEN sz < 5 THEN sz END), 0) * 1000000 // SUM(sz) AS BIGINT)
        |    AS rows_below_k_ppm
        |FROM cls""".stripMargin,
    // l-diversity: distinct sensitive bands within each QI class
    "q245_l_diversity" ->
      """WITH cls AS (
        |  SELECT c_nationkey, c_mktsegment, COUNT(*) AS sz,
        |    COUNT(DISTINCT CAST(floor(c_acctbal / 500) AS BIGINT)) AS ldiv
        |  FROM customer GROUP BY 1, 2
        |)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
        |  CAST(MIN(ldiv) AS BIGINT) AS min_l,
        |  CAST(COALESCE(SUM(CASE WHEN ldiv < 2 THEN 1 END), 0) AS BIGINT) AS classes_below_l,
        |  CAST(COALESCE(SUM(CASE WHEN ldiv < 2 THEN sz END), 0) * 1000000 // SUM(sz) AS BIGINT)
        |    AS rows_below_l_ppm
        |FROM cls""".stripMargin,
    // Holt level/trend as fixed nano coefficient literals over a
    // zero-filled 28-day window (the SES constant-injection pattern)
    "q246_holt_forecast" ->
      s"""WITH daily AS (
         |  SELECT CAST(floor(extract(epoch FROM ts)) AS BIGINT) // 86400 AS day,
         |    CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
         |  FROM events WHERE event_type = 'purchase' GROUP BY 1
         |), tm AS (SELECT MAX(day) AS tmax FROM daily),
         |co(lag_d, cl_nano, ct_nano) AS (VALUES
         |  ${graft.ops.Stats.holtCoeffsNano()
               .map { case (l, cl, ct) => s"($l, $cl, $ct)" }.mkString(", ")}),
         |lagged AS (
         |  SELECT t.tmax - d.day AS lag_d, d.y FROM daily d CROSS JOIN tm t
         |), z AS (
         |  SELECT CAST(SUM(co.cl_nano * COALESCE(l.y, 0)) AS BIGINT) AS level_nano,
         |    CAST(SUM(co.ct_nano * COALESCE(l.y, 0)) AS BIGINT) AS trend_nano
         |  FROM co LEFT JOIN lagged l USING (lag_d)
         |)
         |SELECT CAST(level_nano // 1000 AS BIGINT) AS level_micro,
         |  CAST(trend_nano // 1000 AS BIGINT) AS trend_micro,
         |  CAST((level_nano + 1 * trend_nano) // 1000 AS BIGINT) AS f1_micro,
         |  CAST((level_nano + 7 * trend_nano) // 1000 AS BIGINT) AS f7_micro
         |FROM z""".stripMargin,
    // Flesch reading ease in integer micro units (regexp counts only)
    "q247_flesch" ->
      """WITH b AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(lower(text), '[a-z]+')) AS BIGINT) AS words,
        |    CAST(greatest(1, len(regexp_extract_all(text, '[.!?]+'))) AS BIGINT) AS sentences,
        |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
        |      + len(regexp_extract_all(lower(text), '[a-z]+'))
        |      - len(regexp_extract_all(lower(text), '[a-z]*[aeiouy][a-z]*')) AS BIGINT)
        |      AS syllables
        |  FROM documents
        |)
        |SELECT doc_id, words, sentences, syllables,
        |  CAST(206835000 - (1015000 * words) // sentences
        |    - (84600000 * syllables) // words AS BIGINT) AS flesch_micro
        |FROM b WHERE words > 0 ORDER BY doc_id""".stripMargin,
    // OOV rate vs the deterministic top-1000 corpus vocabulary
    "q248_oov_rate" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        |  FROM documents
        |), vocab AS (
        |  SELECT tok FROM (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok)
        |  ORDER BY c DESC, tok ASC LIMIT 1000
        |)
        |SELECT t.doc_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |  CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
        |  CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT)
        |    AS oov_ppm
        |FROM toks t LEFT JOIN vocab v ON t.tok = v.tok
        |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin,
    // Good-Turing frequency-of-frequencies: 10 rarest occupancy classes
    "q249_good_turing" ->
      """WITH counts AS (
        |  SELECT tok, COUNT(*) AS r FROM (
        |    SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS tok FROM documents
        |  ) GROUP BY tok
        |), total AS (SELECT CAST(SUM(r) AS BIGINT) AS n_total FROM counts),
        |ff AS (
        |  SELECT r, COUNT(*) AS n_terms FROM counts GROUP BY r ORDER BY r ASC LIMIT 10
        |)
        |SELECT CAST(f.r AS BIGINT) AS r, CAST(f.n_terms AS BIGINT) AS n_terms,
        |  CAST(f.r * f.n_terms * 1000000 // t.n_total AS BIGINT) AS mass_ppm
        |FROM ff f CROSS JOIN total t ORDER BY r""".stripMargin,
    // corpus distinct-n diversity over word 1/2/3-grams
    "q250_distinct_n" ->
      """WITH docs AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents
        |), g1 AS (
        |  SELECT array_to_string(toks[i:i], ' ') AS g
        |  FROM docs, unnest(generate_series(1, len(toks))) AS t(i)
        |), g2 AS (
        |  SELECT array_to_string(toks[i:i+1], ' ') AS g
        |  FROM docs, unnest(generate_series(1, len(toks) - 1)) AS t(i)
        |), g3 AS (
        |  SELECT array_to_string(toks[i:i+2], ' ') AS g
        |  FROM docs, unnest(generate_series(1, len(toks) - 2)) AS t(i)
        |), m AS (
        |  SELECT 1 AS n, COUNT(*) AS total_ngrams, COUNT(DISTINCT g) AS distinct_ngrams FROM g1
        |  UNION ALL SELECT 2, COUNT(*), COUNT(DISTINCT g) FROM g2
        |  UNION ALL SELECT 3, COUNT(*), COUNT(DISTINCT g) FROM g3
        |)
        |SELECT CAST(n AS BIGINT) AS n, CAST(total_ngrams AS BIGINT) AS total_ngrams,
        |  CAST(distinct_ngrams AS BIGINT) AS distinct_ngrams,
        |  CAST(distinct_ngrams * 1000000 // total_ngrams AS BIGINT) AS distinct_ppm
        |FROM m ORDER BY n""".stripMargin,
    // exact pairwise source Jaccard over 4-gram shingle sets
    "q251_source_overlap" ->
      """WITH sh AS (
        |  SELECT DISTINCT source, array_to_string(toks[i:i+3], ' ') AS shingle
        |  FROM (SELECT source, regexp_split_to_array(trim(text), '\s+') AS toks
        |        FROM documents) d,
        |    unnest(generate_series(1, len(toks) - 3)) AS t(i)
        |), sizes AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM sh GROUP BY 1
        |), inter AS (
        |  SELECT a.source AS src_a, b.source AS src_b, CAST(COUNT(*) AS BIGINT) AS inter_count
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.source < b.source
        |  GROUP BY 1, 2
        |)
        |SELECT i.src_a, i.src_b, i.inter_count,
        |  CAST(sa.n + sb.n - i.inter_count AS BIGINT) AS union_count,
        |  CAST(i.inter_count * 1000000 // (sa.n + sb.n - i.inter_count) AS BIGINT)
        |    AS jaccard_ppm
        |FROM inter i
        |JOIN sizes sa ON i.src_a = sa.source
        |JOIN sizes sb ON i.src_b = sb.source
        |ORDER BY i.src_a, i.src_b""".stripMargin,
    // median/MAD spike gate on daily purchase revenue (type-1 medians)
    "q252_spike_days" ->
      """WITH daily AS (
        |  SELECT CAST(floor(extract(epoch FROM ts)) AS BIGINT) // 86400 AS day,
        |    CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1
        |), counts AS (
        |  SELECT cents, CAST(COUNT(*) AS BIGINT) AS n FROM daily GROUP BY 1
        |), tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n_total FROM counts),
        |cums AS (
        |  SELECT cents, n, SUM(n) OVER (ORDER BY cents) AS cum_n FROM counts
        |), med AS (
        |  SELECT CAST(MIN(c.cents) AS BIGINT) AS median_cents
        |  FROM cums c CROSS JOIN tot t WHERE c.cum_n >= (t.n_total + 1) // 2
        |), devt AS (
        |  SELECT d.day, d.cents, m.median_cents,
        |    abs(d.cents - m.median_cents) AS dev
        |  FROM daily d CROSS JOIN med m
        |), dcounts AS (
        |  SELECT dev, CAST(COUNT(*) AS BIGINT) AS n FROM devt GROUP BY 1
        |), dtot AS (SELECT CAST(SUM(n) AS BIGINT) AS n_total FROM dcounts),
        |dcums AS (
        |  SELECT dev, n, SUM(n) OVER (ORDER BY dev) AS cum_n FROM dcounts
        |), mad AS (
        |  SELECT CAST(MIN(c.dev) AS BIGINT) AS mad_cents
        |  FROM dcums c CROSS JOIN dtot t WHERE c.cum_n >= (t.n_total + 1) // 2
        |)
        |SELECT v.day, v.cents, v.median_cents, a.mad_cents, CAST(v.dev AS BIGINT) AS dev,
        |  CASE WHEN a.mad_cents > 0
        |    THEN CAST(v.dev * 1000000 // a.mad_cents AS BIGINT) END AS dev_mad_ppm,
        |  CAST(CASE WHEN v.dev * 10000 > 44478 * a.mad_cents THEN 1 ELSE 0 END AS BIGINT)
        |    AS is_spike
        |FROM devt v CROSS JOIN mad a ORDER BY v.day""".stripMargin,
    // Hyndman seasonality strength over the q188 decomposition,
    // milli-quantized exact moments into the shared double chain
    "q253_seasonality_strength" ->
      s"""WITH daily AS (
         |  SELECT CAST(floor(extract(epoch FROM ts)) AS BIGINT) // 86400 AS day,
         |    CAST(COUNT(*) AS BIGINT) AS n_events
         |  FROM events GROUP BY 1
         |), tr AS (
         |  SELECT a.day, a.n_events, COUNT(*) AS n7, CAST(SUM(b.n_events) AS BIGINT) AS sum7
         |  FROM daily a JOIN daily b ON b.day BETWEEN a.day - 3 AND a.day + 3
         |  GROUP BY 1, 2
         |), t2 AS (
         |  SELECT day, n_events, sum7 * 1000000 // 7 AS trend_micro,
         |    n_events * 1000000 - sum7 * 1000000 // 7 AS detr_micro, day % 7 AS dow
         |  FROM tr WHERE n7 = 7
         |), seas AS (
         |  SELECT dow,
         |    (CAST(SUM(detr_micro) AS BIGINT) + CAST(COUNT(*) AS BIGINT) * 1000000000000)
         |      // CAST(COUNT(*) AS BIGINT) - 1000000000000 AS seasonal_micro
         |  FROM t2 GROUP BY 1
         |), dec AS (
         |  SELECT t2.detr_micro // 1000 AS dm,
         |    (t2.detr_micro - seas.seasonal_micro) // 1000 AS rm
         |  FROM t2 JOIN seas USING (dow)
         |), m AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(dm) AS BIGINT) AS sd, CAST(SUM(dm * dm) AS BIGINT) AS sd2,
         |    CAST(SUM(rm) AS BIGINT) AS sr, CAST(SUM(rm * rm) AS BIGINT) AS sr2
         |  FROM dec
         |)
         |SELECT n, sd, sd2, sr, sr2,
         |  ${graft.ops.Stats.seasonalStrengthSql} AS strength_micro
         |FROM m""".stripMargin,
    // centroid-based silhouette: exact int d², one micro-rounded double chain
    "q254_silhouette" ->
      """WITH q AS (
        |  SELECT vec_id, CAST(label AS BIGINT) AS label,
        |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS v
        |  FROM embeddings
        |), ex AS (
        |  SELECT vec_id, label, i AS pos, v[i] AS val
        |  FROM q, unnest(generate_series(1, len(v))) AS t(i)
        |), cm AS (
        |  SELECT label AS c_label, pos,
        |    CAST(floor(CAST(SUM(val) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cv
        |  FROM ex GROUP BY 1, 2
        |), cn AS (
        |  SELECT c_label, CAST(SUM(cv * cv) AS BIGINT) AS c_n2 FROM cm GROUP BY 1
        |), vn AS (
        |  SELECT vec_id, CAST(SUM(val * val) AS BIGINT) AS v_n2 FROM ex GROUP BY 1
        |), dots AS (
        |  SELECT e.vec_id, e.label, c.c_label, CAST(SUM(e.val * c.cv) AS BIGINT) AS dp
        |  FROM ex e JOIN cm c ON e.pos = c.pos GROUP BY 1, 2, 3
        |), d2 AS (
        |  SELECT d.vec_id, d.label, d.c_label,
        |    vn.v_n2 + cn.c_n2 - 2 * d.dp AS dd
        |  FROM dots d JOIN vn USING (vec_id) JOIN cn ON d.c_label = cn.c_label
        |), ab AS (
        |  SELECT vec_id, label,
        |    MIN(CASE WHEN label = c_label THEN dd END) AS a2,
        |    MIN(CASE WHEN label <> c_label THEN dd END) AS b2
        |  FROM d2 GROUP BY 1, 2
        |), sil AS (
        |  SELECT label,
        |    CASE WHEN greatest(a2, b2) = 0 THEN 0
        |      ELSE CAST(round((sqrt(CAST(b2 AS DOUBLE)) - sqrt(CAST(a2 AS DOUBLE)))
        |        / sqrt(CAST(greatest(a2, b2) AS DOUBLE)) * 1000000) AS BIGINT) END AS s_micro
        |  FROM ab
        |)
        |SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vectors,
        |  CAST(CAST(SUM(s_micro) AS BIGINT) // COUNT(*) AS BIGINT) AS mean_sil_micro,
        |  MIN(s_micro) AS min_sil_micro, MAX(s_micro) AS max_sil_micro
        |FROM sil GROUP BY label ORDER BY label""".stripMargin,
    // md5-bucket fold split, per-(fold,label) share of label in ppm
    "q255_stratified_kfold" ->
      """WITH e AS (
        |  SELECT CAST(('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 8)) AS BIGINT) % 5 AS fold,
        |    CAST(label AS BIGINT) AS label
        |  FROM embeddings
        |), t AS (
        |  SELECT label, CAST(COUNT(*) AS BIGINT) AS n_label FROM e GROUP BY 1
        |)
        |SELECT e.fold, e.label, CAST(COUNT(*) AS BIGINT) AS n, t.n_label,
        |  CAST(COUNT(*) * 1000000 // t.n_label AS BIGINT) AS share_ppm
        |FROM e JOIN t USING (label)
        |GROUP BY e.fold, e.label, t.n_label
        |ORDER BY e.fold, e.label""".stripMargin,
    // quantized power iteration, two unrolled steps; HUGEINT widening
    // mirrors the engine's BigInt normalize steps exactly
    "q256_power_iteration" ->
      """WITH q AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS v
        |  FROM embeddings
        |), ex AS (
        |  SELECT vec_id, i - 1 AS pos, v[i] AS val
        |  FROM q, unnest(generate_series(1, len(v))) AS t(i)
        |), m AS (
        |  SELECT pos, CAST(floor(CAST(SUM(val) AS DOUBLE) / COUNT(*)) AS BIGINT) AS mv
        |  FROM ex GROUP BY 1
        |), x AS (
        |  SELECT e.vec_id, e.pos, e.val - m.mv AS xv FROM ex e JOIN m USING (pos)
        |), s1 AS (
        |  SELECT vec_id, CAST(SUM(xv) AS BIGINT) // 64 AS s FROM x GROUP BY 1
        |), y1 AS (
        |  SELECT pos, CAST(SUM(x.xv * s1.s) AS BIGINT) AS y
        |  FROM x JOIN s1 USING (vec_id) GROUP BY 1
        |), n1 AS (
        |  SELECT greatest(MAX(abs(y)), 1) AS ma FROM y1
        |), v1 AS (
        |  SELECT pos, CAST(CAST(y AS HUGEINT) * 1024 // CAST(ma AS HUGEINT) AS BIGINT) AS vv
        |  FROM y1 CROSS JOIN n1
        |), s2 AS (
        |  SELECT x.vec_id, CAST(SUM(x.xv * v1.vv) AS BIGINT) // 64 AS s
        |  FROM x JOIN v1 USING (pos) GROUP BY 1
        |), y2 AS (
        |  SELECT pos, CAST(SUM(x.xv * s2.s) AS BIGINT) AS y
        |  FROM x JOIN s2 USING (vec_id) GROUP BY 1
        |), n2 AS (
        |  SELECT greatest(MAX(abs(y)), 1) AS ma FROM y2
        |), piv AS (
        |  SELECT y FROM y2 CROSS JOIN n2 WHERE abs(y) = ma ORDER BY pos LIMIT 1
        |), sg AS (
        |  SELECT CASE WHEN y < 0 THEN -1 ELSE 1 END AS sgn FROM piv
        |)
        |SELECT CAST(pos AS BIGINT) AS pos,
        |  CAST(CAST(y AS HUGEINT) * sgn * 1000000 // CAST(ma AS HUGEINT) AS BIGINT) AS loading_ppm
        |FROM y2 CROSS JOIN n2 CROSS JOIN sg ORDER BY pos""".stripMargin,
    // split-conformal: md5 mod-3 TRAIN/CALIB/TEST split (centroids fit
    // on train only — fit+calibrate on one set biases scores small and
    // breaks the guarantee), ceil-rank in ppm integer math (capped at
    // n_cal), coverage in ppm
    "q257_conformal_coverage" ->
      """WITH q AS (
        |  SELECT vec_id, CAST(label AS BIGINT) AS label,
        |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS v,
        |    CAST(('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 8)) AS BIGINT) % 3 AS part
        |  FROM embeddings
        |), ex AS (
        |  SELECT vec_id, label, part, i AS pos, v[i] AS val
        |  FROM q, unnest(generate_series(1, len(v))) AS t(i)
        |), cm AS (
        |  SELECT label AS c_label, pos,
        |    CAST(floor(CAST(SUM(val) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cv
        |  FROM ex WHERE part = 0 GROUP BY 1, 2
        |), cn AS (
        |  SELECT c_label, CAST(SUM(cv * cv) AS BIGINT) AS c_n2 FROM cm GROUP BY 1
        |), vn AS (
        |  SELECT vec_id, CAST(SUM(val * val) AS BIGINT) AS v_n2
        |  FROM ex WHERE part <> 0 GROUP BY 1
        |), dots AS (
        |  SELECT e.vec_id, CAST(SUM(e.val * c.cv) AS BIGINT) AS dp
        |  FROM ex e JOIN cm c ON e.pos = c.pos AND e.label = c.c_label
        |  WHERE e.part <> 0 GROUP BY 1
        |), scored AS (
        |  SELECT q.vec_id, (q.part = 1) AS calib,
        |    vn.v_n2 + cn.c_n2 - 2 * d.dp AS score
        |  FROM q JOIN vn USING (vec_id) JOIN dots d USING (vec_id)
        |  JOIN cn ON q.label = cn.c_label
        |  WHERE q.part <> 0
        |), ncal AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_cal FROM scored WHERE calib
        |), counts AS (
        |  SELECT score, CAST(COUNT(*) AS BIGINT) AS c FROM scored WHERE calib GROUP BY 1
        |), cums AS (
        |  SELECT score, SUM(c) OVER (ORDER BY score) AS cum_c FROM counts
        |), k AS (
        |  SELECT least(((n_cal + 1) * 900000 + 999999) // 1000000, n_cal) AS kk, n_cal FROM ncal
        |), qh AS (
        |  SELECT k.n_cal, CAST(MIN(score) AS BIGINT) AS qhat
        |  FROM cums CROSS JOIN k WHERE cum_c >= k.kk GROUP BY k.n_cal
        |)
        |SELECT qh.n_cal, CAST(COUNT(*) AS BIGINT) AS n_test, qh.qhat,
        |  CAST(SUM(CASE WHEN score <= qh.qhat THEN 1 ELSE 0 END) AS BIGINT) AS n_covered,
        |  CAST(CAST(SUM(CASE WHEN score <= qh.qhat THEN 1 ELSE 0 END) AS BIGINT) * 1000000
        |    // COUNT(*) AS BIGINT) AS coverage_ppm
        |FROM scored CROSS JOIN qh WHERE NOT calib GROUP BY qh.n_cal, qh.qhat""".stripMargin,
    // prefix-dim (matryoshka) cosine fidelity on the (id, id+1) chain
    "q258_matryoshka_fidelity" ->
      """WITH q AS (
        |  SELECT vec_id AS id, list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS v
        |  FROM embeddings
        |), pr AS (
        |  SELECT a.id, a.v AS va, b.v AS vb FROM q a JOIN q b ON b.id = a.id + 1
        |), ex AS (
        |  SELECT id, i, va[i] AS xa, vb[i] AS xb
        |  FROM pr, unnest(generate_series(1, len(va))) AS t(i)
        |), sums AS (
        |  SELECT id,
        |    CAST(SUM(xa * xb) AS BIGINT) AS dot_f,
        |    CAST(SUM(xa * xa) AS BIGINT) AS n2a,
        |    CAST(SUM(xb * xb) AS BIGINT) AS n2b,
        |    CAST(SUM(CASE WHEN i <= 32 THEN xa * xb ELSE 0 END) AS BIGINT) AS dot_p,
        |    CAST(SUM(CASE WHEN i <= 32 THEN xa * xa ELSE 0 END) AS BIGINT) AS p2a,
        |    CAST(SUM(CASE WHEN i <= 32 THEN xb * xb ELSE 0 END) AS BIGINT) AS p2b
        |  FROM ex GROUP BY 1
        |), cosed AS (
        |  SELECT
        |    CAST(round(CAST(dot_f AS DOUBLE) / sqrt(CAST(n2a AS DOUBLE)) / sqrt(CAST(n2b AS DOUBLE)) * 1000000) AS BIGINT) AS cf,
        |    CAST(round(CAST(dot_p AS DOUBLE) / sqrt(CAST(p2a AS DOUBLE)) / sqrt(CAST(p2b AS DOUBLE)) * 1000000) AS BIGINT) AS cp
        |  FROM sums WHERE n2a > 0 AND n2b > 0 AND p2a > 0 AND p2b > 0
        |)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |  CAST(CAST(SUM(abs(cf - cp)) AS BIGINT) // COUNT(*) AS BIGINT) AS mean_abs_diff_micro,
        |  CAST(CAST(SUM(CASE WHEN sign(cf) = sign(cp) THEN 1 ELSE 0 END) AS BIGINT) * 1000000
        |    // COUNT(*) AS BIGINT) AS sign_agree_ppm,
        |  CAST(CAST(SUM(cf) AS BIGINT) // COUNT(*) AS BIGINT) AS mean_full_micro,
        |  CAST(CAST(SUM(cp) AS BIGINT) // COUNT(*) AS BIGINT) AS mean_prefix_micro
        |FROM cosed""".stripMargin,
    // multi-touch attribution: 30-min lookback interval join, integer
    // cents / micro-cents credit, (epoch, event_id) total order
    "q259_attribution_credit" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type,
        |    CAST(floor(extract(epoch FROM ts)) AS BIGINT) AS epoch_s, value
        |  FROM events
        |), p AS (
        |  SELECT event_id AS p_id, user_id, epoch_s AS p_s,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM e WHERE event_type = 'purchase'
        |), t AS (
        |  SELECT event_id AS t_id, user_id, event_type AS touch_type, epoch_s AS t_s
        |  FROM e WHERE event_type IN ('view', 'click')
        |), j AS (
        |  SELECT p.p_id, p.cents, t.touch_type, t.t_s, t.t_id,
        |    COUNT(*) OVER (PARTITION BY p.p_id) AS n_touch,
        |    ROW_NUMBER() OVER (PARTITION BY p.p_id ORDER BY t.t_s DESC, t.t_id DESC) AS rn_last,
        |    ROW_NUMBER() OVER (PARTITION BY p.p_id ORDER BY t.t_s ASC, t.t_id ASC) AS rn_first
        |  FROM t JOIN p ON t.user_id = p.user_id
        |    AND t.t_s >= p.p_s - 1800 AND t.t_s <= p.p_s - 1
        |)
        |SELECT touch_type, CAST(COUNT(*) AS BIGINT) AS n_touches,
        |  CAST(SUM(cents * 1000000 // n_touch) AS BIGINT) AS linear_microcents,
        |  CAST(SUM(CASE WHEN rn_first = 1 THEN cents ELSE 0 END) AS BIGINT) AS first_touch_cents,
        |  CAST(SUM(CASE WHEN rn_last = 1 THEN cents ELSE 0 END) AS BIGINT) AS last_touch_cents
        |FROM j GROUP BY touch_type ORDER BY touch_type""".stripMargin,
    // confident-learning-lite: b2 < a2 suspects, (d2, label) lexicographic
    // nearest, symmetric bounded score, deterministic top-50
    "q260_label_noise" ->
      """WITH q AS (
        |  SELECT vec_id, CAST(label AS BIGINT) AS label,
        |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS v
        |  FROM embeddings
        |), ex AS (
        |  SELECT vec_id, label, i AS pos, v[i] AS val
        |  FROM q, unnest(generate_series(1, len(v))) AS t(i)
        |), cm AS (
        |  SELECT label AS c_label, pos,
        |    CAST(floor(CAST(SUM(val) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cv
        |  FROM ex GROUP BY 1, 2
        |), cn AS (
        |  SELECT c_label, CAST(SUM(cv * cv) AS BIGINT) AS c_n2 FROM cm GROUP BY 1
        |), vn AS (
        |  SELECT vec_id, CAST(SUM(val * val) AS BIGINT) AS v_n2 FROM ex GROUP BY 1
        |), dots AS (
        |  SELECT e.vec_id, e.label, c.c_label, CAST(SUM(e.val * c.cv) AS BIGINT) AS dp
        |  FROM ex e JOIN cm c ON e.pos = c.pos GROUP BY 1, 2, 3
        |), d2 AS (
        |  SELECT d.vec_id, d.label, d.c_label,
        |    vn.v_n2 + cn.c_n2 - 2 * d.dp AS dd
        |  FROM dots d JOIN vn USING (vec_id) JOIN cn ON d.c_label = cn.c_label
        |), own AS (
        |  SELECT vec_id, label, dd AS a2 FROM d2 WHERE label = c_label
        |), other AS (
        |  SELECT vec_id, dd AS b2, c_label AS nearest_label
        |  FROM d2 WHERE label <> c_label
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dd, c_label) = 1
        |)
        |SELECT o.vec_id, o.label, o.a2, t.b2, t.nearest_label,
        |  CAST((o.a2 - t.b2) * 1000000 // greatest(o.a2 + t.b2, 1) AS BIGINT) AS noise_ppm
        |FROM own o JOIN other t USING (vec_id)
        |WHERE t.b2 < o.a2
        |ORDER BY noise_ppm DESC, o.vec_id LIMIT 50""".stripMargin,
    // md5-parity split-half centroid drift per label
    "q261_centroid_drift" ->
      """WITH q AS (
        |  SELECT vec_id, CAST(label AS BIGINT) AS label,
        |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS v,
        |    CAST(('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 8)) AS BIGINT) % 2 AS half
        |  FROM embeddings
        |), ex AS (
        |  SELECT label, half, i AS pos, v[i] AS val
        |  FROM q, unnest(generate_series(1, len(v))) AS t(i)
        |), cm AS (
        |  SELECT label, half, pos,
        |    CAST(floor(CAST(SUM(val) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cv,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM ex GROUP BY 1, 2, 3
        |), j AS (
        |  SELECT a.label, a.pos, a.cv AS ca, b.cv AS cb, a.n AS n_a, b.n AS n_b
        |  FROM cm a JOIN cm b ON a.label = b.label AND a.pos = b.pos
        |  WHERE a.half = 0 AND b.half = 1
        |), m AS (
        |  SELECT label, MAX(n_a) AS n_a, MAX(n_b) AS n_b,
        |    CAST(SUM(ca * ca) AS BIGINT) AS n2a,
        |    CAST(SUM(cb * cb) AS BIGINT) AS n2b,
        |    CAST(SUM(ca * cb) AS BIGINT) AS dp
        |  FROM j GROUP BY 1
        |)
        |SELECT label, n_a, n_b,
        |  CAST(n2a + n2b - 2 * dp AS BIGINT) AS d2,
        |  CAST((n2a + n2b - 2 * dp) * 1000000 // greatest(n2a, 1) AS BIGINT) AS shift_ppm,
        |  CASE WHEN n2a > 0 AND n2b > 0 THEN
        |    CAST(round(CAST(dp AS DOUBLE) / sqrt(CAST(n2a AS DOUBLE))
        |      / sqrt(CAST(n2b AS DOUBLE)) * 1000000) AS BIGINT) END AS cos_micro
        |FROM m ORDER BY label""".stripMargin,
    // user profile = interaction-weighted floor-mean of item embeddings
    // (item_id = props.k -> embeddings row k+1), segment = nearest
    // label centroid by lexicographic (d2, label) min
    "q262_user_segments" ->
      """WITH counts AS (
        |  SELECT user_id, TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS item_id,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM events
        |  WHERE TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL
        |  GROUP BY 1, 2
        |), iv AS (
        |  SELECT vec_id - 1 AS item_id, i - 1 AS pos,
        |    CAST(round(CAST(embedding[i] AS DOUBLE) * 10000) AS BIGINT) AS val
        |  FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)
        |), prof AS (
        |  SELECT c.user_id, v.pos,
        |    CAST(floor(CAST(SUM(c.c * v.val) AS DOUBLE) / SUM(c.c)) AS BIGINT) AS pv
        |  FROM counts c JOIN iv v USING (item_id)
        |  GROUP BY 1, 2
        |), pn AS (
        |  SELECT user_id, CAST(SUM(pv * pv) AS BIGINT) AS p_n2 FROM prof GROUP BY 1
        |), cm AS (
        |  SELECT CAST(label AS BIGINT) AS c_label, i - 1 AS pos,
        |    CAST(floor(CAST(SUM(CAST(round(CAST(embedding[i] AS DOUBLE) * 10000) AS BIGINT)) AS DOUBLE)
        |      / COUNT(*)) AS BIGINT) AS cv
        |  FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)
        |  GROUP BY 1, 2
        |), cn AS (
        |  SELECT c_label, CAST(SUM(cv * cv) AS BIGINT) AS c_n2 FROM cm GROUP BY 1
        |), dots AS (
        |  SELECT p.user_id, c.c_label, CAST(SUM(p.pv * c.cv) AS BIGINT) AS dp
        |  FROM prof p JOIN cm c USING (pos) GROUP BY 1, 2
        |), best AS (
        |  SELECT d.user_id, d.c_label AS segment_label,
        |    pn.p_n2 + cn.c_n2 - 2 * d.dp AS dd
        |  FROM dots d JOIN pn USING (user_id) JOIN cn ON d.c_label = cn.c_label
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY d.user_id
        |    ORDER BY pn.p_n2 + cn.c_n2 - 2 * d.dp, d.c_label) = 1
        |)
        |SELECT segment_label, CAST(COUNT(*) AS BIGINT) AS n_users,
        |  CAST(CAST(SUM(dd) AS BIGINT) // COUNT(*) AS BIGINT) AS mean_d2
        |FROM best GROUP BY 1 ORDER BY segment_label""".stripMargin,
    // purge/embargo temporal split: integer 80%-of-range cut + 1-day gap
    "q263_embargo_split" ->
      """WITH e AS (
        |  SELECT event_id, user_id, CAST(floor(extract(epoch FROM ts)) AS BIGINT) AS epoch_s
        |  FROM events
        |), b AS (
        |  SELECT MIN(epoch_s) AS t0, MAX(epoch_s) AS t1 FROM e
        |), s AS (
        |  SELECT e.*, b.t0 + (b.t1 - b.t0) * 8 // 10 AS t_cut FROM e CROSS JOIN b
        |), lab AS (
        |  SELECT CASE WHEN epoch_s <= t_cut THEN 'train'
        |    WHEN epoch_s <= t_cut + 86400 THEN 'embargo' ELSE 'test' END AS split,
        |    user_id, epoch_s
        |  FROM s
        |)
        |SELECT split, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
        |  MIN(epoch_s) AS min_epoch_s, MAX(epoch_s) AS max_epoch_s
        |FROM lab GROUP BY split ORDER BY split""".stripMargin,
    // leave-last-out: last item per user by (ts, event_id) total order
    "q264_leave_last_out" ->
      """WITH e AS (
        |  SELECT event_id, user_id, CAST(floor(extract(epoch FROM ts)) AS BIGINT) AS epoch_s,
        |    TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS item_id
        |  FROM events
        |  WHERE TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL
        |), r AS (
        |  SELECT user_id, item_id, epoch_s,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY epoch_s DESC, event_id DESC) AS rn,
        |    COUNT(*) OVER (PARTITION BY user_id) AS n_items
        |  FROM e
        |)
        |SELECT user_id, item_id AS test_item, epoch_s AS test_epoch_s,
        |  CAST(n_items - 1 AS BIGINT) AS n_train
        |FROM r WHERE rn = 1 AND n_items >= 2 ORDER BY user_id""".stripMargin,
    // implicit-feedback matrix: type weights halved per week of age,
    // integer shift decay (never float exp)
    "q265_implicit_matrix" ->
      """WITH e AS (
        |  SELECT user_id, event_type, CAST(floor(extract(epoch FROM ts)) AS BIGINT) AS epoch_s,
        |    TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS item_id
        |  FROM events
        |  WHERE TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL
        |    AND event_type IN ('view', 'click', 'purchase')
        |), m AS (
        |  SELECT MAX(epoch_s) AS t_max FROM e
        |), w AS (
        |  SELECT e.user_id, e.item_id,
        |    (CASE e.event_type WHEN 'purchase' THEN 10 WHEN 'click' THEN 3 ELSE 1 END)
        |      * 1000000 // (1 << CAST(least((m.t_max - e.epoch_s) // 604800, 30) AS INTEGER)) AS w_micro
        |  FROM e CROSS JOIN m
        |)
        |SELECT user_id, item_id, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(SUM(w_micro) AS BIGINT) AS score_micro
        |FROM w GROUP BY 1, 2 ORDER BY user_id, item_id""".stripMargin,
    // symmetric int8 quantization: c = round(v*127/m), exact-int error
    // ppm, IEEE-deterministic cosine chain micro-rounded
    "q266_int8_quant" ->
      """WITH q AS (
        |  SELECT vec_id, CAST(label AS BIGINT) AS label,
        |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS v
        |  FROM embeddings
        |), mm AS (
        |  SELECT vec_id, label, v, list_max(list_transform(v, x -> abs(x))) AS m FROM q
        |), ex AS (
        |  SELECT vec_id, label, m, v[i] AS val,
        |    CAST(round(CAST(v[i] AS DOUBLE) * 127 / m) AS BIGINT) AS c
        |  FROM mm, unnest(generate_series(1, len(v))) AS t(i)
        |  WHERE m > 0
        |), per AS (
        |  SELECT vec_id, label,
        |    CAST(MAX(abs(val * 127 - c * m) * 1000000 // (m * 127)) AS BIGINT) AS max_err_ppm,
        |    CAST(SUM(c * val) AS BIGINT) AS dp,
        |    CAST(SUM(c * c) AS BIGINT) AS n2c,
        |    CAST(SUM(val * val) AS BIGINT) AS n2v
        |  FROM ex GROUP BY 1, 2
        |), sc AS (
        |  SELECT label, max_err_ppm,
        |    CAST(round(CAST(dp AS DOUBLE) / sqrt(CAST(n2c AS DOUBLE))
        |      / sqrt(CAST(n2v AS DOUBLE)) * 1000000) AS BIGINT) AS cos_micro
        |  FROM per
        |)
        |SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vectors,
        |  CAST(CAST(SUM(max_err_ppm) AS BIGINT) // COUNT(*) AS BIGINT) AS mean_err_ppm,
        |  MAX(max_err_ppm) AS max_err_ppm,
        |  CAST(CAST(SUM(cos_micro) AS BIGINT) // COUNT(*) AS BIGINT) AS mean_cos_micro,
        |  MIN(cos_micro) AS min_cos_micro
        |FROM sc GROUP BY label ORDER BY label""".stripMargin,
    // temperature-tempered (tau=0.5, w=floor(sqrt(n))) largest-remainder
    // apportionment of a 1M-token budget; sum(alloc) == budget exactly
    "q267_token_allocation" ->
      """WITH src AS (
        |  SELECT source, CAST(SUM(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY 1
        |), w AS (
        |  SELECT source, n_tokens,
        |    CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS weight
        |  FROM src
        |), t AS (
        |  SELECT CAST(SUM(weight) AS BIGINT) AS sum_w FROM w
        |), b AS (
        |  SELECT w.source, w.n_tokens, w.weight, t.sum_w,
        |    1000000 * weight // sum_w AS base_alloc,
        |    1000000 * weight % sum_w AS rem
        |  FROM w CROSS JOIN t
        |), lo AS (
        |  SELECT 1000000 - CAST(SUM(base_alloc) AS BIGINT) AS leftover FROM b
        |), a AS (
        |  SELECT b.source, b.n_tokens, b.weight, b.sum_w, b.base_alloc,
        |    COUNT(c.source) AS n_ahead
        |  FROM b LEFT JOIN b c
        |    ON c.rem > b.rem OR (c.rem = b.rem AND c.source < b.source)
        |  GROUP BY 1, 2, 3, 4, 5
        |)
        |SELECT source, n_tokens, weight,
        |  CAST(weight * 1000000 // sum_w AS BIGINT) AS share_ppm,
        |  CAST(base_alloc + CASE WHEN n_ahead < lo.leftover THEN 1 ELSE 0 END AS BIGINT) AS alloc_tokens
        |FROM a CROSS JOIN lo
        |ORDER BY source""".stripMargin,
    "q268_coverage_select" -> coverageSelectSql(5),
    "q269_kcenter_coreset" -> kcenterSql(4),
    "q270_mutual_knn" -> mutualKnnSql,
    "q271_hard_negatives_lsh" -> hardNegativesLshSql,
    // tail vocabulary (bottom-5 tokens by corpus freq) share per doc
    "q272_rare_token_docs" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok FROM documents
        |), rare AS (
        |  SELECT tok FROM (
        |    SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok
        |    ORDER BY c, tok LIMIT 5)
        |), nr AS (
        |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_rare
        |  FROM toks WHERE tok IN (SELECT tok FROM rare) GROUP BY 1
        |), nt AS (
        |  SELECT doc_id, CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens
        |  FROM documents
        |)
        |SELECT nr.doc_id, nt.n_tokens, nr.n_rare,
        |  CAST(nr.n_rare * 1000000 // nt.n_tokens AS BIGINT) AS rare_ppm
        |FROM nr JOIN nt USING (doc_id)
        |ORDER BY rare_ppm DESC, nr.doc_id LIMIT 20""".stripMargin,
    // t-closeness: ppm-quantized cumulative EMD per QI class vs global
    "q273_t_closeness" ->
      """WITH cv AS (
        |  SELECT c_nationkey, c_mktsegment,
        |    CAST(floor(c_acctbal / 500) AS BIGINT) AS sv, CAST(COUNT(*) AS BIGINT) AS pc
        |  FROM customer GROUP BY 1, 2, 3
        |), gv AS (
        |  SELECT sv, CAST(SUM(pc) AS BIGINT) AS qc FROM cv GROUP BY 1
        |), tot AS (
        |  SELECT CAST(SUM(qc) AS BIGINT) AS n_total, CAST(COUNT(*) AS BIGINT) AS m_values FROM gv
        |), cls AS (
        |  SELECT c_nationkey, c_mktsegment, CAST(SUM(pc) AS BIGINT) AS nc FROM cv GROUP BY 1, 2
        |), grid AS (
        |  SELECT cls.c_nationkey, cls.c_mktsegment, cls.nc, gv.sv, gv.qc,
        |    COALESCE(cv.pc, 0) AS pc
        |  FROM cls CROSS JOIN gv
        |  LEFT JOIN cv ON cv.c_nationkey = cls.c_nationkey
        |    AND cv.c_mktsegment = cls.c_mktsegment AND cv.sv = gv.sv
        |), cum AS (
        |  SELECT c_nationkey, c_mktsegment, nc,
        |    CAST(SUM(pc) OVER (PARTITION BY c_nationkey, c_mktsegment
        |      ORDER BY sv ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pcum,
        |    CAST(SUM(qc) OVER (PARTITION BY c_nationkey, c_mktsegment
        |      ORDER BY sv ROWS UNBOUNDED PRECEDING) AS BIGINT) AS qcum
        |  FROM grid
        |), terms AS (
        |  SELECT c_nationkey, c_mktsegment, nc,
        |    abs(pcum * 1000000 // nc - qcum * 1000000 // n_total) AS term
        |  FROM cum CROSS JOIN tot
        |), per AS (
        |  SELECT c_nationkey, c_mktsegment, MAX(nc) AS nc,
        |    CAST(SUM(term) AS BIGINT)
        |      // greatest((SELECT m_values FROM tot) - 1, 1) AS emd_ppm
        |  FROM terms GROUP BY 1, 2
        |)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
        |  (SELECT m_values FROM tot) AS n_values,
        |  CAST(MAX(emd_ppm) AS BIGINT) AS max_emd_ppm,
        |  CAST(COALESCE(SUM(CASE WHEN emd_ppm > 200000 THEN 1 END), 0) AS BIGINT) AS classes_above_t,
        |  CAST(COALESCE(SUM(CASE WHEN emd_ppm > 200000 THEN nc END), 0) * 1000000
        |    // (SELECT n_total FROM tot) AS BIGINT) AS rows_above_t_ppm
        |FROM per""".stripMargin,
    // embedding one-way ANOVA: WSS/BSS/TSS around floor-int centroids
    "q274_embedding_anova" ->
      """WITH q AS (
        |  SELECT vec_id, CAST(label AS BIGINT) AS label,
        |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS v
        |  FROM embeddings
        |), ex AS (
        |  SELECT vec_id, label, i AS pos, v[i] AS val
        |  FROM q, unnest(generate_series(1, len(v))) AS t(i)
        |), cm AS (
        |  SELECT label, pos, CAST(floor(CAST(SUM(val) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cv
        |  FROM ex GROUP BY 1, 2
        |), cn AS (
        |  SELECT label, CAST(SUM(cv * cv) AS BIGINT) AS c_n2 FROM cm GROUP BY 1
        |), nl AS (
        |  SELECT label, CAST(COUNT(*) AS BIGINT) AS n FROM q GROUP BY 1
        |), gm AS (
        |  SELECT pos, CAST(floor(CAST(SUM(val) AS DOUBLE) / COUNT(*)) AS BIGINT) AS gv
        |  FROM ex GROUP BY 1
        |), gn AS (
        |  SELECT CAST(SUM(gv * gv) AS BIGINT) AS g_n2 FROM gm
        |), vn AS (
        |  SELECT vec_id, label, CAST(SUM(val * val) AS BIGINT) AS v_n2 FROM ex GROUP BY 1, 2
        |), dvc AS (
        |  SELECT e.vec_id, CAST(SUM(e.val * c.cv) AS BIGINT) AS dp
        |  FROM ex e JOIN cm c ON e.label = c.label AND e.pos = c.pos GROUP BY 1
        |), dvg AS (
        |  SELECT e.vec_id, CAST(SUM(e.val * g.gv) AS BIGINT) AS dp
        |  FROM ex e JOIN gm g ON e.pos = g.pos GROUP BY 1
        |), wt AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors,
        |    CAST(SUM(vn.v_n2 + cn.c_n2 - 2 * dvc.dp) AS BIGINT) AS wss,
        |    CAST(SUM(vn.v_n2 + gn.g_n2 - 2 * dvg.dp) AS BIGINT) AS tss
        |  FROM vn JOIN cn ON vn.label = cn.label
        |    JOIN dvc ON vn.vec_id = dvc.vec_id
        |    JOIN dvg ON vn.vec_id = dvg.vec_id
        |    CROSS JOIN gn
        |), dcg AS (
        |  SELECT c.label, CAST(SUM(c.cv * g.gv) AS BIGINT) AS dp
        |  FROM cm c JOIN gm g ON c.pos = g.pos GROUP BY 1
        |), bt AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_labels,
        |    CAST(SUM(nl.n * (cn.c_n2 + gn.g_n2 - 2 * dcg.dp)) AS BIGINT) AS bss
        |  FROM nl JOIN cn USING (label) JOIN dcg USING (label) CROSS JOIN gn
        |)
        |SELECT wt.n_vectors, bt.n_labels, wt.wss, bt.bss, wt.tss,
        |  CAST(bt.bss * 1000000 // wt.tss AS BIGINT) AS r2_micro
        |FROM wt CROSS JOIN bt""".stripMargin,
    // range-paced curriculum: epoch = ceil(d_ppm·E) in exact ppm ints
    "q275_curriculum" ->
      """WITH diff AS (
        |  SELECT doc_id,
        |    CAST(floor(length(regexp_replace(trim(text), '\s+', '', 'g')) * 1000
        |      / len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS d_milli
        |  FROM documents
        |), r AS (
        |  SELECT MIN(d_milli) AS d_min, MAX(d_milli) AS d_max FROM diff
        |), e AS (
        |  SELECT doc_id, d_milli,
        |    greatest(1, (((d_milli - d_min) * 1000000 // greatest(d_max - d_min, 1))
        |      * 5 + 999999) // 1000000) AS epoch
        |  FROM diff CROSS JOIN r
        |), per AS (
        |  SELECT epoch, CAST(COUNT(*) AS BIGINT) AS n_new,
        |    CAST(CAST(SUM(d_milli) AS BIGINT) // COUNT(*) AS BIGINT) AS mean_diff_milli
        |  FROM e GROUP BY 1
        |)
        |SELECT a.epoch, a.n_new, CAST(SUM(b.n_new) AS BIGINT) AS n_cum, a.mean_diff_milli
        |FROM per a JOIN per b ON b.epoch <= a.epoch
        |GROUP BY 1, 2, 4
        |ORDER BY a.epoch""".stripMargin,
    "q276_semantic_decontam" -> semanticDecontamSql,
    "q277_knn_outliers" -> knnOutliersSql,
    // per-source exact-dedup token ledger (global min-id survivor rule)
    "q278_dedup_by_source" ->
      """WITH docs AS (
        |  SELECT doc_id, source,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS nt,
        |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        |  FROM documents
        |), surv AS (
        |  SELECT MIN(doc_id) AS survivor_id FROM docs GROUP BY fp
        |), a AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(nt) AS BIGINT) AS n_tokens
        |  FROM docs GROUP BY 1
        |), k AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_kept_docs,
        |    CAST(SUM(nt) AS BIGINT) AS kept_tokens
        |  FROM docs WHERE doc_id IN (SELECT survivor_id FROM surv)
        |  GROUP BY 1
        |)
        |SELECT a.source, a.n_docs, a.n_tokens,
        |  COALESCE(k.n_kept_docs, 0) AS n_kept_docs,
        |  COALESCE(k.kept_tokens, 0) AS kept_tokens,
        |  CAST((a.n_tokens - COALESCE(k.kept_tokens, 0)) * 1000000 // a.n_tokens AS BIGINT)
        |    AS removed_ppm
        |FROM a LEFT JOIN k USING (source)
        |ORDER BY a.source""".stripMargin,
    "q279_blocking_quality" -> blockingQualitySql,
    "q280_ivf_recall" -> ivfRecallSql,
    "q281_naive_bayes" ->
      """WITH toks AS (
        |  SELECT doc_id, lang, unnest(regexp_split_to_array(trim(text), '\s+')) AS term
        |  FROM documents
        |), tf AS (
        |  SELECT doc_id, lang, term, CAST(COUNT(*) AS BIGINT) AS tf
        |  FROM toks GROUP BY doc_id, lang, term
        |), cls AS (
        |  SELECT lang AS c, CAST(SUM(tf) AS BIGINT) AS tot FROM tf GROUP BY 1
        |), vocab AS (
        |  SELECT CAST(COUNT(DISTINCT term) AS BIGINT) AS v FROM tf
        |), ct AS (
        |  SELECT lang AS c, term, CAST(SUM(tf) AS BIGINT) AS cnt FROM tf GROUP BY 1, 2
        |), w AS (
        |  SELECT ct.c, ct.term,
        |    CAST(round(-ln((ct.cnt + 1.0) / (cls.tot + vocab.v)) * 1000000) AS BIGINT) AS nll_micro
        |  FROM ct JOIN cls ON ct.c = cls.c CROSS JOIN vocab
        |), w0 AS (
        |  SELECT cls.c,
        |    CAST(round(-ln(1.0 / (cls.tot + vocab.v)) * 1000000) AS BIGINT) AS nll0_micro
        |  FROM cls CROSS JOIN vocab
        |), scored AS (
        |  SELECT tf.doc_id, tf.lang, w0.c AS c,
        |    SUM(tf.tf * COALESCE(w.nll_micro, w0.nll0_micro)) AS nll
        |  FROM tf CROSS JOIN w0 LEFT JOIN w ON w.c = w0.c AND w.term = tf.term
        |  GROUP BY 1, 2, 3
        |), pred AS (
        |  SELECT doc_id, lang, c,
        |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY nll ASC, c ASC) AS rn
        |  FROM scored
        |)
        |SELECT lang AS label, c AS pred_label, CAST(COUNT(*) AS BIGINT) AS n_docs
        |FROM pred WHERE rn = 1 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q282_frame_neardup" ->
      """WITH s AS (
        |  SELECT doc_id, regexp_replace(text, '[^ -~]', '', 'g') AS t FROM documents
        |), mx AS (
        |  SELECT CAST(MAX(length(t)) // 32 AS BIGINT) AS mf FROM s
        |), fr AS (
        |  SELECT DISTINCT doc_id,
        |    CAST(('0x' || substring(md5(substring(t, CAST(f * 32 + 1 AS INT), 32)), 1, 15)) AS BIGINT) AS fp
        |  FROM s CROSS JOIN (SELECT unnest(generate_series(0, (SELECT mf FROM mx) - 1)) AS f)
        |  WHERE f < length(t) // 32
        |), dfp AS (
        |  SELECT fp FROM (SELECT fp, COUNT(*) AS df FROM fr GROUP BY 1) WHERE df BETWEEN 2 AND 20
        |), rare AS (
        |  SELECT doc_id, fp FROM fr JOIN dfp USING (fp)
        |), perdoc AS (
        |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_rare FROM rare GROUP BY 1
        |), pairs AS (
        |  SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, CAST(COUNT(*) AS BIGINT) AS shared_frames
        |  FROM rare a JOIN rare b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |), top AS (
        |  SELECT * FROM pairs ORDER BY shared_frames DESC, doc_id_a, doc_id_b LIMIT 10
        |)
        |SELECT t.doc_id_a, t.doc_id_b, t.shared_frames,
        |  CAST(t.shared_frames * 1000000 // least(pa.n_rare, pb.n_rare) AS BIGINT) AS overlap_ppm
        |FROM top t
        |JOIN perdoc pa ON pa.doc_id = t.doc_id_a
        |JOIN perdoc pb ON pb.doc_id = t.doc_id_b
        |ORDER BY t.shared_frames DESC, t.doc_id_a, t.doc_id_b""".stripMargin,
    "q283_url_canonical" ->
      """WITH raw AS (
        |  SELECT doc_id, source,
        |    CASE CAST((doc_id // 60) % 4 AS INT)
        |      WHEN 0 THEN 'https://WWW.' || source || '.example.com/p/' ||
        |        CAST(doc_id % 10 AS VARCHAR) || '/?utm_source=feed&id=' || CAST(doc_id % 3 AS VARCHAR)
        |      WHEN 1 THEN 'https://www.' || source || '.example.com/p/' ||
        |        CAST(doc_id % 10 AS VARCHAR) || '?id=' || CAST(doc_id % 3 AS VARCHAR) || '&utm_campaign=x#frag'
        |      WHEN 2 THEN 'HTTPS://' || source || '.EXAMPLE.com/p/' ||
        |        CAST(doc_id % 10 AS VARCHAR) || '/?id=' || CAST(doc_id % 3 AS VARCHAR) || '&gclid=abc123'
        |      ELSE 'https://' || source || '.example.com/p/' ||
        |        CAST(doc_id % 10 AS VARCHAR) || '?id=' || CAST(doc_id % 3 AS VARCHAR)
        |    END AS url
        |  FROM documents
        |), c1 AS (
        |  SELECT doc_id, url, regexp_replace(url, '#.*$', '') AS nofrag FROM raw
        |), c2 AS (
        |  SELECT doc_id, url,
        |    CASE WHEN regexp_matches(nofrag, '^[^/?#]*//')
        |      THEN regexp_replace(
        |        lower(regexp_extract(nofrag, '^([^/?#]*//[^/?#]*)', 1)), '://www\.', '://')
        |        || regexp_extract(nofrag, '^[^/?#]*//[^/?#]*(.*)$', 1)
        |      ELSE nofrag END AS u
        |  FROM c1
        |), c3 AS (
        |  SELECT doc_id, url,
        |    regexp_replace(u, '([?&])((utm_[a-zA-Z]+|fbclid|gclid)=[^&]*(&|$))+', '\1', 'g') AS u
        |  FROM c2
        |), c4 AS (
        |  SELECT doc_id, url,
        |    regexp_replace(regexp_replace(u, '\?&', '?', 'g'), '[?&]+$', '', 'g') AS u
        |  FROM c3
        |), canon AS (
        |  SELECT doc_id, url, regexp_replace(u, '/+(\?|$)', '\1', 'g') AS canonical_url FROM c4
        |)
        |SELECT canonical_url,
        |  CAST(COUNT(*) AS BIGINT) AS n_variants,
        |  CAST(COUNT(DISTINCT url) AS BIGINT) AS n_distinct_raw,
        |  MIN(doc_id) AS survivor_id
        |FROM canon GROUP BY 1
        |ORDER BY n_variants DESC, canonical_url""".stripMargin,
    "q284_tokenizer_fertility" ->
      """WITH per AS (
        |  SELECT lang,
        |    CAST(length(text) AS BIGINT) AS chars,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS ws,
        |    CAST(len(regexp_extract_all(lower(text), '''[a-z]+|[a-z]+|[0-9]+|[^a-z0-9\s]+')) AS BIGINT) AS bpe
        |  FROM documents
        |)
        |SELECT lang,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(chars) AS BIGINT) AS n_chars,
        |  CAST(SUM(ws) AS BIGINT) AS n_ws_tokens,
        |  CAST(SUM(bpe) AS BIGINT) AS n_bpe_tokens,
        |  CAST(CAST(SUM(bpe) AS BIGINT) * 1000000 // CAST(SUM(ws) AS BIGINT) AS BIGINT) AS fertility_ppm,
        |  CAST(CAST(SUM(chars) AS BIGINT) * 1000000 // CAST(SUM(bpe) AS BIGINT) AS BIGINT) AS chars_per_bpe_ppm
        |FROM per GROUP BY 1 ORDER BY 1""".stripMargin,
    "q285_record_linkage" ->
      """WITH cust AS (
        |  SELECT c_custkey, c_nationkey, c_mktsegment,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS cents
        |  FROM customer
        |), b AS (
        |  SELECT c_custkey AS b_id, c_nationkey AS nation, c_mktsegment AS b_seg,
        |    (cents + 1000000) // 10000 * 10000 - 1000000 AS b_cents
        |  FROM cust WHERE c_custkey % 3 = 0
        |), scored AS (
        |  SELECT a.c_custkey AS a_id, b.b_id, b.nation,
        |    (CASE WHEN a.c_mktsegment = b.b_seg THEN 1558145 ELSE -2772589 END) +
        |    (CASE WHEN abs(a.cents - b.b_cents) < 10000 THEN 3891820 ELSE -3891820 END) AS score_micro
        |  FROM cust a JOIN b ON a.c_nationkey = b.nation
        |), best AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY b_id ORDER BY score_micro DESC, a_id ASC) AS rn
        |  FROM scored
        |)
        |SELECT nation, CAST(score_micro AS BIGINT) AS score_micro,
        |  CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |  CAST(SUM(CASE WHEN a_id = b_id THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
        |FROM best WHERE rn = 1 GROUP BY 1, 2
        |ORDER BY nation, score_micro DESC""".stripMargin,
    "q286_fd_violations" ->
      s"""WITH f AS (
         |  ${fdAuditSql("documents.source->lang", "documents", "source", "lang")}
         |  UNION ALL
         |  ${fdAuditSql("documents.lang->source", "documents", "lang", "source")}
         |  UNION ALL
         |  ${fdAuditSql("customer.nation->segment", "customer", "c_nationkey", "c_mktsegment")}
         |)
         |SELECT fd, n_rows, n_lhs, n_majority,
         |  CAST((n_rows - n_majority) * 1000000 // n_rows AS BIGINT) AS violation_ppm
         |FROM f ORDER BY fd""".stripMargin,
    "q287_modularity" ->
      s"""WITH $sessCte, $covisPairsCte, und AS (
         |  SELECT item_a AS src, item_b AS dst FROM pairs
         |  UNION ALL
         |  SELECT item_b AS src, item_a AS dst FROM pairs
         |), l0 AS (
         |  SELECT DISTINCT src AS id, src AS label FROM und
         |), ${lpaRoundsSql(4)},
         |mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM pairs),
         |deg AS (SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS deg FROM und GROUP BY 1),
         |dsum AS (
         |  SELECT l.label AS community, CAST(SUM(d.deg) AS BIGINT) AS degree_sum,
         |    CAST(COUNT(*) AS BIGINT) AS n_nodes
         |  FROM l4 l JOIN deg d ON l.id = d.id GROUP BY 1
         |), intra AS (
         |  SELECT la.label AS community, CAST(COUNT(*) AS BIGINT) AS intra_edges
         |  FROM pairs p JOIN l4 la ON p.item_a = la.id JOIN l4 lb ON p.item_b = lb.id
         |  WHERE la.label = lb.label GROUP BY 1
         |)
         |SELECT ds.community, ds.n_nodes,
         |  COALESCE(i.intra_edges, CAST(0 AS BIGINT)) AS intra_edges,
         |  ds.degree_sum,
         |  CAST((4 * mm.m * COALESCE(i.intra_edges, CAST(0 AS BIGINT))
         |        - ds.degree_sum * ds.degree_sum) * 1000000
         |    // (4 * mm.m * mm.m) AS BIGINT) AS contrib_ppm
         |FROM dsum ds LEFT JOIN intra i USING (community) CROSS JOIN mm
         |ORDER BY ds.community""".stripMargin,
    "q288_bpe_compression" ->
      s"""WITH w0 AS (
         |  SELECT w, COUNT(*) AS wc FROM (
         |    SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS w FROM documents)
         |  WHERE length(w) >= 2 GROUP BY w
         |), s0 AS (
         |  SELECT w, wc,
         |    ' ' || array_to_string(list_transform(generate_series(1, length(w)), i -> w[i]), '  ') || ' ' AS seq
         |  FROM w0
         |), ${bpeEncodeRoundCte(1)}, ${bpeEncodeRoundCte(2)}, ${bpeEncodeRoundCte(3)}, ${bpeEncodeRoundCte(4)},
         |enc AS (
         |  SELECT w, CAST(len(string_split(trim(seq), '  ')) AS BIGINT) AS n_symbols FROM s4
         |), toks AS (
         |  SELECT lang, unnest(regexp_split_to_array(trim(text), '\\s+')) AS w FROM documents
         |)
         |SELECT t.lang,
         |  CAST(COUNT(*) AS BIGINT) AS n_tokens,
         |  CAST(SUM(length(t.w)) AS BIGINT) AS n_chars,
         |  CAST(SUM(COALESCE(e.n_symbols, 1)) AS BIGINT) AS n_symbols,
         |  CAST(CAST(SUM(COALESCE(e.n_symbols, 1)) AS BIGINT) * 1000000
         |    // CAST(SUM(length(t.w)) AS BIGINT) AS BIGINT) AS compression_ppm
         |FROM toks t LEFT JOIN enc e USING (w)
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q289_column_mi" ->
      s"""WITH ${miPairSql(1, "customer.nation~segment", "customer", "c_nationkey", "c_mktsegment")},
         |${miPairSql(2, "documents.source~lang", "documents", "source", "lang")}
         |SELECT * FROM out1
         |UNION ALL SELECT * FROM out2
         |ORDER BY pair""".stripMargin,
    "q290_dataset_card" ->
      """WITH base AS (
        |  SELECT lang, source,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS nt,
        |    CAST(length(text) AS BIGINT) AS nc,
        |    md5(text) AS fp
        |  FROM documents
        |), core AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(nt) AS BIGINT) AS n_tokens,
        |    CAST(SUM(nc) AS BIGINT) AS n_chars,
        |    CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_distinct_texts,
        |    CAST(SUM(CASE WHEN nt < 16 THEN 1 ELSE 0 END) AS BIGINT) AS n_short
        |  FROM base
        |), vocab AS (
        |  SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS v FROM (
        |    SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS w FROM documents)
        |), src AS (
        |  SELECT CAST(MAX(c) AS BIGINT) AS mx, CAST(SUM(c) AS BIGINT) AS tot
        |  FROM (SELECT source, COUNT(*) AS c FROM base GROUP BY 1)
        |), lc AS (
        |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS ni FROM base GROUP BY 1
        |), lt AS (SELECT CAST(SUM(ni) AS BIGINT) AS n FROM lc),
        |ent AS (
        |  SELECT CAST(SUM(CAST(round(CAST(ni AS DOUBLE) / CAST(n AS DOUBLE)
        |    * ln(CAST(n AS DOUBLE) / CAST(ni AS DOUBLE)) * 1000000) AS BIGINT)) AS BIGINT) AS e
        |  FROM lc CROSS JOIN lt
        |)
        |SELECT metric, CAST(value AS BIGINT) AS value FROM (
        |  SELECT 'exact_dup_ppm' AS metric,
        |    (n_docs - n_distinct_texts) * 1000000 // n_docs AS value FROM core
        |  UNION ALL SELECT 'lang_entropy_micro', e FROM ent
        |  UNION ALL SELECT 'mean_tokens_ppm', n_tokens * 1000000 // n_docs FROM core
        |  UNION ALL SELECT 'n_chars', n_chars FROM core
        |  UNION ALL SELECT 'n_distinct_tokens', v FROM vocab
        |  UNION ALL SELECT 'n_docs', n_docs FROM core
        |  UNION ALL SELECT 'n_tokens', n_tokens FROM core
        |  UNION ALL SELECT 'short_doc_ppm', n_short * 1000000 // n_docs FROM core
        |  UNION ALL SELECT 'top_source_share_ppm', mx * 1000000 // tot FROM src
        |) ORDER BY metric""".stripMargin,
    "q291_weighted_negatives" ->
      s"""WITH $sessCte,
         |pop AS (
         |  SELECT item_id, CAST(round(pow(COUNT(*), 0.75) * 1000000) AS BIGINT) AS w
         |  FROM enr GROUP BY 1
         |), cum AS (
         |  SELECT item_id, w,
         |    CAST(SUM(w) OVER (ORDER BY item_id ROWS UNBOUNDED PRECEDING) - w AS BIGINT) AS lo,
         |    CAST(SUM(w) OVER (ORDER BY item_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS hi
         |  FROM pop
         |), tot AS (SELECT CAST(MAX(hi) AS BIGINT) AS tot FROM cum),
         |draws AS (
         |  SELECT u.user_id, CAST(g.draw_idx AS BIGINT) AS draw_idx,
         |    CAST(('0x' || substring(md5(CAST(u.user_id AS VARCHAR) || '|' ||
         |      CAST(g.draw_idx AS VARCHAR)), 1, 15)) AS BIGINT) % tot.tot AS r
         |  FROM (SELECT DISTINCT user_id FROM enr WHERE user_id < 32) u
         |  CROSS JOIN (SELECT unnest(generate_series(1, 3)) AS draw_idx) g
         |  CROSS JOIN tot
         |), seen AS (SELECT DISTINCT user_id, item_id FROM enr),
         |picked AS (
         |  SELECT d.user_id, d.draw_idx, c.item_id AS neg_item, c.w
         |  FROM draws d JOIN cum c ON d.r >= c.lo AND d.r < c.hi
         |)
         |SELECT p.user_id, p.draw_idx, p.neg_item, p.w
         |FROM picked p ANTI JOIN seen s ON p.user_id = s.user_id AND p.neg_item = s.item_id
         |ORDER BY p.user_id, p.draw_idx""".stripMargin,
    "q292_f1_threshold" ->
      """WITH counts AS (
        |  SELECT CAST(round(value * 100) AS BIGINT) AS cents,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_pos_c,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END) AS BIGINT) AS n_neg_c
        |  FROM events GROUP BY 1
        |), cums AS (
        |  SELECT cents,
        |    CAST(SUM(n_pos_c) OVER (ORDER BY cents DESC ROWS UNBOUNDED PRECEDING) AS BIGINT) AS tp,
        |    CAST(SUM(n_neg_c) OVER (ORDER BY cents DESC ROWS UNBOUNDED PRECEDING) AS BIGINT) AS fp
        |  FROM counts
        |), tot AS (SELECT CAST(SUM(n_pos_c) AS BIGINT) AS n_pos FROM counts)
        |SELECT cents AS threshold_cents, tp, fp,
        |  CAST(n_pos - tp AS BIGINT) AS fn,
        |  CAST(tp * 1000000 // (tp + fp) AS BIGINT) AS precision_ppm,
        |  CAST(tp * 1000000 // n_pos AS BIGINT) AS recall_ppm,
        |  CAST(2 * tp * 1000000 // (2 * tp + fp + (n_pos - tp)) AS BIGINT) AS f1_ppm
        |FROM cums CROSS JOIN tot
        |ORDER BY f1_ppm DESC, threshold_cents ASC LIMIT 5""".stripMargin,
    "q293_isotropy" ->
      """WITH q AS (
        |  SELECT vec_id,
        |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS q
        |  FROM embeddings
        |), un AS (
        |  SELECT vec_id,
        |    list_transform(q, x -> CAST(round(CAST(x AS DOUBLE) * 10000.0 /
        |      sqrt(CAST(list_sum(list_transform(q, y -> y * y)) AS DOUBLE))) AS BIGINT)) AS u
        |  FROM q
        |  WHERE list_sum(list_transform(q, y -> y * y)) > 0
        |), norms AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(list_sum(list_transform(u, x -> x * x))) AS BIGINT) AS sum_norm2
        |  FROM un
        |), dims AS (
        |  SELECT i AS dim, CAST(SUM(u[i]) AS BIGINT) AS sd
        |  FROM un CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i)
        |  GROUP BY 1
        |), crs AS (
        |  SELECT CAST(SUM(sd * sd) AS BIGINT) AS sum_s2 FROM dims
        |)
        |SELECT n, sum_norm2, sum_s2,
        |  CAST((sum_s2 - sum_norm2) // (n * (n - 1) * 100) AS BIGINT) AS avg_pair_cos_micro
        |FROM norms CROSS JOIN crs""".stripMargin,
    "q294_pinball" ->
      """WITH ev AS (
        |  SELECT CAST(floor(extract(epoch FROM ts)) AS BIGINT) // 86400 AS day,
        |    CAST(round(value * 100) AS BIGINT) AS c
        |  FROM events
        |), daily AS (
        |  SELECT day, CAST(SUM(c) AS BIGINT) AS cents, day % 7 AS dow
        |  FROM ev GROUP BY 1
        |), ranked AS (
        |  SELECT a.day, a.cents AS y, b.cents AS h,
        |    ROW_NUMBER() OVER (PARTITION BY a.day ORDER BY b.cents, b.day) AS rn,
        |    CAST(COUNT(*) OVER (PARTITION BY a.day) AS BIGINT) AS n
        |  FROM daily a JOIN daily b ON a.dow = b.dow AND b.day < a.day
        |), taus AS (
        |  SELECT CAST(unnest([100000, 500000, 900000]) AS BIGINT) AS tau_ppm
        |), picked AS (
        |  SELECT t.tau_ppm, r.y, r.h
        |  FROM ranked r CROSS JOIN taus t
        |  WHERE r.rn = t.tau_ppm * (r.n - 1) // 1000000 + 1
        |)
        |SELECT tau_ppm, CAST(COUNT(*) AS BIGINT) AS n_days,
        |  CAST(SUM(greatest(tau_ppm * (y - h), (tau_ppm - 1000000) * (y - h))) AS BIGINT)
        |    AS sum_loss_ppm_cents,
        |  CAST(CAST(SUM(greatest(tau_ppm * (y - h), (tau_ppm - 1000000) * (y - h))) AS BIGINT)
        |    // COUNT(*) // 1000000 AS BIGINT) AS avg_loss_cents
        |FROM picked GROUP BY 1 ORDER BY 1""".stripMargin,
    "q295_rbo" -> {
      val ppowValues = graft.queries.EventQueries.rboPpowMicro
        .map { case (d, p) => s"($d, $p)" }.mkString(", ")
      s"""WITH $sessCte,
         |ca AS (SELECT item_id, CAST(COUNT(*) AS BIGINT) AS m FROM enr GROUP BY 1),
         |ta AS (SELECT item_id, m FROM ca ORDER BY m DESC, item_id LIMIT 10),
         |ra AS (
         |  SELECT a.item_id, CAST(COUNT(b.item_id) + 1 AS BIGINT) AS ra
         |  FROM ta a LEFT JOIN ta b
         |    ON b.m > a.m OR (b.m = a.m AND b.item_id < a.item_id)
         |  GROUP BY 1
         |), cb AS (
         |  SELECT item_id, CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS m
         |  FROM enr GROUP BY 1
         |), tb AS (SELECT item_id, m FROM cb ORDER BY m DESC, item_id LIMIT 10),
         |rb AS (
         |  SELECT a.item_id, CAST(COUNT(b.item_id) + 1 AS BIGINT) AS rb
         |  FROM tb a LEFT JOIN tb b
         |    ON b.m > a.m OR (b.m = a.m AND b.item_id < a.item_id)
         |  GROUP BY 1
         |), joint AS (
         |  SELECT r1.item_id, greatest(r1.ra, r2.rb) AS dmin
         |  FROM ra r1 JOIN rb r2 USING (item_id)
         |), depths AS (
         |  SELECT * FROM (VALUES $ppowValues) AS t(d, ppow_micro)
         |)
         |SELECT CAST(depths.d AS BIGINT) AS d,
         |  CAST(COUNT(j.item_id) AS BIGINT) AS overlap,
         |  CAST(depths.ppow_micro AS BIGINT) AS ppow_micro,
         |  CAST(COUNT(j.item_id) * depths.ppow_micro // (10 * depths.d) AS BIGINT) AS term_micro
         |FROM depths LEFT JOIN joint j ON j.dmin <= depths.d
         |GROUP BY depths.d, depths.ppow_micro ORDER BY d""".stripMargin
    },
    "q296_rendezvous" ->
      """WITH keys AS (
        |  SELECT p_partkey AS key FROM part
        |), shards AS (
        |  SELECT CAST(unnest(generate_series(0, 7)) AS BIGINT) AS shard
        |), scored AS (
        |  SELECT k.key, s.shard,
        |    CAST(('0x' || substring(md5(CAST(k.key AS VARCHAR) || '#' ||
        |      CAST(s.shard AS VARCHAR)), 1, 15)) AS BIGINT) AS score
        |  FROM keys k CROSS JOIN shards s
        |), a0 AS (
        |  SELECT key, shard AS shard_before FROM (
        |    SELECT key, shard,
        |      ROW_NUMBER() OVER (PARTITION BY key ORDER BY score DESC, shard ASC) AS rn
        |    FROM scored) WHERE rn = 1
        |), a1 AS (
        |  SELECT key, shard AS shard_after FROM (
        |    SELECT key, shard,
        |      ROW_NUMBER() OVER (PARTITION BY key ORDER BY score DESC, shard ASC) AS rn
        |    FROM scored WHERE shard <> 3) WHERE rn = 1
        |)
        |SELECT a0.shard_before, a1.shard_after, CAST(COUNT(*) AS BIGINT) AS n_keys
        |FROM a0 JOIN a1 USING (key)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q297_sketch_audit" ->
      """WITH v AS (
        |  SELECT l_returnflag AS g, CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
        |  FROM lineitem
        |), b AS (
        |  SELECT g,
        |    CASE WHEN cents < 16 THEN cents
        |         ELSE CAST(length(bin(cents)) - 1 AS BIGINT) * 16
        |            + (cents // (CAST(1 AS BIGINT) << (length(bin(cents)) - 5))) - 16
        |    END AS bucket
        |  FROM v
        |), c AS (
        |  SELECT g, bucket, CAST(COUNT(*) AS BIGINT) AS cnt FROM b GROUP BY 1, 2
        |), w AS (
        |  SELECT g, bucket,
        |    CAST(SUM(cnt) OVER (PARTITION BY g ORDER BY bucket
        |                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
        |    CAST(SUM(cnt) OVER (PARTITION BY g) AS BIGINT) AS n
        |  FROM c
        |), pickedb AS (
        |  SELECT g,
        |    MIN(CASE WHEN cum >= greatest((n * 500000 + 999999) // 1000000, 1) THEN bucket END) AS b50,
        |    MIN(CASE WHEN cum >= greatest((n * 900000 + 999999) // 1000000, 1) THEN bucket END) AS b90
        |  FROM w GROUP BY 1
        |), sk AS (
        |  SELECT g, 'p50' AS q,
        |    CASE WHEN b50 < 16 THEN b50 ELSE (b50 % 16 + 16) << (b50 // 16 - 4) END AS sketch_lb_cents
        |  FROM pickedb
        |  UNION ALL
        |  SELECT g, 'p90',
        |    CASE WHEN b90 < 16 THEN b90 ELSE (b90 % 16 + 16) << (b90 // 16 - 4) END
        |  FROM pickedb
        |), sup AS (
        |  SELECT g, cents, CAST(COUNT(*) AS BIGINT) AS cnt FROM v GROUP BY 1, 2
        |), cm AS (
        |  SELECT g, cents, cnt,
        |    CAST(SUM(cnt) OVER (PARTITION BY g ORDER BY cents
        |                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
        |    CAST(SUM(cnt) OVER (PARTITION BY g) AS BIGINT) AS n
        |  FROM sup
        |), ex AS (
        |  SELECT g, 'p50' AS q, MIN(CASE WHEN cum >= (500000 * n + 999999) // 1000000
        |    AND cum - cnt < (500000 * n + 999999) // 1000000 THEN cents END) AS exact_cents
        |  FROM cm GROUP BY 1
        |  UNION ALL
        |  SELECT g, 'p90', MIN(CASE WHEN cum >= (900000 * n + 999999) // 1000000
        |    AND cum - cnt < (900000 * n + 999999) // 1000000 THEN cents END)
        |  FROM cm GROUP BY 1
        |)
        |SELECT sk.g, sk.q, sk.sketch_lb_cents, ex.exact_cents,
        |  CAST(ex.exact_cents * 1000000 // sk.sketch_lb_cents AS BIGINT) AS ratio_ppm
        |FROM sk JOIN ex ON sk.g = ex.g AND sk.q = ex.q
        |ORDER BY sk.g, sk.q""".stripMargin,
    "q298_feature_signal" ->
      """WITH f AS (
        |  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
        |    CAST(n_chars AS DOUBLE) AS n_chars,
        |    CAST(length(text) - length(replace(text, ' ', '')) AS DOUBLE) AS n_spaces,
        |    CAST(doc_id % 97 AS DOUBLE) AS noise
        |  FROM documents
        |), st AS (
        |  SELECT 'n_chars' AS feature, n_chars AS s, y FROM f
        |  UNION ALL SELECT 'n_spaces', n_spaces, y FROM f
        |  UNION ALL SELECT 'noise', noise, y FROM f
        |), g AS (
        |  SELECT feature, s, CAST(COUNT(*) AS BIGINT) AS cnt,
        |    CAST(SUM(y) AS BIGINT) AS pos
        |  FROM st GROUP BY 1, 2
        |), w AS (
        |  SELECT feature, cnt, pos,
        |    CAST(SUM(cnt) OVER (PARTITION BY feature ORDER BY s
        |                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |  FROM g
        |), a AS (
        |  SELECT feature,
        |    CAST(SUM(pos) AS BIGINT) AS n_pos,
        |    CAST(SUM(cnt) - SUM(pos) AS BIGINT) AS n_neg,
        |    CAST(0 AS BIGINT) AS n_null,
        |    CAST(SUM(pos * ((cum - cnt) * 2 + cnt + 1)) AS BIGINT) AS possum2
        |  FROM w GROUP BY 1
        |)
        |SELECT feature, n_pos, n_neg, n_null,
        |  CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL
        |    ELSE CAST(round(
        |      (CAST(possum2 AS DOUBLE) / 2.0
        |        - CAST(n_pos AS DOUBLE) * CAST(n_pos + 1 AS DOUBLE) / 2.0)
        |      / (CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE))
        |      * 1000000) AS BIGINT) END AS auc_ppm
        |FROM a ORDER BY feature""".stripMargin,
    "q299_ranking_eval" ->
      """WITH ui AS (
        |  SELECT user_id,
        |    TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS item_id,
        |    event_type
        |  FROM events
        |  WHERE TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL
        |), s AS (
        |  SELECT user_id, item_id,
        |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_clicks,
        |    CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS y
        |  FROM ui GROUP BY 1, 2
        |), r AS (
        |  SELECT user_id, y,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY n_clicks DESC, item_id ASC) AS rn
        |  FROM s WHERE n_clicks > 0
        |), g AS (
        |  SELECT user_id,
        |    MAX(CASE WHEN rn <= 5 THEN y ELSE 0 END) AS hit5,
        |    MIN(CASE WHEN rn <= 10 AND y = 1 THEN rn END) AS fp10
        |  FROM r GROUP BY 1
        |)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_instances,
        |  CAST(SUM(hit5) AS BIGINT) AS n_hit_at5,
        |  CAST(SUM(hit5) * 1000000 // COUNT(*) AS BIGINT) AS recall5_ppm,
        |  CAST(SUM(COALESCE(1000000 // fp10, 0)) // COUNT(*) AS BIGINT) AS mrr10_ppm
        |FROM g""".stripMargin,
    "q300_calibration" ->
      """WITH mx AS (
        |  SELECT MAX(n_chars) AS mx FROM documents
        |), c AS (
        |  SELECT CAST(n_chars * 1000000 // mx AS BIGINT) AS conf_ppm,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        |  FROM documents CROSS JOIN mx
        |), b AS (
        |  SELECT least(conf_ppm * 10 // 1000000, 9) AS bin, conf_ppm, y FROM c
        |), g AS (
        |  SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(conf_ppm) AS BIGINT) AS conf_sum,
        |    CAST(SUM(y) AS BIGINT) AS n_pos
        |  FROM b GROUP BY 1
        |)
        |SELECT CAST(bin AS BIGINT) AS bin, n,
        |  CAST(conf_sum // n AS BIGINT) AS conf_avg_ppm,
        |  CAST(n_pos * 1000000 // n AS BIGINT) AS acc_ppm,
        |  CAST(abs(conf_sum // n - n_pos * 1000000 // n) AS BIGINT) AS gap_ppm
        |FROM g ORDER BY bin""".stripMargin,
    // log-histogram MAD sketch (q171's bounded-state sibling): q106's
    // bucket math, two passes — median_lb, then |cents - median_lb|
    // re-bucketed for mad_lb
    "q301_mad_sketch" ->
      s"""WITH v AS (
         |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents FROM events
         |), sup AS (
         |  SELECT event_type, cents, CAST(COUNT(*) AS BIGINT) AS n FROM v GROUP BY 1, 2
         |), b1 AS (
         |  SELECT event_type, ${logBucketSql("cents")} AS bucket, n FROM sup
         |), c1 AS (
         |  SELECT event_type, bucket, CAST(SUM(n) AS BIGINT) AS cnt FROM b1 GROUP BY 1, 2
         |), w1 AS (
         |  SELECT event_type, bucket,
         |    CAST(SUM(cnt) OVER (PARTITION BY event_type ORDER BY bucket
         |                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
         |    CAST(SUM(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS nn
         |  FROM c1
         |), p1 AS (
         |  SELECT event_type, MAX(nn) AS n_rows,
         |    MIN(CASE WHEN cum >= greatest((nn * 500000 + 999999) // 1000000, 1)
         |             THEN bucket END) AS b50
         |  FROM w1 GROUP BY 1
         |), med AS (
         |  SELECT event_type, n_rows, CAST(${bucketLowerSql("b50")} AS BIGINT) AS median_lb
         |  FROM p1
         |), b2 AS (
         |  SELECT s.event_type,
         |    ${logBucketSql("abs(s.cents - m.median_lb)")} AS bucket, s.n
         |  FROM sup s JOIN med m USING (event_type)
         |), c2 AS (
         |  SELECT event_type, bucket, CAST(SUM(n) AS BIGINT) AS cnt FROM b2 GROUP BY 1, 2
         |), w2 AS (
         |  SELECT event_type, bucket,
         |    CAST(SUM(cnt) OVER (PARTITION BY event_type ORDER BY bucket
         |                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
         |    CAST(SUM(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS nn
         |  FROM c2
         |), p2 AS (
         |  SELECT event_type,
         |    MIN(CASE WHEN cum >= greatest((nn * 500000 + 999999) // 1000000, 1)
         |             THEN bucket END) AS b50d
         |  FROM w2 GROUP BY 1
         |)
         |SELECT m.event_type, m.n_rows, m.median_lb,
         |  CAST(${bucketLowerSql("p.b50d")} AS BIGINT) AS mad_lb
         |FROM p2 p JOIN med m USING (event_type) ORDER BY m.event_type""".stripMargin,
    // log-histogram Tukey fences (q214's bounded-state sibling):
    // Q1/Q3 bucket lower bounds, doubled-integer fences, tail mass
    // from the compressed support
    "q302_tukey_sketch" ->
      s"""WITH v AS (
         |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents FROM events
         |), sup AS (
         |  SELECT event_type, cents, CAST(COUNT(*) AS BIGINT) AS n FROM v GROUP BY 1, 2
         |), b1 AS (
         |  SELECT event_type, ${logBucketSql("cents")} AS bucket, n FROM sup
         |), c1 AS (
         |  SELECT event_type, bucket, CAST(SUM(n) AS BIGINT) AS cnt FROM b1 GROUP BY 1, 2
         |), w1 AS (
         |  SELECT event_type, bucket,
         |    CAST(SUM(cnt) OVER (PARTITION BY event_type ORDER BY bucket
         |                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
         |    CAST(SUM(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS nn
         |  FROM c1
         |), p1 AS (
         |  SELECT event_type, MAX(nn) AS n_rows,
         |    MIN(CASE WHEN cum >= greatest((nn * 250000 + 999999) // 1000000, 1)
         |             THEN bucket END) AS bq1,
         |    MIN(CASE WHEN cum >= greatest((nn * 750000 + 999999) // 1000000, 1)
         |             THEN bucket END) AS bq3
         |  FROM w1 GROUP BY 1
         |), f AS (
         |  SELECT event_type, n_rows,
         |    CAST(${bucketLowerSql("bq1")} AS BIGINT) AS q1_lb,
         |    CAST(${bucketLowerSql("bq3")} AS BIGINT) AS q3_lb
         |  FROM p1
         |), f2 AS (
         |  SELECT *, q1_lb * 2 - (q3_lb - q1_lb) * 3 AS lo2,
         |    q3_lb * 2 + (q3_lb - q1_lb) * 3 AS hi2
         |  FROM f
         |)
         |SELECT f2.event_type, f2.n_rows, f2.q1_lb, f2.q3_lb,
         |  CAST(SUM(CASE WHEN s.cents * 2 < f2.lo2 THEN s.n ELSE 0 END) AS BIGINT) AS n_low,
         |  CAST(SUM(CASE WHEN s.cents * 2 > f2.hi2 THEN s.n ELSE 0 END) AS BIGINT) AS n_high
         |FROM sup s JOIN f2 USING (event_type)
         |GROUP BY 1, 2, 3, 4 ORDER BY f2.event_type""".stripMargin,
    // batch twin of the streaming tumbling window counts: epoch-aligned
    // 1h buckets, closed-window subset (window_end <= max_ts - 1h, in
    // exact micros)
    "q303_stream_wcounts" ->
      """WITH e AS (
        |  SELECT event_type, epoch_us(ts) AS us FROM events
        |), mx AS (
        |  SELECT MAX(us) AS mx FROM e
        |), g AS (
        |  SELECT event_type, us // 3600000000 * 3600 AS w_start_s,
        |    CAST(COUNT(*) AS BIGINT) AS n_events
        |  FROM e GROUP BY 1, 2
        |)
        |SELECT event_type, CAST(w_start_s AS BIGINT) AS w_start_s, n_events
        |FROM g CROSS JOIN mx
        |WHERE (w_start_s + 3600) * 1000000 <= mx - 3600000000
        |ORDER BY event_type, w_start_s""".stripMargin,
    // batch twin of the stream-stream interval join: inner joins emit
    // on arrival, so no window cutoff — full-precision timestamp bounds
    "q304_stream_attrib" ->
      """WITH c AS (
        |  SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'
        |), p AS (
        |  SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'
        |)
        |SELECT p.user_id AS user_id, p.event_id AS purchase_id, c.event_id AS click_id,
        |  CAST(epoch_us(p.ts) AS BIGINT) AS p_us, CAST(epoch_us(c.ts) AS BIGINT) AS c_us
        |FROM p JOIN c ON p.user_id = c.user_id
        |  AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 30 MINUTE
        |ORDER BY user_id, purchase_id, click_id""".stripMargin,
    // batch twin of the stream-static dimension enrich + windowed
    // per-category counts (dim = item_id % 20, the pipeline's category
    // rule); closed-window subset as q303
    "q305_stream_enrich" ->
      """WITH raw AS (
        |  SELECT epoch_us(ts) AS us,
        |    TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS item_id
        |  FROM events
        |), mx AS (
        |  SELECT MAX(us) AS mx FROM raw
        |), f AS (
        |  SELECT us, item_id % 20 AS category_id FROM raw WHERE item_id IS NOT NULL
        |), g AS (
        |  SELECT us // 3600000000 * 3600 AS w_start_s, category_id,
        |    CAST(COUNT(*) AS BIGINT) AS n_events
        |  FROM f GROUP BY 1, 2
        |)
        |SELECT CAST(w_start_s AS BIGINT) AS w_start_s,
        |  CAST(category_id AS BIGINT) AS category_id, n_events
        |FROM g CROSS JOIN mx
        |WHERE (w_start_s + 3600) * 1000000 <= mx - 3600000000
        |ORDER BY w_start_s, category_id""".stripMargin,
    // Accuracy@1 of next-category prediction (README.md:215): modal
    // prior-click category per purchase anchor, history strictly
    // before the anchor; history-less anchors count as misses
    "q306_accuracy_at1" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, ts, event_type,
        |    TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) % 20 AS cat
        |  FROM events
        |  WHERE TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL
        |    AND event_type IN ('click', 'purchase')
        |), a AS (
        |  SELECT event_id AS anchor_id, user_id, ts AS a_ts, cat AS a_cat
        |  FROM ev WHERE event_type = 'purchase'
        |), c AS (
        |  SELECT user_id, ts AS c_ts, cat AS c_cat
        |  FROM ev WHERE event_type = 'click'
        |), v AS (
        |  SELECT a.anchor_id, c.c_cat, COUNT(*) AS n_votes
        |  FROM a JOIN c ON a.user_id = c.user_id AND c.c_ts < a.a_ts
        |  GROUP BY 1, 2
        |), r AS (
        |  SELECT anchor_id, c_cat,
        |    ROW_NUMBER() OVER (PARTITION BY anchor_id
        |      ORDER BY n_votes DESC, c_cat ASC) AS rn
        |  FROM v
        |), p AS (
        |  SELECT anchor_id, c_cat AS pred_cat FROM r WHERE rn = 1
        |)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_anchors,
        |  CAST(SUM(CASE WHEN p.pred_cat = a.a_cat THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
        |  CAST(SUM(CASE WHEN p.pred_cat = a.a_cat THEN 1 ELSE 0 END) * 1000000
        |    // COUNT(*) AS BIGINT) AS acc1_ppm
        |FROM a LEFT JOIN p USING (anchor_id)""".stripMargin,
    // batch twin of the stream-stream session merge: view + purchase
    // feeds sessionized jointly (30-min gap; gap == duration MERGES,
    // strictly greater splits — the session_window rule), closed
    // sessions only. Cutoff = min(per-feed max ts) − 1h in exact
    // micros (Spark's multi-watermark policy takes the MIN watermark
    // across a union's inputs); session end = last event + gap.
    "q307_stream_merge_sessions" ->
      """WITH e AS (
        |  SELECT user_id, event_id AS eid, epoch_us(ts) AS us,
        |    CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS is_a
        |  FROM events WHERE event_type IN ('view', 'purchase')
        |), mx AS (
        |  SELECT LEAST(
        |    (SELECT MAX(epoch_us(ts)) FROM events WHERE event_type = 'view'),
        |    (SELECT MAX(epoch_us(ts)) FROM events WHERE event_type = 'purchase')) AS mx
        |), s AS (
        |  -- eid tie-break: two events for one user at the SAME microsecond
        |  -- must see the same order in the brk window and the sid
        |  -- cumulative-sum window, or a boundary tie can split one session
        |  -- (session_window on the engine side is order-free and merges)
        |  SELECT user_id, eid, us, is_a,
        |    CASE WHEN LAG(us) OVER w IS NULL
        |           OR us - LAG(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS brk
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, eid)
        |), g AS (
        |  SELECT user_id, us, is_a,
        |    SUM(brk) OVER (PARTITION BY user_id ORDER BY us, eid
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM s
        |), agg AS (
        |  SELECT user_id, sid,
        |    CAST(MIN(us) AS BIGINT) AS s_start_us,
        |    CAST(MAX(us) + 1800000000 AS BIGINT) AS s_end_us,
        |    CAST(SUM(is_a) AS BIGINT) AS n_view,
        |    CAST(SUM(1 - is_a) AS BIGINT) AS n_purchase,
        |    CAST(COUNT(*) AS BIGINT) AS n_events
        |  FROM g GROUP BY 1, 2
        |)
        |SELECT user_id, s_start_us, s_end_us, n_view, n_purchase, n_events
        |FROM agg CROSS JOIN mx
        |WHERE s_end_us <= mx - 3600000000
        |ORDER BY user_id, s_start_us""".stripMargin,
    // the profiler's exact→HLL swap audited: exact distinct counts are
    // the oracle contract; the HLL estimate itself is engine-specific
    // so only its 5-standard-error bounded-error FLAG is output (the
    // q297 sketch-audit pattern — TRUE on both sides by construction)
    "q308_approx_distinct_audit" ->
      """WITH u AS (
        |  SELECT 'event_id' AS "column", CAST(event_id AS VARCHAR) AS v FROM events
        |  UNION ALL
        |  SELECT 'user_id', CAST(user_id AS VARCHAR) FROM events
        |  UNION ALL
        |  SELECT 'event_type', event_type FROM events
        |)
        |SELECT "column", CAST(COUNT(DISTINCT v) AS BIGINT) AS n_exact,
        |  TRUE AS within_5pct
        |FROM u WHERE v IS NOT NULL
        |GROUP BY "column" ORDER BY 1""".stripMargin,
    // batch twin of the LEFT-OUTER stream-stream interval join, null
    // rows only: purchases with no click in the preceding 30 min.
    // Outer emission is watermark-gated, so only purchases strictly
    // older than the joint watermark (min of click max − 1h, purchase
    // max − 30min — the operator's per-side delays under the MIN
    // multi-watermark policy) are reported.
    "q309_unattributed_purchases" ->
      """WITH c AS (
        |  SELECT user_id, ts FROM events WHERE event_type = 'click'
        |), p AS (
        |  SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'
        |), wm AS (
        |  SELECT LEAST(
        |    (SELECT MAX(epoch_us(ts)) FROM events WHERE event_type = 'click') - 3600000000,
        |    (SELECT MAX(epoch_us(ts)) FROM events WHERE event_type = 'purchase') - 1800000000) AS wm
        |)
        |SELECT p.user_id AS user_id, p.event_id AS purchase_id,
        |  CAST(epoch_us(p.ts) AS BIGINT) AS p_us
        |FROM p CROSS JOIN wm
        |WHERE epoch_us(p.ts) < wm AND NOT EXISTS (
        |  SELECT 1 FROM c
        |  WHERE c.user_id = p.user_id AND c.ts <= p.ts
        |    AND c.ts >= p.ts - INTERVAL 30 MINUTE)
        |ORDER BY user_id, purchase_id""".stripMargin,
    // batch twin of the FULL-OUTER stream-stream interval join: matched
    // pairs ungated (prompt inner emission) + both watermark-closed
    // null sides — unmatched purchases at p_us < W (the q309 gate),
    // unmatched clicks (browse-no-buy) once the whole candidate
    // purchase window [c_us, c_us + 30min] is below W.
    "q310_attribution_ledger" ->
      """WITH c AS (
        |  SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'
        |), p AS (
        |  SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'
        |), wm AS (
        |  SELECT LEAST(
        |    (SELECT MAX(epoch_us(ts)) FROM events WHERE event_type = 'click') - 3600000000,
        |    (SELECT MAX(epoch_us(ts)) FROM events WHERE event_type = 'purchase') - 1800000000) AS wm
        |), j AS (
        |  SELECT COALESCE(p.user_id, c.user_id) AS user_id,
        |    p.event_id AS purchase_id, c.event_id AS click_id,
        |    CAST(epoch_us(p.ts) AS BIGINT) AS p_us,
        |    CAST(epoch_us(c.ts) AS BIGINT) AS c_us
        |  FROM p FULL OUTER JOIN c
        |    ON c.user_id = p.user_id AND c.ts <= p.ts
        |    AND c.ts >= p.ts - INTERVAL 30 MINUTE
        |)
        |SELECT user_id, purchase_id, click_id, p_us, c_us
        |FROM j CROSS JOIN wm
        |WHERE (purchase_id IS NOT NULL AND click_id IS NOT NULL)
        |   OR (click_id IS NULL AND p_us < wm)
        |   OR (purchase_id IS NULL AND c_us + 1800000000 < wm)""".stripMargin,
    // level-sample rank sketch replayed exactly: per-row md5 level
    // (60 − bitlength of the 60-bit hash prefix — length(bin(v)) is
    // engine-portable floor-log2, the r5 rule), minimal threshold L
    // with ≤ 1024 survivors, sample order statistics at pure-integer
    // ppm ranks. The engine's Aggregator lands on the same (L, kept)
    // because membership is a per-row predicate, not arrival-order.
    "q311_rank_sketch" ->
      """WITH e AS (
        |  SELECT event_id, CAST(round(value * 100) AS BIGINT) AS cents FROM events
        |), lv AS (
        |  SELECT cents,
        |    CAST(('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h60
        |  FROM e
        |), l2 AS (
        |  SELECT cents,
        |    CASE WHEN h60 = 0 THEN 60 ELSE 60 - length(bin(h60)) END AS lvl
        |  FROM lv
        |), lev AS (
        |  SELECT MIN(L) AS level FROM range(0, 62) t(L)
        |  WHERE (SELECT COUNT(*) FROM l2 WHERE lvl >= L) <= 1024
        |), kept AS (
        |  SELECT cents FROM l2 CROSS JOIN lev WHERE lvl >= level
        |), m AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_kept FROM kept
        |), srt AS (
        |  SELECT cents, ROW_NUMBER() OVER (ORDER BY cents) AS rn FROM kept
        |)
        |SELECT CAST(p.p_ppm AS BIGINT) AS p_ppm, lev.level, m.n_kept,
        |  (SELECT cents FROM srt
        |   WHERE rn = GREATEST(CAST(1 AS BIGINT),
        |     (m.n_kept * p.p_ppm + 999999) // 1000000)) AS est_cents
        |FROM (VALUES (500000), (900000), (990000)) p(p_ppm)
        |CROSS JOIN lev CROSS JOIN m""".stripMargin,
    // perceptual hash replayed exactly: 64-bin hashed-4-gram histogram
    // (stride-1 substring windows — the maximal-repeats twin pattern),
    // two integer matrix multiplies against the quantized DCT basis
    // (operator constants, embedded as VALUES like the LSH planes),
    // sign bits packed into a BIGINT, then BRUTE-FORCE Hamming ≤ 3 —
    // which the engine's lossless banding must equal pair-for-pair.
    "q312_phash_neardup" ->
      s"""WITH cb(u, i, c) AS (
         |  VALUES ${graft.multimodal.Multimodal.dctBasis
               .map { case (u, i, c) => s"($u, $i, $c)" }.mkString(", ")}
         |), cells AS (
         |  SELECT doc_id,
         |    CAST(('0x' || substring(md5(substring(text, CAST(p AS INT), 4)), 1, 15))
         |      AS BIGINT) % 64 AS cell
         |  FROM documents, unnest(generate_series(1, length(text) - 3)) AS t(p)
         |), g AS (
         |  SELECT doc_id, cell // 8 AS i, cell % 8 AS j,
         |    CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM cells GROUP BY 1, 2, 3
         |), t1 AS (
         |  SELECT g.doc_id, cb.u, g.j, CAST(SUM(cb.c * g.cnt) AS BIGINT) AS t
         |  FROM g JOIN cb ON cb.i = g.i GROUP BY 1, 2, 3
         |), d AS (
         |  SELECT t1.doc_id, t1.u, cb.u AS v, CAST(SUM(t1.t * cb.c) AS BIGINT) AS dct
         |  FROM t1 JOIN cb ON cb.i = t1.j GROUP BY 1, 2, 3
         |), ph AS (
         |  -- bit 63 special-cased: DuckDB overflow-checks 1 << 63, but
         |  -- the i64 MIN bit pattern is exactly what Spark's shiftleft
         |  -- wraps to, and the HUGEINT sum + final cast preserves it
         |  SELECT doc_id, CAST(SUM(
         |    CASE WHEN dct <= 0 THEN 0
         |         WHEN u * 8 + v = 63 THEN CAST(-9223372036854775807 - 1 AS BIGINT)
         |         ELSE (CAST(1 AS BIGINT) << (u * 8 + v)) END) AS BIGINT) AS phash
         |  FROM d GROUP BY 1
         |)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
         |FROM ph a JOIN ph b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.phash, b.phash)) <= 3""".stripMargin,
    // Fixed-round integer k-means: md5-rank seeds (c0), 3 exact-integer
    // Lloyd rounds unrolled as chained CTEs — each round assigns to the
    // previous round's centroids and re-averages per dimension (the q41
    // arithmetic, iterated). In the iterative AS MATERIALIZED cohort:
    // every aN re-reads qv and cN−1, so inlining would re-expand the
    // chain refs^rounds times (the q193 lesson). The final round emits
    // every centroid component + member count, so the hash checks the
    // whole iteration bit-for-bit.
    "q313_kmeans" ->
      s"""WITH $quantCte, ranked AS (
         |  SELECT vec_id, v, ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS srn
         |  FROM qv
         |), c0 AS (
         |  SELECT CAST(srn - 1 AS BIGINT) AS cid, v AS cq FROM ranked WHERE srn <= 8
         |), ${(1 to 2).map { r =>
            s"""a$r AS (
         |  ${assignSql("qv", s"c${r - 1}", "vid", 64)} WHERE rn = 1
         |), c${r}d AS (
         |  SELECT cid, i, CAST(floor(CAST(SUM(v[i]) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cv
         |  FROM a$r, unnest(generate_series(1, 64)) AS t(i)
         |  GROUP BY cid, i
         |), c$r AS (
         |  SELECT cid, list(cv ORDER BY i) AS cq FROM c${r}d GROUP BY cid
         |)"""
          }.mkString(", ")}, a3 AS (
         |  ${assignSql("qv", "c2", "vid", 64)} WHERE rn = 1
         |)
         |SELECT cid, CAST(i - 1 AS BIGINT) AS pos,
         |  CAST(floor(CAST(SUM(v[i]) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cv,
         |  CAST(COUNT(*) AS BIGINT) AS n_members
         |FROM a3, unnest(generate_series(1, 64)) AS t(i)
         |GROUP BY cid, i
         |ORDER BY cid, pos""".stripMargin,
    // Longest repeated substring per doc, capped at 48: the capped
    // value equals COUNT(DISTINCT L ≤ 48 with a duplicated L-window) —
    // "some L-window repeats" is downward-closed in L (the prefix of a
    // duplicated window is duplicated), so the indicator holds for
    // exactly L = 1..lrs. The engine side is a row-local suffix
    // automaton; this ladder is the oracle-affordable exact mirror.
    "q314_longest_repeat" ->
      """WITH lens AS (
        |  SELECT doc_id, text, length(text) AS len FROM documents
        |), w AS (
        |  SELECT doc_id, L, substring(text, p, CAST(L AS INT)) AS sub
        |  FROM lens, unnest(generate_series(1, 48)) AS tl(L),
        |       unnest(generate_series(1, length(text) - L + 1)) AS tp(p)
        |  WHERE len >= L + 1
        |), dup AS (
        |  SELECT doc_id, L FROM w GROUP BY doc_id, L, sub HAVING COUNT(*) >= 2
        |), per AS (
        |  SELECT doc_id, CAST(COUNT(DISTINCT L) AS BIGINT) AS lrs FROM dup GROUP BY doc_id
        |)
        |SELECT l.doc_id, CAST(l.len AS BIGINT) AS doc_len,
        |  CAST(COALESCE(p.lrs, 0) AS BIGINT) AS lrs_len
        |FROM lens l LEFT JOIN per p USING (doc_id)
        |ORDER BY l.doc_id""".stripMargin)

  /** DuckDB mirror of [[graft.ops.Sketches.logBucket]] for a value
    * expression (q106's bucket math, shared so the sketch rows cannot
    * drift from it).
    */
  private def logBucketSql(v: String): String =
    s"""CASE WHEN $v < 16 THEN $v
       |         ELSE CAST(length(bin($v)) - 1 AS BIGINT) * 16
       |            + ($v // (CAST(1 AS BIGINT) << (length(bin($v)) - 5))) - 16
       |    END""".stripMargin

  /** DuckDB mirror of [[graft.ops.Sketches.bucketLower]]. */
  private def bucketLowerSql(b: String): String =
    s"CASE WHEN $b < 16 THEN $b ELSE ($b % 16 + 16) << ($b // 16 - 4) END"

  /** `steps` unrolled deterministic walk hops `s1..s$steps` off the
    * cumulative-weighted edge CTE `ew` and frontier `s0` — the SQL
    * mirror of [[graft.ops.Graph.randomWalks]]'s per-hop join.
    */
  private def randomWalkStepsSql(steps: Int): String =
    (1 to steps).map { s =>
      val h = "CAST(('0x' || substring(md5(CAST(c.walk_id AS VARCHAR) || " +
        s"'_$s'), 1, 15)) AS BIGINT) % e.out_w"
      s"""s$s AS (
         |  SELECT c.walk_id, e.dst AS node, CAST($s AS BIGINT) AS step
         |  FROM s${s - 1} c JOIN ew e ON c.node = e.src
         |  WHERE e.cum_w - e.w <= $h AND $h < e.cum_w
         |)""".stripMargin
    }.mkString(", ")

  /** Oracle twin of [[graft.dedup.Dedup.maximalRepeatRanges]] at a
    * given window floor: stride-1 `minLen`-char md5 window fingerprints
    * (60-bit hex-cast), corpus-wide occ >= 2 positions merged into
    * maximal ranges (break when gap > `minLen`). Shared by
    * q128 (48) and q179 (16) so the two bands cannot drift.
    */
  private def substringRepeatsSql(minLen: Int): String =
    s"""WITH pos AS (
       |  SELECT doc_id, i,
       |    CAST(('0x' || substring(md5(substr(text, CAST(i + 1 AS INT), $minLen)), 1, 15)) AS BIGINT) AS fp
       |  FROM documents, unnest(generate_series(0, length(text) - $minLen)) AS t(i)
       |  WHERE length(text) >= $minLen
       |), dup AS (
       |  SELECT doc_id, i FROM (
       |    SELECT doc_id, i, COUNT(*) OVER (PARTITION BY fp) AS occ FROM pos)
       |  WHERE occ >= 2
       |), grp AS (
       |  SELECT doc_id, i,
       |    SUM(CASE WHEN prev IS NULL OR i - prev > $minLen THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY doc_id ORDER BY i) AS g
       |  FROM (
       |    SELECT doc_id, i,
       |      lag(i) OVER (PARTITION BY doc_id ORDER BY i) AS prev
       |    FROM dup)
       |)
       |SELECT doc_id, CAST(MIN(i) AS BIGINT) AS start_pos,
       |  CAST(MAX(i) + $minLen AS BIGINT) AS end_pos,
       |  CAST(MAX(i) + $minLen - MIN(i) AS BIGINT) AS rep_len
       |FROM grp GROUP BY doc_id, g
       |ORDER BY doc_id, start_pos""".stripMargin

  /** `rounds` unrolled k-truss peel rounds tri1/sup1/e1..: per-edge
    * triangle support over the surviving edge set, HAVING ≥ k−2 — the
    * SQL mirror of [[graft.ops.Graph.kTrussEdges]]'s per-round step.
    * Expects a canonical `e0(a, b)` edge CTE.
    */
  private def trussRoundsSql(k: Int, rounds: Int): String =
    (1 to rounds).map { r =>
      val prev = if (r == 1) "e0" else s"e${r - 1}"
      s"""tri$r AS (
         |  SELECT ab.a, ab.b, bc.b AS c
         |  FROM $prev ab JOIN $prev bc ON ab.b = bc.a
         |  JOIN $prev ac ON ac.a = ab.a AND ac.b = bc.b
         |), sup$r AS (
         |  SELECT a, b, CAST(COUNT(*) AS BIGINT) AS support FROM (
         |    SELECT a, b FROM tri$r
         |    UNION ALL SELECT b AS a, c AS b FROM tri$r
         |    UNION ALL SELECT a, c AS b FROM tri$r)
         |  GROUP BY 1, 2 HAVING COUNT(*) >= ${k - 2}
         |), e$r AS (
         |  SELECT a, b FROM sup$r
         |)""".stripMargin
    }.mkString(", ")

  /** One lang-id rater's `(doc_id, cat)` prediction SQL for a marker
    * map — the q149 argmax CASE (first language reaching the best
    * score wins ties, 'und' when no marker hits), factored so the
    * Fleiss raters (q194) reuse the exact q32/q149 semantics.
    */
  private def langPredSql(markers: Seq[(String, Seq[String])]): String = {
    val best = markers.map { case (l, _) => s"s_$l" }.mkString("greatest(", ", ", ")")
    s"""SELECT doc_id, CASE ${markers
        .map { case (l, _) => s"WHEN s_$l = $best AND $best > 0 THEN '$l'" }
        .mkString(" ")} ELSE 'und' END AS cat
       |  FROM (SELECT doc_id,
       |${markers
        .map { case (l, ms) => s"    ${langScoreSql(ms)} AS s_$l" }
        .mkString(",\n")}
       |  FROM documents)""".stripMargin
  }

  /** `rounds` unrolled self-inclusive synchronized LPA updates
    * l1..l`rounds`, each adopting the most frequent label among
    * neighbors PLUS one self-vote (the oscillation breaker), min-label
    * tie-break — the SQL mirror of [[graft.ops.Graph
    * .labelPropagation]]'s per-round DataFrame step.
    */
  private def lpaRoundsSql(rounds: Int): String =
    (1 to rounds).map { r =>
      val prev = if (r == 1) "l0" else s"l${r - 1}"
      s"""l$r AS (
         |  SELECT id, label FROM (
         |    SELECT v.id, v.label,
         |      ROW_NUMBER() OVER (PARTITION BY v.id ORDER BY COUNT(*) DESC, v.label ASC) AS rn
         |    FROM (
         |      SELECT u.src AS id, p.label FROM und u JOIN $prev p ON u.dst = p.id
         |      UNION ALL SELECT id, label FROM $prev
         |    ) v
         |    GROUP BY v.id, v.label) WHERE rn = 1
         |)""".stripMargin
    }.mkString(",\n")

  /** q268 greedy max-coverage selection, `rounds` picks unrolled:
    * round r counts each doc's not-yet-covered 3-gram shingles
    * (anti-join vs covN), takes the (gain desc, doc_id) top-1, and
    * folds its shingles into covN.
    */
  private def coverageSelectSql(rounds: Int): String = {
    val steps = (2 to rounds).map { r =>
      s"""p$r AS (
         |  SELECT s.doc_id, CAST(COUNT(*) AS BIGINT) AS gain
         |  FROM sh s ANTI JOIN cov${r - 1} c ON s.shingle = c.shingle
         |  GROUP BY 1 ORDER BY gain DESC, s.doc_id LIMIT 1
         |), cov$r AS (
         |  SELECT shingle FROM cov${r - 1}
         |  UNION
         |  SELECT shingle FROM sh WHERE doc_id = (SELECT doc_id FROM p$r)
         |)""".stripMargin
    }.mkString(", ")
    val sel = (s"SELECT 1 AS round, doc_id, gain FROM p1" +:
      (2 to rounds).map(r => s"SELECT $r AS round, doc_id, gain FROM p$r"))
      .mkString("\n  UNION ALL ")
    s"""WITH ${shingleCte(3)}, tot AS (
       |  SELECT CAST(COUNT(DISTINCT shingle) AS BIGINT) AS total FROM sh
       |), p1 AS (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS gain FROM sh
       |  GROUP BY 1 ORDER BY gain DESC, doc_id LIMIT 1
       |), cov1 AS (
       |  SELECT DISTINCT shingle FROM sh WHERE doc_id = (SELECT doc_id FROM p1)
       |), $steps, sel AS (
       |  $sel
       |)
       |SELECT round, doc_id, gain,
       |  CAST(SUM(gain) OVER (ORDER BY round ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_covered,
       |  CAST(CAST(SUM(gain) OVER (ORDER BY round ROWS UNBOUNDED PRECEDING) AS BIGINT)
       |    * 1000000 // tot.total AS BIGINT) AS coverage_ppm
       |FROM sel CROSS JOIN tot
       |ORDER BY round""".stripMargin
  }

  /** q269 greedy k-center (farthest-point) selection, k picks
    * unrolled: c1 = max-norm vector; round r picks the unchosen
    * vector maximizing min exact-int d² to ch(r−1).
    */
  private def kcenterSql(k: Int): String = {
    val steps = (2 to k).map { r =>
      s"""d${r - 1} AS (
         |  SELECT q.vec_id, q.v, q.n2,
         |    CAST(MIN(q.n2 + c.n2 - 2 * ${dotSql("q.v", "c.v", 64)}) AS BIGINT) AS md
         |  FROM qn q CROSS JOIN ch${r - 1} c
         |  WHERE q.vec_id NOT IN (SELECT vec_id FROM ch${r - 1})
         |  GROUP BY q.vec_id, q.v, q.n2
         |), c$r AS (
         |  SELECT vec_id, v, n2, md FROM d${r - 1} ORDER BY md DESC, vec_id LIMIT 1
         |), ch$r AS (
         |  SELECT vec_id, v, n2 FROM ch${r - 1} UNION ALL SELECT vec_id, v, n2 FROM c$r
         |)""".stripMargin
    }.mkString(", ")
    val sel = (s"SELECT 1 AS round, vec_id, CAST(0 AS BIGINT) AS radius_d2 FROM c1" +:
      (2 to k).map(r => s"SELECT $r AS round, vec_id, md AS radius_d2 FROM c$r"))
      .mkString("\n  UNION ALL ")
    s"""WITH $quantCte, qn AS (
       |  SELECT vec_id, v, CAST(${norm2Sql("v")} AS BIGINT) AS n2 FROM qv
       |), c1 AS (
       |  SELECT vec_id, v, n2 FROM qn ORDER BY n2 DESC, vec_id LIMIT 1
       |), ch1 AS (SELECT vec_id, v, n2 FROM c1),
       |$steps
       |$sel
       |ORDER BY round""".stripMargin
  }

  /** q270 mutual top-1 neighbors over 6-plane LSH buckets: per-vector
    * top-1 by (cos_micro desc, id), kept when reciprocal, oriented
    * id_a < id_b.
    */
  private val mutualKnnSql: String =
    s"""WITH $quantCte, b AS (
       |  SELECT vec_id, v, ${bucketSql("v", 6, 64)} AS bucket FROM qv
       |), pairs AS (
       |  SELECT a.vec_id AS id, x.vec_id AS b_id,
       |    CAST(round((${cosineSql("a.v", "x.v", 64)}) * 1000000) AS BIGINT) AS cos_micro
       |  FROM b a JOIN b x ON a.bucket = x.bucket AND a.vec_id <> x.vec_id
       |), top1 AS (
       |  SELECT id, b_id, cos_micro FROM (
       |    SELECT id, b_id, cos_micro,
       |      ROW_NUMBER() OVER (PARTITION BY id ORDER BY cos_micro DESC, b_id) AS rn
       |    FROM pairs) WHERE rn = 1
       |)
       |SELECT x.id AS id_a, x.b_id AS id_b, x.cos_micro
       |FROM top1 x JOIN top1 y ON x.b_id = y.id AND y.b_id = x.id
       |WHERE x.id < x.b_id
       |ORDER BY id_a""".stripMargin

  /** q276 semantic decontamination report: md5-parity train/held-out
    * halves, shared 6-plane bucket candidates, top-20 pairs by
    * (cos desc, train_id, bench_id) with a flagged bit at 0.995.
    */
  private val semanticDecontamSql: String =
    s"""WITH $quantCte, h AS (
       |  SELECT vec_id, v,
       |    CAST(('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 8)) AS BIGINT) % 2 AS half,
       |    ${bucketSql("v", 6, 64)} AS bucket
       |  FROM qv
       |), tr AS (
       |  SELECT vec_id AS train_id, v, bucket FROM h WHERE half = 0
       |), be AS (
       |  SELECT vec_id AS bench_id, v AS bv, bucket FROM h WHERE half = 1
       |), sc AS (
       |  SELECT t.train_id, b.bench_id,
       |    CAST(round((${cosineSql("t.v", "b.bv", 64)}) * 1000000) AS BIGINT) AS cos_micro
       |  FROM tr t JOIN be b USING (bucket)
       |)
       |SELECT train_id, bench_id, cos_micro,
       |  CAST(CASE WHEN cos_micro >= 995000 THEN 1 ELSE 0 END AS BIGINT) AS flagged
       |FROM sc
       |ORDER BY cos_micro DESC, train_id, bench_id LIMIT 20""".stripMargin

  /** q279 blocking-quality audit: true pairs = exact 4-gram Jaccard
    * ≥ 0.5 (the q28 postings shape); candidates = the q42 MinHash/LSH
    * chain; recall + reduction in ppm, division-first so nothing
    * crosses int64.
    */
  private val blockingQualitySql: String = {
    val sigCols =
      (0 until 16).map(i => s"    min(md5('s$i|' || shingle)) AS h$i").mkString(",\n")
    val bandSelects = (0 until 4)
      .map { b =>
        val key = (0 until 4).map(r => s"h${4 * b + r}").mkString(" || '|' || ")
        s"SELECT doc_id, $b AS band_idx, md5($key) AS band_key FROM sig"
      }
      .mkString("\nUNION ALL\n")
    s"""WITH ${shingleCte(4)}, sizes AS (
       |  SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
       |), tp0 AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter_count
       |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2
       |), tp AS (
       |  SELECT t.id_a, t.id_b FROM tp0 t
       |  JOIN sizes za ON za.doc_id = t.id_a
       |  JOIN sizes zb ON zb.doc_id = t.id_b
       |  WHERE floor(t.inter_count * 1000000 / (za.n + zb.n - t.inter_count)) >= 500000
       |), sig AS (
       |  SELECT doc_id,
       |$sigCols
       |  FROM sh GROUP BY doc_id
       |), bands AS (
       |$bandSelects
       |), ok AS (
       |  SELECT band_idx, band_key FROM bands GROUP BY band_idx, band_key HAVING COUNT(*) <= 100
       |), keptb AS (
       |  SELECT b.* FROM bands b JOIN ok USING (band_idx, band_key)
       |), cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM keptb a JOIN keptb b
       |    ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.doc_id < b.doc_id
       |), nd AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM docs
       |), tt AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_true FROM tp
       |), tc AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_candidates FROM cand
       |), th AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_hits FROM tp JOIN cand USING (id_a, id_b)
       |)
       |SELECT nd.n_docs, tt.n_true, tc.n_candidates, th.n_hits,
       |  CAST(th.n_hits * 1000000 // greatest(tt.n_true, 1) AS BIGINT) AS pairs_recall_ppm,
       |  CAST(1000000 - tc.n_candidates * 1000000
       |    // greatest(nd.n_docs * (nd.n_docs - 1) // 2, 1) AS BIGINT) AS reduction_ppm
       |FROM nd CROSS JOIN tt CROSS JOIN tc CROSS JOIN th""".stripMargin
  }

  /** q280 IVF recall audit: the q41 IVF chain and the q31-style brute
    * chain over the same 64-query set, intersected; recall in ppm.
    */
  private val ivfRecallSql: String =
    s"""WITH $quantCte, ranked AS (
       |  SELECT vec_id, v, ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS srn
       |  FROM qv
       |), seeds AS (
       |  SELECT CAST(srn - 1 AS BIGINT) AS cid, v AS cq FROM ranked WHERE srn <= 16
       |), a0 AS (
       |  ${assignSql("qv", "seeds", "vid", 64)} WHERE rn = 1
       |), centd AS (
       |  SELECT cid, i, CAST(floor(CAST(SUM(v[i]) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cv
       |  FROM a0, unnest(generate_series(1, 64)) AS t(i)
       |  GROUP BY cid, i
       |), cent AS (
       |  SELECT cid, list(cv ORDER BY i) AS cq FROM centd GROUP BY cid
       |), assigned AS (
       |  ${assignSql("qv", "cent", "vid", 64)} WHERE rn <= 2
       |), queries AS (
       |  SELECT vec_id, v FROM qv WHERE vec_id < 64
       |), probes AS (
       |  ${assignSql("queries", "cent", "query_id", 64)} WHERE rn <= 6
       |), scored_ap AS (
       |  SELECT DISTINCT p.query_id, a.vid AS neighbor_id,
       |    ${cosineSql("p.v", "a.v", 64)} AS cosine_sim
       |  FROM probes p JOIN assigned a ON p.cid = a.cid AND a.vid <> p.query_id
       |), r_ap AS (
       |  SELECT query_id, neighbor_id,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id ASC) AS rn
       |  FROM scored_ap
       |), ap AS (
       |  SELECT query_id, neighbor_id FROM r_ap WHERE rn <= 5
       |), scored_ex AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    ${cosineSql("q.v", "c.v", 64)} AS cosine_sim
       |  FROM queries q CROSS JOIN qv c WHERE c.vec_id <> q.vec_id
       |), r_ex AS (
       |  SELECT query_id, neighbor_id,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id ASC) AS rn
       |  FROM scored_ex
       |), ex AS (
       |  SELECT query_id, neighbor_id FROM r_ex WHERE rn <= 5
       |), hits AS (
       |  SELECT e.query_id, CAST(COUNT(*) AS BIGINT) AS n_hit
       |  FROM ex e JOIN ap USING (query_id, neighbor_id) GROUP BY 1
       |), per AS (
       |  SELECT e.query_id, CAST(COUNT(*) AS BIGINT) AS n_exact,
       |    CAST(COALESCE(MAX(h.n_hit), 0) AS BIGINT) AS n_hit
       |  FROM ex e LEFT JOIN hits h USING (query_id) GROUP BY 1
       |)
       |SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
       |  CAST(SUM(n_hit) AS BIGINT) AS n_hits,
       |  CAST(SUM(n_exact) AS BIGINT) AS n_exact,
       |  CAST(CAST(SUM(n_hit) AS BIGINT) * 1000000 // CAST(SUM(n_exact) AS BIGINT) AS BIGINT) AS recall_ppm,
       |  CAST(MIN(n_hit * 1000000 // n_exact) AS BIGINT) AS min_recall_ppm
       |FROM per""".stripMargin

  /** q277 kNN-isolation outliers: lowest nearest-in-bucket cosine,
    * lone-bucket vectors first at the −10⁶ sentinel.
    */
  private val knnOutliersSql: String =
    s"""WITH $quantCte, b AS (
       |  SELECT vec_id, v, ${bucketSql("v", 6, 64)} AS bucket FROM qv
       |), pairs AS (
       |  SELECT a.vec_id, x.vec_id AS b_id,
       |    CAST(round((${cosineSql("a.v", "x.v", 64)}) * 1000000) AS BIGINT) AS cos_micro
       |  FROM b a JOIN b x ON a.bucket = x.bucket AND a.vec_id <> x.vec_id
       |), top1 AS (
       |  SELECT vec_id, b_id AS nearest_id, cos_micro AS nearest_cos_micro
       |  FROM (
       |    SELECT vec_id, b_id, cos_micro,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id
       |        ORDER BY cos_micro DESC, b_id) AS rn
       |    FROM pairs) WHERE rn = 1
       |)
       |SELECT b.vec_id,
       |  COALESCE(t.nearest_id, -1) AS nearest_id,
       |  COALESCE(t.nearest_cos_micro, -1000000) AS nearest_cos_micro
       |FROM b LEFT JOIN top1 t USING (vec_id)
       |ORDER BY nearest_cos_micro, b.vec_id LIMIT 20""".stripMargin

  /** q271 LSH-bucketed hard negatives: anchors = vec_id % 50 == 0,
    * same 8-plane bucket, label-mismatched, top-3 by (cos_micro desc,
    * neighbor_id).
    */
  private val hardNegativesLshSql: String =
    s"""WITH q AS (
       |  SELECT vec_id, CAST(label AS BIGINT) AS label,
       |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS v
       |  FROM embeddings
       |), b AS (
       |  SELECT vec_id, label, v, ${bucketSql("v", 8, 64)} AS bucket FROM q
       |), scored AS (
       |  SELECT qs.vec_id AS query_id, qs.label AS query_label,
       |    c.vec_id AS neighbor_id, c.label AS neighbor_label,
       |    CAST(round((${cosineSql("qs.v", "c.v", 64)}) * 1000000) AS BIGINT) AS cos_micro
       |  FROM b qs JOIN b c ON qs.bucket = c.bucket AND qs.label <> c.label
       |  WHERE qs.vec_id % 50 = 0
       |)
       |SELECT query_id, query_label, neighbor_id, neighbor_label, cos_micro, rn
       |FROM (
       |  SELECT query_id, query_label, neighbor_id, neighbor_label, cos_micro,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY cos_micro DESC, neighbor_id) AS INTEGER) AS rn
       |  FROM scored)
       |WHERE rn <= 3
       |ORDER BY query_id, rn""".stripMargin
}
