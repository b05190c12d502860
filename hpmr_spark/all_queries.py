"""Import every module that registers queries into hpmr_spark.catalog.

Importing this module fully populates QUERIES/ORACLES. Each import is
individually guarded so one broken extension module can never take down the
whole registry (the driver's correctness gate would otherwise lose every
query to a single ImportError).
"""

import importlib
import sys
import traceback

_MODULES = [
    "hpmr_spark.catalog",
    "hpmr_spark.operators.relational",
    "hpmr_spark.operators.relational2",
    "hpmr_spark.operators.kv_parity",
    "hpmr_spark.operators.relational3",
    "hpmr_spark.operators.temporal_queries",
    "hpmr_spark.operators.relational4",
    "hpmr_spark.operators.relational5",
    "hpmr_spark.operators.relational6",
    "hpmr_spark.operators.relational7",
    "hpmr_spark.operators.relational8",
    "hpmr_spark.operators.relational9",
    "hpmr_spark.operators.arrow_pandas_queries",
    "hpmr_spark.operators.relational10",
    "hpmr_spark.operators.bucketing_queries",
    "hpmr_spark.operators.sampling",
    "hpmr_spark.operators.pipeline_queries",
    "hpmr_spark.operators.ml_features",
    "hpmr_spark.operators.text_queries",
    "hpmr_spark.operators.dedup_queries",
    "hpmr_spark.operators.multimodal_queries",
    "hpmr_spark.operators.streaming_queries",
    "hpmr_spark.operators.skew_queries",
    "hpmr_spark.operators.sink_queries",
    "hpmr_spark.operators.relational11",
    "hpmr_spark.operators.relational12",
    "hpmr_spark.operators.corpus_pipeline",
    "hpmr_spark.operators.sketch_udaf_queries",
    "hpmr_spark.operators.corpus_stats_queries",
    "hpmr_spark.operators.graph_ml_queries",
    "hpmr_spark.operators.corpus_quality_queries",
    "hpmr_spark.operators.relational13",
    "hpmr_spark.operators.stats_layout_queries",
    "hpmr_spark.operators.analytics_queries",
    "hpmr_spark.operators.spark4_surface_queries",
    "hpmr_spark.operators.temporal2_queries",
    "hpmr_spark.operators.stats_catalog_queries",
    "hpmr_spark.operators.embedding_prep_queries",
    "hpmr_spark.operators.advanced2_queries",
    "hpmr_spark.operators.advanced3_queries",
    "hpmr_spark.operators.llm_extras_queries",
    "hpmr_spark.operators.mleval_queries",
    "hpmr_spark.operators.scale_sketch_queries",
    "hpmr_spark.operators.ir_stats_queries",
    "hpmr_spark.operators.lm_scale_queries",
    "hpmr_spark.operators.profiling_queries",
    "hpmr_spark.operators.stats_tests_queries",
    "hpmr_spark.operators.analytics2_queries",
    "hpmr_spark.operators.sources2_queries",
    "hpmr_spark.operators.cep_quant_queries",
    "hpmr_spark.operators.mr_patterns_queries",
    "hpmr_spark.operators.sketch2_queries",
    "hpmr_spark.operators.physical_attr_queries",
    "hpmr_spark.operators.versioned_queries",
    "hpmr_spark.operators.lm_decode_queries",
    "hpmr_spark.operators.bootstrap_queries",
    "hpmr_spark.operators.policy_queries",
    "hpmr_spark.operators.api_surface_queries",
    "hpmr_spark.operators.stream_source2_queries",
    "hpmr_spark.operators.crossmodal_queries",
    "hpmr_spark.operators.matryoshka_queries",
    "hpmr_spark.operators.order_stats_queries",
    "hpmr_spark.operators.pipeline2_queries",
    "hpmr_spark.operators.mlprep2_queries",
    "hpmr_spark.operators.eval_stats2_queries",
    "hpmr_spark.operators.linkage_queries",
    "hpmr_spark.operators.privacy_seq_queries",
    "hpmr_spark.operators.layout2_queries",
    "hpmr_spark.operators.causal_queries",
    "hpmr_spark.operators.opsmetrics_queries",
    "hpmr_spark.operators.orderstats2_queries",
    "hpmr_spark.operators.timeseries3_queries",
    "hpmr_spark.operators.experiment_stats_queries",
    "hpmr_spark.operators.rank_fusion_queries",
    "hpmr_spark.operators.distsys_queries",
    "hpmr_spark.operators.tokenize2_queries",
    "hpmr_spark.operators.pq_quantization_queries",
    "hpmr_spark.operators.mining2_queries",
    "hpmr_spark.operators.feature_store_queries",
    "hpmr_spark.operators.attribution2_queries",
    "hpmr_spark.operators.timeseries4_queries",
    "hpmr_spark.operators.graph_linkage_queries",
    "hpmr_spark.operators.boilerplate_queries",
    "hpmr_spark.operators.shapley_queries",
    "hpmr_spark.operators.rake_queries",
    "hpmr_spark.operators.distsys2_queries",
    "hpmr_spark.operators.sampling2_queries",
    "hpmr_spark.operators.holtwinters_queries",
    "hpmr_spark.operators.qnorm_queries",
    "hpmr_spark.operators.llm_prep2_queries",
    "hpmr_spark.operators.mleval2_queries",
    "hpmr_spark.operators.binseg_queries",
    "hpmr_spark.operators.distance_stats_queries",
    "hpmr_spark.operators.model_sql_queries",
    "hpmr_spark.operators.dtw_queries",
    "hpmr_spark.operators.textrank_queries",
    "hpmr_spark.operators.eval_stats3_queries",
    "hpmr_spark.operators.recommender_queries",
    "hpmr_spark.operators.density_queries",
    "hpmr_spark.operators.timeseries5_queries",
    "hpmr_spark.operators.profiling2_queries",
    "hpmr_spark.operators.llm_eval_queries",
    "hpmr_spark.operators.wavelet_queries",
    "hpmr_spark.operators.geometry_queries",
    "hpmr_spark.operators.schedopt_queries",
    "hpmr_spark.operators.graph_quality_queries",
    "hpmr_spark.operators.embed_select_queries",
    "hpmr_spark.operators.bandit2_queries",
    "hpmr_spark.operators.stats_band_queries",
    "hpmr_spark.operators.pipeline3_queries",
    "hpmr_spark.operators.llm_eval2_queries",
    "hpmr_spark.operators.heavytail_queries",
    "hpmr_spark.operators.graph_central_queries",
    "hpmr_spark.operators.mleval3_queries",
    "hpmr_spark.operators.opsstats_queries",
    "hpmr_spark.operators.datavalue_queries",
    "hpmr_spark.operators.aggregate2_queries",
    "hpmr_spark.operators.dsir_queries",
    "hpmr_spark.operators.web_queries",
    "hpmr_spark.operators.pretrain2_queries",
    "hpmr_spark.operators.pretrain3_queries",
    "hpmr_spark.operators.mixing_eval_queries",
    "hpmr_spark.operators.corpus_lm2_queries",
    "hpmr_spark.operators.decode_profile_queries",
    "hpmr_spark.operators.planning_eval_queries",
    "hpmr_spark.operators.selection_richness_queries",
    "hpmr_spark.operators.eval_robust_queries",
    "hpmr_spark.operators.symbolic_stats_queries",
    "hpmr_spark.operators.seq_align_queries",
    "hpmr_spark.operators.tokenize_serving_queries",
    "hpmr_spark.operators.storage_quant_queries",
    "hpmr_spark.operators.hpo_ot_queries",
    "hpmr_spark.operators.rl_planning_queries",
    "hpmr_spark.operators.string_membership_queries",
    "hpmr_spark.operators.fairness_quality_queries",
    "hpmr_spark.operators.effectsize_transport_queries",
    "hpmr_spark.operators.pystream_source_queries",
    "hpmr_spark.operators.advisor_tables_queries",
    "hpmr_spark.operators.cascade_scan_queries",
    "hpmr_spark.operators.raking_energy_queries",
    "hpmr_spark.operators.survival2_queries",
    # round-9 (driver) modules
    "hpmr_spark.operators.corpus_text2_queries",
    "hpmr_spark.operators.seq_models_queries",
    "hpmr_spark.operators.cluster_eval2_queries",
    "hpmr_spark.operators.valuation_calib_queries",
    "hpmr_spark.operators.compress_learn_queries",
    "hpmr_spark.operators.edit_graph_queries",
    # round-10 (driver) modules
    "hpmr_spark.operators.optrain_queries",
    "hpmr_spark.operators.rag_eval_queries",
    "hpmr_spark.operators.quant_block_queries",
    "hpmr_spark.operators.retrieval_serve_queries",
    "hpmr_spark.operators.eval_extra_queries",
    "hpmr_spark.operators.sampling3_queries",
    "hpmr_spark.operators.graph_central2_queries",
    "hpmr_spark.operators.matching_queries",
    "hpmr_spark.operators.corpus_scan2_queries",
    "hpmr_spark.operators.hashtable_sim_queries",
    "hpmr_spark.operators.hashtable_sim2_queries",
    "hpmr_spark.operators.label_noise_queries",
    "hpmr_spark.operators.dpo_queries",
    "hpmr_spark.operators.spark4_surface2_queries",
    "hpmr_spark.operators.budget_knapsack_queries",
    "hpmr_spark.operators.freshness_queries",
]

FAILED_MODULES: dict[str, str] = {}

for _m in _MODULES:
    try:
        importlib.import_module(_m)
    except Exception:  # pragma: no cover - defensive only
        FAILED_MODULES[_m] = traceback.format_exc()
        print(f"hpmr_spark: WARNING — query module {_m} failed to import", file=sys.stderr)


# The driver's correctness gate walks queries() in dict order and round 1
# showed it caps at the first 50 — registration order IS the verification
# window. This priority prefix puts one riskiest representative of EVERY
# family (deep TPC-H, lateral/UDTF/variant, iterative pagerank/components,
# temporal, streaming state, pandas/Arrow, bucketing, dedup incl. LSH +
# embedding, multimodal, skew, sinks) inside that window; everything else
# keeps its original relative order behind it. Queries dropped from the
# round-1 window were all driver-green there and stay covered by
# tools/selfcheck.py (the full registry) every round. Latest swaps: the
# Misra-Gries two-pass sketch (mapInPandas state machine), the exact-AUC
# global rank window (new mleval family), and BM25 (the LN-parity
# commitment's riskiest user) in; pandas_udf_token_count,
# dedup_incremental_epochs, similarity_topk_numpy out (their families stay
# represented by grouped_map_lang_stats/pandas_udaf_median_qty, five other
# dedup entries, and mapinarrow_embedding_norms); later, the secondary-sort
# mapInPandas fold and the Gram-collect PCA path in for
# dedup_levenshtein_fuzzy and grouped_map_lang_stats (dedup and pandas
# families keep 5 and 2 window representatives respectively). Round 2 swapped the
# corpus-pipeline batch's riskiest four (packing, contamination,
# quantization, vocab encode) in for four family-duplicate safe entries;
# later round-2 swaps put the corpus-quality/relational13 riskiest four
# (bigram-LM doc score, SCD2 intervals, IGNORE-NULLS LOCF, regex scrub)
# in for four more family-duplicate safe entries; the closing batch swapped
# in substring-passage dedup, the bucketized interval-overlap join, and the
# exact dyadic EWMA (window-list + one-final-double parity) for three safe
# window/kv family duplicates; then the RDD custom partitioner (physical
# placement — the one entry that depends on the Python-worker path end to
# end) and the DAU/WAU/MAU rollup (date arithmetic + explode) for two more
# family duplicates (cdc_latest_events, q20_promo_suppliers — both remain
# selfcheck-covered).
# Round-3 rotation: the two-pass bucketed ranking migration's riskiest
# representatives (histogram_equidepth_cents, rfm_user_scores,
# pareto_revenue_concentration — mixed-direction orders, triple-NTILE,
# descending prefix sums) plus the new order-stats family's int128 /
# tie-corrected members (gini, KS, Spearman) and the round-2
# not-yet-driver-checked recursive CTE / triangle / bootstrap, swapped for
# nine long-green family duplicates (q21_waiting_supplier,
# chained_mapreduce_histogram, lateral_top_customers_per_nation,
# session_window_builtin, asof_join_purchase_view, nonequi_band_join,
# kmeans_assign_step, text_repetition_stats, stratified_sample_per_lang —
# each family keeps >=1 window representative and all stay in the full
# selfcheck sweep). Second round-3 rotation: pipeline2's riskiest three
# (interpolate_hourly_gaps — sign-split division + rn-equi-join successor;
# ngram_novelty_by_bucket — first-occurrence gram algebra;
# transpose_flag_metrics — the new Spark 4 transpose surface) in for
# locf_gap_fill_values, contamination_check_5gram, pandas_udaf_median_qty
# (temporal/gram/pandas families keep interpolate+scd2 / substring+jaccard+
# novelty / mapinarrow representatives).
# Second round-4 rotation: the new r4 families' riskiest members in —
# kneser_ney_bigram_ppb (persisted types + pure-rational int128),
# knn_label_vote_eval (HOF integer dot + max_by struct vote),
# km_survival_curve (LN/EXP parity + fused two-running-spec pass),
# token_bucket_replay (grouped-pandas fold vs recursive-CTE oracle),
# record_linkage_fs (committed nano-nat weights), sprt_purchase_rate
# (persisted llr prefix + boundary crossings) — for six long-green rows
# (q8_market_share, pca_power_iteration_int, mapinarrow_embedding_norms,
# bucketed_join_revenue, bootstrap_ci_poisson, pack_sequences_ctx512);
# TPC-H keeps the flagship + reducer rows, iterative keeps pagerank/lpa/
# triangle, Arrow keeps multimodal_audio_features + the two new pandas
# paths, corpus keeps vocab/novelty/dedup rows.
# Round-4 rotation (VERDICT r3 item 4): the strongest never-driver-checked
# rows in — graph_lpa_communities (iterative label propagation),
# sql_udf_quality_report (SQL UDF surface), streaming_left_outer_join
# (state + watermark NULL emission), cusum_changepoint_hours +
# theil_index_revenue + label_drift_hellinger_nano + mann_whitney_u_gate
# (the r3 drift/inequality statistics, now int128-lifted), and the
# de-vacuized dedup_cross_source_matrix (planted 'recrawl' overlap, 20
# rows) — for eight long-green rows (q1_pricing_summary,
# ewma_user_value_exact, histogram_equidepth_cents, secondary_sort_fold,
# dau_wau_mau_rollup, correlated_scalar_select, custom_partitioner_buckets,
# sketch_countmin_status), each green in >=1 prior driver window and each
# family still represented (TPC-H: q8; window-list/EWMA: interpolate +
# scd2; ranking: rfm/pareto/gini/ks/spearman; mapInPandas: mapinarrow +
# multimodal; temporal: scd2 + interpolate; RDD path: graph_pagerank_trade
# uses the same iterative driver loop; sketches: heavy_hitters_mg).
# Round-5 rotation (VERDICT r3 item 4 standing rule — rotate every round):
# the 14 riskiest round-5 rows in — unigram_viterbi_segment (unrolled
# Catalyst DP), pq_encode_subvectors (committed-seed codebook argmin),
# consistent_hash_ring (interval band join + minimal-movement proof),
# theil_sen_slope_milli + cuped_adjusted_lift + acf_lags_revenue +
# mann_kendall_trend + runs_test_above_median (the new time-series/
# experiment statistics), t_closeness_audit (int128 rational TVD),
# rrf_fused_ranking + graph_hits_scores (fusion/link analysis),
# hilbert_clustering_key (engine-identical bit algebra),
# kmv_distinct_estimate (bottom-k sketch gate), nelson_aalen_hazard
# (pure-rational survival) — for 14 multi-round-green rows (cusum,
# mann_whitney, theil_index, ks_two_sample, spearman — drift/order-stats
# keep label_drift_hellinger + gini; recursive_month_series — recursion
# rep stays via token_bucket_replay's recursive-CTE oracle;
# dedup_cross_source_matrix; interpolate_hourly_gaps — temporal keeps
# scd2; session_overlap_pairs; heavy_hitters_mg — sketch rep is now kmv;
# binary_classifier_eval_auc — mleval keeps knn vote;
# bm25_topk_docs — IR rep is now rrf; embedding_quantize_int8 — embedding
# reps are pq + dedup_embedding_cosine; vocab_topn_encode — corpus keeps
# novelty/udtf/viterbi). rolling_median_7day / weekday_seasonality_profile
# / kmv_merge_property stay outside the window (full sweep covers them).
# Second round-5 rotation: the post-first-rotation additions' riskiest six
# in — voptimal_histogram_dp (packed-argmin DP), isotonic_calibration_minimax
# (floored minimax ≡ PAVA), pq_adc_topk_search (code+LUT search),
# frequent_triples_support (A-priori prune), streaming_checkpoint_exactly_once
# (checkpoint restart), dpp_join_pruned_counts (dynamic partition pruning) —
# for six multi-round-green rows (pipeline_pretraining_report,
# transpose_flag_metrics, pii_scrub_props — text family keeps
# dedup_substring/viterbi; streaming_session_windows — streaming keeps
# left-outer/stateful-totals/token-bucket/exactly-once;
# graph_triangle_count — graph keeps lpa/pagerank/hits; doc_lm_score_ppm —
# LM scoring keeps kneser_ney). silhouette_centroid_ppm /
# source_unique_coverage_value / nelson... remain full-sweep-covered.
# Round-6 rotation: the ENTIRE r5 window is driver-green (140 rows ever
# checked, zero failures), so all 49 non-flagship slots rotate to
# never-checked rows (VERDICT r5 item 5). Composition: the 4 queries new
# or rewritten this round, then the oldest never-checked RISKY families —
# all 8 sinks, the RDD custom reducer, the skew family, all 11
# never-checked streaming rows, write-heavy sources, Python DataSource,
# IVM, iterative graph, UDF-matrix, multimodal, and two never-checked
# TPC-H rows. Out (all driver-green r1–r5): graph_lpa_communities,
# sql_udf_quality_report, reducer_keep_overwrite, streaming_left_outer_join,
# rfm_user_scores, kneser_ney_bigram_ppb, voptimal_histogram_dp,
# pareto_revenue_concentration, udtf_chunk_documents, variant_events_extract,
# graph_pagerank_trade, unigram_viterbi_segment, consistent_hash_ring,
# label_drift_hellinger_nano, pq_encode_subvectors, dedup_substring_ngram,
# gini_wealth_coefficient, t_closeness_audit, theil_sen_slope_milli,
# scd2_user_event_history, cuped_adjusted_lift, acf_lags_revenue,
# mann_kendall_trend, knn_label_vote_eval, km_survival_curve,
# runs_test_above_median, rrf_fused_ranking, token_bucket_replay,
# streaming_checkpoint_exactly_once, graph_hits_scores,
# hilbert_clustering_key, record_linkage_fs, sprt_purchase_rate,
# kmv_distinct_estimate, dedup_ngram_jaccard, dedup_minhash_lsh,
# dpp_join_pruned_counts, dedup_cluster_components, dedup_embedding_cosine,
# similarity_planted_neardup_lsh, isotonic_calibration_minimax,
# multimodal_audio_features, ngram_novelty_by_bucket,
# frequent_triples_support, streaming_stateful_user_totals,
# pq_adc_topk_search, skew_salted_join_revenue, nelson_aalen_hazard,
# sink_xml_roundtrip.
# Round-7 rotation (VERDICT r6 item 1, the lead item): the ENTIRE r6
# window was driver-green (189 rows ever checked across six rounds, zero
# failures ever), so all 49 non-flagship slots rotate again. 297 registry
# rows had never been in a driver window at r6 close, spread over 42
# modules with ZERO driver-checked representatives. This window takes the
# riskiest representative from EVERY one of those 42 modules (cross-engine
# log/ppm commitments, iterative/persisted frames, CEP, pattern matching,
# DP/sketch gates - preferred over plain SQL twins), plus 4 more
# never-checked round-6-wave rows (capture-recapture, secretary - also
# ADVICE-touched this round, jackknife, triplets), plus ALL THREE newly
# gated-oracle ANN rows (similarity_ivf_topk, similarity_ivf_trained_topk,
# ivfpq_topk_search - VERDICT item 2: the recall contract gets driver-grade
# hash checks, not just selfcheck). All 49 non-flagship rows are first-time
# checks -> of the 486 queries that existed at the r6 close, never-checked
# drops 297 -> 249 (<250 per the item's done-bar). Round 7 then ADDED two
# operators (dsir_importance_select - in this window - and
# gopher_quality_rules - selfcheck + invariance + model-test covered), so
# the registry-wide never-checked count is 250 of 488; the one row above
# the 486-baseline target is the round's own new operator, not rotation
# debt.
# Out (all driver-green in r6): bpe_train_8_merges, encoding_advisor_columns,
# conformal_threshold_coverage, the 3 sinks, custom_reducer_max_qty,
# skew_diagnostics_orders, all 9 streaming rows, the 6 write-heavy
# sources/IVM rows, bpe_apply_compression_report, pit_join_feature_spend,
# logrank_test_cohorts, attribution_removal_effect, attribution_shapley_exact,
# link_prediction_adamic_adar, linkage_sorted_neighborhood,
# dedup_boilerplate_segments, holt_winters_daily_forecast, ams_f2_sketch_gate,
# binseg_changepoints_revenue, streaming_window_topk_types, dtw_nation_revenue,
# textrank_keywords, haar_wavelet_compress, streaming_ewma_user_state,
# grid_dbscan_clusters, weighted_interval_scheduling, ucb1_replay_arms,
# naive_bayes_lang_eval, emd_1d_price_shift, graph_modularity_ppm,
# udtf_analyze_split, auc_cv_folds, pinball_loss_quantile_eval - every
# family keeps full-sweep selfcheck coverage at both SFs, and streaming/
# sinks/skew/sources stay represented across prior CORRECTNESS artifacts.
# Round-8 rotation (VERDICT r7 item 1, the lead item): the ENTIRE r7 window
# was driver-green (238 rows ever checked across seven rounds, zero
# failures ever), so ALL 50 slots rotate to first-time rows — including,
# for the first time, the flagship slot: mapreduce_revenue_by_order is
# 2× driver-green (r1, r7) and the driver's entry() smoke runs the same
# query every round regardless, so keeping it in the window only burned a
# rotation slot. Composition: gopher_quality_rules first (the r7 "added
# after the window froze" honesty nit), the round's FOUR new operators
# (ivfpq_recall_clustered_gate — VERDICT item 3's strong-recall contract;
# url_canonical_dedup_groups + url_host_dup_profile — item 6;
# semdedup_centroid_prune — item 5: every r8-new operator gets a driver row
# in ITS OWN round, closing the gopher pattern), then 45 of the oldest
# never-checked rows weighted to the highest-risk classes: the r7-rewritten
# mahalanobis, the 10-shuffle rank machinery (MAD), the epoch/set_batch
# union path, all four pandas/Arrow/PyDataSource execution paths, both
# multimodal binary-column reps, 3 streaming rows, write-at-build sources
# (MERGE INTO, partitioned sink, IVM), iterative/persisted graph frames,
# every cross-query cache-aliasing-class frame (cooccurrence, bigram_lm,
# lttb, rolling_median, chi²), the chained-MATERIALIZED-oracle MMR, the
# sketch merge laws (minhash/kmv/bloom/linear), the LN/EXP-commitment
# family (ES sampling, softmax, zipf, entropy, markov rate, KDE grid), the
# sign-split/int128 nanos family (JS drift, MI, WoE, LOO target encode,
# z² gate), the sqrt-form GEMM block-prune contract, and the Spark-4 SQL
# surfaces (session variables, pipe syntax) + HRW argmax.
# Accounting vs the 250 never-checked at r7 close (judge-computed): 46 of
# the 50 slots retire old never-checked rows (the other 4 are this round's
# new operators) → 204 of the r7-close 488 remain never-checked; with the
# 4 new operators all checked in-window the registry-wide count is 204 of
# 492. The r7 target "<200" is unreachable inside one round: the driver
# gate caps at 50 rows, so 250 − 46 = 204 is the floor once the round's
# own new operators are (correctly) given driver rows; three more rounds
# of 50-row rotation retire the rest.
# Out (all driver-green in r7): the entire r7 window — see the r7 comment
# above for the 50 names; every family keeps full-sweep selfcheck coverage
# at both SFs plus the partition-invariance artifact.
# Round-9 note: the round-8 driver/judge pass left NO artifacts
# (CORRECTNESS_r08.json / BENCH_r08.json / a round-8 VERDICT were never
# written), so the 50 rows composed above were never actually
# driver-checked — the true never-checked count at r9 start is 254 of 492
# (the r8-close "204" assumed the r8 window would run). The r9 window
# therefore KEEPS the r8 composition (those rows still deserve their
# first driver row) and only swaps this round's five new operators in —
# gopher_repetition_fractions, ccnet_ppl_buckets, data_repeats_budget,
# contamination_span_profile, bitext_margin_mining (every new operator
# gets a driver row in its own round) — for the five lowest-risk rows
# whose classes keep other in-window representatives:
# (wave-2 swaps: bradley_terry_lang_strength + systematic_resample_counts
# in for minhash_merge_property — sketch merge laws keep kmv_set_ops_gate
# + bloom_semi_prune + sketch_bounded_checks — and
# softmax_temperature_mixture — the LN/EXP family keeps four other reps.)
# sql_session_variables + pipe_syntax_orders_summary (plain Spark-4 SQL
# surfaces, selfcheck/invariance-green since r2/r6), rendezvous_hash_assign
# (pure HRW expression), kmv_merge_property (sketch merge laws keep
# minhash_merge_property + kmv_set_ops_gate + bloom_semi_prune +
# sketch_bounded_checks), zipf_fit_slope (the LN/EXP family keeps five
# other reps in-window). Wave-2/3 swaps add the other five r9 operators
# for kmv_set_ops_gate + minhash_merge_property (sketch laws keep
# bloom_semi_prune + sketch_bounded_checks), softmax_temperature_mixture +
# kde_price_grid_nano (LN/EXP family keeps weighted_sample_topk_es,
# token_entropy_by_lang, markov_entropy_rate_nano), woe_iv_segments
# (int128 nanos family keeps label_drift_js, MI, LOO target encode, z²).
# Wave-4/5 swaps cluster_balanced_sample + hard_negative_mining +
# winnowing_fingerprints in for bloom_semi_prune (sketch family keeps
# sketch_bounded_checks), markov_entropy_rate_nano and
# token_entropy_by_lang (LN/EXP family keeps weighted_sample_topk_es).
# Final r9 window (second sitting) = ALL 33 round-9 new operators (13
# from the first sitting's pretrain2 wave + 20 from the second sitting's
# pretrain3/mixing_eval/corpus_lm2/decode_profile/planning_eval waves —
# every new operator gets a driver row in its own round) + the 5
# never-checked r8-new operators (the r8 driver artifacts never landed)
# + 12 carryover first-time rows, one per highest-risk execution class.
# Additional swaps for the wave-6 rows: mahalanobis_outliers_top20
# (machinery keeps median_absolute_deviation), debounce_events_5s
# (streaming keeps tumbling), sink_partitioned_pruned (write-at-build
# keeps merge_upsert), cooccurrence_window2 (cache-aliasing keeps
# lttb_downsample_12 + the new persisted matrix-profile/beam frames).
# Swapped out vs the first-sitting window (each class keeps a rep):
# pandas_udf_token_count + pydatasource_seq_agg (Python-worker paths keep
# grouped_map_lang_stats + applyinarrow_lang_stats + the five new
# grouped-pandas folds), multimodal_frame_sample (multimodal keeps
# content_dedup), streaming_sliding_activity (streaming keeps tumbling +
# debounce), ivm_running_daily_revenue (write-at-build keeps merge_upsert
# + sink_partitioned_pruned), clustering_coefficient_ppm (iterative
# persisted graphs keep graph_bfs_3hop + new bellman_ford),
# bigram_lm_counts + rolling_median_7day + chi_square_independence
# (cache-aliasing keeps cooccurrence_window2 + lttb_downsample_12 + the
# new persisted matrix_profile/beam frames), holt_linear_forecast_weekly
# + mmr_diversified_topk (folds/chained oracles keep interval_coverage_
# union + unimax/doremi/bradley_terry), weighted_sample_topk_es (LN/EXP
# keeps doremi/stupid_backoff/beam/CE-matrix), label_drift_js_nano +
# mutual_information_nano + target_encoding_loo (int128 nanos keep
# ab_test_z2_gate + the new word_burstiness_vmr), dedup_incremental_
# epochs (dedup keeps minhash_estimate_error + semdedup + url rows).
# If CORRECTNESS_r09 runs this window, never-checked drops 254 → 233 of
# 525 (12 first-time carryovers + 5 r8 rows retired; all 33 new operators
# checked in their own round).
# Round-11 window (driver round 9). CORRECTNESS_r08 landed 50/50 green,
# retiring the whole round-10 window. Composition, in VERDICT r8's
# priority order: (a) all 18 round-11-new operators (own-round rule);
# (b) every operator whose CODE or ORACLE changed this round — the 3
# rows-only -> gated conversions, the CDC empty-text guard, the km/ivfpq
# stage-diet restructures, and the two trained-IVF rows that share the
# fused-seed trainer; (c) VERDICT r8's named never-checked leads: the 3
# bench headliners, both sink roundtrips, skew/dedup/grouped-map rows,
# two multimodal rows, and the reducer_keep_overwrite SS2-canary slot
# (item 6: one canary per window); (d) oldest never-checked registry
# rows to fill to 50. ivfpq_topk_search erases its stale r06 no_oracle
# artifact. If CORRECTNESS_r09 runs this window, never-checked drops
# 279 -> ~250 of 585 (18 new rows checked in their own round, ~21
# first-time retirements).
_CHECK_FIRST = [
    # ============== ROUND-13 WINDOW (driver round 11) ==============
    # CORRECTNESS_r10 landed 50/50 green, retiring the whole round-12
    # window. Composition, in VERDICT r10's priority order:
    # (a) this round's new operators (volume kept modest per item 7 —
    #     every new op gets its own-round driver row);
    # (b) roc_convex_hull — its OUTPUT changed this round (ADVICE r10
    #     equal-x dominance fix: vertically dominated points, including
    #     a dominated (0,0), no longer survive). The other two ADVICE
    #     fixes are bit-identical on this data (msfp table extension
    #     only adds unreachable entries; linear-probe guard never fires
    #     below sf1) and keep selfcheck+invariance coverage — no slots.
    # (c) the rotating §2 canary: distmap_n_keys (get_n_keys, checked
    #     only in r01 — VERDICT r10 item 6's named choice);
    # (d) VERDICT r10 item 1's named never-checked leads (judge
    #     spot-checked all green this session): simhash-docs,
    #     winnowing, contamination, span-corruption, MLM, corpus
    #     filter, CDC, containment, text quality/fingerprint,
    #     levenshtein-fuzzy;
    # (e) risk-weighted never-checked fill: every remaining r9-new
    #     operator (whole pretrain3/mixing_eval/corpus_lm2/
    #     decode_profile/planning_eval modules had zero driver rows),
    #     both zero-driver-row r10 modules' risky reps (IPF raking,
    #     energy distance), streaming debounce, write-at-build
    #     partitioned sink, the arrow Python-worker path, the ASOF
    #     join, and two Spark-4 SQL surfaces (that family has zero
    #     driver rows ever).
    # Accounting: 229 never-checked at r13 start + N_new own-round rows
    # − 40 first-time retirements → 229 + N_new − 40 (≈197 at N_new=8)
    # of ~615. Item 1's <180 bar is unreachable in one 50-row window
    # once own-round rows are seated (50 − N_new − canary − roc ≤ 40
    # retirements; 229 − 40 = 189 > 180 even at N_new = 0) — same
    # 50-row-cap arithmetic the r8/r12 closes documented; two more
    # rotations clear the tail. Deferred-class notes: rolling_median /
    # lttb (cache-aliasing class keeps cooccurrence/bigram_lm/chi²
    # driver-green from r10), bloom_semi_prune (sketch laws keep
    # sketch_bounded_checks + kmv_merge_property green from r10).
    # (a) round-13 new operators — appended as built this round
    "robin_hood_displacement_fold",
    "cuckoo_feasibility_census",
    "confident_learning_noise_census",
    "dataset_cartography_map",
    "forgetting_events_census",
    "dpo_implicit_reward_margins",
    "sql_scripting_isqrt_loop",
    "streaming_statestore_read",
    # (b) output-changed this round
    "roc_convex_hull",
    # (c) §2 canary (get_n_keys — r01-only row)
    "distmap_n_keys",
    # (d) VERDICT r10 named never-checked leads
    "dedup_simhash_docs",
    "winnowing_fingerprints",
    "contamination_span_profile",
    "span_corruption_transform",
    "mlm_masking_bert",
    "pipeline_corpus_filter",
    "cdc_latest_events",
    "dedup_containment_pairs",
    "text_quality_score",
    "text_fingerprint",
    "dedup_levenshtein_fuzzy",
    # (e) risk-weighted never-checked fill
    "gopher_repetition_fractions",
    "data_repeats_budget",
    "bitext_margin_mining",
    "bradley_terry_lang_strength",
    "systematic_resample_counts",
    "distinct_ngram_diversity",
    "pipeline_filter_funnel",
    "prefix_cache_sharing",
    "seqlen_bucket_padding_waste",
    "softdedup_commonness_weights",
    "best_of_n_reward",
    "bellman_ford_nation_days",
    "paged_kv_fragmentation",
    "word_burstiness_vmr",
    "self_bleu2_diversity",
    "cross_entropy_lang_matrix",
    "minhash_estimate_error",
    "chinchilla_data_budget",
    "importance_weight_ess",
    "temperature_scaling_grid",
    "dedup_signal_agreement",
    "debounce_events_5s",
    "sink_partitioned_pruned",
    "applyinarrow_lang_stats",
    "asof_join_with_tolerance",
    "sql_session_variables",
    "pipe_syntax_orders_summary",
    "ipf_raking_weights",
    "energy_distance_twosample",
]

# Retained as the round-12 rotation log (not used for ordering): the rows
# the r12 window checked, all green in CORRECTNESS_r10.
_R12_CHECK_FIRST = [
    # ============== ROUND-12 WINDOW (driver round 10) ==============
    # CORRECTNESS_r09 landed 50/50 green, retiring the whole round-11
    # window. Composition, in VERDICT r9's priority order:
    # (a) all 12 round-12-new operators (own-round rule);
    # (b) conformal_aps_label_sets — its `covered` OUTPUT semantics
    #     changed this round (ADVICE r9 rank fix); the other
    #     ADVICE/trainer-touched rows (huffman guard, DB-index guard,
    #     ivfpq/trained-IVF driver-side Lloyd, all-pairs ceilings) emit
    #     BIT-IDENTICAL values (selfcheck-verified at 3 SFs) and keep
    #     selfcheck+invariance coverage, so they don't burn slots;
    # (c) the rotating §2 canary: point_lookup_get (DistMap::get,
    #     checked only in r01);
    # (d) VERDICT r9 item 1+6 named leads: both remaining sink
    #     roundtrips, dedup_incremental_epochs, the three never-checked
    #     multimodal rows, hard_negative_mining (never-checked AND
    #     ceiling-touched);
    # (e) 29 risk-weighted never-checked retirements: Python-worker +
    #     PyDataSource paths, write-at-build IVM/MERGE, streaming,
    #     every remaining cache-aliasing-class persisted frame, the
    #     10-shuffle rank machinery, the LN/EXP-commitment family, the
    #     int128-nanos family, the sketch merge laws, the sqrt-form GEMM
    #     contract, and the Spark-4 SQL surfaces.
    # Accounting (second sitting: 22 own-round new operators total):
    # 255 never-checked at r12 start + 22 own-round rows − 26
    # retirements → 229 of 607 (minhash_merge_property also deferred —
    # sketch laws keep kmv_merge_property + sketch_bounded_checks). Four more fill rows deferred for the
    # wave-7 ops (rolling_median — the cache-aliasing class keeps
    # cooccurrence/bigram_lm/chi²; bloom_semi_prune — sketch laws keep
    # minhash/kmv/bounded_checks; mutual_information — int128 nanos
    # keeps label_drift_js + target_encoding_loo; kde — LN/EXP keeps
    # weighted_sample_topk_es). Item 1's ≤205 bar is unreachable in
    # one round once the 17 new operators (correctly) take own-round
    # rows — same 50-row-cap arithmetic the r8 close documented; the five
    # lowest-risk fill rows (both plain Spark-4 SQL surfaces, the plain
    # asof join, two of three LN/EXP reps — the family keeps
    # weighted_sample_topk_es + kde_price_grid_nano in-window) deferred to make room for the wave-5/6
    # operators; two more rotations clear the tail.
    # (a) round-12 new operators
    "adam_update_fold",
    "grpo_group_advantages",
    "gradient_noise_scale",
    "logistic_sgd_fold",
    "token_f1_paired_docs",
    "context_recall_topk",
    "citation_ngram_support",
    "absmax_int8_block_quant",
    "msfp_block_float_census",
    "wand_upper_bound_prune",
    "bigram_greedy_draft_accept",
    "simrank_bipartite_iter1",
    "brevity_penalty_census",
    "roc_convex_hull",
    "reservoir_sample_fold",
    "brandes_betweenness_trade",
    "gale_shapley_stable_match",
    "multi_pattern_contamination_scan",
    "token_pruning_census",
    "linear_probe_displacement_census",
    "knapsack_source_selection",
    "freshness_decay_weights",
    # (b) output-changed this round
    "conformal_aps_label_sets",
    # (c) §2 canary (DistMap::get — r01-only row)
    "point_lookup_get",
    # (d) VERDICT r9 named leads
    "sink_orc_roundtrip",
    "sink_text_roundtrip",
    "dedup_incremental_epochs",
    "multimodal_decode_meta",
    "multimodal_frame_sample",
    "multimodal_content_dedup",
    "hard_negative_mining",
    # (e) risk-weighted never-checked fill
    "pandas_udf_token_count",
    "pydatasource_seq_agg",
    "ivm_running_daily_revenue",
    "merge_upsert_customers",
    "streaming_sliding_activity",
    "cooccurrence_window2",
    "bigram_lm_counts",
    "chi_square_independence",
    "median_absolute_deviation",
    "mahalanobis_outliers_top20",
    "clustering_coefficient_ppm",
    "holt_linear_forecast_weekly",
    "mmr_diversified_topk",
    "weighted_sample_topk_es",
    "label_drift_js_nano",
    "target_encoding_loo",
    "sketch_bounded_checks",
    "kmv_merge_property",
    "gemm_block_prune_report",
]

# Retained as the round-11 rotation log (not used for ordering): the rows
# the r11 window checked, all green in CORRECTNESS_r09.
_R11_CHECK_FIRST = [
    # (a) round-11 new operators
    "flesch_kincaid_readability",
    "lz78_phrase_census",
    "kalman_1d_level_filter",
    "hmm_forward_loglik",
    "croston_intermittent_forecast",
    "elo_online_ratings",
    "adjusted_rand_index",
    "davies_bouldin_index",
    "item_item_cosine_recs",
    "count_min_sketch_est",
    "knn_shapley_values",
    "conformal_aps_label_sets",
    "huffman_code_lengths",
    "perceptron_online_epoch",
    "assortativity_degree_trade",
    "identifier_dynamic_table",
    "katz_centrality_trade",
    "osa_vocab_pair_distance",
    # (b) changed this round
    "approx_distinct_custkeys",
    "similarity_topk_numpy",
    "graph_kcore_2",
    "cdc_chunk_dedup",
    "km_survival_curve",
    "ivfpq_topk_search",
    "ivfpq_recall_clustered_gate",
    "similarity_ivf_topk",
    "similarity_ivf_trained_topk",
    # (c) VERDICT r8 named leads + SS2 canary + multimodal
    "text_token_stats",
    "similarity_cosine_topk",
    "streaming_tumbling_counts",
    "sink_csv_roundtrip",
    "sink_json_roundtrip",
    "skew_salted_sum_by_status",
    "dedup_exact_groups",
    "dedup_simhash_pairs",
    "grouped_map_lang_stats",
    "reducer_keep_overwrite",
    "multimodal_text_vector_join",
    "multimodal_binary_meta",
    # (d) oldest never-checked fill
    "dedup_resolution_keep_docs",
    "argmax_customer_per_nation",
    "exists_subquery_priority",
    "q18_large_volume_orders",
    "calendar_gap_fill",
    "percent_rank_prices",
    "bool_aggregates",
    "q5_local_supplier_volume",
    "q7_volume_shipping",
    "q9_product_type_profit",
    "q10_returned_items",
]

# Retained verbatim as the r7 rotation log (not used for ordering): the
# 50 rows the r7 driver window checked, all green in CORRECTNESS_r07.
_R7_CHECK_FIRST = [
    "mapreduce_revenue_by_order",  # flagship - keep first (entry() twin)
    # one riskiest rep per zero-driver-checked module (42 modules)
    "markov_stationary_power",     # aggregate2: persisted 8-iteration power
    "funnel_time_to_convert",      # analytics: event-time funnel deltas
    "api_quantiles_revenue_buckets",  # api_surface: KeyedMap.quantiles front door
    "grouped_ols_trend",           # causal: exact-moment OLS
    "match_recognize_vcp",         # cep_quant: MATCH_RECOGNIZE emulation
    "crossmodal_text_to_vec_topk",  # crossmodal: text->vector bridge
    "loso_source_contribution",    # datavalue: leave-one-source-out
    "fisher_discriminant_dims",    # embed_select: per-dim Fisher ratios
    "embedding_random_projection",  # embedding_prep: committed-seed JL
    "convex_hull_upper_qty_price",  # geometry: monotone-chain hull fold
    "closeness_harmonic_h12",      # graph_central: relaxation rounds
    "hill_tail_index",             # heavytail: LN-parity commitment
    "draft_accept_rate_ppm",       # llm_eval2: speculative-decode replay
    "pass_at_k_estimate",          # llm_eval: combinatorial ratio CASE guard
    "embedding_binary_hamming_topk",  # llm_prep2: bit-algebra top-k
    "lm_greedy_decode_steps",      # lm_decode: iterative decode loop
    "doc_perplexity_avg_nll",      # lm_scale: LN parity + persisted pairs
    "matryoshka_truncation_recall",  # matryoshka: prefix-dim recall
    "text_tfidf_scaled",           # ml_features: log-scaled tf-idf
    "brier_decomposition_nano",    # mleval2: 3-term exact decomposition
    "heaps_law_fit",               # model_sql: token-position builder (+ r7 perf fix)
    "revenue_change_decomposition",  # opsmetrics: exact residual identity
    "theil_u2_seasonal",           # opsstats: HUGEINT pre-scaled SSE
    "attribution_position_based",  # physical_attr: position credit split
    "spiegelhalter_z_nano",        # pipeline3: calibration z in nanos
    "window_range_30day_spend",    # pipeline: RANGE interval window
    "bandit_replay_ctr",           # policy: offline bandit replay
    "dp_noised_segment_counts",    # privacy_seq: deterministic DP Laplace
    "functional_dependency_audit",  # profiling2: FD counterexample scan
    "percentile_grid_exact",       # profiling: exact multi-percentile grid
    "quantile_normalize_doclen",   # qnorm: rank-map normalize
    "rake_keyphrases",             # rake: phrase-window scoring
    "slope_one_recommend",         # recommender: persisted ratings rollup
    "from_json_props_stats",       # relational12: schema-on-read JSON
    "corr_qty_discount_exact",     # relational6: exact-moment correlation
    "neyman_allocation_sample",    # sampling2: variance-proportional alloc
    "linear_counting_distinct",    # sketch2: bitmap sketch gate
    "ecdf_dkw_band",               # stats_band: DKW band + coverage gate
    "pattern_match_view_purchase",  # temporal2: sequence pattern join
    "text_lang_id",                # text: n-gram language id (core LLM op)
    "seasonal_decompose_additive",  # timeseries4: persisted day rollup
    "dickey_fuller_unit_root",     # timeseries5: lag rn-join regression
    # 4 more never-checked round-6-wave rows
    "capture_recapture_estimate",  # opsstats wave Q: Lincoln-Petersen
    "secretary_rule_success",      # graph_central wave: ADVICE-fixed join
    "jackknife_ratio_variance",    # eval_stats3: delete-one moments
    "triplet_violation_rate",      # datavalue: persisted quantized vectors
    # two of the three newly gated-oracle ANN rows (VERDICT r6 item 2;
    # ivfpq_topk_search was driver-checked in r6 and keeps selfcheck +
    # invariance coverage of its new gate at both SFs)
    "similarity_ivf_topk",
    "similarity_ivf_trained_topk",
    # the round's newest operator (DSIR hashed-ngram importance selection)
    "dsir_importance_select",
]


def _reorder_registry() -> None:
    from hpmr_spark import catalog

    for d in (catalog.QUERIES, catalog.ORACLES):
        rest = dict(d)
        d.clear()
        for name in _CHECK_FIRST:
            if name in rest:
                d[name] = rest.pop(name)
        d.update(rest)


_reorder_registry()
