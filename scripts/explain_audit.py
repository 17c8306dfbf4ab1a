#!/usr/bin/env python3
"""Plan audit: for each (or selected) query, print the physical plan
and grep it for scale red flags:

- parquet scans without PushedFilters when the query filters
- sort-merge joins where a broadcast was intended
- CartesianProduct / BroadcastNestedLoopJoin outside the known
  similarity cross-joins
- missing WholeStageCodegen spans (Python in the hot path)

Usage: python scripts/explain_audit.py [name_filter...] [--full]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

from kcore_spark.queries import all_queries
from kcore_spark.testing import shared_spark

SF_DIR = "/root/testdata/sf0.01"

# cross joins that are intentional (bounded query-set × corpus)
ALLOWED_NLJ = {
    "q_cosine_topk",
    # q_embedding_neardup is deliberately NOT here anymore: it is now a
    # label-blocked equi-join (r6) — a cross product there is a regression
    "q_ann_ivf_topk",
    "q22_idle_wealthy_customers",  # 1-row scalar-subquery broadcast cross
    "q11_important_stock",  # 1-row fraction-threshold broadcast cross
    "q_bm25_topk",  # 1-row corpus-stats broadcast cross
    "q_hll_sketch_union",  # 1-row global-exact broadcast cross
    "q_supplier_triangles",  # 1-row triangle-count broadcast cross
    "q_tfidf_top_terms",  # 1-row corpus-size broadcast cross
    "q_unigram_kl_drift",  # 1-row corpus-total broadcast cross
    "q_two_stage_retrieval",  # 1-row query-vector broadcast cross
    "q_pq_encode",  # k-row codebook broadcast cross (the PQ encode shape)
    "q_cuped_adjustment",  # 1-row period-boundary broadcast cross
    "q_profile_orders",  # 1-row min/max-bounds broadcast cross (histogram bounds)
    "q_cohens_kappa",  # 1-row totals × 1-row pe broadcast cross (kappa margins)
    "q_backtest_folds",  # 4-row fold table broadcast cross (one scan, all folds)
    "q_kll_sketch_quantiles",  # 1-row merged-sketch × 1-row exact broadcast cross
    "q_theta_sketch_distinct",  # 1-row union-estimate × 1-row exact broadcast cross
    "q_ivf_pq_search",  # centroid/codebook broadcast crosses (ANN assign+encode)
    "q_woe_binning",  # 1-row bin-totals broadcast cross (WOE margins)
    "q_lift_table",  # 1-row totals broadcast cross (lift denominator margins)
    "q_psi_drift",  # 1-row min/max range broadcast cross (fixed-width bin bounds)
    "q_kmeans_lloyd",  # k-row centroid broadcast cross (the Lloyd assignment shape)
    "q_key_skew_gini",  # 1-row top-10-share broadcast cross (Gini margins)
    "q_davies_bouldin",  # k-row centroid/scatter broadcast crosses (validity-index margins)
    "q_calinski_harabasz",  # 1-row global-centroid / SS broadcast crosses
    "q_adjusted_rand",  # 1-row value-range + margin broadcast crosses
    "q_var_cvar",  # 1-row VaR-threshold broadcast cross (tail filter)
    "q_fleiss_kappa",  # 1-row subject-totals x category-margins broadcast cross
    "q_cronbach_alpha",  # 1-row item-variance x total-variance broadcast cross
    "q_anderson_darling",  # 1-row moments broadcast cross (z-standardization)
    "q_cramer_von_mises",  # 1-row moments broadcast cross (z-standardization)
    "q_breusch_pagan",  # 1-row OLS-coefficient broadcast cross (residual pass)
    "q_chow_test",  # 1-row pooled x split moment broadcast cross
    "q_granger_lite",  # 1-row means broadcast cross (centering pass)
    "q_post_stratification",  # 1-row stratum-total broadcast cross (weights)
    "q_bayes_prob_best",  # 1-row arm-A x arm-B posterior broadcast cross
    "q_forecast_accuracy",  # 1-row day-count broadcast cross (test-window cut)
    "q_theta_method",  # 1-row day-count broadcast cross (SES weights)
    "q_cramers_v",  # 1-row total x k-row margin broadcast crosses
    "q_gk_gamma",  # k-squared cell-pair broadcast join (25 cells)
    "q_uncertainty_coeff",  # 1-row entropy broadcast crosses
    "q_nmi_labels",  # 1-row entropy/MI broadcast crosses
    "q_fowlkes_mallows",  # 1-row pair-count broadcast crosses
    "q_cluster_purity",  # 1-row value-range broadcast cross (bucket edges)
    "q_erlang_c_staffing",  # 1-row span x k-row factorial-grid broadcast crosses
    "q_mm1_metrics",  # 1-row span/capacity broadcast crosses
    "q_utilization_ladder",  # 1-row busiest-stream x 7-row grid broadcast cross
    "q_huber_m",  # 1-row IRLS-state broadcast crosses (3 fixed rounds)
    "q_biweight_midvariance",  # 1-row median/MAD broadcast cross
    "q_median_ci",  # 1-row rank-bounds broadcast cross (order-stat pick)
    "q_ams_f2",  # 1-row estimate x 1-row exact broadcast cross
    "q_kmv_distinct",  # 1-row kth-hash x 1-row exact broadcast cross
    "q_linear_counting",  # 1-row bitmap x 1-row exact broadcast cross
    "q_horvitz_thompson",  # 1-row exact-total broadcast cross
    "q_ratio_estimator",  # 1-row exact-total broadcast cross
    "q_regression_estimator",  # 1-row exact-total broadcast cross
    "q_page_hinkley",  # 1-row global-mean broadcast cross
    "q_friedman_seasonality",  # 1-row block-count broadcast cross
    "q_yuen_test",  # 1-row arm x arm broadcast cross
    "q_kde_grid",  # 1-row bandwidth/grid broadcast cross (21-point fan-out)
    "q_chain_ladder",  # 1-row eval-month/max-dev broadcast crosses (triangle bounds)
    "q_bornhuetter_ferguson",  # 1-row eval-month/max-dev broadcast crosses
    "q_mack_sigma",  # 1-row eval-month/max-dev broadcast crosses
    "q_krippendorff_alpha",  # 1-row unit-count broadcast cross (alpha margins)
    "q_kendalls_w",  # 1-row (m,n) bounds cross onto the 25-row rank-sum table
    "q_somers_d",  # 10-cell contingency self-cross + 1-row C/D/T margins
    "q_dissimilarity_index",  # 1-row group-totals cross onto the 25-nation table
    "q_hoover_index",  # 1-row mean/total broadcast cross (Robin Hood margins)
    "q_conover_squared_ranks",  # 1-row pooled-moment broadcast cross
    "q_pettitt_test",  # 1-row series-length broadcast cross
    "q_binseg_sse",  # 1-row series-totals broadcast cross
    "q_variance_changepoint",  # 1-row series-totals broadcast cross
    "q_markov_attribution",  # 5-row removal-tag cross + 1-row base-CVR cross
    "q_spectral_entropy",  # 1-row spectrum-total broadcast cross
    "q_fisher_g_test",  # 1-row series-bounds broadcast cross
    "q_segment_avg_psd",  # 1-row span broadcast cross (segment bounds)
    "q_life_table",  # 1-row eval-month broadcast cross (censor cut)
    "q_cumulative_incidence",  # 1-row eval-month broadcast cross (censor cut)
    "q_gompertz_fit",  # 1-row eval-month broadcast cross (censor cut)
    "q_consistent_hash_ring",  # 1-row sorted-ring array broadcast cross
    "q_ring_rebalance",  # two 1-row ring-array broadcast crosses
    "q_blocking_quality",  # four 1-row count-algebra margin crosses
    "q_block_size_skew",  # count-of-counts self-cross (value-bounded) + 1-row margins
    "q_forecast_combination",  # 1-row split/train-stat broadcast crosses
    "q_diebold_mariano",  # 1-row split/train-stat broadcast crosses
    "q_interval_coverage",  # 1-row split/train-stat broadcast crosses
    "q_white_test",  # 1-row trend-coefficient broadcast cross (residual pass)
    "q_breusch_godfrey",  # 1-row trend-coefficient broadcast cross
    "q_ramsey_reset",  # 1-row trend-coefficient broadcast cross
    "q_condorcet_fusion",  # k-row fused-shortlist self-cross (Copeland pairs)
    "q_bpref",  # 1-row query-vector/judgment broadcast crosses
    "q_weight_trimming",  # 1-row mean-weight broadcast cross (trim cap)
    "q_hodges_lehmann",  # calendar-bounded diff-series Walsh self-cross
    "q_mood_median_test",  # 1-row global-median broadcast cross
    "q_dunning_keyness",  # 1-row grand-total broadcast cross (keyness margins)
    "q_meta_random_effects",  # 1-row tau2 broadcast cross onto the 25-study table
    "q_capture_recapture",  # 1-row window-bounds broadcast cross (half split)
    "q_morans_i",  # 72-cell rook-adjacency broadcast join + 1-row margins
    "q_ripley_k",  # 9-row stencil-offset broadcast cross (grid-blocked pairs)
    "q_clark_evans",  # 9-row stencil-offset broadcast cross (grid-blocked NN)
    "q_chained_index",  # three 1-row year-link broadcast crosses
    "q_ab_attrition",  # 1-row arm x arm margin broadcast cross
    "q_peeking_path",  # 1-row final-z x crossing-day broadcast cross
    "q_bullwhip_effect",  # 1-row demand x supply moment broadcast cross
    "q_abc_xyz_matrix",  # 1-row revenue-total broadcast cross (ABC cut)
    "q_demand_pooling",  # 1-row pooled-CV broadcast cross
    "q_metric_rank_agreement",  # 1-row query-vector broadcast cross
    "q_centering_effect",  # 1-row centroid/query broadcast crosses
    "q_erlang_b_loss",  # 1-row span x 10-row trunk-grid broadcast crosses
    "q_mmc_wait_tail",  # 1-row span x 10-row server-grid broadcast crosses
    "q_benford_second_digit",  # 1-row total x 1-row chi2 broadcast crosses
    "q_last_digit_uniformity",  # 1-row total broadcast cross (digit margins)
    "q_sbg_retention_fit",  # 3-row tenure-grid broadcast cross + 1-row base
    "q_mean_cumulative_function",  # 13-row tenure-grid broadcast cross
    "q_cohort_quality_trend",  # 1-row eval/cohort-origin broadcast crosses
    "q_delta_join_maintenance",  # 1-row max-month broadcast cross (delta cut)
    "q_topk_buffer_maintenance",  # 1-row max-month broadcast cross (delta cut)
    "q_agg_retraction",  # 1-row max-month + state broadcast crosses
    "q_dhondt_allocation",  # 1-row vote-total broadcast cross
    "q_sainte_lague_allocation",  # 1-row vote-total broadcast cross
    "q_hamilton_allocation",  # 1-row total/used broadcast crosses
    "q_reserve_price_sweep",  # 1-row auction-count broadcast cross
    "q_evpi",  # 1-row best-EV x foresight broadcast crosses
    "q_minimax_regret",  # 1-row choice broadcast crosses onto the 10-action table
    "q_stochastic_dominance",  # bounded threshold-grid crosses (20-cell payoffs)
    "q_concat_boundary_stats",  # 1-row doc-stats x seq-stats broadcast cross
    "q_cold_access_rate",  # 1-row window-bounds broadcast cross (quarter cut)
    "q_kv_cache_budget",  # 1-row percentile x 3-row GiB grid broadcast crosses
    "q_batch_latency_tradeoff",  # 1-row rate/mean x 4-row batch grid crosses
    "q_engle_granger",  # 1-row levels-OLS coefficient broadcast cross
    "q_error_correction",  # 1-row levels-OLS coefficient broadcast cross
    "q_retry_amplification",  # 1-row retry-total broadcast cross
    "q_thundering_herd",  # 1-row threshold broadcast cross onto the minute curve
    "q_sample_quantile_error",  # 1-row quantile broadcast crosses (exact x sample)
    "q_threshold_split_stability",  # 1-row half x half best-threshold cross
    "q_hill_estimator",  # 1-row kth-order-stat broadcast cross
    "q_pot_gpd_fit",  # 1-row threshold broadcast cross
    "q_weibull_fit",  # 1-row total-count broadcast cross
    "q_embedding_drift",  # 1-row half x half broadcast cross
    "q_isotropy_audit",  # 1-row centroid broadcast cross
    "q_pareto_share",  # 1-row P80-threshold broadcast cross
    "q_assoc_measures2",  # 1-row basket-count broadcast cross
    "q_pmi_collocations",  # 1-row pair-total broadcast cross
    "q_periodogram",  # 1-row base x 6-row period-grid broadcast cross
    "q_james_stein",  # 1-row pooled-moments broadcast cross
    "q_empirical_bayes_rates",  # 1-row prior-params broadcast cross
    "q_profile_drift",  # 1-row half x half broadcast cross
    "q_kfold_cv",  # 5-row fold-coefficient broadcast join
    "q_bagged_stumps",  # 1-row stump-parameter broadcast crosses
    "q_knapsack_bound",  # 1-row greedy x 1-row reject broadcast cross
    "q_lad_regression",  # 1-row IRLS-state broadcast crosses (3 rounds)
    "q_haversine_nearest",  # 25-row coordinate broadcast cross
    "q_bloom_size_advisor",  # 1-row NDV x 3-row FPP-grid broadcast cross
    "q_sort_key_advisor",  # 32-row bucket x 1-row global-range broadcast cross
    "q_hotspot_gi",  # grid-row x 1-row stats broadcast cross
    "q_mtbf_mttr",  # 1-row MTBF x 1-row MTTR broadcast cross
    "q_chi2_feature_select",  # 1-row grand-totals broadcast cross (chi2 margins)
    "q_js_divergence",  # 1-row population-totals broadcast cross (JS margins)
    "q_rfm_segments",  # 1-row ref-date + 1-row quartile-cutoff broadcast crosses
    "q_pca_power_iteration",  # 1-row iterate + 1-row norm broadcast crosses
    "q_kaplan_meier",  # 1-row cohort-total broadcast cross (at-risk denominator)
    "q_benford_digits",  # 1-row digit-total broadcast cross (share denominator)
    "q_logreg_gd",  # 1-row weight-vector broadcast cross (the GD iterate)
    "q_bpe_learn",  # 1-row top-pair broadcast cross (the merge being applied)
    "q_tokenizer_apply",  # same 1-row merge crosses (shares the BPE loop)
    "q_hits_ranking",  # 1-row max-authority broadcast cross (normalizer)
    "q_hard_negatives",  # bounded anchor-set broadcast cross (q_cosine_topk shape)
    "q_target_encoding",  # 1-row global-prior broadcast cross (smoothing margin)
    "q_lorenz_curve",  # 1-row revenue-total broadcast cross (share denominator)
    "q_bootstrap_ci",  # 1-row point-estimate broadcast cross (CI reference)
    "q_diff_in_diff",  # 1-row window-midpoint broadcast cross (the cutoff)
    "q_mmr_rerank",  # 1-row query-vector + k-row shortlist broadcast crosses
    "q_mutual_info",  # r-row x c-row marginal grid + 1-row totals crosses
    "q_acf_hourly",  # 1-row moment-totals broadcast cross (ACF denominator)
    "q_corpus_mixture",  # 1-row totals + 1-row excess/uncapped-mass crosses
    "q_rrf_fusion",  # 1-row query-vector broadcast cross (the dense list)
    "q_impute_missing",  # 1-row global-median broadcast cross (the fallback)
    "q_referential_integrity",  # 1-row violation-count broadcast cross per check
    "q_ann_recall",  # bounded 20-query broadcast cross (exact-baseline side)
    "q_time_to_convert",  # 1-row totals x 1-row median broadcast crosses
    "q_seasonality_strength",  # 1-row SSB totals x 1-row SST broadcast cross
    "q_decay_engagement",  # 1-row max-ts broadcast cross (the age anchor)
    "q_spatial_grid_join",  # 1-row point-count broadcast cross (the summary)
    "q_key_skew_report",  # 1-row per-key median broadcast cross per key column
    "q_abc_classification",  # 1-row part-count broadcast cross (share denominator)
    # r9 batches G-K:
    "q_classification_report",  # k-row lang-ring modular join + 1-row class count
    "q_kruskal_wallis",  # 1-row tie-totals broadcast cross (H margins)
    "q_naive_bayes",  # k-row class fan-out + 1-row prior-totals crosses
    "q_ols_two_features",  # 1-row means broadcast cross (centering pass)
    "q_modularity_score",  # 1-row total-weight broadcast cross (Q denominator)
    "q_classical_decomposition",  # 1-row grand-mean broadcast cross (centering)
    "q_ccf_lagged",  # 13-row lag-table broadcast cross (the lag fan-out)
    "q_jackknife_variance",  # 1-row totals + 1-row mean-theta broadcast crosses
    "q_silhouette",  # k-row centroid broadcast cross (the Lloyd assignment shape)
    "q_kendall_tau",  # |X|x|Y| cell-pair inequality join — value-bounded, never N²
    "q_logrank_test",  # 1-row arm-totals broadcast cross (at-risk seed)
    "q_theil_sen",  # 1-row min-date broadcast cross + 60-row sample self-pair
    "q_neardup_threshold_sweep",  # 7-row tau-grid broadcast cross (the sweep fan-out)
    "q_jarque_bera",  # 1-row mean broadcast cross (central-moment pass)
    "q_runs_test",  # 1-row median broadcast cross (the sign threshold)
    "q_durbin_watson",  # 1-row base-date + 2-value coef broadcast crosses
    "q_freshness_audit",  # 1-row high-water-mark broadcast cross
    "q_neyman_allocation",  # 1-row budget-total + 1-row shortfall broadcast crosses
    "q_gaussian_em",  # 1-row parameter-iterate broadcast cross (the EM E-step)
    "q_two_way_anova",  # 1-row grand-totals broadcast crosses (SS decomposition)
    "q_padding_waste",  # 4-row bucket-grid broadcast cross (the planner fan-out)
    "q_pinball_loss",  # 3-row quantile-grid broadcast cross (the loss fan-out)
    "q_column_profile",  # 1-row top-value broadcast cross per profiled column
    # r9 restart-wave additions (same 1-row/k-row broadcast shapes):
    "q_dsir_importance",  # 1-row target/source-totals broadcast crosses
    "q_theil_index",  # 1-row population-mean broadcast cross (entropy margins)
    "q_t_closeness",  # 1-row global-distribution broadcast cross (EMD reference)
    "q_isotonic_calibration",  # 20-row bin-interval broadcast cross (PAVA algebra)
    "q_nelson_aalen",  # 1-row cohort-total broadcast cross (at-risk denominator)
    "q_best_split_infogain",  # 19-row threshold-grid + 1-row totals crosses
    "q_heaps_law",  # 1-row doc-count + decile-checkpoint broadcast crosses
    "q_poisson_gof",  # 1-row lambda + 1-row total broadcast crosses (GOF mass)
    # r10:
    "q_grubbs_outlier",  # 1-row moment-totals broadcast cross (mean/sd anchor)
    "q_cohens_d",  # 1-row arm-B moments broadcast cross (two-arm join)
    "q_ljung_box",  # inherits q_acf_hourly's 1-row totals broadcast cross
    "q_rich_club",  # 3-row threshold-grid broadcast cross (the k fan-out)
    "q_l28_engagement",  # 1-row max-date anchor broadcast cross
    "q_rfm_migration",  # 1-row window-midpoint broadcast cross (the cutoff)
    "q_join_cardinality_estimate",  # 1-row actual-count broadcast cross (validation)
    "q_pacf",  # inherits q_acf_hourly's 1-row totals broadcast cross
    "q_knn_label_consistency",  # bounded anchor-set broadcast cross (cosine_topk shape)
    "q_ship_month_seasonality",  # 1-row revenue-total broadcast cross (share denominator)
    "q_contribution_bounding",  # 3-row cap-grid broadcast cross (the planner fan-out)
    # bounded anchor-set broadcast crosses (the q_cosine_topk shape):
    "q_mrr_label",
    "q_rmst",  # 1-row KM-tail + cohort-total broadcast crosses
    "q_iv_wald",  # 1-row arm-1 moments broadcast cross (two-arm join)
    "q_parallel_trends",  # 1-row midpoint + arm-slope broadcast crosses
    "q_eoq",  # 1-row window-bounds broadcast cross (annualization anchor)
    "q_wasserstein_1d",  # 1-row arm-totals broadcast cross (ECDF denominators)
    "q_churn_hazard",  # 1-row max-week broadcast cross (censoring anchor)
    "q_peak_detection",  # 1-row moment-totals broadcast cross (band anchor)
    "q_brier_decomposition",  # 1-row grand-totals broadcast cross (base rate)
    "q_topk_stability",  # 1-row midpoint broadcast cross (the half split)
    "q_xbar_control_chart",  # 1-row chart-constants broadcast cross (limits)
    "q_sampling_temperature_mass",  # 1-row normalizer broadcast cross per temperature
    "q_energy_distance",  # 64x64 sample-bounded pair blocks (never corpus-quadratic)
    "q_mmd_rbf",  # 64x64 sample-bounded kernel blocks (never corpus-quadratic)
    "q_recall_at_k",  # + 3-row k-grid fan-out
    "q_retrieval_diversity",
    "q_region_flow_matrix",  # 1-row grand-total broadcast cross (share denominator)
    "q_weekday_effect",  # 1-row revenue-total broadcast cross (index denominator)
    "q_hour_of_day_profile",  # 1-row totals broadcast cross (share + peak/trough)
    "q_skew_salting_plan",  # 1-row totals + 1-row heaviest-key broadcast crosses
}
# filters that legitimately can't reach parquet: post-window rank
# filters, OR-of-regex predicates, computed-similarity thresholds
KNOWN_UNPUSHABLE = {
    # full-corpus scan by design (power iteration touches every vector);
    # the only Filter in the plan is the post-explode null guard
    "q_pca_power_iteration",
    # r13 rewrites: full-table scans by design; the only Filters are on
    # COMPUTED columns — two_nn's r1/r2 come out of the per-block
    # pandas NN walk, spearman's are join-key null guards over the
    # cached projected slice. No source predicate exists to push.
    "q_two_nn_intrinsic_dim",
    "q_spearman_corr",
    "q_window_topk_orders",
    "q_window_analytics",  # percent_rank filter is post-window by nature
    "q_events_dedup_first",
    "q_like_filters",
    "q_near_dup_jaccard",
    "q_near_dup_jaccard_df_filtered",
    "q_minhash_lsh_pairs",
    # whole-corpus fingerprint/signature scans: the only filters are on
    # derived columns (hamming distance, band keys, id-mod batch split
    # applied after the persisted shingle explode) — nothing pushable
    "q_simhash_neardup",
    "q_incremental_dedup",
    # adjudicated VERDICT r5 "What's wrong #3" — each filters only on
    # derived columns, so nothing can reach the parquet scan:
    "q_embedding_neardup_lsh",  # LSH band-key equi-join + hamming cut
    "q_source_quota_sample",  # post-window per-source rank cut
    "q_unigram_kl_drift",  # filters on per-token KL contributions
    "q_countmin_heavy_hitters",  # joins/filters on derived sketch buckets only
    "q_minhash_error",  # filters on derived signature/band columns only
    "q_next_event_pairs",  # only filter is the post-lag NULL drop
    # control-plane query: filters hit the tiny __consumer_offsets JSON
    # commit log (group_id + last-writer-wins rank), never the data path
    "q_topic_consumer_lag",
    "q_backtest_folds",  # role filter is on the derived train/test tag
    # r13-opt: the deduped bipartite edge list is transient-persisted
    # (it feeds the degree aggregate AND the join probe), so the
    # parquet scan sits under an InMemoryRelation; the only Filters are
    # the post-aggregate degree band and the join null-guards on cached
    # columns — nothing was ever pushable (the distinct covers the
    # whole table by design)
    "q_link_prediction_aa",
    # r9: whole-table distinct-domain scans; the only Filters are the
    # blocked self-join's key conditions / the post-date_add null guard
    # — derived columns, nothing reaches the part/events scan
    "q_jaro_winkler_linkage",
    "q_rolling_mau_sketch",
    "q_cusum_changepoint",  # only filter is the post-window peak-rank cut
    "q_ewma_smoothing",  # only filter is the post-window recency-rank cut
    "q_l_diversity",  # only filter is the post-aggregation HAVING diversity cut
    "q_top_paths",  # only filter is the post-lead NULL drop (sequence tail)
    # filters only on derived columns: chunk duplicate counts / the
    # post-as-of-join inner-match null drop — nothing reaches the scan
    "q_cdc_chunk_dups",
    "q_resample_hourly_ffill",
    # r7 extensions — whole-table aggregations by design; every Filter
    # in the plan is on a derived column, so nothing can reach the scan:
    "q_k_anonymity",  # HAVING on the aggregated group size only
    "q_setsim_ppjoin",  # prefix-rank / jaccard cuts on derived shingles
    "q_bigram_lm_score",  # post-lead NULL drop on the derived bigram
    "q_bpe_pair_stats",  # length>=2 guard on the derived word explode
    "q_multimodal_router",  # routes on the sniffed-magic-bytes column
    "q_tfidf_top_terms",  # only filter is the post-window rank cut
    "q_ngram_containment",  # filters on derived containment/df only
    "q_scd2_history",  # only filter is the post-window dedup rank cut
    "q_dedup_survivorship",  # only filter is the post-window survivor cut
    "q_event_transitions",  # only filter is the post-lag NULL drop
    "q_cumulative_distinct_users",  # join-key null guard on a derived day column
    # whole-corpus model passes by design: the only filters are the
    # empty-word guard (bpe) / none (KM aggregates every order; logreg
    # folds every embedding row into the gradient)
    "q_kaplan_meier",
    "q_logreg_gd",
    "q_bpe_learn",
    "q_tokenizer_apply",
    # whole-series pass: the only filter is the post-lag NULL drop
    "q_seasonal_mase",
    # whole-table dominance pass: the only filter is the post-window
    # frontier cut on the derived running cummax
    "q_skyline_orders",
    # all 25 catalog rows ARE the hypothesis set; the BH rejection cut
    # is on the derived rank-vs-threshold columns, nothing pushable
    "q_bh_fdr",
    # whole-table weighted quantile: the only filter is the cumulative
    # 2*cumw >= W median test on derived window columns
    "q_weighted_median",
    # whole-table activity rollup: every event counts toward DAU/WAU,
    # nothing to push
    "q_dau_wau_stickiness",
    # whole-table key profiling: every row counts toward the skew stats;
    # the only filter is the cumulative-walk median cut
    "q_key_skew_report",
    # r9: whole-table model/series passes by design — the only filters
    # are post-window NULL drops (trend edges, lead tails) or derived
    # guards; every row feeds the estimator
    "q_modularity_score",
    "q_classical_decomposition",
    "q_silhouette",
    # whole-table life table by design: every customer feeds the
    # at-risk counts; the only filter is the derived d>0 event-time cut
    "q_logrank_test",
    # bidirectional nearest needs ALL event types in the window frame;
    # the purchase filter is necessarily post-window
    "q_nearest_event_join",
    # whole-series randomness test: the only filter is the derived
    # x <> median sign cut on the day curve
    "q_runs_test",
    # manifest covers EVERY document; the only filter is the derived
    # per-shard head cut (rn <= 3) on the output
    "q_shard_manifest",
    # whole-series signal scan: the only filters are the derived
    # full-window guard and the post-lag sign-change cut
    "q_ma_crossover",
    # whole-series forecast eval: the only filter is the post-lag
    # 24h-warmup NULL drop
    "q_pinball_loss",
    # r9 restart wave: whole-table passes; the only filters are the
    # derived boundary-crossing / threshold-grid cuts
    "q_sprt_stopping",
    "q_best_split_infogain",
    "q_udtf_ngrams",
    # whole-table passes: the only filters are the derived post-lead
    # interval drop (TWAP) / running-budget cutoff (selection)
    "q_twap",
    "q_budgeted_selection",
    # r10: filters only on derived window columns (full-window count
    # guards, post-lag NULL drops) / the 25-row catalog — unpushable
    "q_bollinger_bands",
    "q_rsi_simple",
    "q_holm_bonferroni",
    # the trailing-28-day cut is against the derived max-date anchor —
    # a cross-join column, nothing can reach the scan
    "q_l28_engagement",
    "q_theil_u2",  # only filter is the post-lag warmup NULL drop
    # keyed-lag chains: the only filter is the post-lag/lead NULL drop
    "q_transition_entropy",
    "q_interarrival_cv",
    # join keys are the derived CASE-NULL column — nothing pushable
    "q_null_safe_join",
    # whole-cohort survival pass; the only filters are derived
    "q_rmst",
    # whole-corpus token explode; the only filters are the empty-token
    # guard and the derived top-K rank cut
    "q_tokenizer_oov_rate",
    # only filter is the derived multi-event session cut (n_events >= 2)
    "q_entry_exit_matrix",
    # only filters are the derived censoring / extrema-band cuts
    "q_churn_hazard",
    "q_peak_detection",
    # whole-corpus token explode; only the empty-token guard filters
    "q_sampling_temperature_mass",
    "q_yules_k",
    "q_hapax_profile",
    # whole-table monthly rollup; only the k>=3 month-count guard filters
    "q_xyz_classification",
    # daily-series rollup; only the derived test-window cut filters
    "q_forecast_accuracy",
    "q_page_hinkley",
    "q_friedman_seasonality",
    # whole-corpus embedding scan; nothing filters by design
    "q_isotropy_audit",
    # customer-month rollup; only the derived consecutive-month guard filters
    "q_revenue_retention",
    "q_first_difference",
    # whole-corpus token/char explodes; only the empty/short guards filter
    "q_keyword_textrank",
    "q_char_trigram_entropy",
    "q_pmi_collocations",
    # whole-stream lead fan-out; only the trailing-null guard filters
    "q_event_trigram_patterns",
    # whole-stream retry lags; only derived prev/gap guards filter
    "q_retry_amplification",
    "q_retry_success",
    "q_transition_durations",
    "q_mtbf_mttr",
    "q_availability",
    "q_error_bursts",
    # degree rollup; only the derived dmin tail cut filters
    "q_powerlaw_fit",
    # whole-table fits; only md5 fold/bag guards filter
    "q_kfold_cv",
    "q_bagged_stumps",
    # whole-corpus selection; only the derived budget cut filters
    "q_knapsack_bound",
    # pinned-score top-k scans; only the depth cut filters
    "q_rbo_lists",
    # k-row fused-shortlist pair scan; only the self-pair guard filters
    "q_condorcet_fusion",
    # grid-cell rollup; only the boundary-offset guard filters
    "q_hotspot_gi",
    # full-series scans; only the derived min-segment position cut filters
    "q_binseg_sse",
    # full-series scans; only the derived holdout-split position cut filters
    "q_forecast_combination",
    # full-series scans; only the derived lag-null guard filters
    "q_breusch_godfrey",
    "q_hodges_lehmann",
    "q_sign_test",
    "q_omega_ratio",
    "q_kelly_fraction",
    "q_turning_points_test",
    # whole-table median walk; only the derived cum-position cut filters
    "q_mood_median_test",
    "q_sample_quantile_error",
    # whole-table digit/threshold screens; only derived cent guards filter
    "q_benford_second_digit",
    "q_structuring_screen",
    # whole-cohort span fold; only the derived tenure-grid join guard filters
    "q_sbg_retention_fit",
    # whole-table IVM splits; only the derived max-month delta cut filters
    "q_topk_buffer_maintenance",
    # whole-table bid ranks; only derived rank/bid-count guards filter
    "q_second_price_revenue",
    # whole-table locality folds; only derived lag/rank guards filter
    "q_reuse_distance",
    # whole-corpus length/bigram folds; only cum/empty-token guards filter
    "q_kv_cache_budget",
    "q_speculative_decode_gain",
    "q_hot_set_stability",
    # payoff-matrix scans; only derived action-pick guards filter
    "q_minimax_regret",
    "q_stochastic_dominance",
    "q_reserve_price_sweep",
    "q_revenue_equivalence_check",
    "q_agg_retraction",
    "q_diebold_mariano",
    "q_interval_coverage",
    # full-spectrum scan; only the derived zero-power guard filters
    "q_spectral_entropy",
    # whole-cohort lifetime rollups; only derived censor/hazard guards filter
    "q_cumulative_incidence",
    # whole-corpus token explode; only the derived full-segment cut filters
    "q_sttr",
    # whole-corpus gram explode; only derived trailing-gram/window guards filter
    "q_winnowing_fingerprints",
    # whole-vocab count-of-counts folds; only the empty-token guard filters
    "q_chao1_richness",
    # whole-table monthly rollup; only the derived k>=3 eligibility cut filters
    "q_abc_xyz_matrix",
    "q_good_turing_mass",
    "q_gompertz_fit",
    "q_variance_changepoint",
    # full-series scans; the only filter is the derived lag-null guard
    "q_calinski_harabasz",
    "q_var_cvar",
    "q_sharpe_sortino",
    # whole-table regressions; only derived lag/coef guards filter
    "q_breusch_pagan",
    "q_granger_lite",
}
# Queries whose plans contain a Window with NO partition spec that is
# ADJUDICATED: the window's input is provably bounded (a curve-sized
# intermediate — hourly/daily series, deciles, k-row grids, post-
# aggregation tie tables), never the corpus-sized table. A global
# window over raw-table-sized input is a single-task sort — the
# anti-pattern the r9 verdict flagged — and is NOT allowlistable;
# fix it with _dist_rank/_dist_cumsum (extensions_r8.py) instead.
# KNOWN BLIND SPOT: localCheckpoint() truncates the audited plan, so
# windows that run DURING checkpoint materialization (e.g. the lead
# fan-out inside q_acf_hourly) are invisible here; the checkpoint
# sites in the repo are the _dist_rank/_dist_cumsum internals (keyed
# by __pid, fine) and calendar-bounded curve builds.
# Adjudicated r10 by sweeping all 386 plans: every entry's global
# window runs over one of (a) a distinct-VALUE tie table (bounded by
# value cardinality, not row count — the q_auc_roc precedent), (b) a
# calendar-bounded series (hours/days/months of the fixture window),
# or (c) a k-row grid/curve. NOT allowlistable: a window over a
# row-count-sized table (q_skyline_orders and q_abc_classification
# were exactly that and were fixed with _dist_cummax_prev /
# _dist_cumsum in r10 rather than listed here).
ALLOWED_GLOBAL_WINDOW: dict[str, str] = {
    # (a) distinct-value tie tables / value-domain walks
    # (r12) q_spearman_corr / q_kruskal_wallis / q_wilcoxon_signed_rank /
    # q_pr_auc / q_time_to_convert / q_mood_median_test /
    # q_conover_squared_ranks / q_sample_quantile_error were REMOVED
    # from this list: the bounded-domain probe measured their tie
    # tables at row/user cardinality (10x per 10x data; pr_auc's
    # scores are all-distinct by construction), so they were rewritten
    # on _dist_cumsum / _dist_rank_cumsum and no longer plan a global
    # window at all (scripts/probe_bounded_domains.py).
    "q_mann_whitney": "rank walk over the distinct-value tie table",
    "q_ks_test": "CDF steps over the distinct-value table",
    "q_wasserstein_1d": "ECDF-gap integral over the distinct-value tie table",
    "q_impute_missing": "global-median walk over the distinct-value table",
    "q_key_skew_report": "median walks over count-of-counts tables (multiplicity domain)",
    "q_t_closeness": "EMD walk over the distinct sensitive-value distribution",
    "q_best_split_infogain": "threshold-grid walk (19 candidate cuts)",
    "q_tokenizer_oov_rate": "top-K rank over the vocabulary table (vocab-cardinality-bounded)",
    "q_isotonic_calibration": "PAVA algebra over the 20-bin interval table",
    "q_rmst": "KM-curve segment walk (distinct-duration table, the q_kaplan_meier adjudication)",
    "q_weibull_fit": "survival cumulative over the distinct-duration tie table",
    "q_classification_report": "rank walk over the k-row class table",
    # (b) calendar-bounded series
    "q_classical_decomposition": "hourly series windows (fixture-calendar-bounded)",
    "q_ccf_lagged": "hourly series lag join",
    "q_runs_test": "sign-run walk over the daily series",
    "q_durbin_watson": "lag-1 walk over the daily residual series",
    "q_yoy_growth": "lag walk over the monthly series",
    "q_ma_crossover": "moving averages over the daily series",
    "q_pinball_loss": "seasonal-naive lag over the hourly series",
    "q_slo_burn_rate": "burn windows over the hourly error series",
    "q_cumulative_distinct_users": "cumulative over the daily first-seen curve",
    "q_rolling_mau_sketch": "30-day window over the daily HLL sketch table",
    "q_kaplan_meier": "survival product over the distinct event-time table",
    "q_nelson_aalen": "hazard cumsum over the distinct event-time table",
    "q_logrank_test": "at-risk walk over the distinct event-time table",
    "q_churn_hazard": "at-risk suffix walk over the bounded tenure-week curve",
    "q_peak_detection": "lag/lead extrema over the daily series",
    "q_bollinger_bands": "rolling 7-day frame over the daily close series",
    "q_rsi_simple": "lag + rolling 14-day frame over the daily close series",
    "q_theil_u2": "two lags over the daily count series (calendar-bounded)",
    "q_granger_lite": "two lags over the daily event series (calendar-bounded)",
    "q_page_hinkley": "cumsum + running min over the daily series (calendar-bounded)",
    "q_forecast_accuracy": "lags + rank over the daily count series (calendar-bounded)",
    "q_theta_method": "rank over the daily count series (calendar-bounded)",
    "q_var_cvar": "lag over the daily revenue series (calendar-bounded)",
    "q_sharpe_sortino": "lag over the daily revenue series (calendar-bounded)",
    "q_capm_beta": "market-series lag (daily, calendar-bounded); nation lags are partitioned",
    # (c) k-row grids / curves / manifests
    "q_bh_fdr": "rank over the 25-row hypothesis catalog",
    "q_holm_bonferroni": "rank + running max over the 25-row hypothesis catalog",
    "q_bootstrap_ci": "percentile walk over the B-row resample stats",
    "q_box_cox": "rank over the 5-row lambda grid",
    "q_neyman_allocation": "largest-remainder walk over the strata table",
    "q_rrf_fusion": "ranks over two k-row retrieval shortlists",
    "q_lift_table": "cumulative over the 10-row decile curve",
    "q_topk_stability": "rank windows over the two 20-row post-limit top-k lists",
    "q_rbo_lists": "rank windows over the two 20-row post-limit lists",
    "q_err_metric": "cascade walk over the 20-row post-limit list",
    "q_retriever_overlap": "rank windows over the two 20-row post-limit lists",
    "q_lorenz_curve": "cumulative over the 10-row decile curve",
    "q_clustered_write_audit": "overlap test over the per-file manifest rows",
    "q_bornhuetter_ferguson": "CDF suffix product over the calendar-bounded dev-factor ladder",
    "q_pettitt_test": "value rank + time cumsum over the daily series (calendar-bounded)",
    "q_binseg_sse": "decimal prefix sums over the daily series (calendar-bounded)",
    "q_variance_changepoint": "decimal prefix sums over the daily series (calendar-bounded)",
    "q_adstock_elasticity": "8 adstock lags over the daily series (calendar-bounded)",
    "q_life_table": "at-risk suffix + survival prefix over the 14-row interval curve",
    "q_mean_cumulative_function": "MCF prefix over the 13-row tenure curve",
    "q_dhondt_allocation": "rank over the 25x64 quotient grid (k-row)",
    "q_sainte_lague_allocation": "rank over the 25x64 quotient grid (k-row)",
    "q_hamilton_allocation": "remainder walk over the 25-row quota table",
    "q_kv_cache_budget": "percentile walk over the distinct doc-length tie table",
    "q_engle_granger": "lag over the monthly pair series (calendar-bounded)",
    "q_error_correction": "lags over the monthly pair series (calendar-bounded)",
    "q_var1_fit": "lags over the monthly pair series (calendar-bounded)",
    "q_evpi": "decile fill over the daily demand series (calendar-bounded; plan repeats the subtree)",
    "q_minimax_regret": "decile fill over the daily demand series (calendar-bounded; plan repeats the subtree)",
    "q_stochastic_dominance": "decile fill over the daily demand series (calendar-bounded; plan repeats the subtree)",
    "q_cumulative_incidence": "KM walk over the distinct lifetime-month table (q_kaplan_meier adjudication)",
    "q_gompertz_fit": "at-risk suffix walk over the distinct lifetime-month table",
    "q_forecast_combination": "row_number split over the daily series (calendar-bounded)",
    "q_diebold_mariano": "row_number split + lag over the daily holdout series",
    "q_interval_coverage": "row_number split over the daily series (calendar-bounded)",
    "q_white_test": "row_number index over the daily series (calendar-bounded)",
    "q_breusch_godfrey": "row_number index + residual lag over the daily series",
    "q_ramsey_reset": "row_number index over the daily series (calendar-bounded)",
    "q_borda_fusion": "rank windows over the three 20-row post-limit lists",
    "q_condorcet_fusion": "rank windows over the three 20-row post-limit lists",
    "q_bpref": "nonrel-above prefix over the 20-row post-limit judged list",
    "q_metric_rank_agreement": "rank windows over the two 20-row post-limit lists",
    "q_hodges_lehmann": "Walsh-average median walk over the calendar-bounded pair domain",
    "q_sign_test": "lag-7 over the daily series (calendar-bounded)",
    "q_omega_ratio": "lag over the daily series (calendar-bounded)",
    "q_ulcer_index": "running peak over the daily series (calendar-bounded)",
    "q_kelly_fraction": "lag over the daily series (calendar-bounded)",
    "q_novelty_trend": "row_number index over the daily lift series (calendar-bounded)",
    "q_peeking_path": "cumulative z path over the daily lift series (calendar-bounded)",
    "q_von_neumann_ratio": "lag over the daily series (calendar-bounded)",
    "q_turning_points_test": "lag/lead over the daily series (calendar-bounded)",
}

# row-at-a-time Python is the point of these two (surface demos)
KNOWN_PYTHON = {"q_row_udf_bucket", "q_udtf_explode_words", "q_udtf_ngrams"}
# streaming queries materialize through a memory sink — plan of the
# returned batch DF is just a LocalTableScan, skip the audit
SKIP = {n for n in all_queries() if n.startswith("q_stream_")} | {
    "q_topic_list_offsets",
    "q_topic_fetch_range",
}


def global_window_lines(plan: str) -> list[str]:
    """Physical-plan lines for Window/WindowInPandas nodes with an
    EMPTY partition spec. Render format (Spark 4): a partitioned+
    ordered window prints ``Window [exprs], [partSpec], [orderSpec]``
    (two '], [' separators); with only ONE trailing spec group it is
    either ``[exprs], [orderSpec]`` (GLOBAL window — flag) or
    ``[exprs], [partSpec]`` (partition-only frame, e.g. min() over
    partition — fine). The two are told apart by the sort-direction
    tokens an orderSpec always carries (``ASC/DESC NULLS``).
    WindowGroupLimit nodes are skipped — they are the bounded top-k
    pushdown, not a sort."""
    out = []
    for line in plan.splitlines():
        if "WindowGroupLimit" in line:
            continue
        if not re.search(r"\b(Window|WindowInPandas) \[", line):
            continue
        if line.count("], [") == 1 and re.search(
            r"(ASC|DESC) NULLS (FIRST|LAST)[^,\]]*\]\s*$", line.rstrip()
        ):
            out.append(line.strip())
    return out


def audit(name: str, plan: str) -> list[str]:
    flags = []
    if "CartesianProduct" in plan and name not in ALLOWED_NLJ:
        flags.append("CartesianProduct")
    if "BroadcastNestedLoopJoin" in plan and name not in ALLOWED_NLJ:
        flags.append("BroadcastNestedLoopJoin")
    scans = plan.count("Scan parquet")
    if scans and "PushedFilters: [" in plan and name not in KNOWN_UNPUSHABLE:
        empties = len(re.findall(r"PushedFilters: \[\]", plan))
        if empties == scans and ("Filter " in plan):
            flags.append("no pushed filters on any scan")
    if "*(" not in plan and "WholeStageCodegen" not in plan and "Scan parquet" in plan:
        flags.append("no WholeStageCodegen")
    if "BatchEvalPython" in plan and name not in KNOWN_PYTHON:
        flags.append("row-at-a-time Python (BatchEvalPython)")
    if name not in ALLOWED_GLOBAL_WINDOW:
        gw = global_window_lines(plan)
        if gw:
            flags.append(f"global (no-partition) Window x{len(gw)}")
    return flags


def rotating_slice(k: int = 25) -> list[str]:
    """A deterministic k-query slice of the auditable registry that
    ADVANCES each round (VERDICT r10 #3): offset = round_number * k into
    the sorted name list, wrapping — so every query's plan gets
    machine-checked by pytest within ceil(N/k) rounds, with no
    randomness (same round → same slice, reproducible failures). The
    round number is read from the newest CORRECTNESS_r*.json the driver
    has written (0 if none — fresh checkouts audit the list head)."""
    import glob
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rounds = []
    for p in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", p)
        if m:  # glob is looser than the regex (e.g. *_draft.json) — skip those
            rounds.append(int(m.group(1)))
    rnd = max(rounds, default=0)
    names = sorted(n for n in all_queries() if n not in SKIP)
    if not names:
        return []
    off = (rnd * k) % len(names)
    return (names + names)[off : off + min(k, len(names))]


def run_audit(
    name_filters: list[str] | None = None,
    full: bool = False,
    stats: dict | None = None,
    exact_names: set[str] | None = None,
) -> dict[str, list[str]]:
    """Audit every (or the filtered) registered query's executed plan.
    Returns {query_name: flags} for queries that flagged — a FAILING
    gate for callers (main exits non-zero; tests assert empty). When
    given, `stats` is filled with audited/skipped counts so callers can
    record a coverage artifact (PLAN_AUDIT.json)."""
    spark = shared_spark()
    flagged: dict[str, list[str]] = {}
    audited = 0
    for name, spec in all_queries().items():
        if name in SKIP:
            continue
        if exact_names is not None and name not in exact_names:
            continue
        if name_filters and not any(f in name for f in name_filters):
            continue
        df = spec.spark(spark, SF_DIR)
        df.collect()  # materialize so AQE finalizes the plan (codegen visible)
        plan = df._jdf.queryExecution().executedPlan().toString()
        # AQE toString includes both final and initial plans; audit the final
        if "== Initial Plan ==" in plan:
            plan = plan.split("== Initial Plan ==")[0]
        flags = audit(name, plan)
        if flags:
            flagged[name] = flags
        audited += 1
        n_exch = plan.count("Exchange")
        print(f"{name}: exchanges={n_exch} flags={flags or 'none'}")
        if full or flags:
            print(df._jdf.queryExecution().simpleString()[:4000])
            print("-" * 70)
    if stats is not None:
        stats["audited"] = audited
        stats["skipped_streaming_memsink"] = len(SKIP)
        stats["registry_total"] = len(all_queries())
    return flagged


def main() -> None:
    """CLI: `python scripts/explain_audit.py [name_filter...] [--full]
    [--json PATH]`. With no filters it sweeps the FULL registry; --json
    records the coverage artifact (VERDICT r10 #3: the full-sweep result
    must live in a committed file, not session notes)."""
    argv = sys.argv[1:]
    json_path = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv) or argv[i + 1].startswith("--"):
            sys.exit("usage: explain_audit.py [name_filter...] [--full] --json PATH")
        json_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    args = [a for a in argv if not a.startswith("--")]
    stats: dict = {}
    flagged = run_audit(args, full="--full" in argv, stats=stats)
    if json_path:
        import datetime
        import json as _json

        artifact = {
            "sf_dir": SF_DIR,
            "date": datetime.date.today().isoformat(),
            "name_filters": args or None,
            # skipped/registry_total are GLOBAL figures; this flag says
            # whether `audited` actually covered registry_total - skipped
            "full_sweep": not args,
            **stats,
            "flagged": flagged,
        }
        with open(json_path, "w") as f:
            _json.dump(artifact, f, indent=2, sort_keys=True)
            f.write("\n")
        print(f"wrote {json_path}: {stats}")
    if flagged:
        print(f"\nPLAN AUDIT FAILED: {len(flagged)} flagged query(ies):")
        for n, fl in flagged.items():
            print(f"  {n}: {fl}")
        sys.exit(1)
    print(f"\nplan audit clean ({stats.get('audited', 0)} plans)")


if __name__ == "__main__":
    main()
