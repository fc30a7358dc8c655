"""Query registry: the engine's declared query inventory.

Every operator/query from SURVEY §2 that we implement registers here as
a (Spark callable, ANSI-SQL oracle) pair. The driver's correctness gate
runs both sides at sf0.01 and hash-matches values, so:

- every computed/aggregate column is ALIASED identically on both sides;
- computed doubles are ROUNDed (identically on both sides) so the two
  engines produce bit-identical values;
- every ranking/limit has a unique-key tiebreaker so the selected row
  SET is deterministic across engines;
- queries with genuinely non-SQL-expressible semantics register with
  ``oracle=None`` (driver records a weaker rows-only check).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}

#: plan modules that populate the registry on import
_PLAN_MODULES = (
    "stacktrend_spark.plans.relational",
    "stacktrend_spark.plans.windows",
    "stacktrend_spark.plans.scalars",
    "stacktrend_spark.plans.merge_shapes",
    "stacktrend_spark.plans.gold_mirrors",
    "stacktrend_spark.plans.northstar",
    "stacktrend_spark.plans.streaming_mirrors",
    "stacktrend_spark.plans.statistics",
    "stacktrend_spark.plans.temporal",
    "stacktrend_spark.plans.mlprep",
    "stacktrend_spark.plans.skew",
    "stacktrend_spark.plans.python_api",
    "stacktrend_spark.plans.behavioral",
    "stacktrend_spark.plans.formats",
    "stacktrend_spark.plans.curation",
    "stacktrend_spark.plans.clustering",
    "stacktrend_spark.plans.lakehouse",
    "stacktrend_spark.plans.linkage",
    "stacktrend_spark.plans.layout",
    "stacktrend_spark.plans.sql_surface",
    "stacktrend_spark.plans.graphrank",
    "stacktrend_spark.plans.reference_api",
    "stacktrend_spark.plans.sketches",
    "stacktrend_spark.plans.mlencode",
    "stacktrend_spark.plans.geo",
    "stacktrend_spark.plans.tpch_shapes",
    "stacktrend_spark.plans.selection",
    "stacktrend_spark.plans.dedup_audit",
    "stacktrend_spark.plans.resampling",
    "stacktrend_spark.plans.governance",
)


def register(name: str, oracle: str | None = None, doc: str = ""):
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


#: Driver-window rotation. The correctness driver records rows for the
#: FIRST 50 entries of queries() order only (observed rounds 1-2:
#: exactly registry indices 0-49 got CORRECTNESS rows). Driver-green
#: union after r2 = 92 distinct queries; this round's window pins
#: (a) the two r2-red rows after their fixes (gold_tech_metrics now
#: emits exact µ-unit BIGINTs; grouping_sets_orders casts its sum to
#: DOUBLE), (b) the four probe_tm_* bisection probes that re-register
#: round 2's float constructs column-by-column, and (c) every query
#: that has never been inside a driver window. Remaining slots go to
#: queries added this round. Long-green rows rotate to the back — they
#: are re-provable in any later round.
_PRIORITY: tuple[str, ...] = (
    # ROUND-7 WINDOW (r6 verdict task 1: unproven-first ordering).
    # After r6 the cumulative ledger is 224/318 driver-proven with
    # zero standing failures; 94 registered queries have never been
    # inside a driver window (all are r6 late-batch additions, all
    # local-replica green via tools/verify_local.py). This window
    # takes 50 of those 94, TPC-H Q-series and the ML-eval family
    # first per the verdict; the remaining 44 sit at positions
    # 51-94 and lead the r8 window, followed by ~10 stale-rotation
    # slots (r1/r2-era rows, oldest driver proof first — see
    # COVERAGE.md staleness ledger).
    # -- TPC-H optimizer shapes (16: completes driver proof of all
    #    22 classic shapes; q1/q3/q6/q13/q15/q18 proven r01-r06)
    "q2_min_cost_supplier",
    "q4_late_ship_priority",
    "q5_local_supplier_volume",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_nation_profit",
    "q10_returned_items",
    "q11_important_parts",
    "q12_shipmode_priority",
    "q14_promo_revenue",
    "q16_supplier_variety",
    "q17_small_qty_revenue",
    "q19_disjunctive_filter",
    "q20_dominant_suppliers",
    "q21_waiting_suppliers",
    "q22_dormant_customers",
    # -- ML-eval / feature-engineering family (12)
    "model_eval_auc",
    "model_calibration_ece",
    "gbdt_split_histogram",
    "model_gains_deciles",
    "psi_feature_drift",
    "churn_training_assembly",
    "pipeline_feature_store",
    "negative_sampling_pairs",
    "kfold_balance_audit",
    "isotonic_calibration_minimax",
    "hybrid_rrf_fusion",
    "naive_bayes_lang_confusion",
    # -- statistics family (12)
    "moments_skew_kurtosis",
    "benford_leading_digit",
    "spearman_rank_corr",
    "bootstrap_ci_revenue",
    "theilsen_mann_kendall",
    "wilson_lcb_category_ranking",
    "cohens_kappa_raters",
    "cohens_d_segments",
    "abtest_two_proportion_z",
    "ols_two_feature_cramer",
    "ols_slope_by_nation",
    "entropy_kl_priority_mix",
    # -- graph family (5)
    "hits_hubs_authorities",
    "label_propagation_communities",
    "clustering_coefficient_topk",
    "degree_assortativity",
    "powerlaw_degree_fit",
    # -- time-series family (5)
    "acf_daily_revenue",
    "holt_level_trend",
    "cusum_changepoint",
    "stl_lite_decompose",
    "rolling_correlation_14d",
    # -- position 51+: NOT in the r7 window (driver reads the first
    # 50). These are the remaining 44 never-driver-proven rows —
    # they lead the r8 window, then ~6 stale-rotation slots
    # (q1_pricing_summary, join_*, scalar_* from r1 — COVERAGE.md).
    "dedup_incremental_batch",
    "er_sorted_neighborhood",
    "hll_register_sketch",
    "k_anonymity_audit",
    "capped_running_balance",
    "attribution_first_last_touch",
    "band_join_price_pairs",
    "partition_skew_audit",
    "phrase_match_positions",
    "stream_hll_daily_users",
    "outlier_mahalanobis_2d",
    "dbscan_grid_clusters",
    "golden_record_survivorship",
    "assoc_rules_lift",
    "pca_power_iteration",
    "survival_km_curve",
    "bloom_filter_membership",
    "seq_pattern_trigrams",
    "stream_full_outer_attribution",
    "item_item_collab_filter",
    "dtw_nation_revenue",
    "multimodal_image_dhash",
    "mutual_info_pmi_cells",
    "l_diversity_audit",
    "isoweek_rollup_parity",
    "stl_residual_outliers",
    "lang_centroid_similarity",
    "collocation_pmi_topk",
    "gdpr_subject_access_export",
    "conversion_latency_quantiles",
    "huffman_code_cost",
    "join_cardinality_estimate",
    "bloom_prejoin_pruning",
    "quantile_drift_boundaries",
    "dispersion_index_basket",
    "forecast_backtest_snaive",
    "session_type_affinity",
    "interevent_burstiness",
    "capture_recapture_estimate",
    "lexical_diversity_by_source",
    "vocab_coverage_curve",
    "array_hof_cosine_topk",
    "zorder_vs_linear_skipping",
    "recursive_amortization_native",
    # -- r7 additions (plans/selection.py): join the never-proven queue
    # behind the 44 above; changed-in-r7 rows (dedup_simhash_hamming's
    # filter-first rewrite) also belong in the r8 window.
    "c4_boilerplate_ngrams",
    "quality_budget_cut",
    "curriculum_stage_assign",
    "ngram_novelty_decay",
    "dedup_containment_star",
    "source_leakage_matrix",
    "max_word_run_lengths",
    "dedup_cluster_stats",
    "feature_hashing_trick",
    "t_closeness_audit",
    "corpus_datasheet",
    "minhash_band_tuning",
    "source_corrupt_record_routing",
    "dedup_simhash_hamming",
    # -- r7 additions (plans/resampling.py)
    "dsir_importance_resampling",
    "unigram_surprisal_filter",
    "tokenizer_fertility_panel",
    # -- r7 additions (plans/governance.py)
    "fairness_demographic_parity",
    "conformal_calibration_quantile",
    "woe_information_value",
    # -- r7 additions (plans/clustering.py embeddings batch)
    "matryoshka_truncation_agreement",
    "jl_projection_distortion",
    # -- r7 additions (plans/statistics.py omnibus tests)
    "anova_oneway_f",
    "kruskal_wallis_h",
    # -- r7 additions (plans/statistics.py experimentation batch)
    "cuped_variance_reduction",
    "did_revenue_estimator",
    "srm_allocation_check",
    # -- r7 additions (plans/streaming_mirrors.py)
    "stream_cms_event_counters",
    # -- r7 additions (IR + deterministic sketch)
    "query_likelihood_dirichlet",
    "misra_gries_summary",
    # -- r7 additions (native session window + snippet)
    "session_window_native_batch",
    "snippet_best_window",
    "decayed_halflife_trending",
    "fellegi_sunter_weights",
    "grouped_applyinarrow_iqr",
    "source_python_datasource",
    "source_dynamic_partition_pruning",
    "observed_metrics_noop_sink",
    "retrieval_ndcg_eval",
    "attribution_position_based",
    "geo_point_in_polygon",
    "stream_scd2_asof_enrichment",
    "multimodal_scene_diff",
    "neyman_allocation_plan",
    "parameterized_sql_binding",
    "arrow_scalar_udf_luhn",
    "pinball_loss_quantile_eval",
    "merge_full_sync_orders",
    "running_max_drawdown",
)


def priority_gaps() -> list[str]:
    """_PRIORITY names with no registered query (should be empty; a
    pytest enforces it so a typo can't silently drop a window slot)."""
    for mod in _PLAN_MODULES:
        importlib.import_module(mod)
    return [n for n in _PRIORITY if n not in _REGISTRY]


def all_queries() -> dict[str, QuerySpec]:
    for mod in _PLAN_MODULES:
        importlib.import_module(mod)
    # Skip (don't raise on) unregistered priority names: the driver
    # calls this at an arbitrary commit, and a mid-build typo must cost
    # one window slot, not the whole correctness round.
    ordered = {n: _REGISTRY[n] for n in _PRIORITY if n in _REGISTRY}
    ordered.update((n, s) for n, s in _REGISTRY.items() if n not in ordered)
    return ordered
