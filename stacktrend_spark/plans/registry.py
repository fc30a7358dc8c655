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
    "stacktrend_spark.plans.pretrain_mix",
)


def register(name: str, oracle: str | None = None, doc: str = ""):
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


#: Driver-window rotation. The correctness driver records rows for the
#: FIRST 50 entries of queries() order only (observed every round:
#: exactly registry indices 0-49 get CORRECTNESS rows). Long-green
#: rows rotate to the back — they are re-provable in any later round.
_PRIORITY: tuple[str, ...] = (
    # ROUND-9 WINDOW (r8 verdict task 1: drain the 58-row never-driven
    # backlog below one driver window; cap r9 registry growth at ~10).
    # After r8 the cumulative ledger is 324/382 driver-proven with zero
    # standing failures; 58 rows have never been inside a driver
    # window (42 r7-era + 16 r8 additions), plus dedup_simhash_hamming
    # whose r7 filter-first rewrite postdates its last (r5) driver
    # proof. This window = that re-prove + all 42 r7-era rows + the 7
    # heaviest r8 rows (the verdict-named bpe/pq/cluster-split trio
    # plus the pretrain-mix panel and the SPRT monitor). The remaining
    # 9 r8 rows sit at 51+ and lead the r10 window, followed by the
    # stale-rotation pool (r1/r2-era rows, oldest driver proof first —
    # COVERAGE.md staleness ledger); r9 additions are capped so
    # never-driven ≤ 15 at round end.
    # -- re-prove: code changed (r7) after last driver proof (r5) --
    "dedup_simhash_hamming",
    # -- the 42 r7-era never-driven rows --
    "c4_boilerplate_ngrams",
    "quality_budget_cut",
    "curriculum_stage_assign",
    "ngram_novelty_decay",
    "max_word_run_lengths",
    "dedup_cluster_stats",
    "feature_hashing_trick",
    "t_closeness_audit",
    "corpus_datasheet",
    "minhash_band_tuning",
    "source_corrupt_record_routing",
    "dsir_importance_resampling",
    "unigram_surprisal_filter",
    "tokenizer_fertility_panel",
    "fairness_demographic_parity",
    "conformal_calibration_quantile",
    "woe_information_value",
    "jl_projection_distortion",
    "anova_oneway_f",
    "kruskal_wallis_h",
    "cuped_variance_reduction",
    "did_revenue_estimator",
    "srm_allocation_check",
    "stream_cms_event_counters",
    "query_likelihood_dirichlet",
    "misra_gries_summary",
    "session_window_native_batch",
    "snippet_best_window",
    "decayed_halflife_trending",
    "fellegi_sunter_weights",
    "grouped_applyinarrow_iqr",
    "source_python_datasource",
    "observed_metrics_noop_sink",
    "retrieval_ndcg_eval",
    "attribution_position_based",
    "geo_point_in_polygon",
    "stream_scd2_asof_enrichment",
    "neyman_allocation_plan",
    "parameterized_sql_binding",
    "arrow_scalar_udf_luhn",
    "pinball_loss_quantile_eval",
    "running_max_drawdown",
    # -- the 7 heaviest r8 additions (close the 50-row window) --
    "bpe_merge_unrolled",
    "pq_codebook_train_iter",
    "cluster_aware_split",
    "gopher_quality_rules",
    "ngram_entropy_profile",
    "mixture_temperature_weights",
    "sprt_sequential_monitor",
    # -- position 51+: NOT in the r9 window (driver reads the first
    # 50). Changed-code re-prove first (r9 DF-cap rewrite of the
    # lexical leg postdates its r7 proof), then the 9 remaining r8
    # additions — together they lead the r10 window --
    "hybrid_rrf_fusion",
    "brier_score_decomposition",
    "bh_fdr_segment_tests",
    "ann_nprobe_recall_sweep",
    "embedding_norm_outliers",
    "anti_join_null_semantics",
    "snapshot_retention_expiry",
    "rfm_migration_matrix",
    "mode_imputation_nulls",
    "multimodal_vad_segments",
    # -- r9 additions (cap ~6 so never-driven ≤ 15 at r9 end) append
    # here as they land --
    "dedup_semdedup_pairs",
    "semdedup_recall_eval",
    "rank_biased_overlap_eval",
    "dedup_substring_spans",
    "kneser_ney_bigram_lm",
    # -- stale-rotation pool (oldest driver proof first; fills the
    # rest of the r10 window after the rows above) --
    "dedup_ngram_jaccard",  # r1 — the single oldest proof
    # the 35 r2-proven rows (COVERAGE.md staleness ledger)
    "agg_argminmax_orders",
    "agg_percentiles",
    "agg_regression",
    "agg_string_concat_langs",
    "cogroup_reconcile",
    "cohort_retention_weekly",
    "cube_revenue",
    "funnel_signup_conversion",
    "histogram_value_buckets",
    "langdist_shares",
    "map_hof_lang_shares",
    "multimodal_features",
    "outlier_iqr_filter",
    "pipeline_corpus_curation",
    "range_join_halfday_windows",
    "resample_daily_gapfill",
    "sample_stratified_hash",
    "set_intersect_except",
    "skew_salted_agg",
    "skew_salted_join",
    "split_train_test",
    "stream_dedup_events",
    "stream_session_windows",
    "stream_sliding_2d",
    "stream_tumbling_daily",
    "text_fingerprint",
    "text_language_id",
    "text_levenshtein_pairs",
    "text_quality",
    "text_regex_tokens",
    "text_tfidf_topk",
    "text_token_stats",
    "udtf_bigrams",
    "window_lead_ntile",
    "zorder_layout_stats",
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
