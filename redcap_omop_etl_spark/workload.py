"""The declared workload: named queries + their DuckDB oracle SQL.

Each entry pairs a Spark implementation (``fn(spark, sf_dir) -> DataFrame``)
with an equivalent ANSI-SQL string the driver runs through DuckDB on the
same parquet tables. Column names/aliases match exactly on both sides (the
driver's compare sorts columns by name before value-hashing).

Conventions for hash-stable cross-engine results:
- Aggregates over doubles are ``round()``-ed (2dp for money sums, 6dp for
  ratios) on BOTH sides — double summation order differs between engines.
- Timestamps returned to the driver are formatted to strings on both sides
  (Spark session TZ is pinned UTC; DuckDB is UTC-naive).
- Every computed column is aliased identically on both sides.
- NO uncast integer aggregates in an oracle's OUTPUT columns: DuckDB
  ``sum()`` over any integer type returns HUGEINT, which pandas
  materializes as float64 while Spark's bigint stays int64 — the driver's
  dtype-faithful value hash then fails on ``2.0 != 2`` even when values
  match. Every integer ``sum()``/derived-integer output column must be
  ``::BIGINT`` on the DuckDB side (``count(*)`` is already BIGINT).
  Windowed sums INSIDE a CTE are fine; only the SELECTed output matters.
- NO array/map/struct top-level output columns on any registered query
  (oracled or rows-only): a list-typed cell crashes the driver's pandas
  canonicalizer ("unhashable type: list"). Flatten to scalars
  (``element_at``) or serialize (``to_json``/``concat_ws``).
  Both conventions are enforced by ``tests/test_workload_conventions.py``.

Registration is decentralized: operator modules call ``register`` at import
time; ``__spark_entry__.py`` just re-exports the two dicts.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None → driver does a weaker rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    """Decorator: register a workload query under ``name``."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


# Queries surfaced first to the driver's (bounded, first ~50) per-round
# correctness gate. Cumulative state entering round 5: all 192 queries
# driver-checked at least once across rounds 1-4, latest result green for
# every one. The rotation policy is now evidence-freshness: refactored
# queries first, then oldest-evidence-first.
_PRIORITY = [
    # -- round-7 rotation. Leads: the 3 third-wave queries (hashed-feature
    # quality classifier, vocab OOV coverage, dedup survivorship), then
    # the 7 never-driver-checked second-wave
    # queries (span coverage/removal, DSIR weights, label outliers, LSH
    # recall audit), then the 3 never-checked first-wave queries (capped
    # containment, sample-based BPE learner, real-codec decode stats)
    # plus the 7 whose plan changed this round (the two-phase
    # keyed-window rewrites: quantile normalize, curriculum order,
    # Pareto frontier, source caps, pipeline/chunk-prep packing,
    # sequence packing). Then oldest-evidence-first: the 41 queries whose
    # latest driver check is round 2, then the round-3 cohort (44), then
    # rounds 4-6 — so the ~50-slot gate lands on the leads + most of the
    # stalest (round-2) cohort.
    "text_quality_classifier",
    "text_quality_classifier_fast",
    "corpus_vocab_coverage",
    "dedup_survivorship",
    "sampling_leakage_safe_split",
    "conversation_turn_audit",
    "dedup_span_coverage",
    "dedup_span_removal",
    "corpus_dsir_weights",
    "corpus_dsir_weights_fast",
    "embedding_label_outliers",
    "dedup_lsh_recall_audit",
    "corpus_span_source_matrix",
    "dq_k_anonymity",
    "dedup_containment_capped",
    "corpus_token_budget_cut",
    "embedding_label_dispersion",
    "corpus_epoch_shuffle",
    "dedup_source_minhash_matrix",
    "corpus_packing_efficiency",
    "bpe_learn_sampled",
    "multimodal_decode_stats",
    "curation_quantile_normalize",
    "curation_curriculum_order",
    "curation_pareto_frontier",
    "corpus_source_caps",
    "corpus_pipeline_full",
    "chunk_prep_pipeline",
    "sequence_packing",
    "date_anchor_shift",
    "dedup_first_seen",
    "event_disorder_stats",
    "funnel_steps",
    "join_asof",
    "join_range_bands",
    "q10_returned_items",
    "q11_important_suppliers",
    "q12_priority_by_linestatus",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_supplier_cnt",
    "q17_small_quantity_avg",
    "q18_large_orders",
    "q19_disjunctive_revenue",
    "q20_excess_suppliers",
    "q21_waiting_suppliers",
    "q22_idle_customers",
    "q2_min_cost_supplier",
    "q4_priority_exists",
    "q6_forecast_revenue",
    "q7_volume_by_year",
    "q8_market_share",
    "q9_product_profit",
    "revenue_share_window",
    "rfm_segmentation",
    "scd2_history",
    "session_paths",
    "sort_paginate",
    "stream_interval_join",
    "stream_session_window",
    "stream_sliding_window",
    "stream_tumbling_window",
    "timeseries_gapfill",
    "window_forward_fill",
    "window_lag_lead",
    "window_range_frame",
    "window_rank_family",
    "window_running_agg",
    "window_topk_per_group",
    "agg_argminmax_bitops",
    "agg_boolean_suite",
    "agg_histogram",
    "agg_salted_twophase",
    "array_hof_suite",
    "corpus_mixture",
    "counter_deltas",
    "dedup_minhash_lsh",
    "dedup_semantic_clusters",
    "dedup_simhash",
    "dq_expectations",
    "dq_profile_orders",
    "embedding_near_dup",
    "interval_coalesce",
    "join_interval_overlap",
    "join_null_safe",
    "join_salted_skew",
    "multimodal_chunk_audio",
    "multimodal_frame_sample",
    "pandas_ewma_per_user",
    "phi_filter_errors",
    "phi_filter_keep",
    "rollup_cascade",
    "sampling_split_counts",
    "sessionize_gap",
    "similarity_ann_ivf",
    "similarity_ann_lsh",
    "similarity_cosine_topk",
    "similarity_topk_per_label",
    "skew_key_stats",
    "state_durations",
    "stream_static_enrich",
    "stream_watermark_dedup",
    "text_boilerplate_ngrams",
    "text_repetition_stats",
    "text_unigram_logprob",
    "time_weighted_avg",
    "try_arithmetic_suite",
    "udaf_geo_mean",
    "udtf_eav_emit",
    "window_moving_median",
    "agg_approx",
    "agg_listagg_ordered",
    "agg_sketch_reaggregation",
    "anomaly_mad",
    "corpus_cross_contamination",
    "corpus_quality_funnel",
    "corpus_source_divergence",
    "corpus_temperature_mixture",
    "dedup_chunk_level",
    "dedup_containment",
    "dedup_incremental",
    "dq_distribution_drift",
    "embedding_covariance",
    "embedding_quantize_error",
    "embedding_random_projection",
    "event_pattern_regex",
    "graph_pagerank",
    "join_asof_nearest",
    "json_variant_extract",
    "pandas_penny_allocation",
    "retrieval_bm25_topk",
    "retrieval_heavy_hitters",
    "retrieval_inverted_index",
    "retrieval_rrf_fusion",
    "sampling_stratified_quota",
    "sampling_weighted_topk",
    "sketch_countmin",
    "sql_api_lateral_topn",
    "sql_api_recursive_hierarchy",
    "stream_interval_join_outer",
    "text_chunk_windows",
    "ts_autocorr",
    "ts_cusum_changepoint",
    "ts_decay_features",
    "ts_forecast_backtest",
    "ts_markov_transitions",
    "ts_ols_trend",
    "udtf_sessionize_tvf",
    "window_sliding_distinct",
    "agg_cube",
    "agg_distinct_keys",
    "agg_rollup",
    "arrow_grouped_scale",
    "bpe_encode_counts",
    "bpe_learn_merges",
    "bpe_pair_counts",
    "case_dispatch",
    "checkbox_explode_outer",
    "checkbox_to_array",
    "corpus_ngram_novelty",
    "curation_rep_selection",
    "curation_winsorized_stats",
    "date_calendar_suite",
    "date_granularities",
    "date_shift_constant",
    "date_total_seconds",
    "decontaminate_overlap",
    "dedup_clusters",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_winnow",
    "docs_prep_pipeline",
    "dq_benford_audit",
    "dq_referential_integrity",
    "eav_pivot_roundtrip",
    "eav_unpivot",
    "embedding_norm_arrow",
    "fuzzy_blocked_levenshtein",
    "graph_degree_assortativity",
    "graph_kcore_peel",
    "graph_label_propagation",
    "graph_triangle_count",
    "join_anti",
    "join_bloom_prune",
    "retrieval_prf_expansion",
    "similarity_hard_negatives",
    "sql_api_parameterized",
    "sql_api_pipe_syntax",
    "stream_two_level_rollup",
    "text_collocation_pmi",
    "text_lang_confusion",
    "text_readability",
    "ts_cross_correlation",
    "ts_seasonal_strength",
    "agg_grouping_sets",
    "agg_median_quantiles",
    "agg_moments",
    "agg_observe_counts",
    "anomaly_zscore",
    "basket_pair_counts",
    "cohort_retention",
    "dedup_prefix_jaccard",
    "dedup_prefix_jaccard_capped",
    "embedding_matryoshka_audit",
    "embedding_pq_audit",
    "graph_clustering_coefficient",
    "graph_link_prediction",
    "join_asof_tolerance",
    "join_broadcast_lookup",
    "join_key_overlap",
    "join_merge_update",
    "join_semi",
    "json_extract_props",
    "map_functions_suite",
    "multimodal_featurize",
    "pivot_event_values",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "retrieval_ndcg_eval",
    "retrieval_zipf_fit",
    "sampling_group_kfold",
    "sampling_poisson_bootstrap",
    "setop_except",
    "setop_intersect",
    "similarity_mmr_rerank",
    "sink_chunk_assignment",
    "sink_json_map_export",
    "snapshot_diff_counts",
    "sql_api_group_by_all",
    "sql_api_revenue_rank",
    "string_suite",
    "text_bigram_logprob",
    "text_chunk_structured",
    "text_fingerprint",
    "text_langid",
    "text_quality_score",
    "text_redact_pii",
    "text_tfidf_top_terms",
    "text_token_count",
    "text_winnow_fingerprint",
    "union_chunks",
]


def _ordered() -> dict[str, QuerySpec]:
    _ensure_loaded()
    out: dict[str, QuerySpec] = {}
    for name in _PRIORITY:
        if name in REGISTRY:
            out[name] = REGISTRY[name]
    for name, spec in REGISTRY.items():
        if name not in out:
            out[name] = spec
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in _ordered().items() if spec.oracle is not None}


_LOADED = False


def _ensure_loaded() -> None:
    """Import every module that registers workload queries."""
    global _LOADED
    if _LOADED:
        return
    # Imported for registration side effects. Order matters: the driver's
    # correctness gate checks the first ~50 registered queries per round,
    # so modules rotate to the front until every query has been
    # driver-verified at least once. Round 1 covered relational/eav/
    # date_transform/textstats/dedup/graph/multimodal; round 2 fronts
    # tpch_extra (28) + windows (17) + stream_workload (5) = the 50
    # previously-unchecked ones.
    from redcap_omop_etl_spark.operators import (  # noqa: F401
        tpch_extra,
        windows,
        stream_workload,
        temporal,
        tsanalytics,
        skew,
        sampling,
        reference_workload,
        similarity,
        relational,
        eav,
        date_transform,
        dedup,
        graph,
        multimodal,
        textstats,
        pandas_ops,
        retrieval,
        curation,
        sketches,
        linalg,
    )
    from redcap_omop_etl_spark.functions import udafs, udtfs  # noqa: F401

    _LOADED = True
