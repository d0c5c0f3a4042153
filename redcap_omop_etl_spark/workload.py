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
# correctness gate. Round-3 rotation: the 39 queries never driver-checked
# in rounds 1–2 (sampling, similarity, tsanalytics, reference_workload,
# temporal, skew, stream, multimodal, textstats, udafs, udtfs) lead, then
# the two round-2 reds (both oracle-interface defects, fixed this round:
# sessionize_gap HUGEINT→BIGINT cast; agg_approx array→scalar
# percentiles), then spot-checks over earlier-verified modules including
# the two oracles that gained NULL-guards this round.
_PRIORITY = [
    # -- never driver-checked (39) --
    "sampling_split_counts",
    "agg_histogram",
    "join_null_safe",
    "agg_sketch_reaggregation",
    "dq_profile_orders",
    "dq_expectations",
    "agg_boolean_suite",
    "try_arithmetic_suite",
    "corpus_mixture",
    "sequence_packing",
    "corpus_pipeline_full",
    "similarity_cosine_topk",
    "similarity_topk_per_label",
    "similarity_ann_lsh",
    "similarity_ann_ivf",
    "embedding_near_dup",
    "dedup_semantic_clusters",
    "array_hof_suite",
    "rollup_cascade",
    "window_moving_median",
    "join_interval_overlap",
    "interval_coalesce",
    "state_durations",
    "counter_deltas",
    "time_weighted_avg",
    "agg_salted_twophase",
    "join_salted_skew",
    "skew_key_stats",
    "phi_filter_keep",
    "phi_filter_errors",
    "sink_chunk_assignment",
    "sink_json_map_export",
    "stream_watermark_dedup",
    "stream_static_enrich",
    "multimodal_frame_sample",
    "multimodal_chunk_audio",
    "bpe_learn_merges",
    "udaf_geo_mean",
    "udtf_eav_emit",
    # -- round-2 reds, fixed this round (2) --
    "sessionize_gap",
    "agg_approx",
    # -- newly oracled / net-new this round (5): minhash+simhash moved to
    # the portable md5 hash so their full LSH pipelines hash-check against
    # DuckDB; repetition/boilerplate/argminmax are new operators --
    "dedup_minhash_lsh",
    "dedup_simhash",
    "text_repetition_stats",
    "text_boilerplate_ngrams",
    "agg_argminmax_bitops",
    "text_unigram_logprob",
    "corpus_source_caps",
    "bpe_encode_counts",
    "pandas_ewma_per_user",
    "pandas_penny_allocation",
    "dedup_incremental",
    "corpus_quality_funnel",
    "embedding_quantize_error",
    # -- session additions beyond the ~50-slot gate: checked if the
    # driver's bound allows, otherwise front-of-queue for round 4 --
    "dedup_prefix_jaccard",
    "corpus_source_divergence",
    "anomaly_mad",
    "ts_autocorr",
    "sampling_weighted_topk",
    "sampling_stratified_quota",
    "agg_listagg_ordered",
    "sql_api_lateral_topn",
    "window_sliding_distinct",
    "corpus_temperature_mixture",
    "event_pattern_regex",
    "corpus_cross_contamination",
    "udtf_sessionize_tvf",
    "stream_interval_join_outer",
    "ts_decay_features",
    "dq_distribution_drift",
    # (58 names; the driver's bounded gate covers the first ~50 — every
    # other registered query was driver-checked in rounds 1-2)
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
    )
    from redcap_omop_etl_spark.functions import udafs, udtfs  # noqa: F401

    _LOADED = True
