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


# Queries surfaced first to the driver's (bounded) per-round correctness
# gate: the five that round 1 flagged red (all one TIMESTAMP_NTZ root
# cause, fixed at the source boundary) lead so the fix is driver-visible,
# followed by registration order, which fronts the modules round 1 never
# reached (see _ensure_loaded).
_PRIORITY = [
    "date_anchor_shift",
    "window_range_frame",
    "session_paths",
    "event_disorder_stats",
    "stream_interval_join",
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
    )
    from redcap_omop_etl_spark.functions import udafs, udtfs  # noqa: F401

    _LOADED = True
