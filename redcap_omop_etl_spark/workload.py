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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _ensure_loaded()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _ensure_loaded()
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}


_LOADED = False


def _ensure_loaded() -> None:
    """Import every module that registers workload queries."""
    global _LOADED
    if _LOADED:
        return
    # Imported for registration side effects.
    from redcap_omop_etl_spark.operators import (  # noqa: F401
        relational,
        eav,
        date_transform,
        dedup,
        graph,
        multimodal,
        reference_workload,
        sampling,
        skew,
        stream_workload,
        temporal,
        tpch_extra,
        tsanalytics,
        similarity,
        textstats,
        windows,
    )
    from redcap_omop_etl_spark.functions import udafs, udtfs  # noqa: F401

    _LOADED = True
