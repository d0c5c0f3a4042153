"""Registry-wide conventions that keep results driver-hashable.

Two classes of latent driver failure are pinned here (see workload.py
docstring):

1. No array/map/struct TOP-LEVEL output column on ANY registered query —
   a list-typed cell crashes the driver's pandas canonicalizer
   ("unhashable type: 'list'"; round-2 ``agg_approx`` err).
2. No HUGEINT (or DECIMAL) column in any ORACLE's output — DuckDB's
   integer ``sum()`` returns HUGEINT which pandas renders float64 while
   Spark's bigint stays int64, so the driver's dtype-faithful hash fails
   on numerically identical results (round-2 ``sessionize_gap`` red).
   Additionally the DuckDB output type *kind* must agree with the Spark
   schema kind column-by-column (int vs float vs str vs bool).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import types as T

from redcap_omop_etl_spark import workload
from tests.conftest import SF_SMOKE

TABLE_NAMES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'")
    return con


def _spark_kind(dt: T.DataType) -> str:
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(dt, T.DecimalType):
        return "decimal"
    if isinstance(dt, T.StringType):
        return "str"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, (T.DateType, T.TimestampType, T.TimestampNTZType)):
        return "datetime"
    return f"other:{dt.simpleString()}"


def _duck_kind(tname: str) -> str:
    t = tname.upper()
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if t == "HUGEINT":
        return "hugeint"
    if t in ("FLOAT", "DOUBLE", "REAL"):
        return "float"
    if t.startswith("DECIMAL"):
        return "decimal"
    if t == "VARCHAR":
        return "str"
    if t == "BOOLEAN":
        return "bool"
    if t.startswith(("TIMESTAMP", "DATE")):
        return "datetime"
    return f"other:{t}"


def _all_query_names():
    return sorted(workload.queries())


def test_never_driver_checked_queries_lead_priority():
    """Every registered query the external driver has never verified must
    sit inside the first ~50 slots of ``workload._PRIORITY`` (the driver's
    bounded per-round check window) — otherwise newly registered queries
    silently accumulate with only local evidence forever (round-3's 23
    stragglers). Registering a new query therefore REQUIRES rotating it to
    the head of ``_PRIORITY``; when the driver publishes the next
    CORRECTNESS file the query leaves this set automatically.
    """
    import glob
    import json

    from pathlib import Path

    root = Path(__file__).resolve().parent.parent
    checked: set[str] = set()
    for p in glob.glob(str(root / "CORRECTNESS_r*.json")):
        with open(p) as f:
            checked |= set(json.load(f).keys())
    workload._ensure_loaded()
    never = set(workload.REGISTRY) - checked
    window = set(workload._PRIORITY[:50])
    stragglers = sorted(never - window)
    assert not stragglers, (
        f"{len(stragglers)} registered queries have never been driver-"
        f"checked and are NOT in the first 50 _PRIORITY slots: {stragglers}"
        " — rotate them to the head of workload._PRIORITY"
    )
    assert len(never) <= 50, (
        f"{len(never)} never-driver-checked queries exceed the driver's "
        "~50-query window; some cannot be verified next round no matter "
        "the rotation — stop registering and let a round drain the queue"
    )


@pytest.mark.parametrize("name", _all_query_names())
def test_no_nested_top_level_output(spark, name):
    fn = workload.queries()[name]
    sdf = fn(spark, SF_SMOKE)
    bad = [
        f.name
        for f in sdf.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]
    assert not bad, (
        f"{name}: top-level nested output columns {bad} would crash the "
        "driver's pandas canonicalizer — flatten to scalars or to_json"
    )


@pytest.mark.parametrize("name", sorted(workload.oracle_sql()))
def test_oracle_output_dtypes(spark, ddb, name):
    sql = workload.oracle_sql()[name]
    fn = workload.queries()[name]
    duck_types = {
        r[0]: _duck_kind(r[1])
        for r in ddb.execute(f"DESCRIBE {sql}").fetchall()
    }
    hazard = {c: k for c, k in duck_types.items() if k in ("hugeint", "decimal")}
    assert not hazard, (
        f"{name}: oracle output columns {hazard} materialize as pandas "
        "float64/object vs Spark's int64 — cast ::BIGINT / ::DOUBLE"
    )
    spark_types = {f.name: _spark_kind(f.dataType) for f in fn(spark, SF_SMOKE).schema.fields}
    assert set(spark_types) == set(duck_types), (
        f"{name}: column-name mismatch spark={sorted(spark_types)} "
        f"duckdb={sorted(duck_types)}"
    )
    mismatch = {
        c: (spark_types[c], duck_types[c])
        for c in spark_types
        if spark_types[c] != duck_types[c]
    }
    assert not mismatch, (
        f"{name}: dtype-kind mismatches (spark, duckdb) = {mismatch} — "
        "the driver's pandas value-hash is dtype-faithful"
    )
