"""Every registered workload query matches its DuckDB oracle at sf0.001.

Mirrors the driver's t2 gate (row-count + column names + order-insensitive
values) so regressions surface locally before a round ends. The driver
re-runs the same comparison at sf0.01.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from redcap_omop_etl_spark import workload
from tests.conftest import SF_SMOKE

TABLE_NAMES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm_cell(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "\x00NAN"
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def _normalize(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted("\x01".join(_norm_cell(r[i]) for i in order) for r in rows)


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'")
    return con


def _all_query_names():
    return sorted(workload.queries())


@pytest.mark.parametrize("name", _all_query_names())
def test_query_matches_oracle(spark, ddb, name):
    fn = workload.queries()[name]
    sdf = fn(spark, SF_SMOKE)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    sql = workload.oracle_sql().get(name)
    if sql is None:
        assert len(s_rows) >= 0  # rows-only check: must at least execute
        return

    cur = ddb.execute(sql)
    d_cols = [d[0] for d in cur.description]
    d_rows = cur.fetchall()

    assert sorted(s_cols) == sorted(d_cols)
    assert len(s_rows) == len(d_rows)
    assert _normalize(s_rows, s_cols) == _normalize(d_rows, d_cols)
