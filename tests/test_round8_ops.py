"""Round-8 operator tests: cross-engine epoch floor semantics, the
bounded-output MinHash cluster table, and the capped cluster
compositions (survivorship / leakage-safe split over capped pair
sources + the MinHash star-edge overflow channel)."""

from __future__ import annotations

import datetime

import duckdb
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


class TestEpochFloorSemantics:
    def test_pre_1970_second_reduction_matches_duckdb_floor(self, spark):
        # ADVICE r7: Spark `unix_micros(ts) div 1000000` truncates toward
        # zero; DuckDB `epoch_us(ts) // 1000000` floors. The pmod-based
        # reduction in conversation_turn_audit must floor for negative
        # epochs too: 1969-12-31 23:59:59.5 is epoch_us=-500000 → sec=-1.
        ts = [
            datetime.datetime(1969, 12, 31, 23, 59, 59, 500000),
            datetime.datetime(1969, 12, 31, 23, 59, 58, 0),
            datetime.datetime(1970, 1, 1, 0, 0, 0, 999999),
            datetime.datetime(2024, 5, 1, 12, 0, 0, 123456),
        ]
        df = spark.createDataFrame([(t,) for t in ts], "ts timestamp")
        got = [
            r.sec
            for r in df.select(
                F.expr(
                    "(unix_micros(ts) - pmod(unix_micros(ts), 1000000)) div 1000000"
                ).alias("sec")
            ).collect()
        ]
        con = duckdb.connect()
        want = [
            con.execute(
                "SELECT epoch_us(?::TIMESTAMP) // 1000000", [t.isoformat(sep=" ")]
            ).fetchone()[0]
            for t in ts
        ]
        assert got == want
        assert got[0] == -1  # truncation would give 0
