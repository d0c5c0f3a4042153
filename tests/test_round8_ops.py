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


class TestEpochSecondReduction:
    def test_second_reduction_agrees_cross_engine_incl_pre_1970(self, spark):
        # ADVICE r7 claimed Spark `unix_micros(ts) div 1000000` (truncate
        # toward zero) diverges from DuckDB `epoch_us(ts) // 1000000`
        # (allegedly floor) for pre-1970 timestamps. Investigated:
        # DuckDB's `//` on BIGINT operands ALSO truncates toward zero
        # (-500000 // 1000000 = 0, -7 // 2 = -3), so the two reductions
        # used by conversation_turn_audit agree at every epoch. Pin that
        # agreement — including the negative-epoch sub-second case the
        # advice flagged — so a future engine change surfaces here.
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
                F.expr("unix_micros(ts) div 1000000").alias("sec")
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
        assert got[0] == 0  # both engines truncate: -500000us -> 0s
