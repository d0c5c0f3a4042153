"""Statistics-driven planning: ANALYZE TABLE feeds the cost-based
optimizer. At 100 TB the difference between a broadcast and a shuffle
join is a statistics question — these pins keep the stats pipeline
(collect → store → estimate) wired."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from redcap_omop_etl_spark.sources.readers import Catalog
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def statdb(spark, tmp_path_factory):
    loc = tmp_path_factory.mktemp("statwh")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS statdb LOCATION '{loc}'")
    Catalog(spark, SF_SMOKE)["orders"].write.mode("overwrite").saveAsTable("statdb.orders_t")
    spark.sql(
        "ANALYZE TABLE statdb.orders_t COMPUTE STATISTICS FOR COLUMNS o_orderkey, o_orderstatus"
    )
    yield "statdb"
    spark.sql("DROP DATABASE IF EXISTS statdb CASCADE")


def test_analyze_records_row_and_size_stats(spark, statdb):
    row = (
        spark.sql("DESCRIBE EXTENDED statdb.orders_t")
        .filter(F.col("col_name") == "Statistics")
        .collect()
    )
    assert row and "rows" in row[0]["data_type"] and "bytes" in row[0]["data_type"]
    expected = Catalog(spark, SF_SMOKE)["orders"].count()
    assert f"{expected} rows" in row[0]["data_type"]


def test_column_stats_estimate_filter_selectivity(spark, statdb):
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try:
        full = spark.table("statdb.orders_t")
        filtered = full.filter(F.col("o_orderstatus") == "P")
        full_rows = full._jdf.queryExecution().optimizedPlan().stats().rowCount()
        filt_rows = filtered._jdf.queryExecution().optimizedPlan().stats().rowCount()
        # column histograms make the estimated row count drop under the
        # selective predicate — the signal join planning runs on
        assert full_rows.isDefined() and filt_rows.isDefined()
        assert filt_rows.get() < full_rows.get()
    finally:
        spark.conf.unset("spark.sql.cbo.enabled")


def test_stats_drive_broadcast_decision(spark, statdb):
    li = Catalog(spark, SF_SMOKE)["lineitem"]
    small = spark.table("statdb.orders_t").filter(F.col("o_orderstatus") == "P")
    j = li.join(small, li.l_orderkey == small.o_orderkey)
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # no hint: size estimate decides


class TestBenfordAudit:
    def test_matches_python_bruteforce(self, spark):
        import math
        from collections import Counter

        from redcap_omop_etl_spark import workload
        from redcap_omop_etl_spark.sources.readers import Catalog
        from tests.conftest import SF_SMOKE

        got = {r.digit: r for r in workload.queries()["dq_benford_audit"](spark, SF_SMOKE).collect()}
        prices = [r.o_totalprice for r in Catalog(spark, SF_SMOKE)["orders"].select("o_totalprice").collect()]
        digits = Counter(int(str(int(round(p * 100)))[0]) for p in prices)
        n = sum(digits.values())
        chi2 = sum(
            (digits.get(d, 0) - n * math.log10(1 + 1 / d)) ** 2 / (n * math.log10(1 + 1 / d))
            for d in range(1, 10)
        )
        assert set(got) == set(digits)
        for d, r in got.items():
            assert r.n_obs == digits[d]
            assert abs(r.obs_share - round(digits[d] / n, 6)) < 1e-9
            assert abs(r.benford_p - round(math.log10(1 + 1 / d), 6)) < 1e-9
            assert abs(r.chi2_total - round(chi2, 6)) < 1e-4
        assert abs(sum(r.obs_share for r in got.values()) - 1.0) < 1e-4
