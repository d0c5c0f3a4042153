"""ORC round-trip with pushdown — the remaining Spark-native columnar
format next to parquet (S3-class scans: filters and projection reach the
file reader, same discipline test_plans.py pins for parquet)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def orc_orders(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("orc") / "orders")
    spark.read.parquet(f"{SF_SMOKE}/orders.parquet").write.orc(path)
    return path


class TestOrcScan:
    def test_roundtrip_matches_parquet(self, spark, orc_orders):
        via_orc = spark.read.orc(orc_orders)
        via_parquet = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
        assert via_orc.count() == via_parquet.count()
        a = via_orc.agg(F.sum("o_orderkey").alias("s")).head()["s"]
        b = via_parquet.agg(F.sum("o_orderkey").alias("s")).head()["s"]
        assert a == b

    def test_filter_pushdown_reaches_orc_reader(self, spark, orc_orders):
        df = spark.read.orc(orc_orders).filter(F.col("o_orderkey") == 1).select("o_orderkey", "o_custkey")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters" in plan
        assert "o_orderkey" in plan.split("PushedFilters")[-1][:200]

    def test_column_pruning_reaches_orc_reader(self, spark, orc_orders):
        df = spark.read.orc(orc_orders).select("o_orderkey", "o_totalprice")
        plan = df._jdf.queryExecution().executedPlan().toString()
        read_schema = plan.split("ReadSchema")[-1][:300]
        assert "o_orderkey" in read_schema
        assert "o_comment" not in read_schema
