"""Plan pins for bucketed co-located joins: the write-once/join-many
layout that removes fact-fact shuffles at 100 TB."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from redcap_omop_etl_spark.sources.bucketed import read_table, write_bucketed
from redcap_omop_etl_spark.sources.readers import Catalog
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucketdb(spark, tmp_path_factory):
    loc = tmp_path_factory.mktemp("warehouse")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bucketdb LOCATION '{loc}'")
    cat = Catalog(spark, SF_SMOKE)
    write_bucketed(cat["lineitem"], "bucketdb.lineitem_b", "l_orderkey", 8)
    write_bucketed(
        cat["orders"].withColumnRenamed("o_orderkey", "l_orderkey"),
        "bucketdb.orders_b",
        "l_orderkey",
        8,
    )
    yield "bucketdb"
    spark.sql("DROP DATABASE IF EXISTS bucketdb CASCADE")


def _executed(df):
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def _conf(spark):
    """Temporarily set SQL confs, restoring the session values after."""
    saved = {}

    def set_conf(key, value):
        saved[key] = spark.conf.get(key, None)
        spark.conf.set(key, value)

    yield set_conf
    for key, value in saved.items():
        if value is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, value)


def test_cobucketed_join_has_no_exchange(spark, bucketdb, _conf):
    # disable broadcast so the big-big (at scale) path is what's planned:
    # a sort-merge join whose both sides come pre-partitioned by the scan
    _conf("spark.sql.autoBroadcastJoinThreshold", "-1")
    _conf("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    li = read_table(spark, "bucketdb.lineitem_b")
    o = read_table(spark, "bucketdb.orders_b")
    joined = li.join(o, "l_orderkey").groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n"))
    plan = _executed(joined)
    # co-located join: no shuffle on the join key on either side; the only
    # exchange allowed is the one feeding the final tiny groupBy
    assert "Exchange hashpartitioning(l_orderkey" not in plan, plan
    assert "SortMergeJoin" in plan, plan
    # sanity: same result as the unbucketed join
    cat = Catalog(spark, SF_SMOKE)
    expect = (
        cat["lineitem"]
        .join(cat["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderstatus")
        .count()
    )
    got = {(r["o_orderstatus"], r["n"]) for r in joined.collect()}
    want = {(r["o_orderstatus"], r["count"]) for r in expect.collect()}
    assert got == want


def test_bucket_pruning_on_key_equality(spark, bucketdb, _conf):
    # AQE's auto-bucketed-scan turns bucketed reading off when no join/agg
    # wants the distribution — force it on so pruning is observable
    _conf("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    li = read_table(spark, "bucketdb.lineitem_b")
    some_key = li.select("l_orderkey").head()[0]
    plan = _executed(li.filter(F.col("l_orderkey") == some_key))
    assert "SelectedBucketsCount: 1 out of 8" in plan, plan


def test_bucketed_agg_on_key_has_no_exchange(spark, bucketdb):
    li = read_table(spark, "bucketdb.lineitem_b")
    agg = li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
    plan = _executed(agg)
    assert "Exchange" not in plan, plan
