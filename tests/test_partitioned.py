"""Plan + behavior pins for Hive-partitioned layout: static pruning,
dynamic partition pruning (DPP), and dynamic partition overwrite — the
scan-elimination half of the 100 TB layout story (bucketing being the
shuffle-elimination half)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from redcap_omop_etl_spark.sources.partitioned import (
    overwrite_partitions,
    read_partitioned,
    write_partitioned,
)
from redcap_omop_etl_spark.sources.readers import Catalog
from tests.conftest import SF_SMOKE


def _executed(df):
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def orders_by_year(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("part") / "orders_by_year")
    o = Catalog(spark, SF_SMOKE)["orders"].withColumn(
        "o_year", F.year("o_orderdate")
    )
    write_partitioned(o, path, "o_year")
    return path


def test_static_partition_pruning(spark, orders_by_year):
    df = read_partitioned(spark, orders_by_year).filter(F.col("o_year") == 1995)
    plan = _executed(df)
    assert "PartitionFilters" in plan and "o_year" in plan
    # the partition predicate must NOT appear as a data Filter node: it is
    # resolved entirely at file-listing time (zero bytes scanned for other
    # years)
    scan_line = next(line for line in plan.splitlines() if "PartitionFilters" in line)
    assert "1995" in scan_line
    expected = (
        Catalog(spark, SF_SMOKE)["orders"].filter(F.year("o_orderdate") == 1995).count()
    )
    assert df.count() == expected


def test_dynamic_partition_pruning(spark, orders_by_year):
    # star-schema reality: the selective predicate lives on a dimension,
    # not the fact — DPP must reuse the dim broadcast to prune fact
    # partitions at runtime
    dim = spark.createDataFrame(
        [(y, "target" if y == 1996 else "other") for y in range(1992, 1999)],
        "d_year int, d_label string",
    )
    fact = read_partitioned(spark, orders_by_year)
    joined = (
        fact.join(F.broadcast(dim), fact.o_year == dim.d_year)
        .filter(F.col("d_label") == "target")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert "dynamicpruning" in _executed(joined).lower()
    expected = (
        Catalog(spark, SF_SMOKE)["orders"].filter(F.year("o_orderdate") == 1996).count()
    )
    assert joined.collect()[0]["n"] == expected


def test_dynamic_partition_overwrite(spark, tmp_path):
    path = str(tmp_path / "inc")
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0)], "id int, ds string, v double"
    )
    write_partitioned(base, path, "ds")

    # incremental batch touches only ds=b; ds=a must survive the overwrite
    patch = spark.createDataFrame([(9, "b", 99.0)], "id int, ds string, v double")
    overwrite_partitions(patch, path, "ds")

    out = {(r["id"], r["ds"], r["v"]) for r in read_partitioned(spark, path).collect()}
    assert out == {(1, "a", 10.0), (2, "a", 20.0), (9, "b", 99.0)}
    # and the session conf was restored (static overwrite still full-table)
    assert spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC").upper() == "STATIC"


def test_partition_columns_cost_zero_bytes(spark, orders_by_year):
    # partition values are directory-encoded; the data files must not
    # contain the o_year column (ReadSchema excludes it)
    df = read_partitioned(spark, orders_by_year).select("o_orderkey", "o_year")
    plan = _executed(df)
    scan_line = next(line for line in plan.splitlines() if "ReadSchema" in line)
    read_schema = scan_line.split("ReadSchema:")[1]
    assert "o_orderkey" in read_schema and "o_year" not in read_schema


def test_compact_small_files(spark, tmp_path):
    from redcap_omop_etl_spark.sources.partitioned import compact
    import glob

    src = str(tmp_path / "small")
    base = spark.range(0, 50_000).withColumn("v", F.col("id") * 2)
    base.repartition(32).write.parquet(src)
    assert len(glob.glob(src + "/*.parquet")) == 32

    dest = str(tmp_path / "compacted")
    compact(spark, src, dest, target_file_bytes=64 * 1024 * 1024)
    # AQE rebalance coalesces to file(s) sized by the advisory target,
    # decided at runtime — not a hand-picked coalesce(n)
    assert len(glob.glob(dest + "/*.parquet")) < 8
    got = spark.read.parquet(dest)
    assert got.count() == 50_000
    assert got.agg(F.sum("v")).collect()[0][0] == base.agg(F.sum("v")).collect()[0][0]
    # advisory conf restored
    assert spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes", None) != str(64 * 1024 * 1024)


def test_compact_preserves_hive_partitions(spark, tmp_path):
    from redcap_omop_etl_spark.sources.partitioned import compact
    import glob

    src = str(tmp_path / "psmall")
    base = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b", float(i)) for i in range(1000)],
        "id int, ds string, v double",
    )
    # simulate many per-partition appends: 8 files per ds value
    base.repartition(8).write.partitionBy("ds").parquet(src)
    assert len(glob.glob(src + "/ds=a/*.parquet")) == 8

    dest = str(tmp_path / "pcompacted")
    compact(spark, src, dest, partition_cols="ds")
    assert len(glob.glob(dest + "/ds=a/*.parquet")) == 1
    assert len(glob.glob(dest + "/ds=b/*.parquet")) == 1
    got = {(r["id"], r["ds"], r["v"]) for r in spark.read.parquet(dest).collect()}
    assert got == {tuple(r) for r in base.collect()}


def test_compact_splits_skewed_partition(spark, tmp_path):
    from redcap_omop_etl_spark.sources.partitioned import compact
    import glob

    src = str(tmp_path / "skewsrc")
    # ds=hot carries 200k rows with a fat payload, ds=cold 100 rows
    hot = spark.range(0, 200_000).select(
        F.col("id").cast("int").alias("id"),
        F.lit("hot").alias("ds"),
        F.concat(F.lit("x" * 200), F.col("id").cast("string")).alias("payload"),
    )
    cold = spark.range(0, 100).select(
        (F.col("id") + 1_000_000).cast("int").alias("id"),
        F.lit("cold").alias("ds"),
        F.lit("y").alias("payload"),
    )
    hot.unionByName(cold).repartition(4).write.partitionBy("ds").parquet(src)

    dest = str(tmp_path / "skewdest")
    # ~2 MB advisory: the hot partition (~40 MB raw) must SPLIT into
    # several files while cold collapses to one — REBALANCE both merges
    # undersized and splits oversized partitions
    compact(spark, src, dest, partition_cols="ds", target_file_bytes=2 * 1024 * 1024)
    n_hot = len(glob.glob(dest + "/ds=hot/*.parquet"))
    n_cold = len(glob.glob(dest + "/ds=cold/*.parquet"))
    assert n_hot > 1, f"hot partition not split (files={n_hot})"
    assert n_cold == 1
    assert spark.read.parquet(dest).count() == 200_100


class TestSchemaEvolution:
    """Schema drift across partition generations — the 100 TB lake reality:
    early batches lack columns later batches add. mergeSchema unifies; absent
    columns read as NULL; writer-side overwrite of one generation never
    rewrites the other."""

    def test_merge_schema_unifies_generations(self, spark, tmp_path):
        root = str(tmp_path / "evo")
        spark.createDataFrame(
            [(1, "a")], "id long, payload string"
        ).write.mode("append").parquet(root + "/day=2024-01-01")
        spark.createDataFrame(
            [(2, "b", 0.5)], "id long, payload string, score double"
        ).write.mode("append").parquet(root + "/day=2024-01-02")

        df = spark.read.option("mergeSchema", "true").option("basePath", root).parquet(
            root + "/day=2024-01-01", root + "/day=2024-01-02"
        )
        assert set(df.columns) == {"id", "payload", "score", "day"}
        rows = {r.id: (r.score, r.day) for r in df.collect()}
        import datetime

        assert rows[1] == (None, datetime.date(2024, 1, 1))  # old gen: NULL fill
        assert rows[2] == (0.5, datetime.date(2024, 1, 2))

    def test_explicit_schema_prunes_new_column(self, spark, tmp_path):
        # a reader pinned to the OLD schema keeps working after the lake
        # gains a column (no mergeSchema needed, no read amplification)
        root = str(tmp_path / "evo2")
        spark.createDataFrame([(1, "a")], "id long, payload string").write.parquet(root + "/g1")
        spark.createDataFrame(
            [(2, "b", 0.5)], "id long, payload string, score double"
        ).write.parquet(root + "/g2")
        df = spark.read.schema("id long, payload string").parquet(root + "/g1", root + "/g2")
        assert sorted(r.id for r in df.collect()) == [1, 2]
        assert set(df.columns) == {"id", "payload"}
