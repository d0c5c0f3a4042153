"""Copy-on-write upsert into partitioned parquet: replaced keys, inserted
rows, new partitions, and — the scale property — untouched partitions'
files are never rewritten."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from redcap_omop_etl_spark.sinks.upsert import upsert_partitions
from redcap_omop_etl_spark.sources.partitioned import write_partitioned


def _table(spark, tmp_path):
    path = str(tmp_path / "target")
    base = spark.createDataFrame(
        [
            (1, "a", 10.0),
            (2, "a", 20.0),
            (3, "b", 30.0),
            (4, "b", 40.0),
            (5, "c", 50.0),
        ],
        "id int, ds string, v double",
    )
    write_partitioned(base, path, "ds")
    return path


def test_upsert_replaces_inserts_and_adds_partitions(spark, tmp_path):
    path = _table(spark, tmp_path)
    batch = spark.createDataFrame(
        [
            (3, "b", 99.0),   # replace existing key in ds=b
            (6, "b", 60.0),   # insert new key into ds=b
            (7, "d", 70.0),   # insert into brand-new partition ds=d
        ],
        "id int, ds string, v double",
    )
    upsert_partitions(spark, path, batch, keys=["id"], partition_col="ds")
    got = {(r["id"], r["ds"], r["v"]) for r in spark.read.parquet(path).collect()}
    assert got == {
        (1, "a", 10.0),
        (2, "a", 20.0),
        (3, "b", 99.0),
        (4, "b", 40.0),
        (5, "c", 50.0),
        (6, "b", 60.0),
        (7, "d", 70.0),
    }


def test_upsert_never_rewrites_untouched_partitions(spark, tmp_path):
    path = _table(spark, tmp_path)
    before = {p: os.path.getmtime(p) for p in glob.glob(path + "/ds=a/*.parquet")}
    assert before
    batch = spark.createDataFrame([(3, "b", 99.0)], "id int, ds string, v double")
    upsert_partitions(spark, path, batch, keys=["id"], partition_col="ds")
    after = {p: os.path.getmtime(p) for p in glob.glob(path + "/ds=a/*.parquet")}
    assert after == before  # same files, same mtimes: ds=a was never touched
    # and ds=b was rewritten with the replacement applied
    b_rows = {
        (r["id"], r["v"])
        for r in spark.read.parquet(path).filter(F.col("ds") == "b").collect()
    }
    assert b_rows == {(3, 99.0), (4, 40.0)}


def test_upsert_empty_batch_is_noop(spark, tmp_path):
    path = _table(spark, tmp_path)
    empty = spark.createDataFrame([], "id int, ds string, v double")
    upsert_partitions(spark, path, empty, keys=["id"], partition_col="ds")
    assert spark.read.parquet(path).count() == 5
