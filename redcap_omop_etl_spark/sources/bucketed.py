"""Bucketed (pre-partitioned) tables: shuffle-free co-located joins.

The single most expensive physical event in a 100 TB fact-fact join is the
shuffle of both sides onto the join key. If the tables are *bucketed* on
that key at write time (hash-partitioned into a fixed bucket count, one
file set per bucket), Spark's scan reports the output partitioning and the
join planner skips both Exchanges entirely — the join runs bucket-by-
bucket, co-located. ``sortBy`` at write time additionally removes the
per-task Sort for sort-merge joins.

This is the write-once/join-many pattern for curated fact tables (the
100 TB analog of the reference's "build the dict once, probe it per row",
``redcap-etl.py:294-297`` — but for *big* sides where broadcast is
impossible).

Bucketing rules that make plans line up (pinned by
``tests/test_bucketed.py``):
- both sides bucketed by the join key into the SAME bucket count;
- ``spark.sql.sources.bucketing.enabled`` on (default);
- bucket pruning: an equality filter on the bucket key scans 1/N of the
  files (``SelectedBucketsCount`` in the scan node).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_key: str | list[str],
    n_buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) managed table.

    ``n_buckets`` is a layout contract, not a tuning knob: pick it once per
    subject area (so co-bucketed tables join shuffle-free) and size it so
    one bucket of the largest table fits an executor's memory at target
    scale.
    """
    keys = [bucket_key] if isinstance(bucket_key, str) else list(bucket_key)
    writer = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a managed (bucketed) table; the scan carries the bucket spec so
    downstream joins/aggs on the bucket key plan without an Exchange."""
    return spark.table(table)
