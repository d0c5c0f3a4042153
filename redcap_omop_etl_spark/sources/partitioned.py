"""Hive-style partitioned table layout: directory pruning at the scan.

Bucketing (``sources/bucketed.py``) removes join shuffles; *partitioning*
removes the scan itself. A 100 TB fact laid out as
``/fact/ds=2024-01-01/part-*.parquet`` serves a one-day query by listing
one directory — the other 364 days are never opened. This is the
reference's ``events=[screening_arm_1]`` server-side partition filter
(``redcap-etl.py:145``) generalized to the storage layer: push the
partition predicate into the *file listing*, not just the row filter.

Three behaviors matter at scale, each pinned by ``tests/test_partitioned.py``:

- **Static pruning**: a literal predicate on the partition column shows up
  as ``PartitionFilters`` on the scan and drops the partition count.
- **Dynamic partition pruning (DPP)**: when the predicate is on a *joined
  dimension* (star-schema reality: ``WHERE d_year = 1995`` lives on the
  date dim, not the fact), Catalyst inserts a runtime
  ``dynamicpruningexpression`` that reuses the dim broadcast to prune fact
  partitions before the scan. Free with ``spark.sql.optimizer.
  dynamicPartitionPruning.enabled`` (default on).
- **Dynamic partition overwrite**: incremental reloads must replace only
  the partitions present in the incoming batch (the reference re-extracts
  one study's chunk without clobbering the rest). ``partitionOverwriteMode
  =dynamic`` scopes INSERT OVERWRITE to touched partitions.

Partition-column choice is a contract, not a tuning knob: low cardinality
(day/region/event-type — thousands of values, not millions; a per-key
directory of tiny files is the classic small-files failure), and always a
column queries actually filter on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: str | list[str],
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> None:
    """Write ``df`` as a Hive-partitioned parquet directory tree.

    ``max_records_per_file`` bounds output file size (the write-side
    analog of ``maxPartitionBytes``); leave ``None`` to inherit the
    session default. Callers doing incremental loads should set
    ``spark.sql.sources.partitionOverwriteMode=dynamic`` (see
    ``overwrite_partitions``) so ``mode="overwrite"`` replaces only the
    partitions present in ``df``.
    """
    cols = [partition_cols] if isinstance(partition_cols, str) else list(partition_cols)
    writer = df.write.mode(mode).partitionBy(*cols)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)


def overwrite_partitions(df: DataFrame, path: str, partition_cols: str | list[str]) -> None:
    """Overwrite only the partitions present in ``df`` (incremental load).

    Equivalent to Hive's dynamic-partition INSERT OVERWRITE: partitions
    absent from ``df`` are left untouched. Restores the session's
    overwrite mode afterwards so static-overwrite callers are unaffected.
    """
    spark = df.sparkSession
    key = "spark.sql.sources.partitionOverwriteMode"
    saved = spark.conf.get(key, None)
    spark.conf.set(key, "dynamic")
    try:
        write_partitioned(df, path, partition_cols, mode="overwrite")
    finally:
        if saved is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, saved)
    # the session caches the path's file listing (InMemoryFileIndex);
    # without this, the next read resolves deleted pre-overwrite files
    # and dies with FAILED_READ_FILE.FILE_NOT_EXIST
    spark.catalog.refreshByPath(path)


def compact(
    spark: SparkSession,
    src: str,
    dest: str,
    partition_cols: str | list[str] | None = None,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> None:
    """Rewrite a parquet tree with AQE-sized output files (small-files fix).

    Incremental loads (streaming ``foreachBatch``, per-chunk appends, the
    reference's 100-ID extract batches) accumulate files far below the
    scan-efficient size; a 100 TB table of 1 MB files spends more time in
    listing/open than in I/O. ``REBALANCE`` is the AQE-native fix: a
    round-robin (or keyed, when ``partition_cols`` is set) exchange whose
    output partition count is decided at *runtime* from
    ``advisoryPartitionSizeInBytes`` — unlike a hand-picked
    ``coalesce(n)``, the same code yields sensible file sizes at any input
    scale, and skewed partitions are split, not just merged.

    Writes to ``dest`` (never in-place: Spark cannot overwrite a location
    it is reading); the caller swaps paths at the catalog level.
    """
    key = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    saved = spark.conf.get(key, None)
    spark.conf.set(key, str(target_file_bytes))
    try:
        df = spark.read.parquet(src)
        if partition_cols is None:
            df.hint("rebalance").write.mode("errorifexists").parquet(dest)
        else:
            cols = [partition_cols] if isinstance(partition_cols, str) else list(partition_cols)
            # keyed rebalance co-locates each Hive partition's rows so the
            # partitionBy write emits one right-sized file set per directory
            write_partitioned(df.hint("rebalance", *cols), dest, cols, mode="errorifexists")
    finally:
        if saved is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, saved)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read a partitioned tree; partition columns come back as real
    columns (directory-encoded, zero bytes in the data files) and
    predicates on them prune at file-listing time."""
    return spark.read.parquet(path)
