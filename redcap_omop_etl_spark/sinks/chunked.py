"""Chunk-enveloped sinks — the reference's transmit stage, distributed.

``transmit`` (``/root/reference/redcap-etl.py:223-292``) slices the record
list into 50,000-row chunks, wraps each in an envelope
``{chunk_number, project ids, extraction_run_datetime, redcap_records,
[metadata on chunk 1]}``, and POSTs each. Here:

- ``with_global_index``: a scalable global row index — range-partition on
  the order key, count rows per partition (one small job), broadcast the
  offsets, add partition-local row_number. No single-partition
  ``Window.orderBy()`` bottleneck, so chunk assignment survives 100 TB.
- ``chunk_envelopes``: chunk = index div chunk_size; one envelope row per
  chunk via ``collect_list(struct(...))`` + ``to_json`` — metadata rides
  only on chunk 1 (redcap-etl.py:244-248).
- ``foreach_chunk_post``: ``foreachPartition`` POST with a pluggable
  transport (stubbed: no network in this environment).
- ``write_jsonl``: the ``--fake -w out`` dry-run sink, fail-if-exists
  (redcap-etl.py:216-221, mode "x").
- ``debug_pub``: the pivoted CSV debug sink (redcap-etl.py:382-397).
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from redcap_omop_etl_spark.operators.eav import pivot_from_eav


def with_global_index(df: DataFrame, order_cols: list, index_col: str = "__idx") -> DataFrame:
    """0-based global row index in ``order_cols`` order, computed without a
    global sort bottleneck — and FULLY LAZY (building the plan never runs
    a job; an earlier version collected per-partition counts at plan
    construction, which made every plan-inspection tool and caller pay a
    full corpus evaluation before the first action, and then the action
    recomputed it).

    ``order_cols`` entries are column names or Column sort expressions
    (``F.desc("cf")``), so descending rank orders (frequency ranks) reuse
    the same two-phase machinery as ascending chunk assignment.

    Plan: range-repartition on the key (RangePartitioner assigns ascending
    key ranges — in the requested sort direction — to ascending partition
    ids), derive per-partition counts as a #partitions-row aggregate,
    turn them into cumulative offsets with a window over that TINY frame
    (bounded by ``spark.sql.shuffle.partitions``, never by data), then
    broadcast-join the offsets back and add ``offset + local row_number``.
    The row_number window partitions by ``__pid``, so parallelism equals
    the partition count throughout — no single-reducer stage over data.
    The range exchange feeds both the counts branch and the main branch;
    Spark's exchange reuse (``spark.sql.exchange.reuse``, on by default)
    computes it once, and range boundaries are deterministically sampled,
    so even a recompute assigns identical pids.
    """
    parted = df.repartitionByRange(*order_cols)
    with_pid = parted.withColumn("__pid", F.spark_partition_id())
    counts = with_pid.groupBy("__pid").agg(F.count(F.lit(1)).alias("__n"))
    # cumulative offsets: a window over the #partitions-row counts frame —
    # a bounded global window (rows = partition count), not a data window.
    woff = W.orderBy("__pid").rowsBetween(W.unboundedPreceding, -1)
    offsets = counts.select(
        "__pid", F.coalesce(F.sum("__n").over(woff), F.lit(0)).alias("__off")
    )
    w = W.partitionBy("__pid").orderBy(*order_cols)
    return (
        with_pid.join(F.broadcast(offsets), "__pid")
        .withColumn(index_col, F.col("__off") + F.row_number().over(w) - 1)
        .drop("__pid", "__off")
    )


def chunk_envelopes(
    df: DataFrame,
    order_cols: list[str],
    chunk_size: int,
    project_info: dict[str, str] | None = None,
    metadata_json: str | None = None,
    run_datetime: str = "",
) -> DataFrame:
    """One row per chunk: ``chunk_number`` (1-based) + JSON envelope.

    Matches the reference envelope (redcap-etl.py:236-248): records array
    under ``redcap_records``; ``redcap_metadata_filtered`` present only on
    chunk 1 (:244-248, ``include_metadata``).
    """
    indexed = with_global_index(df, order_cols)
    chunked = indexed.withColumn("chunk_number", (F.col("__idx") / chunk_size).cast("long") + 1).drop("__idx")
    payload_cols = [c for c in df.columns]
    per_chunk = chunked.groupBy("chunk_number").agg(
        F.to_json(F.collect_list(F.struct(*payload_cols))).alias("records_json"),
        F.count(F.lit(1)).alias("n_records"),
    )
    base = {k: v for k, v in (project_info or {}).items()}
    envelope = F.concat(
        F.lit("{"),
        F.lit('"chunk_number": '),
        F.col("chunk_number").cast("string"),
        *[F.lit(f', "{k}": {json.dumps(v)}') for k, v in base.items()],
        F.lit(f', "extraction_run_datetime": {json.dumps(run_datetime)}'),
        F.lit(', "redcap_records": '),
        F.col("records_json"),
        F.when(
            (F.col("chunk_number") == 1) & F.lit(metadata_json is not None),
            F.lit(f', "redcap_metadata_filtered": {metadata_json or "null"}'),
        ).otherwise(F.lit("")),
        F.lit("}"),
    )
    return per_chunk.select("chunk_number", "n_records", envelope.alias("envelope"))


def map_keyed_json(
    df: DataFrame, key_col: str, value_cols: list[str], group_col: str | None = None
) -> DataFrame:
    """JSON object keyed by record id — the reference notebook's
    ``to_json(orient='index')`` export (RedCap2DataModel.ipynb cell-13),
    complementing the array-form envelope above.

    Entries are sorted by the stringified key before ``map_from_entries``
    so the emitted object is deterministic. With ``group_col`` each group
    emits its own map (the chunk-bounded form: payload per row stays
    bounded at 100 TB because the grouping, not the corpus, sets its
    size); without it, one global map (small-result exports only).
    """
    entry = F.struct(
        F.col(key_col).cast("string").alias("k"),
        F.struct(*[F.col(c) for c in value_cols]).alias("v"),
    )
    agg = F.to_json(F.map_from_entries(F.sort_array(F.collect_list(entry)))).alias("payload")
    if group_col is not None:
        return df.groupBy(group_col).agg(agg)
    return df.groupBy().agg(agg)


def foreach_chunk_post(envelopes: DataFrame, transport: Callable[[str], None]) -> None:
    """POST each chunk envelope via the pluggable transport
    (redcap-etl.py:270-282). The transport runs on executors; it must be
    picklable and raise on non-2xx (reference aborts on failed POST)."""

    def post_partition(rows: Iterator) -> None:
        for row in rows:
            transport(row["envelope"])

    envelopes.foreachPartition(post_partition)


def write_jsonl(df: DataFrame, path: str, overwrite: bool = False) -> None:
    """JSON-lines file sink; default fail-if-exists mirrors the reference's
    open(..., "x") (redcap-etl.py:216-221)."""
    df.write.mode("overwrite" if overwrite else "errorifexists").json(path)


def debug_pub(transform_records: DataFrame, field_names: list[str], path: str) -> None:
    """Pivot the transform-record stream wide and write CSV
    (redcap-etl.py:382-397). Pivot values are pinned by the caller."""
    wide = pivot_from_eav(
        transform_records, ["record_id"], field_names, field_col="field_name", value_col="field_value"
    )
    wide.coalesce(1).write.mode("overwrite").option("header", True).csv(path)
