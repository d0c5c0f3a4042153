"""Multi-dimensional write clustering (Z-order) for stats-based pruning.

Hive partitioning (``sources/partitioned.py``) prunes at directory
granularity on ONE column family; bucketing (``sources/bucketed.py``)
co-locates joins. What neither gives is row-group pruning on TWO
independent filter columns at once — the lakehouse answer is Z-ordering:
interleave the bits of the (bucketized) column values into a Morton code,
range-partition + sort on it, and every parquet row group ends up with a
narrow min/max envelope on *each* participating column, so the reader's
row-group stats skip data for predicates on any of them.

Everything here is a plain DataFrame transformation: ``width_bucket`` to
quantize (bounds from one tiny agg job), a fold of shift/or expressions
for the interleave (whole-stage codegen'd), ``repartitionByRange`` for
the global clustering — no RDDs, no UDFs. At 100 TB the sort is the
standard one-off layout cost paid at ingest, amortized over every
subsequent scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _morton2(x: Column, y: Column, bits: int) -> Column:
    """Interleave ``bits`` low bits of two non-negative longs: x gets the
    even bit positions, y the odd ones. Pure shift/and/or arithmetic —
    stays inside codegen."""
    code = F.lit(0).cast("long")
    for b in range(bits):
        code = (
            code.bitwiseOR(F.shiftleft(F.shiftrightunsigned(x, b).bitwiseAND(F.lit(1)), 2 * b))
            .bitwiseOR(F.shiftleft(F.shiftrightunsigned(y, b).bitwiseAND(F.lit(1)), 2 * b + 1))
        )
    return code


def zorder_code(df: DataFrame, cols: list[str], bits: int = 12) -> Column:
    """Morton code over two numeric columns, quantized to ``bits`` bits
    each via uniform ``width_bucket`` between the observed min/max (one
    small agg job for the bounds — the same budget class as a broadcast
    dim)."""
    if len(cols) != 2:
        raise ValueError("zorder_code currently interleaves exactly 2 columns")
    n_buckets = 1 << bits
    bounds = df.agg(
        *[f(c).alias(f"{tag}_{c}") for c in cols for tag, f in (("mn", F.min), ("mx", F.max))]
    ).head()
    quantized = []
    for c in cols:
        mn, mx = float(bounds[f"mn_{c}"]), float(bounds[f"mx_{c}"])
        if mx <= mn:
            mx = mn + 1.0
        # width_bucket returns 1..n+1; clamp into 0..n-1
        q = F.least(
            F.greatest(F.width_bucket(F.col(c).cast("double"), F.lit(mn), F.lit(mx), F.lit(n_buckets)) - 1, F.lit(0)),
            F.lit(n_buckets - 1),
        ).cast("long")
        quantized.append(q)
    return _morton2(quantized[0], quantized[1], bits)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 8,
    bits: int = 12,
) -> None:
    """Write parquet clustered by the Z-order of ``cols``: global
    range-partition on the Morton code (sampled bounds — parallel, no
    single-reducer), sort within partitions, drop the helper column.
    Each output file then covers a compact 2-D tile, so min/max row-group
    stats prune on either column."""
    coded = df.withColumn("__z", zorder_code(df, cols, bits))
    (
        coded.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
