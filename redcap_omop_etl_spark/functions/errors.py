"""Error-channel helpers: skip-and-log semantics without aborting the job.

The reference never aborts on a bad value: unparseable dates are logged and
the row skipped (``dcc_transforms.py:59-73``); fields missing from the
field map go to a dedup'd error registry (``redcap-etl.py:322-327``).
Spark's equivalent is the ``try_*`` function family plus a partition of the
DataFrame into (clean, errors) — both sides stay distributed, nothing is
collected to the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def try_timestamp(col: Column | str) -> Column:
    """Non-aborting ISO-8601-ish parse: NULL on failure (dcc_transforms.py:57-63)."""
    return F.try_to_timestamp(F.col(col) if isinstance(col, str) else col)


def split_errors(df: DataFrame, ok_predicate: Column, error_label: str) -> tuple[DataFrame, DataFrame]:
    """Partition ``df`` into (clean, errors) on a predicate.

    Both outputs are lazy views of the same scan; Catalyst pushes each
    filter down independently. The errors side carries an ``error`` label
    column, mirroring the reference's log-and-skip channel.
    """
    clean = df.filter(ok_predicate)
    errors = df.filter(~F.coalesce(ok_predicate, F.lit(False))).withColumn("error", F.lit(error_label))
    return clean, errors
