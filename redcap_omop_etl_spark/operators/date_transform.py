"""De-identification date transforms as distributed plans.

The reference's ``DateVariableTransform`` (``dcc_transforms.py:11-186``)
implements three shift strategies × four output granularities over EAV date
fields, with a per-record anchor ("dob") shift computed by a self-join.
Here each strategy is a declarative plan over typed columns:

- ``anchor`` (dob_shifting): per-key anchor = first anchor-event timestamp;
  every row shifts by ``standard − anchor`` (J3 self-join → window/groupBy
  + broadcast join; dcc_transforms.py:44-49,65,75).
- ``constant`` (date_shifting): fixed seconds offset (dcc_transforms.py:139).
- ``total_seconds``: signed seconds from a standard date
  (dcc_transforms.py:121-122).

Granularity formatting is in ``functions.dates`` (F5-F8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from redcap_omop_etl_spark.functions.dates import format_granularity, seconds_between
from redcap_omop_etl_spark.sources.readers import Catalog
from redcap_omop_etl_spark.workload import register


def anchor_shift(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    anchor_predicate,
    standard_ts: str,
) -> DataFrame:
    """Shift every row's ``ts_col`` by (standard − key's anchor timestamp).

    The anchor is the minimum ``ts_col`` among rows matching
    ``anchor_predicate`` within the key (the reference expects exactly one
    dob row per record; min makes it deterministic when there are several).
    Rows whose key has no anchor get a NULL shifted value — the error
    channel, mirroring the reference's missing-dob skip
    (``dcc_transforms.py:66-69``).

    Plan: groupBy-key anchor aggregate (small: one row per key) broadcast
    back onto the fact — the Spark form of the reference's ``shift_dict``.
    """
    anchors = (
        df.filter(anchor_predicate)
        .groupBy(key_col)
        .agg(F.min(ts_col).alias("__anchor"))
    )
    # Microsecond-exact shift: the anchor carries sub-second precision, and
    # second-truncated arithmetic would drift formatted output by ±1s.
    shift_us = F.unix_micros(F.lit(standard_ts).cast("timestamp")) - F.unix_micros(F.col("__anchor"))
    return (
        df.join(F.broadcast(anchors), key_col, "left")
        .withColumn("__shifted", F.timestamp_add("MICROSECOND", shift_us, F.col(ts_col)))
    )


# --------------------------------------------------------------------------
# Registered workload queries (events table stands in for the EAV dates)
# --------------------------------------------------------------------------
@register(
    "date_granularities",
    """
    SELECT event_id,
           strftime(ts, '%Y-%m-%d')          AS g_date,
           strftime(ts, '%Y-%m-%d %H:%M')    AS g_datetime,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS g_datetime_seconds,
           strftime(ts, '%Y')                AS g_year
    FROM events
    """,
    doc="Reference F5-F8: the four de-identification output granularities.",
)
def date_granularities(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir)["events"]
    return e.select(
        "event_id",
        format_granularity(F.col("ts"), "Date").alias("g_date"),
        format_granularity(F.col("ts"), "DateTime").alias("g_datetime"),
        format_granularity(F.col("ts"), "DateTimeSeconds").alias("g_datetime_seconds"),
        format_granularity(F.col("ts"), "DateYear").alias("g_year"),
    )


@register(
    "date_shift_constant",
    """
    SELECT event_id,
           strftime(ts + INTERVAL 86501 SECOND, '%Y-%m-%d %H:%M:%S') AS shifted_ts
    FROM events
    """,
    doc="Reference date_shifting strategy: constant-seconds interval shift (F2).",
)
def date_shift_constant(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir)["events"]
    return e.select(
        "event_id",
        F.date_format(F.timestamp_add("SECOND", F.lit(86501), F.col("ts")), "yyyy-MM-dd HH:mm:ss").alias(
            "shifted_ts"
        ),
    )


@register(
    "date_total_seconds",
    """
    SELECT event_id,
           (epoch(date_trunc('second', ts))
            - epoch(TIMESTAMP '2024-01-01 00:00:00'))::BIGINT AS seconds_since_standard
    FROM events
    """,
    doc="Reference total_seconds strategy: signed date-diff in seconds (F4).",
)
def date_total_seconds(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir)["events"]
    return e.select(
        "event_id",
        seconds_between(F.col("ts"), F.lit("2024-01-01 00:00:00").cast("timestamp")).alias(
            "seconds_since_standard"
        ),
    )


@register(
    "date_anchor_shift",
    """
    WITH anchors AS (
      SELECT user_id, min(ts) AS anchor
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    )
    SELECT e.event_id,
           strftime(e.ts + (TIMESTAMP '2030-01-01 00:00:00' - a.anchor), '%Y-%m-%d %H:%M:%S') AS shifted_ts
    FROM events e LEFT JOIN anchors a USING (user_id)
    """,
    doc="Reference J3 dob-shifting: per-key anchor shift via groupBy+broadcast join.",
)
def date_anchor_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir)["events"]
    shifted = anchor_shift(
        e,
        key_col="user_id",
        ts_col="ts",
        anchor_predicate=F.col("event_type") == "signup",
        standard_ts="2030-01-01 00:00:00",
    )
    return shifted.select(
        "event_id", F.date_format("__shifted", "yyyy-MM-dd HH:mm:ss").alias("shifted_ts")
    )
