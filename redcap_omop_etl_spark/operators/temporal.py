"""Temporal interval operators: overlap joins, hierarchical rollups,
order-statistic window frames.

The reference's only temporal logic is scalar date arithmetic
(``dcc_transforms.py:40-174``); nothing joins rows *by time range*. These
operators add the interval family a time-series/hypertable engine needs,
each formulated so the plan scales:

- **Grid-binned overlap join**: the naive plan for ``point BETWEEN lo AND
  hi`` with no equi-key is a BroadcastNestedLoopJoin — O(n*m) and
  un-shuffleable. Binning both sides onto a fixed time grid turns it into
  an equi-join on the bucket id (hash-partitionable, AQE-skew-splittable),
  with the exact predicate re-checked on the candidates. A point lands in
  exactly one bucket, so interval-vs-point needs no post-join dedup.
- **Rollup cascade**: aggregate once at the finest grain, then *re-aggregate
  the partials* to coarser grains (hour → day). The day-level shuffle moves
  only ``#hours × #keys`` partial rows, not the raw events — the
  continuous-aggregate / hypertable-rollup pattern (TimescaleDB-style),
  expressed as mergeable (sum, count) state.
- **Moving median**: exact order-statistic over a bounded rows-frame.
  Evaluates inside the already-sorted window partition — one shuffle on the
  partition key, no extra exchange for the frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from redcap_omop_etl_spark.sources.readers import Catalog
from redcap_omop_etl_spark.workload import register

# Grid width for the binned overlap join, in seconds. At 100 TB pick this
# near the typical interval length: wider buckets → fewer replicated
# interval rows; narrower → fewer false candidate pairs to re-check.
_GRID_S = 300


def interval_point_join(
    intervals: DataFrame,
    points: DataFrame,
    *,
    lo: str = "lo",
    hi: str = "hi",
    ts: str = "ts",
    grid_s: int = _GRID_S,
) -> DataFrame:
    """Join each point to every interval containing it (``lo <= ts < hi``)
    WITHOUT an equi-key, via time-grid binning.

    Each interval row is exploded to the grid buckets it spans
    (``sequence(floor(lo/g), floor(hi/g))``); each point maps to exactly one
    bucket. The equi-join on ``__bucket`` routes candidates through a normal
    hash shuffle, and the exact containment predicate filters them. Because
    a point has exactly one bucket, no pair can match twice — no dedup step.
    """
    binned_iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                (F.unix_timestamp(lo) / grid_s).cast("long"),
                (F.unix_timestamp(hi) / grid_s).cast("long"),
            )
        ),
    )
    binned_pt = points.withColumn("__bucket", (F.unix_timestamp(ts) / grid_s).cast("long"))
    return (
        binned_iv.join(binned_pt, "__bucket")
        .filter((F.col(ts) >= F.col(lo)) & (F.col(ts) < F.col(hi)))
        .drop("__bucket")
    )


@register(
    "join_interval_overlap",
    """
    WITH err AS (
      SELECT ts AS lo, ts + INTERVAL 5 MINUTE AS hi
      FROM events WHERE event_type = 'error'
    ),
    pur AS (
      SELECT event_id, ts FROM events WHERE event_type = 'purchase'
    )
    SELECT strftime(p.ts, '%Y-%m-%d') AS day,
           count(*) AS n_containments,
           count(DISTINCT p.event_id) AS n_purchases_in_error_window
    FROM pur p JOIN err e ON p.ts >= e.lo AND p.ts < e.hi
    GROUP BY day
    ORDER BY day
    """,
    doc="Interval-containment join with NO equi-key (purchases inside any "
    "error window), executed as a grid-binned equi-join instead of a "
    "BroadcastNestedLoopJoin — the plan that survives when neither side "
    "fits in a broadcast at 100 TB.",
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir)["events"]
    err = ev.filter(F.col("event_type") == "error").select(
        F.col("ts").alias("lo"), (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("hi")
    )
    pur = ev.filter(F.col("event_type") == "purchase").select("event_id", "ts")
    joined = interval_point_join(err, pur)
    return (
        joined.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_containments"),
            F.count_distinct("event_id").alias("n_purchases_in_error_window"),
        )
        .orderBy("day")
    )


@register(
    "rollup_cascade",
    """
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hr,
             count(*) AS cnt, sum(value::DECIMAL(14,2)) AS sv
      FROM events GROUP BY event_type, hr
    )
    SELECT event_type, strftime(date_trunc('day', hr), '%Y-%m-%d') AS day,
           sum(cnt)::BIGINT AS n_events,
           count(*) AS n_hours,
           ((sum(sv) * 10000)::BIGINT // sum(cnt))::BIGINT AS avg_value_e4
    FROM hourly
    GROUP BY event_type, day
    ORDER BY event_type, day
    """,
    doc="Hierarchical rollup: hour-grain partial aggregates (count, sum) "
    "re-aggregated to day grain — the continuous-aggregate pattern where "
    "the coarse grain shuffles only the fine-grain partials, never the raw "
    "events. avg is derived from mergeable (sum, count) state, proving the "
    "partials compose.",
)
def rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir)["events"]
    # Decimal partial sums: exact, so the hour→day re-aggregation is
    # order-insensitive (double partials would drift with shuffle order).
    hourly = ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("hr")).agg(
        F.count(F.lit(1)).alias("cnt"), F.sum(F.col("value").cast("decimal(14,2)")).alias("sv")
    )
    return (
        hourly.groupBy("event_type", F.date_format(F.date_trunc("day", "hr"), "yyyy-MM-dd").alias("day"))
        .agg(
            F.sum("cnt").alias("n_events"),
            F.count(F.lit(1)).alias("n_hours"),
            # Exact integer floor-division at 1e-4 scale: a rounded double
            # quotient of a 2dp sum by a small count hits .xxxx5 ties where
            # Spark (HALF_UP) and other engines disagree.
            F.expr("CAST(sum(sv) * 10000 AS BIGINT) div sum(cnt)").alias("avg_value_e4"),
        )
        .orderBy("event_type", "day")
    )


@register(
    "window_moving_median",
    """
    SELECT event_id,
           round(median(value) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 4) AS med5
    FROM events
    WHERE user_id < 50
    """,
    doc="Exact moving median (order statistic) over a 5-row frame per user "
    "— robust-smoothing primitive; evaluates inside the sorted window "
    "partition, one shuffle total.",
)
def window_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir)["events"].filter(F.col("user_id") < 50)
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-4, 0)
    return ev.select(
        "event_id",
        F.round(F.percentile("value", F.lit(0.5)).over(w), 4).alias("med5"),
    )
