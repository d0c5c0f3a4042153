"""Window-function operators: ranking, analytics, frames, sessionization.

The reference has no window functions (SURVEY §2.5) but two of its core
idioms are window-shaped: per-group anchor broadcast (J3 dob-shift) and
first-seen-wins dedup (A1). Both are implemented here as
``pyspark.sql.Window`` plans plus the net-new ranking/analytic surface.

Scale notes: a window partitioned by a key is exactly one shuffle on that
key; frames evaluate inside the sorted partition with no further exchange.
Sessionization is the classic gap-islands plan — lag + conditional cumsum —
which is one shuffle + one sort, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from redcap_omop_etl_spark.sources.readers import Catalog
from redcap_omop_etl_spark.workload import register


def topk_per_group(df: DataFrame, partition_cols: list[str], order_cols: list, k: int) -> DataFrame:
    """Top-k rows per group via row_number (deterministic given a total order)."""
    w = W.partitionBy(*partition_cols).orderBy(*order_cols)
    return df.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)


def first_seen_dedup(df: DataFrame, keys: list[str], order_cols: list) -> DataFrame:
    """First-occurrence-wins dedup (reference A1: ``seen_record_ids`` set,
    dcc_transforms.py:249-255) — row_number = 1 over an explicit order, so
    the result is deterministic where the reference's depended on input
    order."""
    w = W.partitionBy(*keys).orderBy(*order_cols)
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the in-user gap
    exceeds ``gap_minutes``. Returns one row per session."""
    order = [F.col(ts_col), F.col("event_id")] if "event_id" in df.columns else [F.col(ts_col)]
    w = W.partitionBy(user_col).orderBy(*order)
    gap = F.unix_timestamp(ts_col) - F.unix_timestamp(F.lag(ts_col).over(w))
    with_flag = df.withColumn("__new_session", F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0))
    with_id = with_flag.withColumn(
        "session_seq", F.sum("__new_session").over(w.rowsBetween(W.unboundedPreceding, 0))
    )
    return (
        with_id.groupBy(user_col, "session_seq")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


# --------------------------------------------------------------------------
# Registered workload queries
# --------------------------------------------------------------------------
@register(
    "window_topk_per_group",
    """
    SELECT o_orderpriority, o_orderkey, o_totalprice, rn FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders)
    WHERE rn <= 3
    """,
    doc="Top-k per group via ranking window (net-new, SURVEY §2.5).",
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir)["orders"]
    return topk_per_group(
        o, ["o_orderpriority"], [F.desc("o_totalprice"), F.asc("o_orderkey")], 3
    ).select("o_orderpriority", "o_orderkey", "o_totalprice", "rn")


@register(
    "window_lag_lead",
    """
    SELECT event_id, user_id,
           lag(event_type)  OVER w AS prev_type,
           lead(event_type) OVER w AS next_type,
           (epoch(date_trunc('second', ts))
            - epoch(date_trunc('second', lag(ts) OVER w)))::BIGINT AS gap_seconds
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc="Analytic window: lag/lead over per-user event streams.",
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir)["events"]
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))).cast("long").alias("gap_seconds"),
    )


@register(
    "window_running_agg",
    """
    SELECT event_id, user_id,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_value,
           count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_n
    FROM events
    """,
    doc="Aggregate-over-frame window: running sum/count per user.",
)
def window_running_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir)["events"]
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(W.unboundedPreceding, 0)
    return e.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 2).alias("running_value"),
        F.count(F.lit(1)).over(w).alias("running_n"),
    )


@register(
    "dedup_first_seen",
    """
    SELECT user_id, event_type, event_id AS first_event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS first_ts
    FROM (
      SELECT user_id, event_type, event_id, ts,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rn
      FROM events)
    WHERE rn = 1
    """,
    doc="Reference A1: first-seen-wins dedup as a deterministic ranking window.",
)
def dedup_first_seen(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir)["events"]
    return first_seen_dedup(e, ["user_id", "event_type"], [F.asc("ts"), F.asc("event_id")]).select(
        "user_id",
        "event_type",
        F.col("event_id").alias("first_event_id"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("first_ts"),
    )


@register(
    "sessionize_gap",
    """
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch(date_trunc('second', ts))
                          - epoch(date_trunc('second', lag(ts) OVER w)) > 1800
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
      SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
      FROM flagged
    )
    SELECT user_id, session_seq::BIGINT AS session_seq,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
           count(*) AS n_events
    FROM numbered GROUP BY user_id, session_seq
    """,
    doc="Sessionization via gap-islands (lag + conditional cumsum).",
)
def sessionize_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir)["events"]
    return sessionize(e, gap_minutes=30).select(
        "user_id",
        "session_seq",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format("session_end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        "n_events",
    )


# --------------------------------------------------------------------------
# As-of join (net-new, SURVEY §2.3 generalization): for each purchase,
# the latest same-user signup at-or-before it. Implemented as a union +
# window (single shuffle on user_id) instead of an O(n²) theta join —
# the plan that survives 100 TB. DuckDB's native ASOF JOIN is the oracle.
# --------------------------------------------------------------------------
@register(
    "join_asof",
    """
    SELECT p.event_id, p.user_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           s.event_id AS signup_event_id
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
      ON p.user_id = s.user_id AND p.ts >= s.ts
    """,
    doc="As-of join via union+window — one shuffle, no range explosion.",
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir)["events"]
    return asof_join(
        e.filter(F.col("event_type") == "purchase"),
        e.filter(F.col("event_type") == "signup"),
        on="user_id",
        ts_col="ts",
        left_cols=["event_id", "user_id"],
        right_value="event_id",
        right_alias="signup_event_id",
    ).select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        "signup_event_id",
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str,
    left_cols: list[str],
    right_value: str,
    right_alias: str,
) -> DataFrame:
    """Backward as-of join (latest right row with ``right.ts <= left.ts``
    per ``on`` key).

    Plan: tag both sides, union, sort within the key partition by
    (ts, side-priority), and carry the last seen right value forward with
    ``last(..., ignorenulls=True)``. One shuffle on the key; no range
    cross-product, so it scales linearly where a theta join would explode.
    DuckDB ASOF semantics: ties (left.ts == right.ts) match, so the right
    side sorts before the left at equal timestamps.
    """
    unioned = _asof_tag_union(
        left,
        right,
        on,
        ts_col,
        rv=F.col(right_value),
        rv_type=dict(right.dtypes)[right_value],
        left_extra=[c for c in left_cols if c not in (on, ts_col)],
    )
    w = _asof_order(on, ts_col).rowsBetween(W.unboundedPreceding, 0)
    return (
        unioned.withColumn(right_alias, F.last("__rv", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
        .drop("__side", "__rv")
    )


def _asof_order(on: str, ts_col: str):
    """The ONE window ordering every as-of variant rides: (ts, __side)
    within the key partition, right side (__side 0) sorting before the
    left (1) at equal timestamps so backward frames include exact-ts
    matches (DuckDB ASOF tie semantics)."""
    return W.partitionBy(on).orderBy(ts_col, "__side")


def _asof_tag_union(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str,
    rv: Column,
    rv_type: str,
    left_extra: list[str],
) -> DataFrame:
    """Tag-and-union core shared by the backward and nearest as-of
    variants: left rows carry __side=1 and a typed-null payload, right
    rows __side=0 and ``rv``; every null-cast/column-alignment invariant
    lives here once."""
    lt = left.select(
        F.col(on), F.col(ts_col), F.lit(1).alias("__side"), *[F.col(c) for c in left_extra]
    ).withColumn("__rv", F.lit(None).cast(rv_type))
    rt = right.select(F.col(on), F.col(ts_col), F.lit(0).alias("__side"), rv.alias("__rv"))
    for c in left_extra:
        rt = rt.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    return lt.unionByName(rt.select(*lt.columns))


@register(
    "window_range_frame",
    """
    SELECT event_id, user_id,
           round(sum(value::DECIMAL(8,2))
                 OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                       RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)::DOUBLE,
                 2) AS hour_sum
    FROM events
    """,
    doc="Value-range window frame (trailing 1 hour per user) — "
    "rangeBetween on exact microsecond epoch (whole-second epochs would "
    "floor away sub-second timestamps and shift frame membership); "
    "value-defined frames keep ties deterministic.",
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir)["events"]
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.round(F.sum(F.col("value").cast("decimal(8,2)")).over(w).cast("double"), 2).alias("hour_sum"),
    )


@register(
    "window_rank_family",
    """
    SELECT event_id, event_type,
           rank()         OVER w AS rnk,
           dense_rank()   OVER w AS drnk,
           round(percent_rank() OVER w, 6) AS prnk,
           round(cume_dist()    OVER w, 6) AS cdist,
           ntile(4)       OVER w AS quartile
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY value DESC, event_id)
    """,
    doc="Ranking-function family over one named window (unique tiebreak "
    "keeps every function deterministic).",
)
def window_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir)["events"]
    w = W.partitionBy("event_type").orderBy(F.desc("value"), F.asc("event_id"))
    return e.select(
        "event_id",
        "event_type",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.round(F.percent_rank().over(w), 6).alias("prnk"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
        F.ntile(4).over(w).alias("quartile"),
    )


@register(
    "cohort_retention",
    """
    WITH firsts AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
      FROM events GROUP BY 1
    ), activity AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS week
      FROM events
    )
    SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort,
           cast(date_diff('day', cohort_week, week) / 7 AS int) AS week_n,
           count(*) AS active_users
    FROM activity JOIN firsts USING (user_id)
    GROUP BY 1, 2
    """,
    doc="Cohort retention: users bucketed by first-seen week, counted in "
    "each subsequent active week. Both aggs and the join key on user_id — "
    "the first shuffle's partitioning is reused by the join and the "
    "distinct (co-partitioned, AQE coalesced); only the final tiny "
    "(cohort, week_n) agg reshuffles.",
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir)["events"]
    week = F.date_trunc("week", F.col("ts"))
    firsts = e.groupBy("user_id").agg(F.date_trunc("week", F.min("ts")).alias("cohort_week"))
    activity = e.select("user_id", week.alias("week")).distinct()
    return (
        activity.join(firsts, "user_id")
        .groupBy(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort"),
            (F.datediff(F.col("week"), F.col("cohort_week")) / 7).cast("int").alias("week_n"),
        )
        .agg(F.count(F.lit(1)).alias("active_users"))
    )


@register(
    "funnel_steps",
    """
    WITH per_user AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN ts END)     AS t_view,
             min(CASE WHEN event_type = 'click' THEN ts END)    AS t_click,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events GROUP BY user_id
    )
    SELECT count(*) FILTER (WHERE t_view IS NOT NULL) AS n_view,
           count(*) FILTER (WHERE t_view IS NOT NULL AND t_click > t_view)
             AS n_view_click,
           count(*) FILTER (WHERE t_view IS NOT NULL AND t_click > t_view
                              AND t_purchase > t_click)
             AS n_view_click_purchase
    FROM per_user
    """,
    doc="Ordered conversion funnel (view → click → purchase): one "
    "conditional-min agg per user — a single shuffle on user_id — then a "
    "global counts rollup; step order enforced by timestamp comparison, "
    "NULL step times fail the ordered predicate on both engines.",
)
def funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir)["events"]

    def step_min(t: str):
        return F.min(F.when(F.col("event_type") == t, F.col("ts")))

    per_user = e.groupBy("user_id").agg(
        step_min("view").alias("t_view"),
        step_min("click").alias("t_click"),
        step_min("purchase").alias("t_purchase"),
    )
    viewed = F.col("t_view").isNotNull()
    clicked = viewed & (F.col("t_click") > F.col("t_view"))
    purchased = clicked & (F.col("t_purchase") > F.col("t_click"))
    return per_user.agg(
        F.count(F.when(viewed, 1)).alias("n_view"),
        F.count(F.when(clicked, 1)).alias("n_view_click"),
        F.count(F.when(purchased, 1)).alias("n_view_click_purchase"),
    )


@register(
    "timeseries_gapfill",
    """
    WITH bounds AS (
      SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi
      FROM events
    ), spine AS (
      SELECT t.event_type, s.h
      FROM (SELECT DISTINCT event_type FROM events) t
      CROSS JOIN (SELECT unnest(generate_series((SELECT lo FROM bounds),
                                                (SELECT hi FROM bounds),
                                                INTERVAL 1 HOUR)) AS h) s
    ), counts AS (
      SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT spine.event_type,
           strftime(spine.h, '%Y-%m-%d %H:%M:%S') AS hour,
           coalesce(counts.n, 0) AS n
    FROM spine LEFT JOIN counts
      ON spine.event_type = counts.event_type AND spine.h = counts.h
    """,
    doc="Time-series gap-fill (date spine): hourly counts per type with "
    "missing hours materialized as zeros. The spine is sequence()+explode "
    "per type — NO cross join in the plan (the hour array is generated "
    "inside each type's row); span bounds are two driver-side scalars "
    "(one tiny agg job). The left join is dim-sized and broadcast; the "
    "only real shuffle is the hourly count agg.",
)
def timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir)["events"]
    lo, hi = e.agg(
        F.date_trunc("hour", F.min("ts")), F.date_trunc("hour", F.max("ts"))
    ).collect()[0]
    spine = (
        e.select("event_type")
        .distinct()
        .select(
            "event_type",
            F.explode(
                F.sequence(
                    F.lit(lo).cast("timestamp"), F.lit(hi).cast("timestamp"), F.expr("interval 1 hour")
                )
            ).alias("h"),
        )
    )
    counts = e.groupBy("event_type", F.date_trunc("hour", F.col("ts")).alias("h")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return spine.join(counts, ["event_type", "h"], "left").select(
        "event_type",
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        F.coalesce("cnt", F.lit(0)).alias("n"),
    )


@register(
    "session_paths",
    """
    WITH ordered AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                    OVER (PARTITION BY user_id ORDER BY ts, event_id)
                  > 1800000000 THEN 1 ELSE 0 END AS new_session
      FROM events
    ), sessions AS (
      SELECT user_id, ts, event_id, event_type,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_no
      FROM ordered
    ), paths AS (
      SELECT user_id, session_no,
             string_agg(event_type, '>' ORDER BY ts, event_id) AS path
      FROM sessions GROUP BY user_id, session_no
    )
    SELECT path, count(*) AS n_sessions
    FROM paths GROUP BY path
    HAVING count(*) >= 2
    """,
    doc="Session path mining: gap-islands sessionization (30 min), then "
    "each session's ordered event-type path via sort_array over collected "
    "(ts, event_id, type) structs — deterministic under any partition "
    "order, no listagg dependence — then path frequency. One user_id "
    "shuffle serves the lag window, the cumulative session numbering, and "
    "the per-session collect; only the tiny path-count agg reshuffles.",
)
def session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir)["events"]
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = 1_800_000_000
    new_session = (
        F.when(
            F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w) > gap_us, 1
        ).otherwise(0)
    )
    numbered = e.select("user_id", "ts", "event_id", "event_type", new_session.alias("ns"))
    sessions = numbered.withColumn(
        "session_no", F.sum("ns").over(w.rowsBetween(W.unboundedPreceding, 0))
    )
    paths = (
        sessions.groupBy("user_id", "session_no")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type"))),
                    lambda s: s["event_type"],
                ),
                ">",
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .filter(F.col("n_sessions") >= 2)
    )


@register(
    "window_forward_fill",
    """
    SELECT event_id, user_id,
           round(coalesce(
             last_value(CASE WHEN event_type = 'error' THEN NULL ELSE value END
                        IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING),
             -1.0), 2) AS v_ffill
    FROM events
    """,
    doc="Forward-fill imputation: last non-null value per user carried "
    "over null readings ('error' events masked to NULL as the synthetic "
    "gap) — last_value(IGNORE NULLS) over an unbounded-preceding row "
    "frame, one shuffle on the partition key; leading gaps surface as a "
    "sentinel via coalesce.",
)
def window_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir)["events"]
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    masked = F.when(F.col("event_type") == "error", F.lit(None)).otherwise(F.col("value"))
    return e.select(
        "event_id",
        "user_id",
        F.round(
            F.coalesce(F.last(masked, ignorenulls=True).over(w), F.lit(-1.0)), 2
        ).alias("v_ffill"),
    )


@register(
    "anomaly_zscore",
    """
    WITH stats AS (
      SELECT event_type,
             avg(value) AS mu,
             stddev_samp(value) AS sigma
      FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type,
           round((e.value - s.mu) / s.sigma, 4) AS z
    FROM events e JOIN stats s ON e.event_type = s.event_type
    WHERE abs((e.value - s.mu) / s.sigma) > 2.5
    """,
    doc="Z-score anomaly flagging: per-type mean/stddev in one tiny agg "
    "(broadcast back to the stream — the fact side never shuffles), "
    "outliers filtered at |z| > 2.5. The grouped-stats-then-rejoin shape "
    "is the scalable alternative to a per-row window over the whole "
    "table when the group count is dim-sized.",
)
def anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir)["events"]
    stats = e.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sigma")
    )
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    return (
        e.join(F.broadcast(stats), "event_type")
        .filter(F.abs(z) > 2.5)
        .select("event_id", "event_type", F.round(z, 4).alias("z"))
    )


@register(
    "rfm_segmentation",
    """
    WITH rfm AS (
      SELECT o_custkey,
             max(o_orderdate) AS last_order,
             count(*) AS frequency,
             round(cast(sum(cast(o_totalprice AS decimal(12,2))) AS double), 2)
               AS monetary
      FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey,
           ntile(4) OVER (ORDER BY last_order, o_custkey)           AS r_quartile,
           ntile(4) OVER (ORDER BY frequency, o_custkey)            AS f_quartile,
           ntile(4) OVER (ORDER BY monetary, o_custkey)             AS m_quartile
    FROM rfm
    """,
    doc="RFM customer segmentation: one customer-keyed agg builds "
    "recency/frequency/monetary, quartiles via ntile with a unique "
    "tiebreak (deterministic cross-engine). The ntile windows are global "
    "by definition — at scale the rfm relation is |customers|, already "
    "dim-sized next to the fact it summarizes; monetary sums in exact "
    "decimal.",
)
def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir)["orders"]
    rfm = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(12,2)")).cast("double"), 2).alias(
            "monetary"
        ),
    )
    return rfm.select(
        "o_custkey",
        F.ntile(4).over(W.partitionBy(F.lit(0)).orderBy("last_order", "o_custkey")).alias("r_quartile"),
        F.ntile(4).over(W.partitionBy(F.lit(0)).orderBy("frequency", "o_custkey")).alias("f_quartile"),
        F.ntile(4).over(W.partitionBy(F.lit(0)).orderBy("monetary", "o_custkey")).alias("m_quartile"),
    )


@register(
    "scd2_history",
    """
    SELECT user_id,
           event_type AS state,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
           strftime(lead(ts) OVER w, '%Y-%m-%d %H:%M:%S') AS valid_to,
           (lead(ts) OVER w) IS NULL AS is_current
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc="SCD Type-2 history build from a change log: each state row gets "
    "a validity interval closed by the next change (lead), the open "
    "interval flagged current — one window over one shuffle on the "
    "entity key; the reference's secondary-ID mapping kept only the "
    "latest state, this keeps the full auditable timeline.",
)
def scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir)["events"]
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return e.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.date_format(nxt, "yyyy-MM-dd HH:mm:ss").alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


@register(
    "event_disorder_stats",
    """
    WITH seq AS (
      SELECT user_id, value,
             epoch_us(ts) - max(epoch_us(ts)) OVER (PARTITION BY user_id
                                                    ORDER BY event_id
                                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                                             AND 1 PRECEDING)
               AS lag_us
      FROM events
    )
    SELECT round(avg(CASE WHEN lag_us < 0 THEN 1.0 ELSE 0.0 END), 6)
             AS disorder_rate,
           cast(coalesce(max(CASE WHEN lag_us < 0 THEN -lag_us END), 0) AS bigint)
             AS max_lateness_us
    FROM seq
    """,
    doc="Out-of-order arrival measurement (event_id as arrival proxy): "
    "the fraction of events arriving behind their stream's high-water "
    "mark and the worst lateness — THE statistic that sizes a watermark "
    "(state cost vs drop rate); one shuffle on the entity key, then a "
    "1-row rollup.",
)
def event_disorder_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir)["events"]
    w = W.partitionBy("user_id").orderBy("event_id").rowsBetween(W.unboundedPreceding, -1)
    lag_us = F.unix_micros("ts") - F.max(F.unix_micros("ts")).over(w)
    seq = e.select(F.col("user_id"), lag_us.alias("lag_us"))
    return seq.agg(
        F.round(F.avg(F.when(F.col("lag_us") < 0, 1.0).otherwise(0.0)), 6).alias("disorder_rate"),
        F.coalesce(F.max(F.when(F.col("lag_us") < 0, -F.col("lag_us"))), F.lit(0))
        .cast("bigint")
        .alias("max_lateness_us"),
    )


@register(
    "window_sliding_distinct",
    """
    WITH w AS (
      SELECT ((floor(epoch(ts))::BIGINT // 900) - u.j) * 900 AS wstart_s, user_id
      FROM events, unnest(range(0, 4)) u(j)
    )
    SELECT wstart_s, count(DISTINCT user_id)::BIGINT AS n_users
    FROM w GROUP BY wstart_s
    """,
    doc="Sliding-window COUNT DISTINCT (1 h windows, 15 min slide): each "
    "event enumerates the 4 window starts that cover it (sequence + "
    "explode — pure column arithmetic, batch analog of the streaming "
    "sliding window), then the distinct count runs as TWO cascaded hash "
    "aggregates — (window, user) dedup first, then per-window counts — "
    "so the shuffle carries one row per distinct pair, never a "
    "collect_set, and both aggregates partial-combine map-side. The "
    "count-distinct shape that survives hot windows at 100 TB.",
)
def window_sliding_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir)["events"]
    grid = F.floor(F.unix_timestamp("ts") / 900)
    pairs = (
        e.select(grid.alias("g"), "user_id", F.explode(F.sequence(F.lit(0), F.lit(3))).alias("j"))
        .select(((F.col("g") - F.col("j")) * 900).alias("wstart_s"), "user_id")
        .distinct()
    )
    return pairs.groupBy("wstart_s").agg(F.count(F.lit(1)).alias("n_users"))


@register(
    "event_pattern_regex",
    """
    WITH seqs AS (
      SELECT user_id,
             string_agg(substring(event_type, 1, 1), '' ORDER BY ts, event_id) AS seq
      FROM events GROUP BY user_id
    )
    SELECT user_id,
           length(seq)::BIGINT AS seq_len,
           len(regexp_extract_all(seq, 'vc*p'))::BIGINT AS n_view_to_purchase,
           len(regexp_extract_all(seq, 'e{2,}'))::BIGINT AS n_error_bursts
    FROM seqs
    """,
    doc="Sequence-pattern matching over per-user event streams "
    "(MATCH_RECOGNIZE-lite): each user's ordered event-type initials "
    "collapse to ONE string via ordered string aggregation, then "
    "regex engines do the pattern work — view→purchase conversions "
    "(vc*p) and error bursts (e{2,}) counted as non-overlapping "
    "left-to-right matches, identical semantics in Java regex and RE2. "
    "One shuffle on user_id; per-user state is the initials string, "
    "bounded by events-per-user (cap or sessionize first when a key "
    "can exceed memory).",
)
def event_pattern_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir)["events"]
    seqs = e.groupBy("user_id").agg(
        F.expr(
            "listagg(substring(event_type, 1, 1), '') WITHIN GROUP (ORDER BY ts, event_id)"
        ).alias("seq")
    )
    return seqs.select(
        "user_id",
        F.length("seq").cast("bigint").alias("seq_len"),
        F.size(F.regexp_extract_all(F.col("seq"), F.lit("vc*p"), 0))
        .cast("bigint")
        .alias("n_view_to_purchase"),
        F.size(F.regexp_extract_all(F.col("seq"), F.lit("e{2,}"), 0))
        .cast("bigint")
        .alias("n_error_bursts"),
    )


@register(
    "join_asof_nearest",
    """
    WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
    s AS (
      SELECT user_id, ts, min(event_id) AS rid
      FROM events WHERE event_type = 'error' GROUP BY user_id, ts
    ), b AS (
      SELECT p.event_id, p.user_id, p.ts, s.rid AS b_id, s.ts AS b_ts
      FROM p ASOF LEFT JOIN s ON p.user_id = s.user_id AND p.ts >= s.ts
    ), f AS (
      SELECT p.event_id, s.rid AS f_id, s.ts AS f_ts
      FROM p ASOF LEFT JOIN s ON p.user_id = s.user_id AND p.ts <= s.ts
    ), m AS (
      SELECT b.event_id, b.user_id,
             strftime(b.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
             epoch_us(b.ts) - epoch_us(b_ts) AS db,
             epoch_us(f_ts) - epoch_us(b.ts) AS df,
             b_id, f_id
      FROM b JOIN f USING (event_id)
    )
    SELECT event_id, user_id, purchase_ts,
           CASE WHEN b_id IS NOT NULL AND (f_id IS NULL OR db <= df)
                THEN b_id ELSE f_id END AS nearest_error_id,
           CASE WHEN b_id IS NOT NULL AND (f_id IS NULL OR db <= df)
                THEN 'backward'
                WHEN f_id IS NOT NULL THEN 'forward' END AS direction,
           CASE WHEN b_id IS NOT NULL AND (f_id IS NULL OR db <= df) THEN db
                ELSE df END AS gap_us
    FROM m
    """,
    doc="Nearest-direction as-of join (pandas merge_asof "
    "direction='nearest'): each purchase matches its temporally closest "
    "error event per user, backward winning exact-distance ties. BOTH "
    "direction candidates come from ONE union + ONE (user_id)-partitioned "
    "sort — last(ignorenulls) over the preceding frame and "
    "first(ignorenulls) over the following frame share the same window "
    "exchange, so the nearest variant costs the same single shuffle as "
    "the backward-only operator (the oracle's two ASOF JOINs shuffle "
    "twice). Right side pre-aggregated to unique (user, ts) with min "
    "event_id so equal-timestamp matches are deterministic; distances "
    "compared in exact integer microseconds. Equal-ts right rows sort "
    "before the left row, so they land in the backward frame only — and "
    "backward wins gap-0 ties anyway, matching the inclusive <= oracle.",
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir)["events"]
    right = (
        e.filter(F.col("event_type") == "error")
        .groupBy("user_id", "ts")
        .agg(F.min("event_id").alias("rid"))
    )
    unioned = _asof_tag_union(
        e.filter(F.col("event_type") == "purchase"),
        right,
        on="user_id",
        ts_col="ts",
        rv=F.struct(F.unix_micros("ts").alias("ts_us"), F.col("rid").alias("rid")),
        rv_type="struct<ts_us:bigint,rid:bigint>",
        left_extra=["event_id"],
    )
    order = _asof_order("user_id", "ts")
    back = F.last("__rv", ignorenulls=True).over(order.rowsBetween(W.unboundedPreceding, 0))
    fwd = F.first("__rv", ignorenulls=True).over(order.rowsBetween(0, W.unboundedFollowing))
    m = (
        unioned.withColumn("__b", back)
        .withColumn("__f", fwd)
        .filter(F.col("__side") == 1)
        .select(
            "event_id",
            "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
            (F.unix_micros("ts") - F.col("__b.ts_us")).alias("db"),
            (F.col("__f.ts_us") - F.unix_micros("ts")).alias("df"),
            F.col("__b.rid").alias("b_id"),
            F.col("__f.rid").alias("f_id"),
        )
    )
    pick_back = F.col("b_id").isNotNull() & (F.col("f_id").isNull() | (F.col("db") <= F.col("df")))
    return m.select(
        "event_id",
        "user_id",
        "purchase_ts",
        F.when(pick_back, F.col("b_id")).otherwise(F.col("f_id")).alias("nearest_error_id"),
        F.when(pick_back, F.lit("backward"))
        .when(F.col("f_id").isNotNull(), F.lit("forward"))
        .alias("direction"),
        F.when(pick_back, F.col("db")).otherwise(F.col("df")).alias("gap_us"),
    )


@register(
    "join_asof_tolerance",
    """
    SELECT p.event_id, p.user_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           CASE WHEN s.ts IS NOT NULL
                 AND floor(epoch(p.ts)) - floor(epoch(s.ts)) <= 2592000
                THEN s.event_id END AS signup_event_id,
           CASE WHEN s.ts IS NOT NULL
                 AND floor(epoch(p.ts)) - floor(epoch(s.ts)) <= 2592000
                THEN floor(epoch(p.ts)) - floor(epoch(s.ts)) END::BIGINT AS gap_s
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
      ON p.user_id = s.user_id AND p.ts >= s.ts
    """,
    doc="Bounded-staleness as-of join (pandas merge_asof's `tolerance`): "
    "the latest same-user signup at-or-before each purchase counts only "
    "when it is at most 30 days stale — the join every feature-store "
    "lookup actually wants (a 3-year-old profile row should NOT enrich "
    "today's event). Same single-shuffle union+window plan as join_asof "
    "— the matched right timestamp rides the carried struct, and the "
    "tolerance is a post-window null-out, NOT a range join. Oracle: "
    "DuckDB native ASOF + the same staleness CASE over FLOORED epoch "
    "seconds on both sides — events carry microsecond precision, so an "
    "exact-interval oracle predicate would disagree with the emitted "
    "integer gap_s for true gaps in (30d, 30d+1s] at the boundary.",
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir)["events"]
    left = e.filter(F.col("event_type") == "purchase")
    right = e.filter(F.col("event_type") == "signup")
    unioned = _asof_tag_union(
        left,
        right,
        on="user_id",
        ts_col="ts",
        rv=F.struct(F.col("event_id").alias("rid"), F.col("ts").alias("rts")),
        rv_type="struct<rid:bigint,rts:timestamp>",
        left_extra=["event_id"],
    )
    w = _asof_order("user_id", "ts").rowsBetween(W.unboundedPreceding, 0)
    carried = (
        unioned.withColumn("__m", F.last("__rv", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    within = F.col("__m").isNotNull() & (
        F.col("ts").cast("long") - F.col("__m.rts").cast("long") <= 30 * 86400
    )
    return carried.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.when(within, F.col("__m.rid")).alias("signup_event_id"),
        F.when(within, F.col("ts").cast("long") - F.col("__m.rts").cast("long"))
        .cast("bigint")
        .alias("gap_s"),
    )


# ---------------------------------------------------------------------------
# Conversation-format audit: role alternation within gap sessions
# ---------------------------------------------------------------------------

_CONV_GAP_S = 1800
_CONV_USER_EVENTS = ("click", "view", "signup")


@register(
    "conversation_turn_audit",
    f"""
    WITH b AS (
      SELECT user_id, event_id, epoch_us(ts) // 1000000 AS sec,
             CASE WHEN event_type IN ('click', 'view', 'signup')
                  THEN 'user' ELSE 'assistant' END AS role
      FROM events
    ), l AS (
      SELECT *, lag(sec) OVER w AS prev_sec, lag(role) OVER w AS prev_role
      FROM b WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)
    ), f AS (
      SELECT *, CASE WHEN prev_sec IS NULL OR sec - prev_sec > {_CONV_GAP_S}
                     THEN 1 ELSE 0 END AS new_sess
      FROM l
    ), s AS (
      SELECT *, sum(new_sess) OVER (
        PARTITION BY user_id ORDER BY sec, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM f
    )
    SELECT user_id, session_id::BIGINT AS session_id,
           count(*)::BIGINT AS n_turns,
           sum(CASE WHEN role = 'user' THEN 1 ELSE 0 END)::BIGINT AS n_user_turns,
           sum(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END)::BIGINT
             AS n_assistant_turns,
           sum(CASE WHEN new_sess = 0 AND role = prev_role THEN 1 ELSE 0 END)::BIGINT
             AS n_role_violations,
           (max(sec) - min(sec))::BIGINT AS span_seconds
    FROM s GROUP BY user_id, session_id
    """,
    doc="Chat-format validation for SFT data prep: interpret each user's "
    "gap-delimited event session as a conversation (client events = user "
    "turns, server events = assistant turns) and audit the structure a "
    "chat template requires — turn counts per role, strict-alternation "
    "violations (consecutive same-role turns, the thing that breaks "
    "most instruct templates), and session span. One window pass over "
    "(user_id) computes lag + session id + violation flags together; "
    "user_id cardinality GROWS with the corpus, so the sort "
    "parallelism scales with data (no low-cardinality key ceiling); "
    "timestamps reduce to integer epoch seconds so every comparison "
    "and the running session counter replay exactly cross-engine. "
    "Swapping real chat transcripts for the event proxy changes the "
    "role mapping expression, not the plan.",
)
def conversation_turn_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir)["events"]
    w = W.partitionBy("user_id").orderBy("sec", "event_id")
    base = e.select(
        "user_id",
        "event_id",
        # Pre-1970 epochs: investigated for ADVICE r7, which claimed
        # DuckDB's `epoch_us(ts) // 1000000` floors while Spark's `div`
        # truncates. Measured otherwise: DuckDB `//` on BIGINT operands
        # TRUNCATES toward zero exactly like Spark's `div` (-500000 //
        # 1000000 = 0, -7 // 2 = -3), so the two reductions agree at
        # every epoch including negatives — pinned cross-engine in
        # tests/test_round8_ops.py::TestEpochSecondReduction.
        F.expr("unix_micros(ts) div 1000000").alias("sec"),
        F.when(F.col("event_type").isin(*_CONV_USER_EVENTS), "user")
        .otherwise("assistant")
        .alias("role"),
    )
    flagged = (
        base.withColumn("prev_sec", F.lag("sec").over(w))
        .withColumn("prev_role", F.lag("role").over(w))
        .withColumn(
            "new_sess",
            F.when(
                F.col("prev_sec").isNull()
                | (F.col("sec") - F.col("prev_sec") > _CONV_GAP_S),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "session_id",
            F.sum("new_sess").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
        )
    )
    return flagged.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        F.sum(F.when(F.col("role") == "user", 1).otherwise(0))
        .cast("long")
        .alias("n_user_turns"),
        F.sum(F.when(F.col("role") == "assistant", 1).otherwise(0))
        .cast("long")
        .alias("n_assistant_turns"),
        F.sum(
            F.when((F.col("new_sess") == 0) & (F.col("role") == F.col("prev_role")), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("n_role_violations"),
        (F.max("sec") - F.min("sec")).cast("long").alias("span_seconds"),
    )
