"""Time-series analytics: interval coalescing, state durations, counter
deltas, time-weighted average — hand-computed semantics plus plan pins.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from redcap_omop_etl_spark import workload
from redcap_omop_etl_spark.operators.tsanalytics import coalesce_intervals
from tests.conftest import SF_SMOKE


def _plan(spark, name):
    df = workload.queries()[name](spark, SF_SMOKE)
    return df._jdf.queryExecution().executedPlan().toString()


class TestCoalesceIntervals:
    def test_overlap_touch_disjoint(self, spark):
        # a-b overlap, b-c touch (hi == lo: merges, lo > prev_max is false),
        # d disjoint → two islands: [00:00,00:30) x3 and [01:00,01:10) x1.
        iv = spark.sql(
            """SELECT * FROM VALUES
               (1, timestamp'2024-01-01 00:00:00', timestamp'2024-01-01 00:10:00'),
               (1, timestamp'2024-01-01 00:05:00', timestamp'2024-01-01 00:20:00'),
               (1, timestamp'2024-01-01 00:20:00', timestamp'2024-01-01 00:30:00'),
               (1, timestamp'2024-01-01 01:00:00', timestamp'2024-01-01 01:10:00')
               AS t(k, lo, hi)"""
        )
        got = sorted(
            (r.lo.minute, r.hi.minute, r.n_merged)
            for r in coalesce_intervals(iv, key="k", lo="lo", hi="hi").collect()
        )
        assert got == [(0, 30, 3), (0, 10, 1)] or got == [(0, 10, 1), (0, 30, 3)]

    def test_contained_interval_does_not_split_island(self, spark):
        # A long interval followed by a short one fully inside it: the
        # running max (not lag) keeps the island open past the short one.
        iv = spark.sql(
            """SELECT * FROM VALUES
               (1, timestamp'2024-01-01 00:00:00', timestamp'2024-01-01 01:00:00'),
               (1, timestamp'2024-01-01 00:10:00', timestamp'2024-01-01 00:20:00'),
               (1, timestamp'2024-01-01 00:30:00', timestamp'2024-01-01 00:40:00')
               AS t(k, lo, hi)"""
        )
        merged = coalesce_intervals(iv, key="k", lo="lo", hi="hi").collect()
        assert len(merged) == 1 and merged[0].n_merged == 3

    def test_single_data_shuffle(self, spark):
        # window on user_id; groupBy(user_id, island) and groupBy(user_id)
        # reuse that partitioning — the only other exchange is the output
        # orderBy's range partitioning.
        plan = _plan(spark, "interval_coalesce")
        assert plan.count("Exchange") == 2, plan
        assert "SortAggregate" not in plan, plan


class TestStateDurations:
    def test_hand_timeline(self, spark):
        df = spark.sql(
            """SELECT * FROM VALUES
               (1, 1, timestamp'2024-01-01 00:00:00', 'view'),
               (1, 2, timestamp'2024-01-01 00:00:10', 'click'),
               (1, 3, timestamp'2024-01-01 00:00:40', 'view')
               AS t(user_id, event_id, ts, event_type)"""
        )
        df.createOrReplaceTempView("__sd")
        from pyspark.sql import Window as W

        order = W.partitionBy("user_id").orderBy("ts", "event_id")
        seg = df.select(
            F.col("event_type").alias("state"),
            (F.unix_timestamp(F.lead("ts").over(order)) - F.unix_timestamp("ts")).alias("d"),
        ).filter(F.col("d").isNotNull())
        got = {r.state: r.d for r in seg.collect()}
        assert got == {"view": 10, "click": 30}  # last event opens no segment


class TestCounterDeltas:
    def test_reset_detection(self, spark):
        rows = workload.queries()["counter_deltas"](spark, SF_SMOKE).collect()
        assert rows, "no per-user counter rows"
        for r in rows:
            assert r.increase_cents >= 0
            assert 0 <= r.n_resets <= r.n_deltas

    def test_agg_reuses_window_partitioning(self, spark):
        plan = _plan(spark, "counter_deltas")
        assert plan.count("Exchange") == 2, plan  # window hash + orderBy range


class TestTimeWeightedAvg:
    def test_twa_bounds(self, spark):
        # floor(weighted avg) must sit within the observed cents range.
        rows = workload.queries()["time_weighted_avg"](spark, SF_SMOKE).collect()
        assert rows
        for r in rows:
            assert r.twa_cents_floor * r.total_s <= r.weighted_cents_s
            assert (r.twa_cents_floor + 1) * r.total_s > r.weighted_cents_s


class TestCusumChangepoint:
    def test_matches_pandas_bruteforce(self, spark):
        import numpy as np

        got = {
            r.event_type: r
            for r in workload.queries()["ts_cusum_changepoint"](spark, SF_SMOKE).collect()
        }
        pdf = (
            spark.read.parquet(f"{SF_SMOKE}/events.parquet")
            .selectExpr(
                "event_type",
                "date_format(cast(ts as date), 'yyyy-MM-dd') as day",
                "cast(round(value * 100) as long) as cents",
            )
            .toPandas()
        )
        daily = pdf.groupby(["event_type", "day"], as_index=False)["cents"].sum()
        for et, g in daily.groupby("event_type"):
            g = g.sort_values("day").reset_index(drop=True)
            x = g["cents"].to_numpy(dtype="int64")
            n, tot = len(x), int(x.sum())
            c = n * np.cumsum(x) - (np.arange(1, n + 1) * tot)
            i = int(np.argmax(np.abs(c)))  # first max — matches day-asc tie-break
            r = got[et]
            assert r.n_days == n
            assert r.cp_day == g.loc[i, "day"]
            assert abs(r.cusum_peak - round(c[i] / (n * 100.0), 4)) < 1e-9


class TestSeasonalStrength:
    def test_matches_pandas_bruteforce(self, spark):
        got = {
            r.event_type: r
            for r in workload.queries()["ts_seasonal_strength"](spark, SF_SMOKE).collect()
        }
        pdf = (
            spark.read.parquet(f"{SF_SMOKE}/events.parquet")
            .selectExpr(
                "event_type",
                "cast(ts as date) as day",
                "cast(round(value * 100) as long) as cents",
            )
            .toPandas()
        )
        daily = pdf.groupby(["event_type", "day"], as_index=False)["cents"].sum()
        daily["dow"] = daily["day"].map(lambda d: d.isoweekday() % 7 + 1)  # Spark: Sun=1
        for et, g in daily.groupby("event_type"):
            means = g.groupby("dow")["cents"].mean()
            resid = g["cents"].astype("float64") - g["dow"].map(means)
            strength = max(0.0, 1.0 - resid.var(ddof=1) / g["cents"].astype("float64").var(ddof=1))
            r = got[et]
            assert r.n_days == len(g)
            assert abs(r.seasonal_strength - round(strength, 5)) < 1e-4
            rounded = means.round(4)
            assert r.peak_dow == min(d for d in rounded.index if rounded[d] == rounded.max())
            assert r.trough_dow == min(d for d in rounded.index if rounded[d] == rounded.min())


class TestCrossCorrelation:
    def test_matches_numpy(self, spark):
        import numpy as np

        rows = workload.queries()["ts_cross_correlation"](spark, SF_SMOKE).collect()
        assert rows, "expected at least one pair with >= 30 aligned days"
        pdf = (
            spark.read.parquet(f"{SF_SMOKE}/events.parquet")
            .selectExpr(
                "event_type",
                "cast(ts as date) as day",
                "cast(round(value * 100) as long) as cents",
            )
            .toPandas()
        )
        daily = pdf.groupby(["event_type", "day"])["cents"].sum()
        for r in rows:
            assert r.type_a < r.type_b
            a, b = daily[r.type_a], daily[r.type_b]
            pairs = [
                (a[d], b[dd])
                for d in a.index
                for dd in [d + __import__("datetime").timedelta(days=int(r.lag_days))]
                if dd in b.index
            ]
            assert r.n_days == len(pairs) >= 30
            xs, ys = zip(*pairs)
            assert abs(r.xcorr - round(float(np.corrcoef(xs, ys)[0, 1]), 6)) < 1e-5

    def test_daily_reduction_before_join(self, spark):
        # the pair join must run on the aggregated daily table, not raw
        # events: both join children contain a HashAggregate below them.
        plan = _plan(spark, "ts_cross_correlation")
        assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


class TestForecastBacktest:
    def test_matches_pandas_bruteforce(self, spark):
        import pandas as pd

        got = {
            r.event_type: r
            for r in workload.queries()["ts_forecast_backtest"](spark, SF_SMOKE).collect()
        }
        pdf = (
            spark.read.parquet(f"{SF_SMOKE}/events.parquet")
            .selectExpr(
                "event_type",
                "cast(ts as date) as day",
                "cast(round(value * 100) as long) as cents",
            )
            .toPandas()
        )
        daily = pdf.groupby(["event_type", "day"])["cents"].sum()
        for et in daily.index.get_level_values(0).unique():
            s = daily[et]
            pairs = [
                (s[d], s[d - pd.Timedelta(days=7)])
                for d in s.index
                if d - pd.Timedelta(days=7) in s.index
            ]
            if not pairs:
                assert et not in got  # no 7-day-lag pair -> no output group
                continue
            a = pd.Series([p[0] for p in pairs], dtype="int64")
            f = pd.Series([p[1] for p in pairs], dtype="int64")
            r = got[et]
            assert r.n_evals == len(pairs)
            assert abs(r.mae - round(float((a - f).abs().sum()) / (len(pairs) * 100), 4)) < 1e-9
            assert abs(r.wape - round(float((a - f).abs().sum()) / float(a.abs().sum()), 6)) < 1e-9
            assert abs(r.bias - round(float((a - f).sum()) / (len(pairs) * 100), 4)) < 1e-9
            assert r.wape >= 0
