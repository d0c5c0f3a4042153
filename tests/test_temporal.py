"""Temporal operators: grid-binned overlap join, rollup cascade, moving
median — equivalence to the naive formulation plus the plan shapes that
matter at scale.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from redcap_omop_etl_spark import workload
from redcap_omop_etl_spark.operators.temporal import interval_point_join
from redcap_omop_etl_spark.sources.readers import Catalog
from tests.conftest import SF_SMOKE


def _plan(spark, name):
    df = workload.queries()[name](spark, SF_SMOKE)
    return df._jdf.queryExecution().executedPlan().toString()


class TestIntervalOverlap:
    def test_grid_join_equals_naive_nested_loop(self, spark):
        ev = Catalog(spark, SF_SMOKE)["events"]
        iv = ev.filter(F.col("event_type") == "error").select(
            F.col("event_id").alias("iv_id"),
            F.col("ts").alias("lo"),
            (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("hi"),
        )
        pt = ev.filter(F.col("event_type") == "purchase").select("event_id", "ts")
        grid = interval_point_join(iv, pt).select("iv_id", "event_id")
        naive = iv.join(pt, (F.col("ts") >= F.col("lo")) & (F.col("ts") < F.col("hi"))).select(
            "iv_id", "event_id"
        )
        assert sorted(grid.collect()) == sorted(naive.collect())
        # and no pair is emitted twice (a point has exactly one bucket)
        assert grid.count() == grid.distinct().count()

    def test_plan_is_equi_join_on_bucket(self, spark):
        plan = _plan(spark, "join_interval_overlap")
        assert "BroadcastNestedLoopJoin" not in plan, plan
        assert "__bucket" in plan, "grid bucket key not in the join plan"

    def test_interval_spanning_multiple_buckets_still_matches(self, spark):
        # 40-min interval spans many 5-min buckets; points across its whole
        # extent must match, boundary point at hi must not (half-open).
        iv = spark.sql(
            "SELECT timestamp'2024-01-01 00:05:00' AS lo, timestamp'2024-01-01 00:45:00' AS hi"
        )
        pt = spark.sql(
            """SELECT * FROM VALUES
               (1, timestamp'2024-01-01 00:05:00'),
               (2, timestamp'2024-01-01 00:29:59'),
               (3, timestamp'2024-01-01 00:44:59'),
               (4, timestamp'2024-01-01 00:45:00'),
               (5, timestamp'2024-01-01 00:04:59') AS t(pid, ts)"""
        )
        got = sorted(r.pid for r in interval_point_join(iv, pt, grid_s=300).select("pid").collect())
        assert got == [1, 2, 3]


class TestRollupCascade:
    def test_day_equals_direct_aggregation(self, spark):
        ev = Catalog(spark, SF_SMOKE)["events"]
        direct = (
            ev.groupBy("event_type", F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"))
            .agg(F.count(F.lit(1)).alias("n_events"))
        )
        cascade = workload.queries()["rollup_cascade"](spark, SF_SMOKE).select(
            "event_type", "day", "n_events"
        )
        assert sorted(direct.collect()) == sorted(cascade.collect())

    def test_partials_stay_hash_aggregated(self, spark):
        plan = _plan(spark, "rollup_cascade")
        assert "SortAggregate" not in plan, plan


class TestMovingMedian:
    def test_single_shuffle_window(self, spark):
        plan = _plan(spark, "window_moving_median")
        assert plan.count("Exchange") == 1, plan
        assert "Window" in plan

    def test_frame_median_small_case(self, spark):
        df = spark.sql(
            """SELECT * FROM VALUES
               (1, 1, timestamp'2024-01-01 00:00:01', 10.0),
               (1, 2, timestamp'2024-01-01 00:00:02', 20.0),
               (1, 3, timestamp'2024-01-01 00:00:03', 90.0) AS t(user_id, event_id, ts, value)"""
        )
        from pyspark.sql import Window as W

        w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-4, 0)
        got = {
            r.event_id: r.med
            for r in df.select("event_id", F.percentile("value", F.lit(0.5)).over(w).alias("med")).collect()
        }
        assert got == {1: 10.0, 2: 15.0, 3: 20.0}
