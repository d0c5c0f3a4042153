"""Round-7 additions: scale-safe keyed window primitives and the
rewrites built on them.

Two layers of evidence per VERDICT r6 item 1:
- EQUIVALENCE: each primitive is bit-identical to the naive
  ``Window.partitionBy(key)`` formulation it replaces (the oracle SQL
  stayed the naive form, so the driver cross-checks this too).
- PLAN PINS: the data-sized sort is partitioned by ``(__pid, key)`` —
  never by the low-cardinality key alone — so the rewrites cannot
  silently regress back to the 20-task ceiling.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from redcap_omop_etl_spark import workload
from redcap_omop_etl_spark.operators.scalable_windows import (
    keyed_ntile,
    keyed_running_sum,
    keyed_topk,
    with_keyed_index,
)
from tests.conftest import SF_SMOKE


def _docs(spark):
    return (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "source", "n_chars")
    )


def _sym_diff(a, b) -> int:
    return a.exceptAll(b).count() + b.exceptAll(a).count()


def _plan(spark, name: str) -> str:
    df = workload.queries()[name](spark, SF_SMOKE)
    return df._jdf.queryExecution().executedPlan().toString()


class TestKeyedPrimitivesEquivalence:
    def test_keyed_index_matches_row_number(self, spark):
        d = _docs(spark)
        w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
        ref = d.select("doc_id", (F.row_number().over(w) - 1).alias("i"))
        got = with_keyed_index(d, ["source"], ["n_chars", "doc_id"], "i").select(
            "doc_id", "i"
        )
        assert _sym_diff(ref, got) == 0

    def test_keyed_index_multi_key_desc_order(self, spark):
        d = _docs(spark).withColumn("b", (F.col("doc_id") % 3).cast("int"))
        w = Window.partitionBy("source", "b").orderBy(F.desc("n_chars"), "doc_id")
        ref = d.select("doc_id", (F.row_number().over(w) - 1).alias("i"))
        got = with_keyed_index(
            d, ["source", "b"], [F.desc("n_chars"), "doc_id"], "i"
        ).select("doc_id", "i")
        assert _sym_diff(ref, got) == 0

    def test_keyed_ntile_matches_ntile(self, spark):
        d = _docs(spark)
        for n in (3, 10, 20):
            w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
            ref = d.select("doc_id", F.ntile(n).over(w).cast("bigint").alias("t"))
            got = keyed_ntile(d, ["source"], ["n_chars", "doc_id"], n, "t").select(
                "doc_id", "t"
            )
            assert _sym_diff(ref, got) == 0, f"ntile({n}) mismatch"

    def test_keyed_ntile_fewer_rows_than_tiles(self, spark):
        # t < n exercises the q=0 branch (every row its own tile) — the
        # ANSI-guarded division path.
        d = spark.createDataFrame(
            [(i, "k" + str(i % 2)) for i in range(5)], "id long, k string"
        )
        w = Window.partitionBy("k").orderBy("id")
        ref = d.select("id", F.ntile(10).over(w).cast("bigint").alias("t"))
        got = keyed_ntile(d, ["k"], ["id"], 10, "t").select("id", "t")
        assert _sym_diff(ref, got) == 0

    def test_keyed_running_sum_exclusive_and_inclusive(self, spark):
        d = _docs(spark)
        w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
        for inclusive, end in ((False, -1), (True, 0)):
            wf = w.rowsBetween(Window.unboundedPreceding, end)
            ref = d.select(
                "doc_id", F.coalesce(F.sum("n_chars").over(wf), F.lit(0)).alias("s")
            )
            got = keyed_running_sum(
                d, ["source"], ["n_chars", "doc_id"], "n_chars", "s", inclusive=inclusive
            ).select("doc_id", "s")
            assert _sym_diff(ref, got) == 0

    def test_keyed_topk_matches_rank_filter(self, spark):
        d = _docs(spark)
        w = Window.partitionBy("source").orderBy(F.desc("n_chars"), "doc_id")
        ref = (
            d.select("doc_id", F.row_number().over(w).alias("r"))
            .filter(F.col("r") <= 7)
        )
        got = keyed_topk(
            d, ["source"], [F.desc("n_chars"), "doc_id"], 7, "r"
        ).select("doc_id", "r")
        assert _sym_diff(ref, got) == 0

    def test_keyed_topk_key_smaller_than_k(self, spark):
        d = spark.createDataFrame(
            [(i, "only") for i in range(4)], "id long, k string"
        )
        got = keyed_topk(d, ["k"], ["id"], 10, "r")
        assert got.count() == 4
        assert [r.r for r in got.orderBy("id").collect()] == [1, 2, 3, 4]


# (query, low-cardinality key col, data order col that the OLD plan
# sorted under the bare key). The negative pin asserts that window spec
# no longer exists; the positive pin asserts a (__pid, key)-partitioned
# window does.
_KEYED_REWRITES = [
    ("curation_quantile_normalize", "source", "n_chars"),
    ("curation_curriculum_order", "source", "n_chars"),
    ("corpus_pipeline_full", "source", "keep_id"),
    ("chunk_prep_pipeline", "source", "chunk_hash"),
    ("sequence_packing", "pack_group", "doc_id"),
]


class TestKeyedWindowPlanPins:
    @pytest.mark.parametrize("name,key,datacol", _KEYED_REWRITES)
    def test_data_sort_partitioned_by_pid_not_bare_key(self, spark, name, key, datacol):
        plan = _plan(spark, name)
        assert re.search(r"windowspecdefinition\(__pid#\d+", plan), (
            f"{name}: expected a (__pid, {key})-partitioned data window"
        )
        assert not re.search(
            rf"windowspecdefinition\({key}#\d+L?, {datacol}#", plan
        ), (
            f"{name}: found a data-sized window partitioned by bare "
            f"'{key}' — the {key}-cardinality task ceiling is back"
        )

    def test_curriculum_second_rank_also_two_phase(self, spark):
        plan = _plan(spark, "curation_curriculum_order")
        # the per-(source, decile) shard rank must not be a bare keyed window
        assert not re.search(
            r"windowspecdefinition\(source#\d+, decile#\d+L?, doc_id#", plan
        )

    def test_source_caps_no_corpus_shuffle_topk(self, spark):
        plan = _plan(spark, "corpus_source_caps")
        # phase 1: local top-k inside existing partitions
        assert re.search(r"windowspecdefinition\(__pid#\d+", plan)
        assert "__lrk" in plan
        # the old corpus-wide bare-source rank fed the agg directly; now
        # any bare-source window runs over the __lrk<=k candidate frame
        # only (bounded by #partitions × k) — pin that the filter exists.
        assert re.search(r"__lrk#\d+ <= 10", plan)

    def test_pareto_windows_over_aggregate_not_corpus(self, spark):
        plan = _plan(spark, "curation_pareto_frontier")
        # old shape: RANGE-framed running max over the raw corpus
        assert "RangeFrame" not in plan
        # new shape: corpus collapses through (source, q_int, n_chars)
        # and (source, q_int) hash aggregates (max_by carries the count
        # at the max) BEFORE the only window
        assert "max_by" in plan
        assert len(re.findall(r"windowspecdefinition\(", plan)) == 1
        assert re.search(
            r"HashAggregate\(keys=\[source#\d+, q_int#\d+L?, n_chars#\d+L?\]", plan
        )


class TestKeyedPrimitiveLaziness:
    def test_plan_construction_runs_no_job(self, spark):
        # Mirrors test_global_index_is_lazy: building the plan must not
        # trigger a corpus job (an eager count here would make every
        # plan-inspection tool pay a full evaluation).
        d = _docs(spark)  # the parquet read itself may run listing jobs
        tracker = spark.sparkContext.statusTracker()
        before = tracker.getJobIdsForGroup(None)
        a = with_keyed_index(d, ["source"], ["n_chars", "doc_id"])
        b = keyed_running_sum(d, ["source"], ["doc_id"], "n_chars")
        _ = a.schema, b.schema  # analysis only
        after = tracker.getJobIdsForGroup(None)
        assert len(after) == len(before)
