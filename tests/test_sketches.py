"""Bloom join pruning + Count-Min sketch: guarantees the oracle can't pin.

The cross-engine value gate lives in test_workload_oracle.py; these pin
(a) the no-false-negative Bloom guarantee row-by-row, (b) the CMS
overestimate guarantee for EVERY vocabulary term, (c) boundedness of the
sketch state, and (d) that the probe-side plan stays broadcast-only (the
whole point of a runtime filter is not to shuffle the fact table).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from redcap_omop_etl_spark import workload
from redcap_omop_etl_spark.operators import sketches
from redcap_omop_etl_spark.operators.dedup import portable_hash60
from redcap_omop_etl_spark.operators.textstats import ws_tokens
from redcap_omop_etl_spark.sources.readers import Catalog
from tests.conftest import SF_SMOKE


class TestBloomPrune:
    def test_no_false_negatives_and_accounting(self, spark):
        row = workload.queries()["join_bloom_prune"](spark, SF_SMOKE).collect()[0]
        assert row.n_matches <= row.n_candidates <= row.n_probe
        assert row.n_false_pos == row.n_candidates - row.n_matches
        assert row.n_build_keys > 0 and row.n_matches > 0
        # m=65536, k=3: fill stays ~13% even at sf0.1 → fp_rate ≈ fill^3 well under 1%
        if row.fp_rate is not None:
            assert row.fp_rate < 0.05

    def test_every_build_key_passes_filter(self, spark):
        # The Bloom guarantee, checked key-by-key instead of in aggregate:
        # hashing a build key must hit three set positions.
        cat = Catalog(spark, SF_SMOKE)
        build = (
            cat["customer"]
            .filter(F.col("c_mktsegment") == "BUILDING")
            .select(F.col("c_custkey").alias("key"))
            .distinct()
            .withColumn("h", portable_hash60(F.col("key").cast("string")))
        )
        pos = {
            r.p
            for r in build.select(
                F.explode(F.array(*sketches._bloom_positions(F.col("h")))).alias("p")
            ).collect()
        }
        for r in build.collect():
            for s in (0, 16, 32):
                assert (r.h >> s) % sketches.BLOOM_M in pos

    def test_probe_side_is_broadcast_only(self, spark):
        plan = (
            workload.queries()["join_bloom_prune"](spark, SF_SMOKE)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "SortMergeJoin" not in plan
        # exactly one BNLJ: the 1-row build-count scalar crossJoin (the
        # relational replacement for the reverted eager build.count())
        assert plan.count("BroadcastNestedLoopJoin") == 1
        assert plan.count("BroadcastHashJoin") == 4  # 3 bit tests + membership


class TestCountMin:
    def test_overestimate_for_every_term(self, spark):
        d = Catalog(spark, SF_SMOKE)["documents"]
        counts = (
            d.select(F.explode(ws_tokens(F.col("text"))).alias("term"))
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        cells = {(r.r, r.pos): r.cell for r in sketches.countmin_cells(counts).collect()}
        assert len(cells) <= sketches.CMS_DEPTH * sketches.CMS_WIDTH
        rows = counts.withColumn("h", portable_hash60(F.col("term"))).collect()
        total = sum(r.cnt for r in rows)
        for r in rows:
            est = min(
                cells[(i, (r.h >> (13 * i)) % sketches.CMS_WIDTH)]
                for i in range(sketches.CMS_DEPTH)
            )
            assert est >= r.cnt, f"{r.term}: CMS underestimated"
            assert est <= total  # trivial upper bound: no cell exceeds N

    def test_cells_conserve_mass(self, spark):
        # every CMS row partitions the full token mass: sum of cells per r == N
        d = Catalog(spark, SF_SMOKE)["documents"]
        counts = (
            d.select(F.explode(ws_tokens(F.col("text"))).alias("term"))
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        n = counts.agg(F.sum("cnt")).collect()[0][0]
        per_row = {
            r.r: r.s
            for r in sketches.countmin_cells(counts)
            .groupBy("r")
            .agg(F.sum("cell").alias("s"))
            .collect()
        }
        assert set(per_row) == set(range(sketches.CMS_DEPTH))
        assert all(v == n for v in per_row.values())
