"""Round-11 operator tests: runtime guards on the incremental-
maintenance id preconditions (the round-10 verdict's "silent-wrong"
item), exercised both directly and through the production append
entry points with deliberately violating batches."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


class TestPreconditionGuards:
    def test_monotonic_guard_fires_and_passes(self, spark):
        from redcap_omop_etl_spark.validation import (
            MaintenancePreconditionError,
            require_monotonic_ids,
        )

        base = spark.range(0, 100).select(F.col("id").alias("vec_id"))
        good = spark.range(100, 110).select(F.col("id").alias("vec_id"))
        bad = spark.range(99, 105).select(F.col("id").alias("vec_id"))
        require_monotonic_ids(base, good, "t")  # no raise
        with pytest.raises(MaintenancePreconditionError, match="exceed base"):
            require_monotonic_ids(base, bad, "t")
        # equality is a violation too (same id on both sides)
        with pytest.raises(MaintenancePreconditionError):
            require_monotonic_ids(base, spark.range(99, 100), "t")

    def test_monotonic_guard_empty_sides_pass(self, spark):
        from redcap_omop_etl_spark.validation import require_monotonic_ids

        base = spark.range(0, 100)
        empty = spark.range(0, 0)
        require_monotonic_ids(base, empty, "t")
        require_monotonic_ids(empty, base, "t")

    def test_disjoint_guard_fires_and_passes(self, spark):
        from redcap_omop_etl_spark.validation import (
            MaintenancePreconditionError,
            require_disjoint_ids,
        )

        base = spark.range(0, 100)
        # interleaved-but-disjoint ids are LEGAL under disjointness
        # (the partition-level cluster-append proof permits them)
        interleaved = spark.createDataFrame(
            [(-5,), (150,), (1000,)], "id long"
        )
        require_disjoint_ids(base, interleaved, "t")
        with pytest.raises(MaintenancePreconditionError, match="disjoint"):
            require_disjoint_ids(base, spark.createDataFrame([(42,)], "id long"), "t")

    def test_cluster_append_guard_rejects_colliding_batch(self, spark, sf_dir):
        """A batch band table reusing a BASE doc id must be rejected by
        incremental_minhash_components before any merge work runs."""
        from redcap_omop_etl_spark.operators.graph import (
            _minhash_cluster_state,
            incremental_minhash_components,
        )
        from redcap_omop_etl_spark.validation import MaintenancePreconditionError

        base_comp, hubs = _minhash_cluster_state(spark, sf_dir, family="md5")
        some_base_id = hubs.select(F.col("hub").alias("doc")).limit(1)
        bad_banded = some_base_id.withColumn("band", F.lit(0)).withColumn(
            "bucket", F.lit(123456789)
        )
        with pytest.raises(MaintenancePreconditionError, match="disjoint"):
            incremental_minhash_components(base_comp, hubs, bad_banded).collect()

    def test_cluster_append_guard_optout(self, spark, sf_dir):
        """check_ids=False restores the unguarded fast path (for callers
        that prove disjointness by construction)."""
        from redcap_omop_etl_spark.operators.graph import (
            _minhash_cluster_state,
            incremental_minhash_components,
        )

        base_comp, hubs = _minhash_cluster_state(spark, sf_dir, family="md5")
        fresh = spark.createDataFrame(
            [(10_000_000, 0, "987_654_321_0")],
            "doc long, band int, bucket string",
        )
        out = incremental_minhash_components(
            base_comp, hubs, fresh, check_ids=False
        )
        assert "component" in out.columns

    def test_semdedup_append_guard_rejects_low_id_batch(self, spark, sf_dir):
        """A batch vec_id at/below the base range could displace a
        frozen anchor — the append must refuse it."""
        from redcap_omop_etl_spark.operators.similarity import semdedup_flags_append
        from redcap_omop_etl_spark.sources.readers import Catalog
        from redcap_omop_etl_spark.validation import MaintenancePreconditionError

        emb = Catalog(spark, sf_dir)["embeddings"]
        bad_batch = emb.limit(3).select("vec_id", "embedding")  # base ids verbatim
        with pytest.raises(MaintenancePreconditionError, match="exceed base"):
            semdedup_flags_append(spark, sf_dir, batch=bad_batch).collect()

    def test_ppjoin_append_guard_rejects_colliding_batch(self, spark, sf_dir):
        from redcap_omop_etl_spark.operators.dedup import _ppj_append_batch
        from redcap_omop_etl_spark.sources.readers import Catalog
        from redcap_omop_etl_spark.validation import MaintenancePreconditionError

        docs = Catalog(spark, sf_dir)["documents"]
        bad_batch = docs.limit(2).select("doc_id", "text")
        with pytest.raises(MaintenancePreconditionError, match="disjoint"):
            _ppj_append_batch(spark, sf_dir, batch=bad_batch)

    def test_ppjoin_append_batch_override_disjoint_ok(self, spark, sf_dir):
        """A caller-supplied disjoint batch flows through the shared
        derivation (the production ingest path)."""
        from redcap_omop_etl_spark.operators.dedup import _ppj_append_batch

        batch = spark.createDataFrame(
            [(50_000_000, "alpha beta gamma delta epsilon zeta")],
            "doc_id long, text string",
        )
        _docs, b, btoks, bprefix = _ppj_append_batch(spark, sf_dir, batch=batch)
        assert b.count() == 1
        assert bprefix.count() >= 1


class TestIngestTickRouter:
    """The automated ingest-tick router (round-10 verdict item 1): a
    clean batch takes the exact tick, a template-dominated batch
    degrades to the LSH cluster append, the middle band takes the
    capped tick — decided by the integer density probe, never by hand."""

    def test_clean_batch_routes_exact(self, spark, sf_dir):
        from redcap_omop_etl_spark.operators.dedup import ppjoin_ingest_probe

        route, est, nb, _ = ppjoin_ingest_probe(spark, sf_dir)
        assert route == "exact"
        assert est <= 64 * nb

    def test_dense_batch_routes_cluster(self, spark, sf_dir):
        from redcap_omop_etl_spark.operators.dedup import (
            _dense_batch,
            ppjoin_ingest_probe,
        )

        route, est, nb, _ = ppjoin_ingest_probe(
            spark, sf_dir, batch=_dense_batch(spark, sf_dir)
        )
        assert route == "cluster"
        assert est > 1024 * nb

    def test_warm_batch_routes_capped(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from redcap_omop_etl_spark.operators.dedup import (
            _DENSE_SUFFIX,
            _PPJ_APPEND_SHIFT,
            _WARM_COPIES,
            ppjoin_ingest_probe,
        )
        from redcap_omop_etl_spark.sources.readers import Catalog

        docs = Catalog(spark, sf_dir)["documents"]
        tmpl = docs.orderBy("doc_id").limit(1).collect()[0]["text"]
        warm = spark.range(_WARM_COPIES).select(
            (F.col("id") + F.lit(_PPJ_APPEND_SHIFT)).alias("doc_id"),
            F.lit(tmpl + _DENSE_SUFFIX).alias("text"),
        )
        route, est, nb, _ = ppjoin_ingest_probe(spark, sf_dir, batch=warm)
        assert route == "capped"
        assert 64 * nb < est <= 1024 * nb

    def test_routed_output_audit_row_consistent(self, spark, sf_dir):
        from redcap_omop_etl_spark.operators.dedup import dedup_ingest_tick_routed

        rows = dedup_ingest_tick_routed(spark, sf_dir).collect()
        probe = [r for r in rows if r["kind"] == "probe"]
        assert len(probe) == 1
        routes = {r["route"] for r in rows}
        assert routes == {probe[0]["route"]}  # every row carries the chosen route
        assert probe[0]["route"] == "exact"
        # exact-route rows mirror the standalone exact tick
        body = {(r["k1"], r["k2"], r["score"]) for r in rows if r["kind"] != "probe"}
        from redcap_omop_etl_spark.operators.dedup import dedup_prefix_jaccard_append

        exact = {
            (r["d1"], r["d2"], r["jaccard"])
            for r in dedup_prefix_jaccard_append(spark, sf_dir).collect()
        }
        assert body == exact

    def test_dense_routed_is_cluster_delta(self, spark, sf_dir):
        from redcap_omop_etl_spark.operators.dedup import (
            _DENSE_COPIES,
            dedup_ingest_tick_routed_dense,
        )

        rows = dedup_ingest_tick_routed_dense(spark, sf_dir).collect()
        kinds = {r["kind"] for r in rows}
        assert kinds <= {"probe", "batch", "base"}
        batch_rows = [r for r in rows if r["kind"] == "batch"]
        # all identical copies must land in ONE cluster labeled by min id
        assert len(batch_rows) == _DENSE_COPIES
        assert len({r["k2"] for r in batch_rows}) == 1
