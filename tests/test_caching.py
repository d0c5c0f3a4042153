"""Cache-ownership convention: operators that cache internally register
through ``tracked_cache``/``tracked_persist``; session owners release with
``unpersist_operator_caches()`` at composition boundaries. Without the
convention, a long-lived session composing many operators accumulates
storage blocks until eviction pressure (the round-3 phantom-26s class of
failure, but in-session)."""

from __future__ import annotations

from pyspark.sql import functions as F

from redcap_omop_etl_spark.caching import _TRACKED, unpersist_operator_caches
from tests.conftest import SF_SMOKE


def _n_cached(spark) -> int:
    return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())


class TestCacheOwnership:
    def test_three_caching_operators_release_to_baseline(self, spark):
        from redcap_omop_etl_spark.operators import dedup, retrieval, tsanalytics

        unpersist_operator_caches()
        spark.catalog.clearCache()
        baseline = _n_cached(spark)

        # three operators that each tracked_cache/tracked_persist an
        # intermediate; run an action on each so the cache actually
        # materializes. (ngram_jaccard_pairs stopped caching in round 12 —
        # the exploded-shingle IMR cache lost its A/B — so the dedup
        # representative is the recall audit, whose reuse keeps its cache.)
        assert dedup.dedup_lsh_recall_audit(spark, SF_SMOKE).count() >= 0
        assert retrieval.retrieval_heavy_hitters(spark, SF_SMOKE).count() > 0
        assert tsanalytics.ts_seasonal_strength(spark, SF_SMOKE).count() > 0

        assert _n_cached(spark) > baseline  # the operators did cache
        released = unpersist_operator_caches(blocking=True)
        assert released >= 3
        assert _n_cached(spark) == baseline  # ...and the release is total

    def test_release_is_idempotent_and_registry_drains(self, spark):
        from redcap_omop_etl_spark.caching import tracked_cache

        df = tracked_cache(spark.range(10).withColumn("x", F.col("id") * 2))
        assert df.count() == 10
        assert unpersist_operator_caches(blocking=True) >= 1
        assert len(_TRACKED) == 0
        assert unpersist_operator_caches() == 0  # second call: nothing left
        # the returned frame still computes (recompute, not failure)
        assert df.count() == 10


def test_operators_only_cache_through_tracked_helpers():
    """Convention lint: operator/source/function modules must not call raw
    .cache()/.persist() — every internal cache goes through tracked_cache/
    tracked_persist so unpersist_operator_caches() can release it."""
    import pathlib

    root = pathlib.Path(__file__).resolve().parents[1] / "redcap_omop_etl_spark"
    offenders = []
    for py in root.rglob("*.py"):
        if py.name == "caching.py":
            continue
        text = py.read_text()
        for i, line in enumerate(text.splitlines(), 1):
            code = line.split("#", 1)[0]
            if ".cache()" in code or ".persist(" in code:
                offenders.append(f"{py.name}:{i}: {line.strip()}")
    assert not offenders, "raw cache/persist outside caching.py:\n" + "\n".join(offenders)


def test_session_memos_clear(spark):
    from redcap_omop_etl_spark.caching import clear_session_memos
    from redcap_omop_etl_spark.operators import graph

    clear_session_memos()
    # populate the co-purchase edge memo, then clear it
    graph._copurchase_edges(spark, SF_SMOKE).count()
    assert len(graph._EDGE_MEMO) == 1
    assert clear_session_memos() >= 1
    assert len(graph._EDGE_MEMO) == 0
    # re-materializes transparently on next use
    assert graph._copurchase_edges(spark, SF_SMOKE).count() > 0
    clear_session_memos()


def test_delete_transition_bands_touched_survivors_once(spark):
    """Round-12 internals pin: ``minhash_cluster_state_delete`` banding the
    touched survivors exactly once — the persisted (doc, band, bucket)
    table feeds BOTH the sub-CC star edges and the hub repair, instead of
    each consumer re-running the signature fold (a pure projection no
    ReuseExchange can share). Pinned via the tracked-cache registry (the
    transition registers its band table for caller release) plus the
    hub-repair output staying equal to the survivors' per-bucket minima."""
    from redcap_omop_etl_spark.caching import tracked_persist  # noqa: F401
    from redcap_omop_etl_spark.operators.dedup import minhash_band_table
    from redcap_omop_etl_spark.operators.graph import (
        _minhash_cluster_state,
        minhash_cluster_state_delete,
    )
    from redcap_omop_etl_spark.operators.graph import Catalog

    unpersist_operator_caches()
    before = len(_TRACKED)
    docs = Catalog(spark, SF_SMOKE)["documents"]
    base_comp, hubs = _minhash_cluster_state(spark, SF_SMOKE, family="md5")
    deleted = docs.filter(F.pmod(F.col("doc_id"), F.lit(10)) == 3).select("doc_id")
    comp_out, hubs_out = minhash_cluster_state_delete(base_comp, hubs, deleted, docs)
    assert len(_TRACKED) == before + 1  # the single shared band table
    # hub invariant unchanged by the reuse: hubs == per-bucket minima of
    # the live corpus (derived independently from a fresh banding pass)
    survivors = docs.join(deleted, "doc_id", "left_anti")
    expect = (
        minhash_band_table(survivors)
        .groupBy("band", "bucket")
        .agg(F.min("doc").alias("hub"))
    )
    got = hubs_out.select("band", "bucket", "hub")
    assert got.exceptAll(expect).count() == 0
    assert expect.exceptAll(got).count() == 0
    assert comp_out.count() > 0
    unpersist_operator_caches()
