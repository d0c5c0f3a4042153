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


class TestIvfpqDriftAudit:
    """The staleness audit: generation 0 is its own retrained arm
    (delta exactly 0), staleness vs the gen-0 baseline is monotone on
    the drift construction, and the advisory flag is a pure function of
    the reported metrics."""

    def test_gen0_identity_and_monotone_staleness(self, spark, sf_dir):
        from redcap_omop_etl_spark.operators.similarity import (
            _DRIFT_ADVISE_PPM,
            _DRIFT_DELTA_PPM,
            ivfpq_drift_audit,
        )

        rows = {r["generation"]: r for r in ivfpq_drift_audit(spark, sf_dir).collect()}
        assert set(rows) == {0, 1, 2}
        g0 = rows[0]
        assert g0["recall_delta_ppm"] == 0
        assert g0["staleness_ppm"] == 0
        assert g0["frozen_recall_ppm"] == g0["retrained_recall_ppm"]
        assert g0["frozen_occ_max"] == g0["retrained_occ_max"]
        assert not g0["rebuild_advised"]
        # staleness (frozen recall deficit vs gen 0) grows with drift
        assert 0 <= rows[1]["staleness_ppm"] <= rows[2]["staleness_ppm"]
        # the corpus grows by one batch per generation
        assert g0["n_total"] < rows[1]["n_total"] < rows[2]["n_total"]
        # the flag trips somewhere on this drift construction, and is
        # always consistent with the reported metrics
        assert any(r["rebuild_advised"] for r in rows.values())
        for r in rows.values():
            expect = (
                r["staleness_ppm"] >= _DRIFT_ADVISE_PPM
                or r["recall_delta_ppm"] >= _DRIFT_DELTA_PPM
                or r["frozen_occ_max"] >= 2 * r["retrained_occ_max"]
                or r["frozen_cand"] >= 2 * r["retrained_cand"]
            )
            assert r["rebuild_advised"] == expect


class TestUpsertMultiTick:
    """The mixed-transaction composition claim: >= 4 alternating
    delete/append ticks over shared (components, hubs) state equal the
    one-shot rebuild over the net corpus."""

    def test_alternating_ticks_equal_rebuild(self, spark):
        from redcap_omop_etl_spark.operators.dedup import (
            minhash_band_table,
            minhash_star_edges,
        )
        from redcap_omop_etl_spark.operators.graph import (
            connected_components,
            minhash_cluster_state_append,
            minhash_cluster_state_delete,
        )

        fam_a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        fam_b = "one two three four five six seven eight nine ten eleven"
        fam_c = "red orange yellow green blue indigo violet pink brown black"
        base = spark.createDataFrame(
            [(1, fam_a), (2, fam_a), (3, fam_a), (10, fam_b), (11, fam_b),
             (20, "a lone unrelated document with its very own words here")],
            "doc_id long, text string",
        )
        comp = connected_components(minhash_star_edges(base))
        hubs = (
            minhash_band_table(base)
            .groupBy("band", "bucket")
            .agg(F.min("doc").alias("hub"))
        )
        corpus = base
        live = base

        def tick_delete(ids):
            nonlocal comp, hubs, live
            deln = spark.createDataFrame([(x,) for x in ids], "doc_id long")
            comp, hubs = minhash_cluster_state_delete(comp, hubs, deln, corpus)
            comp = comp.localCheckpoint(eager=True)
            hubs = hubs.localCheckpoint(eager=True)
            live = live.join(deln, "doc_id", "left_anti").localCheckpoint(eager=True)

        def tick_append(rows):
            nonlocal comp, hubs, live, corpus
            batch = spark.createDataFrame(rows, "doc_id long, text string")
            comp, hubs = minhash_cluster_state_append(
                comp, hubs, minhash_band_table(batch)
            )
            comp = comp.localCheckpoint(eager=True)
            hubs = hubs.localCheckpoint(eager=True)
            live = live.unionByName(batch).localCheckpoint(eager=True)
            corpus = corpus.unionByName(batch).localCheckpoint(eager=True)

        # 5 alternating ticks: delete a fam-A member, append a new fam-C
        # pair, delete a fam-B member AND a fresh fam-C member (cross-
        # generation takedown), append an exact fam-A copy (re-attach),
        # delete the singleton
        tick_delete([2])
        tick_append([(100, fam_c), (101, fam_c)])
        tick_delete([10, 101])
        tick_append([(200, fam_a)])
        tick_delete([20])

        got = {(r["node"], r["component"]) for r in comp.collect()}
        want = {
            (r["node"], r["component"])
            for r in connected_components(minhash_star_edges(live)).collect()
        }
        assert got == want
        got_hubs = {
            (r["band"], r["bucket"], r["hub"]) for r in hubs.collect()
        }
        # hub invariant the composition proof reads off the state: after
        # any tick sequence, hubs are EXACTLY the per-bucket minima of
        # the live corpus for buckets untouched since their last repair,
        # and at minimum a live MEMBER for every bucket; the delete tick
        # restores exact minima for touched buckets. Verify membership:
        live_banded = {
            (r["band"], r["bucket"], r["doc"])
            for r in minhash_band_table(live).collect()
        }
        assert got_hubs <= live_banded  # every hub is a live bucket member
        assert {(b, k) for b, k, _ in got_hubs} == {
            (b, k) for b, k, _ in live_banded
        }  # every live bucket has a hub


class TestStateCatalog:
    """The versioned persisted-state catalog (round-10 verdict stretch
    item): commit-marker protocol, fingerprint stability, and the
    restart guarantee — a maintenance tick in a FRESH PROCESS over
    catalog state equals the rebuild."""

    def test_fingerprint_order_free(self, spark):
        from redcap_omop_etl_spark.state import corpus_fingerprint

        df = spark.range(100).selectExpr("id as doc_id", "cast(id*7 as string) as text")
        a = corpus_fingerprint(df)
        b = corpus_fingerprint(df.orderBy(F.desc("doc_id")).repartition(7))
        assert a == b
        c = corpus_fingerprint(df.limit(99))
        assert a != c

    def test_uncommitted_version_invisible(self, spark, tmp_path):
        from redcap_omop_etl_spark.state import StateCatalog

        cat = StateCatalog(str(tmp_path / "state"))
        df = spark.range(5).selectExpr("id as doc_id")
        v = cat.save(spark, "toy", "fp1", {"a": df})
        assert v == 1
        # fake a torn write: a v2 dir with parquet but NO manifest
        df.write.parquet(str(tmp_path / "state/toy/fp1/v2/a"))
        assert cat.latest_version(spark, "toy", "fp1") == 1
        assert cat.load(spark, "toy", "fp1")["a"].count() == 5
        # round-12 fix: the next save re-targets v2, clears the torn
        # (manifest-less == never committed) leftovers and COMMITS —
        # crash replay recovers instead of wedging on errorifexists
        v2 = cat.save(spark, "toy", "fp1", {"a": df.limit(3)})
        assert v2 == 2
        assert cat.latest_version(spark, "toy", "fp1") == 2
        assert cat.load(spark, "toy", "fp1")["a"].count() == 3

    def test_tick_in_fresh_process_equals_rebuild(self, spark, tmp_path):
        """Session A bootstraps v1; a SUBPROCESS with its own fresh
        SparkSession loads the catalog, applies a delete+append tick and
        commits v2; session A then loads v2 and compares against the
        one-shot rebuild over the net corpus."""
        import subprocess
        import sys as _sys

        from redcap_omop_etl_spark.operators.dedup import minhash_star_edges
        from redcap_omop_etl_spark.operators.graph import connected_components
        from redcap_omop_etl_spark.state import StateCatalog, cluster_state_bootstrap

        fam_a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        fam_b = "one two three four five six seven eight nine ten eleven"
        docs = spark.createDataFrame(
            [(1, fam_a), (2, fam_a), (3, fam_a), (10, fam_b), (11, fam_b)],
            "doc_id long, text string",
        )
        corpus_dir = str(tmp_path / "corpus")
        docs.write.parquet(corpus_dir)
        root = str(tmp_path / "state")
        cat = StateCatalog(root)
        fp, v1 = cluster_state_bootstrap(cat, docs)
        assert v1 == 1

        script = f"""
import sys
sys.path.insert(0, {repr("/root/repo")})
from pyspark.sql import SparkSession, functions as F
from redcap_omop_etl_spark.state import StateCatalog, cluster_state_tick
spark = (SparkSession.builder.master("local[2]")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false").getOrCreate())
corpus = spark.read.parquet({repr(corpus_dir)})
cat = StateCatalog({repr(root)})
append = spark.createDataFrame(
    [(100, {repr(fam_b)}), (101, {repr(fam_b)})], "doc_id long, text string")
delete = spark.createDataFrame([(2,)], "doc_id long")
v = cluster_state_tick(cat, {repr(fp)}, corpus, append_docs=append, delete_ids=delete)
print("TICK_OK", v)
"""
        res = subprocess.run(
            [_sys.executable, "-c", script],
            capture_output=True,
            text=True,
            timeout=300,
            cwd="/tmp",  # foreign cwd, like the driver
        )
        assert "TICK_OK 2" in res.stdout, res.stderr[-2000:]

        got = {
            (r["node"], r["component"])
            for r in cat.load(spark, "minhash_clusters", fp, version=2)[
                "components"
            ].collect()
        }
        live = docs.filter(F.col("doc_id") != 2).unionByName(
            spark.createDataFrame(
                [(100, fam_b), (101, fam_b)], "doc_id long, text string"
            )
        )
        want = {
            (r["node"], r["component"])
            for r in connected_components(minhash_star_edges(live)).collect()
        }
        assert got == want


class TestUpsertFamily:
    """The round-11 upsert column of the maintenance matrix: every
    index family composes delete + append in one tick."""

    def test_semdedup_upsert_composition(self, spark, sf_dir):
        from redcap_omop_etl_spark.operators.similarity import (
            _SEM_APPEND_SHIFT,
            _SEM_DELETE_MOD,
            _SEM_DELETE_RES,
            semdedup_flags_delete,
            semdedup_flags_upsert,
        )

        rows = semdedup_flags_upsert(spark, sf_dir).collect()
        ids = {r["vec_id"] for r in rows}
        # takedown batch gone, ingest batch present and flagged
        assert not any(
            v % _SEM_DELETE_MOD == _SEM_DELETE_RES
            for v in ids
            if v < _SEM_APPEND_SHIFT
        )
        appended = [r for r in rows if r["is_appended"]]
        assert appended and all(r["vec_id"] >= _SEM_APPEND_SHIFT for r in appended)
        # the survivor half IS the delete tick's output (append cannot
        # change survivor flags: batch ids exceed every live id)
        del_rows = {
            (r["vec_id"], r["cluster"], r["n_dup_anchors"], r["is_kept"])
            for r in semdedup_flags_delete(spark, sf_dir).collect()
        }
        surv_rows = {
            (r["vec_id"], r["cluster"], r["n_dup_anchors"], r["is_kept"])
            for r in rows
            if not r["is_appended"]
        }
        assert surv_rows == del_rows

    def test_ivfpq_upsert_excludes_deleted_includes_appended(self, spark, sf_dir):
        from redcap_omop_etl_spark.operators.similarity import (
            _APPEND_SHIFT,
            _DELETE_MOD,
            _DELETE_RES,
            ivfpq_upsert_search,
        )

        rows = ivfpq_upsert_search(spark, sf_dir).collect()
        assert len(rows) == 10
        for r in rows:
            v = r["vec_id"]
            if v < _APPEND_SHIFT:
                assert v % _DELETE_MOD != _DELETE_RES
        assert {r["adc_rank"] for r in rows} == set(range(1, 11))

    def test_retrieval_upsert_floor_applies_to_net_counts(self, spark, sf_dir):
        """The floor subtlety: net df must equal rebuild df exactly, and
        any term at the floor must owe its survival to the NET count
        (base - del + add), not the pre-add count."""
        from redcap_omop_etl_spark.operators.retrieval import (
            _IDX_APPEND_MOD,
            _IDX_APPEND_RES,
            _IDX_APPEND_SHIFT,
            _IDX_DELETE_MOD,
            _IDX_DELETE_RES,
            _tokens,
            retrieval_index_upsert,
        )
        from redcap_omop_etl_spark.sources.readers import Catalog

        d = Catalog(spark, sf_dir)["documents"]
        net = d.select("doc_id", "text").filter(
            F.pmod(F.col("doc_id"), F.lit(_IDX_DELETE_MOD)) != _IDX_DELETE_RES
        ).unionByName(
            d.filter(
                F.pmod(F.col("doc_id"), F.lit(_IDX_APPEND_MOD)) == _IDX_APPEND_RES
            ).select(
                (F.col("doc_id") + F.lit(_IDX_APPEND_SHIFT)).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" zzqterm zzidxterm")).alias("text"),
            )
        )
        tf = _tokens(net).groupBy("term", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
        want = {
            (r["term"], r["df"], r["cf"])
            for r in tf.groupBy("term")
            .agg(
                F.count(F.lit(1)).cast("long").alias("df"),
                F.sum("tf").cast("long").alias("cf"),
            )
            .filter(F.col("df") >= 3)
            .collect()
        }
        got = {
            (r["term"], r["df"], r["cf"])
            for r in retrieval_index_upsert(spark, sf_dir).collect()
        }
        assert got == want


class TestStateCatalogFamilies:
    """Catalog coverage for the remaining state families: term stats
    and SemDeDup (flags + anchors + frozen centroids ride in the
    version). The transition correctness is pinned by the registered
    upsert oracles; these pin the catalog plumbing — versioning,
    frame-roundtrip fidelity, and tick == expected over catalog state."""

    def test_term_stats_tick_equals_rebuild(self, spark, tmp_path):
        from redcap_omop_etl_spark.operators.retrieval import _tokens
        from redcap_omop_etl_spark.sources.readers import Catalog
        from redcap_omop_etl_spark.state import (
            StateCatalog,
            term_stats_bootstrap,
            term_stats_tick,
        )

        docs = Catalog(spark, SF_SMOKE)["documents"].select("doc_id", "text")
        cat = StateCatalog(str(tmp_path / "state"))
        fp, v1 = term_stats_bootstrap(cat, docs)
        assert v1 == 1
        dele = spark.createDataFrame([(i,) for i in range(0, 40, 3)], "doc_id long")
        add = spark.createDataFrame(
            [(77_000_000, "zz new doc text alpha beta"),
             (77_000_001, "zz new doc text gamma delta")],
            "doc_id long, text string",
        )
        v2 = term_stats_tick(cat, fp, docs, append_docs=add, delete_ids=dele)
        assert v2 == 2
        net = docs.join(dele, "doc_id", "left_anti").unionByName(add)
        tf = _tokens(net).groupBy("term", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
        want = {
            (r["term"], r["df"], r["cf"])
            for r in tf.groupBy("term")
            .agg(
                F.count(F.lit(1)).cast("long").alias("df"),
                F.sum("tf").cast("long").alias("cf"),
            )
            .collect()
        }
        got = {
            (r["term"], r["df"], r["cf"])
            for r in cat.load(spark, "term_stats", fp)["terms"].collect()
        }
        assert got == want
        # v1 still loadable (versions never clobbered)
        assert cat.load(spark, "term_stats", fp, version=1)["terms"].count() > 0

    def test_semdedup_tick_matches_inmemory_transition(self, spark, tmp_path):
        from redcap_omop_etl_spark.operators.similarity import (
            ivf_build,
            semdedup_anchors_memo,
            semdedup_flags_memo,
            semdedup_state_append,
            semdedup_state_delete,
        )
        from redcap_omop_etl_spark.sources.readers import Catalog
        from redcap_omop_etl_spark.state import (
            StateCatalog,
            semdedup_bootstrap,
            semdedup_tick,
        )

        emb = Catalog(spark, SF_SMOKE)["embeddings"]
        flags = semdedup_flags_memo(spark, SF_SMOKE)
        anchors = semdedup_anchors_memo(spark, SF_SMOKE)
        _a, centroids = ivf_build(emb, n_clusters=16, n_iters=2, memo_key=SF_SMOKE)
        cat = StateCatalog(str(tmp_path / "state"))
        fp = "testcorpus"
        assert semdedup_bootstrap(cat, flags, anchors, centroids, fp) == 1
        dele = spark.createDataFrame([(2,), (32,)], "vec_id long")  # anchors
        add = emb.filter(F.col("vec_id") % 50 == 13).select(
            (F.col("vec_id") + F.lit(20_000_000_000)).alias("vec_id"), "embedding"
        )
        v2 = semdedup_tick(cat, fp, emb, append_vecs=add, delete_ids=dele)
        assert v2 == 2
        f1, a1 = semdedup_state_delete(flags, anchors, dele, emb)
        f2, _a2 = semdedup_state_append(
            f1.localCheckpoint(eager=True),
            a1.localCheckpoint(eager=True),
            centroids,
            add,
        )
        want = {
            (r["vec_id"], r["cluster"], r["n_dup_anchors"], r["is_kept"])
            for r in f2.collect()
        }
        got = {
            (r["vec_id"], r["cluster"], r["n_dup_anchors"], r["is_kept"])
            for r in cat.load(spark, "semdedup", fp, version=2)["flags"].collect()
        }
        assert got == want
        assert not ({r[0] for r in got} & {2, 32})
