"""Round-10 operator tests: deletion maintenance (cluster table +
IVF-PQ index), incremental SemDeDup, incremental retrieval stats, and
the connected-components groupby fallback knob."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


class TestCcNeighborhoodMinKnob:
    """The groupby fallback (map-side partial aggregation for
    adversarially hub-heavy graphs) must produce the identical
    component table as the default keyed-window form."""

    def test_fallback_matches_window_on_hub_and_chain(self, spark):
        from redcap_omop_etl_spark.operators.graph import connected_components

        # one giant hub (0 - 1..200), one chain (300-301-...-320),
        # one isolated self-loop, plus a 2-cycle
        edges = (
            [(0, i) for i in range(1, 201)]
            + [(300 + i, 301 + i) for i in range(20)]
            + [(400, 400), (500, 501), (501, 500)]
        )
        df = spark.createDataFrame(edges, "d1 long, d2 long")
        a = {
            (r["node"], r["component"])
            for r in connected_components(df, neighborhood_min="window").collect()
        }
        b = {
            (r["node"], r["component"])
            for r in connected_components(df, neighborhood_min="groupby").collect()
        }
        assert a == b
        # hub family all labeled 0; chain labeled by its min
        lbl = dict(a)
        assert lbl[200] == 0 and lbl[320] == 300 and lbl[400] == 400

    def test_unknown_knob_rejected(self, spark):
        from redcap_omop_etl_spark.operators.graph import connected_components

        df = spark.createDataFrame([(1, 2)], "d1 long, d2 long")
        with pytest.raises(ValueError):
            connected_components(df, neighborhood_min="bogus")


class TestClustersDelete:
    """dedup_minhash_clusters_delete: untouched components' labels pass
    through the frozen state verbatim (value equality with the full
    rebuild is the registered oracle's job — this pins the STRUCTURAL
    claim that only touched components are recomputed)."""

    def test_untouched_labels_identical_to_base_table(self, spark):
        from redcap_omop_etl_spark.operators.graph import (
            _CLUSTER_DELETE_MOD,
            _CLUSTER_DELETE_RES,
            _minhash_cluster_state,
            dedup_minhash_clusters,
            dedup_minhash_clusters_delete,
        )

        base = {
            r["doc_id"]: r["cluster_rep"]
            for r in dedup_minhash_clusters(spark, SF_SMOKE).collect()
        }
        after = {
            r["doc_id"]: r["cluster_rep"]
            for r in dedup_minhash_clusters_delete(spark, SF_SMOKE).collect()
        }
        deleted = {
            d
            for d in base
            if d % _CLUSTER_DELETE_MOD == _CLUSTER_DELETE_RES
        }
        assert deleted and not (set(after) & deleted)
        # components with no deleted member: labels must be EXACTLY the
        # frozen base labels (the pass-through path)
        comp, _hubs = _minhash_cluster_state(spark, SF_SMOKE, family="md5")
        comp_of = {r["node"]: r["component"] for r in comp.collect()}
        touched = {comp_of[d] for d in deleted if d in comp_of}
        for doc, rep in after.items():
            if comp_of.get(doc, doc) not in touched:
                assert rep == base[doc], f"untouched doc {doc} relabeled"

    def test_some_cluster_loses_its_min_and_relabels(self, spark):
        # a synthetic 3-doc exact-dup family whose min id is deleted:
        # survivors must re-label to the next-lowest id
        from redcap_omop_etl_spark.operators.dedup import minhash_star_edges
        from redcap_omop_etl_spark.operators.graph import connected_components

        base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        docs = spark.createDataFrame(
            [(3, base), (13, base), (23, base)], "doc_id long, text string"
        )
        comp = connected_components(minhash_star_edges(docs))
        assert {r["component"] for r in comp.collect()} == {3}
        survivors = docs.filter(F.col("doc_id") != 3)
        comp2 = connected_components(minhash_star_edges(survivors))
        assert {r["component"] for r in comp2.collect()} == {13}


class TestIvfPqDelete:
    """ivfpq_delete_from_index: frozen codebook/centroids, only the
    affected cluster partitions rewritten, deleted ids invisible to the
    partition-pruned search."""

    def _file_state(self, root):
        import glob as g
        import os as o

        out = {}
        for p in g.glob(root + "/**/*.parquet", recursive=True):
            st = o.stat(p)
            out[p] = (st.st_size, st.st_mtime_ns)
        return out

    def test_delete_touches_only_affected_partitions(self, spark, tmp_path):
        from redcap_omop_etl_spark.operators.similarity import (
            ivf_build,
            ivfpq_adc_from_index,
            ivfpq_delete_from_index,
            ivfpq_write_index,
        )
        from redcap_omop_etl_spark.sources.readers import Catalog

        emb = Catalog(spark, SF_SMOKE)["embeddings"]
        q = emb.filter(F.col("vec_id") == 0).head()
        qv = [float(x) for x in q["embedding"]]
        assignments, centroids = ivf_build(emb, n_clusters=8, n_iters=2)
        path = str(tmp_path / "ivfpq")
        ivfpq_write_index(emb, assignments, centroids, path)

        # delete the current top hit (guaranteed in a probed cluster)
        top = ivfpq_adc_from_index(spark, path, qv, k=3).collect()
        victim = top[0]["vec_id"]
        victim_cluster = (
            assignments.filter(F.col("vec_id") == victim).head()["cluster"]
        )
        before_codes = self._file_state(path + "/codes")
        before_codebook = self._file_state(path + "/codebook")
        before_centroids = self._file_state(path + "/centroids")

        ivfpq_delete_from_index(
            spark, path, spark.createDataFrame([(victim,)], "vec_id long")
        )

        # frozen state untouched
        assert self._file_state(path + "/codebook") == before_codebook
        assert self._file_state(path + "/centroids") == before_centroids
        # only the victim's cluster partition changed
        after_codes = self._file_state(path + "/codes")
        for p, st in before_codes.items():
            if f"cluster={victim_cluster}/" in p:
                continue
            assert after_codes.get(p) == st, f"unaffected file rewritten: {p}"
        # the victim's partition WAS rewritten
        changed = {
            p
            for p in set(before_codes) | set(after_codes)
            if before_codes.get(p) != after_codes.get(p)
        }
        assert changed and all(f"cluster={victim_cluster}/" in p for p in changed)
        # deleted id invisible to search; survivors unchanged
        after_top = ivfpq_adc_from_index(spark, path, qv, k=3).collect()
        assert victim not in {r["vec_id"] for r in after_top}
        assert {r["vec_id"] for r in top[1:3]} <= {
            r["vec_id"] for r in after_top
        }
        # codes table no longer contains the id anywhere
        assert (
            spark.read.parquet(path + "/codes")
            .filter(F.col("vec_id") == victim)
            .count()
            == 0
        )


class TestSemDeDupAppend:
    """semdedup_flags_append: the memoized base flags pass through
    bit-identically, and batch flags land in frozen cells."""

    def test_base_flags_invariant_and_batch_marked(self, spark):
        from redcap_omop_etl_spark.operators.similarity import (
            _SEM_APPEND_SHIFT,
            semdedup_flags_append,
            semdedup_flags_memo,
        )

        base = {
            r["vec_id"]: (r["cluster"], r["n_dup_anchors"], r["is_kept"])
            for r in semdedup_flags_memo(spark, SF_SMOKE).collect()
        }
        rows = semdedup_flags_append(spark, SF_SMOKE).collect()
        out_base = {
            r["vec_id"]: (r["cluster"], r["n_dup_anchors"], r["is_kept"])
            for r in rows
            if not r["is_appended"]
        }
        assert out_base == base
        appended = [r for r in rows if r["is_appended"]]
        assert appended
        assert all(r["vec_id"] >= _SEM_APPEND_SHIFT for r in appended)

    def test_anchor_memo_is_per_cell_lowest_ids(self, spark):
        from redcap_omop_etl_spark.operators.similarity import (
            SEMDEDUP_ANCHORS,
            ivf_build,
            semdedup_anchors_memo,
        )
        from redcap_omop_etl_spark.sources.readers import Catalog

        anchors = semdedup_anchors_memo(spark, SF_SMOKE).collect()
        emb = Catalog(spark, SF_SMOKE)["embeddings"]
        assignments, _ = ivf_build(emb, n_clusters=16, n_iters=2, memo_key=SF_SMOKE)
        by_cell = {}
        for r in assignments.collect():
            by_cell.setdefault(r["cluster"], []).append(r["vec_id"])
        got = {}
        for r in anchors:
            got.setdefault(r["cluster"], []).append(r["a_id"])
        for c, ids in got.items():
            assert sorted(ids) == sorted(by_cell[c])[: SEMDEDUP_ANCHORS]


class TestRetrievalIndexAppend:
    def test_new_terms_enter_via_outer_join(self, spark):
        from redcap_omop_etl_spark.operators.retrieval import (
            _IDX_APPEND_MOD,
            _IDX_APPEND_RES,
            retrieval_index_append,
        )
        from redcap_omop_etl_spark.sources.readers import Catalog

        rows = {r["term"]: r for r in retrieval_index_append(spark, SF_SMOKE).collect()}
        n_batch = (
            Catalog(spark, SF_SMOKE)["documents"]
            .filter(
                F.pmod(F.col("doc_id"), F.lit(_IDX_APPEND_MOD)) == _IDX_APPEND_RES
            )
            .count()
        )
        if n_batch >= 3:  # suffix terms pass the df>=3 floor
            for t in ("zzqterm", "zzidxterm"):
                assert rows[t]["df"] == n_batch == rows[t]["df_appended"]
        # batch contribution is bounded by the batch, and shared terms
        # carry a base contribution on top of it (the synthetic corpus's
        # word pool is small, so every common term also appears in the
        # batch — a df_appended==0 row is NOT guaranteed here)
        assert all(r["df_appended"] <= n_batch for r in rows.values())
        assert any(r["df"] - r["df_appended"] > 0 for r in rows.values())

    def test_stats_memo_matches_direct_aggregate(self, spark):
        from redcap_omop_etl_spark.operators.retrieval import _tokens, term_stats_memo
        from redcap_omop_etl_spark.sources.readers import Catalog

        memo = {
            r["term"]: (r["df"], r["cf"])
            for r in term_stats_memo(spark, SF_SMOKE).collect()
        }
        d = Catalog(spark, SF_SMOKE)["documents"]
        tf = _tokens(d).groupBy("term", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
        direct = {
            r["term"]: (r["df"], r["cf"])
            for r in tf.groupBy("term")
            .agg(F.count(F.lit(1)).alias("df"), F.sum("tf").alias("cf"))
            .collect()
        }
        assert memo == direct


class TestMultimodalDecodeKnob:
    """The round-9 landmine (has_pil=True RAISED in the featurize
    closure, so installing pillow would have broken the registered
    query at runtime) is defused: the default byte-stub path is
    independent of PIL availability, and the real-decode path is an
    explicit opt-in that fails at PLAN time, not per-row in a worker."""

    def test_bytes_mode_ignores_pil_availability(self, spark, monkeypatch):
        from redcap_omop_etl_spark.operators import multimodal

        docs = spark.createDataFrame(
            [(1, "hello world", "en", "web", 11)],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        monkeypatch.setattr(multimodal, "_HAS_PIL", True)  # simulate install
        out = multimodal.extract_features(multimodal.synth_media(docs)).collect()
        assert len(out) == 1 and out[0]["n_bytes"] > 0

    def test_pil_mode_fails_at_plan_time_without_pillow(self, spark):
        from redcap_omop_etl_spark.operators import multimodal

        if multimodal._HAS_PIL:
            pytest.skip("pillow present in this environment")
        docs = spark.createDataFrame(
            [(1, "hello world", "en", "web", 11)],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        with pytest.raises(ImportError):
            multimodal.extract_features(multimodal.synth_media(docs), decode="pil")

    def test_bogus_mode_rejected(self, spark):
        from redcap_omop_etl_spark.operators import multimodal

        docs = spark.createDataFrame(
            [(1, "x", "en", "web", 1)],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        with pytest.raises(ValueError):
            multimodal.extract_features(multimodal.synth_media(docs), decode="gif")


class TestRecallSweep:
    def test_monotone_and_consistent_with_single_audit(self, spark):
        from redcap_omop_etl_spark.operators.similarity import (
            ivfpq_recall_audit,
            ivfpq_recall_sweep,
        )

        rows = {
            r["n_probes"]: r
            for r in ivfpq_recall_sweep(spark, SF_SMOKE).collect()
        }
        assert sorted(rows) == [1, 2, 4, 8]
        # candidates grow with probes (strict superset). Recall is NOT
        # asserted monotone: a newly probed cell can inject codes whose
        # QUANTIZED distance underestimates the true distance, evicting
        # true neighbors from the ADC top-10 (quantization loss) — the
        # smoke corpus actually exhibits this (np=1 recall 0.5 > np=2
        # recall 0.2), which is exactly why the sweep exists.
        for lo, hi in [(1, 2), (2, 4), (4, 8)]:
            assert rows[lo]["n_candidates"] <= rows[hi]["n_candidates"]
        assert all(0 <= r["recall_ppm"] <= 1_000_000 for r in rows.values())
        # the np=4 arm IS the registered single-point audit
        audit = ivfpq_recall_audit(spark, SF_SMOKE).head()
        assert rows[4]["n_candidates"] == audit["n_candidates"]
        assert rows[4]["recall_ppm"] == audit["recall_ppm"]


class TestSemDeDupDelete:
    """semdedup_flags_delete: pass-through for cells that lost no
    anchor; full recompute only inside anchor-losing cells."""

    def test_untouched_cells_pass_through_and_deleted_gone(self, spark):
        from redcap_omop_etl_spark.operators.similarity import (
            _SEM_DELETE_MOD,
            _SEM_DELETE_RES,
            semdedup_anchors_memo,
            semdedup_flags_delete,
            semdedup_flags_memo,
        )

        base = {
            r["vec_id"]: (r["cluster"], r["n_dup_anchors"], r["is_kept"])
            for r in semdedup_flags_memo(spark, SF_SMOKE).collect()
        }
        anchors = semdedup_anchors_memo(spark, SF_SMOKE).collect()
        deleted = {
            v for v in base if v % _SEM_DELETE_MOD == _SEM_DELETE_RES
        }
        touched_cells = {
            r["cluster"] for r in anchors if r["a_id"] in deleted
        }
        # the derived batch must exercise the anchor-promotion path
        assert deleted and touched_cells
        after = {
            r["vec_id"]: (r["cluster"], r["n_dup_anchors"], r["is_kept"])
            for r in semdedup_flags_delete(spark, SF_SMOKE).collect()
        }
        assert not (set(after) & deleted)
        assert set(after) == set(base) - deleted
        for v, row in after.items():
            if row[0] not in touched_cells:
                assert row == base[v], f"untouched-cell vec {v} changed"


class TestRetrievalIndexDelete:
    def test_subtraction_consistent_with_rebuild(self, spark):
        from redcap_omop_etl_spark.operators.retrieval import (
            _IDX_DELETE_MOD,
            _IDX_DELETE_RES,
            _tokens,
            retrieval_index_delete,
        )
        from redcap_omop_etl_spark.sources.readers import Catalog

        rows = {
            r["term"]: r for r in retrieval_index_delete(spark, SF_SMOKE).collect()
        }
        assert rows and all(
            r["df"] >= 3 and r["df_deleted"] >= 0 for r in rows.values()
        )
        # direct rebuild over survivors must agree term-for-term
        d = Catalog(spark, SF_SMOKE)["documents"].filter(
            F.pmod(F.col("doc_id"), F.lit(_IDX_DELETE_MOD)) != _IDX_DELETE_RES
        )
        tf = _tokens(d).groupBy("term", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
        direct = {
            r["term"]: (r["df"], r["cf"])
            for r in tf.groupBy("term")
            .agg(F.count(F.lit(1)).alias("df"), F.sum("tf").alias("cf"))
            .filter(F.col("df") >= 3)
            .collect()
        }
        assert {t: (r["df"], r["cf"]) for t, r in rows.items()} == direct


class TestPpjoinAppend:
    """dedup_prefix_jaccard_append: incremental exact pairs against the
    frozen prefix index — every output pair involves a batch doc, the
    guaranteed batch structure (source pair + twin pair) is found, and
    the frozen-order extension leaves base prefixes untouched."""

    def test_batch_pairs_found_and_no_base_base(self, spark):
        from redcap_omop_etl_spark.operators.dedup import (
            _PPJ_APPEND_MOD,
            _PPJ_APPEND_RES,
            _PPJ_APPEND_SHIFT,
            dedup_prefix_jaccard_append,
        )
        from redcap_omop_etl_spark.sources.readers import Catalog

        rows = dedup_prefix_jaccard_append(spark, SF_SMOKE).collect()
        assert rows
        # every pair involves a batch doc; d1 < d2 by construction
        assert all(r["d2"] >= _PPJ_APPEND_SHIFT and r["d1"] < r["d2"] for r in rows)
        srcs = [
            r["doc_id"]
            for r in Catalog(spark, SF_SMOKE)["documents"]
            .filter(F.pmod(F.col("doc_id"), F.lit(_PPJ_APPEND_MOD)) == _PPJ_APPEND_RES)
            .select("doc_id")
            .collect()
        ]
        assert srcs
        pairs = {(r["d1"], r["d2"]): r["pair_kind"] for r in rows}
        for s in srcs:
            # twin pair (new_new) is J=1 and must always be found
            assert (
                pairs.get((s + _PPJ_APPEND_SHIFT, s + 2 * _PPJ_APPEND_SHIFT))
                == "new_new"
            )

    def test_frozen_state_prefix_matches_uncapped_pipeline_order(self, spark):
        # the memoized prefix must be the same (dfr, t)-ordered prefix the
        # uncapped pipeline derives — spot-check sizes and per-doc counts
        from redcap_omop_etl_spark.operators.dedup import ppjoin_frozen_state
        from redcap_omop_etl_spark.sources.readers import Catalog
        from redcap_omop_etl_spark.operators.dedup import shingles

        dfreq, prefix = ppjoin_frozen_state(spark, SF_SMOKE)
        docs = Catalog(spark, SF_SMOKE)["documents"]
        sz = {
            r["doc_id"]: r["n"]
            for r in docs.select(
                "doc_id", F.size(shingles(F.col("text"), 3)).alias("n")
            ).collect()
        }
        import math

        got = {}
        for r in prefix.collect():
            got[r["doc"]] = got.get(r["doc"], 0) + 1
            assert r["sz"] == sz[r["doc"]]
        for doc, n_prefix in got.items():
            expected = sz[doc] - math.ceil(sz[doc] * 0.6) + 1
            assert n_prefix == expected, (doc, n_prefix, expected)


class TestStreamClusterIndex:
    """stream_to_cluster_index: micro-batched ingest into the persisted
    cluster state must equal the one-shot rebuild over everything
    ingested — including a cluster MERGE caused by a later batch
    bridging two earlier families."""

    def test_multibatch_stream_equals_rebuild(self, spark, tmp_path):
        from redcap_omop_etl_spark.operators.dedup import minhash_star_edges
        from redcap_omop_etl_spark.operators.graph import connected_components
        from redcap_omop_etl_spark.streaming.windows import stream_to_cluster_index

        fam_a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        fam_b = "one two three four five six seven eight nine ten eleven"
        # the concatenation has J~0.43 to each family: whether it bridges
        # them is an LSH coin flip — it exercises the merge code path,
        # and the rebuild-equality assertion holds EITHER way (both
        # sides see the same bucket graph)
        bridge = fam_a + " " + fam_b
        batches = [
            # batch 0: two separate families + a singleton
            [(1, fam_a), (2, fam_a), (10, fam_b), (11, fam_b),
             (20, "a lone unrelated document with its very own words here")],
            # batch 1: EXACT copy of a family-A member — identical shingle
            # set => identical signature => co-buckets in every band:
            # the cross-batch attach is deterministic
            [(30, fam_a)],
            # batch 2: the probabilistic bridge
            [(40, bridge)],
        ]
        src = tmp_path / "incoming"
        src.mkdir()
        # one parquet part-file per batch so maxFilesPerTrigger=1 yields
        # one micro-batch per ingest batch
        for i, rows in enumerate(batches):
            spark.createDataFrame(rows, "doc_id long, text string").coalesce(
                1
            ).write.parquet(str(tmp_path / f"stage{i}"))
            import glob, shutil

            part = glob.glob(str(tmp_path / f"stage{i}" / "part-*.parquet"))[0]
            shutil.copy(part, str(src / f"batch{i:03d}.parquet"))

        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        state = str(tmp_path / "cluster_state")
        q = stream_to_cluster_index(stream, state, str(tmp_path / "ckpt"))
        q.awaitTermination(120)

        got = {
            (r["node"], r["component"])
            for r in spark.read.parquet(state + "/components").collect()
        }
        all_docs = spark.createDataFrame(
            [r for b in batches for r in b], "doc_id long, text string"
        )
        want = {
            (r["node"], r["component"])
            for r in connected_components(minhash_star_edges(all_docs)).collect()
        }
        assert got == want
        lbl = dict(got)
        # deterministic pins: the exact-copy attach joined family A
        # across batches, and family B stayed internally clustered
        assert lbl[2] == 1 and lbl[30] == 1
        assert lbl[11] == lbl[10]
        assert 20 not in lbl  # singleton never entered the edge graph


class TestPpjoinAppendCapped:
    """dedup_prefix_jaccard_append_capped: batch additions can push a
    base prefix bucket over the cap, so BASE docs appear as newly-routed
    overflow rows (the retraction signal) — and clean candidates stay
    cap-bounded."""

    def test_newly_hot_base_docs_are_routed(self, spark):
        from redcap_omop_etl_spark.operators.dedup import (
            _PPJ_APPEND_SHIFT,
            dedup_prefix_jaccard_append_capped,
        )

        rows = dedup_prefix_jaccard_append_capped(spark, SF_SMOKE).collect()
        over = [r["d1"] for r in rows if r["kind"] == "overflow"]
        assert over
        # the registered cap (2) plus the two appended copies per source
        # guarantees some BASE doc's prefix bucket crosses the cap
        assert any(d < _PPJ_APPEND_SHIFT for d in over)
        # overflow rows carry null pair fields; pair rows involve a batch doc
        for r in rows:
            if r["kind"] == "overflow":
                assert r["d2"] is None and r["jaccard"] is None
            else:
                assert r["d2"] >= _PPJ_APPEND_SHIFT and r["jaccard"] >= 0.6
