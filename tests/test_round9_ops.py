"""Round-9 operator tests: the xxHash64 fast-twin cluster path (hash
family swapped, star/CC plan identical), the shared family-keyed
component memo, and frozen-codebook IVF-PQ index append."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


class TestClusterFastTwin:
    """dedup_minhash_clusters_fast must be the SAME clustering semantics
    as the md5 twin — only the per-shingle hash family differs, so
    exact-duplicate documents (identical shingle sets -> identical
    signatures under ANY hash family) must co-cluster under both."""

    @pytest.fixture(scope="class")
    def dup_docs(self, spark):
        base = "the quick brown fox jumps over the lazy dog again and again"
        other = "completely unrelated content about distributed query engines"
        rows = [
            (1, base), (2, base), (3, base),       # exact-dup family
            (4, other), (5, other),                 # second family
            (6, "a lone singleton document with its very own words here"),
        ]
        return spark.createDataFrame(
            [(i, t, "en", "web", len(t)) for i, t in rows],
            "doc_id long, text string, lang string, source string, n_chars long",
        )

    @pytest.mark.parametrize("family", ["md5", "xxh"])
    def test_exact_dups_co_cluster_under_both_families(self, spark, dup_docs, family):
        from redcap_omop_etl_spark.operators.dedup import minhash_star_edges
        from redcap_omop_etl_spark.operators.graph import connected_components

        comp = connected_components(minhash_star_edges(dup_docs, family=family))
        label = {r.node: r.component for r in comp.collect()}
        # exact dups transitively connected, families separated
        assert label.get(1) == label.get(2) == label.get(3) == 1
        assert label.get(4) == label.get(5) == 4
        assert label.get(6, 6) not in (label[1], label[4])

    def test_registered_fast_twin_invariants(self, spark):
        from redcap_omop_etl_spark import workload

        qs = workload.queries()
        out = qs["dedup_minhash_clusters_fast"](spark, SF_SMOKE)
        rows = out.collect()
        docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        assert len(rows) == docs.count()  # one row per document
        by_rep: dict[int, list] = {}
        for r in rows:
            by_rep.setdefault(r.cluster_rep, []).append(r)
        for rep, members in by_rep.items():
            # the representative is the cluster min and the only survivor
            assert rep == min(m.doc_id for m in members)
            assert sum(m.is_survivor for m in members) == 1
            assert all(m.cluster_size == len(members) for m in members)

    def test_fast_twins_share_family_keyed_memo(self, spark):
        from redcap_omop_etl_spark.operators import graph as g

        g._MINHASH_COMP_MEMO.clear()
        g._cluster_table_frame(spark, SF_SMOKE, family="xxh").count()
        assert len(g._MINHASH_COMP_MEMO) == 1
        # the soft-weight twin reuses the same entry — no second build
        g._soft_dedup_frame(spark, SF_SMOKE, family="xxh").count()
        assert len(g._MINHASH_COMP_MEMO) == 1
        # the md5 family is a SEPARATE memo entry (different signatures)
        g._soft_dedup_frame(spark, SF_SMOKE, family="md5").count()
        assert len(g._MINHASH_COMP_MEMO) == 2
        g._MINHASH_COMP_MEMO.clear()

    def test_soft_weights_fast_consistent_with_cluster_table(self, spark):
        from redcap_omop_etl_spark import workload

        qs = workload.queries()
        weights = {r.source: r for r in qs["corpus_soft_dedup_weights_fast"](spark, SF_SMOKE).collect()}
        clusters = qs["dedup_minhash_clusters_fast"](spark, SF_SMOKE).collect()
        docs = {
            r.doc_id: r.source
            for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
            .select("doc_id", "source")
            .collect()
        }
        # recompute the per-source ppm rollup from the cluster table
        agg: dict[str, int] = {}
        n: dict[str, int] = {}
        for r in clusters:
            src = docs[r.doc_id]
            agg[src] = agg.get(src, 0) + 1_000_000 // r.cluster_size
            n[src] = n.get(src, 0) + 1
        for src, w in weights.items():
            assert w.n_docs == n[src]
            assert w.effective_docs_ppm == agg[src]


class TestIvfPqAppend:
    """Frozen-codebook incremental append to the persisted IVF-PQ index:
    the append must (a) never retrain (codebook/centroid files stay
    byte-identical), (b) write ONLY the cluster partitions the batch
    lands in, and (c) be immediately visible to the partition-pruned
    ADC search."""

    def _file_state(self, root):
        import glob as g
        import os as o

        out = {}
        for p in g.glob(root + "/**/*.parquet", recursive=True):
            st = o.stat(p)
            out[p] = (st.st_size, st.st_mtime_ns)
        return out

    def test_append_touches_only_affected_partitions_and_search_sees_new(
        self, spark, tmp_path
    ):
        from redcap_omop_etl_spark.operators.similarity import (
            _nearest_cells,
            ivf_build,
            ivfpq_adc_from_index,
            ivfpq_append_index,
            ivfpq_write_index,
        )
        from redcap_omop_etl_spark.sources.readers import Catalog

        emb = Catalog(spark, SF_SMOKE)["embeddings"]
        q = emb.filter(F.col("vec_id") == 0).head()
        qv = [float(x) for x in q["embedding"]]
        assignments, centroids = ivf_build(emb, n_clusters=8, n_iters=2)
        path = str(tmp_path / "ivfpq")
        ivfpq_write_index(emb, assignments, centroids, path)

        before_codes = self._file_state(path + "/codes")
        before_codebook = self._file_state(path + "/codebook")
        before_centroids = self._file_state(path + "/centroids")

        # append an exact twin of the query vector (lands in the query's
        # own nearest cell by construction) under a fresh id
        twin_id = 9_000_000
        batch = spark.createDataFrame(
            [(twin_id, [float(x) for x in q["embedding"]], 0)],
            "vec_id long, embedding array<float>, label int",
        )
        ivfpq_append_index(spark, path, batch)

        # (a) frozen index state: codebook + centroids byte-identical
        assert self._file_state(path + "/codebook") == before_codebook
        assert self._file_state(path + "/centroids") == before_centroids
        # (b) only the twin's cluster partition gained files; every
        # pre-existing file is untouched (size AND mtime)
        after_codes = self._file_state(path + "/codes")
        assert set(before_codes) <= set(after_codes)
        for p, st in before_codes.items():
            assert after_codes[p] == st, f"pre-existing file rewritten: {p}"
        new_files = set(after_codes) - set(before_codes)
        assert new_files, "append wrote nothing"
        new_parts = {f.split("cluster=")[1].split("/")[0] for f in new_files}
        assert len(new_parts) == 1  # one appended vector -> one cell
        # the twin of the query landed in the query's nearest cell
        assert new_parts == {str(_nearest_cells(centroids.collect(), qv, 1)[0])}

        # (c) search sees old + new: the appended twin carries the SAME
        # codes as vec 0, so it ties vec 0's ADC distance at the top
        got = ivfpq_adc_from_index(spark, path, qv, k=10, n_probes=3).collect()
        by_id = {r.vec_id: r for r in got}
        assert twin_id in by_id
        assert by_id[twin_id].adc_d2q == by_id[0].adc_d2q
        assert {by_id[0].adc_rank, by_id[twin_id].adc_rank} <= {1, 2}

    def test_registered_append_search_sees_both_generations(self, spark):
        from redcap_omop_etl_spark import workload
        from redcap_omop_etl_spark.operators.similarity import (
            _APPEND_MOD,
            _APPEND_RES,
            _APPEND_SHIFT,
        )

        out = sorted(
            workload.queries()["ivfpq_append_search"](spark, SF_SMOKE).collect(),
            key=lambda r: r.adc_rank,
        )
        assert len(out) == 10
        assert [r.adc_rank for r in out] == list(range(1, 11))
        # every appended id decodes back to a real base vector
        for r in out:
            if r.is_appended:
                base = r.vec_id - _APPEND_SHIFT
                assert base % _APPEND_MOD == _APPEND_RES
        # ADC distance is monotone in rank
        d = [r.adc_d2q for r in out]
        assert d == sorted(d)


class TestIncrementalClusterAppend:
    """incremental_minhash_components must (a) resolve cross-base-cluster
    merges exactly, (b) star batch-only buckets among new docs, and (c)
    make the registered append query equal a FULL Spark rebuild over the
    union corpus (the DuckDB oracle already pins the same equality
    cross-engine)."""

    def test_bridging_batch_doc_merges_two_base_clusters(self, spark):
        from redcap_omop_etl_spark.operators.graph import (
            incremental_minhash_components,
        )

        base_comp = spark.createDataFrame(
            [(1, 1), (2, 1), (5, 5), (6, 5)], "node long, component long"
        )
        hubs = spark.createDataFrame(
            [(0, "b1", 1), (1, "b2", 5), (2, "b3", 6)],
            "band int, bucket string, hub long",
        )
        batch_banded = spark.createDataFrame(
            # doc 100 bridges cluster {1,2} (via b1) and {5,6} (via b2,
            # where the hub 5 maps to rep 5; b3's hub 6 also maps to 5)
            [(100, 0, "b1"), (100, 1, "b2"), (100, 2, "b3"),
             # docs 200/201 share a batch-only bucket -> new cluster
             (200, 3, "b9"), (201, 3, "b9")],
            "doc long, band int, bucket string",
        )
        got = {
            r.node: r.component
            for r in incremental_minhash_components(
                base_comp, hubs, batch_banded
            ).collect()
        }
        assert got[100] == 1  # the bridge doc joins the merged cluster
        assert got[5] == 1  # cluster {5,6}'s rep REMAPPED onto rep 1
        assert got.get(1, 1) == 1
        assert got[200] == 200 and got[201] == 200  # batch-only star

    def test_registered_append_equals_full_spark_rebuild(self, spark):
        from pyspark.sql import functions as F

        from redcap_omop_etl_spark import workload
        from redcap_omop_etl_spark.operators.dedup import minhash_star_edges
        from redcap_omop_etl_spark.operators.graph import (
            _CLUSTER_APPEND_MOD,
            _CLUSTER_APPEND_RES,
            _CLUSTER_APPEND_SHIFT,
            _CLUSTER_APPEND_SUFFIX,
            connected_components,
        )

        out = workload.queries()["dedup_minhash_clusters_append"](spark, SF_SMOKE)
        got = {(r.doc_id): (r.cluster_rep, r.is_survivor, r.cluster_size, r.is_appended)
               for r in out.collect()}

        docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        one = docs.filter(
            F.pmod(F.col("doc_id"), F.lit(_CLUSTER_APPEND_MOD)) == _CLUSTER_APPEND_RES
        ).select("doc_id", F.concat(F.col("text"), F.lit(_CLUSTER_APPEND_SUFFIX)).alias("text"))
        union = (
            docs.select("doc_id", "text")
            .unionByName(one.select((F.col("doc_id") + _CLUSTER_APPEND_SHIFT).alias("doc_id"), "text"))
            .unionByName(one.select((F.col("doc_id") + 2 * _CLUSTER_APPEND_SHIFT).alias("doc_id"), "text"))
        )
        comp = connected_components(minhash_star_edges(union))
        label = {r.node: r.component for r in comp.collect()}
        want_rep = {
            r.doc_id: label.get(r.doc_id, r.doc_id) for r in union.select("doc_id").collect()
        }
        assert len(got) == len(want_rep)
        sizes: dict[int, int] = {}
        for _, rep in want_rep.items():
            sizes[rep] = sizes.get(rep, 0) + 1
        for doc, rep in want_rep.items():
            assert got[doc] == (
                rep,
                1 if doc == rep else 0,
                sizes[rep],
                doc >= _CLUSTER_APPEND_SHIFT,
            ), f"divergence at doc {doc}"
        # the batch genuinely exercised both paths: appended docs exist,
        # some co-cluster with their base source (shared-bucket path) and
        # every appended pair co-clusters with its twin via the suffix
        # shingles (batch-bucket path exercises when base buckets differ)
        appended = [d for d in got if d >= _CLUSTER_APPEND_SHIFT]
        assert appended
        joined_base = [
            d for d in appended if got[d][0] < _CLUSTER_APPEND_SHIFT
        ]
        assert joined_base, "no appended doc joined an existing cluster"
