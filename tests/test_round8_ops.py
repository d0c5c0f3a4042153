"""Round-8 operator tests: cross-engine epoch floor semantics, the
bounded-output MinHash cluster table, and the capped cluster
compositions (survivorship / leakage-safe split over capped pair
sources + the MinHash star-edge overflow channel)."""

from __future__ import annotations

import datetime

import duckdb
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


class TestEpochSecondReduction:
    def test_second_reduction_agrees_cross_engine_incl_pre_1970(self, spark):
        # ADVICE r7 claimed Spark `unix_micros(ts) div 1000000` (truncate
        # toward zero) diverges from DuckDB `epoch_us(ts) // 1000000`
        # (allegedly floor) for pre-1970 timestamps. Investigated:
        # DuckDB's `//` on BIGINT operands ALSO truncates toward zero
        # (-500000 // 1000000 = 0, -7 // 2 = -3), so the two reductions
        # used by conversation_turn_audit agree at every epoch. Pin that
        # agreement — including the negative-epoch sub-second case the
        # advice flagged — so a future engine change surfaces here.
        ts = [
            datetime.datetime(1969, 12, 31, 23, 59, 59, 500000),
            datetime.datetime(1969, 12, 31, 23, 59, 58, 0),
            datetime.datetime(1970, 1, 1, 0, 0, 0, 999999),
            datetime.datetime(2024, 5, 1, 12, 0, 0, 123456),
        ]
        df = spark.createDataFrame([(t,) for t in ts], "ts timestamp")
        got = [
            r.sec
            for r in df.select(
                F.expr("unix_micros(ts) div 1000000").alias("sec")
            ).collect()
        ]
        con = duckdb.connect()
        want = [
            con.execute(
                "SELECT epoch_us(?::TIMESTAMP) // 1000000", [t.isoformat(sep=" ")]
            ).fetchone()[0]
            for t in ts
        ]
        assert got == want
        assert got[0] == 0  # both engines truncate: -500000us -> 0s


class TestMinhashStarEdges:
    """The star construction's load-bearing claim: connected components
    over per-bucket STAR edges (member -> bucket-min hub) equal the
    components over the full per-bucket clique, at linear edge count."""

    @pytest.fixture(scope="class")
    def docs(self, spark):
        rows = []
        did = 0
        # two exact-dup families (identical signatures -> identical
        # buckets in every band, deterministically) + near-dup family
        # + singleton background
        for fam, size in (("alpha", 5), ("beta", 4)):
            text = " ".join(f"{fam}tok{i}" for i in range(12))
            for _ in range(size):
                rows.append((did, text))
                did += 1
        for s in range(8):
            rows.append((did, " ".join(f"solo{s}w{i}" for i in range(12))))
            did += 1
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_star_components_equal_clique_components(self, spark, docs):
        from redcap_omop_etl_spark.operators.dedup import (
            minhash_band_table,
            minhash_star_edges,
        )
        from redcap_omop_etl_spark.operators.graph import connected_components

        banded = minhash_band_table(docs).cache()
        star = minhash_star_edges(docs)
        clique = (
            banded.alias("x")
            .join(
                banded.alias("y"),
                (F.col("x.band") == F.col("y.band"))
                & (F.col("x.bucket") == F.col("y.bucket"))
                & (F.col("x.doc") < F.col("y.doc")),
            )
            .select(F.col("x.doc").alias("d1"), F.col("y.doc").alias("d2"))
            .distinct()
        )
        cs = {r.node: r.component for r in connected_components(star).collect()}
        cc = {r.node: r.component for r in connected_components(clique).collect()}
        assert cs == cc
        # family structure recovered: 5-clique and 4-clique
        sizes = sorted(
            star.select(F.explode(F.array("d1", "d2")).alias("n"))
            .distinct()
            .groupBy()
            .count()
            .collect()[0][0]
            for _ in (1,)
        )
        assert sizes == [9]  # 5 + 4 family members, no singletons
        # linear edge bound: star edges <= banded rows
        assert star.count() <= banded.count()
        banded.unpersist()


class TestCappedClusterComposition:
    """Recall/containment contract of the round-8 capped composition
    (capped-PPJoin clean pairs + MinHash star edges over overflow docs):
    on a corpus whose dup families are exact duplicates, the composed
    clusters EQUAL the uncapped Jaccard clusters while the exact pair
    channel never sees a family."""

    @pytest.fixture(scope="class")
    def dense(self, spark):
        rows = []
        did = 0
        # two exact-dup families of 10 (prefix buckets of 10 > cap=4 ->
        # routed whole to overflow; identical signatures guarantee the
        # star channel reconnects them deterministically)
        for fam in range(2):
            text = " ".join(f"f{fam}tok{i}" for i in range(14))
            for _ in range(10):
                rows.append((did, text))
                did += 1
        # one CLEAN near-dup pair (family of 2 <= cap stays exact)
        base = [f"pairw{i}" for i in range(14)]
        rows.append((did, " ".join(base))); did += 1
        mut = list(base); mut[0] = "pairmut"
        rows.append((did, " ".join(mut))); did += 1
        for s in range(15):
            rows.append((did, " ".join(f"bg{s}w{i}" for i in range(14))))
            did += 1
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_composed_clusters_match_uncapped(self, spark, dense):
        from redcap_omop_etl_spark.operators import dedup
        from redcap_omop_etl_spark.operators.graph import connected_components

        # uncapped reference clusters (exact Jaccard >= 0.6 edges)
        ref_pairs = dedup.ngram_jaccard_pairs(dense, threshold=0.6, n=3, df_cap=100)
        ref = {r.node: r.component
               for r in connected_components(ref_pairs).collect()}

        pairs, overflow = dedup.prefix_jaccard_pairs_capped(
            dense, threshold=0.6, n=3, bucket_cap=4
        )
        odocs = {r.doc for r in overflow.collect()}
        assert odocs == set(range(20)), "exact-dup families route whole"
        clean_pairs = {(r.d1, r.d2) for r in pairs.collect()}
        assert clean_pairs == {(20, 21)}, "clean channel keeps the exact pair"

        over_docs = dense.join(
            overflow.withColumnRenamed("doc", "doc_id"), "doc_id", "left_semi"
        )
        star = dedup.minhash_star_edges(over_docs)
        edges = pairs.select("d1", "d2").unionByName(star)
        got = {r.node: r.component for r in connected_components(edges).collect()}

        def groups(m):
            g = {}
            for n, c in m.items():
                g.setdefault(c, set()).add(n)
            return sorted(map(sorted, g.values()))

        assert groups(got) == groups(ref) == [
            list(range(10)), list(range(10, 20)), [20, 21]
        ]


class TestMinhashClustersQuery:
    def test_per_doc_output_invariants(self, spark):
        from redcap_omop_etl_spark import workload

        out = workload.queries()["dedup_minhash_clusters"](spark, SF_SMOKE).cache()
        docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        # exactly one row per document (the bounded-output contract)
        assert out.count() == docs.count()
        rows = out.collect()
        by_rep = {}
        for r in rows:
            by_rep.setdefault(r.cluster_rep, []).append(r)
        for rep, members in by_rep.items():
            # rep is the min doc id of its cluster; exactly one survivor
            assert rep == min(m.doc_id for m in members)
            assert sum(m.is_survivor for m in members) == 1
            assert all(m.cluster_size == len(members) for m in members)
        out.unpersist()

    def test_star_clusters_contain_verified_lsh_pairs(self, spark):
        # every verified LSH pair collides in >= 1 bucket, so both ends
        # connect through that bucket's hub: star clustering must place
        # them in one cluster (it may only COARSEN, never split).
        from redcap_omop_etl_spark import workload

        comp = {
            r.doc_id: r.cluster_rep
            for r in workload.queries()["dedup_minhash_clusters"](
                spark, SF_SMOKE
            ).collect()
        }
        pairs = workload.queries()["dedup_minhash_lsh"](spark, SF_SMOKE).collect()
        assert pairs, "smoke corpus must contain near-dups"
        for p in pairs:
            assert comp[p.d1] == comp[p.d2]


class TestStarContractionCC:
    """Round-8 connected-components rewrite (alternating large-star /
    small-star, Kiveris et al. SoCC'14): the old min-label propagation
    needed DIAMETER rounds and silently returned unconverged labels on
    long chains (hit at nd64, where mutated near-dup replicas form
    chains); contraction converges in O(log^2 n) rounds."""

    def test_long_chain_converges_exactly(self, spark):
        from redcap_omop_etl_spark.operators.graph import connected_components

        # a 400-node path graph: diameter 399 >> any per-round budget the
        # old propagation could afford — contraction must still label
        # every node with the chain minimum.
        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(400)] + [(1000, 1001), (1001, 1002)],
            "d1 long, d2 long",
        )
        comp = {r.node: r.component for r in connected_components(edges).collect()}
        assert all(comp[i] == 0 for i in range(401))
        assert comp[1000] == comp[1001] == comp[1002] == 1000
        assert len(comp) == 404

    def test_mixed_shapes_and_empty(self, spark):
        from redcap_omop_etl_spark.operators.graph import connected_components

        edges = spark.createDataFrame(
            # triangle + star + self-contained pair + duplicate/reversed
            # edges + self loop (must be ignored)
            [(3, 2), (2, 1), (1, 3), (10, 11), (10, 12), (10, 13),
             (20, 21), (21, 20), (7, 7)],
            "d1 long, d2 long",
        )
        comp = {r.node: r.component for r in connected_components(edges).collect()}
        assert {comp[1], comp[2], comp[3]} == {1}
        assert {comp[n] for n in (10, 11, 12, 13)} == {10}
        assert comp[20] == comp[21] == 20
        assert comp[7] == 7  # self-loop-only node: a singleton component
        empty = connected_components(
            spark.createDataFrame([], "d1 long, d2 long")
        )
        assert empty.columns == ["node", "component"]
        assert empty.count() == 0


class TestSemDeDup:
    """SemDeDup invariants the oracle can't express: first-seen
    survivorship on constructed duplicate groups, and the anchor cap's
    exact-recall guarantee when groups are anchor-covered."""

    def _emb(self, spark, vecs):
        return spark.createDataFrame(
            [(i, [float(x) for x in v], 0) for i, v in enumerate(vecs)],
            "vec_id bigint, embedding array<float>, label int",
        )

    def test_exact_dup_groups_keep_exactly_lowest_id(self, spark):
        from redcap_omop_etl_spark.operators.similarity import (
            ivf_build,
            semdedup_flags,
        )

        # 4 prototypes x 8 exact copies, 64-dim; copies are
        # embedding-identical so they always share a k-means cell
        # (identical distance vectors -> identical argmin) and have
        # cosine 1.0 to each other.
        protos = [
            [1.0 if d % 4 == p else 0.1 * p for d in range(64)] for p in range(4)
        ]
        vecs = [protos[i % 4] for i in range(32)]  # ids 0..31, group = id%4
        emb = self._emb(spark, vecs)
        assignments, _ = ivf_build(emb, n_clusters=4, n_iters=2)
        flags = semdedup_flags(emb, assignments, tau=0.999, n_anchors=16).collect()
        kept = sorted(r.vec_id for r in flags if r.is_kept)
        # exactly one survivor per group: the lowest id (0,1,2,3)
        assert kept == [0, 1, 2, 3]
        by_id = {r.vec_id: r for r in flags}
        for vid in range(4, 32):
            assert by_id[vid].n_dup_anchors >= 1

    def test_corpus_flags_consistent(self, spark):
        from redcap_omop_etl_spark.operators.similarity import dedup_semdedup

        rows = dedup_semdedup(spark, SF_SMOKE).collect()
        assert len(rows) > 0
        by_cluster = {}
        for r in rows:
            assert r.is_kept == (r.n_dup_anchors == 0)
            by_cluster.setdefault(r.cluster, []).append(r)
        for cl, members in by_cluster.items():
            # the lowest-id member of a cell precedes every anchor -> kept
            lowest = min(members, key=lambda r: r.vec_id)
            assert lowest.is_kept, f"cluster {cl} lowest id pruned"


class TestIvfPqAdc:
    def test_exact_copies_of_query_rank_first(self, spark):
        from redcap_omop_etl_spark.operators.similarity import (
            PQ_SUBDIM,
            PQ_SUBSPACES,
            ivf_build,
            pq_assign,
        )
        from pyspark.sql import functions as F

        dim = PQ_SUBDIM * PQ_SUBSPACES
        # query prototype + exact copies share every PQ code, so their
        # ADC distance to the query is the global minimum.
        q = [1.0 if d % 3 == 0 else -0.5 for d in range(dim)]
        other = [[(0.2 * ((i * 7 + d) % 11) - 1.0) for d in range(dim)] for i in range(20)]
        vecs = [q] + other[:10] + [q, q] + other[10:]
        emb = spark.createDataFrame(
            [(i, [float(x) for x in v], 0) for i, v in enumerate(vecs)],
            "vec_id bigint, embedding array<float>, label int",
        )
        codes, cs = pq_assign(emb)
        cl = codes.collect()
        codes_by_vec = {}
        for r in cl:
            codes_by_vec.setdefault(r.vec_id, {})[r.subspace] = r.codeword
        # copies (ids 11, 12) carry the query's exact code vector
        assert codes_by_vec[11] == codes_by_vec[0]
        assert codes_by_vec[12] == codes_by_vec[0]

    def test_registered_query_invariants(self, spark):
        from redcap_omop_etl_spark.operators.similarity import similarity_ivf_pq_adc

        rows = similarity_ivf_pq_adc(spark, SF_SMOKE).orderBy("adc_rank").collect()
        assert [r.adc_rank for r in rows] == list(range(1, len(rows) + 1))
        d2 = [r.adc_d2q for r in rows]
        assert d2 == sorted(d2), "ADC distance must be nondecreasing in rank"
        assert all(r.vec_id != 0 for r in rows), "query itself excluded"
        assert all(-1.0 <= r.cos_sim <= 1.0 for r in rows)

    def test_adc_recall_vs_exact_within_probes(self, spark):
        # With a 16-codeword (4-bit) one-Lloyd-round codebook over
        # ISOTROPIC synthetic vectors, top-9 overlap with exact cosine
        # is noise-dominated (the meaningful training signal is the
        # distortion drop, asserted below in the audit test) — this pins
        # the WIRING (deterministic data + deterministic plan =>
        # deterministic overlap), not a recall target; production recall
        # comes from 8-bit codebooks and the exact-rerank audit column.
        from redcap_omop_etl_spark.operators.similarity import (
            similarity_ann_ivf,
            similarity_ivf_pq_adc,
        )

        exact = [
            r.vec_id
            for r in similarity_ann_ivf(spark, SF_SMOKE).orderBy("rank").collect()
            if r.vec_id != 0
        ][:9]
        adc = {r.vec_id for r in similarity_ivf_pq_adc(spark, SF_SMOKE).collect()}
        assert len(set(exact) & adc) >= 2

    def test_lloyd_round_reduces_distortion(self, spark):
        # the trained codebook must quantize strictly better than the
        # lowest-id-seed init it started from (avg distortion, exact
        # integer d2q units) — the point of the Lloyd round.
        from pyspark.sql import functions as F

        from redcap_omop_etl_spark.operators.similarity import (
            _pq_argmin,
            _pq_sub_struct,
            pq_assign,
        )
        from redcap_omop_etl_spark.sources.readers import Catalog

        e = Catalog(spark, SF_SMOKE)["embeddings"]
        best, _cs = pq_assign(e)
        trained = best.agg(F.sum("d2q")).collect()[0][0]
        seeds = (
            e.orderBy("vec_id")
            .limit(16)
            .select(
                F.row_number()
                .over(__import__("pyspark.sql.window", fromlist=["Window"]).Window.partitionBy(F.lit(0)).orderBy("vec_id"))
                .alias("codeword"),
                F.col("embedding").alias("cvec"),
            )
        )
        vs = e.select("vec_id", _pq_sub_struct("embedding", "sv").alias("x")).select(
            "vec_id", "x.subspace", "x.sv"
        )
        cs0 = seeds.select(
            "codeword", _pq_sub_struct("cvec", "cv").alias("x")
        ).select("codeword", "x.subspace", "x.cv")
        init = _pq_argmin(vs, cs0).agg(F.sum("d2q")).collect()[0][0]
        assert trained < init
