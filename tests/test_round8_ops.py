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
