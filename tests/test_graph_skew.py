"""Unit semantics for the iterative connected-components operator and the
skew-mitigation rewrites (oracle equality is checked separately by the
workload harness; these pin the operator-level contracts)."""

from __future__ import annotations

from pyspark.sql import functions as F

from redcap_omop_etl_spark.operators.graph import connected_components
from redcap_omop_etl_spark.operators.skew import salted_join, salted_sum


class TestConnectedComponents:
    def test_chain_clique_and_pair(self, spark):
        # chain 1-2-3-4, clique {10,11,12}, pair {20,21}
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
            "d1 long, d2 long",
        )
        got = {r["node"]: r["component"] for r in connected_components(edges).collect()}
        assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}

    def test_direction_independent(self, spark):
        fwd = spark.createDataFrame([(5, 9), (9, 7)], "d1 long, d2 long")
        rev = spark.createDataFrame([(9, 5), (7, 9)], "d1 long, d2 long")
        as_set = lambda df: {tuple(r) for r in connected_components(df).collect()}
        assert as_set(fwd) == as_set(rev) == {(5, 5), (9, 5), (7, 5)}


class TestSkewRewrites:
    def test_salted_sum_equals_plain(self, spark):
        df = spark.createDataFrame(
            [(k, i, float(i)) for k in ("a", "b") for i in range(50)],
            "k string, id long, v double",
        )
        plain = {
            (r["k"]): (r["s"], r["n"])
            for r in df.groupBy("k").agg(F.sum("v").alias("s"), F.sum(F.lit(1)).alias("n")).collect()
        }
        salted = {
            (r["k"]): (r["s"], r["n"])
            for r in salted_sum(df, ["k"], {"s": F.col("v"), "n": F.lit(1)}, salt_src="id", n_salts=7).collect()
        }
        assert plain == salted

    def test_salted_join_row_identical(self, spark):
        fact = spark.createDataFrame([(i % 3, i) for i in range(100)], "k long, fid long")
        dim = spark.createDataFrame([(0, "x"), (1, "y"), (2, "z")], "k long, tag string")
        plain = {tuple(r) for r in fact.join(dim, "k").select("fid", "tag").collect()}
        salted = {
            tuple(r)
            for r in salted_join(fact, dim, key="k", salt_src="fid", n_salts=5).select("fid", "tag").collect()
        }
        assert plain == salted
        assert len(plain) == 100

    def test_salted_join_left_keeps_unmatched(self, spark):
        fact = spark.createDataFrame([(0, 1), (9, 2)], "k long, fid long")
        dim = spark.createDataFrame([(0, "x")], "k long, tag string")
        rows = {
            (r["fid"], r["tag"])
            for r in salted_join(fact, dim, key="k", salt_src="fid", n_salts=4, how="left").collect()
        }
        assert rows == {(1, "x"), (2, None)}


class TestSketchReaggregation:
    def test_union_of_daily_sketches_tracks_exact(self, spark):
        from redcap_omop_etl_spark import workload
        from redcap_omop_etl_spark.sources.readers import Catalog
        from tests.conftest import SF_SMOKE

        got = {
            r["event_type"]: r
            for r in workload.queries()["agg_sketch_reaggregation"](spark, SF_SMOKE).collect()
        }
        exact = {
            r["event_type"]: r["n"]
            for r in Catalog(spark, SF_SMOKE)["events"]
            .groupBy("event_type")
            .agg(F.countDistinct("user_id").alias("n"))
            .collect()
        }
        assert set(got) == set(exact)
        for t, n in exact.items():
            assert got[t]["exact_users"] == n, (t, got[t]["exact_users"], n)
            assert got[t]["sketch_within_tol"], t


class TestPagerank:
    def test_matches_dense_numpy_fixpoint(self, spark):
        import numpy as np

        from redcap_omop_etl_spark.operators.graph import pagerank

        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (1, 3), (3, 4)], "u bigint, v bigint"
        )
        got = {r["node"]: r["rank"] for r in pagerank(edges, n_iters=10).collect()}

        nodes = [1, 2, 3, 4]
        idx = {v: i for i, v in enumerate(nodes)}
        und = [(1, 2), (2, 3), (1, 3), (3, 4), (2, 1), (3, 2), (3, 1), (4, 3)]
        deg = np.zeros(4)
        for s, _ in und:
            deg[idx[s]] += 1
        r = np.full(4, 0.25)
        for _ in range(10):
            c = np.zeros(4)
            for s, d in und:
                c[idx[d]] += r[idx[s]] / deg[idx[s]]
            r = (1 - 0.85) / 4 + 0.85 * c
        for v in nodes:
            assert abs(got[v] - r[idx[v]]) < 1e-6, (v, got[v], r[idx[v]])
        # probability mass conserved
        assert abs(sum(got.values()) - 1.0) < 1e-6


class TestDegreeAssortativity:
    def test_matches_numpy(self, spark):
        import numpy as np

        from redcap_omop_etl_spark import workload
        from redcap_omop_etl_spark.operators.graph import _copurchase_edges
        from tests.conftest import SF_SMOKE

        row = workload.queries()["graph_degree_assortativity"](spark, SF_SMOKE).collect()[0]
        edges = [(r.u, r.v) for r in _copurchase_edges(spark, SF_SMOKE).collect()]
        deg = {}
        for u, v in edges:
            deg[u] = deg.get(u, 0) + 1
            deg[v] = deg.get(v, 0) + 1
        d1 = [deg[u] for u, v in edges] + [deg[v] for u, v in edges]
        d2 = [deg[v] for u, v in edges] + [deg[u] for u, v in edges]
        assert row.n_nodes == len(deg)
        assert row.n_edges == len(edges)
        assert row.max_degree == max(deg.values())
        assert abs(row.mean_degree - round(sum(deg.values()) / len(deg), 4)) < 1e-9
        expected = float(np.corrcoef(d1, d2)[0, 1])
        assert abs(row.assortativity - round(expected, 6)) < 1e-5
        assert -1.0 <= row.assortativity <= 1.0
