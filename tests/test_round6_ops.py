"""Property pins for the round-6 operator wave: structure-aware chunk
splitting (offset preservation, boundary semantics, oversize re-split) —
the oracle harness covers cross-engine equality; these pin the invariants
the per-source audit can't see."""

from __future__ import annotations

from pyspark.sql import functions as F

from redcap_omop_etl_spark.operators.textstats import split_structured


def _chunks(df):
    return sorted(
        (
            (r["doc"], r["section_id"], r["sub_id"], r["start_idx"], r["end_idx"], r["n_tokens"])
            for r in df.collect()
        )
    )


class TestSplitStructured:
    def test_boundaries_and_offsets(self, spark):
        # doc 1: markers at positions 3 and 7 — three sections
        # doc 2: no markers — one section
        rows = [
            (1, "a b c table d e f line g h"),
            (2, "x y z"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = _chunks(split_structured(df, markers=("table", "line"), max_tokens=32))
        want = sorted(
            [
                (1, 1, 0, 0, 2, 3),   # "a b c"
                (1, 2, 0, 3, 6, 4),   # "table d e f"
                (1, 3, 0, 7, 9, 3),   # "line g h"
                (2, 1, 0, 0, 2, 3),   # "x y z"
            ]
        )
        assert got == want

    def test_oversized_section_resplit(self, spark):
        # one unmarked 70-token doc, max_tokens=32 -> 32 + 32 + 6
        text = " ".join(f"t{i}" for i in range(70))
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        got = _chunks(split_structured(df, markers=("table",), max_tokens=32))
        assert got == [
            (1, 1, 0, 0, 31, 32),
            (1, 1, 1, 32, 63, 32),
            (1, 1, 2, 64, 69, 6),
        ]

    def test_chunks_tile_document_exactly(self, spark):
        # offset preservation on arbitrary text: chunks sorted by start_idx
        # are contiguous, cover every token, and slicing the ORIGINAL token
        # array by (start_idx, n_tokens) reproduces each chunk's hash
        rows = [
            (i, " ".join(f"w{(i * 31 + j) % 17}" if j % 5 else "table" for j in range(40)))
            for i in range(6)
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        ch = split_structured(df, markers=("table",), max_tokens=8)
        toks = df.select(
            F.col("doc_id").alias("doc"),
            F.split(F.lower(F.trim("text")), r"\s+").alias("w"),
        )
        joined = ch.join(toks, "doc").select(
            "doc",
            "start_idx",
            "end_idx",
            "n_tokens",
            "chunk_hash",
            F.md5(
                F.array_join(
                    F.slice(F.col("w"), (F.col("start_idx") + 1).cast("int"), F.col("n_tokens").cast("int")),
                    " ",
                )
            ).alias("slice_hash"),
            F.size("w").alias("doc_tokens"),
        )
        rows_ = joined.collect()
        assert all(r["chunk_hash"] == r["slice_hash"] for r in rows_)
        by_doc: dict[int, list] = {}
        for r in rows_:
            by_doc.setdefault(r["doc"], []).append(r)
        for doc, cs in by_doc.items():
            cs.sort(key=lambda r: r["start_idx"])
            assert cs[0]["start_idx"] == 0
            assert cs[-1]["end_idx"] == cs[0]["doc_tokens"] - 1
            for prev, nxt in zip(cs, cs[1:]):
                assert nxt["start_idx"] == prev["end_idx"] + 1, (doc, prev, nxt)
            assert sum(r["n_tokens"] for r in cs) == cs[0]["doc_tokens"]


from redcap_omop_etl_spark import workload
from tests.conftest import SF_SMOKE


def _q(name):
    return workload.queries()[name]


class TestNdcgEval:
    def test_bounds_and_ideal_dominates(self, spark):
        row = _q("retrieval_ndcg_eval")(spark, SF_SMOKE).collect()[0]
        assert 0 < row["dcg_micro"] <= row["idcg_micro"]
        assert 0.0 < row["ndcg"] <= 1.0


class TestMmrRerank:
    def test_selection_properties(self, spark):
        rows = _q("similarity_mmr_rerank")(spark, SF_SMOKE).orderBy("step").collect()
        assert [r["step"] for r in rows] == [1, 2, 3, 4, 5]
        ids = [r["vec_id"] for r in rows]
        assert len(set(ids)) == 5, "MMR must never reselect"
        # greedy argmax over a shrinking candidate set with a growing
        # penalty: the chosen mmr score is non-increasing step over step
        scores = [r["mmr"] for r in rows]
        assert all(a >= b for a, b in zip(scores, scores[1:])), scores


class TestParetoFrontier:
    def test_matches_naive_domination(self, spark):
        # handcrafted (q_int, n_chars) points covering every dominance case:
        # strict domination on both axes, same-q higher-n domination, and
        # a same-(q, n) tie (neither dominates — both stay on the frontier)
        rows = [
            (1, "s", 100, "a a a a"),  # q=250000, n=100: dominated on both axes
            (2, "s", 300, "a b c d"),  # q=1000000, n=300: frontier (max q)
            (3, "s", 400, "a a b b"),  # q=500000, n=400: frontier
            (4, "s", 200, "a b a b"),  # q=500000, n=200: same-q as 3, lower n
            (5, "s", 400, "a a a b"),  # q=500000, n=400: exact tie with 3
        ]
        df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long, text string")
        from redcap_omop_etl_spark.operators.textstats import ws_tokens
        from pyspark.sql import functions as F, Window

        toks = ws_tokens(F.col("text"))
        q = df.select(
            "doc_id", "source", "n_chars",
            F.size(F.array_distinct(toks)).cast("bigint").alias("dt"),
            F.size(toks).cast("bigint").alias("nt"),
        ).select("doc_id", "source", "n_chars", F.expr("dt * 1000000 div nt").alias("q_int"))
        pts = [(r["doc_id"], r["q_int"], r["n_chars"]) for r in q.collect()]
        naive_frontier = {
            d for d, qq, nn in pts
            if not any(
                (q2 >= qq and n2 >= nn and (q2 > qq or n2 > nn))
                for d2, q2, n2 in pts if d2 != d
            )
        }
        w1 = (Window.partitionBy("source").orderBy(F.desc("q_int"))
              .rangeBetween(Window.unboundedPreceding, -1))
        w2 = Window.partitionBy("source", "q_int")
        m = q.select(
            "doc_id", "n_chars",
            F.max("n_chars").over(w1).alias("m1"),
            F.max("n_chars").over(w2).alias("m2"),
        )
        got = {
            r["doc_id"] for r in m.collect()
            if (r["m1"] is None or r["m1"] < r["n_chars"]) and r["n_chars"] == r["m2"]
        }
        assert got == naive_frontier


class TestLinkPrediction:
    def test_candidates_are_nonedges_with_shared_neighbors(self, spark):
        from redcap_omop_etl_spark.operators.graph import _copurchase_edges

        out = _q("graph_link_prediction")(spark, SF_SMOKE).collect()
        assert out, "expected distance-2 candidates"
        edges = {(r["u"], r["v"]) for r in _copurchase_edges(spark, SF_SMOKE).collect()}
        for r in out:
            assert (r["u"], r["v"]) not in edges
            assert r["u"] < r["v"]
            assert r["common_neighbors"] >= 1
            assert 0.0 < r["jaccard"] <= 1.0


class TestGroupKfold:
    def test_groups_are_fold_exclusive(self, spark):
        from redcap_omop_etl_spark.operators.sampling import N_FOLDS, hash_bucket
        from redcap_omop_etl_spark.sources.readers import Catalog

        e = Catalog(spark, SF_SMOKE)["events"]
        per_user = (
            e.select("user_id", (hash_bucket(F.col("user_id"), N_FOLDS)).alias("fold"))
            .groupBy("user_id")
            .agg(F.countDistinct("fold").alias("nf"), F.min("fold").alias("f"))
        )
        rows = per_user.collect()
        assert all(r["nf"] == 1 for r in rows), "a user leaked across folds"
        assert all(0 <= r["f"] < N_FOLDS for r in rows)
        # every fold is populated on the fixture corpus
        out = _q("sampling_group_kfold")(spark, SF_SMOKE).collect()
        assert [r["fold"] for r in out] == list(range(N_FOLDS))
        assert all(r["n_users"] > 0 for r in out)
