"""Retrieval + curation operators: properties the DuckDB oracle can't pin.

The cross-engine value gate lives in test_workload_oracle.py (all nine new
queries are registered + oracled); these tests pin (a) equivalence to
independent brute-force recomputations, (b) the Misra-Gries guarantee for
EVERY term (the registered query only surfaces the top-10), and (c)
determinism of the sketch under physical repartitioning — the property
that makes it a legal distributed aggregate.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from redcap_omop_etl_spark.operators import curation, retrieval
from redcap_omop_etl_spark.sources.readers import Catalog
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def docs_pdf(spark):
    return Catalog(spark, SF_SMOKE)["documents"].select("doc_id", "text", "source", "n_chars").toPandas()


def _tokenize(text: str) -> list[str]:
    import re

    return re.split(r"\s+", text.strip().lower())


class TestBm25:
    def test_topk_matches_bruteforce(self, spark, docs_pdf):
        got = retrieval.retrieval_bm25_topk(spark, SF_SMOKE).toPandas()

        toks = {int(r.doc_id): _tokenize(r.text) for r in docs_pdf.itertuples()}
        dl = {d: len(t) for d, t in toks.items()}
        n = float(len(dl))
        avgdl = float(sum(dl.values())) / n
        k1, b = retrieval.BM25_K1, retrieval.BM25_B
        scores: dict[int, float] = {}
        df = {
            q: sum(1 for t in toks.values() if q in t) for q in retrieval.BM25_QUERY_TERMS
        }
        for d, ts in toks.items():
            s_nano = 0  # mirror the operator: per-term nano-quantize, integer sum
            for q in retrieval.BM25_QUERY_TERMS:
                tf = float(ts.count(q))
                if tf == 0:
                    continue
                idf = math.log((n - df[q] + 0.5) / (df[q] + 0.5) + 1.0)
                term = idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl[d] / avgdl))
                s_nano += math.floor(term * retrieval.BM25_SCALE + 0.5)
            if s_nano > 0:
                scores[d] = s_nano
        top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
        assert list(got["doc_id"]) == [d for d, _ in top]
        for (_, s), g in zip(top, got["bm25"]):
            # compare against the UNROUNDED exact value: Python round() is
            # half-even on the binary double, Spark round() is HALF_UP on
            # the shortest decimal repr — at a 6dp tie they differ, so pin
            # "g is a valid 6dp rounding of s/SCALE" instead.
            assert abs(s / retrieval.BM25_SCALE - g) <= 5.0001e-7


class TestInvertedIndex:
    def test_blocks_and_df(self, spark, docs_pdf):
        got = retrieval.retrieval_inverted_index(spark, SF_SMOKE).toPandas()
        postings: dict[str, set[int]] = {}
        cf: dict[str, int] = {}
        for r in docs_pdf.itertuples():
            for t in _tokenize(r.text):
                postings.setdefault(t, set()).add(int(r.doc_id))
                cf[t] = cf.get(t, 0) + 1
        expected = {t: ids for t, ids in postings.items() if len(ids) >= 3}
        assert set(got["term"]) == set(expected)
        for r in got.itertuples():
            ids = sorted(expected[r.term])
            assert r.df == len(ids)
            assert r.cf == cf[r.term]
            assert r.n_blocks == math.ceil(len(ids) / 20)
            assert r.first_block == ",".join(str(i) for i in ids[:20])


class TestMisraGries:
    def test_bound_holds_for_every_term(self, spark, docs_pdf):
        d = Catalog(spark, SF_SMOKE)["documents"]
        summ = retrieval.misra_gries_summaries(d).toPandas()
        est = summ.groupby("term")["est"].sum().to_dict()
        total_dec = int(summ.groupby("bucket")["bucket_dec"].max().sum())
        exact: dict[str, int] = {}
        for r in docs_pdf.itertuples():
            for t in _tokenize(r.text):
                exact[t] = exact.get(t, 0) + 1
        for t, c in exact.items():
            e = int(est.get(t, 0))
            assert e <= c, f"{t}: est {e} > exact {c}"
            assert c - e <= total_dec, f"{t}: exact {c} - est {e} > bound {total_dec}"
        # sketch terms are a subset of the real vocabulary
        assert set(est) <= set(exact)

    def test_deterministic_under_repartition(self, spark):
        d = Catalog(spark, SF_SMOKE)["documents"]

        def run(frame):
            pdf = retrieval.misra_gries_summaries(frame).toPandas()
            return pdf.sort_values(["bucket", "term"]).reset_index(drop=True)

        a = run(d.repartition(3))
        b = run(d.repartition(11, "source"))
        pd.testing.assert_frame_equal(a, b)


class TestZipf:
    def test_fit_shape(self, spark):
        row = retrieval.retrieval_zipf_fit(spark, SF_SMOKE).collect()[0]
        assert row.n_terms > 0
        assert row.zipf_slope < 0  # frequency decreases with rank
        assert 0.0 <= row.zipf_r2 <= 1.0


class TestQuantileNormalize:
    def test_tile_and_reference(self, spark, docs_pdf):
        got = curation.curation_quantile_normalize(spark, SF_SMOKE).toPandas()
        assert len(got) == len(docs_pdf)
        # ntile semantics: within each source, tile sizes differ by <= 1
        # and the tile assignment is monotone in (n_chars, doc_id) order
        merged = got.merge(docs_pdf[["doc_id", "n_chars"]], on="doc_id")
        for _, g in merged.groupby("source"):
            sizes = g.groupby("tile").size()
            assert sizes.max() - sizes.min() <= 1
            ordered = g.sort_values(["n_chars", "doc_id"])
            assert (ordered["tile"].diff().dropna() >= 0).all()
        # the reference mean is shared across sources per tile and monotone
        ref = got.drop_duplicates("tile").sort_values("tile")
        assert ref["qnorm_chars"].is_monotonic_increasing
        assert got.groupby("tile")["qnorm_chars"].nunique().max() == 1


class TestCurriculumOrder:
    def test_round_robin_interleave(self, spark):
        got = curation.curation_curriculum_order(spark, SF_SMOKE).toPandas()
        for _, g in got.groupby("source"):
            assert g["shard_pos"].is_unique
            # position encodes (cycle, decile): pos % 10 == decile - 1
            assert ((g["shard_pos"] % 10) == (g["decile"] - 1)).all()
            # first full cycle visits every decile exactly once
            first_cycle = g[g["shard_pos"] < 10]
            assert sorted(first_cycle["decile"]) == list(range(1, 11))


class TestWinsorized:
    def test_matches_numpy(self, spark, docs_pdf):
        got = curation.curation_winsorized_stats(spark, SF_SMOKE).toPandas()
        for r in got.itertuples():
            vals = docs_pdf.loc[docs_pdf["source"] == r.source, "n_chars"].to_numpy(dtype="float64")
            p05 = np.percentile(vals, 5)  # linear interpolation == Spark percentile()
            p95 = np.percentile(vals, 95)
            clipped = np.clip(vals, p05, p95)
            assert r.n_docs == len(vals)
            assert r.n_clipped == int(((vals < p05) | (vals > p95)).sum())
            assert abs(r.p05 - round(float(p05), 4)) < 1e-9
            assert abs(r.p95 - round(float(p95), 4)) < 1e-9
            assert abs(r.robust_mean - round(float(clipped.mean()), 4)) < 5e-4
            assert abs(r.robust_std - round(float(clipped.std(ddof=1)), 4)) < 5e-4


class TestRrfFusion:
    def test_matches_bruteforce(self, spark, docs_pdf):
        got = retrieval.retrieval_rrf_fusion(spark, SF_SMOKE).toPandas()
        assert len(got) == 10

        # ranker A: BM25 (reuse the python brute force from TestBm25)
        toks = {int(r.doc_id): _tokenize(r.text) for r in docs_pdf.itertuples()}
        dl = {d: len(t) for d, t in toks.items()}
        n = float(len(dl))
        avgdl = float(sum(dl.values())) / n
        k1, b = retrieval.BM25_K1, retrieval.BM25_B
        df = {q: sum(1 for t in toks.values() if q in t) for q in retrieval.BM25_QUERY_TERMS}
        scores = {}
        for d, ts in toks.items():
            s = 0  # nano-quantized integer sum, mirroring bm25_scores
            for q in retrieval.BM25_QUERY_TERMS:
                tf = float(ts.count(q))
                if tf:
                    idf = math.log((n - df[q] + 0.5) / (df[q] + 0.5) + 1.0)
                    term = idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl[d] / avgdl))
                    s += math.floor(term * retrieval.BM25_SCALE + 0.5)
            if s > 0:
                scores[d] = s
        ra = {
            d: i + 1
            for i, (d, _) in enumerate(
                sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[: retrieval.RRF_POOL]
            )
        }
        rb = {
            int(r.doc_id): i + 1
            for i, r in enumerate(
                docs_pdf.sort_values(["n_chars", "doc_id"], ascending=[False, True])
                .head(retrieval.RRF_POOL)
                .itertuples()
            )
        }
        fused = {
            d: (1.0 / (retrieval.RRF_K + ra[d]) if d in ra else 0.0)
            + (1.0 / (retrieval.RRF_K + rb[d]) if d in rb else 0.0)
            for d in set(ra) | set(rb)
        }
        top = sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        assert list(got["doc_id"]) == [d for d, _ in top]
        for (d, s), row in zip(top, got.itertuples()):
            assert abs(row.rrf - s) <= 5.0001e-7  # valid 6dp rounding of s
            if d in ra:
                assert row.rank_bm25 == ra[d]
            else:
                assert pd.isna(row.rank_bm25)
            if d in rb:
                assert row.rank_len == rb[d]
            else:
                assert pd.isna(row.rank_len)
