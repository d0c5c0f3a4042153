"""Embedding linear algebra: numpy brute-force pins + plan-shape pins.

The DuckDB oracle (test_workload_oracle.py) pins cross-engine values; here
we pin (a) the Gram-partial accumulation against a straight numpy
covariance, (b) driver-side PCA against numpy.linalg.eigh, (c) the JL
norm-preservation property, and (d) that the JL hot path really is
explode-free JVM code and the covariance shuffles only summary rows.
"""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from redcap_omop_etl_spark import workload
from redcap_omop_etl_spark.operators import linalg
from redcap_omop_etl_spark.sources.readers import Catalog
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def emb(spark):
    rows = Catalog(spark, SF_SMOKE)["embeddings"].select("vec_id", "embedding", "label").collect()
    x = np.array([r.embedding for r in rows], dtype="float64")
    labels = np.array([r.label for r in rows])
    return x, labels


def _quant(x):
    return (np.sign(x) * np.floor(np.abs(x) * linalg.Q_SCALE + 0.5)).astype("int64")


class TestCovariance:
    def test_matches_numpy(self, spark, emb):
        x, _ = emb
        q = _quant(x)
        expected = np.cov(q.astype("float64"), rowvar=False, ddof=1) / (linalg.Q_SCALE**2)
        got = workload.queries()["embedding_covariance"](spark, SF_SMOKE).collect()
        assert len(got) == linalg.DIM * (linalg.DIM + 1) // 2
        for r in got:
            assert r.i <= r.j and r.n == len(x)
            assert abs(r.cov - expected[r.i, r.j]) < 1e-9

    def test_shuffle_carries_summaries_not_rows(self, spark):
        # the exchange inputs are mapInPandas partials: (batches x ~2144)
        # rows, never corpus x d^2 — pin that no generator/explode exists
        # in the plan (the naive pair-join formulation would need one).
        df = workload.queries()["embedding_covariance"](spark, SF_SMOKE)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Generate" not in plan, "covariance must not explode the d^2 pairs"
        assert "SortMergeJoin" not in plan  # marginal joins are 64-row broadcasts


class TestPca:
    def test_eigh_matches_numpy_full(self, spark, emb):
        x, _ = emb
        q = _quant(x).astype("float64")
        m = np.cov(q, rowvar=False, ddof=1) / (linalg.Q_SCALE**2)
        vals = np.linalg.eigvalsh(m)[::-1]
        got = linalg.pca_top_components(
            workload.queries()["embedding_covariance"](spark, SF_SMOKE), top=5
        )
        # covariance entries are rounded 12dp before eigh; tolerance reflects that
        np.testing.assert_allclose(got["eigenvalues"], vals[:5], atol=1e-7)
        np.testing.assert_allclose(
            got["explained_variance_ratio"], (vals / vals.sum())[:5], atol=1e-7
        )
        assert got["eigenvalues"][0] >= got["eigenvalues"][-1] >= 0


class TestRandomProjection:
    def test_distortion_matches_numpy(self, spark, emb):
        x, labels = emb
        q = _quant(x)
        r = np.array(linalg.jl_signs(), dtype="int64")  # k x d
        p = q @ r.T  # n x k
        pp = (p * p).sum(axis=1)
        qq = (q * q).sum(axis=1)
        got = {row.label: row for row in
               workload.queries()["embedding_random_projection"](spark, SF_SMOKE).collect()}
        for lbl in np.unique(labels):
            mask = labels == lbl
            row = got[int(lbl)]
            assert row.n_vecs == int(mask.sum())
            expected = pp[mask].sum() / (linalg.JL_K * qq[mask].sum())
            assert abs(row.distortion - round(float(expected), 6)) < 1e-9
            ratios = pp[mask] / (linalg.JL_K * qq[mask])
            assert abs(row.min_ratio - round(float(ratios.min()), 6)) < 1e-9
            assert abs(row.max_ratio - round(float(ratios.max()), 6)) < 1e-9
            # JL: k=8 is coarse, but aggregate distortion concentrates near 1
            assert 0.5 < row.distortion < 2.0

    def test_hot_path_is_explode_free_jvm(self, spark):
        df = workload.queries()["embedding_random_projection"](spark, SF_SMOKE)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Generate" not in plan  # no explode: HOFs over the array
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
        assert plan.count("Exchange") <= 2  # label agg (+ AQE reuse)


class TestQuantizationTies:
    def test_half_away_from_zero(self):
        # 0.03125 is exactly representable; x*1e4 == 312.5 must quantize
        # to 313 (Spark/DuckDB round), not 312 (numpy half-even rint).
        x = np.array([[0.03125, -0.03125]])
        assert _quant(x).tolist() == [[313, -313]]


class TestLabelDispersion:
    def test_matches_brute_force_pairwise_cosine(self, spark):
        import numpy as np

        from redcap_omop_etl_spark import workload
        from tests.conftest import SF_SMOKE

        got = {
            r.label: (r.n_vecs, r.mean_pair_cos)
            for r in workload.queries()["embedding_label_dispersion"](
                spark, SF_SMOKE
            ).collect()
        }
        emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").collect()
        by_label: dict = {}
        for r in emb:
            by_label.setdefault(r.label, []).append(np.array(r.embedding, dtype="float64"))
        for label, vs in by_label.items():
            # mirror the operator's quantization ladder exactly
            q = [np.floor(np.abs(v) * 1e4 + 0.5) * np.sign(v) for v in vs]
            r_ = [np.floor(np.abs(x / np.sqrt((x * x).sum()) * 1e6) + 0.5)
                  * np.sign(x) for x in q]
            n = len(r_)
            m = np.stack(r_)
            gram = m @ m.T
            brute = (gram.sum() - np.trace(gram)) / (n * (n - 1)) / 1e12
            n_got, cos_got = got[label]
            assert n_got == n
            assert abs(cos_got - brute) < 1e-6, (label, cos_got, brute)
