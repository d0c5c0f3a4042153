"""Property pins for the round-5 operator wave (the oracle harness covers
cross-engine equality; these pin the semantic invariants the oracle can't
see — monotonicity, completeness, recall)."""

from __future__ import annotations

from pyspark.sql import functions as F

from redcap_omop_etl_spark import workload
from tests.conftest import SF_SMOKE


def _q(name):
    return workload.queries()[name]


class TestKcorePeel:
    def test_counts_monotonically_nonincreasing(self, spark):
        rows = {r["round"]: r for r in _q("graph_kcore_peel")(spark, SF_SMOKE).collect()}
        assert sorted(rows) == [1, 2, 3]
        for r in (2, 3):
            assert rows[r]["n_nodes"] <= rows[r - 1]["n_nodes"]
            assert rows[r]["n_edges"] <= rows[r - 1]["n_edges"]
        # peeling only ever removes nodes of degree < k, so every survivor
        # of round r has degree >= k in round r-1's edge set — the round-3
        # node count can never exceed the round-1 edge bound 2*E/k
        from redcap_omop_etl_spark.operators.graph import _KCORE_K

        assert rows[3]["n_nodes"] <= rows[1]["n_edges"] * 2 // _KCORE_K + 1


class TestPqAudit:
    def test_every_vector_assigned_once_per_subspace(self, spark):
        from redcap_omop_etl_spark.operators.similarity import PQ_SUBSPACES
        from redcap_omop_etl_spark.sources.readers import Catalog

        out = _q("embedding_pq_audit")(spark, SF_SMOKE)
        n_vecs = Catalog(spark, SF_SMOKE)["embeddings"].count()
        per_sub = {
            r["subspace"]: r["n"]
            for r in out.groupBy("subspace").agg(F.sum("n_assigned").alias("n")).collect()
        }
        assert len(per_sub) == PQ_SUBSPACES
        assert all(n == n_vecs for n in per_sub.values())

    def test_distortion_nonnegative(self, spark):
        assert (
            _q("embedding_pq_audit")(spark, SF_SMOKE)
            .filter(F.col("avg_distortion") < 0)
            .count()
            == 0
        )


class TestReadability:
    def test_ratios_consistent_with_sums(self, spark):
        for r in _q("text_readability")(spark, SF_SMOKE).collect():
            assert r["n_sentences"] >= r["n_docs"]  # floor of 1 per doc
            assert abs(r["words_per_sentence"] - r["n_words"] / r["n_sentences"]) < 1e-3
            assert abs(r["syllables_per_word"] - r["n_syllables"] / r["n_words"]) < 1e-3


class TestRepSelection:
    def test_rep_counts_partition_the_corpus(self, spark):
        from redcap_omop_etl_spark.sources.readers import Catalog

        out = _q("curation_rep_selection")(spark, SF_SMOKE)
        tot = out.agg(
            F.sum("n_reps").alias("r"), F.sum("n_shadowed").alias("s")
        ).collect()[0]
        n_docs = Catalog(spark, SF_SMOKE)["documents"].count()
        assert tot["r"] + tot["s"] == n_docs  # every doc is a rep or shadowed


class TestNgramNovelty:
    def test_global_novel_equals_global_vocab(self, spark):
        # every distinct bigram is novel in exactly one document, so the
        # novel total across sources == corpus distinct-bigram count
        out = _q("corpus_ngram_novelty")(spark, SF_SMOKE)
        assert (
            out.filter((F.col("novelty_ratio") < 0) | (F.col("novelty_ratio") > 1)).count() == 0
        )
        tot = out.agg(F.sum("n_novel").alias("nv"), F.sum("n_bigrams").alias("nb")).collect()[0]
        assert 0 < tot["nv"] <= tot["nb"]


class TestPrfExpansion:
    def test_no_query_terms_leak(self, spark):
        from redcap_omop_etl_spark.operators.retrieval import BM25_QUERY_TERMS

        terms = {r["term"] for r in _q("retrieval_prf_expansion")(spark, SF_SMOKE).collect()}
        assert terms.isdisjoint(set(BM25_QUERY_TERMS))
        assert all(len(t) >= 3 for t in terms)


class TestReferentialIntegrity:
    def test_three_relationships_zero_orphans_on_tpch(self, spark):
        rows = {r["relationship"]: r for r in _q("dq_referential_integrity")(spark, SF_SMOKE).collect()}
        assert set(rows) == {"lineitem->orders", "orders->customer", "customer->nation"}
        for r in rows.values():
            assert r["n_orphan"] == 0 and r["n_child"] > 0
