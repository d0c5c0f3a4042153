"""Tests for the corpus-analysis operators added in round 3: the
portable cross-engine hash, Gopher repetition stats, corpus-global
boilerplate marking, and the explode+agg SimHash fingerprint."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from redcap_omop_etl_spark.operators import dedup, textstats


class TestPortableHash:
    def test_matches_duckdb_bit_for_bit(self, spark):
        """The entire oracle story for minhash/simhash rests on this
        equality, so pin it directly on awkward inputs."""
        vals = ["", "a", "hello world", "tok250", "ünïcøde ✓", "a b c", "0", " "]
        sdf = spark.createDataFrame([(v,) for v in vals], "s string").select(
            "s", dedup.portable_hash60(F.col("s")).alias("h")
        )
        got = {r.s: r.h for r in sdf.collect()}
        con = duckdb.connect()
        for v in vals:
            (expect,) = con.execute(
                "SELECT ('0x' || substring(md5(?), 1, 15))::BIGINT", [v]
            ).fetchone()
            assert got[v] == expect, v
            assert 0 <= got[v] < (1 << 60)


class TestGramsWithRepeats:
    @pytest.mark.parametrize(
        "text,n,expect",
        [
            ("a b c d", 2, ["a b", "b c", "c d"]),
            ("a b c d", 3, ["a b c", "b c d"]),
            ("a a a", 2, ["a a", "a a"]),  # repeats preserved
            ("a b", 3, []),  # short doc -> empty, no partial gram
            ("a", 1, ["a"]),
        ],
    )
    def test_gram_generation(self, spark, text, n, expect):
        row = (
            spark.range(1)
            .select(textstats.grams_with_repeats(F.split(F.lit(text), " "), n).alias("g"))
            .first()
        )
        assert row.g == expect


class TestRepetitionStats:
    def test_repetitive_doc_flagged(self, spark):
        rows = [
            (1, "spam ham " * 30),  # one 2-gram dominates
            (2, " ".join(f"w{i}" for i in range(60))),  # all distinct
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        # registered query reads from disk; exercise the same expressions
        # via a local clone of its plan
        toks = textstats.ws_tokens(F.col("text"))
        out = {}
        for n, agg in ((2, [F.max("c").alias("mx"), F.sum("c").alias("tot")]),):
            stats = (
                df.select("doc_id", F.explode(textstats.grams_with_repeats(toks, n)).alias("g"))
                .groupBy("doc_id", "g")
                .agg(F.count(F.lit(1)).alias("c"))
                .groupBy("doc_id")
                .agg(*agg)
                .collect()
            )
            out = {r.doc_id: r.mx / r.tot for r in stats}
        assert out[1] > 0.4  # "ham spam"/"spam ham" dominate
        assert out[2] < 0.05

    def test_registered_query_runs_and_gates(self, spark, sf_dir):
        res = textstats.text_repetition_stats(spark, sf_dir).collect()
        assert res
        for r in res:
            assert 0.0 <= r.top2gram_share <= 1.0
            assert 0.0 <= r.dup3gram_frac <= 1.0
            assert r.rep_keep in (0, 1)


class TestBoilerplate:
    def test_hot_grams_marked(self, spark):
        # 6 docs share an identical 3-gram run ("common boiler plate");
        # df_min=5 marks it hot, the unique docs stay clean
        shared = "common boiler plate "
        rows = [(i, shared + f"unique{i} filler{i} words{i}") for i in range(6)]
        rows.append((99, "totally distinct content here nothing shared"))
        df = spark.createDataFrame(rows, "doc_id long, text string")
        toks = textstats.ws_tokens(F.col("text"))
        occ = df.select("doc_id", F.explode(textstats.grams_with_repeats(toks, 3)).alias("g"))
        dfreq = occ.select("doc_id", "g").distinct().groupBy("g").agg(F.count(F.lit(1)).alias("df"))
        hot = {r.g for r in dfreq.filter(F.col("df") >= 5).collect()}
        assert "common boiler plate" in hot
        assert not any("unique" in g or "distinct" in g for g in hot)

    def test_registered_query_fraction_bounds(self, spark, sf_dir):
        res = textstats.text_boilerplate_ngrams(spark, sf_dir).collect()
        assert res
        for r in res:
            assert 0 <= r.n_hot <= r.n_grams
            assert abs(r.hot_frac - round(r.n_hot / r.n_grams, 6)) < 1e-9


class TestSimhashFingerprints:
    def test_matches_pure_python(self, spark):
        """Explode+agg fingerprint == the definition computed in Python
        over the same portable hashes."""
        rows = [(1, "the quick brown fox"), (2, "pack my box with five dozen jugs")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r.doc: r.fp for r in dedup.simhash_fingerprints(df).collect()}

        import hashlib

        def ph60(s: str) -> int:
            return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

        for doc_id, text in rows:
            toks = text.lower().split()
            votes = [0] * 60
            for t in toks:
                h = ph60(t)
                for b in range(60):
                    votes[b] += 1 if (h >> b) & 1 else -1
            fp = sum(1 << b for b in range(60) if votes[b] > 0)
            assert got[doc_id] == fp


class TestPandasOps:
    def test_cogrouped_allocation_equals_declarative(self, spark, sf_dir):
        from redcap_omop_etl_spark.operators import pandas_ops
        from redcap_omop_etl_spark.sources.readers import Catalog

        c = Catalog(spark, sf_dir)
        decl = pandas_ops.penny_allocation(c["orders"], c["lineitem"])
        cog = pandas_ops.penny_allocation_cogrouped(c["orders"], c["lineitem"])
        key = lambda df: {(r.l_orderkey, r.l_linenumber): r.alloc_cents for r in df.collect()}
        assert key(decl) == key(cog)

    def test_allocation_sum_preserving(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from redcap_omop_etl_spark.operators import pandas_ops
        from redcap_omop_etl_spark.sources.readers import Catalog

        c = Catalog(spark, sf_dir)
        alloc = pandas_ops.penny_allocation(c["orders"], c["lineitem"])
        per_order = alloc.groupBy("l_orderkey").agg(F.sum("alloc_cents").alias("cents"))
        joined = per_order.join(
            c["orders"].select("o_orderkey", "o_totalprice"),
            per_order.l_orderkey == F.col("o_orderkey"),
        )
        bad = joined.filter(
            F.col("cents") != F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
        ).count()
        assert bad == 0

    def test_ewma_recursion_manual(self, spark):
        import datetime

        from redcap_omop_etl_spark.operators import pandas_ops

        base = datetime.datetime(2024, 1, 1)
        rows = [
            (i, base + datetime.timedelta(minutes=i), 7, float(v))
            for i, v in enumerate([10.0, 20.0, 10.0, 0.0])
        ]
        df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long, value double")
        got = {r.seq: r.ewma for r in pandas_ops.ewma_per_user(df).collect()}
        y = [10.0]
        for v in [20.0, 10.0, 0.0]:
            y.append(y[-1] * 0.7 + v * 0.3)
        assert got == {i + 1: round(v, 6) for i, v in enumerate(y)}


class TestChunkWindows:
    """Pin the overlapping token-window chunking semantics: stride-48
    windows of up to 64 tokens, full coverage, 16-token overlap."""

    def test_chunk_grid_and_lengths(self, spark):
        text = " ".join(f"t{i}" for i in range(100))
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        df.write.mode("overwrite").parquet("/tmp/chunk_test/documents.parquet")
        from redcap_omop_etl_spark.operators.textstats import text_chunk_windows

        rows = sorted(
            text_chunk_windows(spark, "/tmp/chunk_test").collect(),
            key=lambda r: r.chunk_id,
        )
        # starts 0, 48, 96 -> lengths 64, 52, 4
        assert [(r.chunk_id, r.n_chunk_tokens) for r in rows] == [(0, 64), (1, 52), (2, 4)]
        # chunk hash is content-addressed: chunk 0 hashes tokens [0, 64)
        import hashlib

        expect = hashlib.md5(" ".join(f"t{i}" for i in range(64)).encode()).hexdigest()
        assert rows[0].chunk_hash == expect

    def test_single_token_doc(self, spark):
        df = spark.createDataFrame([(1, "solo")], "doc_id long, text string")
        df.write.mode("overwrite").parquet("/tmp/chunk_test1/documents.parquet")
        from redcap_omop_etl_spark.operators.textstats import text_chunk_windows

        rows = text_chunk_windows(spark, "/tmp/chunk_test1").collect()
        assert len(rows) == 1 and rows[0].n_chunk_tokens == 1

    def test_chunk_level_dedup_counts(self, spark):
        rows = [
            (1, "alpha beta gamma delta", "A"),
            (2, "alpha beta gamma delta", "A"),  # exact chunk twin of doc 1
            (3, "epsilon zeta eta theta", "B"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string, source string")
        df.write.mode("overwrite").parquet("/tmp/chunk_test2/documents.parquet")
        from redcap_omop_etl_spark.operators.textstats import dedup_chunk_level

        got = {
            r.source: (r.n_chunks, r.n_dup_chunks, r.dup_ppm)
            for r in dedup_chunk_level(spark, "/tmp/chunk_test2").collect()
        }
        assert got == {"A": (2, 2, 1000000), "B": (1, 0, 0)}


class TestCollocationPmi:
    def test_matches_python_bruteforce(self, spark):
        import math
        import re
        from collections import Counter

        from redcap_omop_etl_spark.sources.readers import Catalog
        from tests.conftest import SF_SMOKE
        from redcap_omop_etl_spark import workload

        got = workload.queries()["text_collocation_pmi"](spark, SF_SMOKE).collect()
        assert len(got) == 20

        docs = Catalog(spark, SF_SMOKE)["documents"].select("text").collect()
        c2, c1, cr = Counter(), Counter(), Counter()
        nb = 0
        for r in docs:
            w = re.split(r"\s+", r.text.strip().lower())
            for a, b in zip(w, w[1:]):
                c2[(a, b)] += 1
                c1[a] += 1
                cr[b] += 1
                nb += 1
        scored = [
            (math.log(n * nb / (c1[a] * cr[b])), a, b, n)
            for (a, b), n in c2.items()
            if n >= 5
        ]
        top = sorted(scored, key=lambda t: (-t[0], t[1], t[2]))[:20]
        for (pmi, a, b, n), g in zip(top, got):
            assert (g.w1, g.w2, g.n) == (a, b, n)
            assert abs(g.pmi - round(pmi, 6)) < 1e-9

    def test_short_docs_excluded_identically(self, spark):
        # one-token docs contribute no bigram (the sequence(1, 0) guard)
        rows = [(1, "solo", "A"), (2, "a b a b a b a b a b", "A")]
        df = spark.createDataFrame(rows, "doc_id long, text string, source string")
        df.write.mode("overwrite").parquet("/tmp/pmi_test1/documents.parquet")
        from redcap_omop_etl_spark.operators.textstats import text_collocation_pmi

        got = {(r.w1, r.w2): r.n for r in text_collocation_pmi(spark, "/tmp/pmi_test1").collect()}
        assert got == {("a", "b"): 5}  # "b a" occurs only 4x — under the floor
