"""Bit-exactness of the DuckDB XXH64 replay (functions/xxh_sql.py) vs
Spark's codegen'd ``xxhash64`` — the kernel under every ``_fast``-twin
value oracle, so it gets the adversarial treatment: every byte length
through both stripe boundaries, multibyte UTF-8, and corpus shingles."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from redcap_omop_etl_spark.functions.xxh_sql import xxh64_pmod, xxh64_sql_cte


def _spark_vs_duck(spark, cases: list[str]) -> tuple[dict, dict]:
    sdf = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], "k int, s string"
    )
    truth = {
        r["k"]: r["h"] for r in sdf.select("k", F.xxhash64("s").alias("h")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE inp(k INT, s VARCHAR)")
    con.executemany(
        "INSERT INTO inp VALUES (?, ?)", [(i, c) for i, c in enumerate(cases)]
    )
    sql = (
        f"WITH {xxh64_sql_cte('inp', col='s', keys=('k',))} "
        f"SELECT k, h64 FROM __xxh ORDER BY k"
    )
    got = dict(con.execute(sql).fetchall())
    return truth, got


class TestXxh64Replay:
    def test_every_length_through_stripe_boundaries(self, spark):
        # lengths 0..70 cover: empty, byte tail only, 4-byte chunk,
        # 1-3 tail words, exactly 31/32/33 (stripe entry), 63/64/65
        # (second stripe), plus tails after stripes
        base = "the quick brown fox jumps over the lazy dog 0123456789 abcdefghijklmn"
        cases = [base[:n] for n in range(0, 71)]
        truth, got = _spark_vs_duck(spark, cases)
        assert truth == got

    def test_multibyte_utf8(self, spark):
        cases = [
            "café",
            "é" * 20,
            "中文文本" * 9,
            "naïve mix ü" * 7,
            "\U0001f600 emoji \U0001f680" * 3,
            "aéb中\U0001f600",  # 1-, 2-, 3-, 4-byte code points mixed
        ]
        truth, got = _spark_vs_duck(spark, cases)
        assert truth == got

    def test_corpus_shingles_roundtrip(self, spark, sf_dir):
        # real shingle strings from the smoke corpus — the actual oracle input
        from redcap_omop_etl_spark.operators.dedup import shingles
        from redcap_omop_etl_spark.sources.readers import Catalog

        docs = Catalog(spark, sf_dir)["documents"]
        sample = (
            docs.select(F.explode(shingles(F.col("text"), 3)).alias("s"))
            .distinct()
            .limit(300)
            .collect()
        )
        cases = [r["s"] for r in sample]
        assert len(cases) > 50
        truth, got = _spark_vs_duck(spark, cases)
        assert truth == got

    def test_pmod_matches_spark_pmod(self, spark):
        cases = ["alpha", "beta gamma", "x" * 40, ""]
        sdf = spark.createDataFrame(
            [(i, c) for i, c in enumerate(cases)], "k int, s string"
        )
        truth = {
            r["k"]: r["p"]
            for r in sdf.select(
                "k", F.pmod(F.xxhash64("s"), F.lit(2001)).alias("p")
            ).collect()
        }
        con = duckdb.connect()
        con.execute("CREATE TABLE inp(k INT, s VARCHAR)")
        con.executemany(
            "INSERT INTO inp VALUES (?, ?)", [(i, c) for i, c in enumerate(cases)]
        )
        got = dict(
            con.execute(
                f"WITH {xxh64_sql_cte('inp', col='s', keys=('k',))} "
                f"SELECT k, {xxh64_pmod(2001)} FROM __xxh ORDER BY k"
            ).fetchall()
        )
        assert truth == got

    def test_two_prefixed_instances_compose(self, spark):
        # the quality-classifier oracle splices two chains in one WITH
        con = duckdb.connect()
        con.execute("CREATE TABLE a(s VARCHAR); INSERT INTO a VALUES ('foo')")
        con.execute("CREATE TABLE b(s VARCHAR); INSERT INTO b VALUES ('bar')")
        sql = (
            f"WITH {xxh64_sql_cte('a', col='s', prefix='__p')}, "
            f"{xxh64_sql_cte('b', col='s', prefix='__q')} "
            f"SELECT (SELECT h64 FROM __pxh) AS ha, (SELECT h64 FROM __qxh) AS hb"
        )
        ha, hb = con.execute(sql).fetchone()
        sdf = spark.createDataFrame([("foo", "bar")], "x string, y string")
        row = sdf.select(F.xxhash64("x").alias("a"), F.xxhash64("y").alias("b")).first()
        assert (ha, hb) == (row["a"], row["b"])
