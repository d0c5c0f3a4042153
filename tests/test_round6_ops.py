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
