"""Round-7 additions: scale-safe keyed window primitives and the
rewrites built on them.

Two layers of evidence per VERDICT r6 item 1:
- EQUIVALENCE: each primitive is bit-identical to the naive
  ``Window.partitionBy(key)`` formulation it replaces (the oracle SQL
  stayed the naive form, so the driver cross-checks this too).
- PLAN PINS: the data-sized sort is partitioned by ``(__pid, key)`` —
  never by the low-cardinality key alone — so the rewrites cannot
  silently regress back to the 20-task ceiling.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from redcap_omop_etl_spark import workload
from redcap_omop_etl_spark.operators.scalable_windows import (
    keyed_ntile,
    keyed_running_sum,
    keyed_topk,
    with_keyed_index,
)
from tests.conftest import SF_SMOKE


def _docs(spark):
    return (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "source", "n_chars")
    )


def _sym_diff(a, b) -> int:
    return a.exceptAll(b).count() + b.exceptAll(a).count()


def _plan(spark, name: str) -> str:
    df = workload.queries()[name](spark, SF_SMOKE)
    return df._jdf.queryExecution().executedPlan().toString()


class TestKeyedPrimitivesEquivalence:
    def test_keyed_index_matches_row_number(self, spark):
        d = _docs(spark)
        w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
        ref = d.select("doc_id", (F.row_number().over(w) - 1).alias("i"))
        got = with_keyed_index(d, ["source"], ["n_chars", "doc_id"], "i").select(
            "doc_id", "i"
        )
        assert _sym_diff(ref, got) == 0

    def test_keyed_index_multi_key_desc_order(self, spark):
        d = _docs(spark).withColumn("b", (F.col("doc_id") % 3).cast("int"))
        w = Window.partitionBy("source", "b").orderBy(F.desc("n_chars"), "doc_id")
        ref = d.select("doc_id", (F.row_number().over(w) - 1).alias("i"))
        got = with_keyed_index(
            d, ["source", "b"], [F.desc("n_chars"), "doc_id"], "i"
        ).select("doc_id", "i")
        assert _sym_diff(ref, got) == 0

    def test_keyed_ntile_matches_ntile(self, spark):
        d = _docs(spark)
        for n in (3, 10, 20):
            w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
            ref = d.select("doc_id", F.ntile(n).over(w).cast("bigint").alias("t"))
            got = keyed_ntile(d, ["source"], ["n_chars", "doc_id"], n, "t").select(
                "doc_id", "t"
            )
            assert _sym_diff(ref, got) == 0, f"ntile({n}) mismatch"

    def test_keyed_ntile_fewer_rows_than_tiles(self, spark):
        # t < n exercises the q=0 branch (every row its own tile) — the
        # ANSI-guarded division path.
        d = spark.createDataFrame(
            [(i, "k" + str(i % 2)) for i in range(5)], "id long, k string"
        )
        w = Window.partitionBy("k").orderBy("id")
        ref = d.select("id", F.ntile(10).over(w).cast("bigint").alias("t"))
        got = keyed_ntile(d, ["k"], ["id"], 10, "t").select("id", "t")
        assert _sym_diff(ref, got) == 0

    def test_keyed_running_sum_exclusive_and_inclusive(self, spark):
        d = _docs(spark)
        w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
        for inclusive, end in ((False, -1), (True, 0)):
            wf = w.rowsBetween(Window.unboundedPreceding, end)
            ref = d.select(
                "doc_id", F.coalesce(F.sum("n_chars").over(wf), F.lit(0)).alias("s")
            )
            got = keyed_running_sum(
                d, ["source"], ["n_chars", "doc_id"], "n_chars", "s", inclusive=inclusive
            ).select("doc_id", "s")
            assert _sym_diff(ref, got) == 0

    def test_keyed_topk_matches_rank_filter(self, spark):
        d = _docs(spark)
        w = Window.partitionBy("source").orderBy(F.desc("n_chars"), "doc_id")
        ref = (
            d.select("doc_id", F.row_number().over(w).alias("r"))
            .filter(F.col("r") <= 7)
        )
        got = keyed_topk(
            d, ["source"], [F.desc("n_chars"), "doc_id"], 7, "r"
        ).select("doc_id", "r")
        assert _sym_diff(ref, got) == 0

    def test_keyed_topk_key_smaller_than_k(self, spark):
        d = spark.createDataFrame(
            [(i, "only") for i in range(4)], "id long, k string"
        )
        got = keyed_topk(d, ["k"], ["id"], 10, "r")
        assert got.count() == 4
        assert [r.r for r in got.orderBy("id").collect()] == [1, 2, 3, 4]


# (query, low-cardinality key col, data order col that the OLD plan
# sorted under the bare key). The negative pin asserts that window spec
# no longer exists; the positive pin asserts a (__pid, key)-partitioned
# window does.
_KEYED_REWRITES = [
    ("curation_quantile_normalize", "source", "n_chars"),
    ("curation_curriculum_order", "source", "n_chars"),
    ("corpus_pipeline_full", "source", "keep_id"),
    ("chunk_prep_pipeline", "source", "chunk_hash"),
    ("sequence_packing", "pack_group", "doc_id"),
    ("corpus_token_budget_cut", "source", "n_chars"),
]


class TestKeyedWindowPlanPins:
    @pytest.mark.parametrize("name,key,datacol", _KEYED_REWRITES)
    def test_data_sort_partitioned_by_pid_not_bare_key(self, spark, name, key, datacol):
        plan = _plan(spark, name)
        assert re.search(r"windowspecdefinition\(__pid#\d+", plan), (
            f"{name}: expected a (__pid, {key})-partitioned data window"
        )
        assert not re.search(
            rf"windowspecdefinition\({key}#\d+L?, {datacol}#", plan
        ), (
            f"{name}: found a data-sized window partitioned by bare "
            f"'{key}' — the {key}-cardinality task ceiling is back"
        )

    def test_curriculum_second_rank_also_two_phase(self, spark):
        plan = _plan(spark, "curation_curriculum_order")
        # the per-(source, decile) shard rank must not be a bare keyed window
        assert not re.search(
            r"windowspecdefinition\(source#\d+, decile#\d+L?, doc_id#", plan
        )

    def test_source_caps_no_corpus_shuffle_topk(self, spark):
        plan = _plan(spark, "corpus_source_caps")
        # phase 1: local top-k inside existing partitions
        assert re.search(r"windowspecdefinition\(__pid#\d+", plan)
        assert "__lrk" in plan
        # the old corpus-wide bare-source rank fed the agg directly; now
        # any bare-source window runs over the __lrk<=k candidate frame
        # only (bounded by #partitions × k) — pin that the filter exists.
        assert re.search(r"__lrk#\d+ <= 10", plan)

    def test_pareto_windows_over_aggregate_not_corpus(self, spark):
        plan = _plan(spark, "curation_pareto_frontier")
        # old shape: RANGE-framed running max over the raw corpus
        assert "RangeFrame" not in plan
        # new shape: corpus collapses through (source, q_int, n_chars)
        # and (source, q_int) hash aggregates (max_by carries the count
        # at the max) BEFORE the only window
        assert "max_by" in plan
        assert len(re.findall(r"windowspecdefinition\(", plan)) == 1
        assert re.search(
            r"HashAggregate\(keys=\[source#\d+, q_int#\d+L?, n_chars#\d+L?\]", plan
        )


class TestKeyedPrimitiveLaziness:
    def test_plan_construction_runs_no_job(self, spark):
        # Mirrors test_global_index_is_lazy: building the plan must not
        # trigger a corpus job (an eager count here would make every
        # plan-inspection tool pay a full evaluation).
        d = _docs(spark)  # the parquet read itself may run listing jobs
        tracker = spark.sparkContext.statusTracker()
        before = tracker.getJobIdsForGroup(None)
        a = with_keyed_index(d, ["source"], ["n_chars", "doc_id"])
        b = keyed_running_sum(d, ["source"], ["doc_id"], "n_chars")
        _ = a.schema, b.schema  # analysis only
        after = tracker.getJobIdsForGroup(None)
        assert len(after) == len(before)


class TestMediaCodecs:
    """Round-7 un-stubbing: the pure-Python BMP/WAV codecs must survive
    round-trips, container quirks (padding, bottom-up rows, chunk order,
    top-down negative height), and reject what they can't parse."""

    @pytest.fixture(scope="class")
    def codecs(self):
        from redcap_omop_etl_spark.operators.multimodal import _media_codecs

        return _media_codecs()

    def test_bmp_roundtrip_with_padding(self, codecs):
        import numpy as np

        encode_bmp, decode_bmp, _, _ = codecs
        # width 3 -> row = 9 bytes -> 3 pad bytes per row: padding exercised
        logical = bytes(range(3 * 2 * 3))
        data = encode_bmp(3, 2, logical)
        w, h, out = decode_bmp(data)
        assert (w, h, out) == (3, 2, logical)
        # file row order must actually be bottom-up: the first stored row
        # is the LAST logical row
        assert data[54 : 54 + 9] == logical[9:18]

    def test_bmp_top_down_negative_height(self, codecs):
        import struct

        encode_bmp, decode_bmp, _, _ = codecs
        logical = bytes(range(3 * 2 * 3))
        data = bytearray(encode_bmp(3, 2, logical))
        # rewrite height to -2 (top-down) and swap stored row order
        struct.pack_into("<i", data, 22, -2)
        row = data[54:66]
        data[54:66] = data[66:78]
        data[66:78] = row
        w, h, out = decode_bmp(bytes(data))
        assert (w, h, out) == (3, 2, logical)

    def test_bmp_rejects_garbage_and_truncation(self, codecs):
        _, decode_bmp, _, _ = codecs
        encode_bmp = codecs[0]
        with pytest.raises(ValueError):
            decode_bmp(b"notabmp" * 10)
        good = encode_bmp(4, 4, bytes(48))
        with pytest.raises(ValueError):
            decode_bmp(good[:-5])

    def test_wav_roundtrip_and_chunk_order(self, codecs):
        import struct

        import numpy as np

        _, _, encode_wav, decode_wav = codecs
        samples = np.array([0, 1, -1, 32767, -32768, 12345], dtype=np.int16)
        data = encode_wav(samples)
        assert (decode_wav(data) == samples).all()
        # insert a foreign odd-length chunk before fmt/data: the walker
        # must skip it (with its pad byte) and still find both
        extra = struct.pack("<4sI", b"LIST", 3) + b"abc\x00"
        reordered = data[:12] + extra + data[12:]
        riff_sz = len(reordered) - 8
        reordered = reordered[:4] + struct.pack("<I", riff_sz) + reordered[8:]
        assert (decode_wav(reordered) == samples).all()

    def test_wav_rejects_non_pcm16(self, codecs):
        import struct

        _, _, encode_wav, decode_wav = codecs
        import numpy as np

        data = bytearray(encode_wav(np.array([1, 2], dtype=np.int16)))
        struct.pack_into("<H", data, 34, 8)  # bits-per-sample -> 8
        with pytest.raises(ValueError):
            decode_wav(bytes(data))

    def test_resize_media_nearest_neighbor(self, spark):
        import numpy as np

        from redcap_omop_etl_spark.operators.multimodal import (
            _media_codecs,
            resize_media,
        )

        encode_bmp, decode_bmp, _, _ = _media_codecs()
        # 2x2 image: distinct corner colors
        px = np.array(
            [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [9, 9, 9]]], dtype=np.uint8
        )
        media = spark.createDataFrame(
            [(1, (bytearray(encode_bmp(2, 2, px.tobytes())), "image/bmp", 2, 2, 1))],
            "doc_id long, media struct<payload:binary,media_type:string,"
            "width:int,height:int,n_frames:int>",
        )
        out = resize_media(media, 4, 4).collect()[0]
        w, h, logical = decode_bmp(bytes(out.payload))
        big = np.frombuffer(logical, dtype=np.uint8).reshape(4, 4, 3)
        # nearest-neighbor 2x upscale: each source pixel becomes a 2x2 block
        for y in range(4):
            for x in range(4):
                assert (big[y, x] == px[y // 2, x // 2]).all()

    def test_decode_stats_executes_on_plain_session(self, spark):
        from redcap_omop_etl_spark import workload

        rows = workload.queries()["multimodal_decode_stats"](
            spark, SF_SMOKE
        ).limit(5).collect()
        assert len(rows) == 5
        assert all(r.px_sum > 0 and r.n_samples >= 64 for r in rows)


class TestKeyedExchangeReuse:
    def test_ranged_frame_materialized_once_structurally(self, spark):
        # Round-8 hardening (ADVICE r7): pid consistency between the
        # offsets-summary branch and the data branch must be STRUCTURAL,
        # not pinned on Spark's non-contractual exchange reuse. The ranged
        # frame (with __pid attached) is persisted, so both branches scan
        # ONE InMemoryRelation whose RangePartitioner boundaries were
        # sampled exactly once — pin that both consumers are cache scans
        # and the corpus is range-shuffled once, not once per branch.
        d = _docs(spark)
        df = keyed_running_sum(d, ["source"], ["doc_id"], "n_chars", "ps")
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        # both branches read the cache, and __pid is computed INSIDE the
        # cached relation (so it cannot differ between consumers)
        assert plan.count("InMemoryTableScan") >= 2
        assert re.search(r"InMemoryTableScan \[[^\]]*__pid", plan)
        # no range exchange OUTSIDE the cached plan: every occurrence sits
        # under an InMemoryRelation printout, so stripping those removes
        # them all
        outside = re.split(r"InMemoryRelation", plan)[0]
        assert "rangepartitioning" not in outside

    def test_keyed_running_sum_matches_plain_window(self, spark):
        # Value-level equivalence against the single-task reference plan,
        # re-pinned after the structural-persist change.
        from pyspark.sql.window import Window as W

        d = _docs(spark)
        got = keyed_running_sum(d, ["source"], ["doc_id"], "n_chars", "ps")
        ref = d.withColumn(
            "ps",
            F.coalesce(
                F.sum("n_chars").over(
                    W.partitionBy("source")
                    .orderBy("doc_id")
                    .rowsBetween(W.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        g = {(r.doc_id): r.ps for r in got.select("doc_id", "ps").collect()}
        r = {(r.doc_id): r.ps for r in ref.select("doc_id", "ps").collect()}
        assert g == r
