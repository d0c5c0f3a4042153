"""Round-7 second wave: exact span dedup (coverage + removal), DSIR
importance weights, label-outlier audit, LSH recall audit.

Evidence layers:
- BRUTE-FORCE EQUIVALENCE: each operator's result is recomputed
  driver-side in plain Python/numpy at sf0.001 and compared exactly —
  independent of both Spark SQL and the DuckDB oracle.
- INVARIANTS: bounds/consistency properties that must hold on any corpus.
- PLAN PINS: the data-sized window/join keys are high-cardinality, so the
  plans cannot silently regress onto a low-cardinality task ceiling.
"""

from __future__ import annotations

import hashlib
import math
import re

import pytest
from pyspark.sql import functions as F

from redcap_omop_etl_spark import workload
from tests.conftest import SF_SMOKE

W, S = 48, 16


def _q(spark, name):
    return workload.queries()[name](spark, SF_SMOKE)


def _plan(spark, name: str) -> str:
    df = workload.queries()[name](spark, SF_SMOKE)
    return df._jdf.queryExecution().executedPlan().toString()


def _doc_rows(spark):
    return (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "text", "n_chars")
        .collect()
    )


def _windows(rows):
    """(doc_id, off, md5hex) for every stride-S width-W char window."""
    out = []
    for r in rows:
        for off in range(0, r.n_chars - W + 1, S):
            h = hashlib.md5(r.text[off : off + W].encode()).hexdigest()
            out.append((r.doc_id, off, h))
    return out


class TestSpanCoverage:
    def test_matches_bruteforce(self, spark):
        rows = _doc_rows(spark)
        wins = _windows(rows)
        docs_per_h: dict[str, set] = {}
        for d, _, h in wins:
            docs_per_h.setdefault(h, set()).add(d)
        exp: dict[int, list[int]] = {}
        for d, _, h in wins:
            tot_dup = exp.setdefault(d, [0, 0])
            tot_dup[0] += 1
            if len(docs_per_h[h]) >= 2:
                tot_dup[1] += 1
        got = {
            r.doc_id: (r.n_windows, r.n_dup_windows)
            for r in _q(spark, "dedup_span_coverage").collect()
        }
        assert set(got) == set(exp)
        for d, (tot, dup) in exp.items():
            assert got[d] == (tot, dup), f"doc {d}"

    def test_ratio_consistent(self, spark):
        for r in _q(spark, "dedup_span_coverage").collect():
            assert 0 <= r.n_dup_windows <= r.n_windows
            assert r.dup_ratio == pytest.approx(
                round(r.n_dup_windows / r.n_windows, 6), abs=1e-9
            )

    def test_plan_windows_over_hash_key(self, spark):
        # the distinct-doc count partitions by the window hash (data-sized
        # key), never by doc/source — no low-cardinality sort ceiling.
        plan = _plan(spark, "dedup_span_coverage")
        assert re.search(r"hashpartitioning\(h#", plan), plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestSpanRemoval:
    def test_matches_bruteforce(self, spark):
        rows = _doc_rows(spark)
        wins = _windows(rows)
        docs_per_h: dict[str, set] = {}
        for d, _, h in wins:
            docs_per_h.setdefault(h, set()).add(d)
        dup_offs: dict[int, list[int]] = {}
        for d, off, h in wins:
            if len(docs_per_h[h]) >= 2:
                dup_offs.setdefault(d, []).append(off)
        exp = {}
        for d, offs in dup_offs.items():
            offs.sort()
            spans = []
            for off in offs:
                if spans and off <= spans[-1][1]:
                    spans[-1][1] = max(spans[-1][1], off + W)
                else:
                    spans.append([off, off + W])
            exp[d] = (len(spans), sum(e - s for s, e in spans))
        got = {
            r.doc_id: (r.n_dup_spans, r.chars_dup)
            for r in _q(spark, "dedup_span_removal").collect()
        }
        for d, pair in exp.items():
            assert got[d] == pair, f"doc {d}"
        for d, pair in got.items():
            if d not in exp:
                assert pair == (0, 0)

    def test_consistent_with_coverage(self, spark):
        cov = {
            r.doc_id: r.n_dup_windows
            for r in _q(spark, "dedup_span_coverage").collect()
        }
        for r in _q(spark, "dedup_span_removal").collect():
            assert 0 <= r.chars_dup <= r.n_chars
            # a doc has removable chars iff it has >= 1 duplicated window
            # (docs shorter than W never appear in coverage: no windows)
            assert (r.chars_dup > 0) == (cov.get(r.doc_id, 0) > 0)


class TestDsirWeights:
    @staticmethod
    def _bigram_buckets(text: str) -> list[int]:
        toks = re.split(r"\s+", text.strip().lower())
        return [
            int(hashlib.md5(f"{a} {b}".encode()).hexdigest()[:8], 16) % 256
            for a, b in zip(toks, toks[1:])
        ]

    def test_matches_bruteforce(self, spark):
        rows = (
            spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
            .select("doc_id", "lang", "text")
            .collect()
        )
        cr: dict[int, int] = {}
        ct: dict[int, int] = {}
        per_doc: dict[int, list[int]] = {}
        for r in rows:
            bs = self._bigram_buckets(r.text)
            if len(bs) == 0:
                continue
            per_doc[r.doc_id] = bs
            for b in bs:
                cr[b] = cr.get(b, 0) + 1
                if r.lang == "en":
                    ct[b] = ct.get(b, 0) + 1
        nr, nt = sum(cr.values()), sum(ct.values())
        ratio = {
            b: math.floor(
                (1e6 * (ct.get(b, 0) + 1) * (nr + 256)) / ((cr[b] + 1) * (nt + 256))
                + 0.5
            )
            for b in cr
        }
        got = {
            r.doc_id: (r.n_feats, r.score_micro, r.mean_ratio_micro)
            for r in _q(spark, "corpus_dsir_weights").collect()
        }
        assert set(got) == set(per_doc)
        for d, bs in per_doc.items():
            score = sum(ratio[b] for b in bs)
            assert got[d] == (len(bs), score, score // len(bs)), f"doc {d}"

    def test_target_slice_scores_higher(self, spark):
        # the method's point: target-language docs must score more
        # target-like than the rest, on average.
        rows = _q(spark, "corpus_dsir_weights").collect()
        en = [r.mean_ratio_micro for r in rows if r.lang == "en"]
        rest = [r.mean_ratio_micro for r in rows if r.lang != "en"]
        assert sum(en) / len(en) > sum(rest) / len(rest)


class TestLabelOutliers:
    def test_matches_bruteforce(self, spark):
        import numpy as np

        rows = (
            spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
            .select("vec_id", "label", "embedding")
            .collect()
        )
        by_label: dict[int, list] = {}
        for r in rows:
            by_label.setdefault(r.label, []).append(
                (r.vec_id, np.array(r.embedding, dtype="float64"))
            )
        exp = set()
        for lbl, vs in by_label.items():
            c = np.mean([v for _, v in vs], axis=0)
            scored = sorted(
                ((round(float(np.sqrt(((v - c) ** 2).sum())), 4), vid) for vid, v in vs),
                key=lambda t: (-t[0], t[1]),
            )
            for rk, (dist, vid) in enumerate(scored[:3], start=1):
                exp.add((lbl, vid, dist, rk))
        got = {
            (r.label, r.vec_id, r.centroid_dist, r.rk)
            for r in _q(spark, "embedding_label_outliers").collect()
        }
        assert got == exp

    def test_plan_uses_two_phase_topk(self, spark):
        plan = _plan(spark, "embedding_label_outliers")
        assert "__pid" in plan, "keyed_topk two-phase marker missing"
        assert "WindowGroupLimit" in plan


class TestLshRecallAudit:
    def test_scurve_shape(self, spark):
        rows = {r.jbucket: r for r in _q(spark, "dedup_lsh_recall_audit").collect()}
        assert rows, "no shingle-sharing pairs in sample"
        for r in rows.values():
            assert 0 <= r.n_detected <= r.n_true
            assert r.recall_ppm == r.n_detected * 1_000_000 // r.n_true
        if 0 in rows and 9 in rows:
            # near-exact dups must be caught far more often than the
            # barely-overlapping mass (the S-curve's whole point)
            assert rows[9].recall_ppm > rows[0].recall_ppm
            assert rows[9].recall_ppm >= 900_000
            assert rows[0].recall_ppm <= 100_000


class TestSpanSourceMatrix:
    def test_matches_bruteforce(self, spark):
        rows = (
            spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
            .select("doc_id", "source", "text", "n_chars")
            .collect()
        )
        src_per_h: dict[str, set] = {}
        for r in rows:
            for off in range(0, r.n_chars - W + 1, S):
                h = hashlib.md5(r.text[off : off + W].encode()).hexdigest()
                src_per_h.setdefault(h, set()).add(r.source)
        exp: dict[tuple, int] = {}
        for srcs in src_per_h.values():
            ss = sorted(srcs)
            for i in range(len(ss)):
                for j in range(i + 1, len(ss)):
                    exp[(ss[i], ss[j])] = exp.get((ss[i], ss[j]), 0) + 1
        got = {
            (r.src_a, r.src_b): r.shared_spans
            for r in _q(spark, "corpus_span_source_matrix").collect()
        }
        assert got == exp

    def test_pair_orientation(self, spark):
        for r in _q(spark, "corpus_span_source_matrix").collect():
            assert r.src_a < r.src_b
            assert r.shared_spans >= 1


class TestMergeOffsetSpans:
    def test_interval_union_property(self, spark):
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        from redcap_omop_etl_spark.operators.dedup import merge_offset_spans

        @given(
            st.lists(
                st.tuples(st.integers(0, 2), st.integers(0, 20)),
                min_size=1,
                max_size=24,
                unique=True,
            ),
            st.integers(1, 5),
        )
        @settings(
            max_examples=10,
            deadline=None,
            suppress_health_check=[HealthCheck.function_scoped_fixture],
        )
        def prop(key_offs, width):
            rows = [(k, off * 4) for k, off in key_offs]  # stride-ish gaps
            df = spark.createDataFrame(rows, "doc_id long, off long")
            got = {
                (r.doc_id, r.s, r.e)
                for r in merge_offset_spans(df, width).collect()
            }
            exp = set()
            for k in {k for k, _ in rows}:
                offs = sorted(o for kk, o in rows if kk == k)
                spans = []
                for o in offs:
                    if spans and o <= spans[-1][1]:
                        spans[-1][1] = max(spans[-1][1], o + width)
                    else:
                        spans.append([o, o + width])
                exp |= {(k, s, e) for s, e in spans}
            assert got == exp

        prop()


def _md5_bucket(s: str, n: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % n


class TestQualityClassifier:
    def test_matches_bruteforce(self, spark):
        rows = (
            spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
            .select("doc_id", "text")
            .collect()
        )
        exp = {}
        for r in rows:
            w = re.split(r"\s+", r.text.lower().strip())
            feats = list(w) + [f"{a} {b}" for a, b in zip(w, w[1:])]
            milli = sum(
                _md5_bucket(f"w:{_md5_bucket(f, 4096)}", 2001) - 1000 for f in feats
            )
            exp[r.doc_id] = (
                len(feats),
                round(milli / (1000.0 * len(feats)), 6),
                milli > 0,
            )
        got = {
            r.doc_id: (r.n_features, r.score, r.keep)
            for r in _q(spark, "text_quality_classifier").collect()
        }
        assert got == exp


class TestVocabCoverage:
    def test_matches_bruteforce(self, spark):
        from collections import Counter, defaultdict

        rows = (
            spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
            .select("source", "lang", "text")
            .collect()
        )
        cnt = Counter()
        per = defaultdict(list)
        for r in rows:
            toks = re.split(r"\s+", r.text.lower().strip())
            cnt.update(toks)
            per[(r.source, r.lang)].extend(toks)
        vocab = {t for t, _ in sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:2000]}
        exp = {}
        for k, toks in per.items():
            oov = sum(1 for t in toks if t not in vocab)
            exp[k] = (len(toks), oov, round(oov / len(toks), 6))
        got = {
            (r.source, r.lang): (r.n_tokens, r.n_oov, r.oov_rate)
            for r in _q(spark, "corpus_vocab_coverage").collect()
        }
        assert got == exp


class TestSurvivorship:
    def test_matches_bruteforce(self, spark):
        from collections import defaultdict

        rows = (
            spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
            .select("doc_id", "source", "text", "n_chars")
            .collect()
        )
        # shingle sets mirroring shingles()/shingle_sql_cte (partial-gram floor)
        sets = {}
        for r in rows:
            w = re.split(r"\s+", r.text.lower().strip())
            sets[r.doc_id] = {
                " ".join(w[i : i + 3]) for i in range(max(len(w) - 2, 1))
            }
        df_count = Counter = defaultdict(int)
        for s in sets.values():
            for g in s:
                df_count[g] += 1
        hot = {g for g, c in df_count.items() if c > 100}
        sets = {d: s - hot for d, s in sets.items()}
        ids = sorted(sets)
        parent = {d: d for d in ids}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        # invert: shingle -> docs, then pairwise jaccard on candidates only
        by_g = defaultdict(set)
        for d, s in sets.items():
            for g in s:
                by_g[g].add(d)
        cand = {
            tuple(sorted((a, b)))
            for docs in by_g.values()
            for a in docs
            for b in docs
            if a < b
        }
        members = set()
        for a, b in cand:
            i = len(sets[a] & sets[b])
            if i and i / (len(sets[a]) + len(sets[b]) - i) >= 0.6:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
                members |= {a, b}
        comp = defaultdict(set)
        for d in members:
            comp[find(d)].add(d)
        info = {r.doc_id: r for r in rows}
        dropped = set()
        for docs in comp.values():
            keeper = min(docs, key=lambda d: (-info[d].n_chars, d))
            dropped |= docs - {keeper}
        exp = {}
        for r in rows:
            e = exp.setdefault(r.source, [0, 0, 0, 0])
            e[0] += 1
            if r.doc_id in members:
                e[1] += 1
            if r.doc_id in dropped:
                e[2] += 1
                e[3] += r.n_chars
        got = {
            r.source: [r.n_docs, r.n_dup_members, r.n_dropped, r.chars_dropped]
            for r in _q(spark, "dedup_survivorship").collect()
        }
        assert got == {k: list(v) for k, v in exp.items()}

    def test_drop_counts_consistent(self, spark):
        agg = (
            _q(spark, "dedup_survivorship")
            .agg(
                F.sum("n_dup_members").alias("m"),
                F.sum("n_dropped").alias("dr"),
            )
            .collect()[0]
        )
        # every cluster keeps exactly one survivor: dropped < members,
        # and members - dropped = number of clusters >= 1 if any members
        assert agg.dr < agg.m or agg.m == 0


class TestClassifierPlans:
    def test_weight_table_broadcast(self, spark):
        plan = (
            _q(spark, "text_quality_classifier")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan

    def test_vocab_cut_is_takeordered(self, spark):
        plan = (
            _q(spark, "corpus_vocab_coverage")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "TakeOrderedAndProject" in plan


class TestLeakageSafeSplit:
    @staticmethod
    def _brute(rows):
        """Near-dup pairs + union-find + md5 splits, all in plain Python."""
        from collections import defaultdict

        sets = {}
        for r in rows:
            w = re.split(r"\s+", r.text.lower().strip())
            sets[r.doc_id] = {
                " ".join(w[i : i + 3]) for i in range(max(len(w) - 2, 1))
            }
        df_count = defaultdict(int)
        for s in sets.values():
            for g in s:
                df_count[g] += 1
        hot = {g for g, c in df_count.items() if c > 100}
        sets = {d: s - hot for d, s in sets.items()}
        by_g = defaultdict(set)
        for d, s in sets.items():
            for g in s:
                by_g[g].add(d)
        parent = {d: d for d in sets}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        pairs = []
        for a, b in {
            tuple(sorted((a, b)))
            for docs in by_g.values()
            for a in docs
            for b in docs
            if a < b
        }:
            i = len(sets[a] & sets[b])
            if i and i / (len(sets[a]) + len(sets[b]) - i) >= 0.6:
                pairs.append((a, b))
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
        comp = {d: find(d) for d in sets}
        in_cluster = {d for a, b in pairs for d in (a, b)}

        def split_of(key):
            h = _md5_bucket(str(key), 100)
            return "train" if h < 80 else ("val" if h < 90 else "test")

        s_naive = {d: split_of(d) for d in sets}
        s_grp = {
            d: split_of(comp[d] if d in in_cluster else d) for d in sets
        }
        exp = {s: [0, 0, 0, 0] for s in ("train", "val", "test")}
        for d in sets:
            exp[s_grp[d]][0] += 1
            exp[s_naive[d]][1] += 1
        for a, b in pairs:
            if s_naive[a] != s_naive[b]:
                exp[s_naive[a]][2] += 1
                exp[s_naive[b]][2] += 1
            if s_grp[a] != s_grp[b]:
                exp[s_grp[a]][3] += 1
                exp[s_grp[b]][3] += 1
        return exp

    def test_matches_bruteforce_and_invariants(self, spark):
        rows = (
            spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
            .select("doc_id", "text")
            .collect()
        )
        exp = self._brute(rows)
        out = _q(spark, "sampling_leakage_safe_split").collect()
        got = {
            r.split: [
                r.n_docs_grouped,
                r.n_docs_naive,
                r.naive_cross_pairs,
                r.grouped_cross_pairs,
            ]
            for r in out
        }
        assert got == exp
        # invariants: both policies partition the corpus; grouped leaks zero
        assert sum(v[0] for v in got.values()) == len(rows)
        assert sum(v[1] for v in got.values()) == len(rows)
        assert all(v[3] == 0 for v in got.values())


class TestClassifierFastTwin:
    def test_same_features_same_schema(self, spark):
        md5 = {r.doc_id: r for r in _q(spark, "text_quality_classifier").collect()}
        xxh = {r.doc_id: r for r in _q(spark, "text_quality_classifier_fast").collect()}
        assert md5.keys() == xxh.keys()
        # feature extraction is hash-independent: counts must be identical
        assert {d: r.n_features for d, r in md5.items()} == {
            d: r.n_features for d, r in xxh.items()
        }
        # weights live in [-1, 1] milli-units, so every mean score does too,
        # and keep must agree with the score's sign away from the rounding
        # boundary. (No keep-RATE band: the synthetic corpus has a tiny
        # vocabulary, so a handful of common-token weights legitimately
        # push the rate toward an extreme.)
        for fam in (md5, xxh):
            for r in fam.values():
                assert -1.0 <= r.score <= 1.0
                if abs(r.score) > 1e-5:
                    assert r.keep == (r.score > 0)


class TestDsirFastTwin:
    def test_same_features_same_schema(self, spark):
        md5 = {r.doc_id: r for r in _q(spark, "corpus_dsir_weights").collect()}
        xxh = {r.doc_id: r for r in _q(spark, "corpus_dsir_weights_fast").collect()}
        assert md5.keys() == xxh.keys()
        # feature extraction is hash-independent: per-doc bigram counts equal
        assert {d: r.n_feats for d, r in md5.items()} == {
            d: r.n_feats for d, r in xxh.items()
        }
        # smoothed importance ratios are bounded regardless of hash family:
        # global mean of mean-ratios stays near 1e6 (raw includes target)
        for fam in (md5, xxh):
            for r in fam.values():
                assert r.score_micro > 0
                assert r.mean_ratio_micro == r.score_micro // r.n_feats


class TestConversationTurnAudit:
    def test_matches_bruteforce(self, spark):
        from collections import defaultdict

        rows = (
            spark.read.parquet(f"{SF_SMOKE}/events.parquet")
            .select("user_id", "event_id", "ts", "event_type")
            .collect()
        )
        per_user = defaultdict(list)
        for r in rows:
            sec = int(r.ts.timestamp())  # ts is tz-naive UTC in the fixture
            role = "user" if r.event_type in ("click", "view", "signup") else "assistant"
            per_user[r.user_id].append((sec, r.event_id, role))
        exp = {}
        for uid, evs in per_user.items():
            evs.sort()
            sess, prev_sec, prev_role = 0, None, None
            agg = defaultdict(lambda: [0, 0, 0, 0, None, None])  # turns,u,a,viol,min,max
            for sec, _eid, role in evs:
                new = prev_sec is None or sec - prev_sec > 1800
                if new:
                    sess += 1
                a = agg[(uid, sess)]
                a[0] += 1
                a[1 if role == "user" else 2] += 1
                if not new and role == prev_role:
                    a[3] += 1
                a[4] = sec if a[4] is None else min(a[4], sec)
                a[5] = sec if a[5] is None else max(a[5], sec)
                prev_sec, prev_role = sec, role
            for k, a in agg.items():
                exp[k] = (a[0], a[1], a[2], a[3], a[5] - a[4])
        got = {
            (r.user_id, r.session_id): (
                r.n_turns,
                r.n_user_turns,
                r.n_assistant_turns,
                r.n_role_violations,
                r.span_seconds,
            )
            for r in _q(spark, "conversation_turn_audit").collect()
        }
        assert got == exp

    def test_invariants(self, spark):
        for r in _q(spark, "conversation_turn_audit").collect():
            assert r.n_user_turns + r.n_assistant_turns == r.n_turns
            assert 0 <= r.n_role_violations <= r.n_turns - 1
            assert r.span_seconds >= 0
