"""Calibration-normalized bench comparison across driver rounds.

Usage: python tools/calib_compare.py BENCH_r08.json bench_out.json

Absolute walls drift between driver sessions (fresh VM per round; an A/B
re-run of identical code across two round-8 sessions measured 1.3-2.2x
inflation on CPU-bound queries), so raw cross-round totals are not
comparable. ``bench.py`` emits two host-speed probes per run —
``calib.py_sec`` (single-core Python loop) and ``calib.jvm_sec`` (fixed
codegen'd range-aggregate on all cores) — and this tool divides each
shared query's wall by the matching probe ratio before comparing:
JVM-bound queries normalize by jvm_sec, the pure-Python-codec multimodal
queries by py_sec. Output: one JSON line with raw and normalized totals
plus the per-query table for anything >1.5x normalized either way.
"""

from __future__ import annotations

import json
import re
import sys

# queries whose wall is dominated by per-row pure-Python codec work
# (everything else in the headline set is JVM/Arrow-side)
PY_BOUND = {"multimodal_decode_stats", "multimodal_audio_features", "multimodal_image_blocks"}


def load(path: str) -> tuple[dict[str, float], dict[str, float]]:
    raw = open(path).read()
    try:
        d = json.loads(raw)
    except json.JSONDecodeError:
        d = None
    if d is not None and "queries" in d:
        q = {k: v for k, v in d["queries"].items() if isinstance(v, (int, float))}
        return q, d.get("calib") or {}
    # driver BENCH_r{N}.json wrapper: {"n", "rc", "tail", ...} where tail
    # may be a truncated suffix of the JSON line — regex-extract pairs,
    # but ONLY from within the '"queries": {...}' span so numeric wrapper
    # fields present on both sides (n/rc/elapsed/…) can never masquerade
    # as shared queries and skew the normalized totals; fall back to the
    # whole tail only when the queries object's opening brace was itself
    # truncated away, with the denylist as the last guard.
    tail = d["tail"] if d is not None and "tail" in d else raw
    # Prefer a real parse of the tail (it may be a complete JSON line).
    try:
        td = json.loads(tail)
        if isinstance(td, dict) and isinstance(td.get("queries"), dict):
            q = {
                k: float(v)
                for k, v in td["queries"].items()
                if isinstance(v, (int, float))
            }
            return q, td.get("calib") or {}
    except (json.JSONDecodeError, TypeError):
        pass
    qm = re.search(r'"queries"\s*:\s*\{([^}]*)', tail)
    span = qm.group(1) if qm else tail
    q = {
        k: float(v)
        for k, v in re.findall(r'"([a-z0-9_]+)": ([0-9.]+)', span)
        if k not in ("py_sec", "jvm_sec", "sf", "value", "n", "rc", "elapsed")
    }
    m = re.search(r'"calib": \{"py_sec": ([0-9.]+), "jvm_sec": ([0-9.]+)\}', tail)
    calib = {"py_sec": float(m.group(1)), "jvm_sec": float(m.group(2))} if m else {}
    return q, calib


def _segment_probe(calib: dict, queries: dict[str, float], q: str, key: str) -> float:
    """Probe value for query ``q``: the enclosing segment's probe when the
    run carries the round-12 in-run sentinel (``calib["segments"]``), else
    the run-global probe. Query order in the JSON object IS run order
    (bench.py writes timings in execution order)."""
    segs = calib.get("segments")
    if not segs:
        return calib[key]
    idx = list(queries).index(q)
    val = calib[key]
    for s in segs:
        if s["at"] <= idx:
            val = s[key]
    return val


def _contended_queries(calib: dict, queries: dict[str, float]) -> set[str]:
    """Queries inside segments whose py probe drifted >1.3x above the run's
    fastest segment — the machine-detectable contamination BENCH_r11 had."""
    segs = calib.get("segments")
    if not segs:
        return set()
    floor = min(s["py_sec"] for s in segs)
    bad_starts = [s["at"] for s in segs if s["py_sec"] > 1.3 * floor]
    names = list(queries)
    out: set[str] = set()
    for i, q in enumerate(names):
        seg_at = max((s["at"] for s in segs if s["at"] <= i), default=0)
        if seg_at in bad_starts:
            out.add(q)
    return out


def main() -> None:
    (qa, ca), (qb, cb) = load(sys.argv[1]), load(sys.argv[2])
    shared = sorted(set(qa) & set(qb))
    if not (ca and cb):
        print(json.dumps({"error": "calib probes missing on one side", "shared": len(shared)}))
        return
    contended = _contended_queries(ca, qa) | _contended_queries(cb, qb)
    rows = {}
    tot_a = tot_b = tot_bn = 0.0
    for q in shared:
        key = "py_sec" if q in PY_BOUND else "jvm_sec"
        r = _segment_probe(cb, qb, q, key) / _segment_probe(ca, qa, q, key)
        bn = qb[q] / r
        if q not in contended:
            tot_a += qa[q]
            tot_b += qb[q]
            tot_bn += bn
        ratio = bn / qa[q] if qa[q] else float("inf")
        rows[q] = {"a": qa[q], "b": qb[q], "b_norm": round(bn, 3), "ratio_norm": round(ratio, 2)}
    flagged = {
        q: r
        for q, r in rows.items()
        if (r["ratio_norm"] > 1.5 or r["ratio_norm"] < 1 / 1.5) and q not in contended
    }
    print(
        json.dumps(
            {
                "metric": "calib_compare",
                "shared_queries": len(shared),
                "calib_ratio_jvm": round(cb["jvm_sec"] / ca["jvm_sec"], 3),
                "calib_ratio_py": round(cb["py_sec"] / ca["py_sec"], 3),
                "contended_excluded": sorted(contended & set(shared)),
                "total_a": round(tot_a, 1),
                "total_b_raw": round(tot_b, 1),
                "total_b_normalized": round(tot_bn, 1),
                "normalized_vs_a": round(tot_bn / tot_a, 3) if tot_a else None,
                "flagged_over_1p5x_normalized": flagged,
            }
        )
    )


if __name__ == "__main__":
    main()
