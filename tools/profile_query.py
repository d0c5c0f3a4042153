"""Profiling harness: run one or more registered queries with Spark event
logging enabled and report per-job / per-stage wall breakdown, so bench
walls can be attributed to stages (shuffle-heavy? job-count-heavy?
single long stage?) without the live UI.

Usage:
    python tools/profile_query.py <query> [query ...]     # sf0.1 default
    SPARK_GRAFT_SF_DIR=... python tools/profile_query.py <query>

Protocol mirrors bench.py (warm pass, cache reset, timed noop write) so
numbers are comparable. Event logs land in a temp dir and are parsed
after each timed run; per-stage rows show wall, task count, shuffle
read/write bytes and the first line of the stage's callsite.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from redcap_omop_etl_spark import workload
from redcap_omop_etl_spark.caching import clear_session_memos, unpersist_operator_caches
from redcap_omop_etl_spark.session import build_session


def parse_eventlog(path: str) -> dict:
    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}
    with open(path) as fh:
        for line in fh:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jobs[ev["Job ID"]] = {
                    "t0": ev["Submission Time"],
                    "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
                    "desc": (ev.get("Properties") or {}).get(
                        "spark.job.description", ""
                    ),
                }
            elif e == "SparkListenerJobEnd":
                if ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]]["t1"] = ev["Completion Time"]
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                if "Submission Time" not in si:
                    continue
                stages[si["Stage ID"]] = {
                    "wall": (si["Completion Time"] - si["Submission Time"]) / 1e3,
                    "tasks": si["Number of Tasks"],
                    "name": si["Stage Name"].split("\n")[0],
                    "sr": sum(
                        a["Value"]
                        for a in si.get("Accumulables", [])
                        if a.get("Name") == "internal.metrics.shuffle.read.remoteBytesRead"
                    ),
                    "sw": sum(
                        a["Value"]
                        for a in si.get("Accumulables", [])
                        if a.get("Name") == "internal.metrics.shuffle.write.bytesWritten"
                    ),
                }
    return {"jobs": jobs, "stages": stages}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    evdir = tempfile.mkdtemp(prefix="spark-events-")
    spark = build_session(
        "profile",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    qs = workload.queries()
    names = [n for n in sys.argv[1:] if n in qs]
    unknown = [n for n in sys.argv[1:] if n not in qs]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
    for name in names:
        unpersist_operator_caches()
        clear_session_memos()
        spark.catalog.clearCache()
        try:
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as exc:  # noqa: BLE001
            print(f"warm {name} failed: {exc}", file=sys.stderr)
        # honest protocol (bench.py round-13): reset again between warm and
        # timed so memo/cache builds are paid inside the timed window
        unpersist_operator_caches()
        clear_session_memos()
        spark.catalog.clearCache()
        # mark the timed window in the event stream with a sentinel job
        spark.sparkContext.setJobDescription(f"__mark__{name}")
        spark.range(1).write.format("noop").mode("overwrite").save()
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
        print(f"\n=== {name}: {wall:.3f}s ===")
    # flush the event log by stopping the session, then parse
    app_id = spark.sparkContext.applicationId
    spark.stop()
    log = os.path.join(evdir, app_id)
    if not os.path.exists(log) or os.path.isdir(log):
        cands = [
            os.path.join(evdir, f)
            for f in os.listdir(evdir)
            if os.path.isfile(os.path.join(evdir, f))
        ]
        log = max(cands, key=os.path.getmtime)
    data = parse_eventlog(log)
    jobs, stages = data["jobs"], data["stages"]
    # split jobs into per-query segments at the sentinel marks
    order = sorted(jobs)
    seg = None
    segs: dict[str, list[int]] = {}
    for jid in order:
        d = jobs[jid].get("desc", "")
        if d.startswith("__mark__"):
            seg = d[len("__mark__"):]
            segs.setdefault(seg, [])
            continue
        if seg is not None:
            segs.setdefault(seg, []).append(jid)
    for name, jids in segs.items():
        jids = [j for j in jids if jobs[j].get("desc") == name]
        print(f"\n##### {name}: {len(jids)} jobs in timed window")
        prev_end = None
        gap_total = 0.0
        for jid in jids:
            j = jobs[jid]
            jwall = (j.get("t1", j["t0"]) - j["t0"]) / 1e3
            # driver-side gap since the previous job's end: planning,
            # Python orchestration, collect post-processing — the time no
            # stage accounts for
            if prev_end is not None:
                gap = (j["t0"] - prev_end) / 1e3
                if gap > 0:
                    gap_total += gap
                if gap > 0.05:
                    print(f"  -- gap {gap:7.3f}s before job {jid}")
            prev_end = j.get("t1", j["t0"])
            done = [s for s in j["stages"] if s in stages]
            print(f"  job {jid}: {jwall:7.3f}s  ({len(j['stages'])} stages, {len(done)} ran)")
            for sid in sorted(done):
                s = stages[sid]
                print(
                    f"    stage {sid:4d}: {s['wall']:7.3f}s {s['tasks']:4d} tasks "
                    f"sw={s['sw']/1e6:8.2f}MB  {s['name'][:80]}"
                )
        print(f"  ## inter-job gap total: {gap_total:.3f}s")


if __name__ == "__main__":
    main()
