"""Registry-wide physical-plan audit: walk every registered workload
query and flag scale anti-patterns in its executed plan.

Flags:
- ``cartesian``      CartesianProduct — O(n*m) row explosion, never acceptable.
- ``bnlj``           BroadcastNestedLoopJoin — acceptable ONLY when the
                     broadcast side is provably tiny (scalar subquery,
                     bounded dim); each use must be allowlisted.
- ``row-udf``        BatchEvalPython — row-at-a-time Python in the hot
                     path (Arrow/pandas paths show as ArrowEvalPython /
                     FlatMapGroupsInPandas and are NOT flagged).
- ``global-window``  a Window with no partition spec — all rows through
                     one task; acceptable only over bounded (dim-sized /
                     LIMIT-k) intermediates, allowlisted per query.

Usage: python tools/audit_plans.py [sf_dir]
Exit 1 if any un-allowlisted flag fires. ``tests/test_plan_audit.py``
runs the same audit in CI.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Each allowlisted (query, flag) carries its justification — the audit is
# the documentation.
ALLOWED: dict[tuple[str, str], str] = {
    ("q11_important_suppliers", "bnlj"): "scalar threshold subquery: 1-row broadcast",
    ("q22_idle_customers", "bnlj"): "scalar avg-balance subquery: 1-row broadcast",
    ("text_unigram_logprob", "bnlj"): "corpus-total scalar: 1-row broadcast crossJoin",
    ("corpus_quality_funnel", "bnlj"): "inherits the unigram-LM 1-row scalar crossJoin",
    ("corpus_source_divergence", "bnlj"): "corpus-total scalar: 1-row broadcast crossJoin",
    ("corpus_temperature_mixture", "bnlj"): "total/wsum scalar: 1-row broadcast crossJoin "
    "against the dim-sized source-stats table",
    ("dq_distribution_drift", "bnlj"): "KS evaluation grid (sources x distinct values — "
    "bounded by the value DOMAIN, not rows) + 1-row corpus-total scalar crossJoin",
    ("join_range_bands", "bnlj"): "non-equi band predicate against a broadcast "
    "band dimension (a handful of rows); the theta-join form IS the operator",
    # NOTE: similarity_ann_ivf's assignment crossJoin (vectors x broadcast
    # 16-row centroid table) no longer surfaces as a BNLJ in the registered
    # query's plan: ivf_build materializes assignments/centroids behind
    # localCheckpoint (session-scoped index memo), so the probe-time plan
    # starts from the checkpointed RDD. The build-time BNLJ is still the
    # intended shape; it just isn't part of the audited query plan anymore.
    ("udtf_eav_emit", "row-udf"): "Python UDTF lateral-emit API surface "
    "(SURVEY 2.10) — the UDTF protocol is row-wise by definition",
    ("udtf_sessionize_tvf", "row-udf"): "TABLE-argument UDTF (polymorphic "
    "TVF) API surface — row-wise by definition; the declarative "
    "sessionize_gap plan is the fast path for the same logical operator",
    ("similarity_cosine_topk", "global-window"): "rank over the LIMIT-k "
    "survivors (k=10 rows)",
    ("similarity_ann_lsh", "global-window"): "rank over the LIMIT-k survivors",
    ("similarity_ann_ivf", "global-window"): "centroid-init row_number over "
    "LIMIT n_clusters (16) + rank over LIMIT-k survivors",
    ("similarity_ivf_pq_adc", "global-window"): "PQ-seed/centroid-init "
    "row_number over LIMIT-codewords + adc_rank over the LIMIT-k (10) "
    "survivors of the TakeOrdered ADC heap",
    ("ivfpq_append_search", "global-window"): "same shape as "
    "similarity_ivf_pq_adc (shared frozen index state + _adc_topk): "
    "adc_rank over the LIMIT-k (10) survivors of the TakeOrdered ADC "
    "heap; batch encode/assign windows are bounded by the broadcast "
    "codebook/centroid dims",
    # NOTE (round 9): ivfpq_recall_audit consumes only topk.vec_id, so
    # Catalyst PRUNES the adc_rank window column out of the audited plan
    # entirely — no global-window entry needed (same vanishing-shape
    # class as the memo NOTEs above).
    ("ivfpq_recall_audit", "bnlj"): "1-row overlap-count x 1-row "
    "candidate-count summary crossJoin (the sanctioned scalar pattern)",
    # (round 13: the batch coarse-assign bnlj entries for
    # ivfpq_append_search / ivfpq_upsert_search / semdedup_flags_append /
    # semdedup_flags_upsert are gone — _ivf_assign's crossJoin pair
    # blowup was replaced by a single ArrowEvalPython pass, so the
    # audited plans no longer contain a BroadcastNestedLoopJoin.)
    ("ivfpq_recall_sweep", "bnlj"): "four 1-row overlap x 1-row "
    "candidate-count scalar crossJoins (one per statically-unrolled "
    "sweep arm) — the same sanctioned scalar pattern as "
    "ivfpq_recall_audit's single arm",
    ("ivfpq_delete_search", "global-window"): "same shape as "
    "similarity_ivf_pq_adc (shared frozen index state + _adc_topk over "
    "the takedown survivors): adc_rank over the LIMIT-k (10) survivors "
    "of the TakeOrdered ADC heap",
    ("ivfpq_upsert_search", "global-window"): "same shape as "
    "ivfpq_append_search (shared frozen index state + _adc_topk): "
    "adc_rank over the LIMIT-k (10) survivors of the TakeOrdered ADC "
    "heap",
    ("rfm_segmentation", "global-window"): "ntile quartiles are global by "
    "definition; input is the per-customer aggregate (dim-sized next to the "
    "orders fact it summarizes)",
    ("sql_api_revenue_rank", "global-window"): "rank over per-nation revenue "
    "(25 rows)",
    ("revenue_share_window", "global-window"): "percent-of-total over the "
    "per-flag aggregate (3 rows)",
    ("retrieval_bm25_topk", "bnlj"): "corpus N/avgdl scalar: 1-row broadcast "
    "crossJoin",
    ("retrieval_heavy_hitters", "bnlj"): "merged MG decrement bound: 1-row "
    "broadcast crossJoin",
    ("text_collocation_pmi", "bnlj"): "corpus bigram-total scalar: 1-row "
    "broadcast crossJoin",
    ("join_bloom_prune", "bnlj"): "build-key count scalar: 1-row broadcast "
    "crossJoin (replaces the eager driver-side build.count())",
    ("dq_benford_audit", "global-window"): "chi-square total over the "
    "digit-domain-bounded (9-row) aggregate",
    ("retrieval_rrf_fusion", "global-window"): "rank windows run AFTER "
    "TakeOrderedAndProject LIMIT 100 — pool-bounded, never corpus-wide",
    ("retrieval_rrf_fusion", "bnlj"): "corpus N/avgdl scalar inherited "
    "from bm25_scores: 1-row broadcast crossJoin",
    ("graph_degree_assortativity", "bnlj"): "graph summary scalars: two "
    "1-row broadcast crossJoins",
    ("dedup_lsh_recall_audit", "bnlj"): "fixed-budget sample fraction: "
    "1-row corpus-count broadcast crossJoin (budget/N resolved in-plan)",
    ("graph_kcore_peel", "bnlj"): "per-round edge-count scalar: 1-row "
    "broadcast crossJoin per bounded peel round",
    ("retrieval_prf_expansion", "bnlj"): "corpus N/avgdl scalar inherited "
    "from bm25_scores: 1-row broadcast crossJoin",
    ("corpus_dsir_weights", "bnlj"): "raw/target feature-total scalars: "
    "1-row broadcast crossJoin onto the 256-bucket ratio table",
    ("corpus_dsir_weights_fast", "bnlj"): "same plan as the md5 twin: "
    "1-row feature-total scalar broadcast crossJoin",
    # NOTE: embedding_pq_audit's codeword-init row_number (a LIMIT-4
    # global window, 4 rows by construction) no longer surfaces in the
    # audited plan: pq_assign memoizes the code table per (session,
    # corpus) behind localCheckpoint, so the registered query's plan
    # starts from the checkpointed RDD — same situation as
    # similarity_ann_ivf's vanished assignment BNLJ below.
    ("similarity_hard_negatives", "global-window"): "rank over the "
    "LIMIT-k survivors (10 rows)",
    ("retrieval_ndcg_eval", "global-window"): "rank windows over the two "
    "LIMIT-10 survivor sets (observed + ideal rankings)",
    ("retrieval_ndcg_eval", "bnlj"): "corpus N/avgdl scalar inherited "
    "from bm25_scores: 1-row broadcast crossJoin",
    ("retrieval_zipf_fit", "global-window"): "with_global_index cumulative "
    "partition offsets: a window over the #shuffle-partitions-row counts "
    "frame (bounded by partition count, never by data) — the price of "
    "making the two-phase rank fully lazy (no driver collect at plan "
    "construction); the data-sized rank window stays partitioned by __pid",
    ("sink_chunk_assignment", "global-window"): "same with_global_index "
    "partition-offset window: #partitions rows, bounded; chunk assignment "
    "itself is per-partition row_number + broadcast offset join",
    ("corpus_epoch_shuffle", "global-window"): "same with_global_index "
    "partition-offset window (#partitions rows, bounded); the shuffled "
    "rank itself is per-partition row_number over the md5 range exchange",
    ("dedup_source_minhash_matrix", "bnlj"): "source-signature pair "
    "matrix: a #sources-row aggregate self-joined under a < predicate — "
    "both sides bounded by the source DIMENSION, never by data",
    # NOTE (round 8): corpus_packing_efficiency's constant-key offsets
    # window no longer folds its partition spec away — the structurally
    # persisted ranged frame puts an InMemoryRelation between the
    # constant and the window, so the spec keeps the (opaque) __one
    # column and the global-window flag stopped firing. Entry removed by
    # the stale-allowlist lint.
}


def audit_plan(name: str, plan: str) -> list[str]:
    flags = []
    if "CartesianProduct" in plan:
        flags.append("cartesian")
    if "BroadcastNestedLoopJoin" in plan:
        flags.append("bnlj")
    if "BatchEvalPython" in plan:
        flags.append("row-udf")
    if _has_global_window(plan):
        flags.append("global-window")
    return flags


def _group_bodies(s: str) -> list[str]:
    """Top-level ``[...]`` group contents of a plan line (bracket-balanced)."""
    depth = 0
    groups: list[str] = []
    buf: list[str] = []
    for ch in s:
        if ch == "[":
            if depth == 0:
                buf = []
            else:
                buf.append(ch)
            depth += 1
        elif ch == "]":
            depth -= 1
            if depth == 0:
                groups.append("".join(buf))
            else:
                buf.append(ch)
        elif depth > 0:
            buf.append(ch)
    return groups


def _has_global_window(plan: str) -> bool:
    for raw in plan.splitlines():
        line = raw.strip()
        while line[:1] in "+-: *":
            line = line[1:].lstrip()
        # match physical Window operators: "Window [..." or "(12) Window"
        if line.startswith("Window "):
            body = line[len("Window "):]
        elif line.startswith("WindowGroupLimit"):
            continue
        else:
            continue
        # Full form: Window [exprs], [partitionSpec], [orderSpec].
        # An unordered-but-partitioned window prints 2 groups with the
        # partition spec second; a GLOBAL ordered window also prints 2
        # groups but the second is the order spec (ASC/DESC markers).
        groups = _group_bodies(body)
        if len(groups) < 2:
            return True
        if len(groups) == 2 and (" ASC" in groups[1] or " DESC" in groups[1]):
            return True
    return False


def main() -> int:
    from redcap_omop_etl_spark import workload
    from redcap_omop_etl_spark.session import build_session

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = build_session("audit_plans")
    failures = []
    for name, fn in workload.queries().items():
        try:
            plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001
            print(f"ERR  {name}: {type(exc).__name__}: {exc}")
            failures.append((name, "build-error"))
            continue
        flags = audit_plan(name, plan)
        bad = [f for f in flags if (name, f) not in ALLOWED]
        ok = [f for f in flags if (name, f) in ALLOWED]
        if bad:
            print(f"FAIL {name}: {bad}")
            failures.extend((name, f) for f in bad)
        elif ok:
            print(f"ok   {name}: allowlisted {ok}")
    print(f"\n{len(failures)} un-allowlisted flags")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
