"""Scale-stress harness: replicate the sf0.1 tables m-fold with key
offsets and time a cross-family query subset at each multiplier.

The replication shape is "facts grow, dims stay" — the production growth
pattern: lineitem/orders get fresh order keys per replica, events get
fresh users, documents/embeddings fresh ids, while customer / supplier /
part / nation / region are written through unchanged. That keeps dim
joins broadcastable (as they are at any scale) and makes fact-side cost
the only thing that grows, so the measured slope is the compute scaling
that survives a 1000-executor scale-up — separated from the fixed
per-query scheduling floor that dominates at the bundled SFs.

Pair-generating near-dup queries (minhash / simhash / prefix-Jaccard /
containment) are EXCLUDED from plain replication — exact twins inflate
their candidate sets superlinearly in a way no real corpus does — and
covered instead by ``--neardup`` MUTATED replication: replica r rewrites
the tokens whose deterministic per-position hash value u(t, i) falls
below r/64 (mutation sets are NESTED across replicas, so replicas r and
r' differ on exactly (r - r')/64 of their tokens). Adjacent replicas are
genuine near-dups, distant ones drift apart — dup-cluster radius stays
BOUNDED as the corpus grows, which is how real corpora behave, so
candidate statistics stay realistic while document volume scales m×.
Fully deterministic (xxhash64 over (token, position) literals, no RNG).

Replicas are cached under .scale_cache/ (gitignored) as real parquet so
scans exercise pushdown exactly like the registered inputs.

Usage: python tools/bench_scale.py [m ...] [--queries=a,b,c] [--neardup]
(default: 1 4 16 over the full QUERIES list; --neardup switches to
mutated document replication and the NEARDUP_QUERIES family). Prints ONE
JSON line: {"metric": "scale_stress", "multipliers": [...],
"queries": {name: {m: sec}}, "slope16": {name: t(16)/t(1)}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from redcap_omop_etl_spark import workload
from redcap_omop_etl_spark.caching import clear_session_memos, unpersist_operator_caches
from redcap_omop_etl_spark.session import build_session

BASE = "/root/testdata/sf0.1"
CACHE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale_cache"
)
OFFSET = 10_000_000  # > every key in any sf0.1 table

# table -> columns offset per replica (facts); absent -> copied verbatim
FACT_KEYS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIM_TABLES = ["region", "nation", "customer", "supplier", "part"]

QUERIES = [
    # scan + agg / multi-join relational
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q9_product_profit",
    "q21_waiting_suppliers",
    # event windows / sessionization
    "window_running_agg",
    "sessionize_gap",
    "cohort_retention",
    # event analytics
    "anomaly_mad",
    "ts_autocorr",
    # document pipeline
    "dedup_exact",
    "text_chunk_windows",
    "dedup_chunk_level",
    "text_tfidf_top_terms",
    "corpus_quality_funnel",
    "corpus_source_divergence",
    "sampling_weighted_topk",
    # embeddings + graph
    "similarity_cosine_topk",
    "graph_pagerank",
    # round-5 additions: bounded k-core peel, label propagation,
    # readability scan, first-seen novelty
    "graph_kcore_peel",
    "graph_label_propagation",
    "text_readability",
    "corpus_ngram_novelty",
    # round-6 additions: PQ argmin (now a min-struct aggregate) and the
    # structure-aware splitter.
    "embedding_pq_audit",
    "text_chunk_structured",
    # round-8 continuation: SemDeDup (k-means + anchor-capped cosine,
    # never a pair stream) and IVF-PQ ADC search — both linear in the
    # embedding table under standard replication by construction.
    "dedup_semdedup",
    "similarity_ivf_pq_adc",
]


NEARDUP_QUERIES = [
    "dedup_prefix_jaccard",
    "dedup_prefix_jaccard_cap64",
    "dedup_containment",
    "dedup_containment_cap64",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
]


def _extra_queries():
    """Scale-only callables not in the registry. The REGISTERED capped
    PPJoin uses cap=2 so the sf0.01 gate corpus exercises the overflow
    channel; the scale question is about the PRODUCTION default (cap=64),
    so the stress times that configuration — pairs and overflow both
    materialized, like a real caller would."""
    from redcap_omop_etl_spark.operators.dedup import (
        containment_pairs_capped,
        prefix_jaccard_pairs_capped,
    )
    from redcap_omop_etl_spark.sources.readers import Catalog

    def cap64(spark, sf_dir):
        pairs, overflow = prefix_jaccard_pairs_capped(
            Catalog(spark, sf_dir)["documents"], threshold=0.6, n=3, bucket_cap=64
        )
        return pairs.unionByName(
            overflow.select(
                F.col("doc").alias("d1"),
                F.lit(None).cast("bigint").alias("d2"),
                F.lit(None).cast("double").alias("jaccard"),
            )
        )

    def contain_cap64(spark, sf_dir):
        pairs, overflow = containment_pairs_capped(
            Catalog(spark, sf_dir)["documents"],
            threshold=0.5,
            n=3,
            df_cap=100,
            bucket_cap=64,
        )
        return pairs.unionByName(
            overflow.select(
                F.col("doc").alias("d1"),
                F.lit(None).cast("bigint").alias("d2"),
                F.lit(None).cast("double").alias("cont_1in2"),
                F.lit(None).cast("double").alias("cont_2in1"),
            )
        )

    return {
        "dedup_prefix_jaccard_cap64": cap64,
        "dedup_containment_cap64": contain_cap64,
    }

# token-mutation granularity for --neardup: replica r mutates the tokens
# with u(t, i) < r/MUT_K, so replicas r, r' differ on (r-r')/MUT_K of
# their tokens (nested mutation sets). At m=16 adjacent replicas differ
# 1/64 (strong near-dups, above every registered threshold) while the
# extremes differ 25% (well below) — bounded dup-cluster radius.
MUT_K = 64


def _mutated_text(r: int) -> F.Column:
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    mutated = F.transform(
        toks,
        lambda t, i: F.when(
            F.pmod(F.xxhash64(t, i), F.lit(MUT_K * 1000)) < F.lit(r * 1000),
            F.concat(t, F.lit("~m")),
        ).otherwise(t),
    )
    return F.concat_ws(" ", mutated)


# --skewed regime: POWER-LAW duplicate families. The --neardup mutated
# replication keeps dup-cluster radius bounded (realistic for generic
# crawls), but real crawls ALSO have one giant template family (cookie
# banners, mirrored boilerplate): --skewed overrides ~10% of ALL docs
# (hash-selected by doc_id across every replica, so the family grows
# with the corpus) with a shared 60-token template, lightly per-doc
# mutated (~6% of tokens) so members are near-dups, not byte-dups.
# Pairwise Jaccard within the family ≈ 0.88 -> members co-bucket under
# the 16x4 banding with high probability -> per-bucket star edges hub
# onto the family minimum: the exact heavy-hub shape large-star
# contraction is designed for (hub absorbs leaves in one rewire; the
# chain regime is what needs the log rounds). Non-family docs keep the
# --neardup nested token mutation, so the corpus is a MIX of one giant
# family and bounded-radius families.
SKEW_TEMPLATE = " ".join(
    f"template{i} boiler{i % 7} plate{i % 5} nav{i % 3}" for i in range(15)
)  # 60 tokens, deterministic
SKEW_FAMILY_MOD = 10  # xxhash64(doc_id) % 10 == 0 -> ~10% of docs


def _skew_family_text() -> F.Column:
    toks = F.split(F.lit(SKEW_TEMPLATE), r"\s+")
    mutated = F.transform(
        toks,
        lambda t, i: F.when(
            F.pmod(F.xxhash64(t, i, F.col("doc_id")), F.lit(1000)) < F.lit(60),
            F.concat(t, F.lit("~"), (F.col("doc_id") % 97).cast("string")),
        ).otherwise(t),
    )
    return F.concat_ws(" ", mutated)


def materialize(spark, m: int, neardup: bool = False, skewed: bool = False) -> str:
    tag = "sk" if skewed else ("nd" if neardup else "m")
    if m == 1 and not skewed:
        return BASE
    out = os.path.join(CACHE, f"{tag}{m}")
    done = os.path.join(out, "_DONE")
    if os.path.exists(done):
        return out
    os.makedirs(out, exist_ok=True)
    reps = spark.range(m).withColumnRenamed("id", "_rep")
    for t in DIM_TABLES:
        spark.read.parquet(f"{BASE}/{t}.parquet").write.mode("overwrite").parquet(
            f"{out}/{t}.parquet"
        )
    for t, keys in FACT_KEYS.items():
        df = spark.read.parquet(f"{BASE}/{t}.parquet").crossJoin(F.broadcast(reps))
        for k in keys:
            df = df.withColumn(k, F.col(k) + F.col("_rep") * F.lit(OFFSET))
        if (neardup or skewed) and t == "documents":
            # rebuild text per replica with the nested token mutation;
            # n_chars follows the rewritten text so length filters stay
            # honest. _rep 0 keeps the original text exactly.
            muts = F.col("text")
            for r in range(1, m):
                muts = F.when(F.col("_rep") == r, _mutated_text(r)).otherwise(muts)
            df = df.withColumn("text", muts)
            if skewed:
                # override the hash-selected ~10% with the lightly-
                # mutated shared template — ONE power-law family whose
                # size grows with the corpus (post-rekey doc_id so the
                # family spans replicas)
                df = df.withColumn(
                    "text",
                    F.when(
                        F.pmod(F.xxhash64(F.col("doc_id")), F.lit(SKEW_FAMILY_MOD))
                        == 0,
                        _skew_family_text(),
                    ).otherwise(F.col("text")),
                )
            df = df.withColumn("n_chars", F.length("text"))
        df.drop("_rep").write.mode("overwrite").parquet(f"{out}/{t}.parquet")
    open(done, "w").close()
    return out


def main() -> None:
    names = QUERIES
    ms_args = []
    neardup = skewed = False
    for a in sys.argv[1:]:
        if a.startswith("--queries="):
            names = [q for q in a.split("=", 1)[1].split(",") if q]
        elif a == "--neardup":
            neardup = True
        elif a == "--skewed":
            skewed = True
        else:
            ms_args.append(int(a))
    if (neardup or skewed) and names is QUERIES:
        names = NEARDUP_QUERIES
    ms = ms_args or [1, 4, 16]
    spark = build_session("bench_scale")
    qs = {**workload.queries(), **_extra_queries()}
    dirs = {m: materialize(spark, m, neardup, skewed) for m in ms}
    results: dict[str, dict[int, float]] = {}
    cc_rounds: dict[str, dict[int, int]] = {}
    for name in names:
        results[name] = {}
        for m in ms:
            unpersist_operator_caches()
            clear_session_memos()  # cold slopes: memoized cluster tables must recompute
            spark.catalog.clearCache()
            qs[name](spark, dirs[m]).count()  # warm: codegen + file index
            from redcap_omop_etl_spark.operators import graph as _g

            if _g.CC_LAST_ROUNDS is not None:
                # star-contraction rounds of the warm build (the timed
                # trials below hit the memoized component table)
                cc_rounds.setdefault(name, {})[m] = _g.CC_LAST_ROUNDS
                _g.CC_LAST_ROUNDS = None
            trials = []
            for _ in range(2):  # min-of-2: damps JVM/GC state variance
                t0 = time.time()
                qs[name](spark, dirs[m]).count()
                trials.append(time.time() - t0)
            results[name][m] = round(min(trials), 3)
    hi = max(ms)
    slope = {
        n: round(r[hi] / max(r[min(ms)], 1e-9), 2) for n, r in results.items()
    }
    out = {
        "metric": "scale_stress",
        "multipliers": ms,
        "base_sf": 0.1,
        "regime": "skewed" if skewed else ("neardup" if neardup else "standard"),
        "queries": results,
        f"slope{hi}": slope,
    }
    if cc_rounds:
        out["cc_rounds"] = cc_rounds
    print(json.dumps(out))


if __name__ == "__main__":
    main()
