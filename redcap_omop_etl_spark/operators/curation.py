"""Corpus-curation operators: cross-source score normalization,
curriculum ordering, robust (winsorized) statistics.

Net-new LLM-data-pipeline surface (no counterpart in
``/root/reference/redcap-etl.py``): the normalization / ordering passes a
training-data pipeline runs after quality scoring and before packing —
re-expressed as partitioned-window + hash-agg plans so nothing needs a
global sort or a driver round-trip.

Scale notes (100 TB):
- ``source`` is a LOW-cardinality dimension (~20 values on the test
  corpus), so a plain ``Window.partitionBy("source")`` would cap every
  data-sized sort at #sources tasks no matter the cluster width — a
  ~5 TB single-task sort per source at 100 TB. Every per-source rank /
  ntile here therefore goes through the two-phase partition-offset
  primitives in ``scalable_windows`` (range-partition on (source, order),
  per-(pid, source) summary offsets, local ``(__pid, source)`` windows):
  parallelism = partition count, bit-identical results.
- Quantile normalization uses the bucketed (ntile) formulation rather
  than exact rank-matching: at corpus scale the reference distribution is
  a fixed small vector (one mean per tile), which is the form that ships
  to executors as a broadcast and applies as a map-side join.
- Curriculum order is emitted as shard-local positions (per-source
  round-robin over difficulty deciles). A distributed training loader
  consumes shards independently, so the per-shard order IS the contract;
  a global total order would force a full-corpus range exchange for no
  training benefit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from redcap_omop_etl_spark.sources.readers import Catalog
from redcap_omop_etl_spark.workload import register

N_TILES = 20
N_DECILES = 10


@register(
    "curation_quantile_normalize",
    f"""
    WITH t AS (
      SELECT doc_id, source, n_chars,
             ntile({N_TILES}) OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS tile
      FROM documents
    ), ref AS (
      SELECT tile, round(sum(n_chars)::DOUBLE / count(*), 4) AS qnorm_chars
      FROM t GROUP BY tile
    )
    SELECT t.doc_id, t.source, t.tile, ref.qnorm_chars
    FROM t JOIN ref USING (tile)
    """,
    doc="Quantile normalization of a per-doc score (n_chars) across "
    "sources: each doc maps to its within-source quantile tile "
    "(ntile(20), tie-broken by doc_id), then takes the cross-source mean "
    "of its tile — the bucketed quantile-normalization used to make "
    "heterogeneous source score distributions comparable. The per-source "
    "ntile runs through the two-phase keyed_ntile primitive (the "
    "data-sized sort is partitioned by (__pid, source), not the 20-value "
    "source key) + 20-row broadcast reference; exact long sums make the "
    "tile means bit-identical cross-engine.",
)
def curation_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from redcap_omop_etl_spark.operators.scalable_windows import keyed_ntile

    d = Catalog(spark, sf_dir)["documents"]
    t = keyed_ntile(
        d.select("doc_id", "source", "n_chars"),
        ["source"],
        ["n_chars", "doc_id"],
        N_TILES,
        "tile",
    )
    ref = t.groupBy("tile").agg(
        F.round(F.sum("n_chars").cast("double") / F.count(F.lit(1)), 4).alias("qnorm_chars")
    )
    return t.join(F.broadcast(ref), "tile").select("doc_id", "source", "tile", "qnorm_chars")


@register(
    "curation_curriculum_order",
    f"""
    WITH t AS (
      SELECT doc_id, source,
             ntile({N_DECILES}) OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS decile
      FROM documents
    )
    SELECT doc_id, source, decile,
           ((row_number() OVER (PARTITION BY source, decile ORDER BY doc_id) - 1)
              * {N_DECILES} + decile - 1)::BIGINT AS shard_pos
    FROM t
    """,
    doc="Curriculum ordering: difficulty deciles (n_chars proxy) within "
    "each source shard, interleaved round-robin — shard position "
    "(rn−1)·10 + (decile−1) cycles easy→hard repeatedly. Both keyed "
    "ranks (the per-source ntile and the per-(source, decile) "
    "row_number) run through the two-phase partition-offset primitives: "
    "source has ~20 values and (source, decile) ~200, so naive keyed "
    "windows would cap the corpus sorts at that many tasks; here every "
    "data-sized sort is partitioned by (__pid, key).",
)
def curation_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    from redcap_omop_etl_spark.operators.scalable_windows import (
        keyed_ntile,
        with_keyed_index,
    )

    d = Catalog(spark, sf_dir)["documents"]
    t = keyed_ntile(
        d.select("doc_id", "source", "n_chars"),
        ["source"],
        ["n_chars", "doc_id"],
        N_DECILES,
        "decile",
    ).select("doc_id", "source", "decile")
    t2 = with_keyed_index(t, ["source", "decile"], ["doc_id"], "__rn")
    shard_pos = F.col("__rn") * N_DECILES + F.col("decile") - 1
    return t2.select(
        "doc_id", "source", "decile", shard_pos.cast("bigint").alias("shard_pos")
    )


@register(
    "curation_winsorized_stats",
    """
    WITH q AS (
      SELECT source,
             quantile_cont(n_chars, 0.05) AS p05,
             quantile_cont(n_chars, 0.95) AS p95
      FROM documents GROUP BY source
    ), clipped AS (
      SELECT d.source, q.p05, q.p95,
             floor(greatest(q.p05, least(q.p95, d.n_chars::DOUBLE)) * 10000 + 0.5)::HUGEINT AS vq,
             CASE WHEN d.n_chars::DOUBLE < q.p05 OR d.n_chars::DOUBLE > q.p95
                  THEN 1 ELSE 0 END AS is_clipped
      FROM documents d JOIN q USING (source)
    ), s AS (
      SELECT source,
             count(*)::HUGEINT AS n,
             sum(is_clipped)   AS n_clipped,
             any_value(p05)    AS p05,
             any_value(p95)    AS p95,
             sum(vq)           AS s1,
             sum(vq * vq)      AS s2
      FROM clipped GROUP BY source
    )
    SELECT source,
           n::BIGINT                      AS n_docs,
           n_clipped::BIGINT              AS n_clipped,
           round(p05, 4)                  AS p05,
           round(p95, 4)                  AS p95,
           round(s1::DOUBLE / (n::DOUBLE * 10000.0), 4) AS robust_mean,
           round(sqrt((n * s2 - s1 * s1)::DOUBLE
                      / nullif(n * (n - 1), 0)::DOUBLE) / 10000.0, 4) AS robust_std
    FROM s
    """,
    doc="Winsorized robust statistics per source: clip n_chars at the "
    "within-source [p05, p95] (exact interpolated percentiles — Spark "
    "percentile() ≡ DuckDB quantile_cont()), then mean/stddev of the "
    "clipped values plus the clip count. The clipped value is quantized "
    "to 4dp integers (shared floor(x·10⁴+0.5)) BEFORE aggregation, so "
    "the moment sums (Σvq, Σvq²) are exact integers — order-independent "
    "across engines and partitionings — and mean/std are single double "
    "expressions over identical exact operands at the end (the "
    "accumulation-order-flake-proof pattern; only a sub-ulp percentile "
    "divergence landing exactly on a quantization boundary could differ). "
    "Two hash aggs on source joined by a source-count-bounded broadcast.",
)
def curation_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir)["documents"]
    q = d.groupBy("source").agg(
        F.percentile("n_chars", F.lit(0.05)).alias("p05"),
        F.percentile("n_chars", F.lit(0.95)).alias("p95"),
    )
    v = F.greatest(F.col("p05"), F.least(F.col("p95"), F.col("n_chars").cast("double")))
    # 4dp integer quantization before any aggregation: integer sums are
    # exact in any accumulation order (decimal(38,0) so Σvq² can't
    # overflow at 100 TB row counts; DuckDB's HUGEINT mirrors it).
    vq = F.floor(v * 10000 + F.lit(0.5)).cast("decimal(38,0)")
    is_clipped = (
        (F.col("n_chars").cast("double") < F.col("p05"))
        | (F.col("n_chars").cast("double") > F.col("p95"))
    ).cast("int")
    s = (
        d.join(F.broadcast(q), "source")
        .select("source", "p05", "p95", vq.alias("vq"), is_clipped.alias("is_clipped"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
            F.sum("is_clipped").cast("bigint").alias("n_clipped"),
            F.any_value("p05").alias("p05"),
            F.any_value("p95").alias("p95"),
            F.sum("vq").alias("s1"),
            F.sum(F.col("vq") * F.col("vq")).alias("s2"),
        )
    )
    var_num = (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")).cast("double")
    var_den = F.nullif(F.col("n") * (F.col("n") - 1), F.lit(0).cast("decimal(38,0)")).cast("double")
    return s.select(
        "source",
        F.col("n").cast("bigint").alias("n_docs"),
        "n_clipped",
        F.round("p05", 4).alias("p05"),
        F.round("p95", 4).alias("p95"),
        F.round(F.col("s1").cast("double") / (F.col("n").cast("double") * 10000.0), 4).alias(
            "robust_mean"
        ),
        F.round(F.sqrt(var_num / var_den) / 10000.0, 4).alias("robust_std"),
    )


@register(
    "curation_rep_selection",
    """
    WITH t AS (
      SELECT doc_id, source, n_chars,
             md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
             CASE WHEN length(text) >= 100
                       AND length(regexp_replace(text, '[^.,;:!?''"()-]', '', 'g'))
                           * 1.0 / length(text) < 0.1
                       AND length(regexp_replace(text, '[^0-9]', '', 'g'))
                           * 1.0 / length(text) < 0.2
                  THEN 1 ELSE 0 END AS qk
      FROM documents
    ), ranked AS (
      SELECT doc_id, source, fp, qk,
             row_number() OVER (PARTITION BY fp
                                ORDER BY qk DESC, n_chars DESC, doc_id) AS rk,
             count(*)     OVER (PARTITION BY fp) AS cluster_sz,
             min(doc_id)  OVER (PARTITION BY fp) AS min_id
      FROM t
    )
    SELECT source,
           count(*)::BIGINT                                   AS n_reps,
           sum(cluster_sz - 1)::BIGINT                        AS n_shadowed,
           sum(CASE WHEN doc_id <> min_id THEN 1 ELSE 0 END)::BIGINT
                                                              AS n_pri_override,
           sum(qk)::BIGINT                                    AS n_quality_reps
    FROM ranked WHERE rk = 1 GROUP BY source
    """,
    doc="Quality-prioritized duplicate-cluster representative selection: "
    "exact-dup clusters (normalized-content fingerprint, same key as "
    "dedup_exact) keep the member ranked by (quality gate DESC, length "
    "DESC, doc_id) instead of blind min-id — the curation policy every "
    "production dedup actually wants, since the shortest/boilerplate "
    "copy is often the min-id one. n_pri_override counts clusters where "
    "the policy changed the outcome vs min-id. One fingerprint shuffle "
    "shared by the rank/size/min windows (same partition key), then a "
    "source-bounded hash agg; all outputs exact integers.",
)
def curation_rep_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from redcap_omop_etl_spark.operators.textstats import fingerprint_md5

    d = Catalog(spark, sf_dir)["documents"]
    n = F.length("text")
    n_punct = F.length(F.regexp_replace(F.col("text"), r"""[^.,;:!?'"()-]""", ""))
    n_digit = F.length(F.regexp_replace(F.col("text"), r"[^0-9]", ""))
    qk = (
        F.when((n >= 100) & (n_punct / n < 0.1) & (n_digit / n < 0.2), 1)
        .otherwise(0)
        .alias("qk")
    )
    t = d.select("doc_id", "source", "n_chars", fingerprint_md5(F.col("text")).alias("fp"), qk)
    wfp = Window.partitionBy("fp")
    ranked = t.select(
        "doc_id",
        "source",
        "qk",
        F.row_number()
        .over(wfp.orderBy(F.desc("qk"), F.desc("n_chars"), F.asc("doc_id")))
        .alias("rk"),
        F.count(F.lit(1)).over(wfp).alias("cluster_sz"),
        F.min("doc_id").over(wfp).alias("min_id"),
    )
    return (
        ranked.filter(F.col("rk") == 1)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_reps"),
            F.sum(F.col("cluster_sz") - 1).cast("bigint").alias("n_shadowed"),
            F.sum((F.col("doc_id") != F.col("min_id")).cast("int"))
            .cast("bigint")
            .alias("n_pri_override"),
            F.sum("qk").cast("bigint").alias("n_quality_reps"),
        )
    )


@register(
    "curation_pareto_frontier",
    """
    WITH t AS (
      SELECT doc_id, source, n_chars,
             string_split_regex(lower(trim(text)), '\\s+') AS w
      FROM documents
    ), q AS (
      SELECT doc_id, source, n_chars,
             (len(list_distinct(w)) * 1000000) // len(w) AS q_int
      FROM t
    ), m AS (
      SELECT source, doc_id, n_chars, q_int,
             max(n_chars) OVER (
               PARTITION BY source ORDER BY q_int DESC
               RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS m1,
             max(n_chars) OVER (PARTITION BY source, q_int) AS m2
      FROM q
    )
    SELECT source,
           count(*)::BIGINT AS n_docs,
           sum(CASE WHEN (m1 IS NULL OR m1 < n_chars) AND n_chars = m2
                    THEN 1 ELSE 0 END)::BIGINT AS n_frontier,
           round(sum(CASE WHEN (m1 IS NULL OR m1 < n_chars) AND n_chars = m2
                          THEN 1 ELSE 0 END) * 1.0 / count(*), 6) AS frontier_share
    FROM m GROUP BY source ORDER BY source
    """,
    doc="Pareto-frontier document selection (multi-objective curation): "
    "per source, the documents not DOMINATED on the (lexical-diversity, "
    "length) plane — d' dominates d iff q' >= q AND n' >= n with one "
    "strict. The frontier is what a curator keeps when two quality "
    "axes can't be collapsed into one score. Plan: diversity is an exact "
    "INTEGER ratio (distinct_tokens*1e6 // tokens — no double race), and "
    "domination never touches a pairwise self-join OR a corpus-sized "
    "keyed window: the corpus collapses through two hash aggregates to "
    "one row per (source, q_int) — carrying the group max length, the "
    "count of rows AT that max (max_by over per-length counts), and the "
    "group size — and the strictly-better-quality running max is a "
    "window over THAT frame, whose size is bounded by q_int's value "
    "domain (≤ 1e6+1 rows per source by construction), not by row count.",
)
def curation_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from redcap_omop_etl_spark.operators.textstats import ws_tokens

    d = Catalog(spark, sf_dir)["documents"]
    toks = ws_tokens(F.col("text"))
    # q_int via `div` (exact BIGINT floor division, mirroring DuckDB //)
    # — a double `/` + cast could truncate n−ε to n−1 on exact quotients
    q = d.select(
        "doc_id",
        "source",
        "n_chars",
        F.size(F.array_distinct(toks)).cast("bigint").alias("dt"),
        F.size(toks).cast("bigint").alias("nt"),
    ).select(
        "doc_id", "source", "n_chars", F.expr("dt * 1000000 div nt").alias("q_int")
    )
    # collapse the corpus BEFORE any window: one row per distinct
    # (source, q_int, n_chars), then per (source, q_int) keep the max
    # length, the row count achieving it (frontier candidates — ties all
    # qualify), and the group size. max_by is deterministic here because
    # n_chars is the grouping key of the inner aggregate (unique per row).
    g2 = q.groupBy("source", "q_int", "n_chars").agg(F.count(F.lit(1)).alias("c"))
    gm = g2.groupBy("source", "q_int").agg(
        F.max("n_chars").alias("gmax"),
        F.max_by("c", "n_chars").alias("c_at_max"),
        F.sum("c").alias("n_rows"),
    )
    # strictly-better-quality running max over the AGGREGATED frame: gm
    # is unique on (source, q_int), so the 1-PRECEDING rows frame in
    # q_int-descending order is exactly "all strictly higher q_int" —
    # the RANGE-frame semantics of the naive formulation, now over a
    # value-domain-bounded input instead of the corpus.
    w1 = (
        Window.partitionBy("source")
        .orderBy(F.desc("q_int"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    m = gm.withColumn("m1", F.max("gmax").over(w1))
    on_front = F.col("m1").isNull() | (F.col("m1") < F.col("gmax"))
    return (
        m.groupBy("source")
        .agg(
            F.sum("n_rows").cast("bigint").alias("n_docs"),
            F.sum(F.when(on_front, F.col("c_at_max")).otherwise(0))
            .cast("bigint")
            .alias("n_frontier"),
            F.round(
                F.sum(F.when(on_front, F.col("c_at_max")).otherwise(0)).cast("double")
                / F.sum("n_rows"),
                6,
            ).alias("frontier_share"),
        )
        .orderBy("source")
    )
