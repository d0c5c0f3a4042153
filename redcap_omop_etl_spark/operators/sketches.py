"""Probabilistic-filter operators: Bloom-filter join pruning and a
Count-Min frequency sketch.

Net-new scale surface (no counterpart in ``/root/reference/redcap-etl.py``
— the reference joins in pandas memory; these are the shuffle-avoidance
primitives a 100 TB join pipeline needs):

- **Bloom join pruning** is the runtime-filter pattern: hash the (small)
  build side's keys into an m-bit filter, ship the filter to the fact
  scan, and drop probe rows that cannot match BEFORE the join shuffle.
  Here the filter is expressed relationally — the set-bit positions are a
  DISTINCT table bounded by m (65536 rows max; ~100 KB broadcast),
  shipped to three map-side LEFT joins — so the "bit test" is JVM work
  and the pruned fact never reaches an exchange. At 100 TB this is what
  Spark's own ``spark.sql.optimizer.runtimeFilter.bloomFilter.enabled``
  does inside the engine; the operator makes the mechanics explicit and
  measurable (candidate/false-positive accounting in the output).
- **Count-Min sketch** is built from the PRE-AGGREGATED term-count table
  (map-side combine first, then ≤ depth×width cells), not the raw token
  stream — the sketch add is linear and order-independent, so cells are
  exact integers and the whole sketch, estimates included, is
  reproducible bit-for-bit in DuckDB via the same ``portable_hash60``
  arithmetic. depth×width is a constant (4×512) regardless of corpus
  size; estimates only ever overestimate (CMS guarantee, pinned for every
  term by the test suite).

Hash discipline: both operators run on ``portable_hash60`` (first 60 bits
of md5 — identical in Spark and DuckDB), with the k hash functions taken
as disjoint bit slices of the 60-bit value (16-bit for the Bloom filter,
13-bit for CMS rows). No Python in any hot path. Sizing: m must stay
~10x the build keys x k or the filter saturates — the 8192-bit first cut
hit 66% fill at sf0.1 (fp ~0.29); 65536 bits holds fp under 1% through
sf1 while the broadcast stays trivial.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from redcap_omop_etl_spark.operators.dedup import portable_hash60
from redcap_omop_etl_spark.operators.retrieval import _TOKS_CTE
from redcap_omop_etl_spark.operators.textstats import ws_tokens
from redcap_omop_etl_spark.sources.readers import Catalog
from redcap_omop_etl_spark.workload import register

BLOOM_M = 65536  # bits; ~3k build keys x 3 hashes at sf0.1 → ~13% fill, fp ~0.2%
CMS_DEPTH = 4
CMS_WIDTH = 512

# DuckDB equivalent of portable_hash60 for an expression x.
_H60 = "('0x' || substring(md5({x}), 1, 15))::BIGINT"


def _bloom_positions(h, m: int = BLOOM_M):
    """k=3 bit positions from disjoint 16-bit slices of a 60-bit hash."""
    return [F.pmod(F.shiftright(h, s), F.lit(m)) for s in (0, 16, 32)]


@register(
    "join_bloom_prune",
    f"""
    WITH build AS (
      SELECT DISTINCT c_custkey AS key FROM customer
      WHERE c_mktsegment = 'BUILDING'
    ), hb AS (
      SELECT key, {_H60.format(x="key::VARCHAR")} AS h FROM build
    ), pos AS (
      SELECT DISTINCT p FROM (
        SELECT (h >> 0) % {BLOOM_M} AS p FROM hb
        UNION ALL SELECT (h >> 16) % {BLOOM_M} FROM hb
        UNION ALL SELECT (h >> 32) % {BLOOM_M} FROM hb
      )
    ), probe AS (
      SELECT o_custkey AS key, {_H60.format(x="o_custkey::VARCHAR")} AS h
      FROM orders
    ), flag AS (
      SELECT key,
             CASE WHEN (h >> 0) % {BLOOM_M} IN (SELECT p FROM pos)
                   AND (h >> 16) % {BLOOM_M} IN (SELECT p FROM pos)
                   AND (h >> 32) % {BLOOM_M} IN (SELECT p FROM pos)
                  THEN 1 ELSE 0 END AS cand,
             CASE WHEN key IN (SELECT key FROM build) THEN 1 ELSE 0 END AS hit
      FROM probe
    )
    SELECT (SELECT count(*) FROM build)::BIGINT AS n_build_keys,
           count(*)::BIGINT                     AS n_probe,
           sum(cand)::BIGINT                    AS n_candidates,
           sum(hit)::BIGINT                     AS n_matches,
           (sum(cand) - sum(hit))::BIGINT       AS n_false_pos,
           round((sum(cand) - sum(hit))::DOUBLE
                 / nullif(count(*) - sum(hit), 0), 6) AS fp_rate
    FROM flag
    """,
    doc="Bloom-filter join pruning (the runtime-filter pattern): build an "
    "m=65536-bit, k=3 filter over the selected customer keys, probe every "
    "order against it with three broadcast LEFT joins on the bounded "
    "set-bit table, and account candidates vs true matches vs false "
    "positives. Every true match passes the filter (no false negatives — "
    "pinned in tests); the fact-side rows that fail never reach the join "
    "shuffle. Fully deterministic via portable_hash60, so even the "
    "false-positive count is hash-checked against DuckDB.",
)
def join_bloom_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    build = (
        cat["customer"]
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("key"))
        .distinct()
    )
    hb = build.withColumn("h", portable_hash60(F.col("key").cast("string")))
    pos = (
        hb.select(F.explode(F.array(*_bloom_positions(F.col("h")))).alias("p"))
        .distinct()
    )
    probe = cat["orders"].select(F.col("o_custkey").alias("key")).withColumn(
        "h", portable_hash60(F.col("key").cast("string"))
    )
    p1, p2, p3 = _bloom_positions(F.col("h"))
    flagged = probe.select("key", p1.alias("p1"), p2.alias("p2"), p3.alias("p3"))
    for i in (1, 2, 3):
        hit = pos.select(F.col("p").alias(f"pp{i}"), F.lit(1).alias(f"b{i}"))
        flagged = flagged.join(F.broadcast(hit), F.col(f"p{i}") == F.col(f"pp{i}"), "left")
    member = build.withColumn("mb", F.lit(1))
    flagged = flagged.join(F.broadcast(member), "key", "left")
    cand = (
        F.col("b1").isNotNull() & F.col("b2").isNotNull() & F.col("b3").isNotNull()
    ).cast("long")
    hit = F.col("mb").isNotNull().cast("long")
    # n_build_keys stays relational (1-row agg crossJoined into the final
    # aggregate) — an eager build.count() here would run a real customer
    # scan at PLAN CONSTRUCTION, which every plan-inspection tool/test
    # pays (the exact pattern prefix_jaccard_pairs tried and reverted).
    n_build = build.agg(F.count(F.lit(1)).alias("n_build_keys"))
    probe_agg = flagged.agg(
        F.count(F.lit(1)).alias("n_probe"),
        F.sum(cand).alias("n_candidates"),
        F.sum(hit).alias("n_matches"),
        (F.sum(cand) - F.sum(hit)).alias("n_false_pos"),
        F.round(
            (F.sum(cand) - F.sum(hit)).cast("double")
            / F.nullif(F.count(F.lit(1)) - F.sum(hit), F.lit(0)),
            6,
        ).alias("fp_rate"),
    )
    return probe_agg.crossJoin(F.broadcast(n_build)).select(
        "n_build_keys", "n_probe", "n_candidates", "n_matches", "n_false_pos", "fp_rate"
    )


def countmin_cells(term_counts: DataFrame, depth: int = CMS_DEPTH, width: int = CMS_WIDTH) -> DataFrame:
    """CMS cell table (r, pos, cell) from a pre-aggregated (term, cnt) table.

    Each term adds its exact count to one cell per row r, at position
    ``(h60(term) >> 13r) mod width`` — disjoint hash-bit slices, so the
    four row-hashes are pairwise independent enough for the CMS bound and
    bit-reproducible cross-engine. Output is ≤ depth×width rows.
    """
    h = term_counts.withColumn("h", portable_hash60(F.col("term")))
    cells = h.select(
        "cnt",
        F.posexplode(
            F.array(*[F.pmod(F.shiftright(F.col("h"), 13 * r), F.lit(width)) for r in range(depth)])
        ).alias("r", "pos"),
    )
    return cells.groupBy("r", "pos").agg(F.sum("cnt").alias("cell"))


@register(
    "sketch_countmin",
    f"""
    WITH {_TOKS_CTE}, c AS (
      SELECT term, count(*)::BIGINT AS cnt FROM toks GROUP BY term
    ), h AS (
      SELECT term, cnt, {_H60.format(x="term")} AS h FROM c
    ), cells AS (
      SELECT r, (h >> (13 * r)) % {CMS_WIDTH} AS pos, sum(cnt) AS cell
      FROM h CROSS JOIN (VALUES (0), (1), (2), (3)) AS rr(r)
      GROUP BY r, pos
    ), top AS (
      SELECT term, cnt, h FROM h ORDER BY cnt DESC, term LIMIT 10
    )
    SELECT t.term, t.cnt AS exact_count,
           min(ce.cell)::BIGINT AS cms_est,
           (min(ce.cell) - t.cnt)::BIGINT AS overestimate
    FROM top t
    CROSS JOIN (VALUES (0), (1), (2), (3)) AS rr(r)
    JOIN cells ce ON ce.r = rr.r AND ce.pos = (t.h >> (13 * rr.r)) % {CMS_WIDTH}
    GROUP BY t.term, t.cnt
    """,
    doc="Count-Min sketch (depth 4 × width 512) over corpus term "
    "frequencies, built from the pre-aggregated term-count table so the "
    "sketch add is one bounded 2048-cell aggregation, never a second pass "
    "over tokens. Point estimates (min over rows of the hashed cell) for "
    "the exact top-10 terms, with the overestimate surfaced; CMS is "
    "order-independent, so unlike Misra-Gries the ESTIMATES themselves "
    "are hash-checked against DuckDB, and est ≥ exact is pinned for every "
    "term in the vocabulary by the test suite.",
)
def sketch_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir)["documents"]
    c = (
        d.select(F.explode(ws_tokens(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    cells = countmin_cells(c)
    top = (
        c.orderBy(F.desc("cnt"), F.asc("term"))
        .limit(10)
        .withColumn("h", portable_hash60(F.col("term")))
    )
    probes = top.select(
        "term",
        "cnt",
        F.posexplode(
            F.array(
                *[
                    F.pmod(F.shiftright(F.col("h"), 13 * r), F.lit(CMS_WIDTH))
                    for r in range(CMS_DEPTH)
                ]
            )
        ).alias("r", "pos"),
    )
    return (
        probes.join(F.broadcast(cells), ["r", "pos"])
        .groupBy("term", F.col("cnt").alias("exact_count"))
        .agg(F.min("cell").alias("cms_est"))
        .select(
            "term",
            "exact_count",
            "cms_est",
            (F.col("cms_est") - F.col("exact_count")).alias("overestimate"),
        )
    )
