"""Batch-mode workload queries for the streaming window operators.

The same plans run as Structured Streaming (see ``streaming.windows``);
registering the batch form gives them DuckDB oracles, and
``tests/test_streaming.py`` asserts stream ≡ batch on the same input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from redcap_omop_etl_spark.sources.readers import Catalog
from redcap_omop_etl_spark.streaming.windows import (
    session_window_agg,
    sliding_window_agg,
    tumbling_window_agg,
)
from redcap_omop_etl_spark.workload import register


@register(
    "stream_tumbling_window",
    """
    SELECT strftime(time_bucket(INTERVAL 1 HOUR, ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, count(*) AS n, round(sum(value::DECIMAL(8,2))::DOUBLE, 2) AS total_value
    FROM events GROUP BY 1, 2
    """,
    doc="Streaming §2.9: tumbling event-time window agg (batch-equivalent form).",
)
def stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tumbling_window_agg(Catalog(spark, sf_dir)["events"])


@register(
    "stream_sliding_window",
    """
    WITH starts AS (
      SELECT v.window_start, value FROM events, LATERAL (
        VALUES (time_bucket(INTERVAL 30 MINUTE, ts)),
               (time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE)
      ) v(window_start)
    )
    SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
           count(*) AS n, round(sum(value::DECIMAL(8,2))::DOUBLE, 2) AS total_value
    FROM starts GROUP BY 1
    """,
    doc="Streaming §2.9: sliding windows (1h width / 30m slide) — each event in 2 windows.",
)
def stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sliding_window_agg(Catalog(spark, sf_dir)["events"])


@register(
    "stream_session_window",
    """
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch(ts) - epoch(lag(ts) OVER w) >= 1800
                  THEN 1 ELSE 0 END AS new_session
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
      SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seq
      FROM flagged
    )
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
           count(*) AS n_events
    FROM numbered GROUP BY user_id, seq
    """,
    doc="Streaming §2.9: session_window gap-merged sessions (end = last_ts + gap).",
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return session_window_agg(Catalog(spark, sf_dir)["events"])


@register(
    "stream_watermark_dedup",
    """
    SELECT DISTINCT user_id, event_type FROM events
    """,
    doc="Streaming §2.9: bounded-state dedup "
    "(dropDuplicatesWithinWatermark); batch form keeps the deterministic "
    "key projection so the kept-set is oracle-comparable.",
)
def stream_watermark_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from redcap_omop_etl_spark.streaming.windows import stream_dedup

    events = Catalog(spark, sf_dir)["events"].select("user_id", "event_type", "ts")
    return stream_dedup(events, ["user_id", "event_type"]).select("user_id", "event_type")


@register(
    "stream_static_enrich",
    """
    SELECT e.event_id, e.user_id, n.n_name AS nation, e.event_type, e.value
    FROM events e JOIN nation n ON e.user_id % 25 = n.n_nationkey
    """,
    doc="Streaming §2.9: stream-static broadcast enrichment join — "
    "stateless per micro-batch, the stream side never shuffles.",
)
def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    from redcap_omop_etl_spark.streaming.windows import stream_static_enrich as enrich

    cat = Catalog(spark, sf_dir)
    return enrich(cat["events"], cat["nation"])


@register(
    "stream_interval_join",
    """
    SELECT v.user_id, v.event_id AS view_id, p.event_id AS purchase_id,
           (epoch_us(p.ts) - epoch_us(v.ts)) // 1000000 AS lag_seconds
    FROM events v JOIN events p
      ON v.user_id = p.user_id
     AND v.event_type = 'view' AND p.event_type = 'purchase'
     AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 6 HOUR
    """,
    doc="Streaming §2.9: stream-stream interval join (views ⨝ purchases "
    "within 6h, watermark-bounded state in stream mode).",
)
def stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from redcap_omop_etl_spark.streaming.windows import interval_join_views_purchases

    return interval_join_views_purchases(Catalog(spark, sf_dir)["events"])


@register(
    "stream_interval_join_outer",
    """
    WITH v AS (
      SELECT user_id, event_id, ts FROM events WHERE event_type = 'view'
    ), p AS (
      SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'
    )
    SELECT v.user_id, v.event_id AS view_id, p.event_id AS purchase_id,
           (epoch_us(p.ts) - epoch_us(v.ts)) // 1000000 AS lag_seconds,
           p.event_id IS NOT NULL AS converted
    FROM v LEFT JOIN p
      ON v.user_id = p.user_id
     AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 6 HOUR
    """,
    doc="Streaming §2.9: LEFT OUTER stream-stream interval join — views "
    "with no purchase in the 6h window emit once with NULL purchase "
    "columns (in stream mode, only after the watermark clears the "
    "view's window end; the batch form emits all of them, which is what "
    "the oracle checks). The conversion-funnel null channel that an "
    "inner join silently drops.",
)
def stream_interval_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from redcap_omop_etl_spark.streaming.windows import interval_join_views_purchases

    out = interval_join_views_purchases(Catalog(spark, sf_dir)["events"], how="left_outer")
    return out.withColumn("converted", F.col("purchase_id").isNotNull())


@register(
    "stream_two_level_rollup",
    """
    WITH m AS (
      SELECT time_bucket(INTERVAL 1 MINUTE, ts) AS mb, event_type,
             count(*) AS n, sum(round(value * 100)::BIGINT) AS cents
      FROM events GROUP BY 1, 2
    )
    SELECT strftime(time_bucket(INTERVAL 1 HOUR, mb), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           sum(n)::BIGINT AS n_events,
           count(*)::BIGINT AS n_minutes,
           round(sum(cents)::DOUBLE / 100.0, 2) AS total_value
    FROM m GROUP BY 1, 2
    """,
    doc="Streaming §2.9: CHAINED stateful aggregation (minute pre-agg -> "
    "hour rollup in one query, SPARK-40925 multiple-stateful-operators) "
    "— batch-equivalent form; tests/test_streaming.py runs the true "
    "append-mode stream and pins finalized-window equivalence.",
)
def stream_two_level_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from redcap_omop_etl_spark.streaming.windows import two_level_rollup

    return two_level_rollup(Catalog(spark, sf_dir)["events"])


def _near_dup_sig_oracle() -> str:
    from redcap_omop_etl_spark.operators.dedup import (
        minhash_banded_sql_cte,
        shingle_sql_cte,
    )

    return f"""
    WITH {shingle_sql_cte()}, {minhash_banded_sql_cte()}
    SELECT DISTINCT string_agg(sig::VARCHAR, '_' ORDER BY i) AS sig_fp
    FROM sigs GROUP BY doc
    """


@register(
    "stream_minhash_dedup",
    _near_dup_sig_oracle(),
    doc="Streaming §2.9 x dedup: NEAR-duplicate ingest gate — drop "
    "documents whose full 64-permutation MinHash signature was already "
    "admitted within the watermark horizon (the online form of "
    "near-exact dedup a crawl pipeline runs per shard). The signature "
    "is stateless per row, so the only stateful operator is bounded-"
    "state dropDuplicatesWithinWatermark on the signature key; batch "
    "form keeps the deterministic kept-KEY projection (which row "
    "survives is arrival-dependent) so the admitted-signature set is "
    "oracle-comparable — DuckDB replays the signature via the shared "
    "banded-minhash fragment. Stream ≡ batch pinned in "
    "tests/test_streaming.py.",
)
def stream_minhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from redcap_omop_etl_spark.streaming.windows import stream_near_dup_gate

    return stream_near_dup_gate(Catalog(spark, sf_dir)["documents"]).select("sig_fp")


def _semantic_sig_oracle(n_planes: int = 16, dim: int = 64) -> str:
    from redcap_omop_etl_spark.operators.similarity import _sig_sql_expr

    return f"""
    WITH e AS (SELECT embedding::DOUBLE[] AS v FROM embeddings)
    SELECT DISTINCT ({_sig_sql_expr(n_planes, dim)})::BIGINT AS sem_fp
    FROM e
    """


@register(
    "stream_embedding_dedup",
    _semantic_sig_oracle(),
    doc="Streaming §2.9 x similarity: SEMANTIC-duplicate ingest gate — "
    "drop vectors whose 16-bit random-hyperplane signature (the LSH "
    "bucket key, literal deterministic plane weights) was already "
    "admitted within the watermark horizon; the embedding-space "
    "analog of stream_minhash_dedup for re-encoded/mirrored content. "
    "Signature is stateless per row (plane projections fold inside "
    "the projection, zero shuffle), so the only stateful operator is "
    "bounded-state dropDuplicatesWithinWatermark on the key; batch "
    "form keeps the deterministic kept-KEY projection, oracle-"
    "comparable via the shared _sig_sql_expr plane weights. Stream ≡ "
    "batch pinned in tests/test_streaming.py.",
)
def stream_embedding_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from redcap_omop_etl_spark.streaming.windows import stream_semantic_dedup_gate

    return stream_semantic_dedup_gate(Catalog(spark, sf_dir)["embeddings"]).select(
        "sem_fp"
    )
