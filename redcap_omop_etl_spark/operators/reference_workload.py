"""Oracle-checked workload queries for the reference-surface operators.

The driver's harness only ships the relational test tables, so these
queries synthesize the REDCap shapes from them inline (an EAV stream
unpivoted from ``part``, a field map from literal VALUES) and run the real
engine operators — the DuckDB oracle reproduces the semantics in ANSI SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from redcap_omop_etl_spark.operators.eav import unpivot_to_eav
from redcap_omop_etl_spark.operators.phi_filter import phi_filter
from redcap_omop_etl_spark.sinks.chunked import map_keyed_json, with_global_index
from redcap_omop_etl_spark.sources.readers import Catalog
from redcap_omop_etl_spark.workload import register

def _field_map(spark: SparkSession) -> DataFrame:
    """The 4-row field map as a SQL VALUES relation — a local
    ``createDataFrame`` costs a cold driver→JVM round-trip (~1.5s measured)
    where the SQL literal is a parse-only no-op."""
    return spark.sql(
        """
        SELECT * FROM VALUES
          ('p_brand',       'Include',           CAST(NULL AS STRING)),
          ('p_type',        'Include',           'A'),
          ('p_size',        'TransformDateYear', CAST(NULL AS STRING)),
          ('p_retailprice', 'Exclude',           CAST(NULL AS STRING))
        AS t(field_name, status, restrict_to_event_list)
        """
    )


def _synth_eav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """part → EAV stream with event + date_cleaned columns synthesized.

    ``load_complete`` rides in the same unpivot as the real columns (one
    scan of part) instead of a union with a second scan.
    """
    p = Catalog(spark, sf_dir)["part"].withColumn("load_complete", F.lit("2"))
    eav = unpivot_to_eav(
        p, ["p_partkey"], ["p_brand", "p_type", "p_size", "p_retailprice", "p_name", "load_complete"]
    )
    return (
        eav.withColumn("event", F.when(F.col("p_partkey") % 2 == 0, "A").otherwise("B"))
        .withColumn(
            "date_cleaned",
            F.when(F.col("field_name") == "p_size", F.col("p_partkey") % 3 == 0),
        )
        .withColumnRenamed("p_partkey", "record_id")
    )


_EAV_SQL = """
    eav AS (
      SELECT p_partkey AS record_id,
             CASE WHEN p_partkey % 2 = 0 THEN 'A' ELSE 'B' END AS event,
             f.field_name, f.value,
             CASE WHEN f.field_name = 'p_size' THEN p_partkey % 3 = 0 END AS date_cleaned
      FROM part, LATERAL (
        VALUES ('p_brand', p_brand), ('p_type', p_type),
               ('p_size', CAST(p_size AS VARCHAR)),
               ('p_retailprice', CAST(p_retailprice AS VARCHAR)),
               ('p_name', p_name), ('load_complete', '2')
      ) f(field_name, value)
    ), fm(field_name, status, restrict_events) AS (
      VALUES ('p_brand', 'Include', NULL),
             ('p_type', 'Include', 'A'),
             ('p_size', 'TransformDateYear', NULL),
             ('p_retailprice', 'Exclude', NULL)
    )
"""


@register(
    "phi_filter_keep",
    f"""
    WITH {_EAV_SQL}
    SELECT e.record_id, e.event, e.field_name, e.value
    FROM eav e LEFT JOIN fm ON e.field_name = fm.field_name
    WHERE e.field_name = 'redcap_data_access_group'
       OR e.field_name LIKE '%\\_complete' ESCAPE '\\'
       OR (fm.field_name IS NOT NULL AND (
             (fm.status = 'Include'
              AND (fm.restrict_events IS NULL OR fm.restrict_events = e.event))
          OR (fm.status IN ('TransformDateYear','TransformDate',
                            'TransformDateTimeSeconds','TransformDateTime')
              AND e.date_cleaned)))
    """,
    doc="Reference P6: the PHI allowlist filter (broadcast join + CASE chain).",
)
def phi_filter_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    eav = _synth_eav(spark, sf_dir)
    fm = _field_map(spark)
    res = phi_filter(eav, fm, event_col="event")
    return res.kept.select("record_id", "event", "field_name", "value")


@register(
    "phi_filter_errors",
    f"""
    WITH {_EAV_SQL}
    SELECT DISTINCT e.field_name, 'field missing from field map' AS error
    FROM eav e LEFT JOIN fm ON e.field_name = fm.field_name
    WHERE fm.field_name IS NULL
      AND e.field_name <> 'redcap_data_access_group'
      AND e.field_name NOT LIKE '%\\_complete' ESCAPE '\\'
    """,
    doc="Reference J7/V3: missing-from-map error side channel (anti join).",
)
def phi_filter_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    eav = _synth_eav(spark, sf_dir)
    fm = _field_map(spark)
    return phi_filter(eav, fm, event_col="event").errors


@register(
    "sink_chunk_assignment",
    """
    WITH indexed AS (
      SELECT o_orderkey, row_number() OVER (ORDER BY o_orderkey) - 1 AS idx
      FROM orders
    )
    SELECT (idx // 1000) + 1 AS chunk_number,
           count(*) AS n_records,
           min(o_orderkey) AS first_key, max(o_orderkey) AS last_key
    FROM indexed GROUP BY 1
    """,
    doc="Reference S9: deterministic chunk assignment via scalable global index.",
)
def sink_chunk_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir)["orders"].select("o_orderkey")
    indexed = with_global_index(o, ["o_orderkey"])
    return (
        indexed.withColumn("chunk_number", (F.col("__idx") / 1000).cast("long") + 1)
        .groupBy("chunk_number")
        .agg(
            F.count(F.lit(1)).alias("n_records"),
            F.min("o_orderkey").alias("first_key"),
            F.max("o_orderkey").alias("last_key"),
        )
    )


@register(
    "sink_json_map_export",
    """
    WITH per_user AS (
      SELECT user_id % 16 AS chunk, user_id,
             count(*) AS n, count(DISTINCT event_type) AS n_types
      FROM events GROUP BY 1, 2
    )
    SELECT chunk,
           '{' || string_agg(
               '"' || user_id || '":{"n":' || n || ',"n_types":' || n_types || '}',
               ',' ORDER BY user_id::VARCHAR) || '}' AS payload
    FROM per_user GROUP BY chunk
    """,
    doc="Reference notebook cell-13 (to_json(orient='index')): per-chunk "
    "JSON object keyed by record id, built with map_from_entries + "
    "to_json over sorted entries. Payload per row is bounded by the "
    "chunk key, not the corpus, so the export scales.",
)
def sink_json_map_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir)["events"]
    per_user = ev.groupBy((F.col("user_id") % 16).alias("chunk"), "user_id").agg(
        F.count(F.lit(1)).alias("n"), F.countDistinct("event_type").alias("n_types")
    )
    return map_keyed_json(per_user, "user_id", ["n", "n_types"], group_col="chunk")
