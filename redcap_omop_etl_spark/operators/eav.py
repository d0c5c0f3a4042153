"""EAV restructuring operators: pivot, unpivot, checkbox→array.

The reference's core data model is the EAV long table (SURVEY §1.1), with
pivot-to-wide for the debug sink / JSON export (``redcap-etl.py:384-395``,
notebook cell-13), unpivot-to-EAV for transform emission
(``dcc_transforms.py:263-268``), and the checkbox one-hot → array transform
(notebook cell-7/8). All three are single-shuffle declarative plans here.

Scale notes: ``pivot`` requires a pinned column-value list — letting Spark
infer distinct pivot values costs an extra job over 100 TB and risks an
unbounded column count (SURVEY §7 "what's hard"). Unpivot is shuffle-free
(a generator expression over each row).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from redcap_omop_etl_spark.sources.readers import Catalog
from redcap_omop_etl_spark.workload import register

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def unpivot_to_eav(df: DataFrame, id_cols: list[str], value_cols: list[str]) -> DataFrame:
    """Wide → EAV long: one row per (id, field). All values cast to string
    (the reference's string-everything EAV contract, SURVEY §1.1)."""
    stringified = df.select(
        *[F.col(c) for c in id_cols], *[F.col(c).cast("string").alias(c) for c in value_cols]
    )
    return stringified.unpivot(id_cols, value_cols, "field_name", "value")


def pivot_from_eav(
    df: DataFrame,
    id_cols: list[str],
    field_names: list[str],
    field_col: str = "field_name",
    value_col: str = "value",
) -> DataFrame:
    """EAV long → wide: hash-aggregated entry list, projected per field.

    ``field_names`` is mandatory: pinned pivot values keep the plan a single
    shuffle (no distinct-inference job) and bound the output schema.
    Last-write-wins in the reference (redcap-etl.py:393) is first-wins here
    under an explicit dedup upstream; with unique (id, field) pairs they
    coincide.

    NOT ``pivot().agg(first)``: ``first(string)``'s buffer isn't
    hash-mutable, so that plan degrades to SortAggregate — sorting the
    whole EAV stream by id before the partial agg. ``collect_list`` is a
    TypedImperativeAggregate, so this formulation runs as
    ObjectHashAggregate (hash-based, map-side partials, sort fallback
    only under memory pressure); the per-field projection is a codegen'd
    array scan over each group's few entries.
    """
    entries = F.collect_list(F.struct(F.col(field_col).alias("f"), F.col(value_col).alias("v")))
    grouped = df.groupBy(*id_cols).agg(entries.alias("__entries"))
    return grouped.select(
        *id_cols,
        *[
            F.try_element_at(F.filter("__entries", lambda e: e["f"] == F.lit(f)), F.lit(1))["v"].alias(f)
            for f in field_names
        ],
    )


def checkbox_to_array(flag_value_pairs: list[tuple[Column, int]]) -> Column:
    """One-hot checkbox columns → compact array of selected codes
    (notebook cell-7: flag*code then filter != 0)."""
    weighted = F.array(*[(flag.cast("int") * F.lit(code)) for flag, code in flag_value_pairs])
    return F.filter(weighted, lambda x: x != 0)


# --------------------------------------------------------------------------
# Registered workload queries
# --------------------------------------------------------------------------
@register(
    "eav_unpivot",
    """
    SELECT p_partkey, 'p_brand' AS field_name, p_brand AS value FROM part
    UNION ALL
    SELECT p_partkey, 'p_type', p_type FROM part
    UNION ALL
    SELECT p_partkey, 'p_size', CAST(p_size AS VARCHAR) FROM part
    """,
    doc="Reference R2: wide → EAV unpivot (dcc_transforms.py:263-268).",
)
def eav_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = Catalog(spark, sf_dir)["part"]
    return unpivot_to_eav(p, ["p_partkey"], ["p_brand", "p_type", "p_size"])


@register(
    "eav_pivot_roundtrip",
    """
    SELECT p_partkey, p_brand, p_type, CAST(p_size AS VARCHAR) AS p_size FROM part
    """,
    doc="Reference R1+R4: EAV → wide pivot; unpivot∘pivot is the identity.",
)
def eav_pivot_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = Catalog(spark, sf_dir)["part"]
    eav = unpivot_to_eav(p, ["p_partkey"], ["p_brand", "p_type", "p_size"])
    return pivot_from_eav(eav, ["p_partkey"], ["p_brand", "p_type", "p_size"])


@register(
    "pivot_event_values",
    """
    SELECT user_id,
           round(coalesce(sum(value::DECIMAL(8,2)) FILTER (event_type = 'click'), 0)::DOUBLE, 2)    AS click,
           round(coalesce(sum(value::DECIMAL(8,2)) FILTER (event_type = 'error'), 0)::DOUBLE, 2)    AS error,
           round(coalesce(sum(value::DECIMAL(8,2)) FILTER (event_type = 'purchase'), 0)::DOUBLE, 2) AS purchase,
           round(coalesce(sum(value::DECIMAL(8,2)) FILTER (event_type = 'signup'), 0)::DOUBLE, 2)   AS signup,
           round(coalesce(sum(value::DECIMAL(8,2)) FILTER (event_type = 'view'), 0)::DOUBLE, 2)     AS view
    FROM events GROUP BY user_id
    """,
    doc="Reference A5/R1 generalized: pivot with a real aggregate (sum).",
)
def pivot_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir)["events"]
    pivoted = (
        e.groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.sum(F.col("value").cast("decimal(8,2)")))
    )
    return pivoted.select(
        "user_id",
        *[F.round(F.coalesce(F.col(t).cast("double"), F.lit(0.0)), 2).alias(t) for t in EVENT_TYPES],
    )


@register(
    "checkbox_to_array",
    """
    SELECT p_partkey,
           coalesce(array_to_string(
             list_filter([CASE WHEN p_size >= 25 THEN 1 ELSE 0 END,
                          CASE WHEN p_retailprice >= 1500 THEN 2 ELSE 0 END,
                          CASE WHEN p_brand = 'Brand#1' THEN 3 ELSE 0 END],
                         x -> x <> 0), ','), '') AS selected_codes
    FROM part
    """,
    doc="Reference R3 (notebook cell-7/8): one-hot checkbox columns → array of codes.",
)
def checkbox_to_array_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = Catalog(spark, sf_dir)["part"]
    arr = checkbox_to_array(
        [
            (F.col("p_size") >= 25, 1),
            (F.col("p_retailprice") >= 1500, 2),
            (F.col("p_brand") == "Brand#1", 3),
        ]
    )
    return p.select("p_partkey", F.array_join(arr, ",").alias("selected_codes"))


@register(
    "map_functions_suite",
    """
    WITH entries AS (
      SELECT event_id, 'type' AS key, event_type AS raw FROM events
      UNION ALL
      SELECT event_id, 'user', cast(user_id AS varchar) FROM events
      UNION ALL
      SELECT event_id, 'val',
             cast(cast(floor(value) AS bigint) AS varchar) FROM events
      UNION ALL
      SELECT event_id, 'src', 'events' FROM events
    )
    SELECT event_id, key, key || '=' || raw AS value
    FROM entries
    WHERE raw IS NOT NULL
    """,
    doc="Map-type function suite (F19 generalized): create_map → map_concat "
    "→ map_filter (null-valued entries dropped) → transform_values (k=v "
    "tagging) → explode back to rows. The map stays a first-class column "
    "between steps — no JSON round-trip; the DuckDB oracle derives the "
    "same rows from first principles (UNION ALL per key).",
)
def map_functions_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir)["events"]
    base = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("user"), F.col("user_id").cast("string"),
        F.lit("val"), F.floor("value").cast("bigint").cast("string"),
    )
    enriched = F.map_concat(base, F.create_map(F.lit("src"), F.lit("events")))
    clean = F.map_filter(enriched, lambda k, v: v.isNotNull())
    tagged = F.transform_values(clean, lambda k, v: F.concat(k, F.lit("="), v))
    return e.select("event_id", F.explode(tagged).alias("key", "value"))


@register(
    "checkbox_explode_outer",
    """
    WITH flags AS (
      SELECT p_partkey,
             list_filter([CASE WHEN p_size > 25 THEN 1 ELSE 0 END,
                          CASE WHEN p_retailprice >= 1500 THEN 2 ELSE 0 END,
                          CASE WHEN p_brand = 'Brand#1' THEN 3 ELSE 0 END],
                         x -> x != 0) AS codes
      FROM part
    )
    SELECT p_partkey, u.code
    FROM flags, unnest(codes) AS u(code)
    UNION ALL
    SELECT p_partkey, NULL AS code
    FROM flags WHERE len(codes) = 0
    """,
    doc="explode_outer semantics: one row per selected checkbox code, but "
    "rows whose selection is EMPTY survive with a NULL code — inner "
    "explode silently drops them, losing the 'no boxes ticked' records "
    "(the EAV pivot's null-cell dual). The oracle reconstructs the outer "
    "form as unnest UNION ALL the empties.",
)
def checkbox_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = Catalog(spark, sf_dir)["part"]
    arr = checkbox_to_array(
        [
            (F.col("p_size") > 25, 1),
            (F.col("p_retailprice") >= 1500, 2),
            (F.col("p_brand") == "Brand#1", 3),
        ]
    )
    return p.select("p_partkey", F.explode_outer(arr).alias("code"))
