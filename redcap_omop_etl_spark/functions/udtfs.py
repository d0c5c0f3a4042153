"""Python UDTF surface: flatMap-shaped row emission (SURVEY §2.10).

The reference's transform plugin emits zero-or-more EAV records per input
row through ``add_transform_record`` (``/root/reference/transform.py:16-24``)
— a table-valued function in relational terms. Spark's built-in operators
cover the common emission shapes (``unpivot``, ``explode``,
``inline``), and those stay the fast path; the Python UDTF is the escape
hatch for *genuinely imperative* per-row emission logic (conditional
multi-record output, stateful-within-row parsing) that higher-order
functions can't express.

Scale notes:
- A UDTF runs rows through a Python worker — keep it off the hot path and
  prefer ``unpivot``/``explode`` when semantics allow (the test pins
  UDTF ≡ unpivot on the overlapping case).
- The UDTF class is defined *inside* the factory so cloudpickle serializes
  it by value — required when the driver imports this package from a
  foreign cwd (workers don't inherit the driver's ``sys.path``).
- Emission is per-row independent (no cross-row state), so the operator
  parallelizes embarrassingly: no shuffle, no state, arbitrary partition
  count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from redcap_omop_etl_spark.sources.readers import Catalog
from redcap_omop_etl_spark.workload import register

EAV_SCHEMA = "record_id string, namespace string, field_name string, field_value string"


def make_eav_emit_udtf():
    """Build the EAV-emitter UDTF class (pickled by value, see module doc).

    eval(record_id, namespace, fields: map<string,string>) yields one
    ``(record_id, namespace, field_name, field_value)`` row per non-null
    map entry — the reference's transform-record envelope
    (``transform.py:16-24``) as a table-valued function.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType=EAV_SCHEMA)
    class EavEmit:
        def eval(self, record_id, namespace, fields):
            if record_id is None or fields is None:
                return
            for field_name, field_value in fields.items():
                if field_value is not None:
                    yield (record_id, namespace, field_name, field_value)

    return EavEmit


def eav_emit_lateral(df: DataFrame, view_name: str = "__udtf_eav_src") -> DataFrame:
    """LATERAL-join the EAV-emitter UDTF over ``df``.

    ``df`` must carry ``record_id``, ``namespace`` and a
    ``fields: map<string,string>`` column. Returns only the emitted EAV
    stream (one row per non-null field).
    """
    spark = df.sparkSession
    spark.udtf.register("eav_emit", make_eav_emit_udtf())
    df.createOrReplaceTempView(view_name)
    return spark.sql(
        f"SELECT e.record_id, e.namespace, e.field_name, e.field_value "
        f"FROM {view_name} AS t, LATERAL eav_emit(t.record_id, t.namespace, t.fields) AS e"
    )


@register(
    "udtf_eav_emit",
    """
    SELECT cast(doc_id AS varchar) AS record_id,
           'docs' AS namespace,
           f.field_name,
           f.field_value
    FROM documents,
         LATERAL (VALUES ('lang', lang),
                         ('source', source),
                         ('n_chars', cast(n_chars AS varchar))) AS f(field_name, field_value)
    WHERE f.field_value IS NOT NULL
    """,
    doc="Python UDTF (flatMap-shaped transform emission, SURVEY §2.10): "
    "documents unpivoted to the EAV transform-record envelope through a "
    "LATERAL table function; string-typed values keep the cross-engine "
    "hash exact.",
)
def udtf_eav_emit(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir)["documents"]
    src = d.select(
        F.col("doc_id").cast("string").alias("record_id"),
        F.lit("docs").alias("namespace"),
        F.map_from_arrays(
            F.array(F.lit("lang"), F.lit("source"), F.lit("n_chars")),
            F.array(F.col("lang"), F.col("source"), F.col("n_chars").cast("string")),
        ).alias("fields"),
    )
    return eav_emit_lateral(src)
