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


SESSION_SCHEMA = (
    "user_id bigint, session_seq bigint, session_start string, "
    "session_end string, n_events bigint"
)


def make_sessionize_udtf(gap_minutes: int = 30):
    """Build a TABLE-argument UDTF that sessionizes an ordered event
    partition imperatively — the Spark 4 polymorphic-TVF surface
    (``FROM f(TABLE(t) PARTITION BY k ORDER BY (...))``).

    Spark instantiates the class once PER PARTITION and feeds rows in the
    declared order, so the state is one open session (O(1) per key —
    bounded regardless of events-per-user, unlike collect-based
    formulations); ``terminate`` flushes the final session. Same
    semantics as the declarative gap-islands plan (``windows.sessionize``)
    — the test gate pins them equal — but expressed as the escape hatch
    for session logic too imperative for lag+cumsum (e.g. dynamic gaps,
    lookahead caps). Class defined inside the factory so cloudpickle
    ships it by value; stdlib imports stay inside methods (workers don't
    inherit the driver's cwd/sys.path).
    """
    from pyspark.sql.functions import udtf

    gap_s = gap_minutes * 60

    @udtf(returnType=SESSION_SCHEMA)
    class SessionizeTvf:
        def __init__(self):
            self.user = None
            self.seq = 0
            self.start = None
            self.end = None
            self.n = 0

        def _emit(self):
            fmt = "%Y-%m-%d %H:%M:%S"
            return (self.user, self.seq, self.start.strftime(fmt), self.end.strftime(fmt), self.n)

        def eval(self, row):
            import calendar

            ts = row["ts"]
            if self.n == 0:
                self.user, self.seq, self.start, self.end, self.n = row["user_id"], 1, ts, ts, 1
                return
            # unix-second truncation mirrors the declarative plan's
            # unix_timestamp()/epoch(date_trunc('second', ...)) arithmetic
            gap = calendar.timegm(ts.utctimetuple()) - calendar.timegm(self.end.utctimetuple())
            if gap > gap_s:
                out = self._emit()
                self.seq += 1
                self.start, self.end, self.n = ts, ts, 1
                yield out
            else:
                self.end = ts
                self.n += 1

        def terminate(self):
            if self.n:
                yield self._emit()

    return SessionizeTvf


@register(
    "udtf_sessionize_tvf",
    # oracle: identical to sessionize_gap's — the TVF is an alternative
    # PHYSICAL formulation of the same logical operator
    """
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch(date_trunc('second', ts))
                          - epoch(date_trunc('second', lag(ts) OVER w)) > 1800
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
      SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
      FROM flagged
    )
    SELECT user_id, session_seq::BIGINT AS session_seq,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
           count(*) AS n_events
    FROM numbered GROUP BY user_id, session_seq
    """,
    doc="Custom stateful operator as a Spark 4 TABLE-argument UDTF "
    "(polymorphic TVF, SURVEY §2.10): per-partition imperative "
    "sessionization with O(1) state per key, fed ordered rows by "
    "PARTITION BY user_id ORDER BY (ts, event_id). Oracled against the "
    "SAME SQL as sessionize_gap — two physical strategies, one logical "
    "operator. The declarative gap-islands plan stays the fast path; "
    "this is the escape hatch shape for logic lag+cumsum can't express.",
)
def udtf_sessionize_tvf(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    cat.register_all()
    spark.udtf.register("sessionize_tvf", make_sessionize_udtf(30))
    return spark.sql(
        "SELECT * FROM sessionize_tvf(TABLE(events) PARTITION BY user_id ORDER BY (ts, event_id))"
    )
