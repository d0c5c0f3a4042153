"""Grouped / cogrouped ``applyInPandas`` operators — the Arrow-batched
escape hatch for per-group semantics Spark built-ins genuinely cannot
express (SURVEY §2.10; the batch counterparts of the streaming
``applyInPandasWithState`` operator in ``streaming/windows.py``).

- ``ewma_per_user`` (registered, oracled) — exponential smoothing is a
  per-row RECURSION (y_t = (1-α)·y_{t-1} + α·x_t), which no window frame
  or aggregate can express; the oracle mirrors it with a recursive CTE.
- ``penny_allocation`` (registered, oracled) — sum-preserving allocation
  of each order's total across its lineitems in integer cents. This one
  IS expressible declaratively (window cumsum + floor arithmetic), so
  the registered query is the pure-DataFrame plan — per-order Python
  groups would mean ~15k tiny pandas calls whose per-call overhead
  dwarfs the work (~70s vs ~1s at sf0.01, measured). The cogrouped
  ``applyInPandas`` formulation of the SAME kernel lives in
  ``penny_allocation_cogrouped`` to exercise
  ``cogroup().applyInPandas``, pinned equivalent by pytest at small SF —
  the API surface is demonstrated without shipping the anti-pattern as
  the production plan.

Discipline (external-driver portability): the pandas functions are
LOCAL closures using only importable libraries, never module-level
helpers — pickled closures referencing this module die with
ModuleNotFoundError when the external driver runs from a foreign cwd.
Rounding inside the kernels is ``floor(x·100 + 0.5)`` on BOTH engines —
never ``round()``, whose half-even (numpy) vs half-away (DuckDB/Spark)
modes diverge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from redcap_omop_etl_spark.sources.readers import Catalog
from redcap_omop_etl_spark.workload import register

_EWMA_ALPHA = 0.3


def ewma_per_user(events: DataFrame, alpha: float = _EWMA_ALPHA) -> DataFrame:
    """Per-user exponential moving average of ``value`` in (ts, event_id)
    order: y_1 = x_1, y_t = (1-α)·y_{t-1} + α·x_t.

    One shuffle on user_id; each group is a single Arrow batch into a
    numpy loop (the recursion is O(n) scalar work — the cost is the hash
    exchange, not Python; group COUNT is what must stay bounded, and
    users are few relative to events). A user with unbounded history
    would first be windowed upstream.
    """

    def smooth(pdf):
        import numpy as np  # local import: closure must be self-contained

        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort").reset_index(drop=True)
        x = pdf["value"].to_numpy(dtype="float64")
        y = np.empty_like(x)
        if len(x):
            y[0] = x[0]
            for i in range(1, len(x)):
                y[i] = y[i - 1] * (1.0 - alpha) + x[i] * alpha
        out = pdf[["user_id"]].copy()
        out["seq"] = np.arange(1, len(x) + 1, dtype="int64")
        # floor-form 6dp rounding: np.round is half-even, DuckDB round()
        # half-away — at sf0.1 three values land exactly on the boundary
        # (module-docstring gotcha; values here are non-negative)
        out["ewma"] = np.floor(y * 1e6 + 0.5) / 1e6
        return out

    return events.select("user_id", "ts", "event_id", "value").groupBy("user_id").applyInPandas(
        smooth, schema="user_id long, seq long, ewma double"
    )


@register(
    "pandas_ewma_per_user",
    """
    WITH RECURSIVE ordered AS (
      SELECT user_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seq
      FROM events
    ), rec AS (
      SELECT user_id, seq, value::DOUBLE AS y FROM ordered WHERE seq = 1
      UNION ALL
      SELECT o.user_id, o.seq, r.y * 0.7 + o.value * 0.3
      FROM ordered o JOIN rec r ON o.user_id = r.user_id AND o.seq = r.seq + 1
    )
    SELECT user_id, seq::BIGINT AS seq, floor(y * 1e6 + 0.5) / 1e6 AS ewma FROM rec
    """,
    doc="Grouped applyInPandas: per-user EWMA (α=0.3) — a per-row "
    "recursion no Spark window frame can express; Arrow-batched pandas "
    "per group, one user_id shuffle. The oracle is the same recurrence "
    "as a recursive CTE; identical IEEE op order, floor-form 6dp rounding.",
)
def pandas_ewma_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ewma_per_user(Catalog(spark, sf_dir)["events"])


def _alloc_lines(lineitem: DataFrame) -> DataFrame:
    """One row per (order, linenumber) — linenumbers repeat in this
    corpus and integer quantities sum exactly in any order."""
    return lineitem.groupBy("l_orderkey", "l_linenumber").agg(F.sum("l_quantity").alias("l_quantity"))


def penny_allocation(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Sum-preserving allocation of each order's total across its line
    numbers, proportional to quantity, in integer cents: cumulative
    shares round via floor(x·100 + 0.5) and each line gets the difference
    of adjacent rounded cumulatives (largest-remainder semantics in one
    pass — per-order cent sums tie out exactly).

    Pure DataFrame plan: lines aggregate, order-partitioned window
    cumsum (qtot = the LAST running cumulative so float op order is
    engine-identical), broadcast-friendly join to order totals, floor
    arithmetic — everything whole-stage codegen, integer output. See the
    module docstring for why this is NOT the cogrouped-pandas version.
    """
    w_cum = Window.partitionBy("l_orderkey").orderBy("l_linenumber")
    w_all = Window.partitionBy("l_orderkey")
    lines = _alloc_lines(lineitem).withColumn("qcum", F.sum("l_quantity").over(w_cum))
    lines = lines.withColumn("qtot", F.max("qcum").over(w_all))
    joined = lines.join(orders.select("o_orderkey", "o_totalprice"), lines.l_orderkey == orders.o_orderkey)
    cents = F.floor(F.col("o_totalprice") * (F.col("qcum") / F.col("qtot")) * 100 + 0.5)
    prev = F.floor(F.col("o_totalprice") * ((F.col("qcum") - F.col("l_quantity")) / F.col("qtot")) * 100 + 0.5)
    return joined.select(
        "l_orderkey",
        "l_linenumber",
        (cents - prev).cast("long").alias("alloc_cents"),
    )


def penny_allocation_cogrouped(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """The same kernel via ``cogroup().applyInPandas`` — API demonstration
    (each order key delivers its orders-frame and items-frame to one
    Python call). Correct but per-group overhead scales with ORDER COUNT;
    pinned equivalent to ``penny_allocation`` by pytest at small SF.
    Prefer the declarative plan wherever the semantics fit a window.
    """

    def allocate(odf, ldf):
        import numpy as np
        import pandas as pd

        if odf.empty or ldf.empty:
            return pd.DataFrame({"l_orderkey": [], "l_linenumber": [], "alloc_cents": []}).astype(
                {"l_orderkey": "int64", "l_linenumber": "int32", "alloc_cents": "int64"}
            )
        total = float(odf["o_totalprice"].iloc[0])
        ldf = (
            ldf.groupby(["l_orderkey", "l_linenumber"], as_index=False)["l_quantity"]
            .sum()
            .sort_values("l_linenumber", kind="mergesort")
            .reset_index(drop=True)
        )
        q = ldf["l_quantity"].to_numpy(dtype="float64")
        qcum = np.cumsum(q)
        qtot = qcum[-1]
        cum_cents = np.floor(total * (qcum / qtot) * 100 + 0.5)
        prev_cents = np.floor(total * ((qcum - q) / qtot) * 100 + 0.5)
        out = ldf[["l_orderkey", "l_linenumber"]].copy()
        out["alloc_cents"] = (cum_cents - prev_cents).astype("int64")
        return out

    o = orders.select("o_orderkey", "o_totalprice")
    li = lineitem.select("l_orderkey", "l_linenumber", "l_quantity")
    return o.groupBy("o_orderkey").cogroup(li.groupBy("l_orderkey")).applyInPandas(
        allocate, schema="l_orderkey long, l_linenumber int, alloc_cents long"
    )


@register(
    "pandas_penny_allocation",
    """
    WITH lines AS (
      SELECT l_orderkey, l_linenumber, sum(l_quantity) AS l_quantity
      FROM lineitem GROUP BY 1, 2
    ), it AS (
      SELECT l.l_orderkey, l.l_linenumber, l.l_quantity, o.o_totalprice,
             sum(l.l_quantity) OVER (PARTITION BY l.l_orderkey
                                     ORDER BY l.l_linenumber) AS qcum
      FROM lines l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ), tot AS (
      SELECT *, max(qcum) OVER (PARTITION BY l_orderkey) AS qtot FROM it
    )
    SELECT l_orderkey, l_linenumber,
           (floor(o_totalprice * (qcum / qtot) * 100 + 0.5)
            - floor(o_totalprice * ((qcum - l_quantity) / qtot) * 100 + 0.5))::BIGINT
             AS alloc_cents
    FROM tot
    """,
    doc="Sum-preserving penny allocation of each order's total across its "
    "line numbers by quantity share — cumulative floor(x·100+0.5) "
    "rounding, one pass, no remainder fixup; per-order cent sums tie out "
    "exactly. Declarative window plan (the cogrouped-applyInPandas "
    "formulation of the same kernel is an API demo, pytest-pinned "
    "equivalent — 15k tiny Python groups is the UDF anti-pattern). "
    "Integer-cents output: zero float-hash risk.",
)
def pandas_penny_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    return penny_allocation(c["orders"], c["lineitem"])


@register(
    "arrow_grouped_scale",
    """
    WITH b AS (
      SELECT source, n_chars,
             min(n_chars) OVER (PARTITION BY source) AS mn,
             max(n_chars) OVER (PARTITION BY source) AS mx
      FROM documents
    )
    SELECT source,
           count(*)::BIGINT AS n_docs,
           min(n_chars)::BIGINT AS min_chars,
           max(n_chars)::BIGINT AS max_chars,
           sum(CASE WHEN mx = mn THEN 0
                    ELSE floor((n_chars - mn) * 10000.0 / (mx - mn) + 0.5) END)::BIGINT
             AS scaled_sum_q
    FROM b GROUP BY source
    """,
    doc="Grouped ``applyInArrow`` (Spark 4's zero-copy grouped-map "
    "surface, completing the Python-vectorized matrix next to grouped "
    "applyInPandas and mapInArrow): per-source min-max scaling of "
    "n_chars with the scaled values checksummed as 4dp-quantized exact "
    "integer sums — the floor((x−min)·10⁴/(max−min)+0.5) chain is the "
    "same IEEE ops on the same exact operands in Python and the oracle, "
    "so the checksum is accumulation-order-proof. One shuffle on "
    "source (the grouped-map exchange).",
)
def arrow_grouped_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir)["documents"]

    def scale(key, table):
        import math

        import pyarrow as pa

        vals = table.column("n_chars").to_pylist()
        mn, mx = min(vals), max(vals)
        if mx == mn:
            ssum = 0
        else:
            ssum = sum(math.floor((x - mn) * 10000.0 / (mx - mn) + 0.5) for x in vals)
        return pa.table(
            {
                "source": [key[0]],
                "n_docs": [len(vals)],
                "min_chars": [mn],
                "max_chars": [mx],
                "scaled_sum_q": [ssum],
            },
            schema=pa.schema(
                [
                    ("source", pa.string()),
                    ("n_docs", pa.int64()),
                    ("min_chars", pa.int64()),
                    ("max_chars", pa.int64()),
                    ("scaled_sum_q", pa.int64()),
                ]
            ),
        )

    return d.select("source", "n_chars").groupBy("source").applyInArrow(
        scale, "source string, n_docs long, min_chars long, max_chars long, scaled_sum_q long"
    )
