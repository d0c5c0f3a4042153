"""Python UDAF surface: Arrow-batched grouped aggregation (SURVEY §2.10).

The missing leg next to the scalar pandas UDF (multimodal featurize) and
the Python UDTF (EAV emission): a custom *aggregate* written in Python.
``pandas_udf`` in grouped-agg form receives each group's column as one
Arrow-backed pandas Series and returns a scalar — vectorized transfer,
one Python round-trip per group, usable both in ``groupBy().agg`` and as
an unbounded-frame window function.

Scale notes: the JVM still does the shuffle and grouping; Python sees
each group once. Partial aggregation does NOT apply (the whole group's
values cross to Python), so prefer built-in expressions when they exist
— the demo metric (geometric mean) is deliberately also expressed as
``exp(avg(ln))`` in the oracle to make that tradeoff checkable.

The UDF is built inside a factory so cloudpickle ships it by value
(foreign-cwd drivers; workers don't inherit the driver's sys.path).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from redcap_omop_etl_spark.sources.readers import Catalog
from redcap_omop_etl_spark.workload import register


def make_geo_mean_udaf():
    """Grouped-agg pandas UDF: geometric mean of a positive column."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def geo_mean(v: pd.Series) -> float:
        import numpy as np

        return float(np.exp(np.log(v.to_numpy(dtype="float64")).mean()))

    return geo_mean


@register(
    "udaf_geo_mean",
    """
    SELECT l_returnflag, round(exp(avg(ln(l_extendedprice))), 4) AS geo_mean_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Python UDAF (grouped-agg pandas UDF, SURVEY §2.10): per-group "
    "geometric mean computed in Python over Arrow batches; the oracle is "
    "the closed-form exp(avg(ln)) — value-identical at 4dp, which also "
    "documents that a built-in expression exists for this particular "
    "metric (the UDAF surface is the point, not the math).",
)
def udaf_geo_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir)["lineitem"]
    geo_mean = make_geo_mean_udaf()
    return li.groupBy("l_returnflag").agg(
        F.round(geo_mean("l_extendedprice"), 4).alias("geo_mean_price")
    )
