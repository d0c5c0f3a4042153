"""Skew mitigation: salted two-phase aggregation and salted replicated
joins.

At 100 TB a handful of hot keys (one user with 1% of all events, one
boilerplate document hash) turn a single reducer into the job's critical
path. Two classic mitigations, expressed as pure DataFrame rewrites whose
results are provably identical to the unsalted plan (both are
oracle-checked against plain GROUP BY / JOIN SQL):

- **Salted two-phase aggregation**: scatter each group across
  ``n_salts`` sub-groups keyed by a deterministic hash of a high-
  cardinality column, partially aggregate, then aggregate the partials.
  Works for any algebraic aggregate (sum/count/min/max — decimal sums
  keep it bit-exact). Spark's map-side partial aggregation already does
  this *within* a task; explicit salting additionally splits the hot
  key's *reduce* work across ``n_salts`` reducers.
- **Salted replicated join**: for a skewed fact ⨝ small-dim join that is
  too big to broadcast whole but has hot keys, replicate the dim
  ``n_salts``× (explode over the salt range) and route each fact row to
  one replica via the same deterministic hash. Every hot key's probe work
  now spreads across ``n_salts`` reducers. (AQE's skew-join handles the
  sort-merge case automatically; this rewrite covers hash-partitioned
  paths and pre-AQE engines, and is the documented pattern for extreme
  single-key skew.)

Salts derive from ``xxhash64`` of a caller-named column — deterministic
across runs and partitionings, so tests and the DuckDB oracle see stable
results.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from redcap_omop_etl_spark.sources.readers import Catalog
from redcap_omop_etl_spark.workload import register


def with_salt(df: DataFrame, salt_src: str | Column, n_salts: int) -> DataFrame:
    """Deterministic salt column in [0, n_salts) from a hash of salt_src."""
    src = F.col(salt_src) if isinstance(salt_src, str) else salt_src
    return df.withColumn("__salt", F.pmod(F.xxhash64(src), F.lit(n_salts)).cast("int"))


def salted_sum(
    df: DataFrame,
    keys: Sequence[str],
    sums: dict[str, Column],
    salt_src: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation for algebraic SUM/COUNT aggregates.

    ``sums`` maps output name → input expression; each is summed per
    (keys, salt) then re-summed per keys. Result is identical to a direct
    ``groupBy(keys).agg(sum)`` (decimal inputs make it bit-exact,
    order-independent).
    """
    partial = (
        with_salt(df, salt_src, n_salts)
        .groupBy(*keys, "__salt")
        .agg(*[F.sum(expr).alias(name) for name, expr in sums.items()])
    )
    return partial.groupBy(*keys).agg(*[F.sum(name).alias(name) for name in sums])


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_src: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant fact ⨝ dim equi-join via dim replication.

    The dim side is exploded ``n_salts``× (one replica per salt); each
    fact row carries a deterministic salt, so the join key becomes
    (key, salt) and a hot key's rows spread over ``n_salts`` partitions.
    Row-for-row identical to ``fact.join(dim, key, how)``.
    """
    dim_rep = dim.withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>")))
    salted_fact = with_salt(fact, salt_src, n_salts)
    return salted_fact.join(dim_rep, [key, "__salt"], how).drop("__salt")


@register(
    "agg_salted_twophase",
    """
    SELECT l_returnflag,
           round(sum(l_extendedprice::DECIMAL(10,2)
                     * (1 - l_discount::DECIMAL(4,2)))::DOUBLE, 2) AS revenue,
           sum(1)::BIGINT AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Skew-resistant two-phase salted aggregation — bit-identical to "
    "the plain GROUP BY (the oracle): hot reduce keys split across 16 "
    "salted sub-groups before the final combine.",
)
def agg_salted_twophase(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir)["lineitem"]
    rev = F.col("l_extendedprice").cast("decimal(10,2)") * (1 - F.col("l_discount").cast("decimal(4,2)"))
    out = salted_sum(
        li,
        keys=["l_returnflag"],
        sums={"revenue": rev, "n": F.lit(1)},
        salt_src="l_orderkey",
        n_salts=16,
    )
    return out.select("l_returnflag", F.round(F.col("revenue").cast("double"), 2).alias("revenue"), "n")


@register(
    "join_salted_skew",
    """
    SELECT c_mktsegment,
           count(*) AS n_orders,
           round(sum(o_totalprice::DECIMAL(10,2))::DOUBLE, 2) AS total
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
    doc="Skew-resistant salted replicated join (dim exploded 8×, fact "
    "routed by hash) — row-identical to the plain equi-join oracle.",
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    dim = cat["customer"].select("c_custkey", "c_mktsegment")
    fact = cat["orders"].select(F.col("o_custkey").alias("c_custkey"), "o_totalprice", "o_orderkey")
    joined = salted_join(fact, dim, key="c_custkey", salt_src="o_orderkey", n_salts=8)
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(10,2)")).cast("double"), 2).alias("total"),
    )


@register(
    "skew_key_stats",
    """
    WITH per_key AS (
      SELECT l_orderkey AS key, count(*) AS n FROM lineitem GROUP BY 1
    )
    SELECT count(*)                         AS n_keys,
           max(n)                           AS max_key_rows,
           round(avg(n), 4)                 AS avg_key_rows,
           round(max(n) / avg(n), 4)        AS skew_ratio,
           round(stddev_samp(n), 4)         AS std_key_rows
    FROM per_key
    """,
    doc="Skew diagnosis: the per-key row-count distribution of a join/agg "
    "key — max/avg ratio is the number that decides between a plain "
    "shuffle, AQE skew-join, and explicit salting (operators/skew.py). "
    "Two cheap aggs (per-key counts, then the 1-row summary); run it on "
    "a sample before committing a 100 TB shuffle strategy.",
)
def skew_key_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir)["lineitem"]
    per_key = li.groupBy(F.col("l_orderkey").alias("key")).agg(F.count(F.lit(1)).alias("n"))
    return per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.max("n").alias("max_key_rows"),
        F.round(F.avg("n"), 4).alias("avg_key_rows"),
        F.round(F.max("n") / F.avg("n"), 4).alias("skew_ratio"),
        F.round(F.stddev_samp("n"), 4).alias("std_key_rows"),
    )
