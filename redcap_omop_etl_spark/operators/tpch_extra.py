"""Additional TPC-H-shape workload queries — breadth for the relational
surface (joins with date extraction, top-N with HAVING, grouped semi-join
aggregates) beyond the reference's own operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from redcap_omop_etl_spark.sources.readers import Catalog
from redcap_omop_etl_spark.workload import register


@register(
    "q7_volume_by_year",
    """
    SELECT n_name, strftime(o_orderdate, '%Y') AS order_year,
           round(sum(l_extendedprice::DECIMAL(10,2)
                     * (1 - l_discount::DECIMAL(4,2)))::DOUBLE, 2) AS revenue
    FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name, order_year
    """,
    doc="TPC-H Q7 shape: fact join + year extraction + revenue rollup.",
)
def q7_volume_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    supp_nation = cat["supplier"].join(
        F.broadcast(cat["nation"]), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "n_name")
    return (
        cat["lineitem"]
        .join(cat["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp_nation), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("n_name", F.date_format("o_orderdate", "yyyy").alias("order_year"))
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(10,2)")
                    * (1 - F.col("l_discount").cast("decimal(4,2)"))
                ).cast("double"),
                2,
            ).alias("revenue")
        )
    )


@register(
    "q10_returned_items",
    """
    SELECT c_custkey, c_name,
           round(sum(l_extendedprice::DECIMAL(10,2)
                     * (1 - l_discount::DECIMAL(4,2)))::DOUBLE, 2) AS revenue
    FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 shape: returned-item revenue, top-20 customers.",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    return (
        cat["lineitem"]
        .filter(F.col("l_returnflag") == "R")
        .join(cat["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cat["customer"].select("c_custkey", "c_name")), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name")
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(10,2)")
                    * (1 - F.col("l_discount").cast("decimal(4,2)"))
                ).cast("double"),
                2,
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q18_large_orders",
    """
    SELECT o_orderkey, round(sum(l_quantity::DECIMAL(6,2))::DOUBLE, 2) AS total_qty
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderkey
    HAVING sum(l_quantity::DECIMAL(6,2)) > 150
    """,
    doc="TPC-H Q18 shape: HAVING filter over grouped fact join.",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    qty = F.col("l_quantity").cast("decimal(6,2)")
    return (
        cat["lineitem"]
        .join(cat["orders"].select("o_orderkey"), F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
        .groupBy(F.col("l_orderkey").alias("o_orderkey"))
        .agg(F.sum(qty).alias("__q"))
        .filter(F.col("__q") > 150)
        .select("o_orderkey", F.round(F.col("__q").cast("double"), 2).alias("total_qty"))
    )


@register(
    "agg_approx",
    None,  # approximate results differ across engines by design; pytest
    # pins accuracy vs the exact counts
    doc="Net-new (SURVEY §2.4 note): approx_count_distinct + approx percentiles.",
)
def agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir)["lineitem"]
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.01).alias("approx_orders"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.percentile_approx("l_extendedprice", [0.5, 0.95], 10000).alias("price_p50_p95"),
    )


@register(
    "agg_observe_counts",
    """
    SELECT count(*) AS n_rows, count(DISTINCT o_custkey) AS n_customers,
           round(sum(o_totalprice::DECIMAL(10,2))::DOUBLE, 2) AS total
    FROM orders
    """,
    doc="Reference A4: size/count observability as a single-pass aggregate.",
)
def agg_observe_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir)["orders"]
    return o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(10,2)")).cast("double"), 2).alias("total"),
    )
