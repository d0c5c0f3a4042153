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
    # Keep every sketch aggregate in its OWN aggregation, separate from
    # countDistinct: a combined agg makes Catalyst's distinct rewrite
    # (Expand) carry one sketch buffer per (flag, orderkey) pair —
    # ~|orderkey| HLL/percentile sketches instead of |groups| (measured
    # 10× slower at sf0.1). The rejoins are 3 rows, broadcast.
    approx = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.01).alias("approx_orders")
    )
    exact = li.groupBy("l_returnflag").agg(F.countDistinct("l_orderkey").alias("exact_orders"))
    pct = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", [0.5, 0.95], 10000).alias("price_p50_p95")
    )
    return approx.join(F.broadcast(exact), "l_returnflag").join(F.broadcast(pct), "l_returnflag")


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


@register(
    "q6_forecast_revenue",
    """
    SELECT round(sum(l_extendedprice::DECIMAL(10,2)
                     * l_discount::DECIMAL(4,2))::DOUBLE, 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.02 AND 0.06
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape: tight multi-predicate scan → single-row agg "
    "(every predicate reaches the parquet reader as PushedFilters).",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir)["lineitem"]
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.06)
            & (F.col("l_quantity") < 24)
        ).agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(10,2)") * F.col("l_discount").cast("decimal(4,2)")).cast(
                    "double"
                ),
                2,
            ).alias("revenue")
        )
    )


@register(
    "q4_priority_exists",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4 shape: EXISTS correlated subquery = left-semi join, "
    "then priority counts.",
)
def q4_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    returned = cat["lineitem"].filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        cat["orders"]
        .join(returned, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q13_customer_distribution",
    """
    SELECT c_count, count(*) AS custdist
    FROM (SELECT c.c_custkey, count(o.o_orderkey) AS c_count
          FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
          GROUP BY c.c_custkey)
    GROUP BY c_count
    """,
    doc="TPC-H Q13 shape: left outer join + two-level aggregation "
    "(count per customer, then histogram of counts).",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    per_cust = (
        cat["customer"]
        .select("c_custkey")
        .join(cat["orders"].select("o_custkey", "o_orderkey"), F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q14_promo_revenue",
    """
    SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                   THEN (l_extendedprice::DECIMAL(10,2) * (1 - l_discount::DECIMAL(4,2)))
                   ELSE 0 END)::DOUBLE
                 / sum(l_extendedprice::DECIMAL(10,2) * (1 - l_discount::DECIMAL(4,2)))::DOUBLE,
                 6) AS promo_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
    """,
    doc="TPC-H Q14 shape: conditional-aggregate ratio over a broadcast "
    "fact-dim join.",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    rev = F.col("l_extendedprice").cast("decimal(10,2)") * (1 - F.col("l_discount").cast("decimal(4,2)"))
    return (
        cat["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-09-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
        )
        .join(F.broadcast(cat["part"].select("p_partkey", "p_type")), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast("decimal(10,2)"))).cast("double")
                / F.sum(rev).cast("double"),
                6,
            ).alias("promo_pct")
        )
    )


@register(
    "q17_small_quantity_avg",
    """
    WITH pa AS (
      SELECT l_partkey AS pk, avg(l_quantity) AS avg_qty FROM lineitem GROUP BY l_partkey
    )
    SELECT round(sum(l_extendedprice::DECIMAL(10,2))::DOUBLE / 7.0, 2) AS avg_yearly
    FROM lineitem JOIN pa ON l_partkey = pk
    WHERE l_quantity < 0.4 * avg_qty
    """,
    doc="TPC-H Q17 shape: correlated per-group AVG subquery. Formulated "
    "as a window (avg over partitionBy l_partkey) — ONE shuffle of "
    "lineitem, where the decorrelated agg+self-join the optimizers "
    "rewrite to would shuffle it twice.",
)
def q17_small_quantity_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    li = Catalog(spark, sf_dir)["lineitem"]
    avg_qty = F.avg("l_quantity").over(W.partitionBy("l_partkey"))
    return (
        li.select("l_extendedprice", "l_quantity", "l_partkey")
        .withColumn("avg_qty", avg_qty)
        .filter(F.col("l_quantity") < 0.4 * F.col("avg_qty"))
        .agg(F.round(F.sum(F.col("l_extendedprice").cast("decimal(10,2)")).cast("double") / 7.0, 2).alias("avg_yearly"))
    )


@register(
    "q22_idle_customers",
    """
    WITH cutoff AS (
      SELECT avg(c_acctbal) AS avg_bal FROM customer WHERE c_acctbal > 0
    )
    SELECT c_nationkey, count(*) AS numcust,
           round(sum(c_acctbal)::DOUBLE, 2) AS totacctbal
    FROM customer, cutoff
    WHERE c_acctbal > avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
    GROUP BY c_nationkey
    """,
    doc="TPC-H Q22 shape: scalar subquery threshold + NOT EXISTS "
    "(anti join) + group agg.",
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    cust = cat["customer"]
    # Scalar subquery → 1-row DF cross-joined (broadcast by AQE: 1 row).
    cutoff = cust.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("avg_bal"))
    return (
        cust.crossJoin(F.broadcast(cutoff))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            cat["orders"].filter(F.col("o_orderstatus") == "P").select("o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal").cast("double"), 2).alias("totacctbal"),
        )
    )


@register(
    "q11_important_suppliers",
    """
    WITH sv AS (
      SELECT l_suppkey, sum(l_extendedprice::DECIMAL(10,2)) AS value
      FROM lineitem GROUP BY l_suppkey
    )
    SELECT l_suppkey AS s_suppkey, round(value::DOUBLE, 2) AS total_value
    FROM sv
    WHERE value > (SELECT sum(l_extendedprice::DECIMAL(10,2)) * 0.0015 FROM lineitem)
    """,
    doc="TPC-H Q11 shape: HAVING against a global-total scalar subquery.",
)
def q11_important_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir)["lineitem"]
    price = F.col("l_extendedprice").cast("decimal(10,2)")
    per_supp = li.groupBy("l_suppkey").agg(F.sum(price).alias("value"))
    total = li.agg((F.sum(price) * F.lit(0.0015).cast("decimal(6,4)")).alias("threshold"))
    return (
        per_supp.crossJoin(F.broadcast(total))
        .filter(F.col("value") > F.col("threshold"))
        .select(F.col("l_suppkey").alias("s_suppkey"), F.round(F.col("value").cast("double"), 2).alias("total_value"))
    )


@register(
    "q15_top_supplier",
    """
    WITH rev AS (
      SELECT l_suppkey AS supplier_no,
             sum(l_extendedprice::DECIMAL(10,2) * (1 - l_discount::DECIMAL(4,2))) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, round(total_revenue::DOUBLE, 2) AS total_revenue
    FROM supplier JOIN rev ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
    """,
    doc="TPC-H Q15 shape: reused subplan (revenue view) + scalar MAX "
    "subquery equality.",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    rev = (
        cat["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(10,2)") * (1 - F.col("l_discount").cast("decimal(4,2)"))).alias(
                "total_revenue"
            )
        )
    )
    top = rev.agg(F.max("total_revenue").alias("max_rev"))
    return (
        cat["supplier"]
        .select("s_suppkey", "s_name")
        .join(rev, F.col("s_suppkey") == F.col("supplier_no"))
        .crossJoin(F.broadcast(top))
        .filter(F.col("total_revenue") == F.col("max_rev"))
        .select("s_suppkey", "s_name", F.round(F.col("total_revenue").cast("double"), 2).alias("total_revenue"))
    )


@register(
    "agg_grouping_sets",
    """
    SELECT l_returnflag, l_linestatus,
           count(*) AS n, round(sum(l_quantity::DECIMAL(6,2))::DOUBLE, 2) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
    doc="Net-new (SURVEY §2.4 note): explicit GROUPING SETS beyond "
    "rollup/cube.",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    cat["lineitem"]  # registers the temp view
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               count(*) AS n, round(CAST(sum(CAST(l_quantity AS DECIMAL(6,2))) AS DOUBLE), 2) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


@register(
    "join_range_bands",
    """
    WITH bands(band, lo, hi) AS (
      VALUES ('small', 0, 10), ('medium', 10, 25), ('large', 25, 51)
    )
    SELECT band, count(*) AS n,
           round(sum(l_extendedprice::DECIMAL(10,2))::DOUBLE, 2) AS revenue
    FROM lineitem JOIN bands ON l_quantity >= lo AND l_quantity < hi
    GROUP BY band
    """,
    doc="Non-equi band join (theta join) against a broadcast range dim — "
    "the interval-lookup family the reference has no analog for.",
)
def join_range_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir)["lineitem"]
    bands = li.sparkSession.createDataFrame(
        [("small", 0, 10), ("medium", 10, 25), ("large", 25, 51)], "band string, lo int, hi int"
    )
    # Non-equi join: only BroadcastNestedLoopJoin can evaluate it — fine
    # because the band dim is bounded/tiny by construction.
    return (
        li.join(F.broadcast(bands), (F.col("l_quantity") >= F.col("lo")) & (F.col("l_quantity") < F.col("hi")))
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(10,2)")).cast("double"), 2).alias("revenue"),
        )
    )


@register(
    "sort_paginate",
    """
    SELECT o_orderkey, o_custkey, round(o_totalprice::DOUBLE, 2) AS total
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 15 OFFSET 10
    """,
    doc="Global sort (range-partitioned) + LIMIT/OFFSET pagination; the "
    "deterministic tiebreak makes the selected page an exact row set.",
)
def sort_paginate(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir)["orders"]
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .offset(10)
        .limit(15)
        .select("o_orderkey", "o_custkey", F.round(F.col("o_totalprice").cast("double"), 2).alias("total"))
    )


@register(
    "agg_median_quantiles",
    """
    SELECT l_returnflag,
           round(median(l_quantity), 4)                   AS median_qty,
           round(quantile_cont(l_extendedprice, 0.25), 4) AS p25_price,
           round(quantile_cont(l_extendedprice, 0.75), 4) AS p75_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Exact (interpolated) median + quartiles per group — Spark "
    "percentile() ≡ DuckDB quantile_cont().",
)
def agg_median_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir)["lineitem"]
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_quantity", F.lit(0.5)), 4).alias("median_qty"),
        F.round(F.percentile("l_extendedprice", F.lit(0.25)), 4).alias("p25_price"),
        F.round(F.percentile("l_extendedprice", F.lit(0.75)), 4).alias("p75_price"),
    )
