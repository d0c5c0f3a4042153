"""Additional TPC-H-shape workload queries — breadth for the relational
surface (joins with date extraction, top-N with HAVING, grouped semi-join
aggregates) beyond the reference's own operators.


Broadcast-hint policy (256x-stress lesson): only FIXED-cardinality
sides carry F.broadcast — nation/region (25/5 rows), literal dims,
1-row scalar aggregates, bounded top-k pools. customer/supplier/part
and their filtered subsets GROW with SF (customer is ~15B rows at
100 TB), so those joins are left unhinted: the cost-based threshold
and AQE broadcast them while small and degrade to shuffle joins when
the corpus outgrows the driver.
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
        .join(cat["customer"].select("c_custkey", "c_name"), F.col("o_custkey") == F.col("c_custkey"))
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
    "agg_moments",
    """
    SELECT l_returnflag,
           round(stddev_samp(l_extendedprice), 2) AS std_price,
           round(var_samp(l_quantity), 4)         AS var_qty,
           round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qty_price,
           round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 2) AS intercept
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Net-new (SURVEY §2.4 note): second-moment aggregate family — "
    "stddev/variance/correlation/covariance/linear-regression — one pass, "
    "partial+final split, no extra shuffle beyond the group-by. (skewness/"
    "kurtosis excluded from the oracle: Spark computes population g1/g2, "
    "DuckDB bias-corrected sample moments — definitionally different.)",
)
def agg_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir)["lineitem"]
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_extendedprice"), 2).alias("std_price"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("covar_qty_price"),
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias("slope"),
        F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 2).alias("intercept"),
    )


@register(
    "agg_approx",
    """
    SELECT l_returnflag,
           count(DISTINCT l_orderkey)::BIGINT AS exact_orders,
           TRUE AS hll_within_tol,
           TRUE AS p50_within_tol,
           TRUE AS p95_within_tol
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Net-new (SURVEY §2.4 note): approx_count_distinct + approx "
    "percentiles. Approximate values are engine-specific, so the "
    "driver-checkable contract is exact values + Spark-side tolerance "
    "booleans: |approx − exact| / exact ≤ 0.05 must hold for the HLL "
    "distinct count (rsd 0.01) and both approx percentiles (accuracy "
    "10000) — the oracle asserts the exact side and TRUE literals "
    "(pytest: TestApproxAgg).",
)
def agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir)["lineitem"]
    # Keep every sketch aggregate in its OWN aggregation, separate from
    # countDistinct: a combined agg makes Catalyst's distinct rewrite
    # (Expand) carry one sketch buffer per (flag, orderkey) pair —
    # ~|orderkey| HLL/percentile sketches instead of |groups| (measured
    # 10× slower at sf0.1). The rejoins are 3 rows, broadcast.
    approx = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.01).alias("approx_orders"),
        F.percentile_approx("l_extendedprice", F.lit(0.5), 10000).alias("ap50"),
        F.percentile_approx("l_extendedprice", F.lit(0.95), 10000).alias("ap95"),
    )
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.percentile("l_extendedprice", F.lit(0.5)).alias("ep50"),
        F.percentile("l_extendedprice", F.lit(0.95)).alias("ep95"),
    )

    def within(a, e):  # relative-error gate; exact sides are > 0 here
        return (F.abs(F.col(a) - F.col(e)) / F.col(e)) <= F.lit(0.05)

    return (
        exact.join(F.broadcast(approx), "l_returnflag")
        .select(
            "l_returnflag",
            "exact_orders",
            within("approx_orders", "exact_orders").alias("hll_within_tol"),
            within("ap50", "ep50").alias("p50_within_tol"),
            within("ap95", "ep95").alias("p95_within_tol"),
        )
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
    doc="TPC-H Q14 shape: conditional-aggregate ratio over an unhinted "
    "fact-part join (part grows with SF — cost-based broadcast only).",
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
        .join(cat["part"].select("p_partkey", "p_type"), F.col("l_partkey") == F.col("p_partkey"))
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
      SELECT sum(c_acctbal::DECIMAL(12,2)) AS bal_sum, count(*) AS bal_n
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c_nationkey, count(*) AS numcust,
           round(sum(c_acctbal::DECIMAL(12,2))::DOUBLE, 2) AS totacctbal
    FROM customer, cutoff
    WHERE c_acctbal::DECIMAL(12,2) * bal_n > bal_sum
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
    GROUP BY c_nationkey
    """,
    doc="TPC-H Q22 shape: scalar subquery threshold + NOT EXISTS "
    "(anti join) + group agg. The above-average test is the division-free "
    "``bal * n > sum`` over exact decimals — a double avg() is "
    "accumulation-order-dependent in the last ulp, so a customer sitting "
    "on the boundary could flip between engines/runs.",
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    cust = cat["customer"]
    bal = F.col("c_acctbal").cast("decimal(12,2)")
    # Scalar subquery → 1-row DF cross-joined (broadcast by AQE: 1 row).
    cutoff = cust.filter(F.col("c_acctbal") > 0).agg(
        F.sum(bal).alias("bal_sum"), F.count(F.lit(1)).alias("bal_n")
    )
    return (
        cust.crossJoin(F.broadcast(cutoff))
        .filter(bal * F.col("bal_n") > F.col("bal_sum"))
        .join(
            cat["orders"].filter(F.col("o_orderstatus") == "P").select("o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum(bal).cast("double"), 2).alias("totacctbal"),
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
    # SQL VALUES, not createDataFrame: no driver→JVM data round-trip
    bands = spark.sql(
        "SELECT * FROM VALUES ('small', 0, 10), ('medium', 10, 25), ('large', 25, 51) AS t(band, lo, hi)"
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


@register(
    "q2_min_cost_supplier",
    """
    WITH cost AS (
      SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem WHERE l_quantity > 0 GROUP BY l_partkey, l_suppkey
    ), eu AS (
      SELECT s_suppkey, s_name
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
                    JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    ), ranked AS (
      SELECT p_partkey, s_name, unit_cost,
             min(unit_cost) OVER (PARTITION BY p_partkey) AS min_cost
      FROM cost JOIN eu ON l_suppkey = s_suppkey
                JOIN part ON l_partkey = p_partkey
      WHERE p_size = 15
    )
    SELECT p_partkey, s_name, floor(unit_cost * 10000) / 10000 AS unit_cost
    FROM ranked WHERE unit_cost = min_cost
    """,
    doc="TPC-H Q2 shape (no partsupp table: unit cost derived from "
    "lineitem): cheapest in-region supplier per part via a correlated-MIN "
    "subquery, formulated as a window MIN so the per-part agg and the "
    "probe share ONE shuffle instead of agg + self-join (two).",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    cat = Catalog(spark, sf_dir)
    cost = (
        cat["lineitem"]
        .filter(F.col("l_quantity") > 0)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    eu = (
        cat["supplier"]
        .join(F.broadcast(cat["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(cat["region"].filter(F.col("r_name") == "EUROPE")), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name")
    )
    sized_parts = cat["part"].filter(F.col("p_size") == 15).select("p_partkey")
    w = W.partitionBy("l_partkey")
    return (
        cost.join(eu, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(sized_parts, F.col("l_partkey") == F.col("p_partkey"))
        .withColumn("min_cost", F.min("unit_cost").over(w))
        .filter(F.col("unit_cost") == F.col("min_cost"))
        # floor(x*1e4)/1e4, not round(x, 4): both engines evaluate the
        # identical IEEE ops, where HALF_UP-vs-banker's rounding on a
        # .xxxx5 double representation can differ by 1 ulp of output.
        .select("p_partkey", "s_name", (F.floor(F.col("unit_cost") * 10000) / 10000).alias("unit_cost"))
    )


@register(
    "q8_market_share",
    """
    SELECT order_year,
           round(sum(CASE WHEN supp_nation = 'NATION_3' THEN rev ELSE 0 END)::DOUBLE
                 / sum(rev)::DOUBLE, 6) AS mkt_share
    FROM (
      SELECT strftime(o_orderdate, '%Y') AS order_year,
             l_extendedprice::DECIMAL(10,2) * (1 - l_discount::DECIMAL(4,2)) AS rev,
             sn.n_name AS supp_nation
      FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN region   ON cn.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        JOIN part     ON l_partkey = p_partkey
      WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
    )
    GROUP BY order_year
    """,
    doc="TPC-H Q8 shape: one nation's share of in-region revenue per year. "
    "Every dim (part/supplier/customer→nation→region chain) broadcasts; "
    "the only fact shuffle is lineitem⨝orders.",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    rev = F.col("l_extendedprice").cast("decimal(10,2)") * (1 - F.col("l_discount").cast("decimal(4,2)"))
    am_cust = (
        cat["customer"]
        .join(F.broadcast(cat["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(cat["region"].filter(F.col("r_name") == "AMERICA")), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    supp_nation = (
        cat["supplier"]
        .join(F.broadcast(cat["nation"].select("n_nationkey", "n_name")), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    econ_parts = cat["part"].filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    return (
        cat["lineitem"]
        .join(econ_parts, F.col("l_partkey") == F.col("p_partkey"))
        .join(cat["orders"].select("o_orderkey", "o_custkey", "o_orderdate"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(am_cust, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .join(F.broadcast(supp_nation), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.date_format("o_orderdate", "yyyy").alias("order_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(F.lit(0).cast("decimal(10,2)"))).cast("double")
                / F.sum(rev).cast("double"),
                6,
            ).alias("mkt_share")
        )
    )


@register(
    "q9_product_profit",
    """
    SELECT supp_nation, order_year, round(sum(profit)::DOUBLE, 2) AS profit
    FROM (
      SELECT n_name AS supp_nation, strftime(o_orderdate, '%Y') AS order_year,
             l_extendedprice::DECIMAL(10,2) * (1 - l_discount::DECIMAL(4,2))
               - p_retailprice::DECIMAL(10,2) * l_quantity::DECIMAL(6,2)
                 * CAST(0.1 AS DECIMAL(2,1)) AS profit
      FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN orders   ON l_orderkey = o_orderkey
      WHERE p_name LIKE '%red%'
    )
    GROUP BY supp_nation, order_year
    """,
    doc="TPC-H Q9 shape (no partsupp: supply cost proxied as 10% of "
    "p_retailprice): profit per supplier-nation per year over a LIKE "
    "part filter. Exact decimal arithmetic end-to-end; double only at "
    "the rounded output boundary.",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    profit = F.col("l_extendedprice").cast("decimal(10,2)") * (
        1 - F.col("l_discount").cast("decimal(4,2)")
    ) - F.col("p_retailprice").cast("decimal(10,2)") * F.col("l_quantity").cast("decimal(6,2)") * F.lit("0.1").cast(
        "decimal(2,1)"
    )
    red_parts = cat["part"].filter(F.col("p_name").like("%red%")).select("p_partkey", "p_retailprice")
    supp_nation = (
        cat["supplier"]
        .join(F.broadcast(cat["nation"].select("n_nationkey", "n_name")), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    return (
        cat["lineitem"]
        .join(red_parts, F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp_nation), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(cat["orders"].select("o_orderkey", "o_orderdate"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("supp_nation", F.date_format("o_orderdate", "yyyy").alias("order_year"))
        .agg(F.round(F.sum(profit).cast("double"), 2).alias("profit"))
    )


@register(
    "q12_priority_by_linestatus",
    """
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_linestatus
    """,
    doc="TPC-H Q12 shape (no l_shipmode column: grouped by l_linestatus): "
    "urgent-vs-other conditional counts over a date-windowed fact join; "
    "the shipdate range reaches parquet as PushedFilters.",
)
def q12_priority_by_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        cat["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        )
        .select("l_orderkey", "l_linestatus")
        .join(cat["orders"].select("o_orderkey", "o_orderpriority"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~is_high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q16_supplier_cnt",
    """
    SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#15'
      AND p_size IN (1, 3, 9, 14, 19, 23, 36, 45)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
    doc="TPC-H Q16 shape (partsupp derived from lineitem; complaint "
    "suppliers proxied as negative-balance): distinct supplier count per "
    "(brand, type, size) with a NOT-IN exclusion = broadcast anti-join.",
)
def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    parts = cat["part"].filter(
        (F.col("p_brand") != "Brand#15") & F.col("p_size").isin(1, 3, 9, 14, 19, 23, 36, 45)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad_suppliers = cat["supplier"].filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        cat["lineitem"]
        .select("l_partkey", "l_suppkey")
        .join(bad_suppliers, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(parts, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q19_disjunctive_revenue",
    """
    SELECT round(sum(l_extendedprice::DECIMAL(10,2)
                     * (1 - l_discount::DECIMAL(4,2)))::DOUBLE, 2) AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1  AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
    """,
    doc="TPC-H Q19 shape: disjunctive (OR-of-conjunctions) predicates "
    "spanning both join sides — an equi-join on partkey with the OR as a "
    "residual filter, NOT a nested-loop; part broadcasts.",
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5) & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10) & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(20, 30))
    )
    return (
        cat["lineitem"]
        .join(cat["part"].select("p_partkey", "p_brand", "p_size"), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(10,2)") * (1 - F.col("l_discount").cast("decimal(4,2)"))).cast(
                    "double"
                ),
                2,
            ).alias("revenue")
        )
    )


@register(
    "q20_excess_suppliers",
    """
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
            SELECT l_suppkey
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_name LIKE 'small%'
            GROUP BY l_suppkey
            HAVING sum(l_quantity::DECIMAL(6,2)) > 100)
      AND s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 3)
    """,
    doc="TPC-H Q20 shape (availability derived from shipped quantity): "
    "nested IN subqueries = two left-semi joins, the grouped-HAVING "
    "inner query first.",
)
def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    small_parts = cat["part"].filter(F.col("p_name").like("small%")).select("p_partkey")
    heavy_suppliers = (
        cat["lineitem"]
        .join(small_parts, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(6,2)")).alias("__qty"))
        .filter(F.col("__qty") > 100)
        .select("l_suppkey")
    )
    eu_nations = cat["nation"].filter(F.col("n_regionkey") == 3).select("n_nationkey")
    return (
        cat["supplier"]
        .join(F.broadcast(eu_nations), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi")
        .join(heavy_suppliers, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
    )


@register(
    "q21_waiting_suppliers",
    """
    SELECT s_name, count(*) AS numwait
    FROM supplier
      JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name
    """,
    doc="TPC-H Q21 shape (no receipt/commit dates: 'late' proxied by "
    "returnflag='R'): sole-blaming-supplier via correlated EXISTS + NOT "
    "EXISTS. Formulated as per-order supplier-set windows over ONE pass "
    "of lineitem: the order-partitioned window annotates every row with "
    "(distinct suppliers, distinct R-suppliers) in place, so lineitem is "
    "scanned once and shuffled once on l_orderkey — the agg-and-rejoin "
    "form scans it twice and rejoins a fact-sized aggregate (measured 2x "
    "slower at 16x fact rows); the planner's literal form is three "
    "self-join shuffles. Set sizes are bounded by suppliers-per-order "
    "(~7), so window state is O(1) per row.",
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    cat = Catalog(spark, sf_dir)
    li = cat["lineitem"].select("l_orderkey", "l_suppkey", "l_returnflag")
    f_orders = cat["orders"].filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    li_f = li.join(f_orders, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
    w = W.partitionBy("l_orderkey")
    annotated = li_f.select(
        "l_orderkey",
        "l_suppkey",
        "l_returnflag",
        F.size(F.collect_set("l_suppkey").over(w)).alias("n_supp"),
        F.size(
            F.collect_set(
                F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
            ).over(w)
        ).alias("n_ret_supp"),
    )
    sole_blame = annotated.filter(
        (F.col("l_returnflag") == "R")
        & (F.col("n_supp") >= 2)
        & (F.col("n_ret_supp") == 1)
    )
    return (
        sole_blame.join(cat["supplier"].select("s_suppkey", "s_name"), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@register(
    "revenue_share_window",
    """
    WITH nation_rev AS (
      SELECT n_name,
             round(cast(sum(cast(l_extendedprice AS decimal(10,2))
                            * (1 - cast(l_discount AS decimal(4,2)))) AS double), 2)
               AS revenue
      FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
      GROUP BY n_name
    )
    SELECT n_name, revenue,
           round(revenue / sum(revenue) OVER (), 6) AS share
    FROM nation_rev
    """,
    doc="Percent-of-total (ratio_to_report): per-nation revenue over the "
    "grand total via an unbounded window over the ALREADY-AGGREGATED "
    "dim-sized relation — the global window is |nations| rows, never the "
    "fact; supplier→nation dims broadcast onto lineitem.",
)
def revenue_share_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    cat = Catalog(spark, sf_dir)
    rev = (
        cat["lineitem"]
        .join(F.broadcast(cat["supplier"].select("s_suppkey", "s_nationkey")), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cat["nation"].select("n_nationkey", "n_name")), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
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
    w = W.partitionBy(F.lit(0)).rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return rev.select(
        "n_name", "revenue", F.round(F.col("revenue") / F.sum("revenue").over(w), 6).alias("share")
    )


@register(
    "basket_pair_counts",
    """
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    )
    SELECT a.l_partkey AS p1, b.l_partkey AS p2, count(*) AS n_orders
    FROM items a JOIN items b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    HAVING count(*) >= 3
    """,
    doc="Market-basket pair mining: parts co-ordered in the same order. "
    "The self-join is an equi-join on the order key (co-partitioned, one "
    "shuffle each side), quadratic only in per-order item count (~7) — "
    "never a cross product; support threshold keeps the output "
    "actionable.",
)
def basket_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir)["lineitem"].select("l_orderkey", "l_partkey").distinct()
    a = li.alias("a")
    b = li.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("p1"), F.col("b.l_partkey").alias("p2"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= 3)
    )
