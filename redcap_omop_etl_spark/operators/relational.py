"""Core relational operators: scans, filters, joins, aggregates, set ops.

Generalizes the reference's relational surface (SURVEY.md §2.2-2.4, §2.6):
every join in the reference is a broadcast hash lookup over a dict
(``redcap-etl.py:297``, ``dcc_transforms.py:25-31,234,289-291``); here the
same semantics are declared as DataFrame joins and Catalyst/AQE pick
broadcast vs shuffle. Each public query is registered in the workload with
a DuckDB oracle.

Scale notes (100 TB): fact-fact joins (lineitem ⨝ orders) shuffle on the
join key — both sides arrive partitioned by key, and AQE handles skew;
fact-dim joins broadcast (dims are bounded); aggregations are partial
(map-side combine) before the shuffle because they are expressed as
``groupBy().agg()`` over codegen'd expressions.


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


# --------------------------------------------------------------------------
# Pricing summary (TPC-H Q1 shape): scan → filter → group-agg.
# Exercises: filter pushdown, map-side partial aggregation, multi-agg.
# --------------------------------------------------------------------------
@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity::DECIMAL(6,2))::DOUBLE, 2)                  AS sum_qty,
           round(sum(l_extendedprice::DECIMAL(10,2))::DOUBLE, 2)            AS sum_base_price,
           round(sum(l_extendedprice::DECIMAL(10,2)
                     * (1 - l_discount::DECIMAL(4,2)))::DOUBLE, 2)          AS sum_disc_price,
           round(sum(l_extendedprice::DECIMAL(10,2)
                     * (1 - l_discount::DECIMAL(4,2))
                     * (1 + l_tax::DECIMAL(4,2)))::DOUBLE, 2)               AS sum_charge,
           round(sum(l_quantity::DECIMAL(6,2))::DOUBLE / count(*), 6)       AS avg_qty,
           round(sum(l_extendedprice::DECIMAL(10,2))::DOUBLE / count(*), 6) AS avg_price,
           round(sum(l_discount::DECIMAL(4,2))::DOUBLE / count(*), 6)       AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 pricing summary; SURVEY §2.4 A3-A6 generalized.",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir)["lineitem"]
    # Money columns are 2dp: decimal-exact sums are order-independent, so
    # Spark's partial-aggregation order can never flip a rounding boundary
    # against the oracle (double sums would differ in the last ulp).
    qty = F.col("l_quantity").cast("decimal(6,2)")
    price = F.col("l_extendedprice").cast("decimal(10,2)")
    disc = F.col("l_discount").cast("decimal(4,2)")
    tax = F.col("l_tax").cast("decimal(4,2)")
    disc_price = price * (1 - disc)
    n = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(qty).cast("double"), 2).alias("sum_qty"),
            F.round(F.sum(price).cast("double"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price).cast("double"), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + tax)).cast("double"), 2).alias("sum_charge"),
            F.round(F.sum(qty).cast("double") / n, 6).alias("avg_qty"),
            F.round(F.sum(price).cast("double") / n, 6).alias("avg_price"),
            F.round(F.sum(disc).cast("double") / n, 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# Shipping priority (TPC-H Q3 shape): 3-way join + agg + top-k.
# --------------------------------------------------------------------------
@register(
    "q3_shipping_priority",
    """
    SELECT l_orderkey,
           round(sum(l_extendedprice::DECIMAL(10,2)
                     * (1 - l_discount::DECIMAL(4,2)))::DOUBLE, 2) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d')                 AS orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate <  TIMESTAMP '1995-03-15 00:00:00'
      AND l_shipdate  >  TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3: selective dim filter, fact join, top-k.",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    cutoff = F.lit("1995-03-15 00:00:00").cast("timestamp")
    cust = cat["customer"].filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    orders = cat["orders"].filter(F.col("o_orderdate") < cutoff)
    li = cat["lineitem"].filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        # customer is the small filtered side → broadcast (reference J1 analog)
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(10,2)")
                    * (1 - F.col("l_discount").cast("decimal(4,2)"))
                ).cast("double"),
                2,
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# Local-supplier volume (TPC-H Q5 shape): 6-way snowflake join.
# Dims broadcast; facts shuffle on their keys once each.
# --------------------------------------------------------------------------
@register(
    "q5_local_supplier_volume",
    """
    SELECT n_name, round(sum(l_extendedprice::DECIMAL(10,2)
                              * (1 - l_discount::DECIMAL(4,2)))::DOUBLE, 2) AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1994-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY n_name
    """,
    doc="TPC-H Q5: snowflake join, broadcast dims, single fact shuffle.",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    nation_region = (
        cat["nation"]
        .join(F.broadcast(cat["region"].filter(F.col("r_name") == "ASIA")), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name")
    )
    supp = cat["supplier"].join(F.broadcast(nation_region), F.col("s_nationkey") == F.col("n_nationkey")).select(
        "s_suppkey", "s_nationkey", "n_name"
    )
    orders = cat["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1994-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01 00:00:00").cast("timestamp"))
    )
    return (
        cat["lineitem"]
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            cat["customer"].select("c_custkey", "c_nationkey"),
            (F.col("o_custkey") == F.col("c_custkey")) & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
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


# --------------------------------------------------------------------------
# Broadcast dim join (J1/J2/J4/J5): records ⨝ small lookup.
# --------------------------------------------------------------------------
@register(
    "join_broadcast_lookup",
    """
    SELECT n_name, r_name, count(*) AS n_customers, round(sum(c_acctbal::DECIMAL(9,2))::DOUBLE, 2) AS total_acctbal
    FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
    GROUP BY n_name, r_name
    """,
    doc="Reference J1/J4: broadcast hash lookup join (field_map_dict.get analog).",
)
def join_broadcast_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    dim = cat["nation"].join(F.broadcast(cat["region"]), F.col("n_regionkey") == F.col("r_regionkey")).select(
        "n_nationkey", "n_name", "r_name"
    )
    return (
        cat["customer"]
        .join(F.broadcast(dim), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", "r_name")
        .agg(F.count(F.lit(1)).alias("n_customers"), F.round(F.sum(F.col("c_acctbal").cast("decimal(9,2)")).cast("double"), 2).alias("total_acctbal"))
    )


# --------------------------------------------------------------------------
# Semi join (P7: metadata semi-filtered by surviving fields).
# --------------------------------------------------------------------------
@register(
    "join_semi",
    """
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
    """,
    doc="Reference P7: left-semi join (EXISTS reduction).",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    f_orders = cat["orders"].filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return (
        cat["customer"]
        .join(f_orders, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
    )


# --------------------------------------------------------------------------
# Anti join (J7: the error channel — fields absent from the field map).
# --------------------------------------------------------------------------
@register(
    "join_anti",
    """
    SELECT c_custkey, c_mktsegment
    FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
    doc="Reference J7: left-anti join error channel (missing-from-map fields).",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    return (
        cat["customer"]
        .join(cat["orders"].select("o_custkey"), F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_mktsegment")
    )


# --------------------------------------------------------------------------
# Merge-update join (J6): existing curated values overwrite fresh ones,
# coalesce-with-priority per column (dictionary_extraction.py:84-103).
# --------------------------------------------------------------------------
@register(
    "join_merge_update",
    """
    WITH fresh AS (
        SELECT p_partkey, p_brand, p_type FROM part
    ), curated AS (
        SELECT p_partkey, upper(p_brand) AS p_brand
        FROM part WHERE p_size > 25
    )
    SELECT f.p_partkey,
           coalesce(c.p_brand, f.p_brand) AS p_brand,
           f.p_type
    FROM fresh f LEFT JOIN curated c ON f.p_partkey = c.p_partkey
    """,
    doc="Reference J6: merge-update (curated-overwrites-fresh coalesce join).",
)
def join_merge_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    fresh = cat["part"].select("p_partkey", "p_brand", "p_type")
    curated = (
        cat["part"].filter(F.col("p_size") > 25).select("p_partkey", F.upper("p_brand").alias("cur_brand"))
    )
    return merge_update(fresh, curated.withColumnRenamed("cur_brand", "p_brand"), keys=["p_partkey"]).select(
        "p_partkey", "p_brand", "p_type"
    )


def merge_update(fresh: DataFrame, curated: DataFrame, keys: list[str]) -> DataFrame:
    """General merge-update: left-join ``curated`` onto ``fresh``; for every
    shared non-key column, a non-null curated value wins
    (``dictionary_extraction.py:101`` ``df.update`` semantics).

    The curated side is typically small (human-edited) → broadcast.
    """
    shared = [c for c in curated.columns if c in fresh.columns and c not in keys]
    cur = curated.select(keys + shared)
    for c in shared:
        cur = cur.withColumnRenamed(c, f"__cur_{c}")
    out = fresh.join(cur, on=keys, how="left")
    for c in shared:
        out = out.withColumn(c, F.coalesce(F.col(f"__cur_{c}"), F.col(c))).drop(f"__cur_{c}")
    return out


# --------------------------------------------------------------------------
# Distinct / dedup (A1/A2) and set ops (U-series + net-new intersect/except).
# --------------------------------------------------------------------------
@register(
    "agg_distinct_keys",
    """
    SELECT l_returnflag, count(DISTINCT l_orderkey) AS n_orders,
           count(DISTINCT l_partkey) AS n_parts
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Reference A1/A2: distinct-by-key accumulation as distinct aggregates.",
)
def agg_distinct_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir)["lineitem"]
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_partkey").alias("n_parts"),
    )


@register(
    "setop_intersect",
    """
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
    doc="Net-new set op (SURVEY §2.6): INTERSECT.",
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir)["orders"]
    f_side = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    o_side = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return f_side.intersect(o_side)


@register(
    "setop_except",
    """
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
    doc="Net-new set op (SURVEY §2.6): EXCEPT.",
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir)["orders"]
    f_side = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    o_side = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return f_side.subtract(o_side)  # EXCEPT (set semantics; exceptAll = bag)


@register(
    "union_chunks",
    """
    SELECT * FROM (
      SELECT o_orderkey AS k, 'early' AS chunk FROM orders
      WHERE o_orderdate < TIMESTAMP '1994-01-01 00:00:00'
      UNION ALL
      SELECT o_orderkey AS k, 'late' AS chunk FROM orders
      WHERE o_orderdate >= TIMESTAMP '1994-01-01 00:00:00'
    )
    """,
    doc="Reference U1/U2/U5: union-append of chunked scans by name.",
)
def union_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir)["orders"]
    cut = F.lit("1994-01-01 00:00:00").cast("timestamp")
    early = o.filter(F.col("o_orderdate") < cut).select(F.col("o_orderkey").alias("k"), F.lit("early").alias("chunk"))
    late = o.filter(F.col("o_orderdate") >= cut).select(F.col("o_orderkey").alias("k"), F.lit("late").alias("chunk"))
    return early.unionByName(late)


# --------------------------------------------------------------------------
# Grouping sets / rollup / cube — net-new aggregates (SURVEY §2.4 note).
# --------------------------------------------------------------------------
@register(
    "agg_rollup",
    """
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n, round(sum(o_totalprice::DECIMAL(10,2))::DOUBLE, 2) AS total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    doc="Net-new: ROLLUP aggregate.",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir)["orders"]
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum(F.col("o_totalprice").cast("decimal(10,2)")).cast("double"), 2).alias("total")
    )


@register(
    "agg_cube",
    """
    SELECT l_returnflag, l_linestatus, round(sum(l_quantity::DECIMAL(6,2))::DOUBLE, 2) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="Net-new: CUBE aggregate.",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir)["lineitem"]
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.round(F.sum(F.col("l_quantity").cast("decimal(6,2)")).cast("double"), 2).alias("sum_qty")
    )


# --------------------------------------------------------------------------
# CASE dispatch (F20): the reference's if/elif chains as one when-chain.
# --------------------------------------------------------------------------
@register(
    "case_dispatch",
    """
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 300000 THEN 'jumbo'
                WHEN o_totalprice >= 150000 THEN 'large'
                WHEN o_totalprice >= 50000  THEN 'medium'
                ELSE 'small' END AS size_class,
           CASE WHEN o_orderpriority LIKE '1-%' OR o_orderpriority LIKE '2-%'
                THEN 'urgent' ELSE 'routine' END AS urgency
    FROM orders
    """,
    doc="Reference F20: multi-way conditional dispatch as codegen'd CASE.",
)
def case_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir)["orders"]
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 300000, "jumbo")
        .when(F.col("o_totalprice") >= 150000, "large")
        .when(F.col("o_totalprice") >= 50000, "medium")
        .otherwise("small")
        .alias("size_class"),
        F.when(
            F.col("o_orderpriority").startswith("1-") | F.col("o_orderpriority").startswith("2-"), "urgent"
        )
        .otherwise("routine")
        .alias("urgency"),
    )


_SQL_API_REVENUE_RANK = """
    WITH rev AS (
      SELECT o_orderpriority,
             round(cast(sum(cast(l_extendedprice AS decimal(10,2))
                            * (1 - cast(l_discount AS decimal(4,2)))) AS double), 2)
               AS revenue,
             count(*) AS n_items
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, revenue, n_items,
           rank() OVER (ORDER BY revenue DESC) AS rev_rank
    FROM rev
"""


@register(
    "sql_api_revenue_rank",
    _SQL_API_REVENUE_RANK,
    doc="The SQL entry path: ONE ANSI string (CTE + join + decimal-exact "
    "agg + window) executed verbatim by BOTH engines — spark.sql over the "
    "catalog's registered views on one side, the DuckDB oracle on the "
    "other. Pins that the engine's SQL surface is plain Spark SQL with no "
    "dialect shims; Catalyst plans it identically to the DataFrame form "
    "(broadcast join + partial agg).",
)
def sql_api_revenue_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    cat.register_all()
    return spark.sql(_SQL_API_REVENUE_RANK)


_SQL_API_LATERAL_TOPN = """
    SELECT n.n_name, t.c_name, t.c_acctbal
    FROM nation n, LATERAL (
      SELECT c_name, c_acctbal FROM customer c
      WHERE c.c_nationkey = n.n_nationkey
      ORDER BY c_acctbal DESC, c_name LIMIT 3
    ) t
"""


@register(
    "sql_api_lateral_topn",
    _SQL_API_LATERAL_TOPN,
    doc="Correlated LATERAL subquery (SQL:1999 lateral derived table) with "
    "a per-row ORDER BY ... LIMIT — the top-n-per-key idiom in its SQL "
    "spelling, one string executed verbatim by BOTH engines. Catalyst "
    "decorrelates it to the same rank-window plan as the DataFrame "
    "formulation (window_topk_per_group), so the lateral form costs one "
    "shuffle on the correlation key, never a per-outer-row re-execution.",
)
def sql_api_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    cat.register_all()
    return spark.sql(_SQL_API_LATERAL_TOPN)


def snapshot_diff(
    old: DataFrame, new: DataFrame, keys: list[str], compare_cols: list[str]
) -> DataFrame:
    """Change-data-capture between two table snapshots: one full-outer
    join on the key classifies every row as inserted / deleted / updated /
    unchanged. Null-safe comparison on the value columns so NULL→value
    and value→NULL both count as updates. At scale both snapshots shuffle
    once on the key (or zero times if co-bucketed, ``sources/bucketed``);
    the reference's re-extract pipeline gets its "what actually changed"
    answer without any row-by-row loop.
    """
    # presence is keyed on the join side, not a value column (values may be
    # legitimately NULL): use a presence marker per side
    o_marked = old.select(keys + compare_cols).withColumn("__old_present", F.lit(True))
    n_marked = new.select(keys + compare_cols).withColumn("__new_present", F.lit(True))
    for c in compare_cols:
        o_marked = o_marked.withColumnRenamed(c, f"__old_{c}")
        n_marked = n_marked.withColumnRenamed(c, f"__new_{c}")
    j = o_marked.join(n_marked, on=keys, how="full_outer")
    changed = F.lit(False)
    for c in compare_cols:
        changed = changed | ~F.col(f"__old_{c}").eqNullSafe(F.col(f"__new_{c}"))
    status = (
        F.when(F.col("__old_present").isNull(), "inserted")
        .when(F.col("__new_present").isNull(), "deleted")
        .when(changed, "updated")
        .otherwise("unchanged")
    )
    return j.select(*keys, status.alias("change"))


@register(
    "snapshot_diff_counts",
    """
    WITH old AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      WHERE o_orderkey % 100 != 0
    ), new AS (
      SELECT o_orderkey, o_orderstatus,
             CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1 ELSE o_totalprice END
               AS o_totalprice
      FROM orders WHERE o_orderkey % 97 != 0
    )
    SELECT CASE WHEN old.o_orderkey IS NULL THEN 'inserted'
                WHEN new.o_orderkey IS NULL THEN 'deleted'
                WHEN old.o_totalprice IS DISTINCT FROM new.o_totalprice
                  OR old.o_orderstatus IS DISTINCT FROM new.o_orderstatus
                THEN 'updated' ELSE 'unchanged' END AS change,
           count(*) AS n
    FROM old FULL OUTER JOIN new USING (o_orderkey)
    GROUP BY 1
    """,
    doc="Snapshot diff (CDC between two table versions): one full-outer "
    "join classifies inserted/deleted/updated/unchanged with null-safe "
    "value comparison; synthetic old/new derived from orders by key "
    "filters + a price perturbation.",
)
def snapshot_diff_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir)["orders"]
    old = o.filter(F.col("o_orderkey") % 100 != 0).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    new = o.filter(F.col("o_orderkey") % 97 != 0).select(
        "o_orderkey",
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") + 1)
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    d = snapshot_diff(old, new, ["o_orderkey"], ["o_orderstatus", "o_totalprice"])
    return d.groupBy("change").agg(F.count(F.lit(1)).alias("n"))


@register(
    "join_key_overlap",
    """
    WITH a AS (SELECT DISTINCT o_custkey AS k FROM orders),
         b AS (SELECT DISTINCT c_custkey AS k FROM customer)
    SELECT (SELECT count(*) FROM a)                    AS n_left,
           (SELECT count(*) FROM b)                    AS n_right,
           (SELECT count(*) FROM a JOIN b USING (k))   AS n_both,
           round((SELECT count(*) FROM a JOIN b USING (k)) * 1.0
                 / (SELECT count(*) FROM a), 6)        AS left_containment
    FROM (VALUES (1)) t(x)
    """,
    doc="Pre-join key-overlap diagnostic: distinct key counts per side, "
    "the intersection, and containment — the sanity check that catches "
    "orphaned keys / wrong-grain joins BEFORE a 100 TB shuffle runs. "
    "Distincts and the intersection are dim-sized aggregations of the "
    "key columns only (full column pruning at the scans).",
)
def join_key_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    a = cat["orders"].select(F.col("o_custkey").alias("k")).distinct()
    b = cat["customer"].select(F.col("c_custkey").alias("k")).distinct()
    both = a.join(b, "k")
    n_left = a.count()
    n_right = b.count()
    n_both = both.count()
    return spark.createDataFrame(
        [(n_left, n_right, n_both, round(n_both / n_left, 6))],
        "n_left bigint, n_right bigint, n_both bigint, left_containment double",
    )


_SQL_API_RECURSIVE_HIERARCHY = """
    WITH RECURSIVE edges AS (
      SELECT 'C' || CAST(c_custkey AS STRING) AS node,
             'N' || CAST(c_nationkey AS STRING) AS parent
      FROM customer
      UNION ALL
      SELECT 'S' || CAST(s_suppkey AS STRING),
             'N' || CAST(s_nationkey AS STRING)
      FROM supplier
      UNION ALL
      SELECT 'N' || CAST(n_nationkey AS STRING),
             'R' || CAST(n_regionkey AS STRING)
      FROM nation
    ), walk AS (
      SELECT node, parent AS ancestor, 1 AS depth FROM edges
      UNION ALL
      SELECT w.node, e.parent, w.depth + 1
      FROM walk w JOIN edges e ON e.node = w.ancestor
    )
    SELECT substring(node, 1, 1)     AS node_kind,
           substring(ancestor, 1, 1) AS ancestor_kind,
           CAST(depth AS BIGINT)     AS depth,
           CAST(count(*) AS BIGINT)  AS n_paths,
           min(node)                 AS first_node
    FROM walk
    GROUP BY substring(node, 1, 1), substring(ancestor, 1, 1), depth
"""


@register(
    "sql_api_recursive_hierarchy",
    _SQL_API_RECURSIVE_HIERARCHY,
    doc="WITH RECURSIVE ancestor closure over the entity hierarchy "
    "(customer/supplier -> nation -> region), ONE ANSI string executed "
    "verbatim by BOTH engines (recursive CTEs landed in Spark 4.1 — this "
    "query will not parse on a 4.0.x deployment). The "
    "recursion is the right tool because depth is schema-unknown at query "
    "time; each step is an equi-join of the frontier against the edge "
    "table, and the frontier SHRINKS (nations, then regions, then empty) "
    "— Spark executes it as a bounded iterative union, one broadcastable "
    "join per level, terminating when the frontier is exhausted rather "
    "than at a guessed max-depth literal.",
)
def sql_api_recursive_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    cat.register_all()
    return spark.sql(_SQL_API_RECURSIVE_HIERARCHY)


# decimal-exact sums (the q1 discipline): double summation accumulates in
# engine/partition-dependent order and can flip a 2dp rounding boundary
_SQL_API_PIPE = """
    FROM lineitem
    |> WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
    |> AGGREGATE
         count(*) AS n_rows,
         round(CAST(sum(CAST(l_quantity AS DECIMAL(6,2))) AS DOUBLE), 2) AS sum_qty,
         round(CAST(sum(CAST(l_extendedprice AS DECIMAL(10,2))
                        * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE), 2)
           AS disc_revenue
       GROUP BY l_returnflag, l_linestatus
    |> ORDER BY l_returnflag, l_linestatus
"""

_SQL_API_PIPE_ORACLE = """
    SELECT l_returnflag, l_linestatus,
           count(*)::BIGINT AS n_rows,
           round(sum(l_quantity::DECIMAL(6,2))::DOUBLE, 2) AS sum_qty,
           round(sum(l_extendedprice::DECIMAL(10,2)
                     * (1 - l_discount::DECIMAL(4,2)))::DOUBLE, 2) AS disc_revenue
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
"""


@register(
    "sql_api_pipe_syntax",
    _SQL_API_PIPE_ORACLE,
    doc="SQL pipe syntax (|> operators, new in Spark 4.1 — the "
    "GoogleSQL-style linear query form): the q1-shaped pricing rollup "
    "written as FROM |> WHERE |> AGGREGATE |> ORDER BY, executed via "
    "spark.sql over the catalog views. Catalyst lowers pipes to the "
    "identical filter->partial-agg->exchange plan as the ANSI form (the "
    "oracle runs the ANSI equivalent in DuckDB, which has no pipe "
    "dialect — same semantics, different spelling). Decimal-exact sums, "
    "2dp-rounded on both sides.",
)
def sql_api_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    cat.register_all()
    out = spark.sql(_SQL_API_PIPE)
    return out.select(
        "l_returnflag",
        "l_linestatus",
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.col("sum_qty").cast("double").alias("sum_qty"),
        F.col("disc_revenue").cast("double").alias("disc_revenue"),
    )


_SQL_API_PARAM = """
    SELECT o_orderpriority,
           count(*) AS n_orders,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(10,2))) AS DOUBLE), 2) AS total
    FROM orders
    WHERE o_orderdate >= :cutoff AND o_orderstatus = :status
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
"""


@register(
    "sql_api_parameterized",
    """
    SELECT o_orderpriority,
           count(*)::BIGINT AS n_orders,
           round(sum(o_totalprice::DECIMAL(10,2))::DOUBLE, 2) AS total
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1995-06-01 00:00:00' AND o_orderstatus = 'O'
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="Named-parameter SQL (spark.sql(..., args={...}), Spark 3.4+): "
    "the injection-safe templating surface — parameter markers bind as "
    "typed literals inside the parse, so Catalyst still constant-folds "
    "and pushes the predicate to the scan exactly like the inlined form "
    "the oracle runs. Decimal-exact money sum (q1 discipline).",
)
def sql_api_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    cat.register_all()
    out = spark.sql(_SQL_API_PARAM, args={"cutoff": "1995-06-01 00:00:00", "status": "O"})
    return out.select(
        "o_orderpriority",
        F.col("n_orders").cast("bigint").alias("n_orders"),
        F.col("total").cast("double").alias("total"),
    )


# One ANSI string, run VERBATIM by spark.sql AND DuckDB — GROUP BY ALL /
# ORDER BY ALL are supported natively by both engines, so this query has a
# single source of truth with zero dialect translation.
_SQL_API_GROUP_BY_ALL = """
    SELECT o_orderstatus,
           o_orderpriority,
           count(*) AS n_orders,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(10,2))) AS DOUBLE), 2)
             AS total
    FROM orders
    GROUP BY ALL
    ORDER BY ALL
"""


@register(
    "sql_api_group_by_all",
    _SQL_API_GROUP_BY_ALL,
    doc="GROUP BY ALL / ORDER BY ALL (Spark 3.4+/4.x SQL surface): the "
    "analyst shorthand that infers grouping keys from the non-aggregate "
    "select list and orders by every output column. ONE ANSI string runs "
    "verbatim on both engines (DuckDB pioneered the syntax), so the "
    "oracle is the same text — zero translation to drift. Catalyst "
    "resolves it to the identical partial-agg -> exchange -> final-agg "
    "plan as the explicit GROUP BY; decimal-exact money sum (q1 "
    "discipline), and the count is cast BIGINT on the Spark side to "
    "match DuckDB's count(*) type.",
)
def sql_api_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    cat.register_all()
    out = spark.sql(_SQL_API_GROUP_BY_ALL)
    return out.select(
        "o_orderstatus",
        "o_orderpriority",
        F.col("n_orders").cast("bigint").alias("n_orders"),
        F.col("total").cast("double").alias("total"),
    )
