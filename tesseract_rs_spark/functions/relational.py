"""Relational demo queries over the TPC-H-ish tables — the join/agg/top-k
machinery the engine uses internally (SURVEY.md §2.7), exercised as
first-class oracle-checked queries.

Numeric discipline for cross-engine byte-equality: doubles are cast to
exact integer cents / DECIMAL before aggregation, so sums are associative
and identical under any partitioning (a float sum would differ in the
last ulp between Spark's partial aggregates and DuckDB's sequential sum).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.functions import broadcast


def pricing_summary(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q1-shaped aggregate: per (returnflag, linestatus) — counts and
    cents-exact sums with a shipdate predicate that pushes to the scan."""
    li = lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
            "sum_base_cents"
        ),
        F.count("*").alias("count_order"),
    )


def local_supplier_volume(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    region_name: str = "ASIA",
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
) -> DataFrame:
    """TPC-H Q5-shaped six-table join: revenue per nation from orders
    where the customer and the line's supplier share a nation inside one
    region, within a one-year order window.

    Scale shape: region -> nation -> supplier is a pure broadcast chain
    (dimension tables never shuffle the fact side); lineitem joins the
    broadcast suppliers map-side; orders and customer join on their keys
    (the only shuffles a 100 TB run needs, and AQE may still broadcast
    the filtered orders year).  Revenue is exact integer
    cents x (100 - discount%) so partial aggregation is associative and
    byte-identical to the sequential oracle sum."""
    r = region.filter(F.col("r_name") == region_name).select("r_regionkey")
    n = nation.join(
        broadcast(r), nation.n_regionkey == r.r_regionkey
    ).select("n_nationkey", "n_name")
    s = supplier.join(
        broadcast(n), supplier.s_nationkey == n.n_nationkey
    ).select("s_suppkey", F.col("n_nationkey").alias("_s_nkey"), "n_name")
    o = orders.filter(
        (F.col("o_orderdate") >= date_from) & (F.col("o_orderdate") < date_to)
    ).select("o_orderkey", "o_custkey")
    c = customer.select("c_custkey", "c_nationkey")
    revenue_c4 = (
        F.round(F.col("l_extendedprice") * 100).cast("long")
        * (F.lit(100) - F.round(F.col("l_discount") * 100).cast("long"))
    )
    j = (
        lineitem.join(broadcast(s), lineitem.l_suppkey == s.s_suppkey)
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .filter(F.col("c_nationkey") == F.col("_s_nkey"))
    )
    return (
        j.groupBy("n_name")
        .agg(
            F.sum(revenue_c4).alias("revenue_c4"),
            F.count("*").alias("n_items"),
        )
        .select("n_name", "revenue_c4", "n_items")
    )


def promo_revenue_by_type(
    lineitem: DataFrame,
    part: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1996-02-01",
) -> DataFrame:
    """TPC-H Q14-shaped join: per part type, cents-exact revenue and item
    count for one ship month.  The part table broadcasts — the fact side
    joins map-side; the only exchange is the tiny per-type group-by."""
    li = lineitem.filter(
        (F.col("l_shipdate") >= date_from) & (F.col("l_shipdate") < date_to)
    )
    revenue_c4 = (
        F.round(F.col("l_extendedprice") * 100).cast("long")
        * (F.lit(100) - F.round(F.col("l_discount") * 100).cast("long"))
    )
    return (
        li.join(broadcast(part.select("p_partkey", "p_type")),
                li.l_partkey == F.col("p_partkey"))
        .groupBy("p_type")
        .agg(
            F.sum(revenue_c4).alias("revenue_c4"),
            F.count("*").alias("n_items"),
        )
    )


def large_order_customers(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    min_qty: int = 300,
) -> DataFrame:
    """Q18-shaped group-by-HAVING + join chain: orders whose total line
    quantity exceeds ``min_qty``, with their customer.  Scale shape: the
    HAVING aggregate reduces lineitem to per-order totals FIRST (one key
    shuffle with map-side partial aggregation — the only fact-table
    exchange); the tiny qualifying set then broadcasts through orders and
    customer, so neither dimension join shuffles the fact side.

    The broadcast hints assume ``min_qty`` is SELECTIVE (Q18's premise —
    a handful of qualifying orders).  A non-selective threshold would
    broadcast a large set past the planner's size check; drop the hints
    (AQE then picks the join strategy from runtime stats) if calling
    with low thresholds at scale."""
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"))
        .filter(F.col("sum_qty") > min_qty)
    )
    oj = orders.join(
        broadcast(big), orders.o_orderkey == big.l_orderkey
    ).select("o_orderkey", "o_custkey", "o_orderdate", "sum_qty")
    return customer.join(
        broadcast(oj), customer.c_custkey == oj.o_custkey
    ).select(
        F.col("c_custkey").cast("long"),
        "c_name",
        F.col("o_orderkey").cast("long"),
        F.col("o_orderdate").cast("string"),
        "sum_qty",
    )


def top_orders_by_quantity(
    lineitem: DataFrame, orders: DataFrame, customer: DataFrame, k: int = 10
) -> DataFrame:
    """Q3-shaped join pipeline: customers in one segment -> their orders ->
    lineitems, grouped per order, top-k by total quantity.  Scale shape:
    only the genuinely small side (the filtered customer SEGMENT) carries a
    broadcast hint; the orders-of-segment set is ~1/5 of the orders table
    — NOT broadcastable at 100 TB (VERDICT r3 #1) — so the orders⋈lineitem
    join is left unhinted and shuffles both sides by ``l_orderkey`` (or
    AQE picks a better strategy from runtime stats).  The per-order
    aggregate then reuses that same key, and the top-k is a global
    TakeOrdered on k rows."""
    segment = customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    o = orders.join(broadcast(segment), orders.o_custkey == segment.c_custkey).select(
        "o_orderkey", "o_orderdate"
    )
    j = lineitem.join(o, lineitem.l_orderkey == o.o_orderkey)
    agg = j.groupBy("o_orderkey", "o_orderdate").agg(
        F.sum(F.col("l_quantity").cast("long")).alias("total_qty"),
        F.count("*").alias("n_items"),
    )
    return (
        agg.orderBy(F.desc("total_qty"), F.asc("o_orderkey"))
        .limit(k)
        .select(
            F.col("o_orderkey").cast("long"),
            F.col("o_orderdate").cast("string"),
            "total_qty",
            "n_items",
        )
    )
