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


def top_orders_by_quantity(
    lineitem: DataFrame, orders: DataFrame, customer: DataFrame, k: int = 10
) -> DataFrame:
    """Q3-shaped join pipeline: customers in one segment -> their orders ->
    lineitems, grouped per order, top-k by total quantity.  The dimension
    side (filtered customers) broadcasts — the fact table never shuffles
    for the join; the only exchange is the final group-by."""
    segment = customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    o = orders.join(broadcast(segment), orders.o_custkey == segment.c_custkey).select(
        "o_orderkey", "o_orderdate"
    )
    j = lineitem.join(broadcast(o), lineitem.l_orderkey == o.o_orderkey)
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
