"""Plan pins for the relational query shapes (VERDICT r3 #3).

Correctness of these queries is oracle-checked by the driver; these tests
pin the PHYSICAL shape that survives a 100x scale-up — in particular that
`top_orders_by_quantity` never broadcasts the orders-of-segment set (about
1/5 of the orders table) into the lineitem join.
"""

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def tpch(spark):
    return {
        t: spark.read.parquet(f"{SF}/{t}.parquet")
        for t in ("lineitem", "orders", "customer")
    }


@pytest.fixture()
def no_auto_broadcast(spark):
    """Disable stat-based auto-broadcast so the static plan shows ONLY
    hint-driven broadcasts — at sf0.001 every table is under the 10 MB
    threshold and would otherwise broadcast regardless of hints, hiding
    the exact regression this test exists to catch."""
    key = "spark.sql.autoBroadcastJoinThreshold"
    old = spark.conf.get(key)
    spark.conf.set(key, "-1")
    yield
    spark.conf.set(key, old)


def test_top_orders_fact_join_not_broadcast(spark, tpch, no_auto_broadcast):
    """Q3 scale shape: exactly ONE broadcast (the filtered customer
    segment); the orders⋈lineitem join must be a shuffle join keyed on
    l_orderkey, because the BUILDING-segment order set is O(|orders|)."""
    from tesseract_rs_spark.functions.relational import top_orders_by_quantity

    out = top_orders_by_quantity(tpch["lineitem"], tpch["orders"], tpch["customer"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") == 1, plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan), plan
    # and it still computes the right top order at this sf
    rows = out.collect()
    assert len(rows) == 10
    assert rows[0]["total_qty"] == max(r["total_qty"] for r in rows)


def test_large_orders_single_fact_exchange(spark, tpch, no_auto_broadcast):
    """Q18 scale shape: the only fact-side exchange is the per-order
    HAVING aggregate; the qualifying set (selective by premise) then
    broadcasts through orders and customer."""
    from tesseract_rs_spark.functions.relational import large_order_customers

    out = large_order_customers(
        tpch["lineitem"], tpch["orders"], tpch["customer"], min_qty=250
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") == 2, plan
    assert "SortMergeJoin" not in plan, plan
    assert out.count() > 0
