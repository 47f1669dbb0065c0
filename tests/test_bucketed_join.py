"""Bucketed co-located join (operators/bucketing.py): the layout must
remove the join-side shuffles, and the cached-layout path must serve
identical results."""

from __future__ import annotations

import re

from conftest import SF_SMOKE

from gee_datapipeline_spark.catalog import load_table
from gee_datapipeline_spark.operators.bucketing import (
    bucketed_table,
    colocated_join,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_colocated_join_has_no_exchange_on_join_inputs(spark):
    orders = load_table(spark, SF_SMOKE, "orders")
    customer = load_table(spark, SF_SMOKE, "customer")
    joined = colocated_join(
        orders,
        customer,
        "orders_by_cust",
        "customer_by_cust",
        "o_custkey",
        "c_custkey",
        ("o_orderkey", "o_totalprice"),
        ("c_custkey", "c_acctbal"),
    )
    plan = _plan(joined)
    assert "SortMergeJoin" in plan
    # The join itself must consume the bucketed layout directly: no
    # hash-partitioning Exchange on either join key anywhere in the
    # join subtree (a downstream aggregate may still shuffle on ITS
    # keys — that is not the join's shuffle).
    assert not re.search(r"Exchange hashpartitioning\(o_custkey", plan)
    assert not re.search(r"Exchange hashpartitioning\(c_custkey", plan)


def test_bucketed_join_matches_plain_join(spark):
    orders = load_table(spark, SF_SMOKE, "orders")
    customer = load_table(spark, SF_SMOKE, "customer")
    joined = colocated_join(
        orders,
        customer,
        "orders_by_cust",
        "customer_by_cust",
        "o_custkey",
        "c_custkey",
        ("o_orderkey", "o_totalprice"),
        ("c_custkey", "c_acctbal"),
    )
    got = sorted(
        (r.o_orderkey, r.c_custkey) for r in joined.collect()
    )
    want = sorted(
        (r.o_orderkey, r.c_custkey)
        for r in orders.join(
            customer, orders.o_custkey == customer.c_custkey
        ).collect()
    )
    assert got == want and len(got) > 0


def test_bucketed_table_reused_within_session(spark):
    """Second call must short-circuit on the catalog entry (same table
    name, no second write) — the amortization the docstring promises."""
    orders = load_table(spark, SF_SMOKE, "orders")
    a = bucketed_table(
        orders, "orders_by_cust", "o_custkey", ("o_orderkey", "o_totalprice")
    )
    name_a = a.sparkSession.catalog.listTables()
    b = bucketed_table(
        orders, "orders_by_cust", "o_custkey", ("o_orderkey", "o_totalprice")
    )
    name_b = b.sparkSession.catalog.listTables()
    assert {t.name for t in name_a} == {t.name for t in name_b}
    assert a.count() == b.count() == orders.count()
